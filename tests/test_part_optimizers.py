"""Per-part dense optimizers with their OWN LR schedules + by_epoch.

Reference: tzrec/optim/optimizer_builder.py create_part_optimizer:139,
create_part_optim_schedulers:179 (a part without a learning_rate oneof
inherits the main schedule config), group_param_by_regex_pattern:222
(re.fullmatch, first match wins).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.optim.optimizer_builder import create_dense_optimizer
from torcheasyrec_tpu.protos import optimizer_pb2


def _cfg(txt):
    return text_format.Parse(txt, optimizer_pb2.DenseOptimizer())


PARAMS = {
    "deep": {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))},
    "wide": {"w": jnp.ones((4,))},
    "other": jnp.ones((2,)),
}


def test_part_optimizer_own_schedule():
    cfg = _cfg("""
        adam_optimizer { lr: 0.01 }
        constant_learning_rate {}
        part_optimizers {
            sgd_optimizer { lr: 0.1 }
            regex_pattern: "deep/.*"
            manual_step_learning_rate {
                schedule_sizes: 5
                learning_rates: 0.0
            }
        }
        part_optimizers {
            sgd_optimizer { lr: 0.2 }
            regex_pattern: "wide/.*"
        }
    """)
    tx, sched = create_dense_optimizer(cfg, PARAMS)
    assert sched["per_part"]
    # step 0: all multipliers 1.0
    m0 = sched["fn"](jnp.int32(0), None)
    assert float(m0["deep"]["w"]) == 1.0
    assert float(m0["wide"]["w"]) == 1.0
    assert float(m0["other"]) == 1.0
    # step 10: deep's manual_step dropped its lr to 0; wide (inherits
    # the main constant schedule) and main stay 1.0
    m10 = sched["fn"](jnp.int32(10), None)
    assert float(m10["deep"]["w"]) == 0.0
    assert float(m10["deep"]["b"]) == 0.0
    assert float(m10["wide"]["w"]) == 1.0
    assert float(m10["other"]) == 1.0

    # the optax chain routes each group to its own optimizer: apply one
    # update and check magnitudes reflect the per-part base lrs
    grads = jax.tree_util.tree_map(jnp.ones_like, PARAMS)
    st = tx.init(PARAMS)
    updates, _ = tx.update(grads, st, PARAMS)
    # sgd parts produce -lr * grad exactly
    np.testing.assert_allclose(
        np.asarray(updates["deep"]["w"]), -0.1, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(updates["wide"]["w"]), -0.2, rtol=1e-6
    )


def test_part_regex_fullmatch_first_wins():
    cfg = _cfg("""
        sgd_optimizer { lr: 0.01 }
        constant_learning_rate {}
        part_optimizers {
            sgd_optimizer { lr: 0.1 }
            regex_pattern: "deep"
            constant_learning_rate {}
        }
        part_optimizers {
            sgd_optimizer { lr: 0.2 }
            regex_pattern: "deep/.*"
            manual_step_learning_rate {
                schedule_sizes: 1 learning_rates: 0.0
            }
        }
    """)
    tx, sched = create_dense_optimizer(cfg, PARAMS)
    # "deep" does NOT fullmatch "deep/w" -> the second part owns it
    grads = jax.tree_util.tree_map(jnp.ones_like, PARAMS)
    updates, _ = tx.update(grads, tx.init(PARAMS), PARAMS)
    np.testing.assert_allclose(
        np.asarray(updates["deep"]["w"]), -0.2, rtol=1e-6
    )
    m = sched["fn"](jnp.int32(5), None)
    assert float(m["deep"]["w"]) == 0.0  # second part's schedule applies


def test_by_epoch_schedule_steps_per_epoch():
    cfg = _cfg("""
        sgd_optimizer { lr: 0.1 }
        exponential_decay_learning_rate {
            decay_size: 1 decay_factor: 0.5 by_epoch: true
        }
    """)
    _, sched = create_dense_optimizer(cfg, PARAMS)
    assert sched["by_epoch"]
    # by_epoch: the multiplier follows the EPOCH index, not the step
    assert float(sched["fn"](jnp.int32(1000), jnp.int32(0))) == (
        pytest.approx(1.0)
    )
    assert float(sched["fn"](jnp.int32(0), jnp.int32(2))) == (
        pytest.approx(0.25)
    )
    # without an epoch signal it falls back to the step index
    assert float(sched["fn"](jnp.int32(2), None)) == pytest.approx(0.25)


def test_part_optimizer_e2e_freeze(tmp_path):
    """A part optimizer whose schedule zeroes its lr freezes exactly its
    regex group during real training."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 512
    x = rng.normal(size=n).astype(np.float32)
    y = (x > 0).astype(np.float32)
    tbl = pa.table({"f1": pa.array(x), "label": pa.array(y)})
    pq.write_table(tbl, os.path.join(tmp, "train.parquet"))
    cfg_text = f"""
train_input_path: "{tmp}/train.parquet"
eval_input_path: "{tmp}/train.parquet"
model_dir: "{tmp}/model"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.1 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{
        adam_optimizer {{ lr: 0.05 }}
        constant_learning_rate {{}}
        part_optimizers {{
            sgd_optimizer {{ lr: 0.5 }}
            regex_pattern: "towers/deep/.*"
            manual_step_learning_rate {{
                schedule_sizes: 0
                learning_rates: 0.0
            }}
        }}
    }}
    num_epochs: 2
    save_checkpoints_steps: 10000
}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    raw_feature {{ feature_name: "f1" }}
}}
model_config {{
    feature_groups {{ group_name: "deep" feature_names: "f1"
                      group_type: DEEP }}
    multi_tower {{ towers {{ input: 'deep' mlp {{ hidden_units: [8] }} }}
                   final {{ hidden_units: [4] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""
    cfg_path = os.path.join(tmp, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.utils import checkpoint_util, config_util

    tzrec_main.train_and_evaluate(cfg_path)

    # rebuild at init and diff against the trained checkpoint
    pc = config_util.load_pipeline_config(cfg_path)
    model, _, _ = tzrec_main._build_model_and_optim(pc, None)
    dense0, tables0, so0 = tzrec_main._init_state(model, pc)
    state = {"dense": dense0, "tables": tables0, "sparse_opt": so0,
             "step": jnp.zeros((), jnp.int32)}
    ckpt = checkpoint_util.latest_checkpoint(os.path.join(tmp, "model"))
    trained = checkpoint_util.restore_train_state(ckpt, model, state)

    flat0 = jax.tree_util.tree_flatten_with_path(dense0)[0]
    flatT = dict(jax.tree_util.tree_flatten_with_path(trained["dense"])[0])
    frozen, moved = [], []
    for path, v0 in flat0:
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        vT = flatT[path]
        same = np.allclose(np.asarray(v0), np.asarray(vT))
        import re as _re

        if _re.fullmatch("towers/deep/.*", p):
            frozen.append((p, same))
        else:
            moved.append((p, same))
    assert frozen and all(s for _, s in frozen), frozen
    assert any(not s for _, s in moved), "main params never trained"
