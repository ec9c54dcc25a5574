"""Variational dropout wiring + feature_selection e2e.

Reference contract: rank_model.py:96-131 builds a VariationalDropout per
(multi-feature, non-sequence) group, applies it between embedding
assembly and the dense net, adds the L0-style penalty to the loss, and
tools/feature_selection.py ranks features by the learned keep
probability. Test strategy per VERDICT: a planted useless feature must
end up with a higher drop probability than the feature the label depends
on.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.variational_dropout import VariationalDropout
from torcheasyrec_tpu.protos import pipeline_pb2

VD_CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{
        adagrad_optimizer {{ lr: 0.05 }}
        constant_learning_rate {{}}
    }}
    dense_optimizer {{
        adam_optimizer {{ lr: 0.01 }}
        constant_learning_rate {{}}
    }}
    num_epochs: 8
    save_checkpoints_steps: 1000
    log_step_count_steps: 50
}}
eval_config {{}}
data_config {{
    batch_size: 128
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    id_feature {{ feature_name: "useful" num_buckets: 64 embedding_dim: 8 }}
}}
feature_configs {{
    id_feature {{ feature_name: "noise" num_buckets: 64 embedding_dim: 8 }}
}}
model_config {{
    feature_groups {{
        group_name: "deep"
        feature_names: "useful"
        feature_names: "noise"
        group_type: DEEP
    }}
    multi_tower {{
        towers {{ input: "deep" mlp {{ hidden_units: [32, 16] }} }}
        final {{ hidden_units: [8] }}
    }}
    num_class: 1
    metrics {{ auc {{}} }}
    losses {{ binary_cross_entropy {{}} }}
    variational_dropout {{ regularization_lambda: 0.05 }}
}}
"""


def _write_planted_parquet(path: str, n: int, seed: int) -> None:
    """label depends only on `useful`; `noise` is independent."""
    rng = np.random.default_rng(seed)
    useful = rng.integers(0, 64, n)
    noise = rng.integers(0, 64, n)
    logits = np.where(useful % 2 == 0, 2.0, -2.0)
    label = (rng.random(n) < 1.0 / (1.0 + np.exp(-logits))).astype(
        np.int32
    )
    pq.write_table(
        pa.table(
            {
                "useful": pa.array(useful, pa.int64()),
                "noise": pa.array(noise, pa.int64()),
                "label": pa.array(label, pa.int32()),
            }
        ),
        path,
    )


def test_variational_dropout_module_eval_scaling():
    vd = VariationalDropout([4, 4], regularization_lambda=0.01)
    params = vd.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 8))
    out, reg = vd(params, x, M.Context(training=False))
    # eval: deterministic scaling by keep prob 1 - sigmoid(-2)
    keep = 1.0 - jax.nn.sigmoid(-2.0)
    np.testing.assert_allclose(np.asarray(out), float(keep), rtol=1e-5)
    assert float(reg) > 0


def test_planted_useless_feature_gets_dropped(tmp_path):
    tmp_path = str(tmp_path)
    cfg_text = VD_CONFIG.format(
        train=os.path.join(tmp_path, "train.parquet"),
        eval=os.path.join(tmp_path, "eval.parquet"),
        model_dir=os.path.join(tmp_path, "model"),
    )
    cfg = text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    _write_planted_parquet(
        os.path.join(tmp_path, "train.parquet"), 8192, seed=0
    )
    _write_planted_parquet(
        os.path.join(tmp_path, "eval.parquet"), 1024, seed=1
    )

    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.tools.feature_selection import select_features

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.6, f"AUC too low: {result}"

    out_dir = os.path.join(tmp_path, "fs")
    ranked = select_features(
        cfg_path, topk=1, output_dir=out_dir
    )
    # keep probabilities: the label-bearing feature must outrank noise
    all_ranked = select_features(cfg_path, topk=10)
    assert all_ranked["useful"] > all_ranked["noise"], all_ranked

    # topk=1 rewrite keeps only the useful feature
    new_cfg = pipeline_pb2.EasyRecConfig()
    with open(os.path.join(out_dir, "pipeline.config")) as f:
        text_format.Parse(f.read(), new_cfg)
    kept = [
        getattr(fc, fc.WhichOneof("feature")).feature_name
        for fc in new_cfg.feature_configs
    ]
    assert kept == ["useful"], kept
    assert list(ranked) == ["useful"]

    # export still works with VD params in the dense tree (eval-mode
    # scaling applied inside forward)
    export_dir = os.path.join(tmp_path, "export")
    tzrec_main.export(cfg_path, export_dir)
    out_path = os.path.join(tmp_path, "preds")
    tzrec_main.predict(
        os.path.join(tmp_path, "eval.parquet"), out_path, export_dir
    )
    files = [f for f in os.listdir(out_path) if f.endswith(".parquet")]
    preds = pq.read_table(os.path.join(out_path, files[0]))
    p = preds.column("probs").to_numpy()
    assert np.all((p >= 0) & (p <= 1))
