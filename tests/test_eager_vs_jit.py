"""Eager-vs-jit equivalence matrix.

The reference's graph-mode test matrix (SURVEY §4: every model test
runs eager AND fx-traced/scripted) maps on TPU to: the traced+compiled
(jit) computation must equal the op-by-op (eager) computation — for
forward passes AND a full train step — across model families covering
rank, multi-task, sequence/attention, and two-tower retrieval.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sys, os  # noqa: E401

sys.path.insert(0, os.path.dirname(__file__))

from test_model_zoo import (  # noqa: E402
    FEATURES,
    GROUPS_RANK,
    MODEL_CONFIGS,
    _make_batch,
)

MATRIX = ["deepfm", "dlrm", "mmoe", "multi_tower_din", "dssm", "mask_net"]


def _build(model_name):
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.models import create_model
    from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2

    feature_cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in FEATURES
    ]
    features = create_features(feature_cfgs)
    mc_text = GROUPS_RANK + MODEL_CONFIGS[model_name] + """
    losses { binary_cross_entropy {} }
    metrics { auc {} }
    """
    model_config = text_format.Parse(mc_text, model_pb2.ModelConfig())
    labels = ["label", "label2"]
    model = create_model(
        model_config, features, labels,
        sparse_optimizer=SparseOptimizer("adagrad", {"lr": 0.05}),
    )
    batch = _make_batch(features, labels)
    dense = model.init(jax.random.key(0))
    tables = model.embedding_group.init_tables(jax.random.key(1))
    return model, batch, dense, tables


@pytest.mark.parametrize("model_name", MATRIX)
def test_forward_eager_equals_jit(model_name):
    from torcheasyrec_tpu.modules import module as M

    model, batch, dense, tables = _build(model_name)

    def fwd(dense, tables, batch):
        ctx = M.Context(training=False, compute_dtype=jnp.float32)
        preds = model.forward(dense, tables, batch, ctx)
        return {k: v for k, v in preds.items()
                if not isinstance(v, (list, tuple))}

    eager = fwd(dense, tables, batch)
    jitted = jax.jit(fwd)(dense, tables, batch)
    assert set(eager) == set(jitted)
    for k in eager:
        np.testing.assert_allclose(
            np.asarray(eager[k]), np.asarray(jax.device_get(jitted[k])),
            rtol=2e-5, atol=2e-6, err_msg=f"{model_name}:{k}",
        )


@pytest.mark.parametrize("model_name", ["deepfm", "mmoe"])
def test_train_step_eager_equals_jit(model_name):
    from torcheasyrec_tpu.main import make_train_step
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )
    from torcheasyrec_tpu.protos import optimizer_pb2

    model, batch, dense, tables = _build(model_name)
    sparse_opt = model.embedding_group.init_opt_state()
    dc = optimizer_pb2.DenseOptimizer()
    dc.adam_optimizer.lr = 0.01
    tx, dense_sched = create_dense_optimizer(dc, dense)
    one = {"fn": lambda s: jnp.float32(1.0)}
    step_fn = make_train_step(model, tx, one, dense_sched, jnp.float32)

    def run(jit):
        state = {
            "dense": jax.tree_util.tree_map(jnp.copy, dense),
            "tables": jax.tree_util.tree_map(jnp.copy, tables),
            "sparse_opt": jax.tree_util.tree_map(jnp.copy, sparse_opt),
            "dense_opt": tx.init(dense),
            "step": jnp.zeros((), jnp.int32),
        }
        f = jax.jit(step_fn) if jit else step_fn
        for _ in range(2):
            state, metrics, _ = f(state, batch, jax.random.key(5))
        return state, metrics

    s_e, m_e = run(False)
    s_j, m_j = run(True)
    np.testing.assert_allclose(
        float(m_e["total_loss"]), float(jax.device_get(m_j["total_loss"])),
        rtol=2e-5,
    )
    for gk in s_e["tables"]:
        np.testing.assert_allclose(
            np.asarray(s_e["tables"][gk]),
            np.asarray(jax.device_get(s_j["tables"][gk])),
            rtol=2e-5, atol=2e-6, err_msg=f"{model_name}:{gk}",
        )
    flat_e = jax.tree_util.tree_leaves(s_e["dense"])
    flat_j = jax.tree_util.tree_leaves(jax.device_get(s_j["dense"]))
    for a, b in zip(flat_e, flat_j):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
