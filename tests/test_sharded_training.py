"""Sharded-vs-single-device training equivalence.

The full jitted train step (embedding lookup/update + dense fwd/bwd)
over an 8-device mesh must match the single-device run step for step —
for every sharding layout, with ids VARYING across steps (each step
touches a different row set, exercising the owner-bucketed exchange's
routing under skew), and for a sequence model (per-position lookups,
attention pooling).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pytest
from google.protobuf import text_format

sys.path.insert(0, os.path.dirname(__file__))

LAYOUTS = [
    "row_wise", "column_wise", "table_wise", "table_row_wise",
    "data_parallel",
]


def _make_graft_batch(features, seed):
    from torcheasyrec_tpu.datasets.data_parser import DataParser

    rng = np.random.default_rng(seed)
    n = 64
    parser = DataParser(features, labels=["label"])
    return parser.parse_to_batch({
        "cat_a": pa.array(rng.integers(0, 100000, n)),
        "cat_b": pa.array(rng.integers(0, 1000, n)),
        "cat_c": pa.array(rng.integers(0, 500, n)),
        "cat_z": pa.array(rng.integers(0, 1 << 40, n)),
        "tgt_item": pa.array(rng.integers(0, 2000, n)),
        "click_seq": pa.array([
            ";".join(
                map(str, rng.integers(0, 2000, int(rng.integers(1, 8))))
            )
            for _ in range(n)
        ]),
        "num_a": pa.array(rng.normal(size=n).astype(np.float32)),
        "label": pa.array((rng.random(n) > 0.5).astype(np.float32)),
    })


def _steps(mesh, plan, n_steps=4):
    import __graft_entry__ as ge
    from torcheasyrec_tpu.main import (
        _create_features,
        _init_state,
        _shard_batch,
        make_train_step,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )

    cfg, model, sparse_sched, _ = ge._build(mesh, batch_size=64, plan=plan)
    features = _create_features(cfg)
    dense_params, tables, sparse_opt_state = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense_params
    )
    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt_state,
        "dense_opt": tx.init(dense_params),
        "step": jnp.zeros((), jnp.int32),
    }
    if model.embedding_group.has_zch:
        state["zch"] = model.embedding_group.init_zch_states()
    step_fn = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched, jnp.float32)
    )
    losses = []
    rng = jax.random.key(7)
    for i in range(n_steps):
        # fresh ids EVERY step: the exchange must route a different
        # id set each time (catches stale-routing/caching bugs a
        # replayed batch can't)
        batch = _make_graft_batch(features, seed=i)
        if mesh is not None:
            batch = _shard_batch(batch, mesh)
        state, metrics, _ = step_fn(state, batch, rng)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    table = model.embedding_group.engine.extract_table(
        state["tables"], "cat_a_emb"
    )
    return losses, table


@pytest.mark.parametrize("layout", LAYOUTS)
def test_sharded_training_matches_single_device(layout):
    from torcheasyrec_tpu.parallel.mesh import create_mesh

    assert len(jax.devices()) == 8
    plan = {"cat_a_emb": layout, "cat_a_emb__wide": layout}
    losses_1, table_1 = _steps(None, None)
    losses_8, table_8 = _steps(create_mesh(), plan)
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4)
    np.testing.assert_allclose(table_8, table_1, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------- sequence model


SEQ_FEATURES = [
    "id_feature { feature_name: 'uid' num_buckets: 500 embedding_dim: 16 }",
    "id_feature { feature_name: 'iid' num_buckets: 2000 embedding_dim: 16 }",
    "raw_feature { feature_name: 'price' }",
    "sequence_id_feature { feature_name: 'clicks' num_buckets: 2000 "
    "  embedding_dim: 16 sequence_length: 8 embedding_name: 'iid_emb' }",
]

SEQ_MODEL = """
feature_groups { group_name: "all" feature_names: ["uid", "iid", "price"]
                 group_type: DEEP }
feature_groups { group_name: "seq" feature_names: ["iid", "clicks"]
                 group_type: SEQUENCE }
multi_tower_din {
    towers { input: "all" mlp { hidden_units: [16] } }
    din_towers { input: "seq" attn_mlp { hidden_units: [8] } }
    final { hidden_units: [16] } }
losses { binary_cross_entropy {} }
metrics { auc {} }
"""


def _seq_batch(features, seed):
    from torcheasyrec_tpu.datasets.data_parser import DataParser

    rng = np.random.default_rng(seed)
    n = 64
    parser = DataParser(features, labels=["label"])
    return parser.parse_to_batch({
        "uid": pa.array(rng.integers(0, 500, n)),
        "iid": pa.array(rng.integers(0, 2000, n)),
        "price": pa.array(rng.normal(size=n).astype(np.float32)),
        "clicks": pa.array([
            ";".join(str(x)
                     for x in rng.integers(0, 2000, rng.integers(1, 8)))
            for _ in range(n)
        ]),
        "label": pa.array((rng.random(n) > 0.5).astype(np.float32)),
    })


def _seq_steps(mesh, plan, n_steps=3):
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.main import _shard_batch, make_train_step
    from torcheasyrec_tpu.models import create_model
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )
    from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2, optimizer_pb2

    feature_cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig())
        for t in SEQ_FEATURES
    ]
    features = create_features(feature_cfgs)
    model_config = text_format.Parse(SEQ_MODEL, model_pb2.ModelConfig())
    opt = SparseOptimizer("adagrad", {"lr": 0.05})
    model = create_model(
        model_config, features, ["label"], mesh=mesh,
        sparse_optimizer=opt, plan=plan,
    )
    dense_params = model.init(jax.random.key(0))
    tables = model.embedding_group.init_tables(jax.random.key(1))
    sparse_opt = model.embedding_group.init_opt_state()
    dense_cfg = optimizer_pb2.DenseOptimizer()
    dense_cfg.adam_optimizer.lr = 0.01
    tx, dense_sched = create_dense_optimizer(dense_cfg, dense_params)
    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense_params),
        "step": jnp.zeros((), jnp.int32),
    }
    one = {"fn": lambda s: jnp.float32(1.0)}
    step_fn = jax.jit(make_train_step(model, tx, one, dense_sched,
                                      jnp.float32))
    losses = []
    for i in range(n_steps):
        batch = _seq_batch(features, seed=100 + i)
        if mesh is not None:
            batch = _shard_batch(batch, mesh)
        state, metrics, _ = step_fn(state, batch, jax.random.key(2))
        losses.append(float(jax.device_get(metrics["total_loss"])))
    table = model.embedding_group.engine.extract_table(
        state["tables"], "iid_emb"
    )
    return losses, table


@pytest.mark.parametrize("layout", ["row_wise", "column_wise"])
def test_sharded_sequence_model_matches_single_device(layout):
    """DIN with a shared sequence/id table: per-position lookups and
    their grads route through the sharded exchange identically."""
    from torcheasyrec_tpu.parallel.mesh import create_mesh

    plan = {"iid_emb": layout, "uid_emb": layout}
    losses_1, table_1 = _seq_steps(None, None)
    losses_8, table_8 = _seq_steps(create_mesh(), plan)
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4)
    np.testing.assert_allclose(table_8, table_1, rtol=1e-4, atol=1e-6)
