"""Sparse-input-dist overlap: numeric equality with the unpipelined path.

The pipelined step issues batch N+1's embedding id all-to-all inside
step N's jit (reference TrainPipelineSparseDist,
/root/reference/tzrec/utils/dist_util.py:221-303). Ids are data, not
parameters — the staged route must produce bit-identical training to
running every exchange inline.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from test_sharded_training import _make_graft_batch  # noqa: E402


def _run(pipelined: bool, n_steps: int = 4):
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
    from torcheasyrec_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    plan = {"cat_a_emb": "row_wise", "cat_a_emb__wide": "row_wise"}
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
    batches = [
        _shard_batch(_make_graft_batch(features, seed=i), mesh)
        for i in range(n_steps)
    ]
    rng = jax.random.key(7)
    losses = []
    for i in range(n_steps):
        if pipelined:
            nb = batches[i + 1] if i + 1 < n_steps else batches[i]
            state, metrics, _ = step_fn(state, batches[i], rng, None, nb)
        else:
            state, metrics, _ = step_fn(state, batches[i], rng)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    table = model.embedding_group.engine.extract_table(
        state["tables"], "cat_a_emb"
    )
    return losses, np.asarray(table)


def test_pipelined_step_matches_unpipelined():
    assert len(jax.devices()) == 8
    losses_p, table_p = _run(pipelined=True)
    losses_u, table_u = _run(pipelined=False)
    # ids are data: the staged route serves the SAME rows, so training
    # must match exactly, step for step
    np.testing.assert_array_equal(losses_p, losses_u)
    np.testing.assert_array_equal(table_p, table_u)


def test_stage_route_matches_inline_lookup():
    """engine-level: lookup(staged=stage_route(batch)) == lookup()."""
    import __graft_entry__ as ge
    from torcheasyrec_tpu.main import _create_features, _shard_batch
    from torcheasyrec_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    plan = {"cat_a_emb": "row_wise", "cat_a_emb__wide": "row_wise"}
    cfg, model, _, _ = ge._build(mesh, batch_size=64, plan=plan)
    features = _create_features(cfg)
    tables = model.embedding_group.init_tables(jax.random.key(3))
    batch = _shard_batch(_make_graft_batch(features, seed=0), mesh)
    eg = model.embedding_group

    @jax.jit
    def inline(tables, batch):
        out, _ = eg.lookup(tables, batch)
        return out

    @jax.jit
    def staged_lookup(tables, batch):
        staged = eg.stage_route(batch)
        assert staged, "no a2a-routed group was staged"
        out, _ = eg.lookup(tables, batch, staged=staged)
        return out

    a = jax.device_get(inline(tables, batch))
    b = jax.device_get(staged_lookup(tables, batch))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_driver_loop_overlap_e2e(tmp_path):
    """train_and_evaluate with sparse_dist_overlap exercises the whole
    driver wiring (paired iterator, batch_next threading, epoch-
    boundary staged drop, checkpoint filter) and must reproduce the
    unpipelined run's metrics exactly."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from torcheasyrec_tpu import main as tzrec_main

    tmp_path = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 512
    tbl = pa.table({
        "cat_a": pa.array(rng.integers(0, 100000, n).astype(np.int64)),
        "cat_b": pa.array(rng.integers(0, 1000, n).astype(np.int64)),
        "num_a": pa.array(rng.normal(size=n).astype(np.float32)),
        "label": pa.array((rng.random(n) > 0.5).astype(np.float32)),
    })
    train = os.path.join(tmp_path, "train.parquet")
    evalp = os.path.join(tmp_path, "eval.parquet")
    pq.write_table(tbl.slice(0, 384), train)
    pq.write_table(tbl.slice(384), evalp)

    def _cfg(overlap: bool, model_dir: str) -> str:
        txt = f"""
train_input_path: "{train}"
eval_input_path: "{evalp}"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.05 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.01 }}
                       constant_learning_rate {{}} }}
    num_epochs: 2
    save_checkpoints_steps: 10000
    sparse_dist_overlap: {"true" if overlap else "false"}
}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{ id_feature {{ feature_name: "cat_a"
    num_buckets: 100000 embedding_dim: 16
    embedding_constraints {{ sharding_types: "row_wise" }} }} }}
feature_configs {{ id_feature {{ feature_name: "cat_b"
    num_buckets: 1000 embedding_dim: 16 }} }}
feature_configs {{ raw_feature {{ feature_name: "num_a" }} }}
model_config {{
    feature_groups {{ group_name: "wide"
        feature_names: ["cat_a", "cat_b"] group_type: WIDE }}
    feature_groups {{ group_name: "fm"
        feature_names: ["cat_a", "cat_b"] group_type: DEEP }}
    feature_groups {{ group_name: "deep"
        feature_names: ["cat_a", "cat_b", "num_a"] group_type: DEEP }}
    deepfm {{ deep {{ hidden_units: [16] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""
        p = os.path.join(model_dir + ".config")
        with open(p, "w") as f:
            f.write(txt)
        return p

    assert len(jax.devices()) == 8  # maybe_mesh() builds the mesh
    r_overlap = tzrec_main.train_and_evaluate(
        _cfg(True, os.path.join(tmp_path, "m_overlap"))
    )
    r_plain = tzrec_main.train_and_evaluate(
        _cfg(False, os.path.join(tmp_path, "m_plain"))
    )
    assert r_overlap.keys() == r_plain.keys()
    for k in r_plain:
        np.testing.assert_allclose(
            r_overlap[k], r_plain[k], rtol=0, atol=0, err_msg=k
        )
