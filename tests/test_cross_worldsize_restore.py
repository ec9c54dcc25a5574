"""Checkpoint portability across world sizes and sharding plans.

Train on an 8-device mesh under one plan, save through the canonical
per-table layout, restore into a single-device model (different world
size AND different plan) — predictions must match exactly. The
reference gets this from TorchRec's reshard-on-load; here it's the
canonical checkpoint contract (checkpoint_util.state_for_save /
restore_train_state).
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))


def _train_and_batch(mesh, plan, n_steps=3):
    import pyarrow as pa

    import __graft_entry__ as ge
    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.main import (
        _create_features,
        _init_state,
        _shard_batch,
        make_train_step,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )

    cfg, model, sparse_sched, batch = ge._build(mesh, batch_size=64,
                                                plan=plan)
    features = _create_features(cfg)
    dense, tables, so = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense
    )
    state = {
        "dense": dense, "tables": tables, "sparse_opt": so,
        "dense_opt": tx.init(dense),
        "step": jnp.zeros((), jnp.int32),
    }
    if model.embedding_group.has_zch:
        state["zch"] = model.embedding_group.init_zch_states()
    step_fn = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched, jnp.float32)
    )
    b = _shard_batch(batch, mesh) if mesh is not None else batch
    rng = jax.random.key(7)
    for _ in range(n_steps):
        state, _, _ = step_fn(state, b, rng)
    return cfg, model, state, batch


def _predict(model, state, batch):
    from torcheasyrec_tpu.modules import module as M

    ctx = M.Context(training=False, compute_dtype=jnp.float32)
    if model.embedding_group.has_zch:
        batch, _ = model.embedding_group.remap_zch(
            batch, state["zch"], jnp.zeros((), jnp.int32), training=False
        )
    preds = model.forward(state["dense"], state["tables"], batch, ctx)
    return np.asarray(jax.device_get(preds["probs"]))


@pytest.mark.parametrize("train_layout", ["row_wise", "table_wise"])
def test_restore_across_worldsize_and_plan(tmp_path, train_layout):
    from torcheasyrec_tpu.parallel.mesh import create_mesh
    from torcheasyrec_tpu.utils import checkpoint_util

    assert len(jax.devices()) == 8
    plan = {"cat_a_emb": train_layout, "cat_a_emb__wide": train_layout,
            "cat_b_emb": train_layout}
    mesh = create_mesh()
    cfg, model8, state8, batch = _train_and_batch(mesh, plan)
    ckpt = str(tmp_path / "ckpt")
    checkpoint_util.save_train_state(ckpt, model8, state8)

    # restore into a 1-device model under a DIFFERENT plan
    import __graft_entry__ as ge
    from torcheasyrec_tpu.main import _init_state

    _, model1, _, _ = ge._build(None, batch_size=64,
                                plan={"cat_a_emb": "data_parallel"})
    dense, tables, so = _init_state(model1, cfg)
    state1 = {
        "dense": dense, "tables": tables, "sparse_opt": so,
        "step": jnp.zeros((), jnp.int32),
    }
    if model1.embedding_group.has_zch:
        state1["zch"] = model1.embedding_group.init_zch_states()
    state1 = checkpoint_util.restore_train_state(ckpt, model1, state1)

    # per-table weights identical through the canonical layout
    for tname in ("cat_a_emb", "cat_b_emb"):
        w8 = model8.embedding_group.engine.extract_table(
            state8["tables"], tname
        )
        w1 = model1.embedding_group.engine.extract_table(
            state1["tables"], tname
        )
        np.testing.assert_allclose(w8, w1, rtol=1e-6, atol=1e-7,
                                   err_msg=tname)
    # and the restored model predicts identically
    p8 = _predict(model8, state8, batch)
    p1 = _predict(model1, state1, batch)
    np.testing.assert_allclose(p8, p1, rtol=1e-5, atol=1e-6)

    # optimizer state rides along too (adagrad accumulators)
    canon8 = model8.embedding_group.engine.to_canonical(
        state8["tables"], state8["sparse_opt"]
    )
    canon1 = model1.embedding_group.engine.to_canonical(
        state1["tables"], state1["sparse_opt"]
    )
    for tname in ("cat_a_emb",):
        for k in canon8[tname]:
            if k.startswith("opt__"):
                np.testing.assert_allclose(
                    canon8[tname][k], canon1[tname][k],
                    rtol=1e-6, atol=1e-7, err_msg=f"{tname}.{k}",
                )
