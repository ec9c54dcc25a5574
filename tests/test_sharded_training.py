"""Sharded-vs-single-device training equivalence.

The full jitted train step (embedding lookup/update + dense fwd/bwd)
over an 8-device mesh with row-wise sharded tables must match the
single-device run step for step.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))


def _steps(mesh, plan, n_steps=4):
    import pyarrow as pa
    from google.protobuf import text_format

    import __graft_entry__ as ge
    from torcheasyrec_tpu.main import (
        _init_state,
        _shard_batch,
        make_train_step,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )

    cfg, model, sparse_sched, batch = ge._build(
        mesh, batch_size=64, plan=plan
    )
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
    step_fn = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched, jnp.float32)
    )
    if mesh is not None:
        batch = _shard_batch(batch, mesh)
    losses = []
    rng = jax.random.key(7)
    for _ in range(n_steps):
        state, metrics, _ = step_fn(state, batch, rng)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    table = model.embedding_group.engine.extract_table(
        state["tables"], "cat_a_emb"
    )
    return losses, table


import pytest


@pytest.mark.parametrize("layout", ["row_wise", "column_wise", "table_wise"])
def test_sharded_training_matches_single_device(layout):
    from torcheasyrec_tpu.parallel.mesh import create_mesh

    assert len(jax.devices()) == 8
    plan = {"cat_a_emb": layout, "cat_a_emb__wide": layout}
    losses_1, table_1 = _steps(None, None)
    losses_8, table_8 = _steps(create_mesh(), plan)
    np.testing.assert_allclose(losses_8, losses_1, rtol=1e-4)
    np.testing.assert_allclose(table_8, table_1, rtol=1e-4, atol=1e-6)
