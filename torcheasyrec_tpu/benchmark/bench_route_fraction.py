"""Measure the id-routing share of a sharded train step (8-dev CPU mesh).

Supports docs/pipeline.md "Where TrainPipelineSparseDist went": the
table-independent id-exchange work (what the reference overlaps with
dense compute, tzrec/utils/dist_util.py:221-303) is a single-digit
percentage of the sharded step, so a split-step pipeline is not worth
its complexity on TPU. Run: python -m torcheasyrec_tpu.benchmark.bench_route_fraction

route-only program = flatten group ids + owner-bucket sort + id
all_to_all + overflow psum (everything TorchRec's
TrainPipelineSparseDist overlaps with dense compute); compare against
the full train step.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import bench
bench.CRITEO_BUCKETS = [min(n, 200_000) for n in bench.CRITEO_BUCKETS]
bench.BATCH_SIZE = 2048
from bench import build_config
CRITEO_BUCKETS, BATCH_SIZE = bench.CRITEO_BUCKETS, bench.BATCH_SIZE
import pyarrow as pa
from torcheasyrec_tpu.datasets.data_parser import DataParser
from torcheasyrec_tpu.main import (_build_model_and_optim, _init_state,
                                   _shard_batch, make_train_step)
from torcheasyrec_tpu.optim.optimizer_builder import create_dense_optimizer
from torcheasyrec_tpu.parallel.mesh import create_mesh, DATA_AXIS

cfg = build_config()
mesh = create_mesh()
model, features, sparse_sched = _build_model_and_optim(cfg, mesh)
plan = {n: "row_wise" for n in model.embedding_group.engine._specs}
model, features, sparse_sched = _build_model_and_optim(cfg, mesh, plan=plan)
parser = DataParser(features, labels=["label"])
rng = np.random.default_rng(0)
cols = {"label": pa.array((rng.random(BATCH_SIZE) > 0.5).astype(np.float32))}
for i in range(13):
    cols[f"int_{i}"] = pa.array(rng.normal(size=BATCH_SIZE).astype(np.float32))
for i, n in enumerate(CRITEO_BUCKETS):
    cols[f"cat_{i}"] = pa.array(rng.integers(0, n, BATCH_SIZE))
batch = parser.parse_to_batch(cols)
batch = _shard_batch(batch, mesh)

dense_params, tables, so = _init_state(model, cfg)
tx, dense_sched = create_dense_optimizer(cfg.train_config.dense_optimizer, dense_params)
state = {"dense": dense_params, "tables": tables, "sparse_opt": so,
         "dense_opt": tx.init(dense_params), "step": jnp.zeros((), jnp.int32)}
step = jax.jit(make_train_step(model, tx, sparse_sched, dense_sched, jnp.float32))
rngk = jax.random.key(0)

eng = model.embedding_group.engine

def route_only(batch):
    """The table-independent id-exchange work per row-sharded group."""
    outs = []
    for gk, lks in eng._lookups_by_group.items():
        g = eng.groups[gk]
        if g.sharding not in ("row_wise", "table_wise", "table_row_wise"):
            continue
        flat_ids, _plan = eng._flatten_group_ids(
            g, lks, batch.sparse_features, batch.sequence_sparse_features)
        n = flat_ids.shape[0]
        pad = (-n) % eng.num_shards
        if pad:
            flat_ids = jnp.concatenate([flat_ids, jnp.full((pad,), -1, flat_ids.dtype)])
        rows_per_shard = g.padded_rows // eng.num_shards

        def fn(ids_loc, rows_per_shard=rows_per_shard):
            cap = eng._a2a_capacity(ids_loc.shape[0])
            order, fits, flat_idx, send_ids = eng._a2a_route(ids_loc, rows_per_shard, cap)
            recv = jax.lax.all_to_all(send_ids, DATA_AXIS, split_axis=0, concat_axis=0)
            over = eng._a2a_overflow(ids_loc, rows_per_shard, cap)
            return (recv.sum() + order.sum() + flat_idx.sum() + over.astype(jnp.int32))[None]

        outs.append(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(DATA_AXIS),), out_specs=P(DATA_AXIS),
        )(flat_ids).sum())
    return sum(outs)

route_jit = jax.jit(route_only)

# warmup
for _ in range(3):
    state, m, _ = step(state, batch, rngk)
jax.device_get(m["total_loss"])
r = route_jit(batch); jax.device_get(r)

N = 10
t0 = time.perf_counter()
for _ in range(N):
    state, m, _ = step(state, batch, rngk)
jax.device_get(m["total_loss"])
t_step = (time.perf_counter() - t0) / N

t0 = time.perf_counter()
acc = 0
for _ in range(N):
    acc = route_jit(batch)
jax.device_get(acc)
t_route = (time.perf_counter() - t0) / N

print(f"full sharded train step: {t_step*1e3:.2f} ms")
print(f"id-routing only (all groups): {t_route*1e3:.2f} ms")
print(f"routing fraction: {t_route/t_step*100:.1f}%")
