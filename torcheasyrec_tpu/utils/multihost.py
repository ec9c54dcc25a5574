"""Multi-host SPMD batch coordination.

The reference runs one torch process per GPU and equalizes data via
per-rank dataloaders + NCCL collectives inside TorchRec
(/root/reference/tzrec/utils/dist_util.py:285-299,
/root/reference/tzrec/datasets/utils.py:726-914). The TPU-native
runtime is jax SPMD: ONE jitted step spans every host's devices, so all
processes must feed arrays with IDENTICAL global shapes each step. This
module provides the host-side coordination for that:

- ``sync_batch_dims``: one ``process_allgather`` per step carrying
  (have-data flag, event-time watermark, every leaf dim). Hosts pad
  their local batch up to the elementwise max so shapes agree, and the
  event-time checkpoint quorum (reference checkpoint_util.py:404-505)
  falls out for free: the returned timestamp is the MIN over hosts, so
  every process triggers the same checkpoint on the same step.
- ``make_global_batch``: assembles the per-process local batches into
  global ``jax.Array``s (row-concatenated over processes) via
  ``jax.make_array_from_process_local_data``. Jagged sparse fields get
  explicit precomputed global segment ids because each host's value
  stream carries its own tail padding — cumulative-length segment
  recovery would misplace every host's rows after the first.
- ``local_rows``: read back this process's addressable rows of a global
  array (for host-side metrics).

Everything here is inert in single-process runs.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from torcheasyrec_tpu.datasets.utils import (
    Batch,
    DenseField,
    SequenceDenseField,
    SparseField,
)


def _leaf_arrays(batch: Batch) -> List[np.ndarray]:
    """Deterministic leaf order (jax pytree order: dicts sorted by key)."""
    leaves = jax.tree_util.tree_leaves(batch)
    return [np.asarray(x) for x in leaves]


def batch_dims_vector(
    batch: Optional[Batch], have: bool, data_timestamp: Optional[int],
    can_continue: bool = True,
) -> np.ndarray:
    """[have, ts, cont, n_dims, dim...] as one int64 vector for the gather.

    ``can_continue``: eval anti-hang (reference dist_util dummy-batch
    exchange) — a host out of data keeps stepping with its last batch,
    but only if it ever HAD one; otherwise every host must stop.
    """
    dims: List[int] = []
    if batch is not None:
        for a in _leaf_arrays(batch):
            dims.append(a.ndim)
            dims.extend(a.shape)
    return np.asarray(
        [1 if have else 0,
         -1 if data_timestamp is None else int(data_timestamp),
         1 if can_continue else 0,
         len(dims)] + dims,
        np.int64,
    )


def sync_batch_dims(
    vec: np.ndarray,
) -> Tuple[bool, bool, bool, Optional[int], Optional[np.ndarray]]:
    """Gather per-host dim vectors; returns
    (all_have, any_have, all_continue, min_timestamp, target_dims_or_None).

    Hosts without a batch contribute zeros for dims; the target is the
    elementwise max over hosts WITH data. Vector lengths must agree
    across hosts with data (same feature config => same pytree).
    """
    from jax.experimental import multihost_utils

    # fixed-width gather: hosts without data may have an empty dims tail
    width = int(
        multihost_utils.process_allgather(
            np.asarray([vec.shape[0]], np.int64)
        ).max()
    )
    padded = np.zeros((width,), np.int64)
    padded[: vec.shape[0]] = vec
    allv = np.asarray(
        multihost_utils.process_allgather(padded)
    )  # [P, width]
    have = allv[:, 0] > 0
    all_have = bool(have.all())
    any_have = bool(have.any())
    all_cont = bool((allv[:, 2] > 0).all())
    ts_col = allv[:, 1]
    ts_valid = ts_col[have] if any_have else ts_col
    min_ts = None
    if any_have and (ts_valid >= 0).all() and len(ts_valid):
        min_ts = int(ts_valid.min())
    # target spans every host that will STEP (provided dims) — not just
    # hosts with fresh data: a dummy-replay host's batch can be larger
    # in a jagged dim than any fresh batch and must still fit
    provided = allv[:, 3] > 0
    if not any_have or not provided.any():
        return all_have, any_have, all_cont, min_ts, None
    dims_rows = allv[provided][:, 4:]
    n = int(allv[provided][:, 3].max())
    target = dims_rows[:, :n].max(axis=0)
    return all_have, any_have, all_cont, min_ts, target


def pad_batch_to(
    batch: Batch, target_dims: np.ndarray,
    round_dim0_to: Optional[int] = None,
) -> Batch:
    """Pad every leaf up to the synced target shape.

    Pad values: sparse ids -1 (gather zeros, never updated), everything
    else 0 (weights, lengths, dense, labels). Leaf order must match
    batch_dims_vector.

    round_dim0_to: additionally round every leaf's dim0 up to this
    multiple — make_array_from_process_local_data needs each host's
    dim0 block to split evenly over its local devices, and jagged
    value streams have arbitrary N_pad. Must be identical on every
    host (local device count of a homogeneous pod).
    """
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    # classify leaves so ids pad with -1: walk the same pytree order
    # but with field context
    id_leaf = _id_value_leaf_mask(batch)
    pos = 0
    out = []
    for i, x in enumerate(leaves):
        a = np.asarray(x)
        nd = int(target_dims[pos]); pos += 1
        tgt = tuple(int(d) for d in target_dims[pos : pos + nd]); pos += nd
        if round_dim0_to and nd >= 1:
            m = int(round_dim0_to)
            tgt = (-(-tgt[0] // m) * m,) + tgt[1:]
        if a.ndim != nd:
            raise ValueError(
                f"multihost pytree mismatch: leaf {i} ndim {a.ndim} != {nd}"
            )
        if tuple(a.shape) == tgt:
            out.append(a)
            continue
        fill = -1 if id_leaf[i] else 0
        p = np.full(tgt, fill, dtype=a.dtype)
        p[tuple(slice(0, s) for s in a.shape)] = a
        out.append(p)
    return jax.tree_util.tree_unflatten(treedef, out)


def _id_value_leaf_mask(batch: Batch) -> List[bool]:
    """Which pytree leaves are sparse id values (pad -1 not 0)."""
    marked = jax.tree_util.tree_map(lambda x: False, batch)
    for d in (marked.sparse_features, marked.sequence_sparse_features):
        for f in d.values():
            f.values = True
    return jax.tree_util.tree_leaves(marked)


def attach_global_segments(batch: Batch, process_index: int,
                           num_processes: int) -> Batch:
    """Precompute global segment ids for jagged sparse fields.

    The global value stream is [host0 N_pad | host1 N_pad | ...]; each
    host's padding tail sits mid-stream, so segment ids derived from
    global cumulative lengths would be wrong. Host p's row r is global
    row p*B + r; padding slots get segment P*B (dropped by the pooled
    segment-sum, engine convention emb_engine.py:_flatten_group_ids).
    """
    for name, f in batch.sparse_features.items():
        if f.lengths is None:
            continue
        b = int(f.lengths.shape[0])
        n = int(np.asarray(f.values).shape[0])
        bg = b * num_processes
        seg = np.full((n,), bg, np.int32)
        local = np.repeat(
            np.arange(b, dtype=np.int32), np.asarray(f.lengths, np.int64)
        )
        seg[: local.shape[0]] = local + process_index * b
        f.segments = seg
    return batch


def make_global_batch(batch: Batch, mesh) -> Batch:
    """Per-process local batch -> global jax.Array batch.

    Every leaf with ndim>=1 row-concatenates over processes and shards
    dim0 on the data axis; 0-d leaves replicate (must agree across
    hosts).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def _to_global(x):
        a = np.asarray(x)
        if a.ndim == 0:
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), a
            )
        from torcheasyrec_tpu.parallel.mesh import data_axes

        spec = P(data_axes(mesh), *([None] * (a.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), a
        )

    return jax.tree_util.tree_map(_to_global, batch)


def local_rows(x, true_rows: Optional[int] = None) -> np.ndarray:
    """This process's rows of a dim0-sharded global array (host order),
    optionally trimmed to the true (pre-padding) local row count."""
    if isinstance(x, np.ndarray):
        return x if true_rows is None else x[:true_rows]
    shards = sorted(
        x.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    if len(shards) == len(x.sharding.device_set) and len(shards) > 0:
        # fully addressable (single process) — whole array
        a = np.asarray(x)
    else:
        a = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return a if true_rows is None else a[:true_rows]
