"""Host->device batch coalescing.

The reference moves one pinned-memory KJT per data group H2D on a side
stream (/root/reference/tzrec/datasets/utils.py:344-408 Batch.to). On
TPU through a dispatch-latency-bound host link, the equivalent lever is
COUNT: a Batch pytree has dozens of small leaves and every leaf is its
own transfer, so the host packs the whole batch into two flat buffers
(one int32, one float32 — two H2D calls total) and the jitted step
unpacks them with static slices that XLA fuses into the consumers.

``pack_batch`` keeps a reference to the original host Batch
(``host_batch``, not a pytree child) so host-side consumers (metrics,
delta dump, ZCH stats) read the numpy originals for free.
"""

import dataclasses
from typing import Any, Optional, Tuple

import jax
import numpy as np


@jax.tree_util.register_pytree_node_class
class PackedBatch:
    """Two flat buffers + a static reconstruction spec.

    spec = (treedef, metas) where metas[i] = (kind, offset, shape)
    with kind "i" (int32 buffer) or "f" (float32 buffer), offset in
    elements. Hashable, so jit retraces exactly when the batch's
    bucketed shape signature changes (which already forces a retrace).
    """

    __slots__ = ("ints", "floats", "spec", "host_batch")

    def __init__(self, ints, floats, spec, host_batch=None):
        self.ints = ints
        self.floats = floats
        self.spec = spec
        self.host_batch = host_batch

    def tree_flatten(self):
        return (self.ints, self.floats), self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        return cls(children[0], children[1], spec)


def pack_batch(batch) -> PackedBatch:
    """Flatten a host (numpy) Batch into one int32 + one float32 buffer."""
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    metas = []
    int_parts = []
    float_parts = []
    int_off = 0
    float_off = 0
    for leaf in leaves:
        a = np.asarray(leaf)
        n = int(a.size)
        if a.dtype.kind in ("i", "u", "b"):
            int_parts.append(a.astype(np.int32, copy=False).ravel())
            metas.append(("i", int_off, a.shape))
            int_off += n
        else:
            float_parts.append(a.astype(np.float32, copy=False).ravel())
            metas.append(("f", float_off, a.shape))
            float_off += n
    ints = (
        np.concatenate(int_parts) if int_parts else np.zeros((0,), np.int32)
    )
    floats = (
        np.concatenate(float_parts)
        if float_parts
        else np.zeros((0,), np.float32)
    )
    return PackedBatch(ints, floats, (treedef, tuple(metas)), batch)


def unpack_batch(packed: PackedBatch):
    """Rebuild the Batch pytree from the buffers (jnp or numpy).

    Called inside jit: the slices are static, so XLA fuses them into
    the first consumer of each leaf — no materialized copies.
    """
    treedef, metas = packed.spec
    ints, floats = packed.ints, packed.floats
    leaves = []
    for kind, off, shape in metas:
        buf = ints if kind == "i" else floats
        n = int(np.prod(shape)) if shape else 1
        leaves.append(buf[off : off + n].reshape(shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def maybe_unpack(batch):
    return unpack_batch(batch) if isinstance(batch, PackedBatch) else batch


def pack_and_put(batch, host_batch: Optional[Any] = None) -> PackedBatch:
    """Pack + single two-array device transfer (prefetch-thread side)."""
    p = pack_batch(batch)
    ints, floats = jax.device_put((p.ints, p.floats))
    return PackedBatch(ints, floats, p.spec, host_batch or batch)
