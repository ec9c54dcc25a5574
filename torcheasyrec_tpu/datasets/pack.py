"""Host->device batch coalescing.

The reference moves one pinned-memory KJT per data group H2D on a side
stream (/root/reference/tzrec/datasets/utils.py:344-408 Batch.to). On
TPU through a dispatch-latency-bound host link, the equivalent levers
are COUNT and BYTES: every transferred array pays a fixed per-buffer
tunnel cost (measured ~0.2 ms each), so the host packs the WHOLE batch
into ONE uint8 wire buffer moved in a single ``jax.device_put``; the
jitted step slices it and ``lax.bitcast_convert_type``s each section
back to its dtype — static slices/bitcasts that XLA fuses into the
consumers (host and TPU are both little-endian, and the round-trip is
covered by tests on both backends).

Bytes are minimized by narrowing each integer leaf to the smallest
dtype that holds its value envelope (u8/i8/u16/i16/i32): most id
columns address tables far smaller than 2^31, so this roughly halves
the wire volume of a Criteo-shaped batch. The envelope is STICKY per
(batch structure, leaf position) — it only ever widens — so the packed
spec (and therefore the jit trace) stays stable across batches instead
of flip-flopping with per-batch data ranges.

Dense float features can additionally travel as bfloat16
(``dense_bf16=True``): under BF16 mixed precision the model casts them
to bf16 anyway, so the narrower transfer is numerically free.

``pack_batch`` keeps a reference to the original host Batch
(``host_batch``, not a pytree child) so host-side consumers (metrics,
delta dump, ZCH stats) read the numpy originals for free.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

# widening envelopes, checked in order
_INT_KINDS = (
    ("u8", 0, 2**8 - 1),
    ("i8", -(2**7), 2**7 - 1),
    ("u16", 0, 2**16 - 1),
    ("i16", -(2**15), 2**15 - 1),
    ("i32", -(2**31), 2**31 - 1),
)

# treedef -> per-leaf (lo, hi) value envelopes seen so far; sticky so
# the packed spec never narrows back (no retrace flip-flop)
_ENVELOPES: Dict[Any, Dict[int, Tuple[int, int]]] = {}

_NP_DTYPES: Dict[str, Any] = {}
_JNP_DTYPES: Dict[str, Any] = {}


def _init_dtypes() -> None:
    import jax.numpy as jnp
    import ml_dtypes

    _NP_DTYPES.update(
        u8=np.dtype(np.uint8), i8=np.dtype(np.int8),
        u16=np.dtype(np.uint16), i16=np.dtype(np.int16),
        i32=np.dtype(np.int32), f32=np.dtype(np.float32),
        bf16=np.dtype(ml_dtypes.bfloat16),
    )
    _JNP_DTYPES.update(
        u8=jnp.uint8, i8=jnp.int8, u16=jnp.uint16, i16=jnp.int16,
        i32=jnp.int32, f32=jnp.float32, bf16=jnp.bfloat16,
    )


def _int_kind(lo: int, hi: int) -> str:
    for kind, klo, khi in _INT_KINDS:
        if lo >= klo and hi <= khi:
            return kind
    return "i32"  # out-of-range values clamp to the legacy int32 path


_ITEMSIZE = {
    "u8": 1, "i8": 1, "u16": 2, "i16": 2, "i32": 4, "f32": 4, "bf16": 2
}


@jax.tree_util.register_pytree_node_class
class PackedBatch:
    """One uint8 wire buffer + a static reconstruction spec.

    spec = (treedef, metas) with metas[i] = (kind, byte_offset, shape,
    restore); kind names the wire dtype, restore is "i" (-> int32),
    "b" (-> bool) or "f" (keep the wire dtype). Hashable, so jit
    retraces exactly when the packed signature changes.

    ``host_batch`` is LAZY: producers that only have the wire (the mp
    loader consumer) attach a thunk instead of eagerly rebuilding host
    views — restoring narrow int leaves to int32 copies ~0.5 ms/batch
    that steps without host-side consumers (metrics off, no ZCH/delta
    dump) never need. First access runs the thunk once and caches.
    """

    __slots__ = ("wire", "spec", "_hb", "_hb_thunk")

    def __init__(self, wire, spec, host_batch=None):
        self.wire = wire
        self.spec = spec
        self._hb = host_batch
        self._hb_thunk = None

    @property
    def host_batch(self):
        if self._hb is None and self._hb_thunk is not None:
            self._hb = self._hb_thunk()
            self._hb_thunk = None
        return self._hb

    @host_batch.setter
    def host_batch(self, value) -> None:
        self._hb = value
        self._hb_thunk = None

    def set_host_batch_thunk(self, thunk) -> None:
        """Defer host-view reconstruction to first ``host_batch`` read."""
        self._hb = None
        self._hb_thunk = thunk

    def _share_host_batch(self, other: "PackedBatch") -> None:
        """Read ``other``'s host_batch lazily (and share its cache)."""
        if other._hb is not None:
            self.host_batch = other._hb
        elif other._hb_thunk is not None:
            self.set_host_batch_thunk(lambda o=other: o.host_batch)

    def tree_flatten(self):
        return (self.wire,), self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        return cls(children[0], spec)

    @property
    def nbytes(self) -> int:
        return int(np.asarray(self.wire).nbytes)


def _dense_leaf_ids(batch) -> set:
    ids = set()
    for attr in ("dense_features", "sequence_dense_features"):
        for field in getattr(batch, attr, {}).values():
            v = getattr(field, "values", None)
            if v is not None:
                ids.add(id(v))
    return ids


def pack_batch(batch, dense_bf16: bool = False) -> PackedBatch:
    """Flatten a host (numpy) Batch into one narrow uint8 wire buffer."""
    if not _NP_DTYPES:
        _init_dtypes()
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    bf16_ids = _dense_leaf_ids(batch) if dense_bf16 else set()
    envs = _ENVELOPES.setdefault(treedef, {})
    plan = []  # (leaf ndarray, kind, restore)
    for idx, leaf in enumerate(leaves):
        a = np.asarray(leaf)
        if a.dtype.kind == "b":
            kind, restore = "u8", "b"
        elif a.dtype.kind in ("i", "u"):
            restore = "i"
            env = envs.get(idx)
            if env is not None and _int_kind(*env) == "i32":
                # envelope already at max width: the min/max scan can
                # never widen it further, skip it (the big-vocab id
                # columns dominate scan cost on Criteo-shaped batches)
                kind = "i32"
            else:
                if a.size:
                    lo, hi = int(a.min()), int(a.max())
                else:
                    lo, hi = 0, 0
                if env is not None:
                    lo, hi = min(lo, env[0]), max(hi, env[1])
                envs[idx] = (lo, hi)
                kind = _int_kind(lo, hi)
        else:
            restore = "f"
            kind = "bf16" if id(leaf) in bf16_ids else "f32"
        plan.append((a, kind, restore))
    # lay out 4-byte sections first, then 2-byte, then 1-byte: every
    # section offset stays aligned to its itemsize for the host views
    order = sorted(range(len(plan)), key=lambda i: -_ITEMSIZE[plan[i][1]])
    metas: list = [None] * len(plan)
    off = 0
    for i in order:
        a, kind, restore = plan[i]
        nb = int(a.size) * _ITEMSIZE[kind]
        metas[i] = (kind, off, a.shape, restore)
        off += nb
    wire = np.empty((off,), np.uint8)
    for i, (a, kind, restore) in enumerate(plan):
        _, o, _, _ = metas[i]
        nb = int(a.size) * _ITEMSIZE[kind]
        if nb:
            dst = wire[o : o + nb].view(_NP_DTYPES[kind])
            np.copyto(dst, a.ravel(), casting="unsafe")
    return PackedBatch(wire, (treedef, tuple(metas)), batch)


def unify_spec(packed: PackedBatch, kind_state: Dict[Any, list]) -> PackedBatch:
    """Consumer-side spec stabilizer for multi-process packing.

    Each mp worker carries its own sticky envelopes, so two workers can
    legally disagree on an int leaf's wire dtype (one saw only small
    ids); feeding those alternating specs to jit retraces the train
    step per variant. Track the widest kind seen per (treedef, leaf) in
    ``kind_state`` and repack any narrower batch to it — int mismatches
    widen to i32, which is always value-preserving because every
    restore=="i" leaf unpacks to int32 regardless of wire dtype.
    """
    treedef, metas = packed.spec
    kinds = [m[0] for m in metas]
    cur = kind_state.get(treedef)
    if cur is None:
        kind_state[treedef] = kinds
        return packed
    target = list(cur)
    for i, (a, b) in enumerate(zip(cur, kinds)):
        if a == b:
            continue
        # only int leaves (restore=='i') have legally-divergent wire
        # dtypes (sticky envelopes); a float/bool kind mismatch would
        # silently value-cast under casting='unsafe' — refuse it
        if metas[i][3] != "i":
            raise ValueError(
                f"pack spec mismatch on non-int leaf {i}: {a} vs {b} "
                f"(restore={metas[i][3]!r}) — workers disagree on a "
                "float/bool wire dtype"
            )
        target[i] = "i32"
    kind_state[treedef] = target
    if target == kinds:
        return packed
    return _repack(packed, target)


def _repack(packed: PackedBatch, target_kinds: list) -> PackedBatch:
    """Re-encode a host wire buffer with the given per-leaf kinds."""
    if not _NP_DTYPES:
        _init_dtypes()
    treedef, metas = packed.spec
    wire = packed.wire
    order = sorted(
        range(len(metas)), key=lambda i: -_ITEMSIZE[target_kinds[i]]
    )
    new_metas: list = [None] * len(metas)
    off = 0
    for i in order:
        _, _, shape, restore = metas[i]
        n = int(np.prod(shape)) if shape else 1
        new_metas[i] = (target_kinds[i], off, shape, restore)
        off += n * _ITEMSIZE[target_kinds[i]]
    new_wire = np.empty((off,), np.uint8)
    for i, (kind, o, shape, restore) in enumerate(metas):
        n = int(np.prod(shape)) if shape else 1
        if not n:
            continue
        src = wire[o : o + n * _ITEMSIZE[kind]].view(_NP_DTYPES[kind])
        tk, to, _, _ = new_metas[i]
        dst = new_wire[to : to + n * _ITEMSIZE[tk]].view(_NP_DTYPES[tk])
        np.copyto(dst, src, casting="unsafe")
    out = PackedBatch(new_wire, (treedef, tuple(new_metas)))
    out._share_host_batch(packed)
    return out


def unpack_batch(packed: PackedBatch):
    """Rebuild the Batch pytree from the wire buffer (jnp or numpy).

    Called inside jit: the slices/bitcasts are static, so XLA fuses
    them into the first consumer of each leaf — no materialized copies.
    On host numpy buffers the same sections are plain views.
    """
    if not _NP_DTYPES:
        _init_dtypes()
    treedef, metas = packed.spec
    wire = packed.wire
    on_host = isinstance(wire, np.ndarray)
    leaves = []
    for kind, off, shape, restore in metas:
        n = int(np.prod(shape)) if shape else 1
        isz = _ITEMSIZE[kind]
        sl = wire[off : off + n * isz]
        if on_host:
            part = sl.view(_NP_DTYPES[kind]).reshape(shape)
        else:
            from jax import lax

            if isz > 1:
                sl = sl.reshape(-1, isz)
            part = lax.bitcast_convert_type(sl, _JNP_DTYPES[kind]).reshape(
                shape
            )
        if restore == "i":
            if part.dtype != np.int32:
                part = part.astype(np.int32)
        elif restore == "b":
            part = part.astype(np.bool_)
        leaves.append(part)
    return jax.tree_util.tree_unflatten(treedef, leaves)


@jax.tree_util.register_pytree_node_class
class PackedBatchGroup:
    """K consecutive packed batches stacked into one (K, W) wire.

    The group moves H2D in ONE transfer and is consumed by ONE jitted
    multi-step dispatch (``make_train_step_scan`` scans over axis 0),
    amortizing per-call host->device dispatch latency over K training
    steps — the standard TPU host-pipeline pattern when the host link
    is dispatch-latency-bound. All rows share one reconstruction
    ``spec`` (the mp loader's ``unify_spec`` guarantees this; a spec
    change flushes the current group).

    ``host_batches`` / ``infos`` ride outside the pytree for host-side
    consumers (metrics, delta dump, checkpoint positions).
    """

    __slots__ = ("wire", "spec", "host_batches", "infos")

    def __init__(self, wire, spec, host_batches=None, infos=None):
        self.wire = wire
        self.spec = spec
        self.host_batches = host_batches
        self.infos = infos

    def tree_flatten(self):
        return (self.wire,), self.spec

    @classmethod
    def tree_unflatten(cls, spec, children):
        return cls(children[0], spec)

    @property
    def group_size(self) -> int:
        return int(self.wire.shape[0])

    def row(self, k: int) -> "PackedBatch":
        return PackedBatch(self.wire[k], self.spec)


def stack_packed(items) -> PackedBatchGroup:
    """Stack same-spec host PackedBatches into a PackedBatchGroup."""
    spec = items[0].spec
    for it in items[1:]:
        if it.spec != spec:
            raise ValueError("stack_packed requires identical specs")
    wire = np.stack([np.asarray(it.wire) for it in items])
    return PackedBatchGroup(wire, spec, host_batches=list(items))


def put_packed_group(g: PackedBatchGroup) -> PackedBatchGroup:
    """Move a host group H2D in one single-buffer transfer."""
    wire = jax.device_put(g.wire)
    return PackedBatchGroup(wire, g.spec, g.host_batches, g.infos)


def maybe_unpack(batch):
    return unpack_batch(batch) if isinstance(batch, PackedBatch) else batch


def put_packed(p: PackedBatch, host_batch: Optional[Any] = None) -> PackedBatch:
    """Move a host-packed batch H2D in one single-buffer transfer."""
    wire = jax.device_put(p.wire)
    out = PackedBatch(wire, p.spec)
    if host_batch is not None:
        out.host_batch = host_batch
    else:
        out._share_host_batch(p)
    return out


def pack_and_put(
    batch, host_batch: Optional[Any] = None, dense_bf16: bool = False
) -> PackedBatch:
    """Pack + single coalesced device transfer (prefetch-thread side)."""
    return put_packed(pack_batch(batch, dense_bf16=dense_bf16), host_batch)
