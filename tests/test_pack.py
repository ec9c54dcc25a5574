"""Batch packing: narrow typed-buffer H2D coalescing (datasets/pack.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from torcheasyrec_tpu.datasets.pack import (
    PackedBatch,
    maybe_unpack,
    pack_and_put,
    pack_batch,
    unpack_batch,
)
from torcheasyrec_tpu.datasets.utils import (
    Batch,
    DenseField,
    SequenceDenseField,
    SparseField,
)


def _mixed_batch():
    return Batch(
        dense_features={
            "price": DenseField(values=np.array([[1.5], [2.5]], np.float32))
        },
        sparse_features={
            "cat": SparseField(values=np.array([[3], [-1]], np.int32)),
            "tags": SparseField(
                values=np.array([7, 8, 9, -1], np.int32),
                lengths=np.array([2, 1], np.int32),
                weights=np.array([0.1, 0.2, 0.3, 0.0], np.float32),
            ),
        },
        sequence_sparse_features={
            "clicks": SparseField(
                values=np.array([[1, 2, -1], [4, -1, -1]], np.int32),
                lengths=np.array([2, 1], np.int32),
            )
        },
        sequence_dense_features={
            "ts": SequenceDenseField(
                values=np.zeros((2, 3, 1), np.float32),
                lengths=np.array([2, 1], np.int32),
            )
        },
        labels={"label": np.array([1.0, 0.0], np.float32)},
        sample_weights={"w": np.array([1.0, 2.0], np.float32)},
    )


def test_pack_unpack_roundtrip():
    b = _mixed_batch()
    p = pack_batch(b)
    assert p.host_batch is b
    out = unpack_batch(p)
    la, lb = jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # structure preserved: lengths=None stays None
    assert out.sparse_features["cat"].is_fixed
    assert out.sparse_features["tags"].lengths is not None
    # int leaves always unpack back to int32 regardless of wire dtype
    assert np.asarray(out.sparse_features["cat"].values).dtype == np.int32


def test_narrow_int_packing_shrinks_bytes():
    b = _mixed_batch()
    p = pack_batch(b)
    # every int leaf here fits int8 -> wire bytes far below the legacy
    # everything-as-int32/float32 encoding
    n_int = sum(
        np.asarray(x).size
        for x in jax.tree_util.tree_leaves(b)
        if np.asarray(x).dtype.kind in "iu"
    )
    n_float = sum(
        np.asarray(x).size
        for x in jax.tree_util.tree_leaves(b)
        if np.asarray(x).dtype.kind == "f"
    )
    assert p.nbytes <= n_int + 4 * n_float


def test_sticky_widening_keeps_spec_stable():
    small = Batch(
        sparse_features={
            "cat": SparseField(values=np.array([[1], [2]], np.int32))
        },
    )
    wide = Batch(
        sparse_features={
            "cat": SparseField(values=np.array([[1], [100_000]], np.int32))
        },
    )
    p_wide = pack_batch(wide)
    # after seeing a wide batch, an identically-structured small batch
    # keeps the widened spec (no flip-flop retrace)
    p_small = pack_batch(small)
    assert p_small.spec == p_wide.spec
    out = unpack_batch(p_wide)
    np.testing.assert_array_equal(
        np.asarray(out.sparse_features["cat"].values), wide.sparse_features["cat"].values
    )


def test_dense_bf16_transfer():
    b = _mixed_batch()
    p = pack_batch(b, dense_bf16=True)
    import ml_dtypes

    kinds = {m[0] for m in p.spec[1]}
    assert "bf16" in kinds
    out = unpack_batch(p)
    # dense features travel bf16; labels/weights stay exact float32
    assert np.asarray(out.dense_features["price"].values).dtype == np.dtype(
        ml_dtypes.bfloat16
    )
    np.testing.assert_array_equal(
        np.asarray(out.labels["label"]), b.labels["label"]
    )
    np.testing.assert_allclose(
        np.asarray(out.dense_features["price"].values, np.float32),
        b.dense_features["price"].values,
        rtol=1e-2,
    )


def test_packed_batch_through_jit():
    b = _mixed_batch()

    def fn(batch):
        batch = maybe_unpack(batch)
        pooled = jnp.zeros((2,), jnp.float32)
        f = batch.sparse_features["tags"]
        seg = jnp.repeat(
            jnp.arange(2, dtype=jnp.int32), f.lengths,
            total_repeat_length=f.values.shape[0],
        )
        w = jnp.where(f.values >= 0, f.weights, 0.0)
        pooled = pooled.at[seg].add(w)
        return pooled + batch.labels["label"]

    plain = jax.jit(fn)(jax.device_put(b))
    packed = jax.jit(fn)(pack_and_put(b))
    np.testing.assert_allclose(np.asarray(plain), np.asarray(packed))


def test_pack_and_put_keeps_host_batch():
    b = _mixed_batch()
    p = pack_and_put(b)
    assert isinstance(p, PackedBatch)
    assert p.host_batch is b
    assert isinstance(p.wire, jax.Array)


def test_spec_is_hashable_and_stable():
    b = _mixed_batch()
    p1, p2 = pack_batch(b), pack_batch(b)
    assert hash(p1.spec) == hash(p2.spec)
    assert p1.spec == p2.spec
