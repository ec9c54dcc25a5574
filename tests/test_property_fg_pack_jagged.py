"""Hypothesis property tests over the three structure-preserving paths
the frameworks correctness hinges on (VERDICT r2 #10; reference uses
hypothesis for its kernel tests, tzrec/utils/test_util.py:123-168):

- FG parse: Arrow columns -> ParsedData invariants (id ranges, length
  bookkeeping, bucketize == searchsorted) for arbitrary inputs.
- pack/unpack: the narrow-wire batch transport must round-trip any
  Batch bit-exactly (ints in the smallest dtype, restore to int32).
- jagged ops: concat/split round-trip and masked-bmm reference parity
  on arbitrary jagged shapes.
"""

import numpy as np
import pyarrow as pa
from google.protobuf import text_format
from hypothesis import given, settings
from hypothesis import strategies as st

from torcheasyrec_tpu.protos import feature_pb2

_SETTINGS = dict(max_examples=30, deadline=None)


def _feature(text: str):
    from torcheasyrec_tpu.features import create_features

    return create_features(
        [text_format.Parse(text, feature_pb2.FeatureConfig())]
    )[0]


# ---------------------------------------------------------------- FG parse


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-5, 10 ** 12)),
        min_size=1, max_size=40,
    ),
    buckets=st.integers(1, 10 ** 6),
)
def test_id_num_buckets_clips_and_counts(vals, buckets):
    f = _feature(
        "id_feature { feature_name: 'c' num_buckets: %d embedding_dim: 4 "
        "fg_encoded_default_value: '0' }" % buckets
    )
    out = f.parse({"c": pa.array(vals, type=pa.int64())})
    # oversize pre-encoded ids clip into the table (megatable-aliasing
    # guard); negatives pass through as the engine's invalid marker
    pos = out.values[out.values >= 0]
    assert pos.size == 0 or pos.max() < buckets
    assert out.lengths.sum() == len(out.values)
    assert len(out.lengths) == len(vals)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.lists(st.integers(0, 10 ** 9), min_size=0, max_size=6),
        min_size=1, max_size=20,
    ),
    buckets=st.integers(2, 10 ** 5),
)
def test_id_hash_multivalue_lengths(rows, buckets):
    """Multi-value string ids: lengths count tokens per row; every id
    lands in [0, hash_bucket_size)."""
    f = _feature(
        "id_feature { feature_name: 'c' hash_bucket_size: %d "
        "embedding_dim: 4 }" % buckets
    )
    col = pa.array(
        [chr(3).join(str(t) for t in row) if row else None
         for row in rows]
    )
    out = f.parse({"c": col})
    expect_lengths = [len(r) for r in rows]
    assert list(out.lengths) == expect_lengths
    assert len(out.values) == sum(expect_lengths)
    if len(out.values):
        assert out.values.min() >= 0 and out.values.max() < buckets


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.integers(-10 ** 4, 10 ** 4).map(lambda i: i + 0.5),
        min_size=1, max_size=40,
    ),
    bounds=st.lists(
        st.integers(-10 ** 4, 10 ** 4), min_size=1, max_size=8,
        unique=True,
    ),
)
def test_raw_boundaries_match_searchsorted(vals, bounds):
    """FG_NORMAL bucketize (C++ fg_bucketize or numpy fallback) ==
    searchsorted-right. Values sit between integer boundaries so f32
    storage rounding cannot flip buckets."""
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    bounds = sorted(bounds)
    cfg = text_format.Parse(
        "raw_feature { feature_name: 'r' embedding_dim: 4 boundaries: [%s] "
        "expression: 'user:r' }"
        % ", ".join(repr(float(b)) for b in bounds),
        feature_pb2.FeatureConfig(),
    )
    f = create_features([cfg], fg_mode=FgMode.FG_NORMAL)[0]
    out = f.parse({"r": pa.array(np.asarray(vals, np.float32))})
    expect = np.searchsorted(
        np.asarray(bounds, np.float64),
        np.asarray(vals, np.float64),
        side="right",
    )
    np.testing.assert_array_equal(np.asarray(out.values), expect)
    assert out.values.max() < len(bounds) + 1  # fits the table


@settings(**_SETTINGS)
@given(
    seqs=st.lists(
        st.lists(st.integers(0, 999), min_size=0, max_size=7),
        min_size=1, max_size=16,
    ),
)
def test_sequence_parse_length_bookkeeping(seqs):
    f = _feature(
        "sequence_id_feature { feature_name: 's' num_buckets: 1000 "
        "embedding_dim: 4 sequence_length: 8 sequence_delim: ';' }"
    )
    col = pa.array(
        [";".join(str(t) for t in s) if s else None for s in seqs]
    )
    out = f.parse({"s": col})
    # steps per sample match the token counts; empty rows parse to the
    # default (one step) or zero steps — either way totals reconcile
    assert len(out.seq_lengths) == len(seqs)
    assert out.lengths.sum() == len(out.values)
    assert out.seq_lengths.sum() == len(out.lengths)
    nonempty = [s for s in seqs if s]
    if len(nonempty) == len(seqs):
        assert list(out.seq_lengths) == [len(s) for s in seqs]
        np.testing.assert_array_equal(
            np.asarray(out.values),
            np.concatenate([np.asarray(s) for s in seqs]),
        )


# ---------------------------------------------------------------- pack


def _batch_strategy():
    n = st.shared(st.integers(1, 12), key="b")

    def arrays(b):
        return st.fixed_dictionaries({
            "dense": st.lists(
                st.floats(-1e4, 1e4, allow_nan=False, width=32),
                min_size=b * 3, max_size=b * 3,
            ),
            "ids": st.lists(
                st.integers(-1, 2 ** 31 - 2), min_size=b, max_size=b
            ),
            "label": st.lists(
                st.floats(0, 1, allow_nan=False, width=32),
                min_size=b, max_size=b,
            ),
        })

    return n.flatmap(arrays), n


@settings(**_SETTINGS)
@given(data=st.data())
def test_pack_roundtrip_bit_exact(data):
    from torcheasyrec_tpu.datasets.pack import pack_batch, unpack_batch
    from torcheasyrec_tpu.datasets.utils import (
        Batch,
        DenseField,
        SparseField,
    )

    arrays_st, n_st = _batch_strategy()
    d = data.draw(arrays_st)
    b = len(d["label"])
    batch = Batch(
        dense_features={
            "num": DenseField(
                values=np.asarray(d["dense"], np.float32).reshape(b, 3)
            )
        },
        sparse_features={
            "cat": SparseField(
                values=np.asarray(d["ids"], np.int64),
                lengths=np.ones((b,), np.int32),
            )
        },
        labels={"y": np.asarray(d["label"], np.float32)},
    )
    packed = pack_batch(batch)
    out = unpack_batch(packed)
    np.testing.assert_array_equal(
        np.asarray(out.dense_features["num"].values),
        batch.dense_features["num"].values,
    )
    # int leaves restore to int32 with exact values (envelope-chosen
    # narrow wire dtype must never clip)
    np.testing.assert_array_equal(
        np.asarray(out.sparse_features["cat"].values),
        batch.sparse_features["cat"].values.astype(np.int32),
    )
    np.testing.assert_array_equal(
        np.asarray(out.labels["y"]), batch.labels["y"]
    )


@settings(**_SETTINGS)
@given(
    ids_a=st.lists(st.integers(0, 100), min_size=4, max_size=4),
    ids_b=st.lists(st.integers(-1, 2 ** 30), min_size=4, max_size=4),
)
def test_pack_unify_spec_widens_safely(ids_a, ids_b):
    """Two batches whose int envelopes differ must unify to one wire
    spec that round-trips BOTH exactly (mp loader cross-worker merge)."""
    from torcheasyrec_tpu.datasets.pack import (
        pack_batch,
        unify_spec,
        unpack_batch,
    )
    from torcheasyrec_tpu.datasets.utils import Batch, SparseField

    def mk(ids):
        return Batch(
            dense_features={},
            sparse_features={
                "cat": SparseField(
                    values=np.asarray(ids, np.int64),
                    lengths=np.ones((len(ids),), np.int32),
                )
            },
            labels={},
        )

    state: dict = {}
    p1 = unify_spec(pack_batch(mk(ids_a)), state)
    p2 = unify_spec(pack_batch(mk(ids_b)), state)
    # sticky envelopes: once widened, later narrow batches keep the
    # wide spec (so jit retraces a bounded number of times)
    p3 = unify_spec(pack_batch(mk(ids_a)), state)
    assert p3.spec == p2.spec
    for p, ids in ((p1, ids_a), (p2, ids_b), (p3, ids_a)):
        got = np.asarray(unpack_batch(p).sparse_features["cat"].values)
        np.testing.assert_array_equal(got, np.asarray(ids, np.int32))


# ---------------------------------------------------------------- jagged


@settings(**_SETTINGS)
@given(
    b=st.integers(1, 5),
    na=st.integers(1, 6),
    nb=st.integers(1, 6),
    d=st.integers(1, 4),
    data=st.data(),
)
def test_concat_split_jagged_roundtrip(b, na, nb, d, data):
    import jax.numpy as jnp

    from torcheasyrec_tpu.ops.jagged import (
        concat_2D_jagged,
        split_2D_jagged,
    )

    rng = np.random.default_rng(data.draw(st.integers(0, 2 ** 31)))
    la = np.asarray(
        [data.draw(st.integers(0, na)) for _ in range(b)], np.int32
    )
    lb = np.asarray(
        [data.draw(st.integers(0, nb)) for _ in range(b)], np.int32
    )
    av = rng.normal(size=(b, na, d)).astype(np.float32)
    bv = rng.normal(size=(b, nb, d)).astype(np.float32)
    out, lo = concat_2D_jagged(
        jnp.asarray(av), jnp.asarray(la), jnp.asarray(bv), jnp.asarray(lb)
    )
    out = np.asarray(out)
    np.testing.assert_array_equal(np.asarray(lo), la + lb)
    for i in range(b):
        np.testing.assert_allclose(out[i, : la[i]], av[i, : la[i]])
        np.testing.assert_allclose(
            out[i, la[i] : la[i] + lb[i]], bv[i, : lb[i]]
        )
    a2, b2 = split_2D_jagged(
        jnp.asarray(out), jnp.asarray(la), na, nb, jnp.asarray(lb)
    )
    a2, b2 = np.asarray(a2), np.asarray(b2)
    for i in range(b):
        np.testing.assert_allclose(a2[i, : la[i]], av[i, : la[i]])
        np.testing.assert_allclose(b2[i, : lb[i]], bv[i, : lb[i]])
        # zero past the segment
        assert not a2[i, la[i]:].any()
        assert not b2[i, lb[i]:].any()


@settings(**_SETTINGS)
@given(
    b=st.integers(1, 4),
    n=st.integers(1, 6),
    k=st.integers(1, 4),
    d=st.integers(1, 4),
    seed=st.integers(0, 2 ** 31),
    data=st.data(),
)
def test_jagged_bmm_matches_loop_reference(b, n, k, d, seed, data):
    import jax.numpy as jnp

    from torcheasyrec_tpu.ops.jagged import jagged_dense_bmm_broadcast_add

    rng = np.random.default_rng(seed)
    lengths = np.asarray(
        [data.draw(st.integers(0, n)) for _ in range(b)], np.int32
    )
    seq = rng.normal(size=(b, n, k)).astype(np.float32)
    dense = rng.normal(size=(b, k, d)).astype(np.float32)
    bias = rng.normal(size=(b, d)).astype(np.float32)
    got = np.asarray(jagged_dense_bmm_broadcast_add(
        jnp.asarray(seq), jnp.asarray(lengths), jnp.asarray(dense),
        jnp.asarray(bias),
    ))
    for i in range(b):
        expect = seq[i] @ dense[i] + bias[i][None, :]
        np.testing.assert_allclose(
            got[i, : lengths[i]], expect[: lengths[i]], rtol=1e-5,
            atol=1e-5,
        )
        assert not got[i, lengths[i]:].any()
