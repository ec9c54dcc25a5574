"""Native FG library tests: builds, matches the numpy fallback."""

import numpy as np

from torcheasyrec_tpu import fg
from torcheasyrec_tpu.fg import _np_hash_mod


def test_native_builds_and_matches_fallback():
    assert fg.available(), "g++ build of fg_ops.cc failed"
    tokens = ["beijing", "shanghai", "", "新疆", "x" * 300, "123"]
    nb = 100003
    native = fg.hash_strings_mod(tokens, nb)
    ref = _np_hash_mod(tokens, nb)
    np.testing.assert_array_equal(native, ref)
    assert (native >= 0).all() and (native < nb).all()


def test_native_bucketize_matches_numpy():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=10000)
    bounds = np.sort(rng.normal(size=37))
    native = fg.bucketize(vals, bounds)
    ref = np.searchsorted(bounds, vals, side="right")
    np.testing.assert_array_equal(native, ref)


def test_hash_throughput_sanity():
    """Native path handles a large batch quickly (pyfg DAG equivalent)."""
    import time

    tokens = [f"token_{i % 1000}_{i}" for i in range(200_000)]
    t0 = time.perf_counter()
    out = fg.hash_strings_mod(tokens, 1 << 22)
    dt = time.perf_counter() - t0
    assert len(out) == 200_000
    assert dt < 5.0, f"native hash too slow: {dt:.2f}s"


def test_split_hash_arrow_matches_python_path():
    import pyarrow as pa
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import feature_pb2
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    cfg = text_format.Parse(
        "id_feature { feature_name: 'tags' expression: 'item:tags' "
        "hash_bucket_size: 100000 embedding_dim: 8 separator: ',' }",
        feature_pb2.FeatureConfig(),
    )
    feat = create_features([cfg], fg_mode=FgMode.FG_NORMAL)[0]
    col = pa.array(["a,b,c", None, "", "solo", "x,y"])
    data = feat.parse({"tags": col})
    np.testing.assert_array_equal(data.lengths, [3, 0, 0, 1, 2])
    # values match the pure-python FNV path
    expected = fg.hash_strings_mod(["a", "b", "c", "solo", "x", "y"], 100000)
    np.testing.assert_array_equal(data.values, expected)


def test_seq_split_hash_matches_python():
    """Native two-level sequence split+hash must match the python path
    (tokens, per-step counts, per-row step counts) including empty
    rows, trailing delimiters, and multi-value steps."""
    import pyarrow as pa
    from google.protobuf import text_format

    from torcheasyrec_tpu import fg as fg_native
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import feature_pb2
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    if not fg_native.available():
        import pytest

        pytest.skip("native fg unavailable")

    cfg = text_format.Parse(
        """sequence_id_feature { feature_name: 'clicks'
           expression: 'item:clicks' hash_bucket_size: 1000
           embedding_dim: 8 sequence_length: 8 }""",
        feature_pb2.FeatureConfig(),
    )
    (feat,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
    data = {"clicks": pa.array([
        "a;b;c",
        "",                  # empty row -> 0 steps
        "x\x1dy;z",          # multi-value step
        "solo",
        "p;q;",              # trailing delim -> empty last step
    ])}
    got = feat.parse(data, False)

    # python reference path: force the fallback by disabling native
    lib = fg_native._LIB
    fg_native._LIB = None
    fg_native._TRIED = True
    try:
        ref = feat.parse(data, False)
    finally:
        fg_native._LIB = lib
    np.testing.assert_array_equal(got.seq_lengths, ref.seq_lengths)
    np.testing.assert_array_equal(got.lengths, ref.lengths)
    np.testing.assert_array_equal(got.values, ref.values)


def test_int_id_vectorized_matches_string_path():
    import pyarrow as pa
    """FG_NORMAL integer id columns (vectorized, no per-row python)
    must produce the same ids as the same values fed as strings."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import feature_pb2
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    rng = np.random.default_rng(3)
    ints = rng.integers(-5, 10**9, 500)
    for spec in (
        "id_feature { feature_name: 'x' expression: 'item:x' "
        "hash_bucket_size: 777 embedding_dim: 4 }",
        "id_feature { feature_name: 'x' expression: 'item:x' "
        "num_buckets: 1000 embedding_dim: 4 }",
    ):
        cfg = text_format.Parse(spec, feature_pb2.FeatureConfig())
        (feat,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
        got = feat.parse({"x": pa.array(ints)}, False)
        ref = feat.parse(
            {"x": pa.array([str(v) for v in ints])}, False
        )
        np.testing.assert_array_equal(got.lengths, ref.lengths, err_msg=spec)
        np.testing.assert_array_equal(got.values, ref.values, err_msg=spec)

    # nulls: no default -> dropped rows; with default -> filled
    cfg = text_format.Parse(
        "id_feature { feature_name: 'x' expression: 'item:x' "
        "num_buckets: 100 embedding_dim: 4 }",
        feature_pb2.FeatureConfig(),
    )
    (feat,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
    got = feat.parse({"x": pa.array([5, None, 7])}, False)
    np.testing.assert_array_equal(got.lengths, [1, 0, 1])
    np.testing.assert_array_equal(got.values, [5, 7])
    cfg.id_feature.default_value = "9"
    (feat,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
    got = feat.parse({"x": pa.array([5, None, 7])}, False)
    np.testing.assert_array_equal(got.lengths, [1, 1, 1])
    np.testing.assert_array_equal(got.values, [5, 9, 7])


def test_int_id_vocab_precedence_over_buckets():
    """vocab_list + num_buckets on an integer column: the vocab mapping
    must win (the vectorized bucket path only fires when buckets alone
    decide the mapping, matching _vocab_to_ids precedence)."""
    import pyarrow as pa
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import feature_pb2
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    cfg = text_format.Parse(
        "id_feature { feature_name: 'x' expression: 'item:x' "
        "vocab_list: ['7', '42'] num_buckets: 1000 embedding_dim: 4 }",
        feature_pb2.FeatureConfig(),
    )
    (feat,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
    ints = np.array([7, 42, 999])
    got = feat.parse({"x": pa.array(ints)}, False)
    ref = feat.parse({"x": pa.array([str(v) for v in ints])}, False)
    np.testing.assert_array_equal(got.values, ref.values)
    # vocab semantics, not clip-to-bucket: 7 -> 2, 42 -> 3, OOV -> 1
    np.testing.assert_array_equal(np.asarray(got.values), [2, 3, 1])
