"""Native FG DAG executor parity: one C++ task-pool call must produce
exactly what the per-feature python FG_NORMAL paths produce."""

import numpy as np
import pyarrow as pa
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu import fg as fg_native
from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.fg.dag import FgDag
from torcheasyrec_tpu.protos import feature_pb2
from torcheasyrec_tpu.protos.data_pb2 import FgMode

pytestmark = pytest.mark.skipif(
    not fg_native.available(), reason="native fg lib unavailable"
)

FEATURES = [
    """id_feature { feature_name: 'cat' expression: 'item:cat'
       hash_bucket_size: 1000 embedding_dim: 8 }""",
    """id_feature { feature_name: 'tags' expression: 'item:tags'
       hash_bucket_size: 500 embedding_dim: 8 }""",
    """raw_feature { feature_name: 'price' expression: 'item:price'
       normalizer: 'method=log10,threshold=1e-10,default=-10' }""",
    """raw_feature { feature_name: 'ctr' expression: 'item:ctr'
       boundaries: [0.1, 0.5, 0.9] embedding_dim: 8 }""",
    """combo_feature { feature_name: 'cat_x_cty'
       expression: ['item:cat', 'user:cty']
       hash_bucket_size: 800 embedding_dim: 8 }""",
    """lookup_feature { feature_name: 'kv' 
       expression: ['item:kv_map', 'user:kv_key'] }""",
    """match_feature { feature_name: 'm'
       nested_map: 'user:nested' pkey: 'item:pk' skey: 'item:sk' }""",
    """overlap_feature { feature_name: 'ov' method: 'query_common_ratio'
       expression: ['user:query', 'item:title'] }""",
    """overlap_feature { feature_name: 'ovb' method: 'is_contain'
       expression: ['user:query', 'item:title']
       boundaries: [0.5] embedding_dim: 4 }""",
    """kv_dot_product { feature_name: 'kvd'
       expression: ['user:ukv', 'item:ikv'] }""",
    """kv_dot_product { feature_name: 'kvdb'
       expression: ['user:ukv', 'item:ikv']
       boundaries: [1.0, 5.0] embedding_dim: 4 }""",
]


def _features():
    cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in FEATURES
    ]
    return create_features(cfgs, fg_mode=FgMode.FG_NORMAL)


def _data():
    return {
        "cat": pa.array(["a", "b", "", "dd", "a"]),
        "tags": pa.array(
            ["x\x1dy\x1dz", "", "solo", "x\x1dy", "q"]
        ),
        "price": pa.array(["10.5", "", "0.0", "100", "2.5"]),
        "ctr": pa.array([0.05, None, 0.7, 0.95, 0.5]),  # null -> default
        "cty": pa.array(["us", "cn", "us", "", "de"]),
        # duplicate key (python dict keeps LAST) + non-numeric value
        # (python float() -> 0.0) probe the C++ parity edges
        "kv_map": pa.array(
            ["a:1.5\x1da:2.5", "b:7", "", "a:3xy", "c:9\x1da:4"]
        ),
        "kv_key": pa.array(["a", "b", "a", "a", "a"]),
        # match probes: duplicate pk groups (LAST group REPLACES the
        # whole entry, so a later group lacking skey clears the value),
        # malformed groups, empty/non-numeric values, nulls
        "nested": pa.array([
            "p1^a:1.5,b:2|p2^a:9",
            "p1^a:3|p1^b:4",          # later p1 group lacks 'a' -> 0
            "",                        # empty map
            "junk|p3^x:7xy,x:8",       # malformed group + dup key in grp
            None,                      # null map
        ]),
        "pk": pa.array(["p2", "p1", "p1", "p3", "p1"]),
        "sk": pa.array(["a", "a", "a", "x", "a"]),
        # overlap probes: duplicate tokens (set semantics), empty sides,
        # nulls, full containment
        "query": pa.array(["a\x1db\x1da", "", "x\x1dy", None, "q"]),
        "title": pa.array(["b\x1dc", "z", "x\x1dy\x1dw", "t", "q"]),
        # kv-dot probes: dup keys (last wins), unparseable values
        # (skipped), empty/null rows, disjoint key sets
        "ukv": pa.array(
            ["a:2\x1db:3\x1da:4", "a:1", "", "a:zz\x1db:2", None]
        ),
        "ikv": pa.array(
            ["a:10\x1dc:5", "a:3xy\x1da:", "b:1", "b:4\x1da:6", "a:1"]
        ),
    }


def test_dag_matches_python_paths():
    feats = _features()
    data = _data()
    dag = FgDag(feats)
    handled = {f.name for f in feats if dag.handles(f.name)}
    assert handled == {"cat", "tags", "price", "ctr", "cat_x_cty", "kv",
                       "m", "ov", "ovb", "kvd", "kvdb"}

    native = dag.parse(data, False)
    for f in feats:
        ref = f.parse(data, False)
        got = native[f.name]
        assert type(got).__name__ == type(ref).__name__, f.name
        if hasattr(ref, "ids") or type(ref).__name__ == "SparseData":
            np.testing.assert_array_equal(
                got.values, ref.values, err_msg=f.name
            )
            np.testing.assert_array_equal(
                got.lengths, ref.lengths, err_msg=f.name
            )
        else:
            np.testing.assert_allclose(
                got.values, ref.values, rtol=1e-6, err_msg=f.name
            )


def test_dag_through_data_parser():
    from torcheasyrec_tpu.datasets.data_parser import DataParser

    feats = _features()
    parser = DataParser(feats)
    assert parser._fg_dag is not None and parser._fg_dag._native
    batch = parser.parse_to_batch(
        {**_data(), "label": pa.array([1.0, 0.0, 1.0, 0.0, 1.0])}
    )
    assert "cat" in batch.sparse_features
    assert "price" in batch.dense_features


def test_dag_match_kv_randomized_parity():
    """Property-style fuzz: random nested maps / kv maps must agree
    between the C++ kernels and the python reference paths."""
    rng = np.random.default_rng(0)
    n = 400
    keys = ["a", "bb", "ccc", "d"]
    pks = ["p1", "p2", "p3"]

    def rand_val():
        r = rng.random()
        if r < 0.2:
            return ""  # empty value
        if r < 0.35:
            return "x9z"  # non-numeric
        return f"{rng.normal():.4g}"

    nested_rows, kv_rows = [], []
    for _ in range(n):
        if rng.random() < 0.1:
            nested_rows.append(None)
        else:
            groups = []
            for _ in range(rng.integers(0, 4)):
                pk = pks[rng.integers(0, len(pks))]
                kvs = ",".join(
                    f"{keys[rng.integers(0, len(keys))]}:{rand_val()}"
                    for _ in range(rng.integers(0, 4))
                )
                groups.append(f"{pk}^{kvs}")
            nested_rows.append("|".join(groups))
        if rng.random() < 0.1:
            kv_rows.append(None)
        else:
            kv_rows.append("\x1d".join(
                f"{keys[rng.integers(0, len(keys))]}:{rand_val()}"
                for _ in range(rng.integers(0, 5))
            ))
    data = {
        "nested": pa.array(nested_rows),
        "pk": pa.array([pks[rng.integers(0, len(pks))] for _ in range(n)]),
        "sk": pa.array([keys[rng.integers(0, len(keys))] for _ in range(n)]),
        "kv_map": pa.array(kv_rows),
        "kv_key": pa.array(
            [keys[rng.integers(0, len(keys))] for _ in range(n)]
        ),
    }
    toks = ["a", "bb", "ccc", "d", "ee"]
    data["query"] = pa.array([
        None if rng.random() < 0.1 else "\x1d".join(
            toks[rng.integers(0, len(toks))]
            for _ in range(rng.integers(0, 6))
        ) for _ in range(n)
    ])
    data["title"] = pa.array([
        None if rng.random() < 0.1 else "\x1d".join(
            toks[rng.integers(0, len(toks))]
            for _ in range(rng.integers(0, 6))
        ) for _ in range(n)
    ])
    cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in [
            """match_feature { feature_name: 'm'
               nested_map: 'user:nested' pkey: 'item:pk'
               skey: 'item:sk' }""",
            """lookup_feature { feature_name: 'kv'
               expression: ['item:kv_map', 'user:kv_key'] }""",
            """overlap_feature { feature_name: 'ov'
               method: 'title_common_ratio'
               expression: ['user:query', 'item:title'] }""",
            """overlap_feature { feature_name: 'ove' method: 'is_equal'
               expression: ['user:query', 'item:title'] }""",
            """kv_dot_product { feature_name: 'kvd'
               expression: ['user:kv_map', 'item:kv_map2'] }""",
        ]
    ]
    data["kv_map2"] = pa.array([
        None if rng.random() < 0.1 else "\x1d".join(
            f"{keys[rng.integers(0, len(keys))]}:{rand_val()}"
            for _ in range(rng.integers(0, 5))
        ) for _ in range(n)
    ])
    feats = create_features(cfgs, fg_mode=FgMode.FG_NORMAL)
    dag = FgDag(feats)
    assert dag.handles("m") and dag.handles("kv")
    assert dag.handles("ov") and dag.handles("ove")
    assert dag.handles("kvd")
    native = dag.parse(data, False)
    for f in feats:
        ref = f.parse(data, False)
        np.testing.assert_allclose(
            native[f.name].values, ref.values, rtol=1e-6, atol=1e-7,
            err_msg=f.name,
        )


def test_kv_dot_parity_bail_falls_back_to_python():
    """Values outside plain decimal/scientific notation (hex floats,
    whitespace — where strtod and python float() disagree) make the
    native kv-dot task bail; through DataParser the python path must
    produce the feature with python semantics."""
    import pyarrow as pa
    from google.protobuf import text_format

    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.fg.dag import FgDag
    from torcheasyrec_tpu.protos import feature_pb2
    from torcheasyrec_tpu.protos.data_pb2 import FgMode

    cfg = text_format.Parse(
        """kv_dot_product { feature_name: 'kvd'
           expression: ['user:ukv', 'item:ikv'] }""",
        feature_pb2.FeatureConfig(),
    )
    (feat,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
    data = {
        # 0x10: strtod parses 16.0, python float() raises -> pair skipped
        "ukv": pa.array(["a:2\x1db:3", "a:0x10", "a: 1"]),
        "ikv": pa.array(["a:10", "a:2", "a:5"]),
    }
    dag = FgDag([feat])
    assert dag.handles("kvd")
    native = dag.parse(data, False)
    # python semantics: float('0x10') raises -> pair skipped (dot 0),
    # float(' 1') = 1.0 (whitespace tolerated) -> 1*5
    np.testing.assert_allclose(
        np.asarray(native["kvd"].values).ravel(), [20.0, 0.0, 5.0],
        rtol=1e-6,
    )

    parser = DataParser([feat])
    batch = parser.parse_to_batch(data)
    got = np.asarray(batch.dense_features["kvd"].values).ravel()
    np.testing.assert_allclose(got, [20.0, 0.0, 5.0], rtol=1e-6)


def test_id_vocab_native_matches_python():
    """The ID_VOCAB kernel (sorted-blob bsearch) must reproduce
    table.get(str(t), oov) exactly: dbv layouts, default_value
    mapping, unicode byte-order, empty strings, int columns, nulls
    with default; null-without-default bails to the python path."""
    specs = [
        # vocab_list, reference layout (default->0, OOV->1, toks i+2)
        """id_feature { feature_name: 'v1' expression: 'item:s'
           default_value: 'bb' embedding_dim: 4
           vocab_list: ['aa', 'bb', 'zz', 'é中'] }""",
        # vocab_list with default_bucketize_value (raw positions)
        """id_feature { feature_name: 'v2' expression: 'item:s'
           default_bucketize_value: 9 embedding_dim: 4
           vocab_list: ['aa', 'bb', 'zz', 'é中'] }""",
        # vocab_dict
        """id_feature { feature_name: 'v3' expression: 'item:s'
           embedding_dim: 4
           vocab_dict { key: 'aa' value: 3 } vocab_dict { key: '' value: 5 }
           vocab_dict { key: 'zzz' value: 7 } }""",
        # integer column through a vocab (str(t) semantics)
        """id_feature { feature_name: 'v4' expression: 'item:i'
           embedding_dim: 4 default_value: '7'
           vocab_list: ['7', '42', '100'] }""",
    ]
    cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in specs
    ]
    feats = create_features(cfgs, fg_mode=FgMode.FG_NORMAL)
    data = {
        "s": pa.array(["aa", "zz", "", "é中", "missing", None,
                       "a", "zzz", "bb"]),
        "i": pa.array([7, 42, 101, None, 0, 42, 7, 9, 100]),
    }
    dag = FgDag(feats)
    for f in feats:
        assert dag.handles(f.name), f.name
    native = dag.parse(data, False)
    for f in feats:
        ref = f.parse(data, False)
        got = native[f.name]
        np.testing.assert_array_equal(
            got.values, ref.values, err_msg=f.name
        )
        np.testing.assert_array_equal(
            got.lengths, ref.lengths, err_msg=f.name
        )

    # nulls WITHOUT default_value: python drops the row (length 0) —
    # the native task must bail and the DataParser fallback must agree
    cfg = text_format.Parse(
        """id_feature { feature_name: 'v5' expression: 'item:s'
           embedding_dim: 4 vocab_list: ['aa', 'bb'] }""",
        feature_pb2.FeatureConfig(),
    )
    (f5,) = create_features([cfg], fg_mode=FgMode.FG_NORMAL)
    dag5 = FgDag([f5])
    native5 = dag5.parse(data, False)
    ref5 = f5.parse(data, False)
    np.testing.assert_array_equal(native5["v5"].values, ref5.values)
    np.testing.assert_array_equal(native5["v5"].lengths, ref5.lengths)
    assert (ref5.lengths == 0).any()  # the null row was dropped
