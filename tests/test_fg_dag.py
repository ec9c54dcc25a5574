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
    }


def test_dag_matches_python_paths():
    feats = _features()
    data = _data()
    dag = FgDag(feats)
    handled = {f.name for f in feats if dag.handles(f.name)}
    assert handled == {"cat", "tags", "price", "ctr", "cat_x_cty", "kv"}

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
