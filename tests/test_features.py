"""Feature-layer tests: fg-encoded parsing semantics vs reference behavior."""

import numpy as np
import pyarrow as pa
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.features.feature import (
    DenseData,
    SequenceSparseData,
    SparseData,
)
from torcheasyrec_tpu.protos import feature_pb2
from torcheasyrec_tpu.protos.data_pb2 import FgMode


def _mk(cfg_text: str) -> feature_pb2.FeatureConfig:
    return text_format.Parse(cfg_text, feature_pb2.FeatureConfig())


def test_id_feature_fg_encoded_int():
    cfg = _mk("id_feature { feature_name: 'cat_0' num_buckets: 100 embedding_dim: 8 }")
    feats = create_features([cfg])
    assert len(feats) == 1
    f = feats[0]
    assert f.is_sparse and f.num_embeddings == 100 and f.output_dim == 8
    data = f.parse({"cat_0": pa.array([3, None, 7], type=pa.int64())})
    assert isinstance(data, SparseData)
    np.testing.assert_array_equal(data.values, [3, 7])
    np.testing.assert_array_equal(data.lengths, [1, 0, 1])


def test_id_feature_fg_encoded_string_multival():
    cfg = _mk(
        "id_feature { feature_name: 'tags' num_buckets: 1000 embedding_dim: 4 }"
    )
    f = create_features([cfg])[0]
    sep = chr(3)
    data = f.parse({"tags": pa.array([f"1{sep}2{sep}3", "", "9"])})
    np.testing.assert_array_equal(data.values, [1, 2, 3, 9])
    np.testing.assert_array_equal(data.lengths, [3, 0, 1])


def test_id_feature_weighted():
    cfg = _mk(
        "id_feature { feature_name: 'wtags' num_buckets: 50 embedding_dim: 4"
        "  weighted: true }"
    )
    f = create_features([cfg])[0]
    sep = chr(3)
    data = f.parse({"wtags": pa.array([f"1:0.5{sep}2:1.5", "4:2.0"])})
    np.testing.assert_array_equal(data.values, [1, 2, 4])
    np.testing.assert_allclose(data.weights, [0.5, 1.5, 2.0])


def test_raw_feature_dense_and_bucketized():
    dense_cfg = _mk("raw_feature { feature_name: 'price' }")
    f = create_features([dense_cfg])[0]
    assert not f.is_sparse
    data = f.parse({"price": pa.array([1.5, 2.5, None])})
    assert isinstance(data, DenseData)
    assert data.values.shape == (3, 1)

    # with boundaries in FG_NONE the input is already bucketized ids
    b_cfg = _mk(
        "raw_feature { feature_name: 'pb' boundaries: [1.0, 2.0]"
        "  embedding_dim: 8 }"
    )
    fb = create_features([b_cfg])[0]
    assert fb.is_sparse and fb.num_embeddings == 3
    data = fb.parse({"pb": pa.array([0, 2, 1], type=pa.int64())})
    assert isinstance(data, SparseData)
    np.testing.assert_array_equal(data.values, [0, 2, 1])


def test_raw_feature_multi_dim():
    cfg = _mk("raw_feature { feature_name: 'vec' value_dim: 3 }")
    f = create_features([cfg])[0]
    sep = chr(3)
    data = f.parse({"vec": pa.array([f"1{sep}2{sep}3", f"4{sep}5{sep}6"])})
    assert data.values.shape == (2, 3)
    np.testing.assert_allclose(data.values[1], [4, 5, 6])


def test_sequence_id_feature():
    cfg = _mk(
        "sequence_id_feature { feature_name: 'click_seq' num_buckets: 100 "
        " embedding_dim: 8 sequence_length: 10 }"
    )
    f = create_features([cfg])[0]
    assert f.is_sequence and f.is_sparse
    data = f.parse({"click_seq": pa.array(["1;2;3", "", "7"])})
    assert isinstance(data, SequenceSparseData)
    np.testing.assert_array_equal(data.values, [1, 2, 3, 7])
    np.testing.assert_array_equal(data.seq_lengths, [3, 0, 1])


def test_grouped_sequence_feature():
    cfg = _mk(
        """
        sequence_feature {
            sequence_name: 'click_50'
            sequence_length: 50
            sequence_delim: ';'
            features {
                id_feature { feature_name: 'item_id' num_buckets: 64 embedding_dim: 8 }
            }
            features {
                raw_feature { feature_name: 'ts' }
            }
        }
        """
    )
    feats = create_features([cfg])
    assert [f.name for f in feats] == ["click_50__item_id", "click_50__ts"]
    assert feats[0].is_sequence and feats[0].sequence_length == 50
    data = feats[0].parse({"click_50__item_id": pa.array(["5;6", "7"])})
    np.testing.assert_array_equal(data.values, [5, 6, 7])


def test_fg_normal_hash_and_vocab():
    cfg = _mk(
        "id_feature { feature_name: 'city' expression: 'user:city'"
        "  hash_bucket_size: 1000 embedding_dim: 8 }"
    )
    f = create_features([cfg], fg_mode=FgMode.FG_NORMAL)[0]
    assert f.inputs == ["city"]
    data = f.parse({"city": pa.array(["beijing", "shanghai", None])})
    assert isinstance(data, SparseData)
    assert len(data.values) == 2 and (data.values < 1000).all()
    np.testing.assert_array_equal(data.lengths, [1, 1, 0])

    vcfg = _mk(
        "id_feature { feature_name: 'cat' expression: 'item:cat'"
        "  vocab_list: ['a', 'b', 'c'] embedding_dim: 8 }"
    )
    fv = create_features([vcfg], fg_mode=FgMode.FG_NORMAL)[0]
    assert fv.num_embeddings == 5  # 3 + default + oov
    data = fv.parse({"cat": pa.array(["a", "zzz", "c"])})
    np.testing.assert_array_equal(data.values, [2, 1, 4])


def test_combo_and_expr_features():
    combo = _mk(
        "combo_feature { feature_name: 'u_i' expression: ['user:u', 'item:i']"
        "  hash_bucket_size: 100 embedding_dim: 8 }"
    )
    f = create_features([combo], fg_mode=FgMode.FG_NORMAL)[0]
    data = f.parse({"u": pa.array(["x", "y"]), "i": pa.array(["1", "2"])})
    assert len(data.values) == 2

    expr = _mk(
        "expr_feature { feature_name: 'ratio' variables: ['user:a', 'user:b']"
        "  expression: 'a / (b + 1.0)' }"
    )
    fe = create_features([expr], fg_mode=FgMode.FG_NORMAL)[0]
    data = fe.parse({"a": pa.array([2.0, 4.0]), "b": pa.array([1.0, 1.0])})
    np.testing.assert_allclose(data.values[:, 0], [1.0, 2.0])


def test_neg_data_group_assignment():
    cfgs = [
        _mk("id_feature { feature_name: 'user_id' expression: 'user:uid'"
            "  num_buckets: 10 embedding_dim: 4 }"),
        _mk("id_feature { feature_name: 'item_id' expression: 'item:iid'"
            "  num_buckets: 10 embedding_dim: 4 }"),
    ]
    feats = create_features(cfgs, neg_fields=["iid"])
    assert feats[0].data_group == "__BASE__"
    assert feats[1].data_group == "__NEG__"
