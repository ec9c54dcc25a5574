"""DataParser + dataset/reader tests."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.datasets.data_parser import DataParser
from torcheasyrec_tpu.datasets.dataset import create_dataloader
from torcheasyrec_tpu.datasets.utils import Batch, bucketize_size
from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import data_pb2, feature_pb2


def _feat(cfg_text):
    return text_format.Parse(cfg_text, feature_pb2.FeatureConfig())


def _features():
    return create_features([
        _feat("id_feature { feature_name: 'cat_a' num_buckets: 100 embedding_dim: 8 }"),
        _feat("id_feature { feature_name: 'tags' num_buckets: 50 embedding_dim: 4 }"),
        _feat("raw_feature { feature_name: 'price' }"),
        _feat(
            "sequence_id_feature { feature_name: 'clicks' num_buckets: 100 "
            "embedding_dim: 8 sequence_length: 4 }"
        ),
    ])


def test_parse_to_batch():
    sep = chr(3)
    parser = DataParser(_features(), labels=["label"])
    batch = parser.parse_to_batch({
        "cat_a": pa.array([1, 2, 3], type=pa.int64()),
        "tags": pa.array([f"1{sep}2", "", "5"]),
        "price": pa.array([1.0, 2.0, 3.0]),
        "clicks": pa.array(["1;2;3;4;5;6", "9", ""]),
        "label": pa.array([1, 0, 1]),
    })
    assert isinstance(batch, Batch)
    # single-valued id features ride the fixed [B, 1] fast path (no
    # lengths array to ship H2D)
    sf = batch.sparse_features["cat_a"]
    assert sf.is_fixed
    np.testing.assert_array_equal(sf.values, [[1], [2], [3]])

    tf = batch.sparse_features["tags"]
    np.testing.assert_array_equal(tf.lengths, [2, 0, 1])
    np.testing.assert_array_equal(tf.values[:3], [1, 2, 5])

    df = batch.dense_features["price"]
    assert df.values.shape == (3, 1)

    seq = batch.sequence_sparse_features["clicks"]
    assert seq.values.shape == (3, 4)
    # truncation keeps most recent steps
    np.testing.assert_array_equal(seq.values[0], [3, 4, 5, 6])
    np.testing.assert_array_equal(seq.values[1], [9, -1, -1, -1])
    np.testing.assert_array_equal(seq.lengths, [4, 1, 0])

    np.testing.assert_array_equal(batch.labels["label"], [1.0, 0.0, 1.0])


def test_parquet_dataloader_roundtrip(tmp_path):
    sep = chr(3)
    n = 100
    tbl = pa.table({
        "cat_a": pa.array(np.arange(n) % 100),
        "tags": pa.array([f"1{sep}2"] * n),
        "price": pa.array(np.random.rand(n).astype(np.float32)),
        "clicks": pa.array(["1;2;3"] * n),
        "label": pa.array((np.arange(n) % 2).astype(np.float32)),
    })
    path = os.path.join(tmp_path, "data.parquet")
    pq.write_table(tbl, path)

    data_config = data_pb2.DataConfig(
        batch_size=32,
        dataset_type=data_pb2.DatasetType.ParquetDataset,
        label_fields=["label"],
    )
    dl = create_dataloader(data_config, _features(), path, mode="eval")
    batches = list(dl())
    # 3 full batches + remainder of 4
    assert [info.batch_size for _, info in batches] == [32, 32, 32, 4]
    batch0, info0 = batches[0]
    assert batch0.sparse_features["cat_a"].values.shape == (32, 1)
    # ckpt info tracks max row consumed
    assert info0.checkpoint_info == {0: 31}
    assert batches[-1][1].checkpoint_info == {0: 99}


def test_parquet_resume(tmp_path):
    n = 64
    tbl = pa.table({
        "cat_a": pa.array(np.arange(n)),
        "label": pa.array(np.zeros(n, np.float32)),
    })
    path = os.path.join(tmp_path, "d.parquet")
    pq.write_table(tbl, path)
    feats = create_features([
        _feat("id_feature { feature_name: 'cat_a' num_buckets: 100 embedding_dim: 4 }"),
    ])
    data_config = data_pb2.DataConfig(
        batch_size=16, dataset_type=data_pb2.DatasetType.ParquetDataset,
        label_fields=["label"],
    )
    dl = create_dataloader(
        data_config, feats, path, mode="eval", resume_state={0: 31}
    )
    batches = list(dl())
    first, _ = batches[0]
    np.testing.assert_array_equal(
        first.sparse_features["cat_a"].values.reshape(-1)[:16],
        np.arange(32, 48),
    )


def test_csv_reader(tmp_path):
    path = os.path.join(tmp_path, "d.csv")
    with open(path, "w") as f:
        f.write("cat_a,price,label\n")
        for i in range(10):
            f.write(f"{i},{i * 0.5},{i % 2}\n")
    feats = create_features([
        _feat("id_feature { feature_name: 'cat_a' num_buckets: 100 embedding_dim: 4 }"),
        _feat("raw_feature { feature_name: 'price' }"),
    ])
    data_config = data_pb2.DataConfig(
        batch_size=4, dataset_type=data_pb2.DatasetType.CsvDataset,
        label_fields=["label"], with_header=True,
    )
    dl = create_dataloader(data_config, feats, path, mode="eval")
    batches = list(dl())
    assert [i.batch_size for _, i in batches] == [4, 4, 2]
    b0, _ = batches[0]
    np.testing.assert_allclose(
        b0.dense_features["price"].values[:, 0], [0, 0.5, 1.0, 1.5]
    )
