"""Full train_and_evaluate from an unmodified upstream example config:
FG_DAG features, grouped sequences, negative sampler + item table —
only paths/sizes overridden via edit_config_json (the reference's own
override mechanism)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import pipeline_pb2
from torcheasyrec_tpu.utils.test_util import generate_mock_table

CFG = "/root/reference/examples/dssm_taobao.config"


@pytest.mark.skipif(
    not os.path.exists(CFG), reason="reference checkout not mounted"
)
def test_upstream_dssm_taobao_trains(tmp_path):
    tmp = str(tmp_path)
    cfg = pipeline_pb2.EasyRecConfig()
    text_format.Merge(open(CFG).read(), cfg)
    feats = create_features(
        list(cfg.feature_configs), fg_mode=cfg.data_config.fg_mode
    )
    labels = list(cfg.data_config.label_fields)
    pq.write_table(
        generate_mock_table(feats, 2048, labels, seed=0),
        f"{tmp}/train.parquet",
    )
    pq.write_table(
        generate_mock_table(feats, 512, labels, seed=1),
        f"{tmp}/eval.parquet",
    )

    # sampler item table: id | weight | attrs (attr_delimiter-joined)
    ns = cfg.data_config.negative_sampler
    rng = np.random.default_rng(0)
    n_items = 500
    attr_vals = {
        "adgroup_id": rng.integers(0, 846811, n_items),
        "cate_id": rng.integers(0, 12960, n_items),
        "campaign_id": rng.integers(0, 423436, n_items),
        "customer": rng.integers(0, 255875, n_items),
        "brand": rng.integers(0, 461497, n_items),
        "price": rng.random(n_items).round(2),
    }
    attrs = [
        "\x02".join(str(attr_vals[f][i]) for f in ns.attr_fields)
        for i in range(n_items)
    ]
    pq.write_table(pa.table({
        "id": pa.array(attr_vals["adgroup_id"].astype(np.int64)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array(attrs),
    }), f"{tmp}/items.parquet")

    cfg_path = f"{tmp}/pipeline.config"
    with open(cfg_path, "w") as f:
        f.write(open(CFG).read())

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(
        cfg_path,
        train_input_path=f"{tmp}/train.parquet",
        eval_input_path=f"{tmp}/eval.parquet",
        edit_config_json=json.dumps({
            "model_dir": f"{tmp}/model",
            "data_config.dataset_type": "ParquetDataset",
            "data_config.batch_size": "128",
            "data_config.num_workers": "1",
            "data_config.negative_sampler.input_path":
                f"{tmp}/items.parquet",
            "data_config.negative_sampler.num_sample": "32",
            "train_config.num_epochs": "1",
        }),
    )
    assert np.isfinite(result["loss_softmax_cross_entropy"])
    assert result["recall@1"] > 0.5  # sampled-softmax on separable mock
