"""Pareto weighting, cost-based batching, small tools."""

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(__file__))


def test_pareto_weights_prefer_floor_and_simplex():
    import jax.numpy as jnp

    from torcheasyrec_tpu.losses.pe_mtl_loss import pareto_loss_weights

    losses = {"a": jnp.float32(5.0), "b": jnp.float32(0.5)}
    w = pareto_loss_weights(losses, {"a": 0.2})
    wa, wb = float(w["a"]), float(w["b"])
    # weights average 1 over tasks and respect the floor (scaled by k)
    assert abs((wa + wb) / 2 - 1.0) < 1e-4
    assert wa >= 0.2 * 2 - 1e-4
    # the smaller loss gets the larger weight
    assert wb > wa


def test_cost_based_batching(tmp_path):
    from google.protobuf import text_format

    from torcheasyrec_tpu.datasets.dataset import create_dataloader
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import data_pb2, feature_pb2

    n = 64
    tbl = pa.table({
        "cat_a": pa.array(np.arange(n)),
        "cost": pa.array(np.full(n, 10.0, np.float32)),
        "label": pa.array(np.zeros(n, np.float32)),
    })
    path = os.path.join(str(tmp_path), "d.parquet")
    pq.write_table(tbl, path)
    feats = create_features([
        text_format.Parse(
            "id_feature { feature_name: 'cat_a' num_buckets: 100 "
            "embedding_dim: 4 }",
            feature_pb2.FeatureConfig(),
        )
    ])
    dc = data_pb2.DataConfig(
        batch_size=32, dataset_type=data_pb2.DatasetType.ParquetDataset,
        label_fields=["label"], sample_cost_field="cost",
        batch_cost_size=100,  # 10 rows of cost 10 per batch
    )
    dl = create_dataloader(dc, feats, path, mode="eval")
    sizes = [info.batch_size for _, info in dl()]
    assert sizes[0] == 10
    assert sum(sizes) == n


def test_list_ckpt_param_and_online_data(tmp_path):
    from test_train_integration import DEEPFM_CONFIG, _write_config

    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.tools.create_online_infer_data import (
        create_online_data,
    )
    from torcheasyrec_tpu.tools.list_ckpt_param import list_params
    from torcheasyrec_tpu.utils import checkpoint_util
    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    tmp_path = str(tmp_path)
    cfg_path, cfg = _write_config(tmp_path, DEEPFM_CONFIG)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(os.path.join(tmp_path, "train.parquet"), features,
                       256, ["label"], seed=0)
    write_mock_parquet(os.path.join(tmp_path, "eval.parquet"), features,
                       128, ["label"], seed=1)
    tzrec_main.train_and_evaluate(cfg_path)
    ckpt = checkpoint_util.latest_checkpoint(os.path.join(tmp_path, "model"))
    params = list_params(ckpt)
    assert any("tables" in p for p, _, _ in params)
    assert any("dense" in p for p, _, _ in params)

    out = os.path.join(tmp_path, "infer.jsonl")
    create_online_data(cfg_path, out, num_rows=4)
    lines = open(out).read().splitlines()
    assert len(lines) == 4
    row = json.loads(lines[0])
    assert "cat_a" in row


def test_add_feature_info(tmp_path):
    from torcheasyrec_tpu.tools.add_feature_info_to_config import (
        add_feature_info,
    )
    from torcheasyrec_tpu.utils import config_util

    tmp_path = str(tmp_path)
    n = 100
    tbl = pa.table({
        "cat_x": pa.array(np.random.default_rng(0).integers(0, 37, n)),
        "raw_x": pa.array(np.random.default_rng(0).normal(size=n)),
        "label": pa.array(np.zeros(n, np.float32)),
    })
    train = os.path.join(tmp_path, "t.parquet")
    pq.write_table(tbl, train)
    cfg_text = f"""
train_input_path: "{train}"
eval_input_path: "{train}"
model_dir: "{tmp_path}/m"
data_config {{
    batch_size: 32
    dataset_type: ParquetDataset
    label_fields: "label"
}}
feature_configs {{
    id_feature {{ feature_name: "cat_x" embedding_dim: 8 }}
}}
feature_configs {{
    raw_feature {{ feature_name: "raw_x" }}
}}
"""
    cfg_path = os.path.join(tmp_path, "p.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    out_path = os.path.join(tmp_path, "out.config")
    add_feature_info(cfg_path, out_path, num_boundaries=4)
    new_cfg = config_util.load_pipeline_config(out_path)
    assert new_cfg.feature_configs[0].id_feature.num_buckets == 37
    assert len(new_cfg.feature_configs[1].raw_feature.boundaries) == 4
