"""End-to-end integration: config -> train -> eval -> export -> predict.

Mirrors the reference's rank_integration_test.py strategy (SURVEY.md §4):
mock parquet with learnable labels; AUC must clear a threshold.
"""

import os

import numpy as np
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import pipeline_pb2
from torcheasyrec_tpu.utils.test_util import write_mock_parquet

DEEPFM_CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{
        adagrad_optimizer {{ lr: 0.05 }}
        constant_learning_rate {{}}
    }}
    dense_optimizer {{
        adam_optimizer {{ lr: 0.002 }}
        constant_learning_rate {{}}
    }}
    num_epochs: 4
    save_checkpoints_steps: 1000
    log_step_count_steps: 20
}}
eval_config {{}}
data_config {{
    batch_size: 128
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    id_feature {{ feature_name: "cat_a" num_buckets: 64 embedding_dim: 8 }}
}}
feature_configs {{
    id_feature {{ feature_name: "cat_b" num_buckets: 32 embedding_dim: 8 }}
}}
feature_configs {{
    raw_feature {{ feature_name: "num_a" }}
}}
model_config {{
    feature_groups {{
        group_name: "wide"
        feature_names: "cat_a"
        feature_names: "cat_b"
        group_type: WIDE
    }}
    feature_groups {{
        group_name: "fm"
        feature_names: "cat_a"
        feature_names: "cat_b"
        group_type: DEEP
    }}
    feature_groups {{
        group_name: "deep"
        feature_names: "cat_a"
        feature_names: "cat_b"
        feature_names: "num_a"
        group_type: DEEP
    }}
    deepfm {{
        deep {{ hidden_units: [32, 16] }}
        final {{ hidden_units: [16] }}
        wide_embedding_dim: 4
    }}
    num_class: 1
    metrics {{ auc {{}} }}
    losses {{ binary_cross_entropy {{}} }}
}}
"""


def _write_config(tmp_path, template, **extra):
    cfg_text = template.format(
        train=os.path.join(tmp_path, "train.parquet"),
        eval=os.path.join(tmp_path, "eval.parquet"),
        model_dir=os.path.join(tmp_path, "model"),
        **extra,
    )
    cfg = text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    path = os.path.join(tmp_path, "pipeline.config")
    with open(path, "w") as f:
        f.write(cfg_text)
    return path, cfg


def test_deepfm_end_to_end(tmp_path):
    tmp_path = str(tmp_path)
    cfg_path, cfg = _write_config(tmp_path, DEEPFM_CONFIG)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(
        os.path.join(tmp_path, "train.parquet"), features, 4096,
        ["label"], seed=0,
    )
    write_mock_parquet(
        os.path.join(tmp_path, "eval.parquet"), features, 1024,
        ["label"], seed=1,
    )

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.65, f"AUC too low: {result}"

    # checkpoint exists
    model_dir = os.path.join(tmp_path, "model")
    assert any(n.startswith("model.ckpt-") for n in os.listdir(model_dir))

    # standalone evaluate from the checkpoint reproduces the AUC
    result2 = tzrec_main.evaluate(cfg_path)
    assert abs(result2["auc"] - result["auc"]) < 1e-3

    # export
    export_dir = os.path.join(tmp_path, "export")
    tzrec_main.export(cfg_path, export_dir)
    assert os.path.exists(os.path.join(export_dir, "pipeline.config"))
    assert os.path.exists(os.path.join(export_dir, "fg.json"))

    # predict
    out_path = os.path.join(tmp_path, "preds")
    tzrec_main.predict(
        os.path.join(tmp_path, "eval.parquet"), out_path, export_dir
    )
    files = os.listdir(out_path)
    assert files
    preds = pq.read_table(os.path.join(out_path, files[0]))
    assert "probs" in preds.schema.names
    assert preds.num_rows == 1024
    p = preds.column("probs").to_numpy()
    assert np.all((p >= 0) & (p <= 1))


def test_continue_train_resumes(tmp_path):
    tmp_path = str(tmp_path)
    cfg_path, cfg = _write_config(tmp_path, DEEPFM_CONFIG)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(
        os.path.join(tmp_path, "train.parquet"), features, 1024,
        ["label"], seed=0,
    )
    write_mock_parquet(
        os.path.join(tmp_path, "eval.parquet"), features, 256,
        ["label"], seed=1,
    )
    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.utils import checkpoint_util

    tzrec_main.train_and_evaluate(cfg_path)
    model_dir = os.path.join(tmp_path, "model")
    first = checkpoint_util.list_checkpoints(model_dir)[-1]
    tzrec_main.train_and_evaluate(cfg_path, continue_train=True)
    second = checkpoint_util.list_checkpoints(model_dir)[-1]
    assert second >= first


def test_continue_train_epoch_watermark(tmp_path):
    """Resume must CONTINUE from the checkpointed epoch, not replay
    finished epochs (reference EPOCHS_COMPLETED, main.py:356-373).
    1024 rows / batch 128 = 8 steps/epoch: a 4-epoch run ends at step
    32; raising num_epochs to 6 and resuming must add exactly 2 epochs
    (16 steps), not re-run 6."""
    tmp_path = str(tmp_path)
    cfg_path, cfg = _write_config(tmp_path, DEEPFM_CONFIG)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(
        os.path.join(tmp_path, "train.parquet"), features, 1024,
        ["label"], seed=0,
    )
    write_mock_parquet(
        os.path.join(tmp_path, "eval.parquet"), features, 256,
        ["label"], seed=1,
    )
    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.utils import checkpoint_util

    tzrec_main.train_and_evaluate(cfg_path)
    model_dir = os.path.join(tmp_path, "model")
    assert checkpoint_util.list_checkpoints(model_dir)[-1] == 32
    tzrec_main.train_and_evaluate(
        cfg_path, continue_train=True,
        edit_config_json='{"train_config.num_epochs": 6}',
    )
    assert checkpoint_util.list_checkpoints(model_dir)[-1] == 48
