"""Train-config feature tests: grad accumulation, fp16 scaler,
predict_checkpoint, dynamicemb mapping."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(__file__))


def _setup(tmp_path, extra_train_cfg=""):
    from test_train_integration import DEEPFM_CONFIG, _write_config

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    tmp_path = str(tmp_path)
    cfg_text = DEEPFM_CONFIG.replace(
        "num_epochs: 4", "num_epochs: 2\n" + extra_train_cfg
    )
    cfg_path, cfg = _write_config(tmp_path, cfg_text)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(os.path.join(tmp_path, "train.parquet"), features,
                       1024, ["label"], seed=0)
    write_mock_parquet(os.path.join(tmp_path, "eval.parquet"), features,
                       256, ["label"], seed=1)
    return cfg_path, tmp_path


def test_gradient_accumulation(tmp_path):
    from torcheasyrec_tpu import main as tzrec_main

    cfg_path, tmp_path = _setup(
        tmp_path, "    gradient_accumulation_steps: 4"
    )
    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.6, result


def test_fp16_grad_scaler(tmp_path):
    from torcheasyrec_tpu import main as tzrec_main

    cfg_path, tmp_path = _setup(
        tmp_path,
        '    mixed_precision: "FP16"\n    grad_scaler {{ init_scale: 1024 }}'
    )
    result = tzrec_main.train_and_evaluate(cfg_path)
    assert np.isfinite(result["loss_binary_cross_entropy"])
    assert result["auc"] > 0.6, result


def test_predict_checkpoint(tmp_path):
    from torcheasyrec_tpu import main as tzrec_main

    cfg_path, tmp_path = _setup(tmp_path)
    tzrec_main.train_and_evaluate(cfg_path)
    out = os.path.join(tmp_path, "preds_ckpt")
    tzrec_main.predict_checkpoint(
        cfg_path, os.path.join(tmp_path, "eval.parquet"), out
    )
    files = os.listdir(out)
    t = pq.read_table(os.path.join(out, files[0]))
    assert "probs" in t.schema.names and t.num_rows == 256


def test_dynamicemb_maps_to_zch(tmp_path):
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.modules.embedding import EmbeddingGroup
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2

    fc = text_format.Parse(
        """id_feature {
            feature_name: 'dyn'
            embedding_dim: 8
            dynamicemb { max_capacity: 256 score_strategy: "LFU" }
        }""",
        feature_pb2.FeatureConfig(),
    )
    feats = create_features([fc])
    assert feats[0].num_embeddings == 256
    mc = text_format.Parse(
        """feature_groups { group_name: "deep" feature_names: "dyn"
                            group_type: DEEP }""",
        model_pb2.ModelConfig(),
    )
    eg = EmbeddingGroup(feats, list(mc.feature_groups))
    assert eg.has_zch
    assert eg._zch_cfgs["dyn_emb"].policy == "lfu"  # keyed by table
    assert eg._zch_cfgs["dyn_emb"].size == 256
