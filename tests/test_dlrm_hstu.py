"""DLRM-HSTU generative model integration test."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.protos import pipeline_pb2

CONFIG = """
train_input_path: "{train}"
eval_input_path: "{eval}"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{
        rowwise_adagrad_optimizer {{ lr: 0.05 }}
        constant_learning_rate {{}}
    }}
    dense_optimizer {{
        adam_optimizer {{ lr: 0.005 }}
        constant_learning_rate {{}}
    }}
    num_epochs: 6
    save_checkpoints_steps: 10000
    log_step_count_steps: 20
}}
eval_config {{}}
data_config {{
    batch_size: 32
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "unused_label"
}}
feature_configs {{
    id_feature {{ feature_name: "user_id" num_buckets: 50 embedding_dim: 16 }}
}}
feature_configs {{
    sequence_id_feature {{ feature_name: "video_id" num_buckets: 100
                           embedding_dim: 32 sequence_length: 24 }}
}}
feature_configs {{
    sequence_id_feature {{ feature_name: "item_video_id" num_buckets: 100
                           embedding_dim: 32 sequence_length: 8
                           embedding_name: "video_id_emb" }}
}}
feature_configs {{
    sequence_raw_feature {{ feature_name: "action_weight"
                            sequence_length: 24 }}
}}
feature_configs {{
    sequence_raw_feature {{ feature_name: "action_timestamp"
                            sequence_length: 24 }}
}}
feature_configs {{
    sequence_raw_feature {{ feature_name: "item_query_time"
                            sequence_length: 8 }}
}}
feature_configs {{
    sequence_raw_feature {{ feature_name: "item_action_weight"
                            sequence_length: 8 }}
}}
model_config {{
    feature_groups {{
        group_name: "contextual"
        feature_names: "user_id"
        group_type: DEEP
    }}
    feature_groups {{
        group_name: "uih"
        feature_names: "video_id"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "candidate"
        feature_names: "item_video_id"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "uih_action"
        feature_names: "action_weight"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "uih_timestamp"
        feature_names: "action_timestamp"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "candidate_timestamp"
        feature_names: "item_query_time"
        group_type: JAGGED_SEQUENCE
    }}
    dlrm_hstu {{
        hstu {{
            stu {{
                embedding_dim: 64
                hidden_dim: 16
                attention_dim: 16
                num_heads: 2
                num_layers: 2
            }}
            positional_encoder {{
                num_position_buckets: 64
                num_time_buckets: 32
                use_time_encoding: true
            }}
            input_preprocessor {{
                contextual_preprocessor {{
                    action_encoder {{
                        simple_action_encoder {{
                            action_embedding_dim: 8
                            action_weights: [1, 2]
                        }}
                    }}
                }}
            }}
            output_postprocessor {{
                layernorm_postprocessor {{}}
            }}
        }}
        fusion_mtl_tower {{
            mlp {{ hidden_units: [64] }}
            task_configs {{
                task_name: "is_click"
                label_name: "item_action_weight"
                task_bitmask: 1
                losses {{ binary_cross_entropy {{}} }}
                metrics {{ auc {{}} }}
            }}
            task_configs {{
                task_name: "is_like"
                label_name: "item_action_weight"
                task_bitmask: 2
                losses {{ binary_cross_entropy {{}} }}
                metrics {{ auc {{}} }}
            }}
        }}
        max_seq_len: 40
        item_embedding_hidden_dim: 64
    }}
}}
"""


def _gen(tmp_path, n_rows=2560, seed=0):
    """Click label: candidate video in same decile-cluster as the user's
    dominant history cluster."""
    rng = np.random.default_rng(seed)
    rows = {
        "user_id": [], "video_id": [], "item_video_id": [],
        "action_weight": [], "action_timestamp": [], "item_query_time": [],
        "item_action_weight": [], "unused_label": [],
    }
    for _ in range(n_rows):
        uid = rng.integers(0, 50)
        pref = uid % 10  # preferred cluster
        lu = int(rng.integers(4, 20))
        lc = int(rng.integers(1, 8))
        hist = [
            int(pref * 10 + rng.integers(0, 10)) if rng.random() < 0.8
            else int(rng.integers(0, 100))
            for _ in range(lu)
        ]
        cands = [int(rng.integers(0, 100)) for _ in range(lc)]
        weights = []
        for c in cands:
            # per-video popularity (direct candidate-embedding signal)
            # + user-cluster match (history/attention signal)
            base = 0.05 + 0.5 * ((c * 7919) % 100) / 100.0
            p_click = min(base + (0.4 if c // 10 == pref else 0.0), 0.95)
            click = rng.random() < p_click
            like = click and rng.random() < 0.3
            weights.append(int(click) + 2 * int(like))
        ts = sorted(rng.integers(0, 10 ** 6, lu).tolist())
        rows["user_id"].append(uid)
        rows["video_id"].append(";".join(map(str, hist)))
        rows["item_video_id"].append(";".join(map(str, cands)))
        rows["action_weight"].append(
            ";".join(str(int(rng.integers(0, 4))) for _ in range(lu))
        )
        rows["action_timestamp"].append(";".join(map(str, ts)))
        rows["item_query_time"].append(
            ";".join(str(10 ** 6) for _ in range(lc))
        )
        rows["item_action_weight"].append(";".join(map(str, weights)))
        rows["unused_label"].append(0.0)
    tbl = pa.table({k: pa.array(v) for k, v in rows.items()})
    train = os.path.join(tmp_path, "train.parquet")
    evalp = os.path.join(tmp_path, "eval.parquet")
    pq.write_table(tbl.slice(0, n_rows - 256), train)
    pq.write_table(tbl.slice(n_rows - 256), evalp)
    return train, evalp


def test_dlrm_hstu_end_to_end(tmp_path):
    tmp_path = str(tmp_path)
    train, evalp = _gen(tmp_path)
    cfg_text = CONFIG.format(
        train=train, eval=evalp, model_dir=os.path.join(tmp_path, "model")
    )
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    # config parses
    text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc_is_click"] > 0.6, result
    assert np.isfinite(result["loss_bce_is_like"])


def test_dlrm_hstu_with_sla_and_truncation(tmp_path):
    """SLA + attention truncation variants train to finite loss and
    better-than-random AUC end-to-end."""
    tmp_path = str(tmp_path)
    train, evalp = _gen(tmp_path)
    cfg_text = CONFIG.format(
        train=train, eval=evalp, model_dir=os.path.join(tmp_path, "model")
    )
    cfg_text = cfg_text.replace(
        "num_layers: 2",
        "num_layers: 2 sla_k1: 8 sla_k2: 4",
    ).replace(
        "max_seq_len: 40",
        "max_seq_len: 40",
    )
    # enable truncation after layer 1: keep last 16 UIH tokens
    cfg_text = cfg_text.replace(
        "input_preprocessor {",
        "attn_truncation_split_layer: 1\n"
        "            attn_truncation_tail_len: 16\n"
        "            input_preprocessor {",
        1,
    )
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc_is_click"] > 0.6, result
    assert np.isfinite(result["loss_bce_is_like"])


INTERLEAVE_PRE = """input_preprocessor {{
                contextual_interleave_preprocessor {{
                    action_encoder {{
                        simple_action_encoder {{
                            action_embedding_dim: 8
                            action_weights: [1, 2]
                        }}
                    }}
                    action_mlp {{ simple_mlp {{ hidden_dim: 32 }} }}
                    content_encoder {{ slice_content_encoder {{}} }}
                    content_mlp {{ {content_mlp} }}
                }}
            }}"""


def _interleave_cfg(tmp_path, content_mlp):
    train, evalp = _gen(tmp_path)
    cfg_text = CONFIG.format(
        train=train, eval=evalp, model_dir=os.path.join(tmp_path, "model")
    )
    start = cfg_text.index("input_preprocessor {")
    depth = 0
    for i in range(start, len(cfg_text)):
        if cfg_text[i] == "{":
            depth += 1
        elif cfg_text[i] == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    cfg_text = (
        cfg_text[:start]
        + INTERLEAVE_PRE.format(content_mlp=content_mlp)
        + cfg_text[end:]
    )
    # interleaving doubles the token count per step
    cfg_text = cfg_text.replace("max_seq_len: 40", "max_seq_len: 80")
    return cfg_text


def test_dlrm_hstu_interleave_end_to_end(tmp_path):
    """Full content/action-MLP family with target interleaving trains
    end-to-end (reference ContextualInterleavePreprocessor path)."""
    tmp_path = str(tmp_path)
    cfg_text = _interleave_cfg(tmp_path, "simple_mlp { hidden_dim: 32 }")
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc_is_click"] > 0.6, result
    assert np.isfinite(result["loss_bce_is_like"])


def test_dlrm_hstu_parameterized_mlp_builds_and_steps(tmp_path):
    """Parameterized contextualized MLP (per-sample generated weights)
    through a real forward+loss on one batch."""
    tmp_path = str(tmp_path)
    cfg_text = _interleave_cfg(
        tmp_path, "parameterized_mlp { hidden_dim: 32 }"
    )
    cfg_text = cfg_text.replace("num_epochs: 6", "num_epochs: 1")
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert np.isfinite(result["loss_bce_is_click"])
