"""HSTU-Match jagged-candidate integration: multi-positive sequences +
negative sampler + UIH preprocessor with action encoder + query-time
bias (reference tzrec/models/hstu.py, tests/configs/hstu_kuairand_1k.config).
"""

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
        adam_optimizer {{ lr: 0.01 }}
        constant_learning_rate {{}}
    }}
    num_epochs: 6
    save_checkpoints_steps: 10000
    log_step_count_steps: 50
}}
eval_config {{}}
data_config {{
    batch_size: 32
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "cand_seq__action_weight"
    negative_sampler {{
        input_path: "{item_table}"
        num_sample: 32
        attr_fields: "cand_seq__video_id"
        item_id_field: "cand_seq__video_id"
    }}
}}
feature_configs {{
    id_feature {{ feature_name: "user_id" expression: "user:user_id"
                  num_buckets: 120 embedding_dim: 16 }}
}}
feature_configs {{
    id_feature {{ feature_name: "user_degree" expression: "user:user_degree"
                  num_buckets: 8 embedding_dim: 16 }}
}}
feature_configs {{
    sequence_feature {{
        sequence_name: "uih_seq"
        sequence_length: 16
        sequence_delim: ";"
        features {{
            id_feature {{ feature_name: "video_id"
                          expression: "item:video_id"
                          embedding_name: "video_emb"
                          num_buckets: 256 embedding_dim: 32 }}
        }}
        features {{
            raw_feature {{ feature_name: "action_timestamp"
                           expression: "user:action_timestamp" }}
        }}
        features {{
            raw_feature {{ feature_name: "action_weight"
                           expression: "user:action_weight" }}
        }}
    }}
}}
feature_configs {{
    sequence_feature {{
        sequence_name: "cand_seq"
        sequence_length: 4
        sequence_delim: ";"
        features {{
            id_feature {{ feature_name: "video_id"
                          expression: "item:video_id"
                          embedding_name: "video_emb"
                          num_buckets: 256 embedding_dim: 32 }}
        }}
    }}
}}
feature_configs {{
    raw_feature {{ feature_name: "request_time"
                   expression: "user:request_time" }}
}}
model_config {{
    feature_groups {{
        group_name: "contextual"
        feature_names: "user_id"
        feature_names: "user_degree"
        group_type: DEEP
    }}
    feature_groups {{
        group_name: "uih"
        feature_names: "uih_seq__video_id"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "candidate"
        feature_names: "cand_seq__video_id"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "uih_action"
        feature_names: "uih_seq__action_weight"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "uih_timestamp"
        feature_names: "uih_seq__action_timestamp"
        group_type: JAGGED_SEQUENCE
    }}
    feature_groups {{
        group_name: "query_time"
        feature_names: "request_time"
        group_type: DEEP
    }}
    hstu_match {{
        user_tower {{
            input: "uih"
            hstu {{
                stu {{
                    embedding_dim: 32
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
                    uih_preprocessor {{
                        action_encoder {{
                            simple_action_encoder {{
                                action_embedding_dim: 8
                                action_weights: [1, 2]
                            }}
                        }}
                        action_mlp {{ simple_mlp {{ hidden_dim: 32 }} }}
                    }}
                }}
                output_postprocessor {{ l2norm_postprocessor {{}} }}
                input_dropout_ratio: 0.1
            }}
            max_seq_len: 16
        }}
        item_tower {{
            input: "candidate"
            mlp {{ hidden_units: [32] }}
        }}
        similarity: COSINE
        temperature: 0.05
    }}
    metrics {{ recall_at_k {{ top_k: 1 }} }}
    metrics {{ recall_at_k {{ top_k: 5 }} }}
    losses {{ softmax_cross_entropy {{}} }}
}}
"""

N_ITEMS = 256
N_CLUSTERS = 4


def _gen_data(tmp_path, n_rows=2048, seed=0):
    """Users live in an item cluster; history and positives come from
    it, so a learned user embedding must beat sampled negatives."""
    rng = np.random.default_rng(seed)
    per = N_ITEMS // N_CLUSTERS

    def cluster_items(c, n):
        return rng.integers(c * per, (c + 1) * per, n)

    cols = {k: [] for k in (
        "user_id", "user_degree", "uih_seq__video_id",
        "uih_seq__action_timestamp", "uih_seq__action_weight",
        "cand_seq__video_id", "cand_seq__action_weight", "request_time",
    )}
    for i in range(n_rows):
        uid = int(rng.integers(0, 120))
        c = uid % N_CLUSTERS
        lu = int(rng.integers(5, 13))
        hist = cluster_items(c, lu)
        ts0 = 1_700_000_000 + int(rng.integers(0, 10_000))
        ts = ts0 + np.cumsum(rng.integers(10, 600, lu))
        aw = rng.choice([1, 2, 3], lu)
        k = int(rng.integers(1, 4))
        pos = cluster_items(c, k)
        cols["user_id"].append(uid)
        cols["user_degree"].append(uid % 8)
        cols["uih_seq__video_id"].append(";".join(map(str, hist)))
        cols["uih_seq__action_timestamp"].append(
            ";".join(map(str, ts))
        )
        cols["uih_seq__action_weight"].append(";".join(map(str, aw)))
        cols["cand_seq__video_id"].append(";".join(map(str, pos)))
        cols["cand_seq__action_weight"].append(
            ";".join(["1"] * k)
        )
        cols["request_time"].append(float(ts[-1] + 60))
    tbl = pa.table({k: pa.array(v) for k, v in cols.items()})
    train_path = os.path.join(tmp_path, "train.parquet")
    eval_path = os.path.join(tmp_path, "eval.parquet")
    pq.write_table(tbl.slice(0, n_rows - 384), train_path)
    pq.write_table(tbl.slice(n_rows - 384), eval_path)
    item_tbl = pa.table({
        "id": pa.array(np.arange(N_ITEMS)),
        "weight": pa.array(np.ones(N_ITEMS)),
        "attrs": pa.array([str(i) for i in range(N_ITEMS)]),
    })
    item_path = os.path.join(tmp_path, "item_gl.parquet")
    pq.write_table(item_tbl, item_path)
    return train_path, eval_path, item_path


def test_hstu_match_jagged_end_to_end(tmp_path):
    tmp_path = str(tmp_path)
    train, evalp, item = _gen_data(tmp_path)
    cfg_text = CONFIG.format(
        train=train, eval=evalp,
        model_dir=os.path.join(tmp_path, "model"), item_table=item,
    )
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    # random recall@1 over 32 negatives ~ 1/33 = 0.03; @5 ~ 0.15
    assert result["recall@1"] > 0.10, f"recall@1 too low: {result}"
    assert result["recall@5"] > 0.30, f"recall@5 too low: {result}"


def test_hstu_match_rejects_in_batch_negative_with_jagged_candidates():
    """Reference hstu.py:309-313 asserts the same."""
    import pytest

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.models.hstu_match import HSTUMatch
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2

    feat_cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in (
            """sequence_feature {
                sequence_name: 'uih_seq' sequence_length: 8
                sequence_delim: ';'
                features { id_feature { feature_name: 'vid'
                    num_buckets: 32 embedding_dim: 16 } } }""",
            """sequence_feature {
                sequence_name: 'cand_seq' sequence_length: 4
                sequence_delim: ';'
                features { id_feature { feature_name: 'vid'
                    num_buckets: 32 embedding_dim: 16 } } }""",
        )
    ]
    features = create_features(feat_cfgs)
    mc = text_format.Parse(
        """
        feature_groups { group_name: 'uih'
            feature_names: 'uih_seq__vid' group_type: JAGGED_SEQUENCE }
        feature_groups { group_name: 'candidate'
            feature_names: 'cand_seq__vid' group_type: JAGGED_SEQUENCE }
        hstu_match {
            user_tower { input: 'uih'
                hstu { stu { embedding_dim: 16 hidden_dim: 8
                             attention_dim: 8 num_heads: 1
                             num_layers: 1 } }
                max_seq_len: 8 }
            item_tower { input: 'candidate' }
            in_batch_negative: true }
        """,
        model_pb2.ModelConfig(),
    )
    with pytest.raises(ValueError, match="in_batch_negative"):
        HSTUMatch(mc, features, labels=["l"])


def test_jagged_label_parse():
    """Label fields named {seq_group}__{col} parse as padded [B, L]."""
    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import feature_pb2

    cfg = text_format.Parse(
        """sequence_feature {
            sequence_name: 'cand_seq' sequence_length: 4
            sequence_delim: ';'
            features { id_feature { feature_name: 'vid'
                num_buckets: 32 embedding_dim: 8 } } }""",
        feature_pb2.FeatureConfig(),
    )
    features = create_features([cfg])
    parser = DataParser(features, labels=["cand_seq__aw"])
    batch = parser.parse_to_batch({
        "cand_seq__vid": pa.array(["1;2;3", "4", "5;6;7;8;9"]),
        "cand_seq__aw": pa.array(["1;0;1", "1", "0;1;1;0;1"]),
    })
    lab = batch.labels["cand_seq__aw"]
    assert lab.shape == (3, 4)
    # keeps the LAST steps like the feature pad (row 2 had 5 values)
    np.testing.assert_array_equal(lab[2], [1, 1, 0, 1])
    np.testing.assert_array_equal(lab[1], [1, 0, 0, 0])


def test_sampler_flattens_sequence_positives(tmp_path):
    """NegativeSampler excludes every id inside multi-positive rows."""
    import pyarrow.parquet as pq2

    from torcheasyrec_tpu.datasets.sampler import NegativeSampler
    from torcheasyrec_tpu.protos import sampler_pb2

    items = pa.table({
        "id": pa.array(np.arange(8)),
        "weight": pa.array(np.ones(8)),
        "attrs": pa.array([str(i) for i in range(8)]),
    })
    path = os.path.join(str(tmp_path), "items.parquet")
    pq2.write_table(items, path)
    cfg = sampler_pb2.NegativeSampler(
        input_path=path, num_sample=4,
        attr_fields=["cand_seq__vid"], item_id_field="cand_seq__vid",
    )
    s = NegativeSampler(cfg, batch_size=2, seq_delim=";")
    cols = {"cand_seq__vid": pa.array(["0;1;2", "3;4"])}
    pos = s._pos_id_set(cols)
    assert pos == {0, 1, 2, 3, 4}
    out = s.process(dict(cols))
    # negatives appended as extra single-item rows
    assert len(out["cand_seq__vid"]) == 6
