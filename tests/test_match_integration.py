"""Two-tower retrieval integration: DSSM + negative sampler + recall@k.

Mirrors the reference's match_integration_test.py strategy (SURVEY.md §4).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import pipeline_pb2

DSSM_CONFIG = """
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
    num_epochs: 3
    save_checkpoints_steps: 10000
    log_step_count_steps: 20
}}
eval_config {{}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
    negative_sampler {{
        input_path: "{item_table}"
        num_sample: 32
        attr_fields: "item_id"
        attr_fields: "item_cat"
        item_id_field: "item_id"
    }}
}}
feature_configs {{
    id_feature {{ feature_name: "user_id" expression: "user:user_id"
                  num_buckets: 100 embedding_dim: 16 }}
}}
feature_configs {{
    id_feature {{ feature_name: "item_id" expression: "item:item_id"
                  num_buckets: 200 embedding_dim: 16 }}
}}
feature_configs {{
    id_feature {{ feature_name: "item_cat" expression: "item:item_cat"
                  num_buckets: 10 embedding_dim: 8 }}
}}
model_config {{
    feature_groups {{
        group_name: "user"
        feature_names: "user_id"
        group_type: DEEP
    }}
    feature_groups {{
        group_name: "item"
        feature_names: "item_id"
        feature_names: "item_cat"
        group_type: DEEP
    }}
    dssm {{
        user_tower {{
            input: "user"
            mlp {{ hidden_units: [32, 16] }}
        }}
        item_tower {{
            input: "item"
            mlp {{ hidden_units: [32, 16] }}
        }}
        output_dim: 8
        temperature: 0.2
    }}
    metrics {{ recall_at_k {{ top_k: 5 }} }}
    losses {{ softmax_cross_entropy {{}} }}
}}
"""


def _gen_data(tmp_path, n_users=100, n_items=200, n_rows=4096, seed=0):
    """Users have a preferred item cluster; labels implicit (clicks)."""
    rng = np.random.default_rng(seed)
    user_pref = rng.integers(0, 10, n_users)  # preferred category
    item_cat = rng.integers(0, 10, n_items)
    # interactions: user picks an item of its preferred category 80% of time
    users = rng.integers(0, n_users, n_rows)
    items = np.zeros(n_rows, np.int64)
    for i in range(n_rows):
        if rng.random() < 0.8:
            cands = np.flatnonzero(item_cat == user_pref[users[i]])
            items[i] = rng.choice(cands) if len(cands) else rng.integers(
                0, n_items
            )
        else:
            items[i] = rng.integers(0, n_items)
    tbl = pa.table({
        "user_id": pa.array(users),
        "item_id": pa.array(items),
        "item_cat": pa.array(item_cat[items]),
        "label": pa.array(np.ones(n_rows, np.float32)),
    })
    train_path = os.path.join(tmp_path, "train.parquet")
    eval_path = os.path.join(tmp_path, "eval.parquet")
    pq.write_table(tbl.slice(0, n_rows - 512), train_path)
    pq.write_table(tbl.slice(n_rows - 512), eval_path)
    # item table for the sampler: id | weight | attrs ("id:cat")
    item_tbl = pa.table({
        "id": pa.array(np.arange(n_items)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array(
            [f"{i}:{item_cat[i]}" for i in range(n_items)]
        ),
    })
    item_path = os.path.join(tmp_path, "item_gl.parquet")
    pq.write_table(item_tbl, item_path)
    return train_path, eval_path, item_path


def test_dssm_negative_sampling_end_to_end(tmp_path):
    tmp_path = str(tmp_path)
    train, evalp, item = _gen_data(tmp_path)
    cfg_text = DSSM_CONFIG.format(
        train=train, eval=evalp,
        model_dir=os.path.join(tmp_path, "model"), item_table=item,
    )
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    # random recall@5 over 32 negatives ~ 5/33 = 0.15; learned must beat it
    assert result["recall@5"] > 0.3, f"recall too low: {result}"


def test_sampler_appends_negatives(tmp_path):
    tmp_path = str(tmp_path)
    train, evalp, item = _gen_data(tmp_path)
    cfg_text = DSSM_CONFIG.format(
        train=train, eval=evalp,
        model_dir=os.path.join(tmp_path, "model"), item_table=item,
    )
    cfg = text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    features = create_features(
        list(cfg.feature_configs),
        neg_fields=["item_id", "item_cat"],
    )
    assert features[1].data_group == "__NEG__"
    from torcheasyrec_tpu.datasets.dataset import create_dataloader

    dl = create_dataloader(cfg.data_config, features, train, mode="train")
    batch, info = next(iter(dl()))
    # user features at B, item features at B + num_sample
    assert batch.sparse_features["user_id"].batch_size == 64
    assert batch.sparse_features["item_id"].batch_size == 64 + 32
