"""HARD_NEG_INDICES semantics: per-user hard negatives.

Reference contract (sampler.py:639-747, datasets/utils.py:588-723,
match_model.py:53-95): the sampler appends hard negatives after the
shared negatives and emits (user_row, hard_col) attribution pairs; the
match model scores each hard negative ONLY against its own user, with
absent slots masked out of the softmax.
"""

import os
import types

import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.datasets.sampler import HardNegativeSampler
from torcheasyrec_tpu.datasets.utils import HARD_NEG_INDICES
from torcheasyrec_tpu.models.match_model import MatchModel
from torcheasyrec_tpu.protos import pipeline_pb2, sampler_pb2


def test_sim_hard_negatives_score_own_user_only():
    b, d, n_neg, k = 3, 4, 2, 2
    rng = np.random.default_rng(0)
    user = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)
    # item rows: [3 pos | 2 shared neg | 6 hard slots]
    item = jnp.asarray(rng.normal(size=(b + n_neg + b * k, d)), jnp.float32)
    # user0 has 2 hard negs, user1 has 1, user2 none (sentinel row = b)
    idx = jnp.asarray(
        [[0, 0], [0, 1], [1, 0], [b, 1], [b, 0], [b, 1]], jnp.int32
    )
    ns = types.SimpleNamespace(_in_batch_negative=False)
    sim = np.asarray(MatchModel._sim(ns, user, item, idx))
    assert sim.shape == (b, 1 + n_neg + k)

    u = np.asarray(user)
    it = np.asarray(item)
    # col 0: positives; cols 1..2: shared negs for every user
    np.testing.assert_allclose(sim[:, 0], np.sum(u * it[:b], -1), rtol=1e-5)
    np.testing.assert_allclose(
        sim[:, 1:3], u @ it[b : b + n_neg].T, rtol=1e-5
    )
    hard = it[b + n_neg :]
    # user0's two hard negs land in its own row
    np.testing.assert_allclose(sim[0, 3], np.dot(u[0], hard[0]), rtol=1e-5)
    np.testing.assert_allclose(sim[0, 4], np.dot(u[0], hard[1]), rtol=1e-5)
    np.testing.assert_allclose(sim[1, 3], np.dot(u[1], hard[2]), rtol=1e-5)
    # absent slots are masked, and no hard sim leaks to another user
    assert sim[1, 4] == -1e9
    assert sim[2, 3] == -1e9 and sim[2, 4] == -1e9


def _write_sampler_tables(tmp_path):
    n_items = 10
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(n_items, dtype=np.int64)),
                "weight": pa.array(np.ones(n_items)),
                "attrs": pa.array([f"{i}:{i % 3}" for i in range(n_items)]),
            }
        ),
        os.path.join(tmp_path, "item.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "userid": pa.array([0, 0, 1], pa.int64()),
                "itemid": pa.array([5, 6, 7], pa.int64()),
                "weight": pa.array([1.0, 1.0, 1.0]),
            }
        ),
        os.path.join(tmp_path, "hard_edges.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(3, dtype=np.int64)),
                "weight": pa.array(np.ones(3)),
            }
        ),
        os.path.join(tmp_path, "user.parquet"),
    )


def test_hard_negative_sampler_attribution(tmp_path):
    tmp_path = str(tmp_path)
    _write_sampler_tables(tmp_path)
    cfg = text_format.Parse(
        f"""
        user_input_path: "{tmp_path}/user.parquet"
        item_input_path: "{tmp_path}/item.parquet"
        hard_neg_edge_input_path: "{tmp_path}/hard_edges.parquet"
        num_sample: 4
        num_hard_sample: 2
        attr_fields: "item_id"
        attr_fields: "item_cat"
        item_id_field: "item_id"
        user_id_field: "user_id"
        """,
        sampler_pb2.HardNegativeSampler(),
    )
    sampler = HardNegativeSampler(cfg, batch_size=3)
    columns = {
        "user_id": pa.array([0, 1, 2], pa.int64()),
        "item_id": pa.array([1, 2, 3], pa.int64()),
        "item_cat": pa.array([1, 2, 0], pa.int64()),
    }
    out = sampler.process(dict(columns))
    idx = out.pop(HARD_NEG_INDICES)
    b, k = 3, 2
    assert idx.shape == (b * k, 2) and idx.dtype == np.int32
    # user0: 2 hard negs; user1: 1; user2: 0 (sentinel row == b)
    assert idx[0].tolist() == [0, 0] and idx[1].tolist() == [0, 1]
    assert idx[2].tolist() == [1, 0]
    assert idx[3][0] == b and idx[4][0] == b and idx[5][0] == b
    # item columns: B pos + num_sample shared + B*k hard slots (static)
    items = out["item_id"].to_pylist()
    assert len(items) == b + 4 + b * k
    hard_block = items[b + 4 :]
    assert set(hard_block[:2]) == {5, 6}  # user0's edges
    assert hard_block[2] == 7  # user1's edge
    # repeat with a different batch: the shapes must stay static
    out2 = sampler.process(dict(columns))
    assert out2.pop(HARD_NEG_INDICES).shape == (b * k, 2)
    assert len(out2["item_id"]) == len(items)


DSSM_HARD_CONFIG = """
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
    num_epochs: 2
    save_checkpoints_steps: 10000
    log_step_count_steps: 20
}}
eval_config {{}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
    hard_negative_sampler {{
        user_input_path: "{user_table}"
        item_input_path: "{item_table}"
        hard_neg_edge_input_path: "{edge_table}"
        num_sample: 16
        num_hard_sample: 2
        attr_fields: "item_id"
        item_id_field: "item_id"
        user_id_field: "user_id"
    }}
}}
feature_configs {{
    id_feature {{ feature_name: "user_id" expression: "user:user_id"
                  num_buckets: 40 embedding_dim: 16 }}
}}
feature_configs {{
    id_feature {{ feature_name: "item_id" expression: "item:item_id"
                  num_buckets: 80 embedding_dim: 16 }}
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
        group_type: DEEP
    }}
    dssm {{
        user_tower {{ input: "user" mlp {{ hidden_units: [32, 16] }} }}
        item_tower {{ input: "item" mlp {{ hidden_units: [32, 16] }} }}
        output_dim: 8
        temperature: 0.2
    }}
    metrics {{ recall_at_k {{ top_k: 5 }} }}
    losses {{ softmax_cross_entropy {{}} }}
}}
"""


def test_dssm_hard_negative_end_to_end(tmp_path):
    tmp_path = str(tmp_path)
    rng = np.random.default_rng(0)
    n_users, n_items, n_rows = 40, 80, 2048
    users = rng.integers(0, n_users, n_rows)
    # each user clicks items congruent to it mod 8
    items = (users % 8) * 10 + rng.integers(0, 10, n_rows)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "item_id": pa.array(items, pa.int64()),
            "label": pa.array(np.ones(n_rows, np.float32)),
        }
    )
    pq.write_table(tbl.slice(0, n_rows - 256),
                   os.path.join(tmp_path, "train.parquet"))
    pq.write_table(tbl.slice(n_rows - 256),
                   os.path.join(tmp_path, "eval.parquet"))
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(n_items, dtype=np.int64)),
                "weight": pa.array(np.ones(n_items)),
                "attrs": pa.array([str(i) for i in range(n_items)]),
            }
        ),
        os.path.join(tmp_path, "item.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "id": pa.array(np.arange(n_users, dtype=np.int64)),
                "weight": pa.array(np.ones(n_users)),
            }
        ),
        os.path.join(tmp_path, "user.parquet"),
    )
    # hard negatives: items of the NEIGHBOR cluster
    eu = np.repeat(np.arange(n_users), 3)
    ei = ((eu % 8 + 1) % 8) * 10 + np.tile(np.arange(3), n_users)
    pq.write_table(
        pa.table(
            {
                "userid": pa.array(eu, pa.int64()),
                "itemid": pa.array(ei, pa.int64()),
                "weight": pa.array(np.ones(len(eu))),
            }
        ),
        os.path.join(tmp_path, "edges.parquet"),
    )

    cfg_text = DSSM_HARD_CONFIG.format(
        train=os.path.join(tmp_path, "train.parquet"),
        eval=os.path.join(tmp_path, "eval.parquet"),
        model_dir=os.path.join(tmp_path, "model"),
        user_table=os.path.join(tmp_path, "user.parquet"),
        item_table=os.path.join(tmp_path, "item.parquet"),
        edge_table=os.path.join(tmp_path, "edges.parquet"),
    )
    cfg = text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    # the dataloader surfaces static-shape hard-neg indices
    from torcheasyrec_tpu.datasets.dataset import create_dataloader
    from torcheasyrec_tpu.features import create_features

    features = create_features(list(cfg.feature_configs))
    dl = create_dataloader(
        cfg.data_config, features,
        os.path.join(tmp_path, "train.parquet"), mode="train",
    )
    it = iter(dl())
    batch, _ = next(it)
    hni = batch.additional["hard_neg_indices"]
    assert hni.shape == (64 * 2, 2)
    assert (hni[:, 0] <= 64).all()
    # every real slot's user row is in range and cols < num_hard
    real = hni[hni[:, 0] < 64]
    assert len(real) > 0 and (real[:, 1] < 2).all()
    batch2, _ = next(it)
    assert batch2.additional["hard_neg_indices"].shape == hni.shape
    if hasattr(it, "close"):
        it.close()

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert np.isfinite(result.get("loss_softmax_cross_entropy", 0.0))
    assert result["recall@5"] > 0.2, result
