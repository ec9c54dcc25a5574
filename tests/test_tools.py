"""Tools tests: hitrate, faiss index, TDM tree, fg.json CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_hitrate_bruteforce():
    from torcheasyrec_tpu.tools.hitrate import compute_hitrate

    rng = np.random.default_rng(0)
    item_emb = rng.normal(size=(200, 16)).astype(np.float32)
    item_ids = np.arange(200, dtype=np.int64)
    # queries = noisy copies of some items -> their gt should be retrieved
    picks = rng.integers(0, 200, size=50)
    query = item_emb[picks] + rng.normal(size=(50, 16)).astype(np.float32) * 0.01
    gt = [[int(p)] for p in picks]
    hitrate, per_q = compute_hitrate(query, gt, item_ids, item_emb, top_k=5)
    assert hitrate > 0.95


def test_faiss_index_fallback(tmp_path):
    from torcheasyrec_tpu.tools.create_faiss_index import build_index

    tmp_path = str(tmp_path)
    rng = np.random.default_rng(0)
    tbl = pa.table({
        "id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array(list(rng.normal(size=(50, 8)).astype(
            np.float32
        ))),
    })
    path = os.path.join(tmp_path, "emb.parquet")
    pq.write_table(tbl, path)
    out = build_index(path, os.path.join(tmp_path, "index"))
    assert os.path.exists(out)


def test_tdm_tree_build_and_beam_search(tmp_path):
    from torcheasyrec_tpu.tools.tdm.gen_tree import (
        beam_search_retrieval,
        init_tree,
    )

    tmp_path = str(tmp_path)
    n_items = 37
    tbl = pa.table({
        "id": pa.array(np.arange(n_items, dtype=np.int64)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array([str(i) for i in range(n_items)]),
    })
    items = os.path.join(tmp_path, "items.parquet")
    pq.write_table(tbl, items)
    out = os.path.join(tmp_path, "tree")
    init_tree(items, out, branching=2)

    edges = pq.read_table(os.path.join(out, "edge_table.parquet"))
    parents = edges.column("parent").to_numpy(zero_copy_only=False)
    childs = edges.column("child").to_numpy(zero_copy_only=False)
    children = {}
    for p, c in zip(parents, childs):
        children.setdefault(int(p), []).append(int(c))
    root = int(open(os.path.join(out, "root_id.txt")).read())
    # every leaf reachable from root
    seen = set()
    stack = [root]
    while stack:
        n = stack.pop()
        if n < n_items:
            seen.add(n)
        stack.extend(children.get(n, []))
    assert seen == set(range(n_items))

    # beam search with an oracle scorer prefers the target leaf's path
    target = 17
    # score nodes by whether target is under them
    def under(n):
        if n == target:
            return True
        return any(under(c) for c in children.get(n, []))

    def score_fn(cands):
        return np.asarray([1.0 if under(int(c)) else 0.0 for c in cands])

    leaves = beam_search_retrieval(score_fn, children, root, beam=1)
    assert leaves == [target]


def test_tdm_sampler_with_generated_tree(tmp_path):
    """TDMSampler consumes the generated tree tables."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.datasets.sampler import TDMSampler
    from torcheasyrec_tpu.protos import sampler_pb2
    from torcheasyrec_tpu.tools.tdm.gen_tree import init_tree

    tmp_path = str(tmp_path)
    n_items = 16
    tbl = pa.table({
        "id": pa.array(np.arange(n_items, dtype=np.int64)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array([str(i) for i in range(n_items)]),
    })
    items = os.path.join(tmp_path, "items.parquet")
    pq.write_table(tbl, items)
    tree_dir = os.path.join(tmp_path, "tree")
    init_tree(items, tree_dir, branching=2)

    cfg = text_format.Parse(
        f"""
        item_input_path: "{os.path.join(tree_dir, 'node_table.parquet')}"
        edge_input_path: "{os.path.join(tree_dir, 'edge_table.parquet')}"
        predict_edge_input_path: "{os.path.join(tree_dir, 'edge_table.parquet')}"
        attr_fields: "item_id"
        item_id_field: "item_id"
        layer_num_sample: [1, 2, 2, 2]
        """,
        sampler_pb2.TDMSampler(),
    )
    sampler = TDMSampler(cfg, batch_size=4, label_field="label")
    cols = {
        "user_id": pa.array([1, 2], type=pa.int64()),
        "item_id": pa.array([3, 7], type=pa.int64()),
        "label": pa.array([1.0, 1.0]),
    }
    out = sampler.process(cols)
    labels = out["label"].to_numpy(zero_copy_only=False)
    items_out = out["item_id"].to_numpy(zero_copy_only=False)
    users = out["user_id"].to_numpy(zero_copy_only=False)
    assert len(labels) > 4  # expanded
    assert set(np.unique(labels)) <= {0.0, 1.0}
    assert labels.max() == 1.0 and labels.min() == 0.0
    assert len(users) == len(items_out) == len(labels)


TDM_CONFIG = """
    train_input_path: "{tmp_path}/eval.parquet"
    eval_input_path: "{tmp_path}/eval.parquet"
    model_dir: "{tmp_path}/model"
    train_config {{
        sparse_optimizer {{ adagrad_optimizer {{ lr: 0.01 }}
                            constant_learning_rate {{}} }}
        dense_optimizer {{ adam_optimizer {{ lr: 0.001 }}
                           constant_learning_rate {{}} }}
        num_epochs: 1
    }}
    eval_config {{}}
    data_config {{
        batch_size: 8
        dataset_type: ParquetDataset
        fg_mode: FG_NONE
        label_fields: "label"
        tdm_sampler {{
            item_input_path: "{tree_dir}/node_table.parquet"
            edge_input_path: "{tree_dir}/edge_table.parquet"
            predict_edge_input_path: "{tree_dir}/edge_table.parquet"
            attr_fields: "item_id"
            item_id_field: "item_id"
            layer_num_sample: [1, 2, 2, 2, 2, 2]
        }}
    }}
    feature_configs {{
        id_feature {{ feature_name: "user_id" num_buckets: 16
                      embedding_dim: 8 }}
    }}
    feature_configs {{
        id_feature {{ feature_name: "item_id" num_buckets: 128
                      embedding_dim: 8 }}
    }}
    feature_configs {{
        sequence_id_feature {{ feature_name: "clicks" num_buckets: 128
            embedding_dim: 8 sequence_length: 4 }}
    }}
    model_config {{
        feature_groups {{ group_name: "all"
            feature_names: ["user_id", "item_id"] group_type: DEEP }}
        feature_groups {{ group_name: "seq"
            feature_names: ["item_id", "clicks"] group_type: SEQUENCE }}
        tdm {{
            multiwindow_din {{ windows_len: [2, 2]
                               attn_mlp {{ hidden_units: [8] }} }}
            final {{ hidden_units: [16] }}
        }}
        num_class: 1
        metrics {{ auc {{}} }}
        losses {{ binary_cross_entropy {{}} }}
    }}
    """


def test_tdm_retrieval_end_to_end(tmp_path):
    """tdm_retrieval: tree gen -> model scoring -> layered beam search ->
    recall. With recall_num >= n_items every item must be retrieved
    (recall 1.0); a narrow beam exercises the child-expansion loop."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.tdm.gen_tree import init_tree
    from torcheasyrec_tpu.tools.tdm.retrieval import tdm_retrieval

    tmp_path = str(tmp_path)
    n_items = 32
    tbl = pa.table({
        "id": pa.array(np.arange(n_items, dtype=np.int64)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array([str(i) for i in range(n_items)]),
    })
    items = os.path.join(tmp_path, "items.parquet")
    pq.write_table(tbl, items)
    tree_dir = os.path.join(tmp_path, "tree")
    init_tree(items, tree_dir, branching=2)

    rng = np.random.default_rng(0)
    n_users = 24
    pq.write_table(pa.table({
        "user_id": pa.array(rng.integers(0, 16, n_users)),
        "item_id": pa.array(rng.integers(0, n_items, n_users)),
        "clicks": pa.array([
            ";".join(str(x) for x in rng.integers(0, n_items, 4))
            for _ in range(n_users)
        ]),
        "label": pa.array(np.ones(n_users, np.float32)),
    }), os.path.join(tmp_path, "eval.parquet"))

    cfg_text = TDM_CONFIG.format(tmp_path=tmp_path, tree_dir=tree_dir)
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    # full-coverage retrieval: every leaf retrievable
    res = tdm_retrieval(
        cfg_path, os.path.join(tmp_path, "eval.parquet"),
        recall_num=n_items, n_cluster=2,
    )
    assert res["total"] == n_users
    assert res["recall"] == 1.0

    # narrow beam exercises child expansion across layers + writer
    out_path = os.path.join(tmp_path, "recall.parquet")
    res4 = tdm_retrieval(
        cfg_path, os.path.join(tmp_path, "eval.parquet"), out_path,
        recall_num=4, n_cluster=2, reserved_columns="user_id",
    )
    assert 0.0 <= res4["recall"] <= 1.0
    got = pq.read_table(out_path)
    assert got.num_rows == n_users
    assert all(len(r) == 4 for r in got.column("recall_ids").to_pylist())


def test_tdm_predict_sampler_child_expansion(tmp_path):
    """TDMPredictSampler (reference sampler.py:1082-1168): expand_factor
    children per node, without replacement; pad nodes emit empty attrs."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.datasets.sampler import TDMPredictSampler
    from torcheasyrec_tpu.protos import sampler_pb2
    from torcheasyrec_tpu.tools.tdm.gen_tree import init_tree

    tmp_path = str(tmp_path)
    n_items = 16
    tbl = pa.table({
        "id": pa.array(np.arange(n_items, dtype=np.int64)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array([str(i) for i in range(n_items)]),
    })
    items = os.path.join(tmp_path, "items.parquet")
    pq.write_table(tbl, items)
    tree_dir = os.path.join(tmp_path, "tree")
    init_tree(items, tree_dir, branching=2)

    cfg = text_format.Parse(
        f"""
        item_input_path: "{os.path.join(tree_dir, 'node_table.parquet')}"
        edge_input_path: "{os.path.join(tree_dir, 'edge_table.parquet')}"
        predict_edge_input_path: "{os.path.join(tree_dir, 'edge_table.parquet')}"
        attr_fields: "item_id"
        item_id_field: "item_id"
        layer_num_sample: [1, 2, 2, 2]
        """,
        sampler_pb2.TDMSampler(),
    )
    s = TDMPredictSampler(cfg, is_training=False)
    s.init_sampler(2)

    # find a real parent from the edge table to expand
    edges = pq.read_table(os.path.join(tree_dir, "edge_table.parquet"))
    parents = edges.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    children = edges.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    p0 = int(parents[0])
    true_children = set(int(c) for pp, c in zip(parents, children)
                        if int(pp) == p0)

    got = s.get_children_ids(np.asarray([p0, -1], np.int64))
    assert got.shape == (2, 2)
    valid = [int(v) for v in got[0] if v >= 0]
    assert len(valid) == len(set(valid))  # without replacement
    assert set(valid) <= true_children
    assert (got[1] == -1).all()  # pad input -> pad children

    # get(): flattened child attr columns, reference contract
    out = s.get({"item_id": pa.array([p0], type=pa.int64())})
    assert set(out) == {"item_id"}
    assert len(out["item_id"]) == 2
    vals = [v for v in out["item_id"].to_pylist() if v]
    assert set(int(v) for v in vals) <= true_children
