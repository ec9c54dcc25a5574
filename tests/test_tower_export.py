"""Per-tower export serving contract (VERDICT #5).

Reference behavior: match models export user/item towers separately so
the item tower can batch-embed the corpus for an ANN index and the user
tower serves queries (tzrec/main.py:1032-1056); TDM exports an
embedding/model split (tzrec/main.py:1053-1070). The test trains DSSM,
exports, then computes recall FROM THE EXPORTED ARTIFACTS ONLY.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from test_match_integration import DSSM_CONFIG, _gen_data


def test_dssm_tower_export_retrieval(tmp_path):
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

    tzrec_main.train_and_evaluate(cfg_path)

    export_dir = os.path.join(tmp_path, "export")
    tzrec_main.export(cfg_path, export_dir)

    # artifact layout: per-tower subdirs with weights + configs + HLO
    for tower in ("user", "item"):
        tdir = os.path.join(export_dir, tower)
        for fname in ("pipeline.config", "fg.json", "tower.json",
                      "tower_fn.stablehlo", "serving_spec.json"):
            assert os.path.exists(os.path.join(tdir, fname)), (
                f"{tower}/{fname} missing"
            )
    with open(os.path.join(export_dir, "user", "tower.json")) as f:
        user_meta = json.load(f)
    with open(os.path.join(export_dir, "item", "tower.json")) as f:
        item_meta = json.load(f)
    assert user_meta["features"] == ["user_id"]
    assert sorted(item_meta["features"]) == ["item_cat", "item_id"]

    # ---- item corpus -> embeddings (from the item artifact only) ----
    item_tbl = pq.read_table(item)
    n_items = item_tbl.num_rows
    cats = np.array([
        int(a.split(":")[1]) for a in item_tbl.column("attrs").to_pylist()
    ])
    corpus = os.path.join(tmp_path, "corpus.parquet")
    pq.write_table(pa.table({
        "item_id": pa.array(np.arange(n_items)),
        "item_cat": pa.array(cats),
    }), corpus)
    item_out = os.path.join(tmp_path, "item_emb.parquet")
    tzrec_main.predict(
        corpus, item_out, os.path.join(export_dir, "item"),
        reserved_columns="item_id",
    )
    got = pq.read_table(item_out)
    item_ids = np.asarray(got.column("item_id"))
    item_emb = np.stack(
        [np.asarray(r) for r in got.column("item_tower_emb").to_pylist()]
    )
    assert item_emb.shape == (n_items, 8)

    # ---- user queries -> embeddings (from the user artifact only) ----
    ev = pq.read_table(evalp)
    users = np.asarray(ev.column("user_id"))
    gt_items = np.asarray(ev.column("item_id"))
    uniq_users = np.unique(users)
    gts = [list(gt_items[users == u]) for u in uniq_users]
    queries = os.path.join(tmp_path, "queries.parquet")
    pq.write_table(
        pa.table({"user_id": pa.array(uniq_users)}), queries
    )
    user_out = os.path.join(tmp_path, "user_emb.parquet")
    tzrec_main.predict(
        queries, user_out, os.path.join(export_dir, "user"),
        reserved_columns="user_id",
    )
    got_u = pq.read_table(user_out)
    query_emb = np.stack(
        [np.asarray(r) for r in got_u.column("user_tower_emb").to_pylist()]
    )
    assert query_emb.shape == (len(uniq_users), 8)

    # ---- recall from the exported embeddings only ----
    from torcheasyrec_tpu.tools.hitrate import compute_hitrate

    hitrate, _ = compute_hitrate(
        query_emb, gts, item_ids, item_emb, top_k=40
    )
    # random recall@40 over 200 items = 0.2; trained towers must beat it
    assert hitrate > 0.4, f"exported-artifact hitrate too low: {hitrate}"


def test_tdm_split_export(tmp_path):
    """TDM exports embedding/ (node features -> embedding) + model/."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.tdm.gen_tree import init_tree

    tmp_path = str(tmp_path)
    n_items = 32
    pq.write_table(pa.table({
        "id": pa.array(np.arange(n_items, dtype=np.int64)),
        "weight": pa.array(np.ones(n_items)),
        "attrs": pa.array([str(i) for i in range(n_items)]),
    }), os.path.join(tmp_path, "items.parquet"))
    tree_dir = os.path.join(tmp_path, "tree")
    init_tree(os.path.join(tmp_path, "items.parquet"), tree_dir,
              branching=2)

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

    from test_tools import TDM_CONFIG  # shared fixture

    cfg_text = TDM_CONFIG.format(tmp_path=tmp_path, tree_dir=tree_dir)
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    with open(cfg_path, "w") as f:
        f.write(cfg_text)

    from torcheasyrec_tpu import main as tzrec_main

    tzrec_main.train_and_evaluate(cfg_path)
    export_dir = os.path.join(tmp_path, "export")
    tzrec_main.export(cfg_path, export_dir)

    # split layout
    assert os.path.exists(
        os.path.join(export_dir, "embedding", "tower_fn.stablehlo")
    )
    assert os.path.exists(
        os.path.join(export_dir, "model", "predict_fn.stablehlo")
    )
    with open(os.path.join(export_dir, "embedding", "tower.json")) as f:
        meta = json.load(f)
    assert meta["features"] == ["item_id"]

    # node table -> embeddings from the embedding artifact
    nodes = os.path.join(tmp_path, "nodes.parquet")
    pq.write_table(pa.table({
        "item_id": pa.array(np.arange(n_items)),
    }), nodes)
    out = os.path.join(tmp_path, "node_emb.parquet")
    tzrec_main.predict(
        nodes, out, os.path.join(export_dir, "embedding"),
        reserved_columns="item_id",
    )
    got = pq.read_table(out)
    emb = np.stack(
        [np.asarray(r) for r in got.column("item_emb").to_pylist()]
    )
    assert emb.shape == (n_items, 8)
    assert np.isfinite(emb).all()


def test_stablehlo_export_is_strict(tmp_path, monkeypatch):
    """A failing serialization must raise, not warn (VERDICT weak #6) —
    unless TZREC_EXPORT_BEST_EFFORT=1."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.main import _serialize_stablehlo
    from torcheasyrec_tpu.protos import pipeline_pb2

    cfg = text_format.Parse(
        """
        data_config { batch_size: 4 dataset_type: ParquetDataset
                      fg_mode: FG_NONE label_fields: "label" }
        feature_configs { id_feature { feature_name: "a" num_buckets: 10
                                       embedding_dim: 4 } }
        model_config { feature_groups { group_name: "g"
                       feature_names: "a" group_type: DEEP } }
        """,
        pipeline_pb2.EasyRecConfig(),
    )
    features = create_features(list(cfg.feature_configs))

    def broken_fn(dense, tables, batch):
        raise ValueError("boom")

    with pytest.raises(RuntimeError, match="stablehlo"):
        _serialize_stablehlo(
            cfg, features, broken_fn, ({}, {}), str(tmp_path), "x.stablehlo"
        )
    monkeypatch.setenv("TZREC_EXPORT_BEST_EFFORT", "1")
    _serialize_stablehlo(  # downgraded to a warning
        cfg, features, broken_fn, ({}, {}), str(tmp_path), "x.stablehlo"
    )
