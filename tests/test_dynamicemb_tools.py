"""dynamicemb tooling: ZCH warm-start init ckpt + table-kind conversion.

Counterpart coverage of
/root/reference/tzrec/tools/dynamicemb/create_dynamicemb_init_ckpt_test.py
and zch_to_dynamicemb_convert_test.py.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

CFG_TMPL = """
train_input_path: "{tmp}/train.parquet"
eval_input_path: "{tmp}/train.parquet"
model_dir: "{tmp}/model"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.1 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.01 }}
                       constant_learning_rate {{}} }}
    num_epochs: 1
}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    id_feature {{
        feature_name: "raw_id"
        embedding_dim: 8
        {id_table}
    }}
}}
model_config {{
    feature_groups {{ group_name: "deep" feature_names: "raw_id"
                      group_type: DEEP }}
    deepfm {{ deep {{ hidden_units: [16] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""


@pytest.fixture()
def zch_env(tmp_path):
    tmp = str(tmp_path)
    rng = np.random.default_rng(3)
    ids = rng.choice(2**30, size=50, replace=False).astype(np.int64)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    pq.write_table(
        pa.table({
            "raw_id": pa.array(np.repeat(ids[:4], 4)),
            "label": pa.array(np.zeros(16, np.float32)),
        }),
        os.path.join(tmp, "train.parquet"),
    )
    pq.write_table(
        pa.table({
            "id": pa.array(ids),
            "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
        }),
        os.path.join(tmp, "vectors.parquet"),
    )

    def write_cfg(name, id_table):
        p = os.path.join(tmp, name)
        with open(p, "w") as f:
            f.write(CFG_TMPL.format(tmp=tmp, id_table=id_table))
        return p

    return tmp, ids, vecs, write_cfg


def _read_ckpt(ckpt_dir):
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.join(os.path.abspath(ckpt_dir), "state"))


def _verified_rows(raw, table, ids):
    """(mask, rows) — rows of `ids` actually resident in the zch table."""
    import jax.numpy as jnp

    from torcheasyrec_tpu.parallel import zch as zch_mod

    st = {k: jnp.asarray(v) for k, v in raw["zch"][table].items()}
    w = np.asarray(raw["canonical_tables"][table]["weight"])
    cfg = zch_mod.ZchConfig(size=st["keys"].shape[0])
    sl, _ = zch_mod.lookup_insert(
        st, cfg, jnp.asarray(ids, jnp.int32), jnp.int32(0), False
    )
    sl = np.asarray(sl)
    keys = np.asarray(st["keys"])
    ok = (sl >= 0) & (keys[np.maximum(sl, 0)] == ids.astype(np.int32))
    return ok, w[np.maximum(sl, 0)]


def test_create_zch_init_ckpt(zch_env):
    from torcheasyrec_tpu.tools.dynamicemb.create_zch_init_ckpt import (
        create_init_ckpt,
    )

    tmp, ids, vecs, write_cfg = zch_env
    cfg = write_cfg("zch.config", "zch { zch_size: 128 lfu {} }")
    save = os.path.join(tmp, "init_ckpt")
    inserted = create_init_ckpt(
        cfg, {"raw_id_emb": os.path.join(tmp, "vectors.parquet")}, save
    )
    # 50 ids into a 128-slot / 8-probe table: near-total residency
    assert inserted["raw_id_emb"] >= 45

    raw = _read_ckpt(save)
    ok, rows = _verified_rows(raw, "raw_id_emb", ids)
    assert ok.sum() == inserted["raw_id_emb"]
    np.testing.assert_allclose(rows[ok], vecs[ok], rtol=1e-6)
    # warm rows carry a positive score so fresh ids don't evict them
    counts = np.asarray(raw["zch"]["raw_id_emb"]["count"])
    keys = np.asarray(raw["zch"]["raw_id_emb"]["keys"])
    assert (counts[keys >= 0] >= 1.0).all()

    # unknown table name errors
    with pytest.raises(ValueError, match="not a ZCH table"):
        create_init_ckpt(
            cfg, {"nope": os.path.join(tmp, "vectors.parquet")},
            os.path.join(tmp, "bad"),
        )


def test_convert_zch_resize_and_dump(zch_env):
    from torcheasyrec_tpu.tools.dynamicemb.convert_zch_ckpt import (
        convert_zch_ckpt,
    )
    from torcheasyrec_tpu.tools.dynamicemb.create_zch_init_ckpt import (
        create_init_ckpt,
    )

    tmp, ids, vecs, write_cfg = zch_env
    old_cfg = write_cfg("zch.config", "zch { zch_size: 128 lfu {} }")
    old_ckpt = os.path.join(tmp, "init_ckpt")
    inserted = create_init_ckpt(
        old_cfg, {"raw_id_emb": os.path.join(tmp, "vectors.parquet")}, old_ckpt
    )

    # --- dump: (id, embedding, score) parquet round-trips ---
    dump = os.path.join(tmp, "dump")
    rep = convert_zch_ckpt(old_cfg, old_ckpt, None, None, dump_dir=dump)
    assert rep["raw_id_emb"]["kept"] == inserted["raw_id_emb"]
    dumped = pq.read_table(os.path.join(dump, "raw_id_emb.parquet"))
    assert dumped.num_rows == inserted["raw_id_emb"]
    by_id = {int(i): e for i, e in zip(
        dumped["id"].to_pylist(), dumped["embedding"].to_pylist()
    )}
    id_to_vec = {int(i): v for i, v in zip(ids, vecs)}
    hits = 0
    for i, e in by_id.items():
        if i in id_to_vec:
            np.testing.assert_allclose(e, id_to_vec[i], rtol=1e-6)
            hits += 1
    assert hits == inserted["raw_id_emb"]

    # --- zch 128 -> zch 32: hottest-first refill, rows survive ---
    new_cfg = write_cfg("zch_small.config", "zch { zch_size: 32 lfu {} }")
    save = os.path.join(tmp, "converted")
    rep = convert_zch_ckpt(old_cfg, old_ckpt, new_cfg, save)
    kept, dropped = rep["raw_id_emb"]["kept"], rep["raw_id_emb"]["dropped"]
    assert kept + dropped == inserted["raw_id_emb"]
    assert 0 < kept <= 32
    raw = _read_ckpt(save)
    ok, rows = _verified_rows(raw, "raw_id_emb", ids)
    assert ok.sum() == kept
    np.testing.assert_allclose(rows[ok], vecs[ok], rtol=1e-6)


def test_convert_zch_to_static(zch_env):
    from torcheasyrec_tpu.tools.dynamicemb.convert_zch_ckpt import (
        convert_zch_ckpt,
    )
    from torcheasyrec_tpu.tools.dynamicemb.create_zch_init_ckpt import (
        create_init_ckpt,
    )

    tmp, ids, vecs, write_cfg = zch_env
    old_cfg = write_cfg("zch.config", "zch { zch_size: 128 lfu {} }")
    old_ckpt = os.path.join(tmp, "init_ckpt")
    inserted = create_init_ckpt(
        old_cfg, {"raw_id_emb": os.path.join(tmp, "vectors.parquet")}, old_ckpt
    )
    new_cfg = write_cfg("static.config", "num_buckets: 64")
    save = os.path.join(tmp, "static_ckpt")
    rep = convert_zch_ckpt(old_cfg, old_ckpt, new_cfg, save)
    assert rep["raw_id_emb"]["kept"] + rep["raw_id_emb"]["dropped"] == inserted["raw_id_emb"]

    raw = _read_ckpt(save)
    w = np.asarray(raw["canonical_tables"]["raw_id_emb"]["weight"])
    assert w.shape == (64, 8)
    # every collision-free static slot holds exactly its id's vector
    # (the zch table stores int32-cast keys, so mod that value)
    slots = (ids.astype(np.int32).astype(np.int64)) % 64
    uniq, cnt = np.unique(slots, return_counts=True)
    free = set(uniq[cnt == 1])
    checked = 0
    ok, _ = _verified_rows(_read_ckpt(old_ckpt), "raw_id_emb", ids)
    for i in range(len(ids)):
        if slots[i] in free and ok[i]:
            np.testing.assert_allclose(w[slots[i]], vecs[i], rtol=1e-6)
            checked += 1
    assert checked > 10
