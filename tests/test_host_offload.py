"""HOST_OFFLOAD (host-DDR embedding tier) tests.

The reference parks over-HBM tables in host memory via
fused_uvm/dynamicemb kernels (SURVEY §2.1); here the table + optimizer
state live as host numpy arrays, each step ships only the batch's rows
to the chip and the row grads back, and the host applies the same
fused-update math (emb_engine.py host_prefetch/host_row_grads/
host_apply).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torcheasyrec_tpu.datasets.utils import SparseField
from torcheasyrec_tpu.parallel.emb_engine import (
    DATA_PARALLEL,
    HOST_OFFLOAD,
    EmbeddingEngine,
    LookupSpec,
    TableSpec,
)
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer


def _mk(sharding, optimizer=None):
    tables = [
        TableSpec("t_a", rows=100, dim=16, sharding=sharding),
        TableSpec("t_b", rows=50, dim=8, sharding=sharding),
    ]
    lookups = [
        LookupSpec("a", "f_a", "t_a", "sum"),
        LookupSpec("b", "f_b", "t_b", "mean"),
        LookupSpec("s", "f_s", "t_a", combiner="none", is_sequence=True),
    ]
    return EmbeddingEngine(
        tables, lookups,
        optimizer=optimizer or SparseOptimizer("adagrad", {"lr": 0.05}),
    )


def _batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    lengths = rng.integers(0, 3, size=b).astype(np.int32)
    n = int(lengths.sum())
    vals = np.full(16, -1, np.int64)
    vals[:n] = rng.integers(0, 100, size=n)
    sparse = {
        "f_a": SparseField(values=jnp.asarray(vals),
                           lengths=jnp.asarray(lengths)),
        "f_b": SparseField(values=jnp.asarray(
            rng.integers(0, 50, size=(b, 2)))),
    }
    seq = {
        "f_s": SparseField(
            values=jnp.asarray(rng.integers(-1, 100, size=(b, 4))),
            lengths=jnp.asarray(
                rng.integers(0, 5, size=b).astype(np.int32)
            ),
        )
    }
    return sparse, seq


@pytest.mark.parametrize("opt_kind,cfg", [
    ("adagrad", {"lr": 0.05}),
    ("sgd", {"lr": 0.05}),
    ("rowwise_adagrad", {"lr": 0.05}),
    ("adam", {"lr": 0.01}),
])
def test_host_matches_device_path(opt_kind, cfg):
    """lookup outputs and multi-step updates match the device
    (data_parallel) engine exactly — the host numpy optimizer mirrors
    the fused device math."""
    dev = _mk(DATA_PARALLEL, SparseOptimizer(opt_kind, cfg))
    host = _mk(HOST_OFFLOAD, SparseOptimizer(opt_kind, cfg))
    key = jax.random.key(7)
    t_dev = dev.init(key)
    s_dev = dev.init_opt_state()
    t_host = host.init(key)  # host groups live in engine.host_tables
    host.init_opt_state()
    assert t_host == {} and host.has_host_groups
    for tn in ("t_a", "t_b"):
        np.testing.assert_allclose(
            dev.extract_table(t_dev, tn), host.extract_table({}, tn)
        )

    for step in range(3):
        sparse, seq = _batch(seed=step)
        out_dev, res_dev = dev.lookup(t_dev, sparse, seq)
        rows, ids = host.host_prefetch(sparse, seq)
        hr = {gk: jnp.asarray(v) for gk, v in rows.items()}
        out_host, res_host = host.lookup({}, sparse, seq, host_rows=hr)
        for k in out_dev:
            np.testing.assert_allclose(
                np.asarray(out_dev[k]), np.asarray(out_host[k]),
                rtol=1e-6, atol=1e-6, err_msg=f"output {k} step {step}",
            )
        out_grads = {
            k: jnp.asarray(
                np.random.default_rng(step * 10 + i)
                .normal(size=np.asarray(v).shape),
                jnp.float32,
            )
            for i, (k, v) in enumerate(sorted(out_dev.items()))
        }
        t_dev, s_dev = dev.update(
            t_dev, s_dev, res_dev, out_grads, jnp.float32(1.0)
        )
        hg = host.host_row_grads(res_host, out_grads)
        assert set(hg) == set(rows)
        host.host_apply(
            {gk: np.asarray(v) for gk, v in hg.items()}, ids, 1.0
        )
    for tn in ("t_a", "t_b"):
        np.testing.assert_allclose(
            dev.extract_table(t_dev, tn), host.extract_table({}, tn),
            rtol=1e-5, atol=1e-6, err_msg=f"table {tn} after training",
        )


def test_host_canonical_roundtrip():
    host = _mk(HOST_OFFLOAD)
    key = jax.random.key(3)
    host.init(key)
    host.init_opt_state()
    before = {tn: host.extract_table({}, tn).copy()
              for tn in ("t_a", "t_b")}
    canon = host.to_canonical({}, {})
    assert set(canon) == {"t_a", "t_b"}
    np.testing.assert_allclose(canon["t_a"]["weight"], before["t_a"])

    # a fresh engine restores the host tables through the canonical
    # layout (plan-independent checkpoint contract)
    host2 = _mk(HOST_OFFLOAD)
    host2.init(jax.random.key(99))  # different init
    host2.init_opt_state()
    host2.from_canonical(canon, {}, {})
    for tn in ("t_a", "t_b"):
        np.testing.assert_allclose(
            host2.extract_table({}, tn), before[tn]
        )


def test_host_rejects_unsupported_optimizer():
    with pytest.raises(ValueError, match="host_offload supports"):
        _mk(HOST_OFFLOAD, SparseOptimizer("lamb", {"lr": 0.01}))


def test_host_offload_e2e_train(tmp_path):
    """DeepFM with one host_offloaded table trains end to end from the
    config (embedding_constraints { sharding_types: 'host_offload' }),
    checkpoints through the canonical layout, and restores."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 1024
    ids = rng.integers(0, 500, n)
    latent = rng.normal(size=500)
    score = 2.5 * latent[ids]
    labels = (rng.random(n) < 1 / (1 + np.exp(-score))).astype(np.float32)
    tbl = pa.table({
        "item_id": pa.array(ids.astype(np.int64)),
        "label": pa.array(labels),
    })
    pq.write_table(tbl.slice(0, 768), os.path.join(tmp, "train.parquet"))
    pq.write_table(tbl.slice(768), os.path.join(tmp, "eval.parquet"))
    cfg_text = f"""
train_input_path: "{tmp}/train.parquet"
eval_input_path: "{tmp}/eval.parquet"
model_dir: "{tmp}/model"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.1 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.01 }}
                       constant_learning_rate {{}} }}
    num_epochs: 8
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
        feature_name: "item_id"
        num_buckets: 500
        embedding_dim: 8
        embedding_constraints {{ sharding_types: "host_offload" }}
    }}
}}
model_config {{
    feature_groups {{ group_name: "deep" feature_names: "item_id"
                      group_type: DEEP }}
    feature_groups {{ group_name: "wide" feature_names: "item_id"
                      group_type: WIDE }}
    deepfm {{ deep {{ hidden_units: [16] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""
    cfg_path = os.path.join(tmp, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.75, result

    # the trained host table rode the canonical checkpoint
    from torcheasyrec_tpu.utils import checkpoint_util

    ckpt = checkpoint_util.latest_checkpoint(os.path.join(tmp, "model"))
    model2, _, _ = tzrec_main._build_model_and_optim(
        config_util_load(cfg_path), None
    )
    eg2 = model2.embedding_group
    assert eg2.engine.has_host_groups
    dense2, tables2, so2 = tzrec_main._init_state(model2, None)
    state2 = {"dense": dense2, "tables": tables2, "sparse_opt": so2,
              "step": jnp.zeros((), jnp.int32)}
    state2 = checkpoint_util.restore_train_state(ckpt, model2, state2)
    w = eg2.engine.extract_table({}, "item_id_emb")
    assert np.abs(w).sum() > 0  # trained, not zeros


def config_util_load(path):
    from torcheasyrec_tpu.utils import config_util

    return config_util.load_pipeline_config(path)


def test_planner_host_tier_and_constraints():
    from torcheasyrec_tpu.parallel import planner

    # one table way over the HBM budget must offload to DDR; small
    # tables stay on-device
    specs = [
        TableSpec("huge", rows=50_000_000, dim=64),
        TableSpec("small", rows=1000, dim=64),
        TableSpec("pinned", rows=1000, dim=64,
                  sharding_types=("table_wise",)),
        TableSpec("zchy", rows=1_000_000, dim=64),
    ]
    plan = planner.create_plan(
        specs, n_devices=4, batch_size=256,
        hbm_budget=2e9, ddr_budget=64e9, shards_per_host=4,
        host_excluded={"zchy"},
    )
    assert plan["huge"] == HOST_OFFLOAD
    assert plan["pinned"] == "table_wise"  # constraint wins
    assert plan["zchy"] != HOST_OFFLOAD  # excluded tables stay on-device
    assert plan["small"] != HOST_OFFLOAD

    # plan round-trips through save/load and drives the engine
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        planner.save_plan(plan, d)
        assert planner.load_plan(d) == plan

    engine = EmbeddingEngine(
        [TableSpec("huge", rows=1000, dim=16, sharding=plan["huge"])],
        [LookupSpec("h", "f_h", "huge", "sum")],
        optimizer=SparseOptimizer("adagrad", {"lr": 0.1}),
    )
    engine.init(jax.random.key(0))
    assert engine.has_host_groups


def test_planner_dcn_prefers_twrw_for_hot_tables():
    """With a slow cross-host link, table_wise's single-owner hot spot
    costs more than table_row_wise's host-group split."""
    from torcheasyrec_tpu.parallel import planner

    opts = planner._options(
        TableSpec("t", rows=100_000, dim=128), n_devices=8,
        ids_per_step=4096, opt_factor=1.0, shards_per_host=4,
    )
    by = {o.sharding: o for o in opts}
    assert by["table_row_wise"].time_cost < by["table_wise"].time_cost
    assert by[HOST_OFFLOAD].ddr_bytes > 0
    assert by[HOST_OFFLOAD].mem_bytes < by["row_wise"].mem_bytes


def test_host_prefetch_overlap_exact(tmp_path, monkeypatch):
    """The overlapped host-row gather (rows for step N+1 fetched while
    step N runs, repaired after host_apply) must be bit-identical to
    the synchronous gather — heavy id overlap across consecutive
    batches stresses the repair path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torcheasyrec_tpu import main as tzrec_main

    tmp = str(tmp_path)
    rng = np.random.default_rng(1)
    n = 1024
    ids = rng.integers(0, 60, n)  # tiny vocab -> every batch collides
    labels = (rng.random(n) < 0.5).astype(np.float32)
    tbl = pa.table({
        "item_id": pa.array(ids.astype(np.int64)),
        "label": pa.array(labels),
    })
    pq.write_table(tbl.slice(0, 768), os.path.join(tmp, "train.parquet"))
    pq.write_table(tbl.slice(768), os.path.join(tmp, "eval.parquet"))
    cfg_tmpl = """
train_input_path: "{tmp}/train.parquet"
eval_input_path: "{tmp}/eval.parquet"
model_dir: "{tmp}/{mdir}"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.1 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.01 }}
                       constant_learning_rate {{}} }}
    num_epochs: 3
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
        feature_name: "item_id"
        num_buckets: 60
        embedding_dim: 8
        embedding_constraints {{ sharding_types: "host_offload" }}
    }}
}}
model_config {{
    feature_groups {{ group_name: "deep" feature_names: "item_id"
                      group_type: DEEP }}
    feature_groups {{ group_name: "wide" feature_names: "item_id"
                      group_type: WIDE }}
    deepfm {{ deep {{ hidden_units: [16] }} }}
    losses {{ binary_cross_entropy {{}} }}
    metrics {{ auc {{}} }}
}}
"""

    def _run(mdir, prefetch):
        monkeypatch.setenv("TZREC_HOST_PREFETCH", prefetch)
        p = os.path.join(tmp, f"{mdir}.config")
        with open(p, "w") as f:
            f.write(cfg_tmpl.format(tmp=tmp, mdir=mdir))
        res = tzrec_main.train_and_evaluate(p)
        model, _, _ = tzrec_main._build_model_and_optim(
            config_util_load(p), None
        )
        return res, model

    res_sync, m1 = _run("m_sync", "0")
    res_pre, m2 = _run("m_pre", "1")
    assert res_sync["auc"] == res_pre["auc"], (res_sync, res_pre)

    from torcheasyrec_tpu.utils import checkpoint_util

    tables = []
    for mdir, model in (("m_sync", m1), ("m_pre", m2)):
        ckpt = checkpoint_util.latest_checkpoint(os.path.join(tmp, mdir))
        dense, tbls, so = tzrec_main._init_state(model, None)
        state = {"dense": dense, "tables": tbls, "sparse_opt": so,
                 "step": jnp.zeros((), jnp.int32)}
        state = checkpoint_util.restore_train_state(ckpt, model, state)
        tables.append(
            np.array(model.embedding_group.engine.extract_table(
                {}, "item_id_emb"
            ))
        )
    np.testing.assert_array_equal(tables[0], tables[1])
