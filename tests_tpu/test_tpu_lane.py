"""Real-chip smoke lane: compiled Pallas kernels + HBM-scale layouts.

Covers the bug classes the CPU suite cannot see (tests/conftest.py
forces interpret-mode Pallas + small arrays):
1. compiled (Mosaic) pallas_hstu_mha fwd + bwd vs the XLA reference
2. the row_write DMA kernel, including chunk < ring-depth edges
3. packed init + update on a 1M-row NARROW table — round 3's OOM class
   (a [rows, slot] device intermediate lane-pads slot->128 under
   T(8,128) tiling and explodes HBM)
4. one jitted DeepFM train step at a production-shaped batch
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_pallas_hstu_mha_compiled_fwd_bwd():
    from torcheasyrec_tpu.ops.hstu import _jax_hstu_mha
    from torcheasyrec_tpu.ops.pallas.hstu_attention import pallas_hstu_mha

    b, n, h, d = 2, 256, 2, 64
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.float32) * 0.1
    k = jax.random.normal(kk, (b, n, h, d), jnp.float32) * 0.1
    v = jax.random.normal(kv, (b, n, h, d), jnp.float32) * 0.1
    lengths = jnp.array([200, 128], jnp.int32)
    alpha = 1.0 / d

    def loss_pallas(q, k, v):
        return pallas_hstu_mha(q, k, v, lengths, alpha, causal=True,
                               max_attn_len=64).sum()

    def ref(q, k, v):
        return _jax_hstu_mha(
            q, k, v, lengths, alpha, True, None, 64, 0, 0, n
        )

    def loss_ref(q, k, v):
        return ref(q, k, v).sum()

    out_p = jax.jit(
        lambda q, k, v: pallas_hstu_mha(q, k, v, lengths, alpha,
                                        causal=True, max_attn_len=64)
    )(q, k, v)
    out_r = ref(q, k, v)
    np.testing.assert_allclose(
        jax.device_get(out_p), jax.device_get(out_r), rtol=2e-3, atol=2e-4
    )
    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    for a, bb in zip(gp, gr):
        np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(bb), rtol=2e-2, atol=2e-3
        )


def test_pallas_hstu_mha_folded_heads_d128():
    """d % 128 == 0 takes the no-transpose folded-lane path — the
    production DLRM-HSTU shape (4 heads x 128)."""
    from torcheasyrec_tpu.ops.hstu import _jax_hstu_mha
    from torcheasyrec_tpu.ops.pallas.hstu_attention import pallas_hstu_mha

    b, n, h, d = 4, 512, 4, 128
    kq, kk, kv = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.bfloat16) * 0.1
    k = jax.random.normal(kk, (b, n, h, d), jnp.bfloat16) * 0.1
    v = jax.random.normal(kv, (b, n, h, d), jnp.bfloat16) * 0.1
    lengths = jnp.array([500, 256, 130, 512], jnp.int32)
    ntarg = jnp.array([8, 4, 2, 16], jnp.int32)
    alpha = 1.0 / d

    def pal(q, k, v):
        return pallas_hstu_mha(q, k, v, lengths, alpha, causal=True,
                               num_targets=ntarg)

    def ref(q, k, v):
        return _jax_hstu_mha(q, k, v, lengths, alpha, True, ntarg,
                             0, 0, 0, n).astype(q.dtype)

    out_p = jax.jit(pal)(q, k, v)
    out_r = jax.jit(ref)(q, k, v)
    np.testing.assert_allclose(
        jax.device_get(out_p).astype(np.float32),
        jax.device_get(out_r).astype(np.float32), rtol=2e-2, atol=2e-3,
    )
    gp = jax.jit(jax.grad(
        lambda q, k, v: pal(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    ))(q, k, v)
    gr = jax.jit(jax.grad(
        lambda q, k, v: ref(q, k, v).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    ))(q, k, v)
    for a, bb in zip(gp, gr):
        np.testing.assert_allclose(
            jax.device_get(a).astype(np.float32),
            jax.device_get(bb).astype(np.float32), rtol=3e-2, atol=3e-3,
        )


def test_row_write_kernel_compiled():
    from torcheasyrec_tpu.ops.pallas.row_write import write_rows

    rows_n, lanes = 16384, 128
    table = jnp.zeros((rows_n + 1, lanes), jnp.float32)
    rng = np.random.default_rng(0)
    for n_ids in (0, 1, 7, 16, 300, 8192, 9000):
        ids_np = rng.choice(rows_n, size=max(n_ids, 1), replace=False)
        ids = jnp.asarray(ids_np[:n_ids], jnp.int32)
        vals = jnp.asarray(
            rng.normal(size=(n_ids, lanes)).astype(np.float32)
        )
        got = jax.jit(
            lambda t, i, r: write_rows(t, i, r, scratch_id=rows_n)
        )(table, ids, vals)
        expect = np.zeros((rows_n + 1, lanes), np.float32)
        if n_ids:
            expect[np.asarray(ids)] = np.asarray(vals)
        got_np = np.asarray(jax.device_get(got))
        np.testing.assert_array_equal(
            got_np[:rows_n], expect[:rows_n], err_msg=f"n_ids={n_ids}"
        )


def test_packed_narrow_table_init_update_1m_rows(monkeypatch):
    """Round-3 OOM class: narrow (dim 4) wide-style table at scale.
    1M rows keeps the lane fast; the failure mode (device [rows, slot]
    intermediate) scales linearly so it would already dominate here."""
    monkeypatch.setenv("TZREC_PACKED", "1")
    monkeypatch.setenv("TZREC_TABLE_MERGE", "1")
    from torcheasyrec_tpu.datasets.utils import SparseField
    from torcheasyrec_tpu.parallel.emb_engine import (
        EmbeddingEngine, LookupSpec, TableSpec,
    )
    from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer

    engine = EmbeddingEngine(
        [
            TableSpec("big_wide", rows=1_000_000, dim=4),
            TableSpec("big_deep", rows=1_000_000, dim=16),
        ],
        [
            LookupSpec("w:f", "f", "big_wide", "sum"),
            LookupSpec("d:f", "f", "big_deep", "sum"),
        ],
        optimizer=SparseOptimizer("rowwise_adagrad", {"lr": 0.05}),
    )
    gk = engine._table_group[next(iter(engine._specs))]
    assert engine.groups[gk].packed
    tables = engine.init(jax.random.key(0))
    st = engine.init_opt_state()
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 1_000_000, (8192, 1))
    )
    sparse = {"f": SparseField(values=ids)}

    @jax.jit
    def step(tables, st):
        out, res = engine.lookup(tables, sparse)
        grads = {k: jnp.ones_like(v) for k, v in out.items()}
        return engine.update(tables, st, res, grads, jnp.float32(1.0))

    nt, _ = step(tables, st)
    moved = engine.extract_table(nt, "big_wide")
    before = engine.extract_table(tables, "big_wide")
    touched = np.unique(np.asarray(ids).reshape(-1))
    assert np.abs(moved[touched] - before[touched]).sum() > 0
    untouched = np.setdiff1d(np.arange(50_000), touched)[:1000]
    np.testing.assert_array_equal(moved[untouched], before[untouched])


def test_jitted_deepfm_train_step():
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.datasets.pack import pack_and_put
    from torcheasyrec_tpu.main import (
        _build_model_and_optim, _init_state, make_train_step,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )
    from google.protobuf import text_format
    from torcheasyrec_tpu.protos import pipeline_pb2

    buckets = [100_000, 50_000, 1000, 10]
    lines = [
        'train_input_path: "x"', 'eval_input_path: "x"',
        'model_dir: "/tmp/tpu_lane_model"',
        "train_config { sparse_optimizer { rowwise_adagrad_optimizer "
        "{ lr: 0.01 } constant_learning_rate {} } dense_optimizer "
        "{ adam_optimizer { lr: 0.001 } constant_learning_rate {} } "
        'num_epochs: 1 mixed_precision: "BF16" }',
        "data_config { batch_size: 4096 dataset_type: ParquetDataset "
        'fg_mode: FG_NONE label_fields: "label" }',
    ]
    for i in range(4):
        lines.append(
            f'feature_configs {{ raw_feature {{ feature_name: "i{i}" }} }}'
        )
    for i, n in enumerate(buckets):
        lines.append(
            f'feature_configs {{ id_feature {{ feature_name: "c{i}" '
            f"num_buckets: {n} embedding_dim: 16 }} }}"
        )
    cats = "".join(f'feature_names: "c{i}" ' for i in range(len(buckets)))
    ints = "".join(f'feature_names: "i{i}" ' for i in range(4))
    lines.append(
        "model_config { "
        f'feature_groups {{ group_name: "wide" {cats} group_type: WIDE }} '
        f'feature_groups {{ group_name: "fm" {cats} group_type: DEEP }} '
        f'feature_groups {{ group_name: "deep" {cats}{ints} '
        "group_type: DEEP } "
        "deepfm { deep { hidden_units: [64, 32] } "
        "final { hidden_units: [32] } wide_embedding_dim: 4 } "
        "num_class: 1 losses { binary_cross_entropy {} } "
        "metrics { auc {} } }"
    )
    cfg = text_format.Parse("\n".join(lines), pipeline_pb2.EasyRecConfig())
    model, features, sparse_sched = _build_model_and_optim(cfg, None)
    parser = DataParser(features, labels=["label"])
    r = np.random.default_rng(0)
    cols = {"label": pa.array((r.random(4096) > 0.5).astype(np.float32))}
    for i in range(4):
        cols[f"i{i}"] = pa.array(r.normal(size=4096).astype(np.float32))
    for i, n in enumerate(buckets):
        cols[f"c{i}"] = pa.array(r.integers(0, n, 4096))
    batch = pack_and_put(parser.parse_to_batch(cols), dense_bf16=True)
    dense_params, tables, sparse_opt_state = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense_params
    )
    state = {
        "dense": dense_params, "tables": tables,
        "sparse_opt": sparse_opt_state, "dense_opt": tx.init(dense_params),
        "step": jnp.zeros((), jnp.int32),
    }
    step_fn = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched, jnp.bfloat16),
        donate_argnums=(0,),
    )
    rng_key = jax.random.key(0)
    losses = []
    for _ in range(5):
        state, metrics, _ = step_fn(state, batch, rng_key)
        losses.append(float(jax.device_get(metrics["total_loss"])))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning on a fixed batch


def test_perf_floor_hstu_kernel_and_row_write():
    """Order-of-magnitude perf regression gate on the two hot kernels.

    Bounds are ~4x the round-4 measurements (HSTU fwd+bwd 14.3 ms at
    B32/N4096/H4/D128; row_write ~36 ns/row) so shared-chip noise
    can't flake the lane, while a silent fallback to the XLA path or a
    serialization bug (10x+) still fails.
    """
    import time

    from torcheasyrec_tpu.ops.pallas.hstu_attention import pallas_hstu_mha
    from torcheasyrec_tpu.ops.pallas.row_write import write_rows

    b, n, h, d = 8, 2048, 4, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32)
                    ).astype(jnp.bfloat16) * 0.1
    k = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
         * 0.1).astype(jnp.bfloat16)
    v = (jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
         * 0.1).astype(jnp.bfloat16)
    lengths = jnp.asarray(
        np.clip(rng.integers(200, n, b), 0, n).astype(np.int32))

    g = jax.jit(jax.grad(
        lambda q, k, v: pallas_hstu_mha(
            q, k, v, lengths, 1.0 / d, causal=True
        ).astype(jnp.float32).sum(),
        argnums=(0, 1, 2),
    ))
    o = g(q, k, v)
    jax.device_get(o[0].ravel()[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(5):
            o = g(q, k, v)
        jax.device_get(o[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / 5)
    # measured ~3.5 ms at these shapes (1/4 the bench B*N) round 4
    assert best < 0.020, f"hstu fwd+bwd {best*1e3:.1f} ms (>20 ms)"

    P, N = 2_000_000, 131_072
    tgt = jnp.asarray(
        np.sort(rng.choice(P - 2, N, replace=False)).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(N, 128)).astype(np.float32))
    w = jax.jit(
        lambda t, i, r: write_rows(t, i, r, scratch_id=P - 1),
        donate_argnums=(0,),
    )
    t = w(jnp.zeros((P, 128), jnp.float32), tgt, rows)
    jax.device_get(t.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        t = w(t, tgt, rows)
    jax.device_get(t.ravel()[0])
    per_row = (time.perf_counter() - t0) / 10 / N
    # measured ~36 ns/row round 4; XLA scatter fallback is ~90-110
    assert per_row < 150e-9, f"row_write {per_row*1e9:.0f} ns/row (>150)"


def test_sla_truncation_kernel_vs_ref_compiled():
    """Semi-Local Attention + target masking, compiled Mosaic vs the
    XLA reference (VERDICT r4 #9: every Pallas mask family must run
    compiled on the chip, not just interpret-mode on CPU)."""
    from torcheasyrec_tpu.ops.hstu import _jax_hstu_mha
    from torcheasyrec_tpu.ops.pallas.hstu_attention import pallas_hstu_mha

    b, n, h, d = 2, 256, 2, 64
    key = jax.random.key(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), jnp.float32) * 0.1
    k = jax.random.normal(kk, (b, n, h, d), jnp.float32) * 0.1
    v = jax.random.normal(kv, (b, n, h, d), jnp.float32) * 0.1
    lengths = jnp.array([230, 150], jnp.int32)
    targets = jnp.array([16, 8], jnp.int32)
    alpha = 1.0 / d
    kw = dict(causal=True, sla_k1=64, sla_k2=32)

    def run_p(q, k, v):
        return pallas_hstu_mha(q, k, v, lengths, alpha,
                               num_targets=targets, **kw)

    out_p = jax.jit(run_p)(q, k, v)
    out_r = _jax_hstu_mha(q, k, v, lengths, alpha, True, targets,
                          0, 0, 0, n, sla_k1=64, sla_k2=32)
    np.testing.assert_allclose(
        jax.device_get(out_p), jax.device_get(out_r),
        rtol=2e-3, atol=2e-4,
    )
    gp = jax.jit(jax.grad(lambda *a: run_p(*a).sum(),
                          argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(
        lambda q, k, v: _jax_hstu_mha(
            q, k, v, lengths, alpha, True, targets, 0, 0, 0, n,
            sla_k1=64, sla_k2=32,
        ).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, bb in zip(gp, gr):
        np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(bb), rtol=2e-2, atol=2e-3
        )


def test_sharded_packed_step_on_chip(monkeypatch):
    """VERDICT r4 #9: the packed+sharded paths (shard_map owner a2a,
    per-shard packed blocks, pallas row-write inside shard_map) run
    COMPILED on the real chip via a 1-chip mesh + TZREC_FORCE_SHARDED.
    Numerics must match the unsharded packed engine."""
    monkeypatch.setenv("TZREC_FORCE_SHARDED", "1")
    from torcheasyrec_tpu.datasets.utils import SparseField
    from torcheasyrec_tpu.parallel.emb_engine import (
        EmbeddingEngine, LookupSpec, TableSpec,
    )
    from torcheasyrec_tpu.parallel.mesh import create_mesh
    from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer

    tables = [TableSpec("t", rows=100_000, dim=16)]
    lookups = [LookupSpec("o", "f", "t", "sum")]
    mesh = create_mesh(jax.devices()[:1])
    opt = SparseOptimizer("rowwise_adagrad", {"lr": 0.05})
    sharded = EmbeddingEngine(tables, lookups, mesh=mesh, optimizer=opt)
    monkeypatch.delenv("TZREC_FORCE_SHARDED")
    plain = EmbeddingEngine(tables, lookups, optimizer=opt)
    (gk, g), = sharded.groups.items()
    assert g.packed and g.sharding == "row_wise"

    ids = jnp.asarray(
        np.random.default_rng(1).integers(-1, 100_000, (4096, 2))
    )
    sparse = {"f": SparseField(values=ids)}
    outs = []
    finals = []
    for eng in (sharded, plain):
        t = eng.init(jax.random.key(0))
        s = eng.init_opt_state()

        @jax.jit
        def step(t, s, eng=eng):
            staged = eng.stage_route(sparse)
            o, r = eng.lookup(t, sparse, staged=staged)
            grads = {k: v * 0.1 for k, v in o.items()}
            nt, ns = eng.update(t, s, r, grads, jnp.float32(1.0))
            return o, nt, ns

        for _ in range(2):
            o, t, s = step(t, s)
        outs.append(np.asarray(jax.device_get(o["o"])))
        finals.append(np.asarray(eng.extract_table(t, "t")))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(finals[0], finals[1], rtol=1e-5,
                               atol=1e-6)


def test_grouped_dispatch_scan_step_on_chip():
    """steps_per_dispatch > 1: the scanned K-step train step (ONE
    dispatch, lax.scan over stacked batches) compiles and trains on the
    chip — the degradation-resilient production pipeline lane."""
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.datasets.pack import (
        pack_batch, put_packed_group, stack_packed,
    )
    from torcheasyrec_tpu.main import (
        _build_model_and_optim, _init_state, make_train_step_scan,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )
    from google.protobuf import text_format
    from torcheasyrec_tpu.protos import pipeline_pb2

    cfg = text_format.Parse(
        """
train_input_path: "x"
eval_input_path: "x"
model_dir: "/tmp/tpu_lane_scan_model"
train_config {
  sparse_optimizer { adagrad_optimizer { lr: 0.05 }
                     constant_learning_rate {} }
  dense_optimizer { adam_optimizer { lr: 0.002 }
                    constant_learning_rate {} }
  num_epochs: 1
}
data_config { batch_size: 256 dataset_type: ParquetDataset
              fg_mode: FG_NONE label_fields: "label" }
feature_configs { id_feature { feature_name: "cat_a"
                  num_buckets: 10000 embedding_dim: 16 } }
feature_configs { id_feature { feature_name: "cat_b"
                  num_buckets: 1000 embedding_dim: 16 } }
feature_configs { raw_feature { feature_name: "num_a" } }
model_config {
  feature_groups { group_name: "wide" feature_names: "cat_a"
                   feature_names: "cat_b" group_type: WIDE }
  feature_groups { group_name: "fm" feature_names: "cat_a"
                   feature_names: "cat_b" group_type: DEEP }
  feature_groups { group_name: "deep" feature_names: "cat_a"
                   feature_names: "cat_b" feature_names: "num_a"
                   group_type: DEEP }
  deepfm { deep { hidden_units: [32, 16] }
           final { hidden_units: [16] } wide_embedding_dim: 8 }
  num_class: 1
  losses { binary_cross_entropy {} }
  metrics { auc {} }
}
""",
        pipeline_pb2.EasyRecConfig(),
    )
    model, features, sparse_sched = _build_model_and_optim(cfg, None)
    parser = DataParser(features, labels=["label"])
    rng = np.random.default_rng(0)
    K, B = 4, 256
    packs = []
    for i in range(K):
        cols = {
            "cat_a": pa.array(rng.integers(0, 10000, B)),
            "cat_b": pa.array(rng.integers(0, 1000, B)),
            "num_a": pa.array(rng.normal(size=B).astype(np.float32)),
            "label": pa.array((rng.random(B) > 0.5).astype(np.float32)),
        }
        packs.append(pack_batch(parser.parse_to_batch(cols)))
    group = put_packed_group(stack_packed(packs))
    dense, tables, sparse_opt = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense
    )
    state = {
        "dense": dense, "tables": tables, "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense),
        "step": jnp.zeros((), jnp.int32),
    }
    scan_step = jax.jit(
        make_train_step_scan(model, tx, sparse_sched, dense_sched,
                             jnp.float32),
        donate_argnums=(0,),
    )
    state, m, _ = scan_step(state, group, jax.random.key(0))
    l0 = float(jax.device_get(m["total_loss"]))
    for _ in range(5):
        state, m, _ = scan_step(state, group, jax.random.key(0))
    l1 = float(jax.device_get(m["total_loss"]))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0, (l0, l1)
    assert int(jax.device_get(state["step"])) == 6 * K
