"""Co-keyed table merge (emb_engine.merge_cokeyed_tables).

The reference pays one TBE lookup per embedding-bag collection, so the
wide&deep pattern (a dim-4 WIDE table + a dim-16 DEEP table over the
same feature) gathers each id stream twice and scatters each grad twice
(/root/reference/tzrec/modules/embedding.py:722-730 builds separate
EBCs per group). The TPU engine instead fuses co-keyed tables
column-wise: one gather serves every output slice, one fused-optimizer
scatter applies every grad, with per-SEGMENT row-wise optimizer state
keeping the math identical to the unmerged layout.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torcheasyrec_tpu.datasets.utils import SparseField
from torcheasyrec_tpu.parallel.emb_engine import (
    EmbeddingEngine,
    LookupSpec,
    TableSpec,
)
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer

ALL_KINDS = [
    "sgd", "adagrad", "rowwise_adagrad", "adam", "partial_rowwise_adam",
    "lamb", "partial_rowwise_lamb", "lars_sgd", "adadelta", "rmsprop",
]


def _mk_engine(monkeypatch, merge: bool, packed: bool, kind: str,
               mesh=None):
    monkeypatch.setenv("TZREC_TABLE_MERGE", "1" if merge else "0")
    monkeypatch.setenv("TZREC_PACKED", "1" if packed else "0")
    tables = [
        TableSpec("t_wide", rows=50, dim=4, sharding="row_wise"),
        TableSpec("t_deep", rows=50, dim=16, sharding="row_wise"),
        TableSpec("t_solo", rows=30, dim=16, sharding="row_wise"),
    ]
    lookups = [
        LookupSpec("w:f", "f", "t_wide", "sum"),
        LookupSpec("d:f", "f", "t_deep", "sum"),
        LookupSpec("s:g", "g", "t_solo", "mean"),
    ]
    return EmbeddingEngine(
        tables, lookups, mesh=mesh,
        optimizer=SparseOptimizer(kind, {"lr": 0.05}),
    )


def _batch():
    return {
        "f": SparseField(values=jnp.array([[1], [2], [1], [7]])),
        "g": SparseField(values=jnp.array([[0], [3], [3], [9]])),
    }


def _run_step(engine):
    t = engine.init(jax.random.key(0))
    s = engine.init_opt_state()
    out, res = engine.lookup(t, _batch())
    grads = {k: jnp.ones_like(v) * 0.1 for k, v in out.items()}
    nt, ns = engine.update(t, s, res, grads, jnp.float32(1.0))
    snap = {n: np.asarray(engine.extract_table(nt, n))
            for n in ("t_wide", "t_deep", "t_solo")}
    st = {n: {k: np.asarray(v) for k, v in
              engine.extract_table_state(nt, ns, n).items()}
          for n in ("t_wide", "t_deep", "t_solo")}
    return out, snap, st, (nt, ns)


def test_merge_detected(monkeypatch):
    e = _mk_engine(monkeypatch, merge=True, packed=False, kind="adagrad")
    assert "t_wide" in e._merged and "t_deep" in e._merged
    assert "t_solo" not in e._merged
    mname, coff, d = e._merged["t_deep"]
    assert e._specs[mname].dim == 20
    # one lookup serves both outputs
    lks = [lk for lk in e.lookups if lk.feature_name == "f"]
    assert len(lks) == 1 and len(lks[0].col_outputs) == 2


@pytest.mark.parametrize("kind", ALL_KINDS)
def test_merged_matches_unmerged(monkeypatch, kind):
    ref = _run_step(_mk_engine(monkeypatch, False, False, kind))
    for merge, packed in ((True, False), (True, True), (False, True)):
        got = _run_step(_mk_engine(monkeypatch, merge, packed, kind))
        for k in ref[0]:
            np.testing.assert_allclose(
                got[0][k], ref[0][k], rtol=1e-6,
                err_msg=f"{kind} merge={merge} packed={packed} out {k}",
            )
        for n in ref[1]:
            np.testing.assert_allclose(
                got[1][n], ref[1][n], rtol=1e-5, atol=1e-7,
                err_msg=f"{kind} merge={merge} packed={packed} tbl {n}",
            )
            for sk in ref[2][n]:
                np.testing.assert_allclose(
                    got[2][n][sk], ref[2][n][sk], rtol=1e-5, atol=1e-7,
                    err_msg=f"{kind} merge={merge} packed={packed} "
                            f"state {n}/{sk}",
                )


def test_merged_sharded_matches_single(monkeypatch):
    """Merged tables under an 8-device row_wise mesh == single-device."""
    from torcheasyrec_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    ref = _run_step(_mk_engine(monkeypatch, True, False, "rowwise_adagrad"))
    e = _mk_engine(monkeypatch, True, False, "rowwise_adagrad", mesh=mesh)
    t = e.init(jax.random.key(0))
    s = e.init_opt_state()
    out, res = e.lookup(t, _batch())
    grads = {k: jnp.ones_like(v) * 0.1 for k, v in out.items()}
    nt, _ = jax.jit(
        lambda t_, s_, r_, g_: e.update(t_, s_, r_, g_, jnp.float32(1.0))
    )(t, s, res, grads)
    for n in ("t_wide", "t_deep", "t_solo"):
        np.testing.assert_allclose(
            e.extract_table(nt, n), ref[1][n], rtol=1e-5, atol=1e-7,
        )


def test_canonical_cross_merge_layouts(monkeypatch):
    """Checkpoints are keyed by ORIGINAL table names: a merged engine's
    canonical state restores exactly into an unmerged engine and back."""
    for src_merge, dst_merge, dst_packed in (
        (True, False, False), (False, True, True), (True, True, False),
    ):
        src = _mk_engine(monkeypatch, src_merge, False, "rowwise_adagrad")
        _, _, _, (nt, ns) = _run_step(src)
        canon = src.to_canonical(nt, ns)
        assert set(canon) == {"t_wide", "t_deep", "t_solo"}
        assert canon["t_wide"]["weight"].shape == (50, 4)
        assert canon["t_wide"]["opt__acc"].shape == (50, 1)

        dst = _mk_engine(monkeypatch, dst_merge, dst_packed,
                         "rowwise_adagrad")
        t2 = dst.init(jax.random.key(99))
        s2 = dst.init_opt_state()
        t2, s2 = dst.from_canonical(canon, t2, s2)
        for n in ("t_wide", "t_deep", "t_solo"):
            np.testing.assert_allclose(
                dst.extract_table(t2, n), src.extract_table(nt, n),
                rtol=1e-6,
            )
            a = dst.extract_table_state(t2, s2, n)
            b = src.extract_table_state(nt, ns, n)
            for k in b:
                np.testing.assert_allclose(
                    a[k], b[k], rtol=1e-6,
                    err_msg=f"{src_merge}->{dst_merge} {n}/{k}",
                )


def test_merge_respects_differing_streams(monkeypatch):
    """Tables read by different features (or rows) never merge."""
    monkeypatch.setenv("TZREC_TABLE_MERGE", "1")
    tables = [
        TableSpec("a", rows=50, dim=4, sharding="row_wise"),
        TableSpec("b", rows=50, dim=8, sharding="row_wise"),
        TableSpec("c", rows=40, dim=4, sharding="row_wise"),
    ]
    lookups = [
        LookupSpec("a:f", "f", "a", "sum"),
        LookupSpec("b:g", "g", "b", "sum"),
        LookupSpec("c:f", "f", "c", "sum"),
    ]
    e = EmbeddingEngine(
        tables, lookups,
        optimizer=SparseOptimizer("adagrad", {"lr": 0.1}),
    )
    assert e._merged == {}


def test_tables_for_features_returns_original_names(monkeypatch):
    e = _mk_engine(monkeypatch, merge=True, packed=False, kind="adagrad")
    assert e.tables_for_features({"f"}) == {"t_wide", "t_deep"}
    assert e.tables_for_features({"g"}) == {"t_solo"}
    assert set(e.plan_summary()) == {"t_wide", "t_deep", "t_solo"}
