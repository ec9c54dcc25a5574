"""Two-level (dcn x ici) mesh: numeric equality with the flat mesh.

The engine's owner exchange on a 2-D mesh is HIERARCHICAL (intra-host
all_to_all over ici, then cross-host over dcn on host-aggregated
slabs — emb_engine._xchg); these tests pin that factoring to the flat
1-D mesh's results across layouts, packed storage, and the staged
(pre-routed) exchange. Counterpart of the reference's
INTRA/CROSS_NODE_BANDWIDTH topology contract
(/root/reference/tzrec/utils/plan_util.py:111-114)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torcheasyrec_tpu.datasets.utils import SparseField
from torcheasyrec_tpu.parallel.emb_engine import (
    COLUMN_WISE,
    ROW_WISE,
    TABLE_ROW_WISE,
    EmbeddingEngine,
    LookupSpec,
    TableSpec,
)
from torcheasyrec_tpu.parallel.mesh import create_mesh, data_axes, mesh_hier
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer


def _mk_engine(mesh, sharding, opt):
    tables = [
        TableSpec("t_a", rows=4000, dim=16, sharding=sharding),
        TableSpec("t_b", rows=160, dim=16, sharding=sharding),
        TableSpec("t_c", rows=80, dim=8, sharding=sharding),
    ]
    lookups = [
        LookupSpec("a", "f_a", "t_a", "sum"),
        LookupSpec("b", "f_b", "t_b", "mean"),
        LookupSpec("c", "f_c", "t_c", "sum"),
    ]
    return EmbeddingEngine(tables, lookups, mesh=mesh, optimizer=opt)


def _batch(b=16):
    rng = np.random.default_rng(7)
    return {
        "f_a": SparseField(values=jnp.asarray(
            rng.integers(-1, 4000, size=(b, 3)))),
        "f_b": SparseField(values=jnp.asarray(
            rng.integers(0, 160, size=(b, 2)))),
        "f_c": SparseField(values=jnp.asarray(
            rng.integers(0, 80, size=(b, 1)))),
    }


def test_mesh_helpers():
    flat = create_mesh()
    two = create_mesh(hosts=2)
    assert data_axes(flat) == "data" and mesh_hier(flat) is None
    assert data_axes(two) == ("dcn", "ici")
    assert mesh_hier(two) == (2, 4)
    with pytest.raises(ValueError):
        create_mesh(hosts=3)


@pytest.mark.parametrize("sharding", [ROW_WISE, TABLE_ROW_WISE,
                                      COLUMN_WISE])
def test_two_level_matches_flat(sharding):
    assert len(jax.devices()) == 8
    opt = SparseOptimizer("rowwise_adagrad", {"lr": 0.05})
    flat_eng = _mk_engine(create_mesh(), sharding, opt)
    two_eng = _mk_engine(create_mesh(hosts=2), sharding, opt)
    if sharding == TABLE_ROW_WISE:
        # two-level host groups are dcn rows (4 chips each)
        assert two_eng.shards_per_host == 4

    sparse = _batch()
    outs, tabs = [], []
    for eng in (flat_eng, two_eng):
        t = eng.init(jax.random.key(3))
        s = eng.init_opt_state()

        def run(t, s, sp, eng=eng):
            staged = eng.stage_route(sp)
            o, r = eng.lookup(t, sp, staged=staged)
            gr = {k: v * 0.2 for k, v in o.items()}
            nt, ns = eng.update(t, s, r, gr, jnp.float32(1.0))
            return o, nt, ns

        o = None
        for _ in range(3):
            o, t, s = jax.jit(run)(t, s, sparse)
        outs.append(o)
        tabs.append({n: eng.extract_table(t, n)
                     for n in ("t_a", "t_b", "t_c")})
    for k in outs[0]:
        np.testing.assert_allclose(outs[0][k], outs[1][k],
                                   rtol=1e-6, atol=1e-7)
    for n in tabs[0]:
        np.testing.assert_allclose(tabs[0][n], tabs[1][n],
                                   rtol=1e-6, atol=1e-7)


def test_two_level_packed_layout():
    """Row-like groups pack on the two-level mesh exactly as on the
    flat mesh (p_shards = total chips)."""
    opt = SparseOptimizer("adagrad", {"lr": 0.05})
    eng = _mk_engine(create_mesh(hosts=2), ROW_WISE, opt)
    for g in eng.groups.values():
        assert g.packed and g.p_shards == 8
