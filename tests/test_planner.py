"""Planner tests: DP plan under memory budget."""

from torcheasyrec_tpu.parallel.emb_engine import (
    DATA_PARALLEL,
    ROW_WISE,
    TableSpec,
)
from torcheasyrec_tpu.parallel.planner import create_plan


def test_small_tables_data_parallel():
    specs = [TableSpec(f"t{i}", rows=1000, dim=16) for i in range(4)]
    plan = create_plan(specs, n_devices=8, batch_size=1024)
    # tiny tables: replication is cheaper (no id exchange)
    assert all(v == DATA_PARALLEL for v in plan.values())


def test_huge_tables_forced_row_wise_by_memory():
    # 4 x 40M x 64-dim fp32 tables = 40G replicated; cannot fit 16G/dev
    specs = [TableSpec(f"big{i}", rows=40_000_000, dim=64) for i in range(4)]
    plan = create_plan(specs, n_devices=8, batch_size=8192)
    assert all(v == ROW_WISE for v in plan.values())


def test_mixed_plan_fits_budget():
    specs = (
        [TableSpec(f"big{i}", rows=40_000_000, dim=32) for i in range(2)]
        + [TableSpec(f"small{i}", rows=10_000, dim=16) for i in range(10)]
    )
    plan = create_plan(specs, n_devices=8, batch_size=8192)
    assert all(plan[f"big{i}"] == ROW_WISE for i in range(2))
    # per-device bytes under budget
    used = 0.0
    for s in specs:
        b = s.rows * s.dim * 4 * 2  # weight + adagrad acc
        used += b / 8 if plan[s.name] == ROW_WISE else b
    assert used < 16e9 * 0.85


def test_single_device_all_data_parallel():
    specs = [TableSpec("t", rows=1_000_000, dim=16)]
    plan = create_plan(specs, n_devices=1, batch_size=1024)
    assert plan["t"] == DATA_PARALLEL
