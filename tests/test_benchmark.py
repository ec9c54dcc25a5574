"""Benchmark harness: synthetic dataset + metric-regression report."""

import json
import os

import numpy as np
import pytest

from torcheasyrec_tpu.benchmark import synthetic


def test_synthetic_deterministic(tmp_path):
    p1 = str(tmp_path / "a.parquet")
    p2 = str(tmp_path / "b.parquet")
    synthetic.generate(p1, 2048, seed=5)
    synthetic.generate(p2, 2048, seed=5)
    import pyarrow.parquet as pq

    t1, t2 = pq.read_table(p1), pq.read_table(p2)
    assert t1.equals(t2)
    names = t1.schema.names
    assert {"label", "conversion", "group_id"} <= set(names)
    assert sum(n.startswith("cat_") for n in names) == 26
    assert sum(n.startswith("int_") for n in names) == 13
    click = t1.column("label").to_numpy()
    conv = t1.column("conversion").to_numpy()
    # CVR only fires on clicks; CTR in a plausible band
    assert ((conv == 1) <= (click == 1)).all()
    assert 0.15 < click.mean() < 0.55


def test_synthetic_signal_is_learnable(tmp_path):
    """The planted structure must be recoverable: a linear probe on the
    dense features alone reaches AUC > 0.60 (trained models reach
    ~0.67 by additionally exploiting cat + interaction effects — the
    margin the pinned labels encode)."""
    p = str(tmp_path / "d.parquet")
    synthetic.generate(p, 65536, seed=3)
    import pyarrow.parquet as pq

    t = pq.read_table(p)
    y = t.column("label").to_numpy()
    d = np.stack(
        [t.column(f"int_{i}").to_numpy() for i in range(13)], axis=1
    )
    half = len(y) // 2
    X = np.concatenate([d[:half], np.ones((half, 1))], axis=1)
    w = np.linalg.lstsq(X, y[:half], rcond=None)[0]
    scores = np.concatenate(
        [d[half:], np.ones((len(y) - half, 1))], axis=1
    ) @ w
    yy = y[half:]
    order = np.argsort(scores)
    ranks = np.empty(len(order)); ranks[order] = np.arange(len(order))
    pos = ranks[yy == 1]
    auc = (pos.sum() - len(pos) * (len(pos) - 1) / 2) / (
        len(pos) * (len(yy) - len(pos))
    )
    assert auc > 0.60, auc


@pytest.mark.slow
def test_run_benchmark_deepfm(tmp_path, monkeypatch):
    """End-to-end harness run on one config with wide thresholds (CPU
    f32 drifts from the TPU-bf16 pinned labels; the pinned file's tight
    thresholds are for the TPU lane)."""
    monkeypatch.setenv("TZREC_BENCH_DATA", str(tmp_path / "data"))
    cfg = "torcheasyrec_tpu/benchmark/configs/criteo_synth/deepfm.config"
    baseline = {
        cfg: {
            "run_cnt": 1,
            "synthetic_criteo": True,
            "metrics": {"auc": {"value": 0.6682, "threshold": 0.02}},
        }
    }
    bp = str(tmp_path / "labels.json")
    with open(bp, "w") as f:
        json.dump(baseline, f)
    from torcheasyrec_tpu.benchmark.benchmark import run_benchmark

    report = run_benchmark(bp)
    assert report[cfg]["auc"] in ("BETTER", "BALANCE"), report
