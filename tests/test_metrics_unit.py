"""Metric correctness against naive references.

Counterpart of tzrec/metrics/*_test.py: each metric class is checked
against an O(n^2)/sklearn-style naive implementation on random data.
"""

import numpy as np
import pytest

from torcheasyrec_tpu.metrics import (
    AUC,
    Accuracy,
    GroupedAUC,
    MeanAbsoluteError,
    MulticlassAUC,
    NormalizedEntropy,
    RecallAtK,
    XAUC,
)


def _naive_auc(p, y):
    pos = p[y > 0.5]
    neg = p[y <= 0.5]
    if not len(pos) or not len(neg):
        return float("nan")
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_auc_matches_naive_pairwise():
    rng = np.random.default_rng(0)
    p = rng.random(500)
    y = (rng.random(500) > 0.6).astype(np.float32)
    m = AUC()
    # streamed in three uneven batches
    for sl in (slice(0, 100), slice(100, 350), slice(350, None)):
        m.update(p[sl], y[sl])
    assert m.compute() == pytest.approx(_naive_auc(p, y), abs=1e-9)


def test_auc_with_ties_and_perfect():
    m = AUC()
    m.update(np.asarray([0.5, 0.5, 0.5, 0.5]),
             np.asarray([1.0, 0.0, 1.0, 0.0]))
    assert m.compute() == pytest.approx(0.5)
    m2 = AUC()
    m2.update(np.asarray([0.9, 0.8, 0.2, 0.1]),
              np.asarray([1.0, 1.0, 0.0, 0.0]))
    assert m2.compute() == pytest.approx(1.0)


def test_grouped_auc_is_mean_of_per_group_auc():
    rng = np.random.default_rng(1)
    n = 600
    p = rng.random(n)
    y = (rng.random(n) > 0.5).astype(np.float32)
    g = rng.integers(0, 5, n)
    m = GroupedAUC(grouping_key="uid")
    m.update(p, y, grouping_key=g)
    per_group = [
        _naive_auc(p[g == k], y[g == k]) for k in range(5)
    ]
    per_group = [a for a in per_group if not np.isnan(a)]
    assert m.compute() == pytest.approx(np.mean(per_group), abs=1e-6)


def test_multiclass_auc_macro_and_weighted():
    rng = np.random.default_rng(2)
    n, C = 400, 3
    logits = rng.random((n, C))
    y = rng.integers(0, C, n)
    m = MulticlassAUC()
    m.update(logits, y)
    expect = np.mean([
        _naive_auc(logits[:, c], (y == c).astype(np.float32))
        for c in range(C)
    ])
    assert m.compute() == pytest.approx(expect, abs=1e-9)
    mw = MulticlassAUC(average="weighted")
    mw.update(logits, y)
    ws = np.asarray([(y == c).sum() for c in range(C)], np.float64)
    expect_w = np.average(
        [_naive_auc(logits[:, c], (y == c).astype(np.float32))
         for c in range(C)],
        weights=ws,
    )
    assert mw.compute() == pytest.approx(expect_w, abs=1e-9)


def test_xauc_converges_to_exact_pair_accuracy():
    rng = np.random.default_rng(3)
    n = 300
    y = rng.random(n)
    # predictions = noisy labels: exact pairwise accuracy computable
    p = y + rng.normal(0, 0.2, n)
    m = XAUC(sample_ratio=1.0)  # sample all pairs (with replacement)
    m.update(p, y)
    i, j = np.triu_indices(n, 1)
    valid = y[i] != y[j]
    exact = (((p[i] - p[j]) * (y[i] - y[j]) > 0) & valid).sum() / valid.sum()
    assert m.compute() == pytest.approx(exact, abs=0.02)


def test_normalized_entropy():
    rng = np.random.default_rng(4)
    n = 2000
    y = (rng.random(n) < 0.3).astype(np.float32)
    p = np.clip(rng.random(n), 1e-6, 1 - 1e-6)
    m = NormalizedEntropy()
    m.update(p, y)
    ce = -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    base = y.mean()
    base_ce = -(base * np.log(base) + (1 - base) * np.log(1 - base))
    assert m.compute() == pytest.approx(ce / base_ce, rel=1e-5)
    # predicting the base rate exactly -> NE == 1
    m2 = NormalizedEntropy()
    m2.update(np.full(n, y.mean()), y)
    assert m2.compute() == pytest.approx(1.0, rel=1e-5)


def test_recall_at_k_semantics():
    # rows: [positive | negatives]
    sims = np.asarray([
        [0.9, 0.1, 0.2, 0.3],   # pos ranks 1st -> hit@1
        [0.5, 0.6, 0.4, 0.3],   # one neg above -> hit@2, miss@1
        [0.1, 0.6, 0.5, 0.4],   # three above -> miss@3
    ])
    m1 = RecallAtK(top_k=1)
    m1.update(sims)
    assert m1.compute() == pytest.approx(1 / 3)
    m2 = RecallAtK(top_k=2)
    m2.update(sims)
    assert m2.compute() == pytest.approx(2 / 3)
    m4 = RecallAtK(top_k=4)
    m4.update(sims)
    assert m4.compute() == pytest.approx(1.0)


def test_accuracy_and_mae():
    a = Accuracy()
    a.update(np.asarray([0.9, 0.2, 0.7, 0.4]),
             np.asarray([1.0, 0.0, 0.0, 0.0]))
    assert a.compute() == pytest.approx(0.75)
    m = MeanAbsoluteError()
    m.update(np.asarray([1.0, 2.0]), np.asarray([0.0, 4.0]))
    m.update(np.asarray([3.0]), np.asarray([3.0]))
    assert m.compute() == pytest.approx(1.0)
