"""Eval metrics.

Counterpart of /root/reference/tzrec/metrics/ (832 LoC, torchmetrics
based): AUC, MulticlassAUC, GroupedAUC, XAUC, GroupedXAUC,
NormalizedEntropy, RecallAtK, Accuracy, MAE/MSE, plus decayed train
metrics (TrainMetricWrapper).

Implementation: host-side exact accumulation (predictions are tiny
relative to training compute; the eval loop device->host copies batch
outputs once). Multi-host eval calls ``sync()`` before ``compute()``:
each metric gathers (or sum-reduces) its host-local state across
processes via multihost_utils — the counterpart of the reference's
``dist_reduce_fx`` on every torchmetrics state
(/root/reference/tzrec/metrics/recall_at_k.py:36-41). Single-process
sync is a no-op.
"""

from typing import Any, Dict, List, Optional

import numpy as np


def _gather_cat(arr_list: List[np.ndarray]) -> List[np.ndarray]:
    """Concat local chunks, gather across hosts; [] stays []-safe."""
    from torcheasyrec_tpu.utils.dist_util import gather_host_array

    local = (
        np.concatenate(arr_list) if arr_list
        else np.zeros((0,), np.float32)
    )
    return [gather_host_array(local)]


class Metric:
    def update(self, preds, labels, **kw) -> None:
        raise NotImplementedError

    def compute(self) -> float:
        raise NotImplementedError

    def reset(self) -> None:
        raise NotImplementedError

    def sync(self) -> None:
        """Merge state across processes (no-op single-host). Collective:
        must be called on every process at the same point, and AT MOST
        ONCE per accumulation window — a second sync would re-gather the
        already-global state. reset() restores the unsynced-empty
        state. Train-metric logging therefore stays host-local; only
        eval compute() is preceded by a sync (main._sync_metrics)."""
        return None


def _auc(preds: np.ndarray, labels: np.ndarray) -> float:
    """Exact AUC via the rank statistic (ties handled by average rank)."""
    preds = np.asarray(preds, np.float64)
    labels = np.asarray(labels) > 0.5
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(preds, kind="mergesort")
    ranks = np.empty(len(preds), np.float64)
    sorted_preds = preds[order]
    # average ranks for ties
    i = 0
    r = np.arange(1, len(preds) + 1, dtype=np.float64)
    boundaries = np.flatnonzero(np.diff(sorted_preds)) + 1
    start = 0
    for end in list(boundaries) + [len(preds)]:
        r[start:end] = (start + 1 + end) / 2.0
        start = end
    ranks[order] = r
    auc = (ranks[labels].sum() - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    return float(auc)


class AUC(Metric):
    def __init__(self, thresholds: int = 200, **kw) -> None:
        self.reset()

    def reset(self) -> None:
        self._preds: List[np.ndarray] = []
        self._labels: List[np.ndarray] = []

    def update(self, preds, labels, **kw) -> None:
        self._preds.append(np.asarray(preds).reshape(-1))
        self._labels.append(np.asarray(labels).reshape(-1))

    def sync(self) -> None:
        self._preds = _gather_cat(self._preds)
        self._labels = _gather_cat(self._labels)

    def compute(self) -> float:
        return _auc(np.concatenate(self._preds), np.concatenate(self._labels))


class MulticlassAUC(Metric):
    """One-vs-rest AUC averaged over classes (reference multiclass_auc)."""

    def __init__(self, thresholds: int = 200, average: str = "macro", **kw):
        self.average = average
        self.reset()

    def reset(self) -> None:
        self._preds, self._labels = [], []

    def update(self, preds, labels, **kw) -> None:
        self._preds.append(np.asarray(preds))
        self._labels.append(np.asarray(labels).reshape(-1))

    def sync(self) -> None:
        from torcheasyrec_tpu.utils.dist_util import gather_host_array

        local = (np.concatenate(self._preds) if self._preds
                 else np.zeros((0, 1), np.float32))
        self._preds = [gather_host_array(local)]
        self._labels = _gather_cat(self._labels)

    def compute(self) -> float:
        p = np.concatenate(self._preds)  # [N, C]
        y = np.concatenate(self._labels).astype(int)
        aucs, weights = [], []
        for c in range(p.shape[1]):
            a = _auc(p[:, c], (y == c).astype(np.float32))
            if not np.isnan(a):
                aucs.append(a)
                weights.append((y == c).sum())
        if not aucs:
            return float("nan")
        if self.average == "weighted":
            w = np.asarray(weights, np.float64)
            return float(np.average(aucs, weights=w))
        return float(np.mean(aucs))


class GroupedAUC(Metric):
    """Mean per-group AUC (reference metrics/grouped_auc.py:22)."""

    def __init__(self, grouping_key: str, **kw) -> None:
        self.grouping_key = grouping_key
        self.reset()

    def reset(self) -> None:
        self._preds, self._labels, self._keys = [], [], []

    def update(self, preds, labels, grouping_key=None, **kw) -> None:
        self._preds.append(np.asarray(preds).reshape(-1))
        self._labels.append(np.asarray(labels).reshape(-1))
        self._keys.append(np.asarray(grouping_key).reshape(-1))

    def sync(self) -> None:
        self._preds = _gather_cat(self._preds)
        self._labels = _gather_cat(self._labels)
        self._keys = _gather_cat(self._keys)

    def compute(self) -> float:
        p = np.concatenate(self._preds)
        y = np.concatenate(self._labels)
        k = np.concatenate(self._keys)
        aucs = []
        for key in np.unique(k):
            m = k == key
            a = _auc(p[m], y[m])
            if not np.isnan(a):
                aucs.append(a)
        return float(np.mean(aucs)) if aucs else float("nan")


class XAUC(Metric):
    """Pairwise order accuracy on continuous labels, sampled pairs
    (reference metrics/xauc.py)."""

    def __init__(self, sample_ratio: float = 1e-3, max_pairs: Optional[int] = None,
                 in_batch: bool = False, **kw) -> None:
        self.sample_ratio = sample_ratio
        self.max_pairs = max_pairs
        self.reset()

    def reset(self) -> None:
        self._preds, self._labels = [], []

    def update(self, preds, labels, **kw) -> None:
        self._preds.append(np.asarray(preds).reshape(-1))
        self._labels.append(np.asarray(labels).reshape(-1))

    def sync(self) -> None:
        self._preds = _gather_cat(self._preds)
        self._labels = _gather_cat(self._labels)

    def compute(self) -> float:
        p = np.concatenate(self._preds)
        y = np.concatenate(self._labels)
        n = len(p)
        n_pairs = int(n * (n - 1) / 2 * self.sample_ratio)
        if self.max_pairs:
            n_pairs = min(n_pairs, int(self.max_pairs))
        n_pairs = max(n_pairs, 1)
        rng = np.random.default_rng(0)
        i = rng.integers(0, n, n_pairs)
        j = rng.integers(0, n, n_pairs)
        valid = y[i] != y[j]
        if valid.sum() == 0:
            return float("nan")
        concordant = ((p[i] - p[j]) * (y[i] - y[j]) > 0) & valid
        return float(concordant.sum() / valid.sum())


class GroupedXAUC(Metric):
    def __init__(self, grouping_key: str, max_pairs_per_group: int = 100, **kw):
        self.grouping_key = grouping_key
        self.max_pairs = max_pairs_per_group
        self.reset()

    def reset(self) -> None:
        self._preds, self._labels, self._keys = [], [], []

    def update(self, preds, labels, grouping_key=None, **kw) -> None:
        self._preds.append(np.asarray(preds).reshape(-1))
        self._labels.append(np.asarray(labels).reshape(-1))
        self._keys.append(np.asarray(grouping_key).reshape(-1))

    def sync(self) -> None:
        self._preds = _gather_cat(self._preds)
        self._labels = _gather_cat(self._labels)
        self._keys = _gather_cat(self._keys)

    def compute(self) -> float:
        p = np.concatenate(self._preds)
        y = np.concatenate(self._labels)
        k = np.concatenate(self._keys)
        rng = np.random.default_rng(0)
        scores = []
        for key in np.unique(k):
            m = np.flatnonzero(k == key)
            if len(m) < 2:
                continue
            n_pairs = min(self.max_pairs, len(m) * (len(m) - 1) // 2)
            i = rng.choice(m, n_pairs)
            j = rng.choice(m, n_pairs)
            valid = y[i] != y[j]
            if valid.sum() == 0:
                continue
            conc = ((p[i] - p[j]) * (y[i] - y[j]) > 0) & valid
            scores.append(conc.sum() / valid.sum())
        return float(np.mean(scores)) if scores else float("nan")


class NormalizedEntropy(Metric):
    """NE = CE / entropy(base rate) (reference metrics/ne)."""

    def __init__(self, eta: float = 1e-12, **kw) -> None:
        self.eta = eta
        self.reset()

    def reset(self) -> None:
        self._ce_sum = 0.0
        self._pos = 0.0
        self._n = 0

    def update(self, preds, labels, **kw) -> None:
        p = np.clip(np.asarray(preds, np.float64).reshape(-1), self.eta,
                    1 - self.eta)
        y = np.asarray(labels, np.float64).reshape(-1)
        self._ce_sum += float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).sum())
        self._pos += float(y.sum())
        self._n += len(y)

    def sync(self) -> None:
        from torcheasyrec_tpu.utils.dist_util import gather_host_sum

        self._ce_sum, self._pos, n = gather_host_sum(
            self._ce_sum, self._pos, float(self._n)
        )
        self._n = int(n)

    def compute(self) -> float:
        if self._n == 0:
            return float("nan")
        base = np.clip(self._pos / self._n, self.eta, 1 - self.eta)
        h = -(base * np.log(base) + (1 - base) * np.log(1 - base))
        return float(self._ce_sum / self._n / h)


class RecallAtK(Metric):
    """recall@k for retrieval eval (reference metrics/recall_at_k.py:24-60):
    preds are similarity rows [B, 1 + num_neg]; column 0 is the positive."""

    def __init__(self, top_k: int = 5, **kw) -> None:
        self.top_k = top_k
        self.reset()

    def reset(self) -> None:
        self._hit = 0.0
        self._n = 0

    def update(self, preds, labels=None, **kw) -> None:
        p = np.asarray(preds)
        if p.ndim == 1:
            p = p[None, :]
        pos = p[:, 0:1]
        rank = (p[:, 1:] >= pos).sum(axis=1)  # negatives scoring >= positive
        self._hit += float((rank < self.top_k).sum())
        self._n += p.shape[0]

    def sync(self) -> None:
        from torcheasyrec_tpu.utils.dist_util import gather_host_sum

        self._hit, n = gather_host_sum(self._hit, float(self._n))
        self._n = int(n)

    def compute(self) -> float:
        return float(self._hit / max(self._n, 1))


class Accuracy(Metric):
    def __init__(self, threshold: float = 0.5, top_k: int = 1, **kw) -> None:
        self.threshold = threshold
        self.top_k = top_k
        self.reset()

    def reset(self) -> None:
        self._correct = 0.0
        self._n = 0

    def update(self, preds, labels, **kw) -> None:
        p = np.asarray(preds)
        y = np.asarray(labels).reshape(-1)
        if p.ndim > 1 and p.shape[-1] > 1:
            topk = np.argsort(-p, axis=-1)[:, : self.top_k]
            self._correct += float((topk == y[:, None].astype(int)).any(1).sum())
        else:
            self._correct += float(
                ((p.reshape(-1) > self.threshold) == (y > 0.5)).sum()
            )
        self._n += len(y)

    def sync(self) -> None:
        from torcheasyrec_tpu.utils.dist_util import gather_host_sum

        self._correct, n = gather_host_sum(self._correct, float(self._n))
        self._n = int(n)

    def compute(self) -> float:
        return float(self._correct / max(self._n, 1))


class MeanAbsoluteError(Metric):
    def __init__(self, **kw) -> None:
        self.reset()

    def reset(self) -> None:
        self._sum = 0.0
        self._n = 0

    def update(self, preds, labels, **kw) -> None:
        self._sum += float(
            np.abs(np.asarray(preds).reshape(-1) -
                   np.asarray(labels).reshape(-1)).sum()
        )
        self._n += np.asarray(preds).reshape(-1).shape[0]

    def sync(self) -> None:
        from torcheasyrec_tpu.utils.dist_util import gather_host_sum

        self._sum, n = gather_host_sum(self._sum, float(self._n))
        self._n = int(n)

    def compute(self) -> float:
        return float(self._sum / max(self._n, 1))


class MeanSquaredError(MeanAbsoluteError):
    def update(self, preds, labels, **kw) -> None:
        d = np.asarray(preds).reshape(-1) - np.asarray(labels).reshape(-1)
        self._sum += float((d * d).sum())
        self._n += d.shape[0]


class TrainMetricWrapper(Metric):
    """Decayed running train metric (reference train_metric_wrapper.py:20):
    every decay_step steps the inner metric's value folds into a running
    value with decay_rate."""

    def __init__(self, inner: Metric, decay_rate: float = 0.9,
                 decay_step: int = 100) -> None:
        self._inner = inner
        self._decay_rate = decay_rate
        self._decay_step = decay_step
        self._running: Optional[float] = None
        self._count = 0

    def reset(self) -> None:
        self._inner.reset()

    def update(self, preds, labels, **kw) -> None:
        self._inner.update(preds, labels, **kw)
        self._count += 1
        if self._count % self._decay_step == 0:
            v = self._inner.compute()
            if not np.isnan(v):
                if self._running is None:
                    self._running = v
                else:
                    self._running = (
                        self._decay_rate * self._running
                        + (1 - self._decay_rate) * v
                    )
            self._inner.reset()

    def compute(self) -> float:
        if self._running is None:
            v = self._inner.compute()
            return v
        return float(self._running)


_METRIC_CLASSES = {
    "auc": AUC,
    "multiclass_auc": MulticlassAUC,
    "grouped_auc": GroupedAUC,
    "xauc": XAUC,
    "grouped_xauc": GroupedXAUC,
    "normalized_entropy": NormalizedEntropy,
    "recall_at_k": RecallAtK,
    "accuracy": Accuracy,
    "mean_absolute_error": MeanAbsoluteError,
    "mean_squared_error": MeanSquaredError,
}


def create_metric(metric_config) -> Dict[str, Any]:
    """MetricConfig proto -> dict(name, metric, needs)."""
    from torcheasyrec_tpu.utils.config_util import config_to_kwargs

    which = metric_config.WhichOneof("metric")
    cfg = getattr(metric_config, which)
    kwargs = config_to_kwargs(cfg)
    metric = _METRIC_CLASSES[which](**kwargs)
    name = which
    if which in ("grouped_auc", "grouped_xauc"):
        name = f"{which}_{cfg.grouping_key}"
    if which == "recall_at_k":
        name = f"recall@{cfg.top_k}"
    return {"name": name, "metric": metric, "config": kwargs}
