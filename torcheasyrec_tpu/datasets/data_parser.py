"""DataParser: Arrow record batches -> static-shape numpy Batch pytrees.

Counterpart of /root/reference/tzrec/datasets/data_parser.py (DataParser:62,
parse:184, to_batch:402). Differences by design (TPU/XLA):

- outputs bucketed static shapes (SURVEY.md §7 hard part #1): jagged value
  counts round up to power-of-2 buckets; sequences pad to the configured
  ``sequence_length`` (or a bucketed max);
- no KJT/KT: per-feature dict pytrees, grouped statically by the
  EmbeddingGroup at model build time.
"""

from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa

from torcheasyrec_tpu.datasets.utils import (
    Batch,
    BatchInfo,
    DenseField,
    SequenceDenseField,
    SparseField,
    bucketize_size,
    pad_jagged_np,
)
from torcheasyrec_tpu.features.feature import (
    BaseFeature,
    DenseData,
    SequenceDenseData,
    SequenceSparseData,
    SparseData,
)


class DataParser:
    def __init__(
        self,
        features: List[BaseFeature],
        labels: Optional[List[str]] = None,
        sample_weights: Optional[List[str]] = None,
        is_training: bool = False,
        force_base_data_group: bool = False,
        input_tile: bool = False,
        fg_threads: int = 1,
    ) -> None:
        self._features = features
        self._labels = labels or []
        self._sample_weights = sample_weights or []
        self._is_training = is_training
        self._force_base_data_group = force_base_data_group
        # jagged labels (reference models/hstu.py:392-394 reads
        # candidate-sequence labels like "cand_seq__action_weight"):
        # label fields named {sequence_name}__{col} parse as padded
        # [B, L] float arrays using that sequence group's delim/length
        seq_groups: Dict[str, Any] = {}
        for f in features:
            sn = getattr(f, "sequence_name", None)
            if sn and sn not in seq_groups:
                seq_groups[sn] = (
                    f.sequence_delim or ";",
                    int(f.sequence_length or 0),
                )
        self._label_seq: Dict[str, Any] = {}
        for lbl in self._labels:
            sn = lbl.split("__", 1)[0] if "__" in lbl else None
            if sn in seq_groups:
                self._label_seq[lbl] = seq_groups[sn]
        # native FG DAG: eligible FG_NORMAL/FG_DAG features run as one
        # C++ task-pool call per batch (fg/dag.py); ineligible features
        # keep their python parse below
        try:
            from torcheasyrec_tpu.fg.dag import FgDag

            self._fg_dag = FgDag(features, threads=max(fg_threads, 1))
        except Exception:  # pragma: no cover - loader/toolchain issues
            self._fg_dag = None
        # INPUT_TILE serving mode (reference acc/utils.py:31-70): user-side
        # features are constant within a request batch; parse row 0 only
        # and tile on device after embedding
        self._input_tile = input_tile
        # features that produced a multi-valued row at least once: their
        # batches stay jagged forever so the traced representation is
        # stable (flip-flopping fixed<->jagged would retrace every jit)
        self._force_jagged: set = set()
        # vectorized FG_NONE fast paths: the overwhelmingly common case
        # (non-null scalar numeric columns) is parsed as ONE matrix per
        # column-group instead of ~40 python call chains per batch; any
        # feature whose column fails the preconditions at runtime falls
        # back to its regular parse (reference hot path:
        # /root/reference/tzrec/datasets/data_parser.py:184-277)
        from torcheasyrec_tpu.protos.data_pb2 import FgMode

        self._fast_sparse: List[Any] = []  # (feature_name, column_name)
        self._fast_dense: List[Any] = []
        if not input_tile:
            for f in features:
                try:
                    if f._fg_mode != FgMode.FG_NONE or f.is_sequence:
                        continue
                    if f.is_sparse:
                        if not getattr(f, "is_weighted", False):
                            self._fast_sparse.append((f.name, f.inputs[0]))
                    elif f._fg_encoded_default() is None:
                        self._fast_dense.append((f.name, f.inputs[0]))
                except Exception:  # noqa: BLE001 - conservative opt-in
                    continue

    def _fast_parse(self, input_data: Dict[str, pa.Array]) -> Dict[str, Any]:
        """Matrix-vectorized parse of plain scalar columns.

        Sparse: groups all non-null integer id columns of equal length
        into one [B, n] int32 matrix (one downcast pass per column) and
        emits fixed [B, 1] SparseField views. Dense: one [B, n] float32
        matrix with a single shared nan_to_num pass. Emits final Field
        objects that ``to_batch`` passes through untouched.
        """
        out: Dict[str, Any] = {}
        groups: Dict[int, list] = {}
        for name, cname in self._fast_sparse:
            if name in self._force_jagged:
                continue
            col = input_data.get(cname)
            if (
                isinstance(col, pa.ChunkedArray)
                and col.num_chunks == 1
            ):
                col = col.chunk(0)
            if (
                not isinstance(col, pa.Array)
                or not pa.types.is_integer(col.type)
                or col.null_count
            ):
                continue
            groups.setdefault(len(col), []).append((name, col))
        for b, cols in groups.items():
            # transposed (n, B) so each column lands contiguously.
            # int32 downcast matches the per-feature path's to_batch
            # convention (ids are pre-bucketed below 2^31 everywhere)
            mat = np.empty((len(cols), b), np.int32)
            for j, (_, col) in enumerate(cols):
                mat[j] = col.to_numpy(zero_copy_only=True)
            for j, (name, _) in enumerate(cols):
                out[name] = SparseField(values=mat[j, :, None])
        dgroups: Dict[int, list] = {}
        for name, cname in self._fast_dense:
            col = input_data.get(cname)
            if (
                isinstance(col, pa.ChunkedArray)
                and col.num_chunks == 1
            ):
                col = col.chunk(0)
            if not isinstance(col, pa.Array) or col.null_count or not (
                pa.types.is_floating(col.type) or pa.types.is_integer(col.type)
            ):
                continue
            dgroups.setdefault(len(col), []).append((name, col))
        for b, cols in dgroups.items():
            mat = np.empty((len(cols), b), np.float32)
            for j, (_, col) in enumerate(cols):
                mat[j] = col.to_numpy(zero_copy_only=True)
            np.nan_to_num(mat, copy=False)
            for j, (name, _) in enumerate(cols):
                out[name] = DenseField(values=mat[j, :, None])
        return out

    def parse(self, input_data: Dict[str, pa.Array]) -> Dict[str, Any]:
        """Run every feature's parse; returns name -> ParsedData."""
        out: Dict[str, Any] = {}
        if not self._input_tile and (self._fast_sparse or self._fast_dense):
            try:
                out.update(self._fast_parse(input_data))
            except Exception:  # noqa: BLE001 - fall back per feature
                out = {}
        dag = self._fg_dag
        if dag is not None and not self._input_tile:
            try:
                for k, v in dag.parse(input_data, self._is_training).items():
                    out.setdefault(k, v)
            except Exception:  # noqa: BLE001 - fall back per feature
                pass
        for feature in self._features:
            if feature.name in out:
                continue
            data = input_data
            if self._input_tile and feature.is_user_side:
                data = {
                    c: input_data[c].slice(0, 1)
                    for c in feature.inputs if c in input_data
                }
            out[feature.name] = feature.parse(data, self._is_training)
        for label in self._labels:
            if label in input_data:
                arr = input_data[label]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if label in self._label_seq or pa.types.is_list(
                    arr.type
                ) or pa.types.is_large_list(arr.type):
                    out[f"__label__{label}"] = _parse_jagged_label(
                        arr, *self._label_seq.get(label, (";", 0))
                    )
                    continue
                out[f"__label__{label}"] = np.nan_to_num(
                    arr.cast(pa.float32(), safe=False).to_numpy(
                        zero_copy_only=False
                    )
                )
        for w in self._sample_weights:
            if w in input_data:
                arr = input_data[w]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                out[f"__weight__{w}"] = np.nan_to_num(
                    arr.cast(pa.float32(), safe=False).to_numpy(
                        zero_copy_only=False
                    )
                )
        return out

    def to_batch(
        self, parsed: Dict[str, Any], info: Optional[BatchInfo] = None
    ) -> Batch:
        """Assemble a static-shape Batch from parsed feature data."""
        batch = Batch()
        for feature in self._features:
            data = parsed.get(feature.name)
            if data is None:
                continue
            name = feature.name
            if isinstance(data, SparseField):
                batch.sparse_features[name] = data
                continue
            if isinstance(data, DenseField):
                batch.dense_features[name] = data
                continue
            if isinstance(data, SparseData):
                if (
                    name not in self._force_jagged
                    and (data.lengths <= 1).all()
                ):
                    # single-valued rows: fixed [B, 1] (missing -> -1)
                    # — no lengths array to ship, no jagged bucketing
                    batch.sparse_features[name] = _fixed_single(data)
                else:
                    self._force_jagged.add(name)
                    batch.sparse_features[name] = pad_jagged_np(
                        data.values,
                        data.lengths,
                        bucket=bucketize_size(len(data.values)),
                        weights=data.weights,
                    )
            elif isinstance(data, DenseData):
                batch.dense_features[name] = DenseField(
                    values=data.values.astype(np.float32, copy=False)
                )
            elif isinstance(data, SequenceSparseData):
                batch.sequence_sparse_features[name] = _pad_sequence_sparse(
                    feature, data
                )
            elif isinstance(data, SequenceDenseData):
                batch.sequence_dense_features[name] = _pad_sequence_dense(
                    feature, data
                )
            else:
                raise TypeError(f"unknown parsed data {type(data)} for {name}")
        for label in self._labels:
            key = f"__label__{label}"
            if key in parsed:
                batch.labels[label] = parsed[key].astype(np.float32)
        for w in self._sample_weights:
            key = f"__weight__{w}"
            if key in parsed:
                batch.sample_weights[w] = parsed[key].astype(np.float32)
        if self._input_tile:
            sizes = [
                f.batch_size
                for f in list(batch.sparse_features.values())
                + list(batch.sequence_sparse_features.values())
            ] + [d.values.shape[0] for d in batch.dense_features.values()]
            batch.tile_size = int(max(sizes)) if sizes else 1
        return batch

    def parse_to_batch(
        self, input_data: Dict[str, pa.Array], info: Optional[BatchInfo] = None
    ) -> Batch:
        return self.to_batch(self.parse(input_data), info)


def _fixed_single(data: SparseData) -> SparseField:
    """All-rows-single-valued SparseData -> fixed [B, 1] SparseField."""
    b = int(data.lengths.shape[0])
    if data.values.shape[0] == b:
        # no missing rows: one int32 downcast, no scatter
        vals = data.values.astype(np.int32, copy=False).reshape(b, 1)
        w = (
            data.weights.astype(np.float32, copy=False).reshape(b, 1)
            if data.weights is not None else None
        )
        return SparseField(values=vals, weights=w)
    vals = np.full((b, 1), -1, np.int32)
    rows = np.nonzero(data.lengths)[0]
    vals[rows, 0] = data.values.astype(np.int32, copy=False)
    w = None
    if data.weights is not None:
        w = np.zeros((b, 1), np.float32)
        w[rows, 0] = data.weights
    return SparseField(values=vals, weights=w)


def _parse_jagged_label(
    arr: pa.Array, delim: str = ";", max_len: int = 0
) -> np.ndarray:
    """Per-row multi-value label -> padded [B, L] float32 (keeps the
    LAST steps, matching _pad_sequence_* truncation)."""
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        rows = [
            [] if v is None else [float(x) for x in v]
            for v in arr.to_pylist()
        ]
    else:
        rows = []
        for s in arr.cast(pa.string()).to_pylist():
            if not s:
                rows.append([])
                continue
            rows.append([float(t) if t else 0.0 for t in s.split(delim)])
    b = len(rows)
    if max_len <= 0:
        max_len = bucketize_size(
            max((len(r) for r in rows), default=1), minimum=1
        )
    out = np.zeros((b, max_len), dtype=np.float32)
    for i, r in enumerate(rows):
        take = min(len(r), max_len)
        if take:
            out[i, :take] = r[len(r) - take:]
    return np.nan_to_num(out)


def _pad_sequence_sparse(
    feature: BaseFeature, data: SequenceSparseData
) -> SparseField:
    """SequenceSparseData -> SparseField.

    Single-value steps: values [B, L] ids, lengths [B]. Multi-value
    steps (the reference pools them with segment_reduce,
    embedding.py:1296-1309): values [B, L, K] with padding id -1 — the
    engine sum-pools the K slots per step. Padding positions use id -1
    so they gather zeros and never receive optimizer updates.
    """
    b = len(data.seq_lengths)
    max_len = feature.effective_sequence_length
    if max_len <= 0:
        max_len = bucketize_size(
            int(data.seq_lengths.max()) if b else 1, minimum=8
        )
    seq_lengths = np.minimum(data.seq_lengths, max_len).astype(np.int32)
    multival = bool(np.any(data.lengths > 1))
    if multival:
        k = bucketize_size(int(data.lengths.max()), minimum=2)
        ids = np.full((b, max_len, k), -1, dtype=np.int32)
        step_starts = np.concatenate([[0], np.cumsum(data.lengths)])
        step_idx = 0
        for i in range(b):
            n = int(data.seq_lengths[i])
            take = min(n, max_len)
            # most recent `take` steps
            for j in range(take):
                s = step_idx + n - take + j
                lo, hi = int(step_starts[s]), int(step_starts[s + 1])
                cnt = min(hi - lo, k)
                ids[i, j, :cnt] = data.values[lo : lo + cnt]
            step_idx += n
        return SparseField(values=ids, lengths=seq_lengths)
    ids = np.full((b, max_len), -1, dtype=np.int32)
    vals = data.values
    pos = 0
    for i in range(b):
        n = int(data.seq_lengths[i])
        take = min(n, max_len)
        # keep the LAST `take` steps (most recent history)
        ids[i, :take] = vals[pos + n - take : pos + n]
        pos += n
    return SparseField(values=ids, lengths=seq_lengths)


def _pad_sequence_dense(
    feature: BaseFeature, data: SequenceDenseData
) -> SequenceDenseField:
    b = len(data.seq_lengths)
    d = data.values.shape[-1] if data.values.ndim > 1 else 1
    max_len = feature.effective_sequence_length
    if max_len <= 0:
        max_len = bucketize_size(
            int(data.seq_lengths.max()) if b else 1, minimum=8
        )
    seq_lengths = np.minimum(data.seq_lengths, max_len).astype(np.int32)
    out = np.zeros((b, max_len, d), dtype=np.float32)
    vals = data.values.reshape(-1, d)
    pos = 0
    for i in range(b):
        n = int(data.seq_lengths[i])
        take = min(n, max_len)
        out[i, :take] = vals[pos + n - take : pos + n]
        pos += n
    return SequenceDenseField(values=out, lengths=seq_lengths)
