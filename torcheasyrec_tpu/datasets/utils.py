"""Batch pytree and jagged-tensor representation.

TPU-native replacement for the reference's KeyedJaggedTensor/KeyedTensor
Batch (/root/reference/tzrec/datasets/utils.py:231-512). Key design
decisions (SURVEY.md §7):

- A sparse feature is a ``SparseField``: either *fixed-length*
  (``values [B, L]``, ``lengths=None``) — the fast path for single-id
  features like Criteo — or *jagged* (``values [N_pad]``, ``lengths [B]``)
  where ``N_pad`` is rounded up to a power-of-2 bucket so XLA shapes stay
  static across batches. Padding slots carry id 0 / weight 0 and are
  assigned segment id B (one past the batch) so pooled segment-sums drop
  them for free.
- ``Batch`` is a registered pytree of plain dicts keyed by feature name;
  grouping into embedding groups happens statically at config time.
- Host-side checkpoint metadata (source id / row idx, reference
  datasets/utils.py:39-71) rides outside the traced pytree.
"""

import dataclasses
from typing import Any, Dict, Optional

import jax
import numpy as np

# checkpoint-position side columns injected by readers
# (reference datasets/utils.py:39-46)
CKPT_SOURCE_ID = "__ckpt_source_id__"
CKPT_ROW_IDX = "__ckpt_row_idx__"
DATA_TIMESTAMP = "__data_timestamp__"
# hard-negative attribution (reference datasets/utils.py:35): int32
# [B*num_hard, 2] (user_row, hard_col) pairs; empty slots use
# user_row == B so the model's scatter drops them
HARD_NEG_INDICES = "__hard_neg_indices__"

# data-group names (reference features/feature.py:416,479-493)
BASE_DATA_GROUP = "__BASE__"
NEG_DATA_GROUP = "__NEG__"

# per-candidate repeat key for generative models (reference main.py:1090)
TARGET_REPEAT_INTERLEAVE_KEY = "__target_repeat_interleave__"


def pa_from_numpy(arr: np.ndarray):
    """Fast numpy -> pyarrow Array for null-free int/bool columns.

    ``pa.array(ndarray)`` routes through pyarrow's generic converter,
    measured ~150x slower than ``Array.from_pandas`` (which takes the
    zero-copy numpy path) on this build — ~0.8 ms vs ~5 us for an
    8192-row int64 column. from_pandas maps float NaN to null, so this
    helper is for integer/bool columns only (the per-batch checkpoint
    side-columns and sampler id paths).
    """
    import pyarrow as pa

    return pa.Array.from_pandas(arr)


def bucketize_size(n: int, minimum: int = 16) -> int:
    """Round n up to the next power of two (>= minimum)."""
    m = max(int(n), minimum)
    return 1 << (m - 1).bit_length()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseField:
    """One sparse (id) feature for a batch.

    values: int64/int32 ids; [B, L] when fixed-length, [N_pad] when jagged.
    lengths: None (fixed) or int32 [B] with true per-row counts.
    weights: optional float32, same shape as values.
    segments: optional precomputed int32 segment ids [N_pad] for jagged
        values (multi-host batches, where per-host padding gaps make
        cumulative-length recovery wrong — utils/multihost.py).
    """

    values: Any
    lengths: Optional[Any] = None
    weights: Optional[Any] = None
    segments: Optional[Any] = None

    @property
    def is_fixed(self) -> bool:
        return self.lengths is None

    @property
    def batch_size(self) -> int:
        if self.is_fixed:
            return self.values.shape[0]
        return self.lengths.shape[0]

    def tree_flatten(self):
        return (self.values, self.lengths, self.weights, self.segments), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseField:
    """One dense feature: float32 values [B, D]."""

    values: Any

    def tree_flatten(self):
        return (self.values,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SequenceDenseField:
    """A per-position dense sequence feature: values [B, L, D] + lengths [B]."""

    values: Any
    lengths: Any

    def tree_flatten(self):
        return (self.values, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Batch:
    """The traced per-step input pytree.

    dense_features:   name -> DenseField                    (data group __BASE__)
    sparse_features:  name -> SparseField (pooled lookup)
    sequence_dense_features: name -> SequenceDenseField
    labels:           name -> [B] array
    sample_weights:   name -> [B] array
    additional:       misc traced arrays (e.g. tile size, repeat keys)
    """

    dense_features: Dict[str, DenseField] = dataclasses.field(default_factory=dict)
    sparse_features: Dict[str, SparseField] = dataclasses.field(default_factory=dict)
    # per-position (non-pooled) sequence ids: values [B, L], lengths [B]
    sequence_sparse_features: Dict[str, SparseField] = dataclasses.field(
        default_factory=dict
    )
    sequence_dense_features: Dict[str, SequenceDenseField] = dataclasses.field(
        default_factory=dict
    )
    labels: Dict[str, Any] = dataclasses.field(default_factory=dict)
    sample_weights: Dict[str, Any] = dataclasses.field(default_factory=dict)
    additional: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # INPUT_TILE serving: static per-batch tile count (aux data so it can
    # parameterize static shapes like jnp.tile reps)
    tile_size: Optional[int] = None

    def tree_flatten(self):
        children = (
            self.dense_features,
            self.sparse_features,
            self.sequence_sparse_features,
            self.sequence_dense_features,
            self.labels,
            self.sample_weights,
            self.additional,
        )
        return children, self.tile_size

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, tile_size=aux)

    @property
    def batch_size(self) -> int:
        for d in (self.labels, self.dense_features, self.sparse_features):
            for v in d.values():
                if isinstance(v, (DenseField,)):
                    return v.values.shape[0]
                if isinstance(v, SparseField):
                    return v.batch_size
                return v.shape[0]
        raise ValueError("empty batch")


@dataclasses.dataclass
class BatchInfo:
    """Host-side, non-traced per-batch metadata (ckpt positions etc.)."""

    checkpoint_info: Dict[int, int] = dataclasses.field(default_factory=dict)
    data_timestamp: Optional[int] = None
    batch_size: int = 0
    # reserved input columns (arrow arrays) carried to predict output
    reserved: Dict[str, Any] = dataclasses.field(default_factory=dict)


# ---------------------------------------------------------------------------
# host-side numpy helpers for building SparseFields
# ---------------------------------------------------------------------------


def pad_jagged_np(
    values: np.ndarray,
    lengths: np.ndarray,
    bucket: Optional[int] = None,
    weights: Optional[np.ndarray] = None,
) -> SparseField:
    """Pad a host jagged array to a bucketed static size.

    Padded value slots get id -1 / weight 0 (-1 gathers zeros and never
    receives optimizer updates); lengths stay exact so segment ids
    computed on device also place padding in segment B (dropped).
    """
    n = int(values.shape[0])
    cap = bucket if bucket is not None else bucketize_size(n)
    if cap < n:
        raise ValueError(f"bucket {cap} < values {n}")
    # int32 ids halve H2D bytes; jax drops to int32 on device anyway
    dtype = values.dtype if values.size else np.int64
    if dtype == np.int64:
        dtype = np.int32
    pv = np.full((cap,), -1, dtype=dtype)
    pv[:n] = values
    pw = None
    if weights is not None:
        pw = np.zeros((cap,), dtype=np.float32)
        pw[:n] = weights
    return SparseField(values=pv, lengths=lengths.astype(np.int32), weights=pw)


def segment_ids_from_lengths(lengths, total_length: int):
    """Device-side: int32 segment ids [total_length]; padding -> B.

    jnp.repeat with total_repeat_length keeps the shape static; slots past
    sum(lengths) get segment id B (= lengths.shape[0]).
    """
    import jax.numpy as jnp

    b = lengths.shape[0]
    seg = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32),
        lengths.astype(jnp.int32),
        total_repeat_length=total_length,
    )
    # positions beyond the true total are filled by jnp.repeat with the
    # last segment id; mask them to B
    idx = jnp.arange(total_length, dtype=jnp.int32)
    total = jnp.sum(lengths).astype(jnp.int32)
    return jnp.where(idx < total, seg, b)
