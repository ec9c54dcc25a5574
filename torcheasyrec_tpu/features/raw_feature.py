"""RawFeature: numeric feature, optionally bucketized into a categorical.

Counterpart of /root/reference/tzrec/features/raw_feature.py (99 LoC):
boundaries -> bucketize, normalizer specs, value_dim>1 vectors, and
AutoDis/MLP dense embedding (handled by DenseEmbeddingCollection).
"""

from typing import Any, Dict

import numpy as np
import pyarrow as pa

from torcheasyrec_tpu.features.feature import (
    BaseFeature,
    DenseData,
    SequenceDenseData,
    SequenceSparseData,
    SparseData,
    _parse_fg_encoded_dense,
    _parse_fg_encoded_sequence_dense,
    parse_normalizer,
)


class RawFeature(BaseFeature):
    @property
    def is_sparse(self) -> bool:
        return len(self.config.boundaries) > 0

    @property
    def has_dense_embedding(self) -> bool:
        return self.config.WhichOneof("dense_emb") is not None

    @property
    def output_dim(self) -> int:
        if self.is_sparse:
            return int(self.config.embedding_dim)
        if self.has_dense_embedding:
            if self.config.WhichOneof("dense_emb") == "autodis":
                # per-column embeddings concatenate (reference n*d)
                return int(self.config.embedding_dim) * max(
                    self.value_dim, 1
                )
            return int(self.config.embedding_dim)
        return max(self.value_dim, 1)

    @property
    def num_embeddings(self) -> int:
        return len(self.config.boundaries) + 1

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        feat = self._input_column(input_data)
        c = self.config
        normalizer = parse_normalizer(getattr(c, "normalizer", ""))
        default = [float(getattr(c, "default_value", "0") or 0)] * max(
            self.value_dim, 1
        )
        if self.is_sequence:
            delim = self.effective_sequence_delim
            dd = _parse_fg_encoded_sequence_dense(
                self.name, feat, delim, getattr(c, "separator", "\x1d"),
                max(self.value_dim, 1), default,
            )
            vals = normalizer(dd.values) if normalizer else dd.values
            if self.is_sparse:
                ids = self._bucketize(vals[:, 0])
                return SequenceSparseData(
                    self.name, ids, np.ones_like(ids, np.int32), dd.seq_lengths
                )
            return SequenceDenseData(self.name, vals, dd.seq_lengths)

        dd = _parse_fg_encoded_dense(
            self.name, feat, getattr(c, "separator", "\x1d"), default
        )
        vals = normalizer(dd.values) if normalizer else dd.values
        if self.is_sparse:
            ids = self._bucketize(vals[:, 0])
            return SparseData(
                self.name, ids, np.ones_like(ids, np.int32), None
            )
        return DenseData(self.name, vals.astype(np.float32))

# In FG_NONE mode boundaries-bucketized raw features arrive as int bucket
# ids, so the base sparse parse applies unchanged (reference raw_feature.py
# relies on BaseFeature._parse_fg_encoded dispatch on is_sparse).
