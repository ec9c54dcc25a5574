"""IdFeature: categorical id feature.

Counterpart of /root/reference/tzrec/features/id_feature.py (140 LoC):
hash_bucket / num_buckets / vocab_list / vocab_dict / vocab_file id
mapping, optional weighting, multi-value with separator.
"""

from typing import Any, Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from torcheasyrec_tpu.features.feature import (
    BaseFeature,
    SequenceSparseData,
    SparseData,
)


class IdFeature(BaseFeature):
    @property
    def is_sparse(self) -> bool:
        return True

    def _int_ids_vectorized(self, feat, default):
        """Vectorized integer-id mapping (no per-row python), or None
        to fall back to the generic token path.

        Only valid when buckets alone decide the mapping: any vocab
        config takes precedence in _vocab_to_ids and must keep the
        token path. num_buckets clips (python int(t) semantics);
        hash_bucket hashes the DECIMAL string bytes in C++
        (fg_hash64_ints_mod) so ids are identical to the str()+FNV
        python path.
        """
        c = self.config
        if (
            len(getattr(c, "vocab_list", []))
            or len(getattr(c, "vocab_dict", {}))
            or getattr(c, "vocab_file", "")
        ):
            return None
        if not (
            getattr(c, "num_buckets", 0) or getattr(c, "hash_bucket_size", 0)
        ):
            return None
        try:
            if default:
                feat = feat.cast(pa.int64()).fill_null(int(default))
            nulls = feat.is_null().to_numpy(zero_copy_only=False)
            lengths = (~nulls).astype(np.int32)
            vals = (
                feat.drop_null().cast(pa.int64()).to_numpy(
                    zero_copy_only=False
                )
                if nulls.any()
                else feat.cast(pa.int64()).to_numpy(zero_copy_only=False)
            )
        except (ValueError, pa.ArrowInvalid):
            return None  # e.g. uint64 overflowing int64: token path
        if getattr(c, "num_buckets", 0):
            ids = np.clip(vals, 0, int(c.num_buckets) - 1)
        else:
            from torcheasyrec_tpu import fg as fg_native

            ids = fg_native.hash_ints_mod(vals, int(c.hash_bucket_size))
        return SparseData(self.name, ids, lengths, None)

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        feat = self._input_column(input_data)
        c = self.config
        sep = getattr(c, "separator", "\x1d") or "\x1d"
        default = getattr(c, "default_value", "")

        if self.is_sequence:
            delim = self.effective_sequence_delim
            feat = feat.cast(pa.string(), safe=False)
            is_empty = pc.equal(feat, pa.scalar(""))
            feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
            if default:
                feat = feat.fill_null(default)
            # native two-level split+hash fast path (pyfg sequence hot
            # loop); empty rows -> 0 steps, matching the null handling
            if (
                getattr(c, "hash_bucket_size", 0)
                and not self.is_weighted
                and len(delim) == 1 and len(sep) == 1
            ):
                from torcheasyrec_tpu import fg as fg_native

                fast = fg_native.seq_split_hash_arrow(
                    feat.fill_null(""), delim, sep,
                    int(c.hash_bucket_size),
                )
                if fast is not None:
                    vals, tok_lengths, seq_lengths = fast
                    return SequenceSparseData(
                        self.name, vals, tok_lengths, seq_lengths
                    )
            nulls = feat.is_null().to_numpy(zero_copy_only=False)
            steps = pc.split_pattern(feat.fill_null(""), delim)
            toks = pc.split_pattern(steps.values, sep)
            seq_offs = steps.offsets.to_numpy()
            seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
            # null rows are EMPTY sequences, not a single hashed "" step
            seq_lengths = np.where(nulls, 0, seq_lengths).astype(np.int32)
            tok_offs = toks.offsets.to_numpy()
            tok_lengths = (tok_offs[1:] - tok_offs[:-1]).astype(np.int32)
            keep_steps = np.repeat(~nulls, seq_offs[1:] - seq_offs[:-1])
            tok_lengths = tok_lengths[keep_steps]
            all_tokens = toks.values.to_pylist()
            keep_tokens = np.repeat(
                keep_steps, tok_offs[1:] - tok_offs[:-1]
            )
            tokens = np.asarray(
                [t for t, kp in zip(all_tokens, keep_tokens) if kp],
                dtype=object,
            )
            ids = self._vocab_to_ids(tokens) if len(tokens) else np.zeros(
                (0,), np.int64
            )
            return SequenceSparseData(self.name, ids, tok_lengths, seq_lengths)

        weights = None
        if pa.types.is_string(feat.type) or pa.types.is_large_string(feat.type):
            is_empty = pc.equal(feat, pa.scalar(""))
            feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
            if default:
                feat = feat.fill_null(default)
            # native split+hash fast path (pyfg hot loop equivalent)
            if (
                not self.is_weighted
                and getattr(c, "hash_bucket_size", 0)
                and pa.types.is_string(feat.type)
            ):
                from torcheasyrec_tpu import fg as fg_native

                fast = fg_native.split_hash_arrow(
                    feat, sep, int(c.hash_bucket_size)
                )
                if fast is not None:
                    values, lengths = fast
                    return SparseData(self.name, values, lengths, None)
            nulls = feat.is_null().to_numpy(zero_copy_only=False)
            lf = pc.split_pattern(feat.fill_null(""), sep)
            offs = lf.offsets.to_numpy()
            lengths = (offs[1:] - offs[:-1]).astype(np.int32)
            lengths = np.where(nulls, 0, lengths).astype(np.int32)
            all_tokens = lf.values.to_pylist()
            keep = np.repeat(~nulls, offs[1:] - offs[:-1])
            tokens = np.asarray(
                [t for t, k in zip(all_tokens, keep) if k], dtype=object
            )
            if self.is_weighted and len(tokens):
                pairs = [str(t).split(":") for t in tokens]
                tokens = np.asarray([p[0] for p in pairs], dtype=object)
                weights = np.asarray(
                    [float(p[1]) if len(p) > 1 else 1.0 for p in pairs],
                    dtype=np.float32,
                )
        else:
            if pa.types.is_integer(feat.type):
                fast = self._int_ids_vectorized(feat, default)
                if fast is not None:
                    return fast
            if default:
                try:
                    feat = feat.fill_null(default)
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    # non-string column with a string default: compare
                    # in string space (str(t) semantics)
                    feat = feat.cast(pa.string()).fill_null(default)
            vals = feat.to_pylist()
            keep = [v is not None for v in vals]
            tokens = np.asarray([v for v in vals if v is not None], dtype=object)
            lengths = np.asarray(keep, dtype=np.int32)
        ids = self._vocab_to_ids(tokens) if len(tokens) else np.zeros((0,), np.int64)
        return SparseData(self.name, ids, lengths, weights)
