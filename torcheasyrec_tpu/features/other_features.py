"""Remaining feature classes.

Counterparts of /root/reference/tzrec/features/{combo_feature,lookup_feature,
match_feature,expr_feature,overlap_feature,tokenize_feature,kv_dot_product,
custom_feature,bool_mask_feature,combine_feature}.py. All support the
FG_NONE (pre-encoded) path through BaseFeature; FG_NORMAL transforms are
implemented in numpy where the semantics are local (combo/expr/overlap/
lookup); plugin-backed ones (custom/tokenize) currently require FG_NONE.
"""

from typing import Any, Dict, List

import numpy as np
import pyarrow as pa

from torcheasyrec_tpu.features.feature import (
    BaseFeature,
    DenseData,
    SparseData,
    stable_hash64,
)


class ComboFeature(BaseFeature):
    """Cross of multiple inputs, hashed into one id space
    (reference features/combo_feature.py, 106 LoC)."""

    @property
    def is_sparse(self) -> bool:
        return True

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        # vectorized Arrow join (no per-row python; the hash-bucket
        # variant additionally runs fully in C++ via the FG DAG)
        import pyarrow.compute as pc

        cols = []
        for _, c in self.side_inputs:
            arr = input_data[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            cols.append(arr.cast(pa.string(), safe=False))
        valid = None
        for c in cols:
            v = pc.and_(
                pc.is_valid(c), pc.not_equal(pc.fill_null(c, ""), "")
            )
            valid = v if valid is None else pc.and_(valid, v)
        joined = pc.binary_join_element_wise(
            *[pc.fill_null(c, "") for c in cols], "\x1d"
        )
        lengths = np.ascontiguousarray(
            valid.to_numpy(zero_copy_only=False)
        ).astype(np.int32)
        tokens_arr = joined.filter(valid)
        ids = (
            self._vocab_to_ids(
                np.asarray(tokens_arr.to_pylist(), dtype=object)
            )
            if len(tokens_arr) else np.zeros((0,), np.int64)
        )
        return SparseData(self.name, ids, lengths)


class LookupFeature(BaseFeature):
    """Map-lookup by key (reference features/lookup_feature.py, 204 LoC)."""

    @property
    def expressions(self):
        # reference-style map/key fields take precedence over the
        # repeated expression form
        c = self.config
        if getattr(c, "map", "") or getattr(c, "key", ""):
            return [c.map, c.key]
        return super().expressions

    @property
    def is_sparse(self) -> bool:
        c = self.config
        return bool(
            len(c.boundaries) or c.hash_bucket_size or c.num_buckets
            or len(c.vocab_list) or len(c.vocab_dict)
        )

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        # expressions: [map, key]
        (_, map_col), (_, key_col) = self.side_inputs[0], self.side_inputs[1]
        maps = input_data[map_col].to_pylist()
        keys = input_data[key_col].cast(pa.string(), safe=False).to_pylist()
        sep = self.config.separator or "\x1d"
        n = len(keys)
        out = np.zeros((n,), np.float32)
        tokens = [""] * n
        for i in range(n):
            m, k = maps[i], keys[i]
            if m is None or k is None:
                continue
            if isinstance(m, str):
                kv = dict(
                    p.split(":", 1) for p in m.split(sep) if ":" in p
                )
                v = kv.get(k)
            elif isinstance(m, dict):
                v = m.get(k)
            else:
                v = None
            if v is not None:
                tokens[i] = str(v)
                try:
                    out[i] = float(v)
                except ValueError:
                    out[i] = 0.0
        return self._value_output(out, tokens, n)


class MatchFeature(BaseFeature):
    """Nested kv match by primary/secondary key
    (reference features/match_feature.py, 189 LoC)."""

    @property
    def expressions(self):
        c = self.config
        if getattr(c, "nested_map", ""):
            return [c.nested_map, c.pkey, c.skey]
        return super().expressions

    @property
    def is_sparse(self) -> bool:
        c = self.config
        return bool(
            len(c.boundaries) or c.hash_bucket_size or c.num_buckets
            or len(c.vocab_list) or len(c.vocab_dict)
        )

    _value_output = None  # shared helper assigned below

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        (_, nested_col), (_, pkey_col), (_, skey_col) = self.side_inputs[:3]
        nested = input_data[nested_col].cast(pa.string(), safe=False).to_pylist()
        pkeys = input_data[pkey_col].cast(pa.string(), safe=False).to_pylist()
        skeys = input_data[skey_col].cast(pa.string(), safe=False).to_pylist()
        n = len(nested)
        out = np.zeros((n,), np.float32)
        tokens = [""] * n
        for i in range(n):
            if nested[i] is None:
                continue
            # format: pk1^kv1:v1,kv2:v2|pk2^...
            table = {}
            for grp in str(nested[i]).split("|"):
                if "^" not in grp:
                    continue
                pk, kvs = grp.split("^", 1)
                table[pk] = dict(
                    p.split(":", 1) for p in kvs.split(",") if ":" in p
                )
            v = table.get(pkeys[i], {}).get(skeys[i])
            if v is not None:
                tokens[i] = str(v)
                try:
                    out[i] = float(v)
                except ValueError:
                    pass
        return self._value_output(out, tokens, n)


def _lookup_value_output(self, out, tokens, n):
    """Route a looked-up value to dense or the configured id mapping
    (boundaries -> bucketize; hash/num_buckets/vocab -> token ids)."""
    c = self.config
    if self.is_sparse:
        if len(c.boundaries):
            ids = self._bucketize(out)
        else:
            ids = self._vocab_to_ids(np.asarray(tokens, dtype=object))
        return SparseData(self.name, ids, np.ones((n,), np.int32))
    return DenseData(self.name, out[:, None])


LookupFeature._value_output = _lookup_value_output
MatchFeature._value_output = _lookup_value_output


class ExprFeature(BaseFeature):
    """Arithmetic expression over input variables
    (reference features/expr_feature.py)."""

    @property
    def is_sparse(self) -> bool:
        return len(self.config.boundaries) > 0

    @property
    def expressions(self) -> List[str]:
        return list(self.config.variables)

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        local: Dict[str, np.ndarray] = {}
        for _, col in self.side_inputs:
            arr = input_data[col].cast(pa.float64(), safe=False)
            local[col] = np.nan_to_num(
                arr.to_numpy(zero_copy_only=False).astype(np.float64)
            )
        expr = self.config.expression
        # restricted eval: numpy namespace only
        allowed = {"np": np, "log": np.log, "exp": np.exp, "sqrt": np.sqrt,
                   "abs": np.abs, "min": np.minimum, "max": np.maximum,
                   "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x))}
        out = eval(expr, {"__builtins__": {}}, {**allowed, **local})  # noqa: S307
        out = np.asarray(out, dtype=np.float32)
        n = len(next(iter(local.values())))
        if out.ndim == 0:
            out = np.full((n,), float(out), np.float32)
        if self.is_sparse:
            ids = self._bucketize(out)
            return SparseData(self.name, ids, np.ones((n,), np.int32))
        return DenseData(self.name, out[:, None])


class OverlapFeature(BaseFeature):
    """Query/title overlap ratios (reference features/overlap_feature.py)."""

    @property
    def is_sparse(self) -> bool:
        return len(self.config.boundaries) > 0

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        (_, qcol), (_, tcol) = self.side_inputs[:2]
        sep = self.config.separator or "\x1d"
        qs = input_data[qcol].cast(pa.string(), safe=False).to_pylist()
        ts = input_data[tcol].cast(pa.string(), safe=False).to_pylist()
        method = self.config.method
        n = len(qs)
        out = np.zeros((n,), np.float32)
        for i in range(n):
            q = (qs[i] or "").split(sep)
            t = (ts[i] or "").split(sep)
            qset, tset = set(q) - {""}, set(t) - {""}
            if method == "query_common_ratio":
                out[i] = len(qset & tset) / max(len(qset), 1)
            elif method == "title_common_ratio":
                out[i] = len(qset & tset) / max(len(tset), 1)
            elif method == "is_contain":
                out[i] = float(bool(qset) and qset <= tset)
            elif method == "is_equal":
                out[i] = float(qset == tset and bool(qset))
        if self.is_sparse:
            ids = self._bucketize(out)
            return SparseData(self.name, ids, np.ones((n,), np.int32))
        return DenseData(self.name, out[:, None])


class TokenizeFeature(BaseFeature):
    """Text tokenizer feature (reference features/tokenize_feature.py,
    224 LoC). FG_NORMAL uses a HuggingFace tokenizer.json when available."""

    _tokenizer = None

    @property
    def is_sparse(self) -> bool:
        return True

    @property
    def num_embeddings(self) -> int:
        if self.config.vocab_file:
            tok = self._get_tokenizer()
            if tok is not None:
                return tok.get_vocab_size()
            return super()._vocab_file_size()
        return super().num_embeddings

    def _get_tokenizer(self):
        if self._tokenizer is None and self.config.vocab_file:
            ttype = (
                getattr(self.config, "tokenizer_type", "") or "bpe"
            ).lower()
            if ttype == "sentencepiece" or self.config.vocab_file.endswith(
                ".model"
            ):
                # serialized spm model (reference tokenize_feature.py:
                # 149-159); pure-python loader + unigram Viterbi — the
                # sentencepiece wheel is not required (features/spiece.py)
                from torcheasyrec_tpu.features.spiece import (
                    SpmTokenizerAdapter,
                )

                try:
                    self._tokenizer = SpmTokenizerAdapter.from_file(
                        self.config.vocab_file
                    )
                except Exception:  # noqa: BLE001
                    self._tokenizer = None
                return self._tokenizer
            try:
                from tokenizers import Tokenizer

                self._tokenizer = Tokenizer.from_file(self.config.vocab_file)
            except Exception:  # noqa: BLE001
                self._tokenizer = None
        return self._tokenizer

    def _normalize(self, text: str) -> str:
        """TextNormalizer semantics (reference tokenize_feature.py:26-31,
        98-145): case folding, SBC->DBC full-width conversion, stop-char
        filtering; texts beyond max_length skip normalization. CHT->CHS
        needs a conversion table and is warned once."""
        c = self.config
        if not (getattr(c, "HasField", None)
                and c.HasField("text_normalizer")):
            return text
        nc = c.text_normalizer
        if nc.max_length and len(text) > nc.max_length:
            return text
        opts = set(nc.norm_options) or {0, 2, 3, 4}  # reference default
        if 3 in opts and not getattr(self, "_warned_cht", False):
            from torcheasyrec_tpu.utils.logging_util import logger

            logger.warning(
                f"{self.name}: CHT2CHS needs a conversion table; skipped"
            )
            self._warned_cht = True
        if 2 in opts:  # SBC2DBC: full-width -> half-width
            text = "".join(
                chr(o - 0xFEE0) if 0xFF01 <= (o := ord(ch)) <= 0xFF5E
                else (" " if o == 0x3000 else ch)
                for ch in text
            )
        if 1 in opts:
            text = text.lower()
        elif 0 in opts:
            text = text.upper()
        if 4 in opts:  # FILTER stop chars
            stops = self._stop_chars()
            if stops:
                text = "".join(ch for ch in text if ch not in stops)
        return text

    def _stop_chars(self):
        if not hasattr(self, "_stop_set"):
            self._stop_set = set()
            f = getattr(self.config.text_normalizer, "stop_char_file", "")
            if f:
                try:
                    with open(f, encoding="utf-8") as fh:
                        self._stop_set = {
                            line.rstrip("\n") for line in fh
                            if line.rstrip("\n")
                        }
                except OSError:
                    pass
        return self._stop_set

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        feat = self._input_column(input_data)
        texts = feat.cast(pa.string(), safe=False).to_pylist()
        tok = self._get_tokenizer()
        values: List[int] = []
        lengths = np.zeros((len(texts),), np.int32)
        for i, t in enumerate(texts):
            if not t:
                continue
            t = self._normalize(str(t))
            if tok is not None:
                ids = tok.encode(str(t)).ids
            else:
                ids = (
                    stable_hash64(np.asarray(str(t).split(), dtype=object))
                    % np.uint64(max(self.num_embeddings, 1))
                ).astype(np.int64).tolist()
            values.extend(ids)
            lengths[i] = len(ids)
        return SparseData(
            self.name, np.asarray(values, np.int64), lengths
        )


class KvDotProduct(BaseFeature):
    """Weighted kv dot product (reference features/kv_dot_product.py, 84 LoC)."""

    @property
    def is_sparse(self) -> bool:
        return len(self.config.boundaries) > 0

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        (_, c1), (_, c2) = self.side_inputs[:2]
        sep = self.config.separator or "\x1d"
        a1 = input_data[c1].cast(pa.string(), safe=False).to_pylist()
        a2 = input_data[c2].cast(pa.string(), safe=False).to_pylist()
        n = len(a1)
        out = np.zeros((n,), np.float32)

        def _kv(s):
            # skip pairs with an empty or unparseable value (same
            # semantics as the native kv_pairs kernel, fg_ops.cc)
            out = {}
            for p in (s or "").split(sep):
                k, _, v = p.partition(":")
                if v:
                    try:
                        out[k] = float(v)
                    except ValueError:
                        pass
            return out

        for i in range(n):
            kv1, kv2 = _kv(a1[i]), _kv(a2[i])
            out[i] = sum(kv1[k] * kv2[k] for k in kv1.keys() & kv2.keys())
        if self.is_sparse:
            ids = self._bucketize(out)
            return SparseData(self.name, ids, np.ones((n,), np.int32))
        return DenseData(self.name, out[:, None])


_CUSTOM_OP_REGISTRY = {}


def register_custom_op(name: str, fn) -> None:
    """Register a python custom-feature op: fn(columns, params) ->
    (values, lengths) for sparse or [B, D] array for dense (the python
    analogue of the reference's C++ pyfg plugin ops,
    features/custom_feature.py:194)."""
    _CUSTOM_OP_REGISTRY[name] = fn


class CustomFeature(BaseFeature):
    """User plugin feature (reference features/custom_feature.py, 194 LoC).

    FG_NONE: pre-encoded path via BaseFeature. FG_NORMAL: operator_name
    resolves to a callable registered with register_custom_op (modules in
    TZREC_USER_MODULE_DIR are auto-imported so they can register).
    """

    @property
    def is_sparse(self) -> bool:
        return not bool(getattr(self.config, "is_dense", False))

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        import json as _json

        op = _CUSTOM_OP_REGISTRY.get(self.config.operator_name)
        if op is None:
            from torcheasyrec_tpu.utils.load_class import load_by_path

            op = load_by_path(self.config.operator_name)
        params = {}
        if self.config.HasField("operator_params"):
            from google.protobuf import json_format as _jf

            params = _jf.MessageToDict(self.config.operator_params)
        cols = {c: input_data[c] for _, c in self.side_inputs
                if c in input_data}
        out = op(cols, params)
        if self.is_sparse:
            values, lengths = out
            return SparseData(
                self.name, np.asarray(values, np.int64),
                np.asarray(lengths, np.int32),
            )
        arr = np.asarray(out, np.float32)
        if arr.ndim == 1:
            arr = arr[:, None]
        return DenseData(self.name, arr)


class BoolMaskFeature(BaseFeature):
    """Boolean masking of an id list (reference features/bool_mask_feature.py)."""

    @property
    def is_sparse(self) -> bool:
        return True

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        (_, vcol), (_, mcol) = self.side_inputs[:2]
        sep = self.config.separator or "\x1d"
        vals = input_data[vcol].cast(pa.string(), safe=False).to_pylist()
        masks = input_data[mcol].cast(pa.string(), safe=False).to_pylist()
        n = len(vals)
        tokens: List[str] = []
        lengths = np.zeros((n,), np.int32)
        for i in range(n):
            vs = (vals[i] or "").split(sep)
            ms = (masks[i] or "").split(sep)
            kept = [
                v for v, m in zip(vs, ms)
                if v and m in ("1", "true", "True")
            ]
            tokens.extend(kept)
            lengths[i] = len(kept)
        ids = self._vocab_to_ids(np.asarray(tokens, dtype=object)) if tokens \
            else np.zeros((0,), np.int64)
        return SparseData(self.name, ids, lengths)


class CombineFeature(BaseFeature):
    """Combine upstream feature outputs (reference features/combine_feature.py).

    FG_NONE path: the combined column is pre-encoded. FG_NORMAL combining of
    upstream features runs after their parses in the DataParser.
    """

    @property
    def is_sparse(self) -> bool:
        c = self.config
        return bool(
            c.hash_bucket_size or c.num_buckets or len(c.vocab_list)
            or len(c.vocab_dict) or len(c.boundaries)
        )
