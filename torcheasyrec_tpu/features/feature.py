"""Feature layer: BaseFeature + registry + fg-encoded parsers.

TPU-native counterpart of /root/reference/tzrec/features/feature.py
(BaseFeature:380, create_features:1161, fg-encoded parse impls :80-343).
Host-side only (pyarrow/numpy): converts raw Arrow columns into numpy
sparse/dense feature data; the device never sees strings or dynamic
shapes. FG_NONE (pre-encoded input) is the primary path; FG_NORMAL runs
python feature-generation transforms (hash/vocab/boundaries/normalizers)
with the same semantics the reference delegates to the pyfg C++ DAG.
"""

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from torcheasyrec_tpu.protos import feature_pb2
from torcheasyrec_tpu.utils.load_class import get_register_class_meta

_UNSET = object()  # _id_bound_cache sentinel (None is a valid value)

_FEATURE_CLASS_MAP: Dict[str, type] = {}
_meta_cls = get_register_class_meta(_FEATURE_CLASS_MAP)

BASE_DATA_GROUP = "__BASE__"
NEG_DATA_GROUP = "__NEG__"


# ---------------------------------------------------------------------------
# parsed data containers (reference datasets/utils.py:231-268)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SparseData:
    name: str
    values: np.ndarray  # int64 [N]
    lengths: np.ndarray  # int32 [B]
    weights: Optional[np.ndarray] = None  # float32 [N]


@dataclasses.dataclass
class DenseData:
    name: str
    values: np.ndarray  # float32 [B, D]


@dataclasses.dataclass
class SequenceSparseData:
    name: str
    values: np.ndarray  # int64 [N_total]
    lengths: np.ndarray  # int32 [N_steps]  (ids per step; usually all 1)
    seq_lengths: np.ndarray  # int32 [B]    (steps per sample)


@dataclasses.dataclass
class SequenceDenseData:
    name: str
    values: np.ndarray  # float32 [N_steps, D]
    seq_lengths: np.ndarray  # int32 [B]


# ---------------------------------------------------------------------------
# fg-encoded parse impls (reference features/feature.py:80-343)
# ---------------------------------------------------------------------------


def _parse_fg_encoded_sparse(
    name: str,
    feat: pa.Array,
    multival_sep: str = chr(3),
    default_value: Optional[List[int]] = None,
    is_weighted: bool = False,
) -> SparseData:
    weight_values = None
    if pa.types.is_string(feat.type) or pa.types.is_list(feat.type) or pa.types.is_map(
        feat.type
    ):
        weight = None
        if pa.types.is_string(feat.type) or pa.types.is_list(feat.type):
            if pa.types.is_string(feat.type):
                is_empty = pc.equal(feat, pa.scalar(""))
                feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
                feat = pc.split_pattern(feat, multival_sep)
            elif pa.types.is_list(feat.type) and default_value is not None:
                is_empty = pc.equal(pc.list_value_length(feat), 0)
                feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
            if is_weighted:
                fw = pc.split_pattern(feat.values, ":")
                weight = pa.ListArray.from_arrays(
                    feat.offsets, fw.values[1::2], mask=feat.is_null()
                )
                feat = pa.ListArray.from_arrays(
                    feat.offsets, fw.values[::2], mask=feat.is_null()
                )
        else:  # map<k,v>
            weight = pa.ListArray.from_arrays(
                feat.offsets, feat.items, mask=feat.is_null()
            )
            feat = pa.ListArray.from_arrays(
                feat.offsets, feat.keys, mask=feat.is_null()
            )
        feat = feat.cast(pa.list_(pa.int64()), safe=False)
        if weight is not None:
            weight = weight.cast(pa.list_(pa.float32()), safe=False)
        if default_value is not None:
            feat = feat.fill_null(default_value)
            if weight is not None:
                weight = weight.fill_null([1.0])
        feat = feat.combine_chunks() if isinstance(feat, pa.ChunkedArray) else feat
        feat_values = feat.values.to_numpy(zero_copy_only=False)
        offs = feat.offsets.to_numpy()
        feat_lengths = (offs[1:] - offs[:-1]).astype(np.int32)
        if weight is not None:
            weight_values = weight.values.to_numpy(zero_copy_only=False)
    elif pa.types.is_integer(feat.type):
        if feat.null_count == 0:
            # hot path (plain non-null id column): zero-copy view
            feat_values = feat.to_numpy(zero_copy_only=True)
            feat_lengths = np.ones((len(feat),), np.int32)
        elif default_value is not None:
            feat = feat.cast(pa.int64()).fill_null(default_value[0])
            feat_values = feat.to_numpy(zero_copy_only=False)
            feat_lengths = np.ones_like(feat_values, np.int32)
        else:
            feat_values = feat.drop_null().cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            feat_lengths = (
                1 - feat.is_null().cast(pa.int32()).to_numpy(zero_copy_only=False)
            ).astype(np.int32)
    else:
        raise ValueError(
            f"{name}: unsupported fg-encoded sparse dtype {feat.type}"
        )
    return SparseData(
        name, feat_values.astype(np.int64, copy=False), feat_lengths,
        weight_values,
    )


def _parse_fg_encoded_dense(
    name: str,
    feat: pa.Array,
    multival_sep: str = chr(3),
    default_value: Optional[List[float]] = None,
) -> DenseData:
    if pa.types.is_string(feat.type):
        if default_value is not None:
            is_empty = pc.equal(feat, pa.scalar(""))
            feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
            feat = feat.fill_null(multival_sep.join(map(str, default_value)))
        list_feat = pc.split_pattern(feat, multival_sep)
        list_feat = list_feat.cast(pa.list_(pa.float32()), safe=False)
        feat_values = np.stack(list_feat.to_numpy(zero_copy_only=False))
    elif pa.types.is_list(feat.type):
        feat = feat.cast(pa.list_(pa.float32()), safe=False)
        if default_value is not None:
            is_empty = pc.equal(pc.list_value_length(feat), 0)
            feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
            feat = feat.fill_null(default_value)
        feat_values = np.stack(feat.to_numpy(zero_copy_only=False))
    elif pa.types.is_integer(feat.type) or pa.types.is_floating(feat.type):
        feat = feat.cast(pa.float32(), safe=False)
        if default_value is not None:
            feat = feat.fill_null(default_value[0])
        feat_values = feat.to_numpy(zero_copy_only=False)[:, np.newaxis]
    else:
        raise ValueError(f"{name}: unsupported fg-encoded dense dtype {feat.type}")
    return DenseData(name, np.nan_to_num(feat_values.astype(np.float32)))


def _parse_fg_encoded_sequence_sparse(
    name: str,
    feat: pa.Array,
    sequence_delim: str = ";",
    multival_sep: str = chr(3),
    default_value: Optional[List[int]] = None,
) -> SequenceSparseData:
    if pa.types.is_string(feat.type):
        is_empty = pc.equal(feat, pa.scalar(""))
        feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
        if default_value is not None:
            feat = feat.fill_null(multival_sep.join(map(str, default_value)))
        list_seq_feat = pc.split_pattern(feat, sequence_delim)
        list_feat = pc.split_pattern(list_seq_feat.values, multival_sep)
        seq_offs = list_seq_feat.offsets.to_numpy()
        seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
        # null rows produce length 0 via offsets? ListArray nulls keep equal
        # offsets; is_null rows must map to 0 length
        nulls = list_seq_feat.is_null().to_numpy(zero_copy_only=False)
        seq_lengths = np.where(nulls, 0, seq_lengths).astype(np.int32)
        feat_values = list_feat.values.cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        offs = list_feat.offsets.to_numpy()
        feat_lengths = (offs[1:] - offs[:-1]).astype(np.int32)
    elif pa.types.is_list(feat.type):
        if pa.types.is_list(feat.type.value_type):
            feat = feat.cast(pa.list_(pa.list_(pa.int64())), safe=False)
            if default_value is not None:
                is_empty = pc.equal(pc.list_value_length(feat), 0)
                feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
                feat = feat.fill_null([default_value])
            seq_offs = feat.offsets.to_numpy()
            seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
            feat_values = feat.values.values.to_numpy(zero_copy_only=False)
            offs = feat.values.offsets.to_numpy()
            feat_lengths = (offs[1:] - offs[:-1]).astype(np.int32)
        else:
            feat = feat.cast(pa.list_(pa.int64()), safe=False)
            if default_value is not None:
                is_empty = pc.equal(pc.list_value_length(feat), 0)
                feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
                feat = feat.fill_null(default_value)
            seq_offs = feat.offsets.to_numpy()
            seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
            feat_values = feat.values.to_numpy(zero_copy_only=False)
            feat_lengths = np.ones_like(feat_values, dtype=np.int32)
    else:
        raise ValueError(f"{name}: unsupported sequence sparse dtype {feat.type}")
    return SequenceSparseData(
        name, feat_values.astype(np.int64), feat_lengths, seq_lengths
    )


def _parse_fg_encoded_sequence_dense(
    name: str,
    feat: pa.Array,
    sequence_delim: str = ";",
    multival_sep: str = chr(3),
    value_dim: int = 1,
    default_value: Optional[List[float]] = None,
) -> SequenceDenseData:
    if pa.types.is_string(feat.type):
        is_empty = pc.equal(feat, pa.scalar(""))
        feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
        if default_value is not None:
            feat = feat.fill_null(multival_sep.join(map(str, default_value)))
        list_seq_feat = pc.split_pattern(feat, sequence_delim)
        list_feat = pc.split_pattern(list_seq_feat.values, multival_sep)
        seq_offs = list_seq_feat.offsets.to_numpy()
        seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
        nulls = list_seq_feat.is_null().to_numpy(zero_copy_only=False)
        seq_lengths = np.where(nulls, 0, seq_lengths).astype(np.int32)
        feat_values = (
            list_feat.values.cast(pa.float32(), safe=False)
            .to_numpy(zero_copy_only=False)
            .reshape(-1, value_dim)
        )
    elif pa.types.is_list(feat.type):
        if pa.types.is_list(feat.type.value_type):
            feat = feat.cast(pa.list_(pa.list_(pa.float32())), safe=False)
            if default_value is not None:
                is_empty = pc.equal(pc.list_value_length(feat), 0)
                feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
                feat = feat.fill_null([default_value])
            seq_offs = feat.offsets.to_numpy()
            seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
            feat_values = feat.values.values.to_numpy(zero_copy_only=False).reshape(
                -1, value_dim
            )
        else:
            feat = feat.cast(pa.list_(pa.float32()), safe=False)
            if default_value is not None:
                is_empty = pc.equal(pc.list_value_length(feat), 0)
                feat = pc.if_else(is_empty, pa.nulls(len(feat)), feat)
                feat = feat.fill_null(default_value)
            seq_offs = feat.offsets.to_numpy()
            seq_lengths = (seq_offs[1:] - seq_offs[:-1]).astype(np.int32)
            feat_values = feat.values.to_numpy(zero_copy_only=False).reshape(
                -1, value_dim
            )
    else:
        raise ValueError(f"{name}: unsupported sequence dense dtype {feat.type}")
    return SequenceDenseData(
        name, np.nan_to_num(feat_values.astype(np.float32)), seq_lengths
    )


# ---------------------------------------------------------------------------
# fg transforms for FG_NORMAL mode (pyfg-equivalent, python/numpy)
# ---------------------------------------------------------------------------

_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def stable_hash64(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit FNV-1a over utf-8 strings (train/serve stable).

    Replaces the pyfg C++ hash (reference feature.py:979-995); the exact
    hash differs from pyfg but is internally consistent, which is what
    train/serve parity requires.
    """
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = _FNV64_OFFSET
        for b in str(t).encode("utf-8"):
            h = np.uint64((int(h) ^ b) * int(_FNV64_PRIME) & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def parse_normalizer(spec: Optional[str]):
    """Parse "method=log10,threshold=1e-10,default=-10" normalizer specs
    (reference features/raw_feature.py)."""
    if not spec:
        return None
    kv = {}
    for part in spec.split(","):
        if "=" in part:
            k, v = part.split("=", 1)
            kv[k.strip()] = v.strip()
    method = kv.get("method", "")

    def _apply(x: np.ndarray) -> np.ndarray:
        if method == "log10":
            threshold = float(kv.get("threshold", 1e-10))
            default = float(kv.get("default", -10))
            return np.where(
                x >= threshold, np.log10(np.maximum(x, threshold)), default
            ).astype(np.float32)
        if method == "zscore":
            mean = float(kv.get("mean", 0.0))
            std = float(kv.get("standard_deviation", kv.get("std", 1.0)))
            return ((x - mean) / max(std, 1e-12)).astype(np.float32)
        if method == "minmax":
            mn = float(kv.get("min", 0.0))
            mx = float(kv.get("max", 1.0))
            return ((x - mn) / max(mx - mn, 1e-12)).astype(np.float32)
        if method == "expression":
            return x
        return x

    return _apply


# ---------------------------------------------------------------------------
# BaseFeature
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EmbConfig:
    """Per-table embedding config fed to the embedding engine."""

    name: str
    num_embeddings: int
    embedding_dim: int
    pooling: str = "sum"
    init_fn: Optional[str] = None
    trainable: bool = True
    sharding_types: Tuple[str, ...] = ()
    feature_names: Tuple[str, ...] = ()


class BaseFeature(metaclass=_meta_cls):
    """One feature column family.

    Subclasses set class attrs / override hooks; the base class handles
    expression parsing, embedding config construction, side detection and
    fg-encoded parsing dispatch.
    """

    def __init__(
        self,
        feature_config: Any,
        fg_mode: int = 1,  # FgMode.FG_NONE
        fg_encoded_multival_sep: Optional[str] = None,
    ) -> None:
        self._feature_config = feature_config  # oneof wrapper (FeatureConfig)
        oneof = feature_config.WhichOneof("feature")
        self.config = getattr(feature_config, oneof)
        self._oneof_name = oneof
        self._is_seq_oneof = oneof.startswith("sequence_")
        self._fg_mode = fg_mode
        self._multival_sep = fg_encoded_multival_sep or chr(3)
        # for grouped sequence sub-features (SequenceFeature)
        self.sequence_name: Optional[str] = None
        self.sequence_delim: Optional[str] = None
        self.sequence_length: Optional[int] = None
        self.sequence_pk: Optional[str] = None
        self._data_group = BASE_DATA_GROUP
        self._id_bound_cache = _UNSET

    # -- identity ----------------------------------------------------------

    @property
    def name(self) -> str:
        if self.sequence_name:
            return f"{self.sequence_name}__{self.config.feature_name}"
        return self.config.feature_name

    @property
    def is_sequence(self) -> bool:
        return self._is_seq_oneof or self.sequence_name is not None

    @property
    def is_weighted(self) -> bool:
        return bool(getattr(self.config, "weighted", False))

    @property
    def effective_sequence_length(self) -> int:
        """Configured max sequence length (grouped or per-feature)."""
        if self.sequence_length:
            return int(self.sequence_length)
        return int(getattr(self.config, "sequence_length", 0) or 0)

    @property
    def is_sparse(self) -> bool:
        """Has a categorical/id output (embedding lookup needed)."""
        raise NotImplementedError

    @property
    def value_dim(self) -> int:
        return int(getattr(self.config, "value_dim", 0) or 0)

    @property
    def output_dim(self) -> int:
        """Per-sample output dim after embedding/identity."""
        if self.is_sparse:
            return int(self.config.embedding_dim)
        return max(self.value_dim, 1)

    # -- embedding table config -------------------------------------------

    @property
    def num_embeddings(self) -> int:
        c = self.config
        if getattr(c, "hash_bucket_size", 0):
            return int(c.hash_bucket_size)
        if getattr(c, "num_buckets", 0):
            return int(c.num_buckets)
        if len(getattr(c, "vocab_list", [])):
            dbv = int(getattr(c, "default_bucketize_value", 0) or 0)
            if getattr(c, "HasField", None) and _has_field_safe(
                c, "default_bucketize_value"
            ):
                # raw 0-based vocab positions; OOV -> default_bucketize_value
                return max(len(c.vocab_list), dbv + 1)
            # id 0 reserved for default, 1 for oov (reference vocab offset)
            return len(c.vocab_list) + 2
        if len(getattr(c, "vocab_dict", {})):
            # +1 row for the OOV slot (default_bucketize_value, def. 1)
            dbv = int(getattr(c, "default_bucketize_value", 0) or 1)
            return max(max(c.vocab_dict.values()), dbv) + 1
        if getattr(c, "vocab_file", ""):
            return self._vocab_file_size()
        if len(getattr(c, "boundaries", [])):
            return len(c.boundaries) + 1
        if getattr(c, "zch", None) and c.HasField("zch"):
            return int(c.zch.zch_size)
        try:
            if getattr(c, "dynamicemb", None) and c.HasField("dynamicemb"):
                return int(c.dynamicemb.max_capacity)
        except ValueError:
            pass
        raise ValueError(f"feature {self.name}: cannot infer id space size")

    def _vocab_file_size(self) -> int:
        """Max index + 1 over the parsed file (reference
        vocab_file_size), covering the OOV slot too."""
        table = self._load_vocab_file()
        dbv = int(
            getattr(self.config, "default_bucketize_value", 0) or 1
        )
        if not table:
            return dbv + 1
        return max(max(table.values()), dbv) + 1

    @property
    def embedding_name(self) -> str:
        return getattr(self.config, "embedding_name", "") or f"{self.name}_emb"

    @property
    def pooling(self) -> str:
        return (getattr(self.config, "pooling", "sum") or "sum").lower()

    @property
    def trainable(self) -> bool:
        return bool(getattr(self.config, "trainable", True))

    def emb_config(self) -> Optional[EmbConfig]:
        if not self.is_sparse:
            return None
        constraints = ()
        ec = getattr(self.config, "embedding_constraints", None)
        if ec is not None and len(ec.sharding_types):
            constraints = tuple(ec.sharding_types)
        return EmbConfig(
            name=self.embedding_name,
            num_embeddings=self.num_embeddings,
            embedding_dim=int(self.config.embedding_dim),
            pooling=self.pooling,
            init_fn=getattr(self.config, "init_fn", "") or None,
            trainable=self.trainable,
            sharding_types=constraints,
            feature_names=(self.name,),
        )

    # -- input wiring ------------------------------------------------------

    @property
    def expressions(self) -> List[str]:
        c = self.config
        expr = getattr(c, "expression", None)
        if isinstance(expr, str):
            return [expr] if expr else []
        if expr is not None:
            return list(expr)
        return []

    # classes whose single input is sequence-typed inside a grouped
    # sequence (reference feature.py SINGLE_INPUT_FEATURE_CLASSES)
    _SINGLE_INPUT_SEQ_CLASSES = (
        "IdFeature", "RawFeature", "TokenizeFeature", "CombineFeature",
    )

    def _is_sequence_input(self, side: str, col: str) -> bool:
        """Whether an input column is sequence-typed (reference
        feature.py:748-771): explicit sequence_fields wins; else
        single-input feature CLASSES auto-mark (side != 'feature');
        else item-side default."""
        if not self.is_sequence:
            return False
        sf = list(getattr(self.config, "sequence_fields", []))
        if sf:
            return col in sf
        if type(self).__name__ in self._SINGLE_INPUT_SEQ_CLASSES:
            return side != "feature"
        return side == "item"

    @property
    def effective_sequence_delim(self) -> str:
        """Step delimiter: group-level wins, else per-feature config,
        else ';' (single source of truth for parser AND mock data)."""
        return (
            self.sequence_delim
            or getattr(self.config, "sequence_delim", ";")
            or ";"
        )

    @property
    def side_inputs(self) -> List[Tuple[str, str]]:
        """[(side, column)] parsed from expressions 'side:column'.

        Grouped-sequence sub-features prefix their sequence-typed
        inputs with ``{sequence_name}__`` (reference feature.py:798-803)
        so they read the flattened sequence column, not the same-named
        plain item column."""
        out = []
        for e in self.expressions:
            if ":" in e:
                side, col = e.split(":", 1)
            else:
                side, col = "", e
            if self.sequence_name and self._is_sequence_input(side, col):
                col = f"{self.sequence_name}__{col}"
            out.append((side, col))
        return out

    @property
    def inputs(self) -> List[str]:
        """Input column names. In FG_NONE mode the column is the feature
        name itself (already encoded); otherwise the expression columns."""
        from torcheasyrec_tpu.protos.data_pb2 import FgMode

        if self._fg_mode == FgMode.FG_NONE:
            return [self.name]
        cols = [c for _, c in self.side_inputs]
        return cols or [self.name]

    @property
    def is_user_side(self) -> bool:
        """ALL inputs must be user-side (reference feature.py:508-517) —
        a mixed user+item feature varies per row and must not be
        deduplicated under INPUT_TILE."""
        sides = [s for s, _ in self.side_inputs]
        return bool(sides) and all(s == "user" for s in sides)

    @property
    def is_item_side(self) -> bool:
        return any(s == "item" for s, _ in self.side_inputs)

    @property
    def data_group(self) -> str:
        return self._data_group

    def set_data_group(self, group: str) -> None:
        self._data_group = group

    # -- defaults ----------------------------------------------------------

    def _fg_encoded_default(self) -> Optional[List[Any]]:
        c = self.config
        dv = getattr(c, "fg_encoded_default_value", "")
        if not dv:
            return None
        if self.is_sparse:
            return [int(x) for x in dv.split(self._multival_sep)]
        return [float(x) for x in dv.split(self._multival_sep)]

    # -- parse -------------------------------------------------------------

    def parse(
        self, input_data: Dict[str, pa.Array], is_training: bool = False
    ) -> Any:
        """Arrow columns -> ParsedData (numpy)."""
        from torcheasyrec_tpu.protos.data_pb2 import FgMode

        if self._fg_mode == FgMode.FG_NONE:
            return self._parse_fg_encoded(input_data)
        return self._parse_fg(input_data, is_training)

    def _input_column(self, input_data: Dict[str, pa.Array]) -> pa.Array:
        col = self.inputs[0]
        if col not in input_data:
            raise KeyError(
                f"feature {self.name}: input column {col!r} missing; "
                f"have {sorted(input_data)[:20]}"
            )
        arr = input_data[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if pa.types.is_null(arr.type):
            # an all-null column arrives as the null type (e.g. a JSON/
            # mock chunk with no values); the string branch handles
            # nulls + defaults uniformly
            arr = arr.cast(pa.string())
        return arr

    def _parse_fg_encoded(self, input_data: Dict[str, pa.Array]) -> Any:
        feat = self._input_column(input_data)
        default = self._fg_encoded_default()
        if self.is_sequence:
            delim = self.effective_sequence_delim
            if self.is_sparse:
                return self._enforce_id_bound(
                    _parse_fg_encoded_sequence_sparse(
                        self.name, feat, delim, self._multival_sep, default
                    )
                )
            return _parse_fg_encoded_sequence_dense(
                self.name, feat, delim, self._multival_sep,
                max(self.value_dim, 1), default,
            )
        if self.is_sparse:
            return self._enforce_id_bound(_parse_fg_encoded_sparse(
                self.name, feat, self._multival_sep, default, self.is_weighted
            ))
        return _parse_fg_encoded_dense(
            self.name, feat, self._multival_sep, default
        )

    def _id_bound(self):
        """Range guard for PRE-ENCODED ids, or None.

        fg-encoded inputs are trusted to be in range, but an id past
        its table's rows would silently read the NEXT table inside the
        engine's fused megatable — corruption, not a crash. zch /
        dynamicemb features carry arbitrary 64-bit ids (remapped
        on-device) and must pass through unbounded.
        """
        if self._id_bound_cache is not _UNSET:
            return self._id_bound_cache
        bound = None
        c = self.config
        is_dynamic = False
        for f in ("zch", "dynamicemb"):
            try:
                if getattr(c, f, None) is not None and c.HasField(f):
                    is_dynamic = True
            except ValueError:
                pass
        if not is_dynamic:
            if getattr(c, "hash_bucket_size", 0):
                # hash semantics: corrupt oversize ids re-wrap
                bound = ("mod", int(c.hash_bucket_size))
            else:
                try:
                    bound = ("clip", int(self.num_embeddings))
                except (ValueError, OSError):
                    bound = None
        self._id_bound_cache = bound
        return bound

    def _enforce_id_bound(self, parsed):
        bound = self._id_bound()
        v = parsed.values
        if bound is None or v.size == 0 or int(v.max()) < bound[1]:
            return parsed
        mode, n = bound
        if mode == "mod":
            v = np.where(v >= n, v % n, v)
        else:
            v = np.where(v >= n, n - 1, v)
        return dataclasses.replace(parsed, values=v)

    def _parse_fg(self, input_data: Dict[str, pa.Array], is_training: bool) -> Any:
        """FG_NORMAL python feature generation; subclasses override."""
        raise NotImplementedError(
            f"{type(self).__name__} does not implement FG_NORMAL parsing yet; "
            f"use fg_mode: FG_NONE"
        )

    # -- vocab / bucketize helpers for FG_NORMAL subclasses ----------------

    def vocab_table_and_oov(self):
        """(token→id table, oov id) when this feature maps through a
        vocab (list/dict/file), else None — the ONE place the vocab
        mapping semantics live (used by _vocab_to_ids and the native
        FG DAG kernel)."""
        c = self.config
        has_dbv = _has_field_safe(c, "default_bucketize_value")
        default_bkt = int(getattr(c, "default_bucketize_value", 0) or 0)
        if len(getattr(c, "vocab_list", [])):
            if has_dbv:
                # raw positions, OOV -> default_bucketize_value (matches
                # the reference/pyfg layout when dbv is configured)
                return {t: i for i, t in enumerate(c.vocab_list)}, default_bkt
            # reference vocab_list property: effective vocab =
            # [default_value, '<OOV>'] + vocab_list, so the
            # configured default maps to 0, OOV to 1, tokens to i+2
            table = {t: i + 2 for i, t in enumerate(c.vocab_list)}
            dv = str(getattr(c, "default_value", "") or "")
            if dv:
                table.setdefault(dv, 0)
            return table, 1
        if len(getattr(c, "vocab_dict", {})):
            table = dict(c.vocab_dict)
            if not has_dbv:
                # reference vocab_dict property: default_value -> 0,
                # OOV -> default_bucketize_value (which defaults to 1)
                dv = str(getattr(c, "default_value", "") or "")
                if dv:
                    table[dv] = 0
                return table, 1
            return table, default_bkt
        if getattr(c, "vocab_file", ""):
            # reference requires default_bucketize_value for vocab_file
            # and uses raw file indices; OOV -> dbv (default 1)
            return self._load_vocab_file(), (
                default_bkt if has_dbv else 1
            )
        return None

    def _vocab_to_ids(self, tokens: np.ndarray) -> np.ndarray:
        c = self.config
        got = self.vocab_table_and_oov()
        if got is not None:
            return self._map_vocab(got[0], tokens, got[1])
        if getattr(c, "hash_bucket_size", 0):
            from torcheasyrec_tpu import fg as fg_native

            return fg_native.hash_strings_mod(
                tokens, int(c.hash_bucket_size)
            )
        if getattr(c, "num_buckets", 0):
            arr = np.asarray(
                [int(t) if str(t) not in ("", "None") else 0 for t in tokens],
                dtype=np.int64,
            )
            return np.clip(arr, 0, int(c.num_buckets) - 1)
        raise ValueError(f"feature {self.name}: no id-mapping config")

    _vocab_cache: Optional[Dict[str, int]] = None
    _vocab_arr_cache = None

    def _map_vocab(self, table, tokens, oov: int) -> np.ndarray:
        """Vectorized token→id mapping: binary search over the sorted
        key array (no per-token python; same semantics as
        ``table.get(str(t), oov)``). The sorted arrays are cached —
        the table is config-derived and identical every call."""
        cache = self._vocab_arr_cache
        if cache is None:
            keys = np.array([str(k) for k in table], dtype=np.str_)
            vals = np.array(list(table.values()), dtype=np.int64)
            order = np.argsort(keys)
            cache = (keys[order], vals[order])
            self._vocab_arr_cache = cache
        keys, vals = cache
        if not len(tokens) or not len(keys):
            return np.full((len(tokens),), oov, np.int64)
        toks = np.asarray(tokens).astype(np.str_)
        pos = np.searchsorted(keys, toks)
        pos = np.minimum(pos, len(keys) - 1)
        match = keys[pos] == toks
        return np.where(match, vals[pos], oov)

    def _load_vocab_file(self) -> Dict[str, int]:
        """'token' lines map to their 0-based position; 'token index'
        lines to the explicit index (reference vocab_file_size,
        feature.py:1127-1143 — raw indices, no offset)."""
        if self._vocab_cache is None:
            table: Dict[str, int] = {}
            with open(self.config.vocab_file) as f:
                for i, line in enumerate(f):
                    parts = line.strip().split(maxsplit=1)
                    if not parts or not parts[0]:
                        continue
                    if len(parts) > 1:
                        table[parts[0]] = int(parts[1])
                    else:
                        table[parts[0]] = i
            self._vocab_cache = table
        return self._vocab_cache

    def _bucketize(self, vals: np.ndarray) -> np.ndarray:
        from torcheasyrec_tpu import fg as fg_native

        boundaries = np.asarray(list(self.config.boundaries), dtype=np.float64)
        return fg_native.bucketize(vals, boundaries)

    # -- fg json (serving contract, reference feature.py:997-1015) ---------

    def fg_json(self) -> Dict[str, Any]:
        # grouped sub-features keep their BARE name (the group carries the
        # prefixing); standalone sequence features keep the sequence_ type
        # and per-feature delim/length (reference feature.py:997-1012)
        out = {
            "feature_name": (
                self.config.feature_name if self.sequence_name
                else self.name
            ),
            "feature_type": (
                self._oneof_name if self._is_seq_oneof
                else self._oneof_name.replace("sequence_", "")
            ),
        }
        if self._is_seq_oneof:
            out["sequence_delim"] = getattr(
                self.config, "sequence_delim", ";"
            )
            if self.effective_sequence_length:
                out["sequence_length"] = self.effective_sequence_length
        if self.is_sequence and not getattr(
            self.config, "default_value", ""
        ):
            # pyfg asserts a non-empty default for sequence features
            # (reference feature.py:997-1011)
            out["default_value"] = "0"
        c = self.config
        if out["feature_type"] == "expr_feature":
            # pyfg expr format: "expression" = the FORMULA, inputs ride
            # in "variables" (emitted below)
            out["expression"] = getattr(c, "expression", "")
        else:
            exprs = self.expressions
            if len(exprs) == 1:
                out["expression"] = exprs[0]
            elif exprs:
                out["expression"] = exprs
        for field in (
            "default_value", "separator", "hash_bucket_size", "num_buckets",
            "value_dim", "embedding_dim",
            # serve-time transforms the online FG must replay: numeric
            # normalizers, map/lookup keys, overlap method
            "normalizer", "map", "key", "method", "vocab_file",
        ):
            v = getattr(c, field, None)
            if v:
                out[field] = v if not hasattr(v, "__len__") or isinstance(
                    v, (str, bytes)
                ) else list(v)
        if len(getattr(c, "boundaries", [])):
            out["boundaries"] = list(c.boundaries)
        if len(getattr(c, "vocab_list", [])):
            out["vocab_list"] = list(c.vocab_list)
        if len(getattr(c, "variables", [])):
            out["variables"] = list(c.variables)
        # pyfg match format names the nested-map keys user/category/item
        if out["feature_type"] == "match_feature":
            for src, dst in (("nested_map", "user"), ("pkey", "category"),
                             ("skey", "item")):
                v = getattr(c, src, "")
                if v:
                    out[dst] = v
        return out


def create_features(
    feature_configs: List[Any],
    fg_mode: int = 1,
    fg_encoded_multival_sep: Optional[str] = None,
    neg_fields: Optional[List[str]] = None,
) -> List[BaseFeature]:
    """Build feature objects from FeatureConfig protos.

    Grouped SequenceFeature configs expand into per-sub-feature objects
    named ``{sequence_name}__{sub_name}`` (reference feature.py:1186-1212).
    Features whose item-side input is served by the negative sampler are
    assigned the __NEG__ data group (reference feature.py:416,479-493).
    """
    from torcheasyrec_tpu.protos.data_pb2 import FgMode  # noqa: F401

    features: List[BaseFeature] = []
    for cfg in feature_configs:
        oneof = cfg.WhichOneof("feature")
        if oneof == "sequence_feature":
            seq_cfg = cfg.sequence_feature
            for sub in seq_cfg.features:
                sub_oneof = sub.WhichOneof("feature")
                cls_name = _oneof_to_class(sub_oneof)
                feat = BaseFeature.create_class(cls_name)(
                    sub, fg_mode, fg_encoded_multival_sep
                )
                feat.sequence_name = seq_cfg.sequence_name
                feat.sequence_delim = seq_cfg.sequence_delim
                feat.sequence_length = int(seq_cfg.sequence_length)
                feat.sequence_pk = seq_cfg.sequence_pk or None
                features.append(feat)
        else:
            cls_name = _oneof_to_class(oneof.replace("sequence_", ""))
            feat = BaseFeature.create_class(cls_name)(
                cfg, fg_mode, fg_encoded_multival_sep
            )
            features.append(feat)

    if neg_fields:
        for feat in features:
            inputs = set(feat.inputs)
            if feat.is_item_side or inputs & set(neg_fields):
                feat.set_data_group(NEG_DATA_GROUP)
    return features


def _has_field_safe(msg, name: str) -> bool:
    try:
        return msg.HasField(name)
    except ValueError:
        return False


def _oneof_to_class(oneof: str) -> str:
    """id_feature -> IdFeature etc."""
    return "".join(p.capitalize() for p in oneof.split("_"))


def create_fg_json(features: List[BaseFeature]) -> Dict[str, Any]:
    """Emit the serving-side fg.json (reference feature.py:1318)."""
    out: Dict[str, Any] = {"features": []}
    seq_groups: Dict[str, Dict[str, Any]] = {}
    for f in features:
        if f.sequence_name:
            g = seq_groups.setdefault(
                f.sequence_name,
                {
                    "sequence_name": f.sequence_name,
                    "sequence_length": f.sequence_length,
                    "sequence_delim": f.sequence_delim,
                    **(
                        {"sequence_pk": f.sequence_pk}
                        if getattr(f, "sequence_pk", None) else {}
                    ),
                    "features": [],
                },
            )
            g["features"].append(f.fg_json())
        else:
            out["features"].append(f.fg_json())
    out["features"].extend(seq_groups.values())
    return out
