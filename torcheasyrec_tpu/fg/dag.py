"""Native FG DAG: whole-batch feature generation in one C++ call.

The pyfg-equivalent executor (reference tzrec/features/feature.py:979-995
drives the closed-source FgArrowHandler over every feature of a batch in
C++): here each eligible feature becomes one ``FgTask`` in a task array
drained by the C++ worker pool (``fg_run_dag`` in csrc/fg_ops.cc), so a
wide model's id/raw/combo/lookup transforms run concurrently off the
GIL. Features outside the native op inventory (vocab maps, sequences,
weighted ids, expr, ...) keep their python ``_parse_fg`` path per
feature — the DAG returns only the names it handled.
"""

import ctypes
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from torcheasyrec_tpu.fg import _load

KIND_ID_HASH = 0
KIND_COMBO_HASH = 1
KIND_RAW = 2
KIND_KV_LOOKUP = 3
KIND_MATCH_LOOKUP = 4
KIND_OVERLAP = 5
KIND_KV_DOT = 6
KIND_ID_VOCAB = 7
_OVERLAP_METHODS = ("query_common_ratio", "title_common_ratio",
                    "is_contain", "is_equal")

_PTR_I32 = ctypes.POINTER(ctypes.c_int32)


class _FgTask(ctypes.Structure):
    # layout mirrors FgTask in csrc/fg_ops.cc
    _fields_ = [
        ("offsets", ctypes.c_void_p * 4),
        ("data", ctypes.c_void_p * 4),
        ("fvals", ctypes.c_void_p),
        ("boundaries", ctypes.c_void_p),
        ("out_vals", ctypes.c_void_p),
        ("out_fvals", ctypes.c_void_p),
        ("out_lengths", ctypes.c_void_p),
        ("n_rows", ctypes.c_int64),
        ("n_bounds", ctypes.c_int64),
        ("max_tokens", ctypes.c_int64),
        ("out_total", ctypes.c_int64),
        ("num_buckets", ctypes.c_uint64),
        ("norm_threshold", ctypes.c_double),
        ("norm_default", ctypes.c_double),
        ("default_fval", ctypes.c_double),
        ("kind", ctypes.c_int32),
        ("n_inputs", ctypes.c_int32),
        ("normalizer", ctypes.c_int32),
        ("status", ctypes.c_int32),
        ("sep", ctypes.c_int32),
        ("_pad", ctypes.c_int32),
        ("aux_vals", ctypes.c_void_p),
        ("n_aux", ctypes.c_int64),
        ("oov_val", ctypes.c_int64),
    ]


def _np_addr(a: np.ndarray) -> int:
    return a.ctypes.data


def _string_buffers(arr: pa.Array) -> Optional[Tuple[np.ndarray, Any]]:
    """Arrow string array -> (absolute offsets int32 [n+1], data bytes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        return None
    bufs = arr.buffers()
    if bufs[1] is None:
        return None
    off = np.frombuffer(
        bufs[1], dtype=np.int32, count=len(arr) + 1 + arr.offset
    )[arr.offset:]
    data = bytes(bufs[2]) if bufs[2] is not None else b""
    return np.ascontiguousarray(off), data


def _prep_string_col(arr: pa.Array, default: str = "") -> pa.Array:
    """Cast to string; empty stays empty (0 tokens) unless a default is
    configured, matching the python FG_NORMAL paths."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type):
        arr = arr.cast(pa.string(), safe=False)
    if default:
        empty = pc.equal(arr, pa.scalar(""))
        arr = pc.if_else(empty, pa.nulls(len(arr), pa.string()), arr)
        arr = arr.fill_null(default)
    else:
        arr = arr.fill_null("")
    return arr


def _parse_log10(normalizer: str) -> Optional[Tuple[float, float]]:
    """'method=log10,threshold=1e-10,default=-10' -> (threshold, default)."""
    if not normalizer:
        return None
    kv = {}
    for part in normalizer.split(","):
        if "=" in part:
            k, v = part.split("=", 1)
            kv[k.strip()] = v.strip()
    if kv.get("method") != "log10":
        return None
    return float(kv.get("threshold", 1e-10)), float(kv.get("default", -10))


class FgDag:
    """Partition features into native tasks vs python fallback."""

    def __init__(self, features: List[Any], threads: int = 1) -> None:
        self._threads = threads
        self._lib = _load()
        self._native: List[Any] = []
        self._vocab_blobs: dict = {}  # feature -> sorted vocab buffers
        if self._lib is None:
            return
        if not hasattr(self._lib, "fg_run_dag_configured"):
            self._lib.fg_run_dag.argtypes = [
                ctypes.POINTER(_FgTask), ctypes.c_int64, ctypes.c_int,
            ]
            self._lib.fg_run_dag.restype = ctypes.c_int
            self._lib.fg_run_dag_configured = True
        from torcheasyrec_tpu.protos.data_pb2 import FgMode

        for f in features:
            if f._fg_mode == FgMode.FG_NONE:
                continue
            if self._eligible(f):
                self._native.append(f)
        self._native_names = {f.name for f in self._native}

    @staticmethod
    def _eligible(f: Any) -> bool:
        c = f.config
        tname = type(f).__name__
        if getattr(f, "is_sequence", False):
            return False
        if tname == "IdFeature":
            base_ok = (
                not getattr(f, "is_weighted", False)
                and not c.HasField("zch")
                and not c.HasField("dynamicemb")
            )
            if int(getattr(c, "hash_bucket_size", 0)) > 0:
                return base_ok and len(
                    getattr(c, "separator", "\x1d") or "\x1d"
                ) == 1
            # vocab mapping: whole-cell token -> sorted-key bsearch
            return base_ok and f.vocab_table_and_oov() is not None
        if tname == "ComboFeature":
            return (
                int(getattr(c, "hash_bucket_size", 0)) > 0
                and 2 <= len(f.side_inputs) <= 4
            )
        if tname == "RawFeature":
            if max(getattr(f, "value_dim", 1), 1) != 1:
                return False
            norm = getattr(c, "normalizer", "")
            if norm and _parse_log10(norm) is None:
                return False
            return c.WhichOneof("dense_emb") is None
        if tname == "LookupFeature":
            # dense single-value kv lookup (sparse id-mapping variants
            # keep the python path)
            return (
                not f.is_sparse
                and max(getattr(f, "value_dim", 1), 1) <= 1
                and len(f.side_inputs) >= 2
                and len(getattr(c, "separator", "\x1d") or "\x1d") == 1
            )
        if tname == "MatchFeature":
            # dense nested pk^k:v,...|... lookup (fixed separators);
            # sparse id-mapping variants keep the python path
            return (
                not f.is_sparse
                and max(getattr(f, "value_dim", 1), 1) <= 1
                and len(f.side_inputs) >= 3
            )
        if tname == "OverlapFeature":
            return (
                getattr(c, "method", "") in _OVERLAP_METHODS
                and len(f.side_inputs) >= 2
                and len(getattr(c, "separator", "\x1d") or "\x1d") == 1
            )
        if tname == "KvDotProduct":
            return (
                len(f.side_inputs) >= 2
                and len(getattr(c, "separator", "\x1d") or "\x1d") == 1
            )
        return False

    def handles(self, name: str) -> bool:
        return name in getattr(self, "_native_names", set())

    def parse(
        self, input_data: Dict[str, pa.Array], is_training: bool = False
    ) -> Dict[str, Any]:
        """Run all native tasks in one fg_run_dag call; returns
        {feature_name: ParsedData}. Features whose task construction or
        execution fails fall back to their python parse."""
        if not self._native:
            return {}
        from torcheasyrec_tpu.features.feature import (
            DenseData,
            SparseData,
        )

        tasks = (_FgTask * len(self._native))()
        keepalive: List[Any] = []
        built: List[Optional[Any]] = []
        for ti, f in enumerate(self._native):
            try:
                built.append(
                    self._build_task(tasks[ti], f, input_data, keepalive)
                )
            except Exception:  # noqa: BLE001 - any failure -> python path
                tasks[ti].kind = -1  # executor skips (status=-2)
                built.append(None)
        run = [i for i, b in enumerate(built) if b is not None]
        if run:
            self._lib.fg_run_dag(
                tasks, ctypes.c_int64(len(self._native)),
                ctypes.c_int(self._threads),
            )
        out: Dict[str, Any] = {}
        for ti, f in enumerate(self._native):
            b = built[ti]
            t = tasks[ti]
            if b is None or t.status != 0:
                out[f.name] = f.parse(input_data, is_training)
                continue
            kind, n, out_vals, out_fvals, out_lengths = b
            if kind in (KIND_ID_HASH, KIND_COMBO_HASH,
                        KIND_ID_VOCAB) or (
                kind in (KIND_RAW, KIND_OVERLAP, KIND_KV_DOT)
                and t.n_bounds > 0
            ):
                out[f.name] = SparseData(
                    f.name, out_vals[: t.out_total], out_lengths, None
                )
            else:
                out[f.name] = DenseData(
                    f.name, out_fvals.reshape(n, 1).astype(np.float32)
                )
        return out

    def _build_task(self, t, f, input_data, keepalive):
        c = f.config
        tname = type(f).__name__
        cols = [col for _, col in f.side_inputs] or [f.name]
        n = None
        str_cols = []
        if tname == "RawFeature":
            arr = input_data[cols[0]]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            n = len(arr)
            if pa.types.is_floating(arr.type) or pa.types.is_integer(
                arr.type
            ):
                dflt = float(getattr(c, "default_value", "0") or 0)
                fv = np.ascontiguousarray(
                    arr.cast(pa.float64(), safe=False)
                    .fill_null(dflt)
                    .to_numpy(zero_copy_only=False)
                )
                keepalive.append(fv)
                t.fvals = _np_addr(fv)
            else:
                str_cols = [_prep_string_col(arr)]
        else:
            str_cols = [
                _prep_string_col(
                    input_data[col],
                    str(getattr(c, "default_value", "") or "")
                    if tname == "IdFeature" else "",
                )
                for col in cols
            ]
            n = len(str_cols[0])

        for j, sc in enumerate(str_cols):
            got = _string_buffers(sc)
            if got is None:
                raise ValueError("unsupported column layout")
            off, data = got
            keepalive.append(off)
            keepalive.append(data)
            t.offsets[j] = _np_addr(off)
            t.data[j] = ctypes.cast(
                ctypes.c_char_p(data), ctypes.c_void_p
            ).value or 0

        t.n_rows = n
        t.n_inputs = max(len(str_cols), 1)
        out_lengths = np.zeros(n, np.int32)
        keepalive.append(out_lengths)
        t.out_lengths = _np_addr(out_lengths)

        if tname == "IdFeature" and not int(
            getattr(c, "hash_bucket_size", 0)
        ):
            # vocab path. Nulls are only representable when a
            # default_value fills them (the python path DROPS null rows
            # while genuine "" maps to oov) — else python fallback.
            raw = input_data[cols[0]]
            nulls = (
                raw.null_count if hasattr(raw, "null_count") else 0
            )
            if nulls and not str(getattr(c, "default_value", "") or ""):
                raise ValueError("null vocab cells need default_value")
            blob = self._vocab_blobs.get(f.name)
            if blob is None:
                table, oov = f.vocab_table_and_oov()
                table = {str(k): int(v) for k, v in table.items()}
                keys = sorted(table)
                enc = [k.encode("utf-8") for k in keys]
                off = np.zeros(len(enc) + 1, np.int32)
                np.cumsum([len(e) for e in enc], out=off[1:])
                data = b"".join(enc)
                vals = np.asarray(
                    [int(table[k]) for k in keys], np.int64
                )
                blob = (off, data, vals, int(oov))
                self._vocab_blobs[f.name] = blob
            off, data, vals, oov = blob
            t.kind = KIND_ID_VOCAB
            t.offsets[1] = _np_addr(off)
            t.data[1] = ctypes.cast(
                ctypes.c_char_p(data), ctypes.c_void_p
            ).value or 0
            keepalive.append(off)
            keepalive.append(data)
            keepalive.append(vals)
            t.aux_vals = _np_addr(vals)
            t.n_aux = len(vals)
            t.oov_val = oov
            out_vals = np.empty(n, np.int64)
            keepalive.append(out_vals)
            t.out_vals = _np_addr(out_vals)
            t.max_tokens = n
            return (KIND_ID_VOCAB, n, out_vals, None, out_lengths)

        if tname == "IdFeature":
            t.kind = KIND_ID_HASH
            t.num_buckets = int(c.hash_bucket_size)
            sep = (getattr(c, "separator", "\x1d") or "\x1d")[0]
            t.sep = ord(sep)
            got = _string_buffers(str_cols[0])
            max_tokens = max(int(got[0][-1] - got[0][0]), 1)
            out_vals = np.empty(max_tokens, np.int64)
            keepalive.append(out_vals)
            t.out_vals = _np_addr(out_vals)
            t.max_tokens = max_tokens
            return (KIND_ID_HASH, n, out_vals, None, out_lengths)

        if tname == "ComboFeature":
            t.kind = KIND_COMBO_HASH
            t.num_buckets = int(c.hash_bucket_size)
            out_vals = np.empty(n, np.int64)
            keepalive.append(out_vals)
            t.out_vals = _np_addr(out_vals)
            t.max_tokens = n
            return (KIND_COMBO_HASH, n, out_vals, None, out_lengths)

        if tname == "OverlapFeature":
            t.kind = KIND_OVERLAP
            t.sep = ord((getattr(c, "separator", "\x1d") or "\x1d")[0])
            t.normalizer = _OVERLAP_METHODS.index(c.method)
            bounds = np.ascontiguousarray(list(c.boundaries), np.float64)
            out_vals = None
            out_fvals = None
            if len(bounds):
                keepalive.append(bounds)
                t.boundaries = _np_addr(bounds)
                t.n_bounds = len(bounds)
                out_vals = np.empty(n, np.int64)
                keepalive.append(out_vals)
                t.out_vals = _np_addr(out_vals)
                out_lengths[:] = 1
            else:
                out_fvals = np.empty(n, np.float32)
                keepalive.append(out_fvals)
                t.out_fvals = _np_addr(out_fvals)
            return (KIND_OVERLAP, n, out_vals, out_fvals, out_lengths)

        if tname == "KvDotProduct":
            t.kind = KIND_KV_DOT
            t.sep = ord((getattr(c, "separator", "\x1d") or "\x1d")[0])
            bounds = np.ascontiguousarray(list(c.boundaries), np.float64)
            out_vals = None
            out_fvals = None
            if len(bounds):
                keepalive.append(bounds)
                t.boundaries = _np_addr(bounds)
                t.n_bounds = len(bounds)
                out_vals = np.empty(n, np.int64)
                keepalive.append(out_vals)
                t.out_vals = _np_addr(out_vals)
                out_lengths[:] = 1
            else:
                out_fvals = np.empty(n, np.float32)
                keepalive.append(out_fvals)
                t.out_fvals = _np_addr(out_fvals)
            return (KIND_KV_DOT, n, out_vals, out_fvals, out_lengths)

        if tname == "MatchFeature":
            t.kind = KIND_MATCH_LOOKUP
            t.default_fval = 0.0  # python path defaults missing keys to 0
            out_fvals = np.empty(n, np.float32)
            keepalive.append(out_fvals)
            t.out_fvals = _np_addr(out_fvals)
            return (KIND_MATCH_LOOKUP, n, None, out_fvals, out_lengths)

        if tname == "LookupFeature":
            t.kind = KIND_KV_LOOKUP
            t.sep = ord((getattr(c, "separator", "\x1d") or "\x1d")[0])
            t.default_fval = 0.0  # python path defaults missing keys to 0
            out_fvals = np.empty(n, np.float32)
            keepalive.append(out_fvals)
            t.out_fvals = _np_addr(out_fvals)
            return (KIND_KV_LOOKUP, n, None, out_fvals, out_lengths)

        # RawFeature
        t.kind = KIND_RAW
        t.default_fval = float(getattr(c, "default_value", "0") or 0)
        log10 = _parse_log10(getattr(c, "normalizer", ""))
        if log10 is not None:
            t.normalizer = 1
            t.norm_threshold, t.norm_default = log10
        bounds = np.ascontiguousarray(list(c.boundaries), np.float64)
        out_vals = None
        out_fvals = None
        if len(bounds):
            keepalive.append(bounds)
            t.boundaries = _np_addr(bounds)
            t.n_bounds = len(bounds)
            out_vals = np.empty(n, np.int64)
            keepalive.append(out_vals)
            t.out_vals = _np_addr(out_vals)
            out_lengths[:] = 1
        else:
            out_fvals = np.empty(n, np.float32)
            keepalive.append(out_fvals)
            t.out_fvals = _np_addr(out_fvals)
        return (KIND_RAW, n, out_vals, out_fvals, out_lengths)
