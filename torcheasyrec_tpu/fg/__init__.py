"""Native feature-generation library loader (pyfg equivalent).

Builds csrc/fg_ops.cc into a shared library on first use (g++ is in the
image; see csrc/fg_ops.cc for the op inventory) and exposes ctypes
wrappers. Every entry point has a numpy fallback so the package works
without a toolchain; `available()` reports which path is active.
"""

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_LOCK = threading.Lock()
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "fg_ops.cc")
_SO = os.path.join(os.path.dirname(__file__), "csrc", "libfg_ops.so")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.fg_hash64_strings_mod.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.fg_bucketize.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ]
        lib.fg_split_hash.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_char, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fg_split_hash.restype = ctypes.c_int64
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


_FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV64_PRIME = np.uint64(0x100000001B3)


def _np_hash_mod(tokens, num_buckets: int) -> np.ndarray:
    out = np.empty(len(tokens), dtype=np.int64)
    nb = np.uint64(num_buckets)
    for i, t in enumerate(tokens):
        h = int(_FNV64_OFFSET)
        for b in str(t).encode("utf-8"):
            h = ((h ^ b) * int(_FNV64_PRIME)) & 0xFFFFFFFFFFFFFFFF
        out[i] = h % int(nb)
    return out


def hash_strings_mod(tokens, num_buckets: int, threads: int = 4) -> np.ndarray:
    """FNV-1a hash of each token modulo num_buckets -> int64 [n]."""
    lib = _load()
    n = len(tokens)
    if lib is None or n == 0:
        return _np_hash_mod(tokens, num_buckets)
    encoded = [str(t).encode("utf-8") for t in tokens]
    offsets = np.zeros(n + 1, np.int32)
    np.cumsum([len(e) for e in encoded], out=offsets[1:])
    data = b"".join(encoded)
    out = np.empty(n, np.int64)
    lib.fg_hash64_strings_mod(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data,
        ctypes.c_int64(n),
        ctypes.c_uint64(num_buckets),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(threads),
    )
    return out


def hash_ints_mod(values: np.ndarray, num_buckets: int,
                  threads: int = 4) -> np.ndarray:
    """FNV-1a hash of each integer's DECIMAL string mod num_buckets ->
    int64 [n] (identical bytes to ``hash_strings_mod(str(v))``)."""
    values = np.ascontiguousarray(values, np.int64)
    lib = _load()
    if lib is None or len(values) == 0:
        return _np_hash_mod(values.tolist(), num_buckets)
    if not hasattr(lib, "_ints_mod_configured"):
        lib.fg_hash64_ints_mod.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int,
        ]
        lib._ints_mod_configured = True
    out = np.empty(len(values), np.int64)
    lib.fg_hash64_ints_mod(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(values)),
        ctypes.c_uint64(num_buckets),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(threads),
    )
    return out


def bucketize(values: np.ndarray, boundaries: np.ndarray,
              threads: int = 4) -> np.ndarray:
    """searchsorted-right of values into boundaries -> int64 [n]."""
    lib = _load()
    values = np.ascontiguousarray(values, np.float64)
    boundaries = np.ascontiguousarray(boundaries, np.float64)
    if lib is None or len(values) == 0:
        return np.searchsorted(boundaries, values, side="right").astype(
            np.int64
        )
    out = np.empty(len(values), np.int64)
    lib.fg_bucketize(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(values)),
        boundaries.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(len(boundaries)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int(threads),
    )
    return out


def split_hash_arrow(str_array, sep: str, num_buckets: int):
    """Split an Arrow string array on `sep` and FNV-hash each token
    mod num_buckets, entirely in C++ (the pyfg multi-value hot path).
    Returns (values int64 [n_tokens], lengths int32 [n]) or None when
    the native lib is unavailable / layout unsupported."""
    lib = _load()
    if lib is None or len(sep) != 1:
        return None
    import pyarrow as pa

    if isinstance(str_array, pa.ChunkedArray):
        str_array = str_array.combine_chunks()
    if not pa.types.is_string(str_array.type):
        return None
    buffers = str_array.buffers()  # [validity, offsets, data]
    if buffers[1] is None:
        return None
    n = len(str_array)
    arr_off = str_array.offset
    offsets = np.frombuffer(
        buffers[1], dtype=np.int32, count=n + 1 + arr_off
    )[arr_off:]
    data = bytes(buffers[2]) if buffers[2] is not None else b""
    max_tokens = max(int(offsets[-1] - offsets[0]), 1)
    out_vals = np.empty(max_tokens, np.int64)
    out_lengths = np.zeros(n, np.int32)
    offsets = np.ascontiguousarray(offsets)
    total = lib.fg_split_hash(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data,
        ctypes.c_int64(n),
        ctypes.c_char(sep.encode("latin-1")),
        ctypes.c_uint64(num_buckets),
        out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(max_tokens),
        out_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if total < 0:
        return None
    # honor validity (null rows -> 0 tokens)
    if buffers[0] is not None and str_array.null_count:
        nulls = np.asarray(str_array.is_null())
        if nulls.any():
            # rebuild excluding null rows' tokens
            keep_rows = ~nulls
            starts = np.concatenate([[0], np.cumsum(out_lengths)])
            pieces = [
                out_vals[starts[i]:starts[i + 1]]
                for i in range(n) if keep_rows[i]
            ]
            vals = (np.concatenate(pieces) if pieces
                    else np.zeros(0, np.int64))
            out_lengths = np.where(nulls, 0, out_lengths).astype(np.int32)
            return vals, out_lengths
    return out_vals[:total], out_lengths


def seq_split_hash_arrow(str_array, seq_delim: str, sep: str,
                         num_buckets: int):
    """Two-level split (steps on seq_delim, tokens on sep) + FNV hash of
    each token mod num_buckets, in C++ (the sequence-feature hot path).
    Returns (values int64 [n_tokens], tok_lengths int32 [n_steps],
    seq_lengths int32 [n]) or None when unsupported. Rows must be
    pre-filled (no nulls); empty rows -> 0 steps; empty steps between
    delimiters contribute 0 tokens."""
    lib = _load()
    if lib is None or len(seq_delim) != 1 or len(sep) != 1:
        return None
    import pyarrow as pa

    if isinstance(str_array, pa.ChunkedArray):
        str_array = str_array.combine_chunks()
    if not pa.types.is_string(str_array.type) or str_array.null_count:
        return None
    if not hasattr(lib, "_seq_configured"):
        lib.fg_seq_split_hash.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_char, ctypes.c_char,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fg_seq_split_hash.restype = ctypes.c_int64
        lib._seq_configured = True
    buffers = str_array.buffers()
    if buffers[1] is None:
        return None
    n = len(str_array)
    arr_off = str_array.offset
    offsets = np.ascontiguousarray(np.frombuffer(
        buffers[1], dtype=np.int32, count=n + 1 + arr_off
    )[arr_off:])
    data = bytes(buffers[2]) if buffers[2] is not None else b""
    cap = max(int(offsets[-1] - offsets[0]), 1)
    out_vals = np.empty(cap, np.int64)
    out_lengths = np.zeros(cap, np.int32)
    out_seq_lengths = np.zeros(n, np.int32)
    total = lib.fg_seq_split_hash(
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data, ctypes.c_int64(n),
        ctypes.c_char(seq_delim.encode("latin-1")),
        ctypes.c_char(sep.encode("latin-1")),
        ctypes.c_uint64(num_buckets),
        out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(cap),
        out_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(cap),
        out_seq_lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if total < 0:
        return None
    n_steps = int(out_seq_lengths.sum())
    return out_vals[:total], out_lengths[:n_steps], out_seq_lengths
