"""Named shared-memory packs of numpy arrays.

One segment holds many arrays (header: pickled {name: (dtype, shape,
offset)}); builders create + write once, attachers get zero-copy numpy
views. Used by the samplers to share read-only item/alias tables across
mp-loader workers — the reference instead runs one graphlearn server
per host with gRPC clients (/root/reference/tzrec/datasets/sampler.py:
134-142,322-335); here one shm segment per host serves every worker
with no serialization at all.
"""

import atexit
import pickle
import struct
from multiprocessing import shared_memory
from typing import Dict, Tuple

import numpy as np

_HDR = struct.Struct("<Q")  # header length
_OWNED: Dict[str, shared_memory.SharedMemory] = {}


def _attach_buf(name: str):
    """mmap an existing segment WITHOUT SharedMemory: attaching through
    multiprocessing registers with the (fork-shared) resource tracker
    and unbalances the owner's unlink bookkeeping (python<3.13 has no
    track=False). POSIX shm segments are plain files under /dev/shm."""
    import mmap
    import os

    try:
        fd = os.open(f"/dev/shm/{name}", os.O_RDWR)
    except FileNotFoundError:
        # non-Linux POSIX (e.g. macOS) has no /dev/shm: fall back to
        # multiprocessing attach and accept the resource-tracker quirk
        # (worst case a benign unlink warning at exit)
        seg = shared_memory.SharedMemory(name=name)
        _OWNED.setdefault(f"__attached__{name}", seg)
        return seg.buf
    try:
        size = os.fstat(fd).st_size
        return mmap.mmap(fd, size)
    finally:
        os.close(fd)


def build(name: str, arrays: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Create segment ``name`` holding ``arrays``; returns views into it.

    The segment persists until :func:`unlink` (or process exit via
    atexit). Rebuilding an existing name replaces it.
    """
    unlink(name)
    meta: Dict[str, Tuple[str, tuple, int]] = {}
    off = 0
    for k, a in arrays.items():
        a = np.ascontiguousarray(a)
        arrays[k] = a
        meta[k] = (a.dtype.str, a.shape, off)
        off += a.nbytes
    header = pickle.dumps(meta)
    base = _HDR.size + len(header)
    shm = shared_memory.SharedMemory(
        create=True, size=max(base + off, 1), name=name
    )
    shm.buf[: _HDR.size] = _HDR.pack(len(header))
    shm.buf[_HDR.size : base] = header
    views: Dict[str, np.ndarray] = {}
    for k, a in arrays.items():
        dt, shape, o = meta[k]
        v = np.ndarray(shape, dtype=dt, buffer=shm.buf, offset=base + o)
        v[...] = a
        views[k] = v
    _OWNED[name] = shm
    return views


def attach(name: str) -> Dict[str, np.ndarray]:
    """Zero-copy numpy views of an existing segment."""
    buf = _OWNED[name].buf if name in _OWNED else _attach_buf(name)
    (hlen,) = _HDR.unpack_from(buf, 0)
    meta = pickle.loads(bytes(buf[_HDR.size : _HDR.size + hlen]))
    base = _HDR.size + hlen
    return {
        k: np.ndarray(shape, dtype=dt, buffer=buf, offset=base + o)
        for k, (dt, shape, o) in meta.items()
    }


def unlink(name: str) -> None:
    shm = _OWNED.pop(name, None)
    if shm is not None:
        try:
            shm.close()
            shm.unlink()
        except Exception:  # noqa: BLE001
            pass
        return
    try:
        shm = shared_memory.SharedMemory(name=name)
        shm.close()
        shm.unlink()
    except FileNotFoundError:
        pass
    except Exception:  # noqa: BLE001
        pass


def _cleanup() -> None:
    for name in [n for n in _OWNED if not n.startswith("__attached__")]:
        unlink(name)


atexit.register(_cleanup)
