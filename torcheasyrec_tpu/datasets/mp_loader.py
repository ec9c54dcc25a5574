"""Multi-process data loading: the torch DataLoader worker-pool
equivalent (reference tzrec/datasets/dataset.py:753-852 uses
``DataLoader(num_workers≈8, persistent_workers=True)``; SURVEY §3.2).

Why processes: the whole host path (Arrow decode -> feature parse ->
batch pack -> H2D serialize) is GIL-bound, so thread-level prefetch
caps the pipeline at the SUM of those costs. Worker processes run
read -> sample -> parse -> pack and hand the consumer a finished wire
buffer (datasets/pack.py); the consumer process only does one
``jax.device_put`` and the jit dispatch per step.

Transport is a per-worker shared-memory slot ring (measured ~10x
cheaper than mp.Queue pickling for ~1 MB batches): the worker copies
the packed wire into a free slot and enqueues a small descriptor; the
consumer copies the slot into a private buffer (a ~0.1 ms memcpy for a
1 MB batch), recycles the slot immediately, and reconstructs the
PackedBatch (plus host-side views for metrics/delta-dump consumers)
from the private copy — so no shm lifetime leaks into user code.

Each worker w of K slices the input with the SAME worker-slice
machinery used for multi-host sharding: global shard
(process_index*K + w) of (process_count*K) — rows stay disjoint across
both hosts and workers.

Start method: fork is cheapest, but fork() in a process that already
initialized a non-CPU jax backend inherits the device client's locked
mutexes/atfork handlers and can deadlock — exactly the situation in the
CLI driver, which builds the model (initializing the TPU client) before
the first dataloader iterator. So the default auto-detects: spawn when
a non-CPU backend is live, fork otherwise (tests, pure-host pipelines).
Spawn workers get a sanitized environment (JAX_PLATFORMS=cpu, device
pool vars cleared) — they only do host work and must never grab the
accelerator. TZREC_MP_START=fork|spawn|forkserver overrides.
"""

import multiprocessing as mp
import os
import pickle
import queue as queue_mod
import time
import traceback
from multiprocessing import shared_memory
from typing import Any, Callable, Iterator, Optional

import numpy as np

from torcheasyrec_tpu.datasets.pack import (
    PackedBatch,
    pack_batch,
    unify_spec,
    unpack_batch,
)


def mp_loader_enabled(data_config: Any, mode: str = "train") -> int:
    """Return the worker count if the mp loader should be used, else 0.

    Opt-in: the proto default for ``num_workers`` (8) intentionally
    does NOT enable it — only an explicitly set ``num_workers`` or
    ``TZREC_MP_LOADER=<n>`` does, so unit tests and small jobs keep the
    simple thread loader. ``TZREC_MP_LOADER=0`` force-disables.
    """
    env = os.environ.get("TZREC_MP_LOADER", "")
    if env != "":
        try:
            return max(int(env), 0)
        except ValueError:
            return 0
    if mode == "predict":
        return 0
    try:
        if data_config.HasField("num_workers"):
            return max(int(data_config.num_workers), 0)
    except Exception:  # noqa: BLE001 - configs without the field
        pass
    return 0


def _pick_start_method() -> str:
    env = os.environ.get("TZREC_MP_START", "")
    if env in ("fork", "spawn", "forkserver"):
        return env
    try:  # non-CPU backend already initialized -> fork may deadlock
        from jax._src import xla_bridge

        backends = getattr(xla_bridge, "_backends", {}) or {}
        if any(p != "cpu" for p in backends):
            return "spawn"
    except Exception:  # noqa: BLE001 - internal layout changed
        pass
    return "fork"


# env vars that would make a spawned worker try to claim the
# accelerator at import time (sitecustomize keys off these)
_DEVICE_ENV_VARS = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE")


class _WorkerRing:
    """Consumer-side view of one worker's shm slot ring."""

    def __init__(self, name: str, nslots: int, slot_bytes: int) -> None:
        self.shm = shared_memory.SharedMemory(name=name)
        self.nslots = nslots
        self.slot_bytes = slot_bytes
        self.view = np.frombuffer(self.shm.buf, np.uint8)

    def slot(self, idx: int, nbytes: int) -> np.ndarray:
        off = idx * self.slot_bytes
        return self.view[off : off + nbytes]

    def close(self) -> None:
        try:
            del self.view
            self.shm.close()
        except BufferError:  # exported views still alive at teardown
            pass


def _worker_main(
    worker_idx: int,
    dataset_factory: Callable[[int], Any],
    dense_bf16: bool,
    nslots: int,
    full_q: Any,
    free_q: Any,
    stop_ev: Any,
) -> None:
    shm = None
    try:
        it = iter(dataset_factory(worker_idx))
        slot_bytes = 0
        view = None
        for batch, info in it:
            if stop_ev.is_set():
                break
            p = pack_batch(batch, dense_bf16=dense_bf16)
            wire = p.wire
            payload = pickle.dumps((p.spec, info), protocol=4)
            if shm is None:
                # size the ring off the first batch with headroom for
                # bucketed-shape growth
                slot_bytes = max(int(wire.nbytes * 2), 1 << 20)
                shm = shared_memory.SharedMemory(
                    create=True, size=nslots * slot_bytes
                )
                view = np.frombuffer(shm.buf, np.uint8)
                full_q.put(
                    ("shm", worker_idx, shm.name, nslots, slot_bytes)
                )
                # lifetime ownership transfers to the consumer (its
                # close() unlinks): drop this process's tracker entry
                # so a spawn worker's own resource_tracker doesn't
                # warn about (and double-unlink) the ring at exit
                try:
                    from multiprocessing import resource_tracker

                    resource_tracker.unregister(
                        shm._name, "shared_memory"
                    )
                except Exception:  # noqa: BLE001 - cosmetic only
                    pass
            if wire.nbytes > slot_bytes:
                # oversized batch: fall back to queue transport
                full_q.put(("big", worker_idx, wire.tobytes(), payload))
                continue
            while not stop_ev.is_set():
                try:
                    slot = free_q.get(timeout=0.2)
                    break
                except queue_mod.Empty:
                    continue
            else:
                break
            off = slot * slot_bytes
            view[off : off + wire.nbytes] = wire
            full_q.put(("b", worker_idx, slot, wire.nbytes, payload))
        full_q.put(("end", worker_idx))
    except BaseException:  # noqa: BLE001 - ship the traceback
        try:
            full_q.put(("err", worker_idx, traceback.format_exc()))
        except Exception:  # noqa: BLE001
            pass
    finally:
        if shm is not None:
            try:
                del view
                shm.close()
            except Exception:  # noqa: BLE001
                pass


class MpBatchLoader:
    """Iterator over (PackedBatch, BatchInfo) produced by worker
    processes. API-compatible with PrefetchIterator (close(),
    device_put_fn applied in __next__ on the consumer side)."""

    def __init__(
        self,
        dataset_factory: Callable[[int], Any],
        num_workers: int,
        dense_bf16: bool = False,
        device_put_fn: Optional[Callable[[Any], Any]] = None,
        nslots: int = 4,
        prefetch: int = 3,
    ) -> None:
        assert num_workers >= 1
        method = _pick_start_method()
        ctx = mp.get_context(method)
        self._device_put_fn = device_put_fn
        self._stop = ctx.Event()
        self._full_q = ctx.Queue()
        self._free_qs = []
        self._procs = []
        self._rings: dict = {}
        self._ended = 0
        self._n = num_workers
        self._finished = False
        self._closed = False
        self._spec_kinds: dict = {}
        saved_env: dict = {}
        if method != "fork":
            # children re-exec python and inherit os.environ as of
            # start(): force host-only jax so workers never touch the
            # accelerator (and never hang on a device pool at import)
            for k in _DEVICE_ENV_VARS:
                saved_env[k] = os.environ.pop(k, None)
            saved_env["JAX_PLATFORMS"] = os.environ.get("JAX_PLATFORMS")
            os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            for w in range(num_workers):
                fq = ctx.Queue()
                for s in range(nslots):
                    fq.put(s)
                self._free_qs.append(fq)
                p = ctx.Process(
                    target=_worker_main,
                    args=(
                        w, dataset_factory, dense_bf16, nslots,
                        self._full_q, fq, self._stop,
                    ),
                    daemon=True,
                )
                p.start()
                self._procs.append(p)
        finally:
            for k, v in saved_env.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        # consumer-side prefetch thread: slot memcpy, spec unpickle,
        # host views, and (crucially) the blocking device_put all run
        # here, overlapped with the main thread's jit dispatch — the
        # same H2D hiding the thread loader gets from its putter thread
        import threading

        self._out_q: Any = queue_mod.Queue(maxsize=max(prefetch, 1))
        self._close_lock = threading.Lock()
        self._close_done = False
        self._consumer = threading.Thread(
            target=self._consume_loop, daemon=True
        )
        self._consumer.start()

    def __iter__(self) -> Iterator:
        return self

    def _put_out(self, item) -> None:
        # bounded put that never blocks forever: a caller that stops
        # iterating without close() leaves the queue full, and the
        # in-thread close() below must still get to run
        while not self._closed:
            try:
                self._out_q.put(item, timeout=0.2)
                return
            except queue_mod.Full:
                continue

    def _consume_loop(self) -> None:
        while not self._closed:
            try:
                item = self._produce_one()
            except StopIteration:
                self._put_out(("stop", None))
                self.close()  # join workers, close+unlink shm
                return
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                self._put_out(("err", e))
                self.close()
                return
            self._put_out(("ok", item))

    def __next__(self):
        if self._finished:
            raise StopIteration
        while True:
            try:
                tag, val = self._out_q.get(timeout=0.5)
                break
            except queue_mod.Empty:
                if self._closed:  # externally closed mid-iteration
                    self._finished = True
                    raise StopIteration from None
                continue
        if tag == "stop":
            self._finished = True
            # the consumer thread runs close() after the sentinel; wait
            # so worker join + shm unlink finish before the caller can
            # exit the process (daemon threads die mid-cleanup otherwise)
            self._consumer.join(timeout=15.0)
            raise StopIteration
        if tag == "err":
            self._finished = True
            self._consumer.join(timeout=15.0)
            raise val
        return val

    def _produce_one(self):
        while True:
            if self._closed:
                raise StopIteration
            try:
                msg = self._full_q.get(timeout=2.0)
            except queue_mod.Empty:
                # fail loudly instead of blocking forever when workers
                # died without reporting (e.g. spawn re-imported a
                # __main__ without the if-__name__ guard)
                dead = [
                    (p.pid, p.exitcode)
                    for p in self._procs
                    if not p.is_alive() and p.exitcode != 0
                ]
                if len(dead) + self._ended >= self._n and dead:
                    raise RuntimeError(
                        f"mp data workers died without reporting "
                        f"(pid, exitcode)={dead}. If using the spawn "
                        f"start method, the program's entry point must "
                        f"be guarded by `if __name__ == '__main__':`."
                    )
                continue
            tag = msg[0]
            if tag == "shm":
                _, w, name, nslots, slot_bytes = msg
                self._rings[w] = _WorkerRing(name, nslots, slot_bytes)
                continue
            if tag == "end":
                self._ended += 1
                if self._ended >= self._n:
                    raise StopIteration
                continue
            if tag == "err":
                raise RuntimeError(
                    f"mp data worker {msg[1]} failed:\n{msg[2]}"
                )
            if tag == "big":
                _, w, wire_bytes, payload = msg
                wire = np.frombuffer(wire_bytes, np.uint8)
            else:
                _, w, slot, nbytes, payload = msg
                # private copy so the slot recycles immediately and no
                # shm view leaks into user-held batches
                wire = np.array(self._rings[w].slot(slot, nbytes))
                self._free_qs[w].put(slot)
            spec, info = pickle.loads(payload)
            host = PackedBatch(wire, spec)
            # workers pick wire dtypes from their OWN data; widen to
            # one stable cross-worker spec so jit compiles once
            host = unify_spec(host, self._spec_kinds)
            # host-side views for metrics/delta-dump/ZCH consumers —
            # reconstructed from the wire, so ids are int32 (the
            # framework-wide device convention; all ids are pre-
            # bucketed below 2^31) and, under dense_bf16, dense
            # features are bf16-rounded (labels/weights stay f32)
            host.host_batch = unpack_batch(host)
            item = (host, info)
            if self._device_put_fn is not None:
                item = (self._device_put_fn(host), info)
                if isinstance(item[0], PackedBatch):
                    item[0].host_batch = host.host_batch
            return item

    def _drain(self) -> None:
        # discard pending batches, but attach any ring announced-but-
        # never-consumed so the unlink below reclaims it (no shm leak)
        try:
            while True:
                msg = self._full_q.get_nowait()
                if msg[0] == "shm" and msg[1] not in self._rings:
                    self._rings[msg[1]] = _WorkerRing(msg[2], msg[3], msg[4])
        except Exception:  # noqa: BLE001
            pass

    def close(self) -> None:
        import threading

        self._closed = True
        self._stop.set()
        # an EXTERNAL close must not tear rings down under a consumer
        # thread mid-_produce_one: it sees _closed within one queue
        # timeout and exits; join it first (self-join would deadlock
        # when the consumer thread itself runs close after the sentinel)
        if threading.current_thread() is not self._consumer:
            self._consumer.join(timeout=15.0)
        with self._close_lock:
            if self._close_done:
                return
            self._close_done = True
        # drain WHILE joining: workers can't exit until their queue
        # feeder flushes, and may announce their shm ring at any point
        # up to exit
        deadline = time.monotonic() + 5.0
        while True:
            self._drain()
            if not any(p.is_alive() for p in self._procs):
                break
            if time.monotonic() > deadline:
                for p in self._procs:
                    if p.is_alive():
                        p.terminate()
                break
            time.sleep(0.02)
        for p in self._procs:
            p.join(timeout=1.0)
        self._drain()
        for ring in self._rings.values():
            ring.close()
            try:
                ring.shm.unlink()
            except Exception:  # noqa: BLE001
                pass
        self._rings.clear()
