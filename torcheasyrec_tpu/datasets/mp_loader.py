"""Multi-process data loading: the torch DataLoader worker-pool
equivalent (reference tzrec/datasets/dataset.py:753-852 uses
``DataLoader(num_workers≈8, persistent_workers=True)``; SURVEY §3.2).

Why processes: the whole host path (Arrow decode -> feature parse ->
batch pack -> H2D serialize) is GIL-bound, so thread-level prefetch
caps the pipeline at the SUM of those costs. Worker processes run
read -> sample -> parse -> pack and hand the consumer a finished wire
buffer (datasets/pack.py); the consumer process only does one
``jax.device_put`` and the jit dispatch per step.

Transport is a per-worker SPSC shared-memory slot ring with
batch-granular semaphores — NOT an mp.Queue. A queue hop costs
~0.3-0.5 ms each way (pipe write + pickle + feeder-thread locks) and
the consumer pays two per batch; at Criteo batch rates that alone
capped the loader at ~4.5M examples/s. The ring path is: worker writes
[header | spec? | info | wire] into the next slot of ITS ring, bumps a
produced counter in shm, releases one shared ``items`` semaphore
(~2 us futex); the consumer acquires, scans produced counters, copies
the slot into a private buffer, releases the worker's ``space``
semaphore. Steady-state per-batch transport cost is one ~0.25 ms
memcpy + two futex ops. The produced-counter store is ordered before
the semaphore release (a full barrier), so the consumer never reads a
half-written slot.

The packed spec is sticky (envelopes only widen), so its pickle rides
in the slot only when it CHANGES; in steady state the slot carries
just a 40-byte header + ~100-byte BatchInfo pickle + the wire.
Host-side views for metrics/delta-dump consumers are attached lazily
(first ``host_batch`` access). The blocking ``device_put`` runs on a
2-thread pool (the H2D link sustains ~2x the single-stream rate with
two transfers in flight) with futures enqueued in arrival order, so
consumers still see a FIFO stream.

A small mp.Queue remains for CONTROL messages only (ring announce,
end-of-stream, worker error, oversized-batch fallback); every control
message is also signalled through the ``items`` semaphore, and the
consumer consumes at most one item per acquired credit, so credits and
messages stay balanced and no path blocks forever.

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
import struct
import time
import traceback
from multiprocessing import shared_memory
from typing import Any, Callable, Iterator, Optional

import numpy as np

from torcheasyrec_tpu.datasets.pack import (
    PackedBatch,
    PackedBatchGroup,
    pack_batch,
    stack_packed,
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

# slot header: wire_nbytes, spec_len, info_len, spec_id (little-endian)
_HDR = struct.Struct("<iiii")
# produced counter lives in the first cache line of the ring shm
_CTR_BYTES = 64


class _WorkerRing:
    """Consumer-side view of one worker's shm slot ring."""

    def __init__(self, name: str, nslots: int, slot_bytes: int) -> None:
        self.shm = shared_memory.SharedMemory(name=name)
        self.nslots = nslots
        self.slot_bytes = slot_bytes
        self.view = np.frombuffer(self.shm.buf, np.uint8)
        self.produced = np.frombuffer(self.shm.buf, np.int64, count=1)
        self.consumed = 0  # consumer-local read cursor

    def ready(self) -> bool:
        return int(self.produced[0]) > self.consumed

    def slot(self, idx: int, nbytes: int) -> np.ndarray:
        off = _CTR_BYTES + idx * self.slot_bytes
        return self.view[off : off + nbytes]

    def close(self) -> None:
        try:
            del self.view
            del self.produced
            self.shm.close()
        except BufferError:  # exported views still alive at teardown
            pass


def _worker_main(
    worker_idx: int,
    dataset_factory: Callable[[int], Any],
    dense_bf16: bool,
    nslots: int,
    ctl_q: Any,
    items_sem: Any,
    space_sem: Any,
    stop_ev: Any,
) -> None:
    shm = None
    view = None

    def _publish_ctl(msg) -> None:
        ctl_q.put(msg)
        items_sem.release()

    try:
        it = iter(dataset_factory(worker_idx))
        slot_bytes = 0
        produced = None
        n_produced = 0
        # spec dedup: the packed spec is sticky (envelopes only widen),
        # so re-pickling + re-unpickling it per batch is pure waste
        # (~0.6 ms/batch on a Criteo-shaped spec). Ship the pickle only
        # when the spec object changes; otherwise just its id.
        last_spec = None
        spec_id = -1
        for batch, info in it:
            if stop_ev.is_set():
                break
            p = pack_batch(batch, dense_bf16=dense_bf16)
            wire = p.wire
            if p.spec != last_spec:
                last_spec = p.spec
                spec_id += 1
                spec_payload = pickle.dumps(p.spec, protocol=4)
            else:
                spec_payload = b""
            info_payload = pickle.dumps(info, protocol=4)
            total = (
                _HDR.size + len(spec_payload) + len(info_payload)
                + wire.nbytes
            )
            if shm is None:
                # size the ring off the first batch with headroom for
                # bucketed-shape growth
                slot_bytes = max(int(total * 2), 1 << 20)
                shm = shared_memory.SharedMemory(
                    create=True, size=_CTR_BYTES + nslots * slot_bytes
                )
                view = np.frombuffer(shm.buf, np.uint8)
                produced = np.frombuffer(shm.buf, np.int64, count=1)
                produced[0] = 0
                _publish_ctl(
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
            if total > slot_bytes:
                # oversized batch: fall back to queue transport
                _publish_ctl((
                    "big", worker_idx, wire.tobytes(), info_payload,
                    spec_id, spec_payload,
                ))
                continue
            while not stop_ev.is_set():
                if space_sem.acquire(timeout=0.2):
                    break
            else:
                break
            off = _CTR_BYTES + (n_produced % nslots) * slot_bytes
            _HDR.pack_into(
                shm.buf, off,
                wire.nbytes, len(spec_payload), len(info_payload), spec_id,
            )
            o = off + _HDR.size
            if spec_payload:
                view[o : o + len(spec_payload)] = np.frombuffer(
                    spec_payload, np.uint8
                )
                o += len(spec_payload)
            view[o : o + len(info_payload)] = np.frombuffer(
                info_payload, np.uint8
            )
            o += len(info_payload)
            view[o : o + wire.nbytes] = wire
            n_produced += 1
            # counter store happens-before the semaphore release (a
            # full barrier), so the consumer never sees a stale slot
            produced[0] = n_produced
            items_sem.release()
        _publish_ctl(("end", worker_idx))
    except BaseException:  # noqa: BLE001 - ship the traceback
        try:
            _publish_ctl(("err", worker_idx, traceback.format_exc()))
        except Exception:  # noqa: BLE001
            pass
    finally:
        if shm is not None:
            try:
                del view
                del produced
                shm.close()
            except Exception:  # noqa: BLE001
                pass


class MpBatchLoader:
    """Iterator over (PackedBatch, BatchInfo) produced by worker
    processes. API-compatible with PrefetchIterator (close(),
    device_put_fn applied on the consumer side)."""

    def __init__(
        self,
        dataset_factory: Callable[[int], Any],
        num_workers: int,
        dense_bf16: bool = False,
        device_put_fn: Optional[Callable[[Any], Any]] = None,
        nslots: int = 4,
        prefetch: int = 3,
        group_size: int = 1,
    ) -> None:
        """``group_size > 1`` switches the iterator contract to
        (PackedBatchGroup, list[BatchInfo]) items: up to that many
        consecutive same-spec batches stacked into one (K, W) wire,
        moved H2D in ONE transfer and consumed by one multi-step scan
        dispatch (main.make_train_step_scan). A spec change or
        end-of-stream flushes pending items as size-1 groups, so
        consumers see exactly TWO group shapes (K and 1) — at most two
        jit variants of the scanned step."""
        assert num_workers >= 1
        self._group_size = max(int(group_size), 1)
        method = _pick_start_method()
        ctx = mp.get_context(method)
        self._device_put_fn = device_put_fn
        self._stop = ctx.Event()
        self._ctl_q = ctx.Queue()
        self._items_sem = ctx.Semaphore(0)
        self._space_sems = []
        self._procs = []
        self._rings: dict = {}
        self._scan_from = 0
        self._ended = 0
        self._n = num_workers
        self._finished = False
        self._closed = False
        self._spec_kinds: dict = {}
        self._spec_cache: dict = {}  # (worker, spec_id) -> spec object
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
                sp = ctx.Semaphore(nslots)
                self._space_sems.append(sp)
                p = ctx.Process(
                    target=_worker_main,
                    args=(
                        w, dataset_factory, dense_bf16, nslots,
                        self._ctl_q, self._items_sem, sp, self._stop,
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
        # consumer-side pipeline: ONE reader thread does the slot
        # memcpy + spec resolve (cheap, ~0.3 ms), then hands the
        # blocking device_put to a small pool — the H2D link sustains
        # ~2x the single-stream rate with 2 transfers in flight
        # (measured: 1.4 ms/put serial vs ~0.6 ms effective pooled),
        # and enqueues the FUTURE so arrival order is preserved.
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._out_q: Any = queue_mod.Queue(maxsize=max(prefetch, 1))
        self._close_lock = threading.Lock()
        self._close_done = False
        self._put_pool = (
            ThreadPoolExecutor(max_workers=2, thread_name_prefix="mp_put")
            if device_put_fn is not None
            else None
        )
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
        if self._group_size > 1:
            self._consume_loop_grouped()
            return
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
            if self._put_pool is not None:
                try:
                    item = self._put_pool.submit(self._put_one, item)
                except RuntimeError:  # pool shut down by close()
                    return
                self._put_out(("fut", item))
            else:
                self._put_out(("ok", item))

    def _consume_loop_grouped(self) -> None:
        pending: list = []  # [(host PackedBatch, info)]

        def _emit(items) -> bool:
            group = stack_packed([h for h, _ in items])
            group.infos = [i for _, i in items]
            out = (group, group.infos)
            if self._put_pool is not None:
                try:
                    out = self._put_pool.submit(self._put_group, group)
                except RuntimeError:  # pool shut down by close()
                    return False
                self._put_out(("fut", out))
            else:
                self._put_out(("ok", out))
            return True

        def _flush_singles() -> bool:
            # spec change / end of stream: emit pending items as size-1
            # groups so consumers only ever compile two scan shapes
            # (group_size and 1)
            while pending:
                if not _emit([pending.pop(0)]):
                    return False
            return True

        while not self._closed:
            try:
                item = self._produce_one()
            except StopIteration:
                _flush_singles()
                self._put_out(("stop", None))
                self.close()
                return
            except BaseException as e:  # noqa: BLE001 — re-raised in __next__
                self._put_out(("err", e))
                self.close()
                return
            if pending and pending[0][0].spec != item[0].spec:
                if not _flush_singles():
                    return
            pending.append(item)
            if len(pending) >= self._group_size:
                items, pending = pending, []
                if not _emit(items):
                    return

    def _put_group(self, group: PackedBatchGroup):
        from torcheasyrec_tpu.datasets.pack import put_packed_group

        d = put_packed_group(group)
        return (d, group.infos)

    def _put_one(self, item):
        host, info = item
        d = self._device_put_fn(host)
        if isinstance(d, PackedBatch):
            d._share_host_batch(host)
        return (d, info)

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
        if tag == "fut":
            try:
                return val.result()
            except BaseException:
                self._finished = True
                self.close()
                raise
        return val

    def _read_ring_item(self):
        """Pop one ready slot from any worker ring (round-robin fair),
        or return None. Consumer-thread only."""
        if not self._rings:
            return None
        order = sorted(self._rings)
        n = len(order)
        start = self._scan_from % n
        for i in range(n):
            w = order[(start + i) % n]
            ring = self._rings[w]
            if not ring.ready():
                continue
            self._scan_from = (start + i + 1) % n
            idx = ring.consumed % ring.nslots
            off = _CTR_BYTES + idx * ring.slot_bytes
            wire_n, spec_len, info_len, spec_id = _HDR.unpack_from(
                ring.shm.buf, off
            )
            o = off + _HDR.size
            buf = ring.view
            if spec_len:
                self._spec_cache[(w, spec_id)] = pickle.loads(
                    buf[o : o + spec_len].tobytes()
                )
                o += spec_len
            info = pickle.loads(buf[o : o + info_len].tobytes())
            o += info_len
            # private copy so the slot recycles immediately and no shm
            # view leaks into user-held batches
            wire = np.array(buf[o : o + wire_n])
            ring.consumed += 1
            self._space_sems[w].release()
            return (w, spec_id, wire, info)

    def _produce_one(self):
        while True:
            if self._closed:
                raise StopIteration
            got = self._items_sem.acquire(timeout=2.0)
            if not got:
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
            # one credit -> exactly one consumed message (ring item or
            # control). A credit with NO ready ring item must belong to
            # a control message (the produced-counter store is ordered
            # before the item credit's release), but mp.Queue delivery
            # runs through a feeder thread and can trail the release —
            # so block briefly, and if it still hasn't landed, hand the
            # credit back instead of losing it (losing it deadlocks the
            # end-of-stream accounting).
            item = self._read_ring_item()
            if item is None:
                try:
                    msg = self._ctl_q.get(timeout=0.1)
                except queue_mod.Empty:
                    self._items_sem.release()
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
                    _, w, wire_bytes, info_payload, spec_id, spec_pl = msg
                    if spec_pl:
                        self._spec_cache[(w, spec_id)] = pickle.loads(
                            spec_pl
                        )
                    item = (
                        w, spec_id,
                        np.frombuffer(wire_bytes, np.uint8),
                        pickle.loads(info_payload),
                    )
                else:  # unknown control message
                    continue
            w, spec_id, wire, info = item
            spec = self._spec_cache[(w, spec_id)]
            host = PackedBatch(wire, spec)
            # workers pick wire dtypes from their OWN data; widen to
            # one stable cross-worker spec so jit compiles once
            host = unify_spec(host, self._spec_kinds)
            # host-side views for metrics/delta-dump/ZCH consumers are
            # LAZY: first .host_batch access rebuilds them from the
            # wire, so ids are int32 (the framework-wide device
            # convention; all ids are pre-bucketed below 2^31) and,
            # under dense_bf16, dense features are bf16-rounded
            # (labels/weights stay f32). Steps with no host consumer
            # skip the rebuild entirely.
            host.set_host_batch_thunk(lambda h=host: unpack_batch(h))
            return (host, info)

    def _drain(self) -> None:
        # discard pending control messages, but attach any ring
        # announced-but-never-consumed so the unlink below reclaims it
        # (no shm leak)
        try:
            while True:
                msg = self._ctl_q.get_nowait()
                if msg[0] == "shm" and msg[1] not in self._rings:
                    self._rings[msg[1]] = _WorkerRing(msg[2], msg[3], msg[4])
        except Exception:  # noqa: BLE001
            pass

    def close(self) -> None:
        import threading

        self._closed = True
        self._stop.set()
        # an EXTERNAL close must not tear rings down under a consumer
        # thread mid-_produce_one: it sees _closed within one sem
        # timeout and exits; join it first (self-join would deadlock
        # when the consumer thread itself runs close after the sentinel)
        if threading.current_thread() is not self._consumer:
            self._consumer.join(timeout=15.0)
        with self._close_lock:
            if self._close_done:
                return
            self._close_done = True
        if self._put_pool is not None:
            # don't wait: a pending device_put finishes on its own and
            # holds only host/device buffers, never shm views
            self._put_pool.shutdown(wait=False)
        # unblock any worker waiting for a free slot so it can see the
        # stop event and exit
        for sp in self._space_sems:
            for _ in range(2):
                sp.release()
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
