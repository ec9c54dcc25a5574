"""Multi-host runtime initialization.

Counterpart of /root/reference/tzrec/utils/dist_util.py (:57-75
init_process_group). TPU-native: one process per host,
``jax.distributed.initialize`` discovers the pod topology from the TPU
environment (or explicit coordinator envs for CPU testing); the global
device mesh then spans all hosts' chips over ICI/DCN. No NCCL/Gloo —
collectives are XLA's.

Env contract (mirrors torchrun's of the reference):
  TZREC_COORDINATOR / TZREC_NUM_PROCESSES / TZREC_PROCESS_ID for
  explicit bootstrap; unset = single-process or TPU auto-detection.
"""

import os
from typing import Optional

import jax

from torcheasyrec_tpu.utils.logging_util import logger

_INITIALIZED = False


def init_distributed() -> bool:
    """Initialize multi-host jax if configured; returns True when the
    runtime is multi-process."""
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coordinator = os.environ.get("TZREC_COORDINATOR")
    num_procs = os.environ.get("TZREC_NUM_PROCESSES")
    proc_id = os.environ.get("TZREC_PROCESS_ID")
    try:
        if coordinator and num_procs and proc_id:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(num_procs),
                process_id=int(proc_id),
            )
            _INITIALIZED = True
        elif os.environ.get("TPU_WORKER_HOSTNAMES") and os.environ.get(
            "TZREC_AUTO_DISTRIBUTED"
        ):
            jax.distributed.initialize()
            _INITIALIZED = True
    except Exception as e:  # noqa: BLE001
        logger.warning(f"jax.distributed.initialize failed: {e}")
    if _INITIALIZED:
        logger.info(
            f"distributed: process {jax.process_index()} / "
            f"{jax.process_count()}, {jax.device_count()} global devices"
        )
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "barrier") -> None:
    """Cross-host sync (reference dist.barrier equivalents)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def broadcast_host_data(data, name: str = "bcast"):
    """Broadcast small host data from process 0 to all."""
    if jax.process_count() <= 1:
        return data
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(data)


def gather_host_array(arr) -> "np.ndarray":
    """Concatenate a per-host numpy array across processes (dim0).

    Hosts may hold different dim0 sizes (metric states): sizes are
    gathered first, arrays pad to the max, and the result trims back —
    the reference's ``dist_reduce_fx="cat"`` metric sync
    (/root/reference/tzrec/metrics/recall_at_k.py:36-41) for host-side
    state.
    """
    import numpy as np

    if jax.process_count() <= 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils

    a = np.asarray(arr)
    if a.ndim == 0:
        a = a.reshape(1)
    ns = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([a.shape[0]], np.int64)
        )
    ).reshape(-1)
    m = int(ns.max())
    pad = np.zeros((m,) + a.shape[1:], dtype=a.dtype)
    pad[: a.shape[0]] = a
    g = np.asarray(multihost_utils.process_allgather(pad))  # [P, m, ...]
    return np.concatenate([g[p, : int(ns[p])] for p in range(len(ns))])


def gather_host_sum(*vals):
    """Sum small per-host scalars across processes; returns a tuple."""
    import numpy as np

    if jax.process_count() <= 1:
        return vals
    from jax.experimental import multihost_utils

    g = np.asarray(
        multihost_utils.process_allgather(
            np.asarray(vals, np.float64)
        )
    )
    return tuple(g.sum(axis=0).tolist())


def all_workers_have_data(has_data: bool) -> bool:
    """Cross-process has-batch check so ranks stop together on uneven
    data (reference dist_util.py:285-299 check_all_workers_data_status).
    Single-process: trivially has_data."""
    if jax.process_count() <= 1:
        return has_data
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if has_data else 0], np.int32)
    )
    return bool(np.asarray(flags).min() > 0)
