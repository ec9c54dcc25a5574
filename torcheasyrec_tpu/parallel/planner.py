"""Embedding sharding planner.

Counterpart of /root/reference/tzrec/utils/plan_util.py
(create_planner:93, DynamicProgrammingProposer:359-556,
EmbeddingStorageEstimator:622-882): enumerates per-table sharding
options, estimates per-step time + per-device HBM bytes with an
ICI/HBM-bandwidth cost model, and picks the min-total-time plan under
the device memory budget via dynamic programming over memory bins.

TPU option space (engine-supported): ``row_wise`` (block-sharded rows,
allgather-ids / psum-scatter-rows exchange), ``column_wise`` (dim-sharded,
all_to_all exchange), ``table_wise`` (whole tables bin-packed onto
shards) and ``data_parallel`` (replicated table, allgather-(ids,grads)
update). Bandwidths follow the
reference's env-var contract (plan_util.py:111-114) with TPU defaults:
INTRA_NODE_BANDWIDTH -> ICI bytes/s, HBM_BANDWIDTH, STORAGE_RESERVE_PERCENT.
"""

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

from torcheasyrec_tpu.parallel.emb_engine import (
    COLUMN_WISE,
    DATA_PARALLEL,
    ROW_WISE,
    TABLE_ROW_WISE,
    TABLE_WISE,
    TableSpec,
)
from torcheasyrec_tpu.utils.logging_util import logger

# v5e-ish defaults; overridable via env like the reference
_ICI_BW = float(os.environ.get("INTRA_NODE_BANDWIDTH", 4.5e10))  # B/s
_HBM_BW = float(os.environ.get("HBM_BANDWIDTH", 8.1e11))  # B/s
_HBM_CAP = float(os.environ.get("HBM_CAPACITY", 16e9))  # bytes
_RESERVE = float(os.environ.get("STORAGE_RESERVE_PERCENT", 0.15))

_OPT_STATE_FACTOR = {
    "sgd": 0.0,
    "adagrad": 1.0,
    "rowwise_adagrad": 1.0 / 8,  # ~dim/1 rows; approximated per-row
    "adam": 2.0,
    "partial_rowwise_adam": 1.1,
    "lamb": 2.0,
    "partial_rowwise_lamb": 1.1,
    "lars_sgd": 1.0,
    "adadelta": 2.0,
    "rmsprop": 1.0,
}


@dataclasses.dataclass
class _Option:
    sharding: str
    time_cost: float  # seconds per step (estimate)
    mem_bytes: float  # per-device bytes


def _options(
    spec: TableSpec, n_devices: int, ids_per_step: float, opt_factor: float,
    shards_per_host: int = 1,
) -> List[_Option]:
    bytes_table = spec.rows * spec.dim * 4.0 * (1.0 + opt_factor)
    row_bytes = spec.dim * 4.0
    n = ids_per_step  # global ids per step for this table
    out = []
    # row_wise: fwd allgather ids (n*4*D read) + masked gather (D*n rows)
    # + psum_scatter rows; bwd allgather row grads (D*n*row_bytes)
    if n_devices > 1:
        comm = (
            n * 4.0 * n_devices  # ids allgather
            + n * row_bytes * (n_devices - 1)  # rows reduce-scatter-ish
            + n * row_bytes * (n_devices - 1)  # grads allgather
        ) / _ICI_BW
        hbm = (n_devices * n * row_bytes * 3.0) / _HBM_BW
        out.append(_Option(ROW_WISE, comm + hbm, bytes_table / n_devices))
        # column_wise: ids allgather + all_to_all rows/grads — same
        # wire bytes as row_wise's psum_scatter/allgather pair; small
        # tie-break penalty so row_wise wins at equal cost (CW's value
        # is balancing hot rows / huge dims, selectable via forced plan)
        if spec.dim % n_devices == 0:
            out.append(_Option(
                COLUMN_WISE, (comm + hbm) * 1.05, bytes_table / n_devices
            ))
        # table_wise: row_wise exchange but the owning shard does ALL
        # the row traffic (hot-spot) and holds the whole table
        out.append(_Option(TABLE_WISE, comm + hbm * n_devices, bytes_table))
        # table_row_wise: rows split over one host group's shards —
        # milder hot-spot than table_wise, memory / shards_per_host
        if 1 < shards_per_host < n_devices:
            out.append(_Option(
                TABLE_ROW_WISE,
                comm + hbm * (n_devices // shards_per_host),
                bytes_table / shards_per_host,
            ))
    # data_parallel: local gather; update allgathers (ids, grads)
    comm_dp = (
        (n * (4.0 + row_bytes) * (n_devices - 1)) / _ICI_BW
        if n_devices > 1 else 0.0
    )
    hbm_dp = (n * row_bytes * 3.0 * n_devices) / _HBM_BW
    out.append(_Option(DATA_PARALLEL, comm_dp + hbm_dp, bytes_table))
    return out


def create_plan(
    specs: Sequence[TableSpec],
    n_devices: int,
    batch_size: int,
    avg_ids_per_sample: float = 1.0,
    optimizer_kind: str = "adagrad",
    hbm_budget: Optional[float] = None,
    n_bins: int = 64,
    shards_per_host: int = 1,
) -> Dict[str, str]:
    """DP over memory bins -> {table_name: sharding}."""
    if not specs:
        return {}
    budget = (hbm_budget or _HBM_CAP) * (1.0 - _RESERVE)
    opt_factor = _OPT_STATE_FACTOR.get(optimizer_kind, 1.0)
    ids = batch_size * avg_ids_per_sample
    table_opts = [
        _options(s, n_devices, ids, opt_factor, shards_per_host)
        for s in specs
    ]
    bin_bytes = budget / n_bins
    inf = float("inf")
    # dp[b] = (cost, choices) best plan using <= b bins
    dp = [(0.0, [])] + [(inf, None)] * n_bins
    for opts in table_opts:
        ndp = [(inf, None)] * (n_bins + 1)
        for b in range(n_bins + 1):
            cost, choices = dp[b]
            if choices is None:
                continue
            for oi, o in enumerate(opts):
                need = int(-(-o.mem_bytes // bin_bytes))
                nb = b + need
                if nb > n_bins:
                    continue
                ncost = cost + o.time_cost
                if ncost < ndp[nb][0]:
                    ndp[nb] = (ncost, choices + [oi])
        dp = ndp
    best = min(
        (entry for entry in dp if entry[1] is not None),
        default=(inf, None),
        key=lambda e: e[0],
    )
    if best[1] is None:
        logger.warning(
            "planner: no plan fits the HBM budget; defaulting to row_wise"
        )
        return {s.name: ROW_WISE if n_devices > 1 else DATA_PARALLEL
                for s in specs}
    plan = {
        s.name: table_opts[i][oi].sharding
        for i, (s, oi) in enumerate(zip(specs, best[1]))
    }
    counts = {}
    for v in plan.values():
        counts[v] = counts.get(v, 0) + 1
    logger.info(
        "planner: "
        + ", ".join(f"{c} {k}" for k, c in sorted(counts.items()))
        + f" tables (est {best[0] * 1e3:.2f} ms/step comm+mem)"
    )
    return plan


def save_plan(plan: Dict[str, str], model_dir: str) -> None:
    with open(os.path.join(model_dir, "sharding_plan.json"), "w") as f:
        json.dump(plan, f, indent=2)


def load_plan(model_dir: str) -> Optional[Dict[str, str]]:
    path = os.path.join(model_dir, "sharding_plan.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None
