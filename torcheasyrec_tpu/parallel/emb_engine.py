"""Sharded embedding engine — the TorchRec/fbgemm replacement.

Replaces the reference's ShardedEmbeddingBagCollection + TBE fused
kernels + KJT/pooled-embedding all-to-alls (SURVEY.md §2.1 row 3;
reference tzrec/utils/dist_util.py:164-195, tzrec/modules/embedding.py).
TPU-first design:

- **Fused table groups**: tables with the same (embedding_dim, sharding)
  are stacked into one megatable ``[sum_rows, dim]`` with static row
  offsets (the TBE "table batching" idea), so each step does ONE gather +
  ONE segment-sum + ONE pair of collectives per group instead of
  per-feature ops.
- **Sharding**: ``row_wise`` block-shards megatable rows over the
  ``"data"`` mesh axis. The DEFAULT per-step exchange is the
  owner-bucketed all-to-all (``_a2a_exchange`` below): ids are bucketed
  by owning shard into fixed per-peer capacity, exchanged with
  ``lax.all_to_all``, gathered locally, and returned the same way; rows
  whose bucket overflows the static capacity fall back EXACTLY via an
  ``all_gather(ids) -> local masked gather -> psum_scatter(rows)``
  pass over just the overflow (so results are correct under arbitrary
  id skew). ``TZREC_EMB_EXCHANGE=allgather`` selects the plain
  allgather/psum_scatter exchange everywhere. ``data_parallel`` keeps
  the table replicated and all-gathers (ids, grads) at update time so
  replicas stay in sync.
- **Fused in-backward optimizer**: update() routes pooled-output grads
  back to owning shards, dedups duplicate ids by sort + segment-sum,
  and applies the sparse optimizer to touched rows only
  (parallel/sparse_optim.py) — the ``apply_optimizer_in_backward``
  equivalent without ever materializing a dense table gradient.

The engine is pure: tables/optimizer state are pytrees threaded through
``lookup`` / ``update`` inside one jitted train step.
"""

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torcheasyrec_tpu.datasets.utils import SparseField, segment_ids_from_lengths
from torcheasyrec_tpu.features.feature import EmbConfig
from torcheasyrec_tpu.modules.module import default_emb_init, parse_init_fn
from torcheasyrec_tpu.parallel.mesh import (
    DATA_AXIS,
    DCN_AXIS,
    ICI_AXIS,
    data_axes,
    mesh_hier,
)
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer

ROW_WISE = "row_wise"
COLUMN_WISE = "column_wise"
TABLE_WISE = "table_wise"
# host-DDR tier: the table (weights + optimizer state) lives in host
# RAM; each step ships only the batch's gathered rows to the chip and
# the row grads back (the reference's fused_uvm/dynamicemb CPU-offload
# analogue for tables that exceed HBM). Single-process v1: every host
# would need a grad all-reduce to stay in sync under multi-host DP.
HOST_OFFLOAD = "host_offload"
# sparse optimizers with an exact numpy mirror for the host tier
_HOST_OPT_KINDS = {"sgd", "adagrad", "rowwise_adagrad", "adam"}
# TorchRec TABLE_ROW_WISE: each table lives on ONE host group, rows
# block-sharded across that group's shards
TABLE_ROW_WISE = "table_row_wise"
DATA_PARALLEL = "data_parallel"

ALL_SHARDINGS = frozenset({
    ROW_WISE, COLUMN_WISE, TABLE_WISE, TABLE_ROW_WISE, DATA_PARALLEL,
    HOST_OFFLOAD,
})
# reference sharding types with no TPU-native layout, mapped to the
# layout that dominates them on TPU interconnects (docs/sharding.md,
# "Why not table_column_wise / grid_shard"); keeps reference configs
# that name them working
COMPAT_SHARDING = {
    "table_column_wise": COLUMN_WISE,
    "grid_shard": ROW_WISE,
}


@dataclasses.dataclass(frozen=True)
class TableSpec:
    name: str
    rows: int
    dim: int
    init_fn: Optional[str] = None
    trainable: bool = True
    sharding: str = ROW_WISE
    # storage dtype (feature config data_type: FP32 | BF16 | FP16);
    # optimizer math stays fp32, weights round on scatter
    dtype: str = "FP32"
    # embedding_constraints.sharding_types from the feature config:
    # when non-empty, the planner only considers these layouts
    # (reference ParameterConstraints, plan_util.py:132-170)
    sharding_types: Tuple[str, ...] = ()
    # co-keyed merge (merge_cokeyed_tables): the logical tables fused
    # into this spec's columns, in column order; () = ordinary table
    merged_from: Tuple["TableSpec", ...] = ()


@dataclasses.dataclass(frozen=True)
class LookupSpec:
    """One (feature -> table) pooled or per-position lookup."""

    key: str  # output key
    feature_name: str  # batch sparse field name
    table_name: str
    combiner: str = "sum"  # sum | mean | none (none = sequence per-position)
    is_sequence: bool = False
    # merged co-keyed lookup: (output_key, col_offset, width) per fused
    # logical table — ONE gather serves every output; () = single
    # whole-dim output under ``key``
    col_outputs: Tuple[Tuple[str, int, int], ...] = ()


@dataclasses.dataclass
class _Group:
    """A fused megatable: same (dim, sharding, dtype) tables stacked
    row-wise."""

    dim: int
    sharding: str
    specs: List[TableSpec]
    offsets: Dict[str, int]
    total_rows: int
    padded_rows: int
    dtype: str = "FP32"
    # packed-row storage (see _maybe_pack_group): the megatable is
    # stored as [p_rows, 128] f32 physical rows, each holding ``spr``
    # logical slots of ``slot = dim + state`` lanes (TBE-style in-row
    # optimizer state). Scratch rows absorb duplicate-rank writes:
    # p_shards == 1 (single device / replicated) appends ONE trailing
    # scratch row; p_shards == D (row-sharded meshes) lays the packed
    # rows out as D per-shard blocks of ``pps + 1`` physical rows each
    # (pps = rows_per_shard // spr), so every shard owns a contiguous
    # block WITH its own local scratch row and the ownership rule
    # ``owner = logical_id // rows_per_shard`` survives packing.
    packed: bool = False
    slot: int = 0
    spr: int = 0
    p_rows: int = 0
    p_shards: int = 1
    state_widths: Tuple[Tuple[str, int], ...] = ()
    # dense-lane region (single-device packed groups, identity-safe
    # sparse optimizers): SMALL tables (rows <= TZREC_DENSE_LANE) are
    # laid out FIRST in the megatable; their lookups run as fused
    # one-hot matmuls on the MXU and their update rewrites the whole
    # contiguous [0, dense_rows) region with ONE block DMA — skipping
    # the sort/dedup stream and the per-row scatter entirely, which is
    # where a descriptor-bound update spends its time when ids are
    # many but tables are tiny (Criteo: 13 of 26 tables, half the id
    # stream). dense_rows == 0 means no region.
    dense_rows: int = 0
    dense_tables: frozenset = frozenset()
    # column-segment widths when the group holds merged co-keyed tables
    # (all specs in such a group share one segment structure); () =
    # ordinary single-segment group
    col_segments: Tuple[int, ...] = ()

    @property
    def store_dtype(self):
        return {
            "FP32": jnp.float32, "BF16": jnp.bfloat16,
            "FP16": jnp.float16,
        }.get(self.dtype.upper(), jnp.float32)


def _group_key(dim: int, sharding: str, dtype: str = "FP32",
               segs: Tuple[int, ...] = ()) -> str:
    base = f"d{dim}_{sharding}"
    if dtype.upper() != "FP32":
        base = f"{base}_{dtype.lower()}"
    if len(segs) > 1:
        # merged tables group separately: their row-wise optimizer
        # state is per-SEGMENT, so mixing them with ordinary same-dim
        # tables would change the plain tables' numerics
        base = f"{base}_s" + ".".join(str(s) for s in segs)
    return base


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PlanEntry:
    """Per-lookup slice of a fused group's flat id vector.

    Arrays (seg/weights/lengths) are pytree children so residuals can
    cross jit boundaries; the rest is static aux data.
    """

    lk: LookupSpec
    start: int
    count: int
    kind: str  # "pool" | "seq"
    seg: Optional[jnp.ndarray]
    weights: Optional[jnp.ndarray]
    lengths: Optional[jnp.ndarray]
    shape: Tuple[int, int]
    # seg is nondecreasing (locally-built from lengths) -> the pooling
    # segment_sum may use the sorted-indices scatter fast path
    sorted_seg: bool = False

    def tree_flatten(self):
        return (self.seg, self.weights, self.lengths), (
            self.lk, self.start, self.count, self.kind, self.shape,
            self.sorted_seg,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        lk, start, count, kind, shape, sorted_seg = aux
        seg, weights, lengths = children
        return cls(lk, start, count, kind, seg, weights, lengths, shape,
                   sorted_seg)


def merge_cokeyed_tables(
    tables: List[TableSpec],
    lookups: List[LookupSpec],
    resolved: Dict[str, str],
    no_merge: Optional[set] = None,
) -> Tuple[List[TableSpec], List[LookupSpec], Dict[str, Tuple[str, int, int]]]:
    """Fuse tables that are looked up by exactly the same id streams.

    The reference pays one TBE lookup per embedding-bag collection; the
    classic wide&deep pattern (a dim-4 WIDE table + a dim-16 DEEP table
    over the SAME feature) therefore gathers every id twice and scatters
    every grad twice. Here such co-keyed tables fuse column-wise into one
    table of dim Σd: ONE gather serves every output slice and ONE
    fused-optimizer scatter applies every grad (per-segment row-wise
    state keeps the optimizer math identical — sparse_optim._dim_sum).

    Mergeable: same rows/dtype/trainable/resolved-sharding and an
    identical stream signature {(feature, combiner, is_sequence)}, with
    sharding not column_wise (per-segment state doesn't compose with a
    dim psum) or host_offload (numpy mirror stays single-segment).

    Returns (new_tables, new_lookups, merged_map) with merged_map:
    original table name -> (merged_name, col_offset, dim).
    """
    by_table: Dict[str, List[LookupSpec]] = {}
    for lk in lookups:
        by_table.setdefault(lk.table_name, []).append(lk)

    sig_clusters: Dict[Any, List[TableSpec]] = {}
    streams_of: Dict[str, Tuple] = {}
    for t in tables:
        lks = by_table.get(t.name, [])
        if not lks or t.merged_from:
            continue
        if no_merge and any(
            t.name == z or t.name.startswith(z) for z in no_merge
        ):
            # zch/dynamicemb tables: their feature streams are
            # collision-REMAPPED in-step, so a merged gather would feed
            # remapped slots to any co-keyed plain table (and
            # stage_route's zch skip set is keyed by original names).
            # Prefix match covers suffixed twins; over-exclusion only
            # costs a missed fusion, never correctness.
            continue
        sharding = resolved.get(t.name, t.sharding)
        if sharding in (COLUMN_WISE, HOST_OFFLOAD):
            continue
        streams = tuple(sorted(
            (lk.feature_name, lk.combiner, lk.is_sequence) for lk in lks
        ))
        # a table looked up twice by one (feature, seq) stream can't be
        # aligned member-to-member — skip it
        if len({(s[0], s[2]) for s in streams}) != len(streams):
            continue
        streams_of[t.name] = streams
        key = (t.rows, t.dtype.upper(), t.trainable, sharding, streams)
        sig_clusters.setdefault(key, []).append(t)

    merged_map: Dict[str, Tuple[str, int, int]] = {}
    new_tables: List[TableSpec] = []
    new_lookups: List[LookupSpec] = []
    drop_lookup_tables: set = set()

    for key, members in sorted(
        sig_clusters.items(), key=lambda kv: kv[1][0].name
    ):
        if len(members) < 2:
            continue
        members = sorted(members, key=lambda t: t.name)
        rows, dtype, trainable, sharding, streams = key
        name = "__merged__" + "+".join(m.name for m in members)
        col_off, offs = 0, {}
        for m in members:
            offs[m.name] = col_off
            merged_map[m.name] = (name, col_off, m.dim)
            drop_lookup_tables.add(m.name)
            col_off += m.dim
        new_tables.append(TableSpec(
            name=name, rows=rows, dim=col_off, init_fn=None,
            trainable=trainable, sharding=sharding, dtype=dtype,
            merged_from=tuple(members),
        ))
        lk_by = {
            (lk.table_name, lk.feature_name, lk.is_sequence): lk
            for m in members for lk in by_table[m.name]
        }
        for feat, comb, is_seq in streams:
            outs = tuple(
                (lk_by[(m.name, feat, is_seq)].key, offs[m.name], m.dim)
                for m in members
            )
            new_lookups.append(LookupSpec(
                key=f"{name}:{feat}" + (":seq" if is_seq else ""),
                feature_name=feat, table_name=name, combiner=comb,
                is_sequence=is_seq, col_outputs=outs,
            ))

    for t in tables:
        if t.name not in merged_map:
            new_tables.append(t)
    for lk in lookups:
        if lk.table_name not in drop_lookup_tables:
            new_lookups.append(lk)
    return new_tables, new_lookups, merged_map


class EmbeddingEngine:
    def __init__(
        self,
        tables: Sequence[TableSpec],
        lookups: Sequence[LookupSpec],
        mesh: Optional[Mesh] = None,
        optimizer: Optional[SparseOptimizer] = None,
        shards_per_host: Optional[int] = None,
        no_merge_tables: Optional[set] = None,
    ) -> None:
        self.mesh = mesh
        self.num_shards = mesh.devices.size if mesh is not None else 1
        # data-axis spec: the flat "data" axis name, or the
        # ("dcn", "ici") tuple on a two-level mesh — valid both as a
        # PartitionSpec entry and as a collective axis_name
        self._ax = data_axes(mesh) or DATA_AXIS
        self._hier = mesh_hier(mesh)  # (hosts, chips) or None
        # host-group width for table_row_wise placement (shards per
        # host); clamped to a divisor of the shard count. A two-level
        # mesh pins it to the ici width: host groups ARE dcn rows.
        g = shards_per_host or (
            self._hier[1] if self._hier else jax.local_device_count()
        )
        while self.num_shards % g:
            g -= 1
        self.shards_per_host = max(g, 1)
        self.optimizer = optimizer or SparseOptimizer("adagrad", {"lr": 0.001})
        import os as _os

        # row-sharded exchange algorithm: "auto" = owner-bucketed
        # all_to_all with an exact allgather fallback when any bucket
        # overflows; "allgather" = always-dense path; "a2a" = pure a2a
        # (overflow ids dropped — benchmarking only)
        self._exchange_mode = _os.environ.get("TZREC_EMB_EXCHANGE", "auto")
        self._a2a_capacity_factor = float(
            _os.environ.get("TZREC_EMB_A2A_CAPACITY", "2.0")
        )
        self._specs = {t.name: t for t in tables}
        self.lookups = list(lookups)
        # host-resident megatables (weights + opt state as numpy);
        # populated by init()/init_opt_state() for HOST_OFFLOAD groups
        self.host_tables: Dict[str, Any] = {}
        self.host_opt: Dict[str, Any] = {}

        # co-keyed table merge (TZREC_TABLE_MERGE=0 disables): fuse
        # tables read by identical id streams so each stream costs one
        # gather + one scatter regardless of how many groups consume it
        self._merged: Dict[str, Tuple[str, int, int]] = {}
        if _os.environ.get("TZREC_TABLE_MERGE", "1") != "0":
            resolved = {
                t.name: self._resolve_sharding(t) for t in tables
            }
            m_tables, m_lookups, self._merged = merge_cokeyed_tables(
                list(tables), self.lookups, resolved,
                no_merge=no_merge_tables,
            )
            if self._merged:
                tables = m_tables
                self.lookups = m_lookups
                self._specs = {t.name: t for t in tables}

        # build fused groups
        self.groups: Dict[str, _Group] = {}
        self._table_group: Dict[str, str] = {}
        for t in tables:
            sharding = self._resolve_sharding(t)
            segs = tuple(m.dim for m in t.merged_from)
            gk = _group_key(t.dim, sharding, t.dtype, segs)
            g = self.groups.setdefault(
                gk,
                _Group(t.dim, sharding, [], {}, 0, 0, dtype=t.dtype,
                       col_segments=segs),
            )
            g.specs.append(t)
            g.total_rows += t.rows
            self._table_group[t.name] = gk
        # packed-row storage: ON by default for eligible single-device
        # fp32 groups (TZREC_PACKED=0 reverts to [rows, dim] tables);
        # the pallas row-write kernel engages on real TPUs only
        # (TZREC_ROW_WRITE=xla forces the fallback scatter)
        self._packed_env = _os.environ.get("TZREC_PACKED", "1") != "0"
        self._pallas_write = (
            _os.environ.get("TZREC_ROW_WRITE", "auto") != "xla"
            and jax.devices()[0].platform == "tpu"
        )
        for g in self.groups.values():
            self._finalize_group(g)
            self._maybe_pack_group(g)
        self._lookups_by_group: Dict[str, List[LookupSpec]] = {}
        for lk in self.lookups:
            gk = self._table_group[lk.table_name]
            self._lookups_by_group.setdefault(gk, []).append(lk)

    def _resolve_sharding(self, t: TableSpec) -> str:
        if t.sharding in COMPAT_SHARDING:
            from torcheasyrec_tpu.utils.logging_util import logger

            mapped = COMPAT_SHARDING[t.sharding]
            logger.warning(
                f"table {t.name}: sharding {t.sharding!r} has no "
                f"TPU-native layout; using {mapped!r} (docs/sharding.md)"
            )
            t = dataclasses.replace(t, sharding=mapped)
        if t.sharding not in ALL_SHARDINGS:
            raise ValueError(
                f"table {t.name}: unknown sharding {t.sharding!r}; "
                f"supported: {sorted(ALL_SHARDINGS)} "
                f"(+compat {sorted(COMPAT_SHARDING)})"
            )
        if t.sharding == HOST_OFFLOAD:
            if jax.process_count() > 1:
                raise ValueError(
                    f"table {t.name}: host_offload is single-process "
                    "only in v1 (multi-host needs a host-side grad "
                    "all-reduce); shard it row_wise instead"
                )
            if self.optimizer.kind not in _HOST_OPT_KINDS:
                raise ValueError(
                    f"table {t.name}: host_offload supports sparse "
                    f"optimizers {sorted(_HOST_OPT_KINDS)}, "
                    f"not {self.optimizer.kind}"
                )
            return HOST_OFFLOAD
        if self.num_shards <= 1:
            import os as _os

            if self.mesh is not None and _os.environ.get(
                "TZREC_FORCE_SHARDED", "0"
            ) == "1":
                # test hook: keep the SHARDED code paths (shard_map
                # exchanges, per-shard packed blocks) on a 1-device
                # mesh — the only way to execute them on this
                # container's single real TPU chip (tests_tpu)
                pass
            else:
                return DATA_PARALLEL
        if t.sharding == TABLE_ROW_WISE and (
            self.shards_per_host >= self.num_shards
        ):
            return ROW_WISE  # single host group: identical to row_wise
        if t.sharding == COLUMN_WISE and t.dim % self.num_shards != 0:
            from torcheasyrec_tpu.utils.logging_util import logger

            logger.warning(
                f"table {t.name}: dim {t.dim} not divisible by "
                f"{self.num_shards} shards; column_wise -> row_wise"
            )
            return ROW_WISE
        return t.sharding

    def _finalize_group(self, g: _Group) -> None:
        """Assign per-table row offsets inside the fused megatable.

        table_wise reuses the row_wise exchange by construction: tables
        are bin-packed into per-shard row blocks (greedy longest
        processing time), so ``owner = id // rows_per_shard`` lands every
        id of a table on its single owning shard (the reference's
        TABLE_WISE placement, plan_util.py, without a separate code
        path). Other layouts lay tables out sequentially.
        """
        import math as _math

        D = self.num_shards
        # row alignment: packed groups additionally require
        # rows_per_shard % spr == 0 so each shard's logical block maps
        # to whole physical rows (ownership rule survives packing)
        pk = self._pack_params(g)
        align = _math.lcm(pk[2], 8) if pk is not None else 8
        # per-TABLE offset alignment inside packed groups: spr-aligned
        # offsets mean no physical row ever straddles two tables —
        # required for the dense-lane region boundary (and it keeps
        # per-table physical rows exclusive). Cost: <= spr-1 pad rows
        # per table. (A per-table BATCHED dedup sort was also built on
        # this and measured SLOWER than the global argsort on v5e —
        # 8.1 ms vs 6.3 ms for the Criteo stream — so it was removed;
        # don't re-derive it.)
        t_align = pk[2] if pk is not None else 1

        def _up(x: int) -> int:
            return ((x + t_align - 1) // t_align) * t_align
        if g.sharding == TABLE_WISE and D > 1:
            loads = [0] * D
            within: Dict[str, int] = {}
            owner: Dict[str, int] = {}
            for t in sorted(g.specs, key=lambda t: -t.rows):
                shard = min(range(D), key=lambda i: loads[i])
                owner[t.name] = shard
                within[t.name] = loads[shard]
                loads[shard] += _up(t.rows)
            rps = ((max(loads) + align - 1) // align) * align
            for t in g.specs:
                g.offsets[t.name] = owner[t.name] * rps + within[t.name]
            g.padded_rows = rps * D
            return
        if g.sharding == TABLE_ROW_WISE and D > 1:
            # bin-pack tables onto host groups; within a group a
            # table's rows are contiguous so the row_wise owner rule
            # (id // rows_per_shard) block-shards them over exactly
            # that group's shards
            spg = self.shards_per_host
            n_hosts = D // spg
            loads = [0] * n_hosts
            within = {}
            owner = {}
            for t in sorted(g.specs, key=lambda t: -t.rows):
                host = min(range(n_hosts), key=lambda i: loads[i])
                owner[t.name] = host
                within[t.name] = loads[host]
                loads[host] += _up(t.rows)
            # per-host region = spg shard blocks
            rps = (
                (max(loads) + spg * align - 1) // (spg * align)
            ) * align
            for t in g.specs:
                g.offsets[t.name] = (
                    owner[t.name] * spg * rps + within[t.name]
                )
            g.padded_rows = rps * D
            return
        dense = self._dense_lane_tables(g, pk)
        if dense:
            # dense-lane tables first: their packed rows form one
            # contiguous region [0, dense_rows) rewritten by a single
            # block DMA each step (see _Group.dense_rows)
            g.specs.sort(key=lambda t: t.name not in dense)
        pos = 0
        for t in g.specs:
            g.offsets[t.name] = pos
            pos += _up(t.rows)
            if dense and t.name in dense:
                g.dense_rows = pos
        g.dense_tables = frozenset(dense)
        # pad rows to a multiple of shards (block sharding); host /
        # column-wise groups are never row-sharded
        mult = (
            D * align
            if g.sharding not in (COLUMN_WISE, HOST_OFFLOAD)
            else align
        )
        g.padded_rows = ((pos + mult - 1) // mult) * mult

    # sparse optimizers whose zero-grad update is the identity: the
    # dense lane applies the optimizer to EVERY region row each step,
    # so rows the batch didn't touch must come out bit-unchanged
    # (adagrad family: acc += 0, w -= lr*0/... == w). Momentum/decay
    # kinds (adam, rmsprop, ...) mutate untouched rows and stay on the
    # sorted sparse path.
    _DENSE_LANE_OPTS = frozenset({"sgd", "adagrad", "rowwise_adagrad"})

    def _dense_lane_tables(self, g: _Group, pk) -> set:
        """Names of this group's tables eligible for the dense lane."""
        import os as _os

        # default from a v5e threshold sweep on the Criteo workload
        # (lookup+update, B=8192): 0 -> 16.5 ms, 4096 -> 12.4,
        # 8192 -> 11.2, 16384 -> 9.3, 32768 -> 8.7, 65536 -> 8.9 —
        # the knee is where a table's one-hot matmul FLOPs outgrow the
        # descriptor+sort cost its ids would have paid
        thr = int(_os.environ.get("TZREC_DENSE_LANE", "32768") or 0)
        if (
            pk is None
            or thr <= 0
            or self.mesh is not None
            or self.optimizer.kind not in self._DENSE_LANE_OPTS
        ):
            return set()
        return {t.name for t in g.specs if t.rows <= thr}

    def _pack_params(
        self, g: _Group
    ) -> Optional[Tuple[Tuple[Tuple[str, int], ...], int, int]]:
        """(state_widths, slot, spr) when the group is pack-eligible,
        else None. Must be deterministic BEFORE row finalization — the
        row alignment in _finalize_group depends on spr."""
        if not self._packed_env:
            return None
        if g.sharding in (HOST_OFFLOAD, COLUMN_WISE):
            return None
        if self.mesh is not None and g.sharding == DATA_PARALLEL:
            # replicated tables on a mesh keep [rows, dim]: the packed
            # update's row-write runs outside shard_map, where a pallas
            # call can't consume the mesh-sharded id stream
            return None
        if g.dtype.upper() != "FP32":
            return None
        widths = tuple(self.optimizer.row_state_widths(
            g.dim, g.col_segments or None
        ))
        slot = g.dim + sum(w for _, w in widths)
        if slot > 128:
            return None
        return widths, slot, 128 // slot

    def _maybe_pack_group(self, g: _Group) -> None:
        """Enable packed-row storage when it is a strict win.

        Packed layout (fp32): logical row r of the megatable lives in
        physical row ``r // spr`` at lane offset ``(r % spr) * slot``,
        where ``slot = dim + Σ optimizer row-state widths`` and
        ``spr = 128 // slot``. Why: Mosaic can only DMA 128-lane-aligned
        HBM slices, and XLA's scatter costs ~95-120 ns/row vs ~46 ns/row
        for the pallas row-write kernel (ops/pallas/row_write.py) — plus
        in-row state halves the update's gather/scatter passes (the
        fbgemm TBE trick; reference runs TBE inside every sharded rank,
        tzrec/utils/dist_util.py:22-52).

        Row-sharded meshes pack too (p_shards = D): each shard's
        contiguous logical block [o*rows_per_shard, (o+1)*rows_per_shard)
        packs into its own physical block of ``pps + 1`` rows (the +1 is
        the shard-local scratch row), so the a2a exchange keeps routing
        LOGICAL megatable ids while gather/update run packed shard-
        locally. column_wise keeps [rows, dim] (dim sharding does not
        compose with 128-lane slot packing)."""
        pk = self._pack_params(g)
        if pk is None:
            return
        g.state_widths, g.slot, g.spr = pk
        g.packed = True
        if self.mesh is not None and g.sharding in (
            ROW_WISE, TABLE_WISE, TABLE_ROW_WISE
        ):
            D = self.num_shards
            g.p_shards = D
            pps = g.padded_rows // D // g.spr
            g.p_rows = D * (pps + 1)
        else:
            g.p_shards = 1
            g.p_rows = g.padded_rows // g.spr + 1  # + trailing scratch

    # init-value generation chunk (logical rows). Rationale: a 40M-row
    # dim-16 fp32 value array is 20 GB ON DEVICE under T(8,128) lane
    # padding (the round-3 OOM class) and 2.5 GB over the host link if
    # generated host-side (H2D at init is what degrades this
    # container's tunnel before the pipeline ever runs). Chunked
    # generation keys each block independently (fold_in(table_key,
    # chunk_idx)) so EVERY layout — packed/unpacked, merged/unmerged,
    # sharded/single — produces identical values from identical chunks.
    _INIT_CHUNK = 4 << 20

    def _member_chunks(self, key, m, rows: int):
        """Yield (row_offset, values [n, m.dim] f32) blocks for member
        table ``m`` — the single source of init values for every
        layout path."""
        import zlib

        base = jax.random.fold_in(
            key, zlib.crc32(m.name.encode()) & 0x7FFFFFFF
        )
        fn = parse_init_fn(m.init_fn) or default_emb_init
        pos, c = 0, 0
        while pos < rows:
            n = min(self._INIT_CHUNK, rows - pos)
            sub = jax.random.fold_in(base, c)
            # fan_rows: scale-sensitive inits (1/sqrt(rows), xavier/he
            # fans) must use the TABLE's rows, not the chunk's — a
            # 40M-row table chunked at 4M would otherwise initialize
            # ~3x too wide with a differently-scaled tail chunk
            yield pos, fn(sub, (n, m.dim), jnp.float32, fan_rows=rows)
            pos += n
            c += 1

    def _init_packed_group(self, g: _Group, key: jax.Array) -> jnp.ndarray:
        """Device-side init of a packed group under ONE jit: weights
        land in their 128-lane slot positions via per-lane strided
        updates (logical rows r with r % spr == s occupy lane block
        s of consecutive physical rows), so no [padded_rows, slot]
        intermediate and no multi-GB H2D ever exists. State lanes
        start from their fill template."""
        fills = self.optimizer.row_state_init()
        import numpy as np_

        lane_fill = np_.zeros((128,), np_.float32)
        off_l = g.dim
        for name, width in g.state_widths:
            fill = float(fills.get(name, 0.0))
            if fill:
                for s in range(g.spr):
                    lo = s * g.slot + off_l
                    lane_fill[lo : lo + width] = fill
            off_l += width

        spr, slot = g.spr, g.slot
        if g.p_shards > 1:
            pps = g.p_rows // g.p_shards - 1
        else:
            pps = g.p_rows - 1

        def _phys_of(r: int) -> int:
            # logical row -> physical row under the (possibly
            # per-shard-scratch) packed layout; rows_per_shard is a
            # multiple of spr so block arithmetic is exact
            if g.p_shards > 1:
                rps = g.padded_rows // g.p_shards
                return (r // rps) * (pps + 1) + (r % rps) // spr
            return r // spr

        def _build(key):
            packed = jnp.broadcast_to(
                jnp.asarray(lane_fill), (g.p_rows, 128)
            ).astype(jnp.float32)
            # scratch rows may keep the fill template (never read)
            rps = (
                g.padded_rows // g.p_shards if g.p_shards > 1 else None
            )
            for t in g.specs:
                off = g.offsets[t.name]
                coff = 0
                for m in (t.merged_from or (t,)):
                    for cpos, vals in self._member_chunks(
                        key, m, t.rows
                    ):
                        a = off + cpos  # global logical start
                        n = vals.shape[0]
                        # physical rows are only consecutive WITHIN a
                        # shard block (scratch rows sit between) —
                        # split the chunk at shard boundaries
                        segs = []
                        x = a
                        while x < a + n:
                            end = (
                                min((x // rps + 1) * rps, a + n)
                                if rps else a + n
                            )
                            segs.append((x, end))
                            x = end
                        for sa, se in segs:
                            vseg = vals[sa - a : se - a]
                            for s in range(spr):
                                i0 = (s - sa) % spr
                                if i0 >= se - sa:
                                    continue
                                p0 = _phys_of(sa + i0)
                                col = s * slot + coff
                                packed = jax.lax.dynamic_update_slice(
                                    packed,
                                    vseg[i0::spr].astype(jnp.float32),
                                    (p0, col),
                                )
                    coff += m.dim
            return packed

        return jax.jit(_build)(key)

    def _packed_phys(self, g: _Group, flat_ids):
        """Logical megatable row -> (physical row, in-row slot lane,
        invalid mask) under the GLOBAL packed layout (p_shards-aware).
        Traceable; invalid ids map to pid == g.p_rows (an OOB index —
        gather with mode='fill' returns zeros, scatter mode='drop'
        skips)."""
        invalid = flat_ids < 0
        if g.p_shards > 1:
            rps = g.padded_rows // g.p_shards
            pps = rps // g.spr
            o = flat_ids // rps
            l = flat_ids - o * rps
            pid = jnp.where(invalid, g.p_rows, o * (pps + 1) + l // g.spr)
            lane = jnp.where(invalid, 0, l % g.spr)
        else:
            pid = jnp.where(invalid, g.p_rows, flat_ids // g.spr)
            lane = jnp.where(invalid, 0, flat_ids % g.spr)
        return pid.astype(jnp.int32), lane.astype(jnp.int32), invalid

    # -- packed-layout converters (device or numpy arrays) ---------------

    def pack_group(self, g: _Group, w, srows) -> jnp.ndarray:
        """[padded_rows, dim] weights + {name: [padded_rows, width]} row
        state -> [p_rows, 128] physical rows (last row = scratch).

        Packing runs HOST-SIDE in numpy: a device-side
        ``[padded_rows, slot]`` intermediate lane-pads slot -> 128 under
        the TPU's T(8,128) tiling (27.7 GB at Criteo scale — the round-3
        bench OOM), while the numpy body is slot lanes wide for real."""
        import numpy as np_

        parts = [np_.asarray(jax.device_get(w), np_.float32)]
        for name, _ in g.state_widths:
            parts.append(np_.asarray(jax.device_get(srows[name]), np_.float32))
        body = np_.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        out = np_.zeros((g.p_rows, 128), np_.float32)
        if g.p_shards > 1:
            D = g.p_shards
            pps = g.p_rows // D - 1
            blocks = body.reshape(D, pps, g.spr * g.slot)
            out.reshape(D, pps + 1, 128)[
                :, :pps, : g.spr * g.slot
            ] = blocks
        else:
            out[:-1, : g.spr * g.slot] = body.reshape(
                g.padded_rows // g.spr, g.spr * g.slot
            )
        return jnp.asarray(out)

    def unpack_group(self, g: _Group, packed):
        """Inverse of pack_group; works on device or numpy arrays."""
        if g.p_shards > 1:
            D = g.p_shards
            pps = g.p_rows // D - 1
            body = packed.reshape(D, pps + 1, 128)[
                :, :pps, : g.spr * g.slot
            ].reshape(g.padded_rows, g.slot)
        else:
            body = packed[:-1, : g.spr * g.slot].reshape(
                g.padded_rows, g.slot
            )
        w = body[:, : g.dim]
        srows = {}
        off = g.dim
        for name, width in g.state_widths:
            srows[name] = body[:, off : off + width]
            off += width
        return w, srows

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------

    def init(self, key: jax.Array) -> Dict[str, jnp.ndarray]:
        """Init megatable weights; per-table init fn honored via row slices.

        Per-table keys are derived from the table NAME (not iteration
        order) so initialization is identical under any grouping /
        sharding plan — required for the sharded-vs-single-device
        equivalence guarantees."""
        out: Dict[str, jnp.ndarray] = {}
        for gk, g in self.groups.items():
            if g.packed:
                out[gk] = self._device_put_table(
                    self._init_packed_group(g, key), g
                )
                continue
            host = g.sharding == HOST_OFFLOAD
            dt = jnp.float32 if host else g.store_dtype

            def _build(key, g=g, dt=dt):
                # ONE traced build in the STORE dtype: eager per-table
                # sets kept a full fp32 intermediate alive (full-size
                # Criteo: a 16 GB array beside the 8 GB bf16 result —
                # the r5 full-size stage OOM), while under jit XLA
                # aliases the updates in place. Values come from the
                # shared CHUNKED generator (_member_chunks) so every
                # layout — packed/unpacked, merged/unmerged, sharded/
                # single — initializes bit-identically.
                w = jnp.zeros((g.padded_rows, g.dim), dt)
                for t in g.specs:
                    off = g.offsets[t.name]
                    coff = 0
                    for m in (t.merged_from or (t,)):
                        for cpos, vals in self._member_chunks(
                            key, m, t.rows
                        ):
                            w = jax.lax.dynamic_update_slice(
                                w, vals.astype(dt), (off + cpos, coff)
                            )
                        coff += m.dim
                return w

            w = jax.jit(_build)(key)
            if host:
                import numpy as np_

                self.host_tables[gk] = np_.array(
                    jax.device_get(w), np_.float32
                )
                continue
            out[gk] = self._device_put_table(w, g)
        return out

    def init_opt_state(self) -> Dict[str, Any]:
        import numpy as np_

        out: Dict[str, Any] = {}
        for gk, g in self.groups.items():
            if g.packed:
                # row state lives inside the packed rows; only shared
                # scalars (e.g. the adam step count) remain here
                out[gk] = self.optimizer.scalar_state_init()
                continue
            st = self.optimizer.init_state(
                g.padded_rows, g.dim, g.col_segments or None
            )
            if g.sharding == HOST_OFFLOAD:
                self.host_opt[gk] = {
                    k: np_.array(jax.device_get(v))
                    for k, v in st.items()
                }
                continue
            out[gk] = jax.tree_util.tree_map(
                lambda x: self._device_put_table(x, g)
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == g.padded_rows
                else x,
                st,
            )
        return out

    def _array_spec(self, x: Any, g: _Group) -> P:
        nd = getattr(x, "ndim", 0)
        if g.packed and nd >= 1 and x.shape[0] == g.p_rows:
            # packed physical rows: per-shard blocks of pps+1 rows
            # shard over the data axis; p_shards == 1 replicates
            if g.p_shards > 1:
                return P(self._ax, *([None] * (nd - 1)))
            return P()
        if g.sharding in (ROW_WISE, TABLE_WISE, TABLE_ROW_WISE):
            if nd >= 1 and x.shape[0] == g.padded_rows:
                return P(self._ax, *([None] * (nd - 1)))
            return P()
        if g.sharding == COLUMN_WISE:
            # full-dim arrays shard on the dim axis; row-wise state
            # ([rows, 1]) and scalars replicate (each shard computes
            # identical values via psum'd dim reductions)
            if nd >= 2 and x.shape[-1] == g.dim and x.shape[0] == g.padded_rows:
                return P(*([None] * (nd - 1)), self._ax)
            return P()
        return P()

    def _device_put_table(self, x: jnp.ndarray, g: _Group) -> jnp.ndarray:
        if self.mesh is None:
            return x
        return jax.device_put(x, NamedSharding(self.mesh, self._array_spec(x, g)))

    def table_shardings(self) -> Dict[str, Any]:
        """NamedSharding per group key (for checkpoint/jit out_shardings)."""
        out = {}
        for gk, g in self.groups.items():
            if g.sharding == HOST_OFFLOAD:
                continue  # not part of the device state
            if self.mesh is None:
                out[gk] = None
            else:
                shape = (
                    (g.p_rows, 128) if g.packed
                    else (g.padded_rows, g.dim)
                )
                out[gk] = NamedSharding(
                    self.mesh,
                    self._array_spec(
                        jax.ShapeDtypeStruct(shape, jnp.float32), g
                    ),
                )
        return out

    # ------------------------------------------------------------------
    # forward lookup
    # ------------------------------------------------------------------

    def lookup(
        self,
        tables: Dict[str, jnp.ndarray],
        sparse: Dict[str, SparseField],
        sequence_sparse: Optional[Dict[str, SparseField]] = None,
        feature_filter: Optional[set] = None,
        host_rows: Optional[Dict[str, jnp.ndarray]] = None,
        staged: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Returns (outputs, residuals).

        staged: pre-exchanged id buffers from stage_route() (issued in
        the PREVIOUS step's jit for this batch) — the a2a-routed groups
        skip their ids all-to-all and serve rows directly.

        outputs[key]: [B, dim] pooled, or [B, L, dim] for sequence lookups.
        residuals: per-group routing info for update().
        feature_filter restricts the lookup to the named features (the
        per-tower export/serving path feeds batches that only contain one
        tower's features); fused groups with no surviving lookup are
        skipped entirely.
        host_rows: for HOST_OFFLOAD groups, the batch's pre-gathered
        rows ([n_flat, dim], invalid ids zeroed) from host_prefetch —
        shipped with the batch, so no device table is touched.
        """
        sequence_sparse = sequence_sparse or {}
        outputs: Dict[str, jnp.ndarray] = {}
        residuals: Dict[str, Any] = {}
        for gk, lks in self._lookups_by_group.items():
            if feature_filter is not None:
                lks = [lk for lk in lks
                       if lk.feature_name in feature_filter]
                if not lks:
                    continue
            g = self.groups[gk]
            flat_ids, plan = self._flatten_group_ids(g, lks, sparse, sequence_sparse)
            if g.sharding == HOST_OFFLOAD:
                if host_rows is None or gk not in host_rows:
                    raise ValueError(
                        f"group {gk} is host_offload but the batch "
                        "carries no prefetched rows; call "
                        "engine.host_prefetch_into(batch) before "
                        "device_put"
                    )
                rows = host_rows[gk].astype(jnp.float32)
            else:
                rows = self._dist_gather(
                    tables[gk], flat_ids, g,
                    staged_recv=(staged or {}).get(gk),
                    plan=plan,
                )
            self._emit_outputs(g, lks, plan, rows, outputs)
            residuals[gk] = (flat_ids, plan)
        return outputs, residuals

    def stage_route(
        self,
        sparse: Dict[str, SparseField],
        sequence_sparse: Optional[Dict[str, SparseField]] = None,
        skip_groups: Optional[set] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Issue the ids all-to-all for every a2a-routed group AHEAD of
        its lookup — the TrainPipelineSparseDist analogue (reference
        tzrec/utils/dist_util.py:221-303 starts batch N+1's KJT input
        dist during batch N's dense compute). Called on batch N+1's
        sparse features INSIDE step N's jit: the exchange depends only
        on batch N+1's ids, so XLA's latency-hiding scheduler runs the
        collective concurrently with step N's dense fwd/bwd instead of
        serializing it at the top of step N+1.

        Returns {group_key: recv_ids [D*D, C]} — pass as ``staged=`` to
        lookup() in the NEXT step. Ids are data, not parameters, so the
        math is bit-identical to the unpipelined path (tested in
        tests/test_sparse_overlap.py). Groups that don't exchange ids
        (data_parallel / column_wise / host tiers, allgather mode, no
        mesh) are simply absent; packed row-sharded groups route like
        unpacked ones (the exchange carries logical megatable ids
        either way).
        """
        sequence_sparse = sequence_sparse or {}
        staged: Dict[str, jnp.ndarray] = {}
        if self.mesh is None or self._exchange_mode == "allgather":
            return staged
        for gk, lks in self._lookups_by_group.items():
            g = self.groups[gk]
            if skip_groups and gk in skip_groups:
                continue
            if g.sharding in (
                DATA_PARALLEL, COLUMN_WISE, HOST_OFFLOAD
            ):
                continue
            flat_ids, _ = self._flatten_group_ids(
                g, lks, sparse, sequence_sparse
            )
            n = flat_ids.shape[0]
            pad = (-n) % self.num_shards
            if pad:
                flat_ids = jnp.concatenate([
                    flat_ids, jnp.full((pad,), -1, flat_ids.dtype)
                ])
            rows_per_shard = g.padded_rows // self.num_shards

            def _route_fn(ids_loc, _rps=rows_per_shard):
                cap = self._a2a_capacity(ids_loc.shape[0])
                _, _, _, send_ids = self._a2a_route(ids_loc, _rps, cap)
                return self._xchg(send_ids)

            staged[gk] = jax.shard_map(
                _route_fn,
                mesh=self.mesh,
                in_specs=P(self._ax),
                out_specs=P(self._ax, None),
            )(flat_ids)
        return staged

    def _flatten_group_ids(self, g, lks, sparse, sequence_sparse):
        """Concat all features' ids (offset into megatable) + per-feature
        slicing plan. Plan entries:
        (lk, start, count, kind, seg_or_none, weights_or_none, lengths)."""
        ids_list = []
        plan = []
        pos = 0
        for lk in lks:
            off = g.offsets[lk.table_name]
            if lk.is_sequence:
                field = sequence_sparse[lk.feature_name]
                shape = tuple(field.values.shape)  # [B, L] or [B, L, K]
                count = int(np.prod(shape))
                v = field.values.astype(jnp.int32)
                # keep -1 (padding) invalid across the megatable offset
                ids = jnp.where(v >= 0, v + off, -1).reshape(-1)
                plan.append(PlanEntry(
                    lk, pos, count, "seq", None, None, field.lengths, shape
                ))
                ids_list.append(ids)
                pos += count
            else:
                field = sparse[lk.feature_name]
                if field.is_fixed:
                    b, L = field.values.shape
                    v = field.values.astype(jnp.int32)
                    ids = jnp.where(v >= 0, v + off, -1).reshape(-1)
                    # seg=None: fixed-shape fields pool by reshape-sum
                    # (a [B*L, d] -> [B, L, d].sum(1) is a cheap
                    # reduction; the seg scatter path cost a per-feature
                    # segment_sum — ~26 of them per DeepFM step)
                    w = (
                        field.weights.reshape(-1)
                        if field.weights is not None
                        else None
                    )
                    lengths = jnp.full((b,), L, jnp.int32)
                    plan.append(PlanEntry(
                        lk, pos, b * L, "pool", None, w, lengths, (b, L)
                    ))
                    ids_list.append(ids)
                    pos += b * L
                else:
                    n = field.values.shape[0]
                    b = field.lengths.shape[0]
                    if field.segments is not None:
                        # multi-host: per-host packed streams carry
                        # mid-stream padding, so the host precomputes
                        # global segment ids (utils/multihost.py)
                        seg = field.segments.astype(jnp.int32)
                        sorted_seg = False
                    else:
                        seg = segment_ids_from_lengths(field.lengths, n)
                        sorted_seg = True  # nondecreasing by construction
                    v = field.values.astype(jnp.int32)
                    # guard BOTH padding (seg==b) and in-row -1 markers so
                    # the megatable offset can't alias a foreign table
                    valid = (seg < b) & (v >= 0)
                    ids = jnp.where(valid, v + off, -1)
                    plan.append(PlanEntry(
                        lk, pos, n, "pool", seg, field.weights,
                        field.lengths, (b, n), sorted_seg,
                    ))
                    ids_list.append(ids)
                    pos += n
        flat = (
            jnp.concatenate(ids_list)
            if len(ids_list) > 1
            else ids_list[0]
        )
        return flat, plan

    def _emit_outputs(self, g, lks, plan, rows, outputs):
        for e in plan:
            lk, start, count, kind = e.lk, e.start, e.count, e.kind
            seg, w, lengths, shape = e.seg, e.weights, e.lengths, e.shape
            # merged co-keyed lookups: one gather/pool, sliced into each
            # fused table's output; ordinary lookups emit whole-dim
            outs = lk.col_outputs or ((lk.key, 0, g.dim),)
            r = jax.lax.dynamic_slice_in_dim(rows, start, count, axis=0)
            if kind == "seq":
                if len(shape) == 3:
                    b, L, K = shape
                    # multi-value steps: sum-pool the K id slots
                    # (segment_reduce equivalent, reference
                    # embedding.py:1296-1309); invalid ids gathered 0
                    full = r.reshape(b, L, K, g.dim).sum(axis=2)
                else:
                    b, L = shape
                    full = r.reshape(b, L, g.dim)
                for okey, coff, cw in outs:
                    outputs[okey] = full[..., coff : coff + cw]
                continue
            b = lengths.shape[0]
            if w is not None:
                r = r * w[:, None]
            if seg is not None and shape[1] != 0 and kind == "pool":
                # locally-built segments (segment_ids_from_lengths) are
                # nondecreasing; multihost-provided ones aren't
                # guaranteed, so the sorted hint keys off the entry
                pooled = jax.ops.segment_sum(
                    r, seg, num_segments=b + 1,
                    indices_are_sorted=bool(
                        getattr(e, "sorted_seg", False)
                    ),
                )[:b]
            else:
                pooled = r.reshape(b, -1, g.dim).sum(axis=1)
            if lk.combiner == "mean":
                denom = jnp.maximum(lengths.astype(jnp.float32), 1.0)
                pooled = pooled / denom[:, None]
            for okey, coff, cw in outs:
                outputs[okey] = pooled[:, coff : coff + cw]

    # ------------------------------------------------------------------
    # distributed gather
    # ------------------------------------------------------------------

    def _packed_gather(self, weight, flat_ids, g: _Group):
        """Packed rows: gather the 128-lane physical row, select the
        logical slot with a one-hot multiply (pure VPU — a
        take_along_axis here lowers to a second descriptor-bound
        gather and costs ~2x)."""
        n = flat_ids.shape[0]
        pid, lane, _ = self._packed_phys(g, flat_ids)
        phys = weight.at[pid].get(mode="fill", fill_value=0.0)
        body = phys[:, : g.spr * g.slot].reshape(n, g.spr, g.slot)
        onehot = jax.nn.one_hot(lane, g.spr, dtype=jnp.float32)
        return (body * onehot[:, :, None]).sum(axis=1)[:, : g.dim]

    def _packed_gather_dense_lane(self, weight, flat_ids, g: _Group,
                                  plan):
        """Forward with the dense lane: big-table slices go through one
        compacted physical-row gather; dense-lane slices become fused
        one-hot matmuls against the unpacked region weights (exact row
        copies — no descriptor cost). Pieces reassemble in plan order,
        which is the flat stream's layout."""
        spr, slot, dim = g.spr, g.slot, g.dim
        s_phys = g.dense_rows // spr
        body = weight[:s_phys, : spr * slot].reshape(g.dense_rows, slot)
        w_region = body[:, :dim]
        big = [e for e in plan if e.lk.table_name not in g.dense_tables]
        rows_big = None
        if big:
            ids_big = jnp.concatenate([
                jax.lax.dynamic_slice_in_dim(flat_ids, e.start, e.count)
                for e in big
            ])
            rows_big = self._packed_gather(weight, ids_big, g)
        pieces = []
        bpos = 0
        for e in plan:
            if e.lk.table_name in g.dense_tables:
                off = g.offsets[e.lk.table_name]
                rows_t = int(self._specs[e.lk.table_name].rows)
                idsl = jax.lax.dynamic_slice_in_dim(
                    flat_ids, e.start, e.count
                ) - off
                oh = jax.nn.one_hot(idsl, rows_t, dtype=jnp.float32)
                pieces.append(jax.lax.dot_general(
                    oh, w_region[off : off + rows_t],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ))
            else:
                pieces.append(jax.lax.dynamic_slice_in_dim(
                    rows_big, bpos, e.count
                ))
                bpos += e.count
        return (
            jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]
        )

    def _dist_gather(
        self, weight: jnp.ndarray, flat_ids: jnp.ndarray, g: _Group,
        staged_recv: Optional[jnp.ndarray] = None,
        plan: Optional[List[PlanEntry]] = None,
    ) -> jnp.ndarray:
        """rows[i] = weight[flat_ids[i]] with cross-shard exchange.

        flat_ids == -1 (invalid padding) returns zeros.
        staged_recv: this batch's pre-exchanged owner-bucketed ids from
        stage_route() — the a2a path serves rows without re-running the
        ids all-to-all.
        plan: the lookup slicing plan — activates the forward dense
        lane (small-table entries become one-hot MXU matmuls, exact:
        each one-hot row has a single 1, so the dot copies the f32
        weight row bit-for-bit).
        """
        if g.packed and (
            self.mesh is None or g.sharding == DATA_PARALLEL
        ):
            if plan is not None and g.dense_rows:
                dense_set = g.dense_tables
                if any(e.lk.table_name in dense_set for e in plan):
                    return self._packed_gather_dense_lane(
                        weight, flat_ids, g, plan
                    )
            return self._packed_gather(weight, flat_ids, g)
        if self.mesh is None or g.sharding == DATA_PARALLEL:
            # negatives must be EXPLICITLY out-of-bounds: fill-mode
            # treatment of a -1 index is lowering-dependent (some
            # backends wrap numpy-style to the LAST row instead of
            # filling — observed on the CPU single-device lowering)
            safe = jnp.where(flat_ids < 0, weight.shape[0], flat_ids)
            return weight.at[safe].get(mode="fill", fill_value=0.0)

        # shard_map splits flat_ids over the mesh axis: pad to a
        # multiple of num_shards with invalid ids (fixed-shape [B,1]
        # fields make the flat count arbitrary), slice the rows back
        n = flat_ids.shape[0]
        pad = (-n) % self.num_shards
        if pad:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.full((pad,), -1, flat_ids.dtype)]
            )
            return self._dist_gather(
                weight, flat_ids, g, staged_recv=staged_recv
            )[:n]

        if g.sharding == COLUMN_WISE:
            # each shard gathers its dim-slice for EVERY shard's ids,
            # then an all_to_all swaps (sharded-by-ids) <-> (sharded-by
            # -dim): [D*N_loc, dim/D] -> [N_loc, dim]. Rides ICI with
            # the same bytes as the row_wise psum_scatter.
            def _cw_fn(w_loc, ids_loc):
                all_ids = jax.lax.all_gather(
                    ids_loc, self._ax, tiled=True
                )  # [D * N_loc]
                safe = jnp.where(all_ids < 0, w_loc.shape[0], all_ids)
                r = w_loc.at[safe].get(mode="fill", fill_value=0.0)
                return jax.lax.all_to_all(
                    r, self._ax, split_axis=0, concat_axis=1, tiled=True
                )  # [N_loc, dim]

            return jax.shard_map(
                _cw_fn,
                mesh=self.mesh,
                in_specs=(P(None, self._ax), P(self._ax)),
                out_specs=P(self._ax, None),
            )(weight, flat_ids)

        rows_per_shard = g.padded_rows // self.num_shards
        pps = rows_per_shard // g.spr if g.packed else 0

        def _local_rows(w_loc, lrow, ok):
            """Owner-side local gather: local logical rows ``lrow``
            (masked by ``ok``) -> [..., dim] row vectors, zeros where
            not ok. Packed groups gather the 128-lane physical row of
            their local [pps+1, 128] block and slot-select (one-hot
            VPU multiply, same trick as the single-device branch)."""
            if not g.packed:
                r = w_loc[jnp.where(ok, lrow, 0)]
                return jnp.where(ok[..., None], r,
                                 jnp.zeros((), w_loc.dtype))
            pid = jnp.where(ok, lrow // g.spr, pps + 1).astype(jnp.int32)
            lane = jnp.where(ok, lrow % g.spr, 0).astype(jnp.int32)
            phys = w_loc.at[pid].get(mode="fill", fill_value=0.0)
            body = phys[..., : g.spr * g.slot].reshape(
                *pid.shape, g.spr, g.slot
            )
            onehot = jax.nn.one_hot(lane, g.spr, dtype=jnp.float32)
            return (body * onehot[..., None]).sum(axis=-2)[..., : g.dim]

        def _dense_fn(w_loc, ids_loc):
            # O(D)-redundant but skew-proof: every shard serves ALL ids
            # w_loc: [rows/D, dim] (or [pps+1, 128] packed); ids_loc: [N_loc]
            my = jax.lax.axis_index(self._ax)
            all_ids = jax.lax.all_gather(ids_loc, self._ax)  # [D, N_loc]
            owner = all_ids // rows_per_shard
            local_row = all_ids - owner * rows_per_shard
            mine = (owner == my) & (all_ids >= 0)
            r = _local_rows(w_loc, local_row, mine)  # [D, N_loc, dim]
            # sum over shards, return my chunk: [N_loc, dim]
            return jax.lax.psum_scatter(
                r, self._ax, scatter_dimension=0, tiled=False
            )

        def _a2a_fn(w_loc, ids_loc, recv=None):
            # owner-bucketed exchange (TorchRec KJT input_dist /
            # pooled-emb output_dist, reference dist_util.py:335-376):
            # route ids to owners, gather locally, route rows back.
            # Per-shard bytes ~ 2*(D-1)*C*dim vs (D-1)*N_loc*dim for
            # _dense_fn — a D/(2*alpha) reduction. ``recv`` (from
            # stage_route, exchanged in the previous step's jit) skips
            # the ids all-to-all; the local route metadata recomputes
            # deterministically from ids_loc.
            D = self.num_shards
            my = jax.lax.axis_index(self._ax)
            cap = self._a2a_capacity(ids_loc.shape[0])
            route = self._a2a_route(ids_loc, rows_per_shard, cap)
            order, fits, flat_idx, send_ids = route
            if recv is None:
                recv = self._xchg(send_ids)  # [D, C]: recv[s] = ids src s routed to me
            ok = recv >= 0
            rows = _local_rows(w_loc, recv - my * rows_per_shard, ok)
            back = self._xchg(rows)  # [D, C, dim]: back[d] = rows for my ids routed to d
            got = back.reshape(D * cap, -1)[
                jnp.clip(flat_idx, 0, D * cap - 1)
            ]
            got = jnp.where(fits[:, None], got, jnp.zeros((), back.dtype))
            return (
                jnp.zeros((ids_loc.shape[0], g.dim), back.dtype)
                .at[order].set(got)
            )

        mode = self._exchange_mode
        use_staged = staged_recv is not None and mode != "allgather"
        if mode == "allgather":
            fn = _dense_fn
        elif mode == "a2a":
            fn = _a2a_fn
        else:  # auto: a2a fast path, exact dense fallback on overflow
            def fn(w_loc, ids_loc, recv=None):
                over = self._a2a_overflow(
                    ids_loc, rows_per_shard,
                    self._a2a_capacity(ids_loc.shape[0]),
                )
                if recv is None:
                    return jax.lax.cond(over, _dense_fn, _a2a_fn,
                                        w_loc, ids_loc)
                return jax.lax.cond(
                    over, lambda w, i, _r: _dense_fn(w, i), _a2a_fn,
                    w_loc, ids_loc, recv,
                )

        if use_staged:
            return jax.shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(
                    P(self._ax, None), P(self._ax), P(self._ax, None)
                ),
                out_specs=P(self._ax, None),
            )(weight, flat_ids, staged_recv)
        return jax.shard_map(
            fn,
            mesh=self.mesh,
            in_specs=(P(self._ax, None), P(self._ax)),
            out_specs=P(self._ax, None),
        )(weight, flat_ids)

    # -- owner-bucketed all-to-all helpers ------------------------------

    def _xchg(self, x: jnp.ndarray) -> jnp.ndarray:
        """Owner exchange: ``x[d]`` (local [D, ...]) is delivered to
        shard d; returns [D, ...] with entry s from source shard s.

        Flat mesh: one all_to_all. Two-level mesh: HIERARCHICAL — an
        intra-host all_to_all over the ici axis regroups buckets by
        destination chip-index, then a cross-host all_to_all over the
        dcn axis ships ONE host-aggregated slab per host pair (the
        INTRA/CROSS_NODE bandwidth contract of the reference planner,
        plan_util.py:111-114: DCN carries H-1 aggregated messages
        instead of (H-1)*C^2 chip-pair messages). The factoring is a
        pure permutation — numerics identical to the flat exchange
        (tests/test_two_level_mesh.py)."""
        if self._hier is None:
            return jax.lax.all_to_all(
                x, self._ax, split_axis=0, concat_axis=0
            )
        H, C = self._hier
        xr = x.reshape(H, C, *x.shape[1:])
        s1 = jax.lax.all_to_all(xr, ICI_AXIS, split_axis=1, concat_axis=1)
        s2 = jax.lax.all_to_all(s1, DCN_AXIS, split_axis=0, concat_axis=0)
        return s2.reshape(x.shape)

    def _a2a_capacity(self, n_local: int) -> int:
        """Static per-(src,dst) bucket capacity for n_local ids."""
        D = self.num_shards
        c = int(np.ceil(self._a2a_capacity_factor * n_local / D))
        return max(1, min(c, n_local))

    def _a2a_route(self, ids_loc, rows_per_shard, cap):
        """Bucketize local ids by owning shard.

        Returns (order, fits, flat_idx, send_ids[D, C]): a stable
        owner-sort, whether each sorted id fit its bucket, its slot in
        the flattened send buffer (OOB = dropped), and the buffer with
        empty slots = -1.
        """
        D = self.num_shards
        n = ids_loc.shape[0]
        valid = ids_loc >= 0
        owner = jnp.where(valid, ids_loc // rows_per_shard, D)
        order = jnp.argsort(owner, stable=True)
        so = owner[order]
        sids = ids_loc[order]
        seg_start = jnp.searchsorted(so, jnp.arange(D, dtype=so.dtype))
        rank = (
            jnp.arange(n, dtype=jnp.int32)
            - seg_start[jnp.clip(so, 0, D - 1)].astype(jnp.int32)
        )
        fits = (rank < cap) & (so < D)
        flat_idx = jnp.where(fits, so.astype(jnp.int32) * cap + rank,
                             D * cap)
        send_ids = (
            jnp.full((D * cap,), -1, jnp.int32)
            .at[flat_idx].set(sids.astype(jnp.int32), mode="drop")
            .reshape(D, cap)
        )
        return order, fits, flat_idx, send_ids

    def _a2a_overflow(self, ids_loc, rows_per_shard, cap):
        """Uniform (psum'd) predicate: does ANY shard's bucket overflow?"""
        D = self.num_shards
        valid = ids_loc >= 0
        owner = jnp.where(valid, ids_loc // rows_per_shard, 0)
        counts = (
            jnp.zeros((D,), jnp.int32)
            .at[owner].add(valid.astype(jnp.int32), mode="drop")
        )
        over = (counts > cap).any().astype(jnp.int32)
        return jax.lax.psum(over, self._ax) > 0

    # ------------------------------------------------------------------
    # backward + fused optimizer update
    # ------------------------------------------------------------------

    def update(
        self,
        tables: Dict[str, jnp.ndarray],
        opt_state: Dict[str, Any],
        residuals: Dict[str, Any],
        out_grads: Dict[str, jnp.ndarray],
        lr_scale: jnp.ndarray,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Apply fused sparse updates from pooled-output grads."""
        new_tables = dict(tables)
        new_state = dict(opt_state)
        lr = jnp.asarray(lr_scale, jnp.float32) * self.optimizer.base_lr
        for gk, (flat_ids, plan) in residuals.items():
            g = self.groups[gk]
            if g.sharding == HOST_OFFLOAD:
                continue  # grads exit jit via host_row_grads()
            grads = self._flat_row_grads(g, plan, out_grads)
            if grads is None:
                continue
            # static unique-row bound: Σ min(slots, table rows) over the
            # group's lookups (+1 OOB sentinel) — shrinks the
            # optimizer's gather/scatter length (dropped rows cost full
            # scatter time on TPU)
            u_cap = 1 + sum(
                min(int(e.count), int(self._specs[e.lk.table_name].rows))
                for e in plan
            )
            if g.packed:
                # sharded row-like groups take the shard_map update
                # (p_shards == num_shards; under the 1-chip
                # TZREC_FORCE_SHARDED test hook that is a 1-wide mesh)
                if self.mesh is not None and g.sharding != DATA_PARALLEL:
                    new_tables[gk], new_state[gk] = (
                        self._dist_packed_update(
                            g, tables[gk], opt_state.get(gk, {}),
                            flat_ids, grads, lr, u_cap=u_cap,
                        )
                    )
                else:
                    new_tables[gk], new_state[gk] = self._packed_update(
                        g, tables[gk], opt_state.get(gk, {}), flat_ids,
                        grads, lr, u_cap=u_cap, plan=plan,
                    )
                continue
            new_tables[gk], new_state[gk] = self._dist_update(
                tables[gk], opt_state[gk], flat_ids, grads, g, lr,
                u_cap=u_cap,
            )
        return new_tables, new_state

    def _dedup_global(self, flat_ids, grads, oob, u_cap):
        """Global sort-dedup: (gsum [cap, d], uids [cap], cap).

        ONE sorted scatter-add dedups grads AND compacts the unique
        ids: the id rides as two fp32 columns (hi/lo base-4096 split —
        exact for any id < 2^24 * 4096; only the head row of a run
        contributes) plus a head-count column distinguishing live
        ranks from empty ones. Separate segment_sum + uids scatter
        cost 5.2 ms at 213k rows on v5e; this fused 23-col sorted
        scatter runs 2.9 ms."""
        n = flat_ids.shape[0]
        ids = jnp.where(flat_ids < 0, oob, flat_ids)
        order = jnp.argsort(ids)
        sids = ids[order]
        sg = grads[order]
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (sids[1:] != sids[:-1]).astype(jnp.int32)]
        )
        seg = jnp.cumsum(head) - 1
        cap = n if u_cap is None else min(int(u_cap), n)
        headf = head.astype(jnp.float32)
        payload = jnp.concatenate([
            sg,
            ((sids // 4096).astype(jnp.float32) * headf)[:, None],
            ((sids % 4096).astype(jnp.float32) * headf)[:, None],
            headf[:, None],
        ], axis=1)
        out = jax.ops.segment_sum(
            payload, seg, num_segments=cap, indices_are_sorted=True
        )
        d_cols = sg.shape[1]
        gsum = out[:, :d_cols]
        # reconstruct in int32: hi*4096 can exceed fp32's 2^24 integer
        # range, so the multiply must happen after the (exact) casts
        uids = jnp.where(
            out[:, d_cols + 2] > 0,
            out[:, d_cols].astype(jnp.int32) * 4096
            + out[:, d_cols + 1].astype(jnp.int32),
            oob,
        )
        return gsum, uids, cap

    def _dense_lane_update(self, g, table, flat_ids, grads, lr, plan):
        """Update the dense-lane region (see _Group.dense_rows).

        Per dense entry: grad_table = onehot(local_ids)^T @ grads — a
        fused MXU matmul (no sort, no scatter); invalid ids (< 0 after
        the offset subtraction) one-hot to zero rows. The whole region
        then runs the optimizer densely (zero-grad rows are identity
        by the _DENSE_LANE_OPTS gate) and writes back as ONE contiguous
        block. Returns the updated table."""
        spr, slot, dim = g.spr, g.slot, g.dim
        s_phys = g.dense_rows // spr
        region = table[:s_phys]
        body = region[:, : spr * slot].reshape(g.dense_rows, slot)
        w_r = body[:, :dim]
        srows = {}
        off_l = dim
        for name, width in g.state_widths:
            srows[name] = body[:, off_l : off_l + width]
            off_l += width
        grad_region = jnp.zeros((g.dense_rows, dim), jnp.float32)
        for e in plan:
            off = g.offsets[e.lk.table_name]
            rows_t = int(self._specs[e.lk.table_name].rows)
            idsl = jax.lax.dynamic_slice_in_dim(
                flat_ids, e.start, e.count
            ) - off
            ge = jax.lax.dynamic_slice_in_dim(grads, e.start, e.count)
            oh = jax.nn.one_hot(idsl, rows_t, dtype=jnp.float32)
            gt = jax.lax.dot_general(
                oh, ge, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            grad_region = grad_region.at[off : off + rows_t].add(gt)
        new_rows, new_srows, _ = self.optimizer.apply_rows(
            w_r, srows, grad_region, lr, {},
            col_segments=g.col_segments or None,
        )
        parts = [new_rows] + [new_srows[nm] for nm, _ in g.state_widths]
        new_body = (
            jnp.concatenate(parts, axis=1) if len(parts) > 1 else new_rows
        ).astype(jnp.float32)
        new_region = jnp.concatenate([
            new_body.reshape(s_phys, spr * slot),
            region[:, spr * slot :],
        ], axis=1)
        return jax.lax.dynamic_update_slice(table, new_region, (0, 0))

    def _packed_update(self, g, table, scalar_state, flat_ids, grads, lr,
                       u_cap=None, R=None, n_phys=None, scratch=None,
                       plan=None):
        """Fused update on a packed-row megatable.

        sort-dedup -> ONE physical-row gather -> optimizer row math ->
        log-step segmented merge of slots sharing a physical row ->
        ONE row write (pallas kernel on TPU, XLA scatter elsewhere).
        Replaces the unpacked path's {2 gathers + 2..3 scatters} and
        runs the write at ~46 ns/row vs XLA scatter's ~95-120 (v5e).

        Defaults operate on the whole megatable (p_shards == 1 layout:
        ``ids // spr`` physical mapping, trailing scratch row). The
        shard-local path (_dist_packed_update) passes the shard's
        bounds instead: R = rows_per_shard, n_phys = pps + 1,
        scratch = pps, with ``table`` the local [pps+1, 128] block and
        ``flat_ids`` LOCAL logical rows — the mapping is identical, so
        the math is shared verbatim.

        ``plan`` (the lookup slicing plan) activates the DENSE LANE for
        groups with a dense-lane region: small-table entries peel off
        into _dense_lane_update (one-hot MXU grad + one block write)
        and only the big-table slices enter the sort/dedup/scatter
        stream — on Criteo that halves the stream (213k -> 107k ids)
        and removes ~20k scatter rows.
        """
        from torcheasyrec_tpu.ops.pallas.row_write import write_rows

        R = g.padded_rows if R is None else R
        n_phys = g.p_rows if n_phys is None else n_phys
        scratch = (n_phys - 1) if scratch is None else scratch
        oob = jnp.int32(R)
        if plan is not None and g.dense_rows and R == g.padded_rows:
            dense_e = [
                e for e in plan if e.lk.table_name in g.dense_tables
            ]
            big_e = [
                e for e in plan if e.lk.table_name not in g.dense_tables
            ]
            if dense_e:
                table = self._dense_lane_update(
                    g, table, flat_ids, grads, lr, dense_e
                )
                if not big_e:
                    return table, scalar_state
                flat_ids = jnp.concatenate([
                    jax.lax.dynamic_slice_in_dim(
                        flat_ids, e.start, e.count
                    ) for e in big_e
                ])
                grads = jnp.concatenate([
                    jax.lax.dynamic_slice_in_dim(grads, e.start, e.count)
                    for e in big_e
                ])
                u_cap = 1 + sum(
                    min(int(e.count),
                        int(self._specs[e.lk.table_name].rows))
                    for e in big_e
                )
        gsum, uids, cap = self._dedup_global(flat_ids, grads, oob, u_cap)

        spr, slot, dim = g.spr, g.slot, g.dim
        invalid = uids >= R
        pid = jnp.where(invalid, n_phys, uids // spr).astype(jnp.int32)
        lane = jnp.where(invalid, 0, uids % spr).astype(jnp.int32)
        # pid is nondecreasing (derived from the sorted unique ids)
        phys = table.at[pid].get(
            mode="fill", fill_value=0.0, indices_are_sorted=True
        )  # [cap, 128]
        body = phys[:, : spr * slot].reshape(cap, spr, slot)
        onehot = jax.nn.one_hot(lane, spr, dtype=jnp.float32)  # [cap, spr]
        rowv = (body * onehot[:, :, None]).sum(axis=1)         # [cap, slot]
        w_rows = rowv[:, :dim]
        srows = {}
        off = dim
        for name, width in g.state_widths:
            srows[name] = rowv[:, off : off + width]
            off += width

        new_rows, new_srows, new_scalar = self.optimizer.apply_rows(
            w_rows, srows, gsum, lr, scalar_state,
            col_segments=g.col_segments or None,
        )
        parts = [new_rows] + [new_srows[nm] for nm, _ in g.state_widths]
        new_slot = (
            jnp.concatenate(parts, axis=1) if len(parts) > 1 else new_rows
        ).astype(jnp.float32)

        # DELTA merge: spread each slot's CHANGE to its 128-lane
        # position; untouched lanes carry delta 0 exactly, so the final
        # merge is one add — no validity mask to build, fold, or apply
        # (the mask variant folded two [cap, 128] arrays and cost ~1.5x).
        # NOTE: fl(x + fl(y - x)) can differ from y by 1 ulp per touched
        # lane, so packed and unpacked layouts agree to ~1 ulp/step, not
        # bit-for-bit — cross-layout tests use small tolerances
        # accordingly (tests/test_table_merge.py, test_emb_engine.py)
        delta = new_slot - rowv
        spread = (onehot[:, :, None] * delta[:, None, :]).reshape(
            cap, spr * slot
        )
        pad = 128 - spr * slot
        if pad:
            spread = jnp.concatenate(
                [spread, jnp.zeros((cap, pad), jnp.float32)], axis=1
            )

        # log-step segmented suffix fold: slots sharing a physical row
        # are ADJACENT (uids sorted), so O(log spr) shifted masked adds
        # accumulate every group's disjoint lane deltas onto its
        # rank-0 entry — no segment_sum, no second gather. Shifts are
        # bounded by cap too: at d >= cap no pair can share a row (and
        # pid[d:] would otherwise be shorter than the zero padding).
        d = 1
        while d < min(spr, cap):
            same = jnp.concatenate(
                [pid[d:] == pid[:-d], jnp.zeros((d,), bool)]
            ).astype(jnp.float32)[:, None]
            z = jnp.zeros((d, 128), jnp.float32)
            spread = spread + same * jnp.concatenate(
                [spread[d:], z], axis=0
            )
            d *= 2

        merged = phys + spread
        # rank-0 entries (first of each physical row) carry the full
        # merge; later ranks (and OOB padding) land on the scratch row
        head2 = jnp.concatenate(
            [jnp.ones((1,), bool), pid[1:] != pid[:-1]]
        )
        tgt = jnp.where(head2 & ~invalid, pid, scratch).astype(jnp.int32)
        new_table = write_rows(
            table, tgt, merged, scratch_id=scratch,
            use_pallas=self._pallas_write,
        )
        return new_table, new_scalar

    def _dist_packed_update(self, g, table, scalar_state, flat_ids,
                            grads, lr, u_cap=None):
        """Sharded fused update on a packed megatable (p_shards == D).

        Routes (id, row-grad) pairs to owning shards exactly like
        _dist_update's row_wise paths — a2a fast path with an exact
        allgather fallback on bucket overflow — then each shard runs
        the SAME packed update (_packed_update) on its local
        [pps+1, 128] block with its local scratch row. This is the
        TBE-inside-every-rank layout (reference
        tzrec/utils/dist_util.py:22-52 + main.py:721-728): the
        multi-chip path keeps the single-chip packed-row win instead
        of regressing to separate opt-state gathers/scatters. Shared
        scalar state (adam/lamb step) is computed identically on every
        shard and stays replicated."""
        D = self.num_shards
        rps = g.padded_rows // D
        pps = rps // g.spr
        pad = (-flat_ids.shape[0]) % D
        if pad:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.full((pad,), -1, flat_ids.dtype)]
            )
            grads = jnp.concatenate(
                [grads, jnp.zeros((pad, grads.shape[1]), grads.dtype)]
            )
        lcap = None if u_cap is None else min(int(u_cap), rps + 1)

        def _local(w_loc, scal, local_ids, g_rows, lr_):
            return self._packed_update(
                g, w_loc, scal, local_ids, g_rows, lr_, u_cap=lcap,
                R=rps, n_phys=pps + 1, scratch=pps,
            )

        def _dense_upd(w_loc, scal, ids_loc, g_loc, lr_):
            my = jax.lax.axis_index(self._ax)
            all_ids = jax.lax.all_gather(ids_loc, self._ax, tiled=True)
            all_g = jax.lax.all_gather(g_loc, self._ax, tiled=True)
            owner = all_ids // rps
            mine = (owner == my) & (all_ids >= 0)
            local = jnp.where(mine, all_ids - owner * rps, -1)
            return _local(w_loc, scal, local, all_g, lr_)

        def _a2a_upd(w_loc, scal, ids_loc, g_loc, lr_):
            my = jax.lax.axis_index(self._ax)
            cap = self._a2a_capacity(ids_loc.shape[0])
            order, fits, flat_idx, send_ids = self._a2a_route(
                ids_loc, rps, cap
            )
            dim = g_loc.shape[1]
            sg = g_loc[order]
            send_g = (
                jnp.zeros((D * cap, dim), g_loc.dtype)
                .at[flat_idx].set(
                    jnp.where(fits[:, None], sg, 0.0), mode="drop"
                )
                .reshape(D, cap, dim)
            )
            recv_ids = self._xchg(send_ids)
            recv_g = self._xchg(send_g)
            local = jnp.where(
                recv_ids >= 0, recv_ids - my * rps, -1
            ).reshape(-1)
            return _local(w_loc, scal, local, recv_g.reshape(-1, dim),
                          lr_)

        mode = self._exchange_mode
        if mode == "allgather":
            _fn = _dense_upd
        elif mode == "a2a":
            _fn = _a2a_upd
        else:
            def _fn(w_loc, scal, ids_loc, g_loc, lr_):
                over = self._a2a_overflow(
                    ids_loc, rps,
                    self._a2a_capacity(ids_loc.shape[0]),
                )
                return jax.lax.cond(
                    over, _dense_upd, _a2a_upd,
                    w_loc, scal, ids_loc, g_loc, lr_,
                )

        scal_specs = jax.tree_util.tree_map(lambda _: P(), scalar_state)
        return jax.shard_map(
            _fn,
            mesh=self.mesh,
            in_specs=(P(self._ax, None), scal_specs, P(self._ax),
                      P(self._ax, None), P()),
            out_specs=(P(self._ax, None), scal_specs),
            check_vma=False,
        )(table, scalar_state, flat_ids, grads, lr)

    # ------------------------------------------------------------------
    # host-offload (HBM x host-DDR tier)
    # ------------------------------------------------------------------

    @property
    def has_host_groups(self) -> bool:
        return any(
            g.sharding == HOST_OFFLOAD for g in self.groups.values()
        )

    def _host_flat_ids(self, g, lks, sparse, sequence_sparse):
        """Numpy mirror of _flatten_group_ids' id stream (same order,
        same validity rules) for the host-side gather."""
        import numpy as np_

        ids_list = []
        for lk in lks:
            off = g.offsets[lk.table_name]
            if lk.is_sequence:
                v = np_.asarray(sequence_sparse[lk.feature_name].values)
                ids_list.append(
                    np_.where(v >= 0, v.astype(np_.int64) + off, -1)
                    .reshape(-1)
                )
                continue
            field = sparse[lk.feature_name]
            v = np_.asarray(field.values)
            if field.is_fixed:
                ids_list.append(
                    np_.where(v >= 0, v.astype(np_.int64) + off, -1)
                    .reshape(-1)
                )
                continue
            n = v.shape[0]
            b = np_.asarray(field.lengths).shape[0]
            if field.segments is not None:
                seg = np_.asarray(field.segments)
            else:
                lens = np_.asarray(field.lengths)
                seg = np_.full((n,), b, np_.int64)
                seg[: int(lens.sum())] = np_.repeat(
                    np_.arange(b, dtype=np_.int64), lens
                )
            valid = (seg < b) & (v >= 0)
            ids_list.append(
                np_.where(valid, v.astype(np_.int64) + off, -1)
            )
        return (
            np_.concatenate(ids_list) if len(ids_list) > 1 else ids_list[0]
        )

    def host_prefetch(
        self, sparse, sequence_sparse=None
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Gather this batch's rows from the host tables (numpy fields,
        BEFORE device_put). Returns (rows {gk: [n, dim] f32, invalid
        ids zeroed}, ids {gk: [n] int64}) — rows ride to the device
        with the batch; ids stay host-side for host_apply()."""
        import numpy as np_

        sequence_sparse = sequence_sparse or {}
        rows_out: Dict[str, Any] = {}
        ids_out: Dict[str, Any] = {}
        for gk, lks in self._lookups_by_group.items():
            g = self.groups[gk]
            if g.sharding != HOST_OFFLOAD:
                continue
            flat = self._host_flat_ids(g, lks, sparse, sequence_sparse)
            w = self.host_tables[gk]
            rows = w[np_.clip(flat, 0, w.shape[0] - 1)]
            rows[flat < 0] = 0.0
            rows_out[gk] = rows.astype(np_.float32)
            ids_out[gk] = flat
        return rows_out, ids_out

    def host_refresh(self, rows, ids, touched) -> None:
        """Re-read prefetched host rows whose ids were updated AFTER the
        prefetch (staleness repair for the overlapped gather: rows for
        step N+1 are gathered while step N runs; any id step N then
        updated is re-read here, so the overlap is exact)."""
        import numpy as np_

        for gk, flat in ids.items():
            t = touched.get(gk)
            if t is None:
                continue
            t = t[t >= 0]
            if not t.size:
                continue
            m = (flat >= 0) & np_.isin(flat, t)
            if m.any():
                w = self.host_tables[gk]
                rows[gk][m] = w[
                    np_.clip(flat[m], 0, w.shape[0] - 1)
                ].astype(np_.float32)

    def host_row_grads(
        self, residuals: Dict[str, Any], out_grads: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        """Per-row grads for HOST_OFFLOAD groups — returned from the
        jitted step so the host can apply the sparse update."""
        out: Dict[str, jnp.ndarray] = {}
        for gk, (flat_ids, plan) in residuals.items():
            g = self.groups[gk]
            if g.sharding != HOST_OFFLOAD:
                continue
            grads = self._flat_row_grads(g, plan, out_grads)
            if grads is not None:
                out[gk] = grads
        return out

    def host_apply(
        self,
        host_grads: Dict[str, Any],
        host_ids: Dict[str, Any],
        lr_scale: float,
    ) -> None:
        """Numpy sparse update on the host tables: dedup duplicate ids
        (sum their grads — the fused-update contract) then apply the
        same optimizer math as the device path."""
        import numpy as np_

        lr = float(lr_scale) * self.optimizer.base_lr
        if lr == 0.0:
            return
        c = self.optimizer.cfg
        kind = self.optimizer.kind
        eps = float(c.get("eps", 1e-10))
        for gk, grads in host_grads.items():
            flat = host_ids[gk]
            grads = np_.asarray(grads, np_.float32)
            valid = flat >= 0
            if not valid.any():
                continue
            uids, inv = np_.unique(flat[valid], return_inverse=True)
            summed = np_.zeros((uids.size, grads.shape[1]), np_.float32)
            np_.add.at(summed, inv, grads[valid])
            if c.get("gradient_clipping", False):
                mg = float(c.get("max_gradient", 1.0))
                summed = np_.clip(summed, -mg, mg)
            w = self.host_tables[gk]
            st = self.host_opt.get(gk, {})
            wd = float(c.get("weight_decay", 0.0))
            if wd and kind == "adam":
                summed = summed + wd * w[uids]
            if kind == "sgd":
                w[uids] -= lr * summed
            elif kind == "adagrad":
                acc = st["acc"]
                acc[uids] += summed * summed
                w[uids] -= lr * summed / (np_.sqrt(acc[uids]) + eps)
            elif kind == "rowwise_adagrad":
                acc = st["acc"]
                acc[uids] += (summed * summed).mean(axis=1, keepdims=True)
                w[uids] -= lr * summed / (np_.sqrt(acc[uids]) + eps)
            elif kind == "adam":
                b1 = float(c.get("beta1", 0.9))
                b2 = float(c.get("beta2", 0.999))
                st["step"] = st["step"] + 1
                t = int(st["step"])
                m, v = st["m"], st["v"]
                m[uids] = b1 * m[uids] + (1 - b1) * summed
                v[uids] = b2 * v[uids] + (1 - b2) * summed * summed
                mhat = m[uids] / (1 - b1**t)
                vhat = v[uids] / (1 - b2**t)
                w[uids] -= lr * mhat / (np_.sqrt(vhat) + eps)
            else:  # guarded at _resolve_sharding
                raise ValueError(f"host_offload: optimizer {kind}")

    def _flat_row_grads(self, g, plan, out_grads):
        pieces = []
        any_grad = False
        for e in plan:
            lk, start, count, kind = e.lk, e.start, e.count, e.kind
            seg, w, lengths, shape = e.seg, e.weights, e.lengths, e.shape
            if lk.col_outputs:
                # merged lookup: concat each fused table's output grad
                # along the column axis (absent ones are zero)
                parts = [out_grads.get(okey)
                         for okey, _, _ in lk.col_outputs]
                if all(p is None for p in parts):
                    pieces.append(jnp.zeros((count, g.dim), jnp.float32))
                    continue
                lead = next(
                    p for p in parts if p is not None
                ).shape[:-1]
                og = jnp.concatenate([
                    p.astype(jnp.float32) if p is not None
                    else jnp.zeros(lead + (cw,), jnp.float32)
                    for p, (_, _, cw) in zip(parts, lk.col_outputs)
                ], axis=-1)
            else:
                og = out_grads.get(lk.key)
            if og is None:
                pieces.append(jnp.zeros((count, g.dim), jnp.float32))
                continue
            any_grad = True
            og = og.astype(jnp.float32)
            if kind == "seq":
                if len(shape) == 3:
                    b, L, K = shape
                    og = jnp.broadcast_to(
                        og[:, :, None, :], (b, L, K, g.dim)
                    )
                pieces.append(og.reshape(count, g.dim))
                continue
            b = lengths.shape[0]
            if lk.combiner == "mean":
                denom = jnp.maximum(lengths.astype(jnp.float32), 1.0)
                og = og / denom[:, None]
            if seg is not None:
                padded = jnp.concatenate(
                    [og, jnp.zeros((1, g.dim), og.dtype)], axis=0
                )
                rg = padded[seg]  # [count, dim]
            else:
                rg = jnp.repeat(og, count // b, axis=0)
            if w is not None:
                rg = rg * w[:, None]
            pieces.append(rg)
        if not any_grad:
            return None
        return jnp.concatenate(pieces) if len(pieces) > 1 else pieces[0]

    def _dedup_apply(self, weight, state, ids, grads, n_rows, lr,
                     dim_psum_axis=None, full_dim=None, u_cap=None,
                     col_segments=None):
        """Sort + segment-sum duplicate ids, then sparse-apply optimizer.

        ids: [N] int32, -1 for invalid slots. OOB padding rows map past
        the table so scatter mode='drop' ignores them.

        ``u_cap`` statically bounds the UNIQUE id count (sum over the
        group's lookups of min(slots, table rows), +1 for the OOB
        sentinel). Dropped OOB scatter rows cost the same as real ones
        on TPU (measured ~95 ns/row either way), so shrinking the
        optimizer's gather/scatter from N flat slots to the unique
        bound cuts real time — Criteo DeepFM: 213k -> 126k rows/step.
        """
        n = ids.shape[0]
        oob = jnp.int32(n_rows)
        ids = jnp.where(ids < 0, oob, ids)
        order = jnp.argsort(ids)
        sids = ids[order]
        sg = grads[order]
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.int32),
             (sids[1:] != sids[:-1]).astype(jnp.int32)]
        )
        seg = jnp.cumsum(head) - 1  # [N] dense unique index
        cap = n if u_cap is None else min(int(u_cap), n)
        # same fused sorted scatter as _packed_update: grads + base-4096
        # id columns + head count in ONE segment_sum (~1.8x on v5e)
        headf = head.astype(jnp.float32)
        payload = jnp.concatenate([
            sg,
            ((sids // 4096).astype(jnp.float32) * headf)[:, None],
            ((sids % 4096).astype(jnp.float32) * headf)[:, None],
            headf[:, None],
        ], axis=1)
        out = jax.ops.segment_sum(
            payload, seg, num_segments=cap, indices_are_sorted=True
        )
        d_cols = sg.shape[1]
        gsum = out[:, :d_cols]
        uids = jnp.where(
            out[:, d_cols + 2] > 0,
            out[:, d_cols].astype(jnp.int32) * 4096
            + out[:, d_cols + 1].astype(jnp.int32),
            oob,
        )
        return self.optimizer.apply(
            weight, state, uids, gsum, lr,
            dim_psum_axis=dim_psum_axis, full_dim=full_dim,
            col_segments=col_segments,
        )

    def _dist_update(self, weight, state, flat_ids, grads, g, lr,
                     u_cap=None):
        if self.mesh is None:
            return self._dedup_apply(
                weight, state, flat_ids, grads, g.padded_rows, lr,
                u_cap=u_cap, col_segments=g.col_segments or None,
            )

        # every sharded path splits (ids, grads) over the mesh axis:
        # pad to a multiple of num_shards (invalid id -1, zero grad)
        pad = (-flat_ids.shape[0]) % self.num_shards
        if pad:
            flat_ids = jnp.concatenate(
                [flat_ids, jnp.full((pad,), -1, flat_ids.dtype)]
            )
            grads = jnp.concatenate(
                [grads, jnp.zeros((pad, grads.shape[1]), grads.dtype)]
            )

        if g.sharding == COLUMN_WISE:
            def _cw_upd(w_loc, st_loc, ids_loc, g_loc, lr_):
                all_ids = jax.lax.all_gather(
                    ids_loc, self._ax, tiled=True
                )  # [D * N_loc] — identical on every shard, so the
                # dedup sort below lines uids up across shards and the
                # optimizer's psum'd dim reductions stay exact
                g_slices = jax.lax.all_to_all(
                    g_loc, self._ax, split_axis=1, concat_axis=0,
                    tiled=True,
                )  # [D * N_loc, dim/D]
                return self._dedup_apply(
                    w_loc, st_loc, all_ids, g_slices, g.padded_rows, lr_,
                    dim_psum_axis=self._ax, full_dim=g.dim, u_cap=u_cap,
                )

            st_specs = jax.tree_util.tree_map(
                lambda x: self._array_spec(x, g), state
            )
            return jax.shard_map(
                _cw_upd,
                mesh=self.mesh,
                in_specs=(P(None, self._ax), st_specs, P(self._ax),
                          P(self._ax, None), P()),
                out_specs=(P(None, self._ax), st_specs),
                check_vma=False,
            )(weight, state, flat_ids, grads, lr)

        rows_per_shard = g.padded_rows // self.num_shards

        if g.sharding == DATA_PARALLEL:
            def _dp_fn(w, st, ids_loc, g_loc, lr_):
                # gather every shard's (ids, grads); apply identically
                all_ids = jax.lax.all_gather(
                    ids_loc, self._ax, tiled=True
                )
                all_g = jax.lax.all_gather(g_loc, self._ax, tiled=True)
                return self._dedup_apply(
                    w, st, all_ids, all_g, g.padded_rows, lr_, u_cap=u_cap,
                    col_segments=g.col_segments or None,
                )

            return jax.shard_map(
                _dp_fn,
                mesh=self.mesh,
                in_specs=(P(), P(), P(self._ax), P(self._ax), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )(weight, state, flat_ids, grads, lr)

        def _rw_dense_fn(w_loc, st_loc, ids_loc, g_loc, lr_):
            my = jax.lax.axis_index(self._ax)
            all_ids = jax.lax.all_gather(ids_loc, self._ax, tiled=True)
            all_g = jax.lax.all_gather(g_loc, self._ax, tiled=True)
            owner = all_ids // rows_per_shard
            mine = (owner == my) & (all_ids >= 0)
            local = jnp.where(mine, all_ids - owner * rows_per_shard, -1)
            return self._dedup_apply(
                w_loc, st_loc, local, all_g, rows_per_shard, lr_,
                u_cap=None if u_cap is None
                else min(u_cap, rows_per_shard + 1),
                col_segments=g.col_segments or None,
            )

        def _rw_a2a_fn(w_loc, st_loc, ids_loc, g_loc, lr_):
            # route (id, row-grad) pairs to owners: one ids a2a + one
            # grads a2a instead of all-gathering every shard's grads
            D = self.num_shards
            my = jax.lax.axis_index(self._ax)
            cap = self._a2a_capacity(ids_loc.shape[0])
            order, fits, flat_idx, send_ids = self._a2a_route(
                ids_loc, rows_per_shard, cap
            )
            dim = g_loc.shape[1]
            sg = g_loc[order]
            send_g = (
                jnp.zeros((D * cap, dim), g_loc.dtype)
                .at[flat_idx].set(
                    jnp.where(fits[:, None], sg, 0.0), mode="drop"
                )
                .reshape(D, cap, dim)
            )
            recv_ids = self._xchg(send_ids)
            recv_g = self._xchg(send_g)
            local = jnp.where(
                recv_ids >= 0, recv_ids - my * rows_per_shard, -1
            ).reshape(-1)
            return self._dedup_apply(
                w_loc, st_loc, local, recv_g.reshape(-1, dim),
                rows_per_shard, lr_,
                u_cap=None if u_cap is None
                else min(u_cap, rows_per_shard + 1),
                col_segments=g.col_segments or None,
            )

        mode = self._exchange_mode
        if mode == "allgather":
            _rw_fn = _rw_dense_fn
        elif mode == "a2a":
            _rw_fn = _rw_a2a_fn
        else:
            def _rw_fn(w_loc, st_loc, ids_loc, g_loc, lr_):
                over = self._a2a_overflow(
                    ids_loc, rows_per_shard,
                    self._a2a_capacity(ids_loc.shape[0]),
                )
                return jax.lax.cond(
                    over, _rw_dense_fn, _rw_a2a_fn,
                    w_loc, st_loc, ids_loc, g_loc, lr_,
                )

        st_specs = jax.tree_util.tree_map(
            lambda x: P(self._ax, None)
            if getattr(x, "ndim", 0) >= 2 and x.shape[0] == g.padded_rows
            else (P(self._ax) if getattr(x, "ndim", 0) == 1 else P()),
            state,
        )
        return jax.shard_map(
            _rw_fn,
            mesh=self.mesh,
            in_specs=(P(self._ax, None), st_specs, P(self._ax),
                      P(self._ax), P()),
            out_specs=(P(self._ax, None), st_specs),
            check_vma=False,
        )(weight, state, flat_ids, grads, lr)

    # ------------------------------------------------------------------
    # introspection / export helpers
    # ------------------------------------------------------------------

    def tables_for_features(self, feature_names) -> set:
        """Table names looked up by the given features — the prune set
        for per-tower export artifacts. Always ORIGINAL (pre-merge)
        names: canonical checkpoints are keyed by them."""
        names = set(feature_names)
        used = set()
        for lks in self._lookups_by_group.values():
            for lk in lks:
                if lk.feature_name not in names:
                    continue
                t = self._specs[lk.table_name]
                if t.merged_from:
                    used.update(m.name for m in t.merged_from)
                else:
                    used.add(lk.table_name)
        return used

    @staticmethod
    def _member_cols(g: _Group, v, coff: int, mdim: int, seg_idx: int):
        """Column view of one state array for a merged member:
        elementwise state (width == g.dim) takes the member's columns;
        per-segment row-wise state (width == n_seg) takes the member's
        segment column (width 1 — the unmerged canonical width)."""
        width = v.shape[1]
        if width == g.dim:
            return v[:, coff : coff + mdim]
        if width == len(g.col_segments):
            return v[:, seg_idx : seg_idx + 1]
        return v

    def to_canonical(self, tables, opt_state) -> Dict[str, Any]:
        """Fused group arrays -> per-table dict (layout-independent
        checkpoint format, the reference's reshard-on-load equivalent:
        a checkpoint saved under any device count / sharding plan —
        including merged co-keyed layouts — restores under any other).
        Merged tables emit one entry per MEMBER under its original
        name, with per-segment row state mapped back to the unmerged
        width-1 canonical form."""
        import numpy as np_

        out: Dict[str, Any] = {}
        for gk, g in self.groups.items():
            if g.sharding == HOST_OFFLOAD:
                w = self.host_tables[gk]
                st = self.host_opt.get(gk, {})
            elif g.packed:
                packed = np_.asarray(jax.device_get(tables[gk]))
                w, srows = self.unpack_group(g, packed)
                if opt_state is not None:
                    st = dict(srows)
                    st.update(jax.device_get(opt_state.get(gk, {})))
                else:
                    st = {}
            else:
                w = np_.asarray(jax.device_get(tables[gk]))
                st = (jax.device_get(opt_state.get(gk, {}))
                      if opt_state else {})
            for t in g.specs:
                off = g.offsets[t.name]
                if t.merged_from:
                    coff = 0
                    for i, m in enumerate(t.merged_from):
                        entry: Dict[str, Any] = {
                            "weight": np_.asarray(w)[
                                off : off + t.rows, coff : coff + m.dim
                            ]
                        }
                        for k, v in (st or {}).items():
                            v_ = np_.asarray(v)
                            if v_.ndim >= 2 and v_.shape[0] == g.padded_rows:
                                entry[f"opt__{k}"] = self._member_cols(
                                    g, v_, coff, m.dim, i
                                )[off : off + t.rows]
                            elif (v_.ndim >= 1
                                  and v_.shape[0] == g.padded_rows):
                                entry[f"opt__{k}"] = v_[off : off + t.rows]
                            else:
                                entry[f"opt__{k}"] = v_
                        out[m.name] = entry
                        coff += m.dim
                    continue
                entry = {"weight": np_.asarray(w)[off : off + t.rows]}
                for k, v in (st or {}).items():
                    if getattr(v, "ndim", 0) >= 1 and v.shape[0] == g.padded_rows:
                        entry[f"opt__{k}"] = np_.asarray(v)[off : off + t.rows]
                    else:
                        entry[f"opt__{k}"] = np_.asarray(v)
                out[t.name] = entry
        return out

    def _restore_spec(self, g, w, st_rows, scalars, t, canon) -> None:
        """Restore one spec's canonical entries into numpy buffers
        (merged specs restore each member's entry into its columns)."""
        import numpy as np_

        off = g.offsets[t.name]
        coff = 0
        for i, m in enumerate(t.merged_from or (t,)):
            entry = canon.get(m.name)
            if entry is None:
                coff += m.dim
                continue
            w[off : off + t.rows, coff : coff + m.dim] = np_.asarray(
                entry["weight"]
            ).astype(w.dtype)
            for k in list(st_rows.keys()):
                ck = f"opt__{k}"
                if ck not in entry:
                    continue
                v = np_.asarray(entry[ck])
                tgt = st_rows[k]
                if tgt.shape[1] == g.dim:
                    tgt[off : off + t.rows, coff : coff + m.dim] = (
                        v.astype(tgt.dtype)
                    )
                elif g.col_segments and tgt.shape[1] == len(g.col_segments):
                    tgt[off : off + t.rows, i : i + 1] = v.reshape(
                        t.rows, 1
                    ).astype(tgt.dtype)
                else:
                    tgt[off : off + t.rows] = v.astype(tgt.dtype)
            for k in list(scalars.keys()):
                ck = f"opt__{k}"
                if ck in entry:
                    scalars[k] = np_.asarray(entry[ck]).astype(
                        np_.asarray(scalars[k]).dtype
                    )
            coff += m.dim

    def from_canonical(
        self, canon: Dict[str, Any], tables, opt_state
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Per-table dict -> this engine's fused layout. Tables absent
        from the checkpoint keep their current (initialized) values."""
        import numpy as np_

        new_tables = {}
        new_state = {}
        for gk, g in self.groups.items():
            host = g.sharding == HOST_OFFLOAD
            if g.packed:
                packed = np_.asarray(jax.device_get(tables[gk]))
                w, srows = self.unpack_group(g, packed)
                w = np_.array(w)
                srows = {k: np_.array(v) for k, v in srows.items()}
                scalar = (
                    {k: np_.array(v) for k, v in jax.device_get(
                        opt_state.get(gk, {})).items()}
                    if opt_state else {}
                )
                for t in g.specs:
                    self._restore_spec(g, w, srows, scalar, t, canon)
                new_tables[gk] = self._device_put_table(
                    self.pack_group(g, w, srows), g
                )
                if opt_state:
                    new_state[gk] = {
                        k: jnp.asarray(v) for k, v in scalar.items()
                    }
                continue
            if host:
                w = self.host_tables[gk]
                st = self.host_opt.get(gk, {})
            else:
                w = np_.array(jax.device_get(tables[gk]))
                st = {
                    k: np_.array(v)
                    for k, v in jax.device_get(
                        opt_state.get(gk, {})
                    ).items()
                } if opt_state else {}
            st_rows = {
                k: v for k, v in st.items()
                if getattr(v, "ndim", 0) >= 2 and v.shape[0] == g.padded_rows
            }
            scalars = {k: v for k, v in st.items() if k not in st_rows}
            for t in g.specs:
                self._restore_spec(g, w, st_rows, scalars, t, canon)
            st = {**st_rows, **scalars}
            if host:
                # host tables restore in place; nothing enters the
                # device state
                self.host_opt[gk] = st
                continue
            new_tables[gk] = self._device_put_table(jnp.asarray(w), g)
            if opt_state:
                new_state[gk] = jax.tree_util.tree_map(
                    lambda x: self._device_put_table(jnp.asarray(x), g)
                    if getattr(x, "ndim", 0) >= 1
                    and x.shape[0] == g.padded_rows
                    else jnp.asarray(x),
                    st,
                )
        return new_tables, new_state if opt_state else opt_state

    def plan_summary(self) -> Dict[str, str]:
        """{table_name: sharding} for every ORIGINAL table (layout
        histograms, dryrun assertions, plan logging/persistence —
        plans are keyed by pre-merge names)."""
        out = {}
        for name, gk in self._table_group.items():
            g = self.groups[gk]
            t = self._specs[name]
            for m in (t.merged_from or (t,)):
                out[m.name] = g.sharding
        return out

    def _table_slice(
        self, table_name: str
    ) -> Tuple[str, int, int, int, int]:
        """(group_key, row_offset, rows, col_offset, dim) — resolves
        merged members to their column block of the fused table."""
        if table_name in self._merged:
            mname, coff, d = self._merged[table_name]
            gk = self._table_group[mname]
            return gk, self.groups[gk].offsets[mname], \
                self._specs[mname].rows, coff, d
        gk = self._table_group[table_name]
        g = self.groups[gk]
        t = self._specs[table_name]
        return gk, g.offsets[table_name], t.rows, 0, t.dim

    def table_rows(self, table_name: str) -> Tuple[str, int, int]:
        """(group_key, row_offset, rows) for one table. NOTE: merged
        members occupy a COLUMN SLICE of the group too — use
        extract_table / _table_slice for layout-correct access."""
        gk, off, rows, _, _ = self._table_slice(table_name)
        return gk, off, rows

    def extract_table(
        self, tables: Dict[str, jnp.ndarray], table_name: str
    ) -> jnp.ndarray:
        gk, off, rows, coff, d = self._table_slice(table_name)
        g = self.groups[gk]
        if g.sharding == HOST_OFFLOAD:
            return self.host_tables[gk][off : off + rows, coff : coff + d]
        if g.packed:
            import numpy as np_

            w, _ = self.unpack_group(
                g, np_.asarray(jax.device_get(tables[gk]))
            )
            return w[off : off + rows, coff : coff + d]
        return jax.device_get(tables[gk])[
            off : off + rows, coff : coff + d
        ]

    def extract_table_state(
        self, tables: Dict[str, jnp.ndarray], opt_state: Dict[str, Any],
        table_name: str,
    ) -> Dict[str, Any]:
        """Layout-independent per-table optimizer state: row state comes
        from wherever the layout stores it (in-row for packed groups,
        opt_state arrays otherwise; host_opt for host_offload)."""
        import numpy as np_

        gk, off, rows, coff, d = self._table_slice(table_name)
        g = self.groups[gk]
        out: Dict[str, Any] = {}
        if g.sharding == HOST_OFFLOAD:
            st = self.host_opt.get(gk, {})
        elif g.packed:
            _, srows = self.unpack_group(
                g, np_.asarray(jax.device_get(tables[gk]))
            )
            st = dict(srows)
            st.update(jax.device_get((opt_state or {}).get(gk, {})))
        else:
            st = jax.device_get((opt_state or {}).get(gk, {}))
        seg_idx = 0
        if table_name in self._merged:
            mname = self._merged[table_name][0]
            for i, m in enumerate(self._specs[mname].merged_from):
                if m.name == table_name:
                    seg_idx = i
        for k, v in (st or {}).items():
            v = np_.asarray(v)
            if v.ndim >= 2 and v.shape[0] == g.padded_rows:
                out[k] = self._member_cols(g, v, coff, d, seg_idx)[
                    off : off + rows
                ]
            elif v.ndim >= 1 and v.shape[0] == g.padded_rows:
                out[k] = v[off : off + rows]
            else:
                out[k] = v
        return out

    def write_logical_rows(
        self,
        weight: jnp.ndarray,
        g: "_Group",
        flat_ids: jnp.ndarray,
        rows: jnp.ndarray,
        col_off: int = 0,
    ) -> jnp.ndarray:
        """Scatter logical row vectors into a group table under ANY
        physical layout (packed or flat). ``flat_ids`` are megatable
        row indices (-1 = dropped); ``rows`` is [N, d] written at
        columns [col_off, col_off + d) of each logical row. Weight
        columns only — in-row optimizer state (packed groups) is left
        untouched (a restored key restarts its optimizer state; the
        host-spill tier stores vectors, not accumulators). Traceable:
        used by the jitted spill-restore scatter (main.py)."""
        d = rows.shape[1]
        if g.packed:
            pid, lane, _ = self._packed_phys(g, flat_ids)
            cols = (
                lane[:, None] * g.slot
                + col_off
                + jnp.arange(d, dtype=jnp.int32)[None, :]
            )
            return weight.at[pid[:, None], cols].set(
                rows.astype(weight.dtype), mode="drop"
            )
        safe = jnp.where(flat_ids < 0, weight.shape[0], flat_ids)
        if col_off == 0 and d == weight.shape[1]:
            return weight.at[safe].set(
                rows.astype(weight.dtype), mode="drop"
            )
        cols = col_off + jnp.arange(d, dtype=jnp.int32)
        return weight.at[safe[:, None], cols[None, :]].set(
            rows.astype(weight.dtype), mode="drop"
        )

    def export_weight_matrices(self, tables) -> Dict[str, Any]:
        """{group_key: [padded_rows, dim] fp32 numpy weights} — the
        layout-independent weight view for rowwise quantized export
        (main.py QUANT_EMB path)."""
        import numpy as np_

        out = {}
        for gk, g in self.groups.items():
            if g.sharding == HOST_OFFLOAD:
                out[gk] = np_.asarray(self.host_tables[gk])
            elif g.packed:
                w, _ = self.unpack_group(
                    g, np_.asarray(jax.device_get(tables[gk]))
                )
                out[gk] = np_.asarray(w)
            else:
                out[gk] = np_.asarray(jax.device_get(tables[gk]))
        return out

    def import_weight_matrices(self, mats: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        """Inverse of export_weight_matrices for serving restore:
        weights-only matrices -> this engine's table layout (optimizer
        row state re-initialized; serving never reads it)."""
        import numpy as np_

        out = {}
        for gk, w in mats.items():
            g = self.groups[gk]
            if g.packed:
                # stay in numpy end-to-end (pack_group is host-side)
                fills = self.optimizer.row_state_init()
                srows = {
                    name: np_.full((g.padded_rows, width),
                                   fills.get(name, 0.0), np_.float32)
                    for name, width in g.state_widths
                }
                out[gk] = self._device_put_table(
                    self.pack_group(g, np_.asarray(w, np_.float32), srows),
                    g,
                )
            else:
                out[gk] = self._device_put_table(
                    jnp.asarray(w, jnp.float32).astype(g.store_dtype), g
                )
        return out
