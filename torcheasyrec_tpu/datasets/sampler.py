"""In-process negative samplers.

TPU-native replacement for the reference's graphlearn gRPC sampling
cluster (/root/reference/tzrec/datasets/sampler.py:235-1168). Since the
TPU runtime is one process per host, sampling runs in-process over
memory-mapped item tables with O(1) weighted alias sampling — no server
processes, no bootstrap collective.

Samplers take the current batch's columns and append negative item rows
as new columns named after ``attr_fields``; the DataParser then parses
item-side features from them into the __NEG__ data group.
"""

from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa

from torcheasyrec_tpu.datasets.utils import HARD_NEG_INDICES, pa_from_numpy
from torcheasyrec_tpu.utils.load_class import get_register_class_meta

_SAMPLER_CLASS_MAP: Dict[str, type] = {}
_meta = get_register_class_meta(_SAMPLER_CLASS_MAP)


class AliasTable:
    """Walker alias method for O(1) weighted sampling.

    Construction is vectorized (numpy stacks instead of python lists) so
    a 100M-item table builds in seconds, and the (prob, alias) arrays
    are plain numpy — shareable across mp-loader workers via shm_pack.
    """

    def __init__(self, weights: np.ndarray) -> None:
        w = np.asarray(weights, dtype=np.float64)
        w = np.where(w > 0, w, 0.0)
        n = len(w)
        prob_in = w * n / max(w.sum(), 1e-12)
        prob = np.ones(n)
        alias = np.arange(n, dtype=np.int64)
        small = np.flatnonzero(prob_in < 1.0).tolist()
        large = np.flatnonzero(prob_in >= 1.0).tolist()
        p = prob_in.copy()
        while small and large:
            s, l = small.pop(), large.pop()
            prob[s] = p[s]
            alias[s] = l
            p[l] = p[l] - (1.0 - p[s])
            (small if p[l] < 1.0 else large).append(l)
        self._install(prob, alias)

    @classmethod
    def from_arrays(cls, prob: np.ndarray, alias: np.ndarray) -> "AliasTable":
        obj = cls.__new__(cls)
        obj._install(prob, alias)
        return obj

    def _install(self, prob: np.ndarray, alias: np.ndarray) -> None:
        self._prob = prob
        self._alias = alias
        self._n = len(prob)

    def sample(self, k: int, rng: np.random.Generator) -> np.ndarray:
        idx = rng.integers(0, self._n, size=k)
        accept = rng.random(k) < self._prob[idx]
        return np.where(accept, idx, self._alias[idx])


def _read_table(path: str) -> pa.Table:
    import pyarrow.parquet as pq

    if path.endswith(".csv"):
        import pyarrow.csv as pacsv

        return pacsv.read_csv(path)
    return pq.read_table(path)


class BaseSampler(metaclass=_meta):
    """Base for all samplers; subclasses implement process()."""

    def __init__(
        self,
        config: Any,
        fields: Optional[List[Any]] = None,
        batch_size: int = 1024,
        is_training: bool = True,
        seq_delim: Optional[str] = None,
    ) -> None:
        self._config = config
        self._batch_size = batch_size
        self._is_training = is_training
        self._num_sample = int(getattr(config, "num_sample", 0))
        if not is_training and getattr(config, "num_eval_sample", 0):
            self._num_sample = int(config.num_eval_sample)
        self._attr_fields = list(config.attr_fields)
        self._attr_delim = getattr(config, "attr_delimiter", ":") or ":"
        self._item_id_field = config.item_id_field
        # sequence mode (reference dataset.py:399-405 build_sampler_input
        # flattens multi-positive candidate sequences): the item_id_field
        # is a grouped-sequence sub-feature whose column holds
        # delimiter-joined positive ids per row
        self._seq_delim = seq_delim
        self._rng = np.random.default_rng(0)
        self._inited = False

    @property
    def estimated_sample_num(self) -> int:
        return self._num_sample

    def init(self) -> None:
        if not self._inited:
            self._load()
            self._inited = True

    def _load(self) -> None:
        raise NotImplementedError

    def process(self, columns: Dict[str, pa.Array]) -> Dict[str, pa.Array]:
        raise NotImplementedError

    # -- shared helpers -----------------------------------------------------

    def _pos_id_set(self, columns: Dict[str, pa.Array]) -> set:
        """Distinct positive item ids in this batch, flattening
        multi-positive candidate sequences (list columns or
        ``seq_delim``-joined strings) like the reference's
        build_sampler_input (dataset.py:399-405, utils.py:588-634)."""
        col = columns.get(self._item_id_field)
        if col is None:
            return set()
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            flat = col.flatten()
            return set(
                flat.cast(pa.int64(), safe=False).to_pylist()
            )
        if self._seq_delim and pa.types.is_string(col.type):
            out: set = set()
            for s in col.to_pylist():
                if not s:
                    continue
                for tok in s.split(self._seq_delim):
                    try:
                        out.add(int(float(tok)))
                    except ValueError:
                        continue
            return out
        try:
            return set(col.cast(pa.int64(), safe=False).to_pylist())
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            out = set()
            for s in col.cast(pa.string()).to_pylist():
                try:
                    out.add(int(float(s)))
                except (TypeError, ValueError):
                    continue
            return out

    def _item_table_path(self) -> str:
        return (
            getattr(self._config, "item_input_path", "")
            or self._config.input_path
        )

    def _build_item_arrays(self, path: str) -> Dict[str, np.ndarray]:
        """Parse the item file into the flat numpy arrays that make up
        the item table: ids/weights, the alias table, a sorted-id index
        (replaces the per-worker python id->row dict) and the attrs
        column as offsets+utf8 bytes (decoded lazily per sampled row)."""
        tbl = _read_table(path)
        names = tbl.schema.names
        ids = tbl.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        weights = (
            tbl.column(1).to_numpy(zero_copy_only=False).astype(np.float64)
            if len(names) > 1
            else np.ones(len(ids))
        )
        alias = AliasTable(weights)
        order = np.argsort(ids, kind="stable")
        arrs: Dict[str, np.ndarray] = {
            "ids": ids,
            "weights": weights,
            "alias_prob": alias._prob,
            "alias_alias": alias._alias,
            "rows_sorted": order.astype(np.int64),
            "ids_sorted": ids[order],
        }
        if len(names) > 2 and self._attr_fields:
            col = tbl.column(2).cast(pa.large_string()).combine_chunks()
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            arrs["attr_offsets"] = np.asarray(
                col.buffers()[1], dtype=np.uint8
            ).view(np.int64)[col.offset : col.offset + len(col) + 1].copy()
            data = col.buffers()[2]
            arrs["attr_bytes"] = (
                np.asarray(data, dtype=np.uint8).copy()
                if data is not None else np.zeros(0, np.uint8)
            )
        return arrs

    def _install_item_arrays(self, arrs: Dict[str, np.ndarray]) -> None:
        self._item_ids = arrs["ids"]
        self._item_weights = arrs["weights"]
        self._alias = AliasTable.from_arrays(
            arrs["alias_prob"], arrs["alias_alias"]
        )
        self._rows_sorted = arrs["rows_sorted"]
        self._ids_sorted = arrs["ids_sorted"]
        self._attr_offsets = arrs.get("attr_offsets")
        self._attr_bytes = arrs.get("attr_bytes")

    def _extra_shared_arrays(self) -> Dict[str, np.ndarray]:
        """Subclass hook: additional flat arrays to publish in the shm
        pack next to the item table (e.g. NegativeSamplerV2's
        positive-edge CSR). Built once in the parent."""
        return {}

    def _install_extra_shared(self, arrs: Dict[str, np.ndarray]) -> None:
        """Subclass hook: install the arrays from _extra_shared_arrays
        (called on both the build and the shm-attach path)."""

    def _load_item_table(self, path: str) -> None:
        shm_name = getattr(self, "_shm_name", None)
        if shm_name:
            from torcheasyrec_tpu.utils import shm_pack

            arrs = shm_pack.attach(shm_name)
            self._install_item_arrays(arrs)
            self._install_extra_shared(arrs)
            return
        self._install_item_arrays(self._build_item_arrays(path))

    def prepare_shared(self) -> None:
        """Build the item table (and the subclass's edge tables — see
        _extra_shared_arrays) ONCE in the parent process and publish
        them as a shared-memory segment; pickled copies of this sampler
        (mp-loader workers) attach instead of re-parsing the files —
        N workers share one table set (reference: one graphlearn server
        per host, sampler.py:322-335). The TDM tree stays per-worker;
        it is orders of magnitude smaller."""
        if getattr(self, "_shm_name", None):
            return
        import uuid

        from torcheasyrec_tpu.utils import shm_pack

        name = f"tzrec_item_{uuid.uuid4().hex[:12]}"
        arrs = self._build_item_arrays(self._item_table_path())
        arrs.update(self._extra_shared_arrays())
        packed = shm_pack.build(name, arrs)
        self._install_item_arrays(packed)
        self._install_extra_shared(packed)
        self._shm_name = name

    def close_shared(self) -> None:
        name = getattr(self, "_shm_name", None)
        if name:
            from torcheasyrec_tpu.utils import shm_pack

            shm_pack.unlink(name)
            self._shm_name = None

    _ITEM_TABLE_FIELDS = (
        "_item_ids", "_item_weights", "_alias", "_rows_sorted",
        "_ids_sorted", "_attr_offsets", "_attr_bytes",
    )

    def __getstate__(self):
        """Pickling for mp-loader workers: once the table is shared,
        drop the (shm-backed, unpicklable-without-copy) array views —
        the worker re-attaches in init()."""
        state = dict(self.__dict__)
        if state.get("_shm_name"):
            for k in self._ITEM_TABLE_FIELDS:
                state.pop(k, None)
            state["_inited"] = False
        return state

    # -- item-table lookups ------------------------------------------------

    def _rows_of(self, ids: np.ndarray) -> np.ndarray:
        """item ids -> row indices (-1 for unknown ids); O(log n) via
        the sorted-id index."""
        ids = np.asarray(ids, np.int64)
        if len(self._ids_sorted) == 0:
            return np.full(ids.shape, -1, np.int64)
        pos = np.searchsorted(self._ids_sorted, ids)
        pos = np.clip(pos, 0, len(self._ids_sorted) - 1)
        ok = self._ids_sorted[pos] == ids
        return np.where(ok, self._rows_sorted[pos], -1)

    def _row_of(self, item_id: int) -> int:
        return int(self._rows_of(np.asarray([item_id]))[0])

    @property
    def _has_attrs(self) -> bool:
        return self._attr_offsets is not None and len(self._attr_offsets) > 1

    def _attr_vals(self, row: int) -> List[str]:
        o = self._attr_offsets
        s = bytes(self._attr_bytes[o[row] : o[row + 1]]).decode(
            "utf-8", "replace"
        )
        return s.split(self._attr_delim)

    def _append_negatives(
        self, columns: Dict[str, pa.Array], rows: np.ndarray
    ) -> Dict[str, pa.Array]:
        """Append sampled item rows to the batch's item-side columns.

        Mirrors reference dataset.py:390-464: the __NEG__ data-group
        features then parse at length B + num_sample (positive items
        first, shared negatives after).
        """
        out = dict(columns)
        neg_vals: Dict[str, List[str]] = {
            name: [] for name in self._attr_fields
        }
        if self._has_attrs:
            for r in rows:
                vals = self._attr_vals(int(r))
                for j, name in enumerate(self._attr_fields):
                    neg_vals[name].append(vals[j] if j < len(vals) else "")
        else:
            neg_vals = {self._item_id_field: [str(self._item_ids[r])
                                              for r in rows]}
        for name, vals in neg_vals.items():
            if name not in columns:
                continue
            col = columns[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            neg_arr = pa.array(vals, type=pa.string())
            try:
                neg_arr = neg_arr.cast(col.type)
            except pa.ArrowInvalid:
                col = col.cast(pa.string())
            out[name] = pa.concat_arrays([col, neg_arr])
        return out


class NegativeSampler(BaseSampler):
    """Weighted random negatives (reference sampler.py:464-537)."""

    def _load(self) -> None:
        self._load_item_table(self._config.input_path)

    def process(self, columns: Dict[str, pa.Array]) -> Dict[str, pa.Array]:
        self.init()
        rows = self._alias.sample(self._num_sample, self._rng)
        # exclude in-batch positive ids by resampling (best effort, 2 tries)
        if self._item_id_field in columns:
            pos = self._pos_id_set(columns)
            for _ in range(2):
                bad = np.asarray(
                    [int(self._item_ids[r]) in pos for r in rows]
                )
                if not bad.any():
                    break
                rows[bad] = self._alias.sample(int(bad.sum()), self._rng)
        return self._append_negatives(columns, rows)


def _edges_to_csr(path: str, prefix: str) -> Dict[str, np.ndarray]:
    """(user, item) edge file -> CSR arrays {prefix_users (unique,
    sorted), prefix_offs [U+1], prefix_items [E]} — flat numpy so the
    whole edge table rides in the per-host shm pack (reference:
    graphlearn's edge tables live in the per-host sampling server,
    sampler.py:540-636)."""
    edges = _read_table(path)
    u = edges.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    i = edges.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(u, kind="stable")
    u, i = u[order], i[order]
    users, starts = np.unique(u, return_index=True)
    offs = np.concatenate([starts, [u.size]]).astype(np.int64)
    return {
        f"{prefix}_users": users,
        f"{prefix}_offs": offs,
        f"{prefix}_items": i,
    }


class NegativeSamplerV2(BaseSampler):
    """Negatives excluding the user's positive edges
    (reference sampler.py:540-636). The edge table is CSR numpy and
    ships in the shm pack — mp-loader workers attach, not re-parse."""

    _ITEM_TABLE_FIELDS = BaseSampler._ITEM_TABLE_FIELDS + (
        "_pe_users", "_pe_offs", "_pe_items",
    )

    def _extra_shared_arrays(self) -> Dict[str, np.ndarray]:
        path = getattr(self._config, "pos_edge_input_path", "")
        return _edges_to_csr(path, "pe") if path else {}

    def _install_extra_shared(self, arrs: Dict[str, np.ndarray]) -> None:
        if "pe_users" in arrs:
            self._pe_users = arrs["pe_users"]
            self._pe_offs = arrs["pe_offs"]
            self._pe_items = arrs["pe_items"]

    def _load(self) -> None:
        self._load_item_table(self._config.item_input_path)
        if not hasattr(self, "_pe_users"):
            # build ONLY the pos-edge CSR here — subclasses' extra
            # arrays (hard-neg edges) have their own missing-check in
            # their _load; rebuilding everything would discard the
            # just-attached shm views
            path = getattr(self._config, "pos_edge_input_path", "")
            if path:
                self._install_extra_shared(_edges_to_csr(path, "pe"))
        if not hasattr(self, "_pe_users"):
            self._pe_users = np.zeros(0, np.int64)
            self._pe_offs = np.zeros(1, np.int64)
            self._pe_items = np.zeros(0, np.int64)
        self._user_id_field = self._config.user_id_field

    def _banned_for(self, users) -> np.ndarray:
        """Distinct positive-edge item ids of the given users (sorted)."""
        if not len(users) or self._pe_users.size == 0:
            return np.zeros(0, np.int64)
        uu = np.unique(np.asarray(users, np.int64))
        pos = np.searchsorted(self._pe_users, uu)
        pos = pos[
            (pos < self._pe_users.size)
            & (self._pe_users[np.minimum(pos, self._pe_users.size - 1)]
               == uu)
        ]
        if not pos.size:
            return np.zeros(0, np.int64)
        parts = [
            self._pe_items[self._pe_offs[p] : self._pe_offs[p + 1]]
            for p in pos
        ]
        return np.unique(np.concatenate(parts))

    def process(self, columns: Dict[str, pa.Array]) -> Dict[str, pa.Array]:
        self.init()
        rows = self._alias.sample(self._num_sample, self._rng)
        if self._user_id_field in columns:
            users = (
                columns[self._user_id_field]
                .cast(pa.int64(), safe=False)
                .to_numpy(zero_copy_only=False)
            )
            banned = self._banned_for(users)
            for _ in range(2):
                bad = np.isin(self._item_ids[rows], banned)
                if not bad.any():
                    break
                rows[bad] = self._alias.sample(int(bad.sum()), self._rng)
            bad = np.isin(self._item_ids[rows], banned)
            if bad.any():
                # exact fallback: the exclusion is a CONTRACT (reference
                # graphlearn negative_sampler_v2 samples the complement);
                # under heavy ban ratios resampling alone leaks
                w = self._item_weights * ~np.isin(self._item_ids, banned)
                if w.sum() > 0:
                    rows[bad] = self._rng.choice(
                        len(self._item_ids), size=int(bad.sum()),
                        p=w / w.sum(),
                    )
        return self._append_negatives(columns, rows)


class HardNegativeSampler(NegativeSamplerV2):
    """Random negatives + per-user hard negatives with attribution
    (reference sampler.py:639-747).

    Item rows come out as ``[B positives | num_sample shared negatives |
    B*num_hard_sample hard slots]`` — the hard block is always the SAME
    static size (empty slots repeat item row 0) so the jitted step never
    recompiles on per-batch hard counts. ``HARD_NEG_INDICES`` carries
    int32 ``[B*num_hard, 2]`` (user_row, hard_col) pairs; empty slots
    get user_row == B, which the model's scatter drops (reference
    match_model.py:66-95 builds the same sparse [B, max_col+1] sim and
    masks absent slots)."""

    _ITEM_TABLE_FIELDS = NegativeSamplerV2._ITEM_TABLE_FIELDS + (
        "_he_users", "_he_offs", "_he_items",
    )

    def _extra_shared_arrays(self) -> Dict[str, np.ndarray]:
        arrs = NegativeSamplerV2._extra_shared_arrays(self)
        arrs.update(_edges_to_csr(
            self._config.hard_neg_edge_input_path, "he"
        ))
        return arrs

    def _install_extra_shared(self, arrs: Dict[str, np.ndarray]) -> None:
        NegativeSamplerV2._install_extra_shared(self, arrs)
        if "he_users" in arrs:
            self._he_users = arrs["he_users"]
            self._he_offs = arrs["he_offs"]
            self._he_items = arrs["he_items"]

    def _load(self) -> None:
        NegativeSamplerV2._load(self)
        if not hasattr(self, "_he_users"):
            self._install_extra_shared(_edges_to_csr(
                self._config.hard_neg_edge_input_path, "he"
            ))
        self._num_hard = int(self._config.num_hard_sample)

    def _hard_cands(self, user: int) -> np.ndarray:
        p = int(np.searchsorted(self._he_users, user))
        if p >= self._he_users.size or self._he_users[p] != user:
            return np.zeros(0, np.int64)
        return self._he_items[self._he_offs[p] : self._he_offs[p + 1]]

    def process(self, columns: Dict[str, pa.Array]) -> Dict[str, pa.Array]:
        self.init()
        rows = list(self._alias.sample(self._num_sample, self._rng))
        users = None
        if self._user_id_field in columns:
            users = (
                columns[self._user_id_field]
                .cast(pa.int64(), safe=False)
                .to_numpy(zero_copy_only=False)
            )
        if users is not None and self._pe_users.size:
            # V2 semantics: shared negatives avoid the batch users'
            # positive edges (reference sampler.py:540-636)
            banned = self._banned_for(users)
            rows_np = np.asarray(rows, dtype=np.int64)
            for _ in range(2):
                bad = np.isin(self._item_ids[rows_np], banned)
                if not bad.any():
                    break
                rows_np[bad] = self._alias.sample(int(bad.sum()), self._rng)
            rows = list(rows_np)
        b = len(next(iter(columns.values())))
        k = self._num_hard
        indices = np.empty((b * k, 2), dtype=np.int32)
        indices[:, 0] = b  # sentinel: dropped by the model's scatter
        indices[:, 1] = 0
        for i in range(b):
            cands = (
                self._hard_cands(int(users[i]))
                if users is not None
                else np.zeros(0, np.int64)
            )
            crows = self._rows_of(np.asarray(cands, np.int64))
            crows = crows[crows >= 0]
            take = (
                self._rng.choice(
                    crows, size=min(k, len(crows)), replace=False
                )
                if len(crows)
                else []
            )
            for j in range(k):
                if j < len(take):
                    rows.append(int(take[j]))
                    indices[i * k + j] = (i, j)
                else:
                    rows.append(0)  # masked filler keeps shapes static
        out = self._append_negatives(
            columns, np.asarray(rows, dtype=np.int64)
        )
        out[HARD_NEG_INDICES] = indices
        return out


class HardNegativeSamplerV2(HardNegativeSampler):
    """Same as HardNegativeSampler plus pos-edge exclusion for the
    shared negatives (reference sampler.py:689-747) — handled in the
    base via the optional ``pos_edge_input_path``."""


class TDMSampler(BaseSampler):
    """Tree-based sampler (reference sampler.py:867-1079): every row
    expands into, per tree layer, 1 ancestor positive + layer_num_sample
    negatives drawn from that layer. User-side columns are repeated; the
    item-side attr columns and the first label field are overwritten.
    """

    def __init__(self, config, fields=None, batch_size=1024,
                 is_training=True, label_field: str = "label",
                 seq_delim: Optional[str] = None) -> None:
        super().__init__(config, fields, batch_size, is_training, seq_delim)
        self._label_field = label_field
        self._layer_num_sample = list(config.layer_num_sample)
        self._remain_ratio = float(getattr(config, "remain_ratio", 1.0))

    def _load(self) -> None:
        self._load_item_table(self._config.item_input_path)
        edges = _read_table(self._config.edge_input_path)
        src = edges.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        dst = edges.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        # edges: parent(src) -> child(dst); build child -> parent
        self._parent = {int(c): int(p) for p, c in zip(src, dst)}
        # assign layers: leaves are items without children
        children: Dict[int, List[int]] = {}
        for p, c in zip(src, dst):
            children.setdefault(int(p), []).append(int(c))
        self._children = children
        # depth per node (root depth 0)
        def depth(n: int) -> int:
            d = 0
            while n in self._parent:
                n = self._parent[n]
                d += 1
            return d
        self._depth = {int(n): depth(int(n)) for n in self._item_ids}
        for p in children:
            self._depth.setdefault(p, depth(p))
        self._max_depth = max(self._depth.values()) if self._depth else 0
        # nodes per layer for negative sampling
        self._layer_nodes: Dict[int, np.ndarray] = {}
        for n, d in self._depth.items():
            self._layer_nodes.setdefault(d, []).append(n)
        self._layer_nodes = {
            d: np.asarray(v, np.int64) for d, v in self._layer_nodes.items()
        }

    def ancestors(self, item: int) -> List[int]:
        out = [item]
        n = item
        while n in self._parent:
            n = self._parent[n]
            out.append(n)
        return out  # leaf .. root

    def process(self, columns: Dict[str, pa.Array]) -> Dict[str, pa.Array]:
        self.init()
        item_col = columns[self._item_id_field]
        items = item_col.cast(pa.int64(), safe=False).to_pylist()
        n = len(items)
        rep_idx: List[int] = []
        out_nodes: List[int] = []
        out_labels: List[float] = []
        for i, it in enumerate(items):
            anc = self.ancestors(int(it) if it is not None else 0)
            for node in anc:
                # layer_num_sample is indexed from the ROOT (depth 0),
                # reference sampler.py:920-923; the root itself has no
                # negatives (its configured count is 0)
                layer_depth = self._depth.get(node, 0)
                neg_cnt = (
                    self._layer_num_sample[layer_depth]
                    if layer_depth < len(self._layer_num_sample)
                    else (self._layer_num_sample[-1]
                          if self._layer_num_sample else 1)
                )
                pool = self._layer_nodes.get(layer_depth)
                if layer_depth == 0 and neg_cnt == 0 and (
                    pool is None or len(pool) <= 1
                ):
                    continue  # skip the root entirely
                # positive
                rep_idx.append(i)
                out_nodes.append(node)
                out_labels.append(1.0)
                if pool is None or len(pool) <= 1 or neg_cnt <= 0:
                    continue
                negs = self._rng.choice(pool, size=neg_cnt)
                for ng in negs:
                    if int(ng) == node:
                        continue
                    rep_idx.append(i)
                    out_nodes.append(int(ng))
                    out_labels.append(0.0)
        rep = np.asarray(rep_idx, np.int64)
        out: Dict[str, pa.Array] = {}
        for name, col in columns.items():
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out[name] = col.take(pa_from_numpy(rep))
        node_arr = np.asarray(out_nodes, np.int64)
        # overwrite item id + attrs with sampled tree nodes
        out[self._item_id_field] = pa_from_numpy(node_arr)
        if self._has_attrs:
            node_rows = self._rows_of(node_arr)
            decoded = [
                self._attr_vals(int(r)) if r >= 0 else [] for r in node_rows
            ]
            for j, fname in enumerate(self._attr_fields):
                if fname == self._item_id_field or fname not in columns:
                    continue
                vals = [a[j] if j < len(a) else "" for a in decoded]
                try:
                    out[fname] = pa.array(vals).cast(columns[fname].type)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    out[fname] = pa.array(vals)
        out[self._label_field] = pa.array(
            np.asarray(out_labels, np.float32)
        )
        return out


class TDMPredictSampler(BaseSampler):
    """TDM predict-time child expansion (reference sampler.py:1082-1168).

    Given a batch of tree-node ids, samples up to ``expand_factor``
    children per node (random without replacement) from the tree's
    parent->child edge table and returns their item-side attr columns —
    the layer-by-layer expansion primitive that
    ``tools/tdm/retrieval.py`` drives during beam search. Prediction
    starts with ``init_sampler(first_layer_width)`` from the root, then
    re-inits with ``n_cluster`` per inner layer like the reference's
    ``init_sampler``.
    """

    def __init__(self, config, fields=None, batch_size=1024,
                 is_training=False, seq_delim: Optional[str] = None) -> None:
        super().__init__(config, fields, batch_size, is_training, seq_delim)
        self._expand_factor = 0

    def _load(self) -> None:
        self._load_item_table(self._config.item_input_path)
        edge_path = (
            getattr(self._config, "predict_edge_input_path", "")
            or self._config.edge_input_path
        )
        edges = _read_table(edge_path)
        src = edges.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        dst = edges.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        children: Dict[int, List[int]] = {}
        for p, c in zip(src, dst):
            children.setdefault(int(p), []).append(int(c))
        self._children = children
        self._max_level = len(list(self._config.layer_num_sample))

    def init_sampler(self, expand_factor: int) -> None:
        """Set how many children each node expands into (reference
        sampler.py:1134-1146: root round = first-layer width, inner
        rounds = n_cluster)."""
        self.init()
        self._expand_factor = int(expand_factor)

    def get_children_ids(self, ids: np.ndarray) -> np.ndarray:
        """[n] node ids -> [n, expand_factor] child ids, -1 padded.

        Sampling is without replacement; nodes with <= expand_factor
        children return them all (tree fan-out == n_cluster makes this
        exact on real TDM trees).
        """
        self.init()
        k = self._expand_factor
        out = np.full((len(ids), k), -1, np.int64)
        for i, nid in enumerate(np.asarray(ids, np.int64)):
            if nid < 0:
                continue
            ch = self._children.get(int(nid), ())
            if len(ch) > k:
                ch = self._rng.choice(
                    np.asarray(ch, np.int64), size=k, replace=False
                )
            out[i, : len(ch)] = np.asarray(ch, np.int64)[: len(ch)]
        return out

    def get(self, input_data: Dict[str, pa.Array]) -> Dict[str, pa.Array]:
        """Batch of node ids -> flattened child attr columns
        ([n * expand_factor] rows, pad children emit empty strings),
        mirroring the reference's ``get`` -> ``_parse_nodes`` contract.
        """
        col = input_data[self._item_id_field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = col.cast(pa.int64(), safe=False).to_numpy(
            zero_copy_only=False
        )
        flat = self.get_children_ids(ids).reshape(-1)
        return self.node_attr_columns(flat)

    def node_attr_columns(
        self, node_ids: np.ndarray
    ) -> Dict[str, pa.Array]:
        """Flat node ids -> item-side attr columns (pad id -1 -> '')."""
        self.init()
        names = self._attr_fields
        cols: Dict[str, List[str]] = {name: [] for name in names}
        node_ids = np.asarray(node_ids, np.int64)
        node_rows = self._rows_of(node_ids)
        for nid, row in zip(node_ids, node_rows):
            vals = (
                self._attr_vals(int(row))
                if (self._has_attrs and row >= 0)
                else ([str(nid)] if nid >= 0 else [""])
            )
            for j, name in enumerate(names):
                cols[name].append(vals[j] if j < len(vals) else "")
        return {k: pa.array(v, type=pa.string()) for k, v in cols.items()}
