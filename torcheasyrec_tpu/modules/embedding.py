"""EmbeddingGroup: feature groups -> engine lookups + group assembly.

Counterpart of /root/reference/tzrec/modules/embedding.py
(EmbeddingGroup:141, EmbeddingGroupImpl:625, SequenceEmbeddingGroupImpl:937)
and dense_embedding_collection.py (AutoDis:97, MLPEmbedding:215).

Maps FeatureGroupConfig protos onto the sharded EmbeddingEngine:
- DEEP groups concat pooled embeddings + raw/embedded dense values in
  feature_names order, then append sequence-encoder outputs
  (reference embedding.py:505-510).
- WIDE groups get independent tables with ``wide_embedding_dim``
  (reference embedding.py:722-730).
- SEQUENCE groups (and nested ``sequence_groups``) produce
  ``{g}.query`` / ``{g}.sequence`` / ``{g}.sequence_length``
  (reference embedding.py:1359-1440).
- Shared embeddings: same ``embedding_name`` -> one table; conflicting
  rows/dims raise (reference embedding.py:524-547).
"""

import collections
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.features.feature import BaseFeature
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.sequence import SequenceEncoder, create_seq_encoder
from torcheasyrec_tpu.parallel.emb_engine import (
    DATA_PARALLEL,
    ROW_WISE,
    EmbeddingEngine,
    LookupSpec,
    TableSpec,
)
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
from torcheasyrec_tpu.protos import model_pb2

# tables below this row count default to data_parallel (planner heuristic;
# reference plan_util's DP proposer decides per-table, SURVEY.md §2.2)
_DP_ROWS_THRESHOLD = 8192


def _has_field(msg, name: str) -> bool:
    try:
        return msg.HasField(name)
    except ValueError:
        return False


class EmbeddingGroup(M.Module):
    def __init__(
        self,
        features: List[BaseFeature],
        feature_groups: List[Any],
        mesh=None,
        sparse_optimizer: Optional[SparseOptimizer] = None,
        wide_embedding_dim: Optional[int] = None,
        wide_init_fn: Optional[str] = None,
        plan: Optional[Dict[str, str]] = None,
    ) -> None:
        self._name_to_feature = {f.name: f for f in features}
        self._feature_groups = list(feature_groups)
        self._plan = plan or {}
        self._user_side_features = {
            f.name for f in features if f.is_user_side
        }

        tables: Dict[str, TableSpec] = {}
        lookups: Dict[str, LookupSpec] = {}
        # group_name -> list of slot descriptors
        #   ("emb", lookup_key, dim) | ("dense", fname, dim)
        #   ("autodis", fname, dim) | ("mlpemb", fname, dim)
        self._group_slots: Dict[str, List[Tuple[str, str, int]]] = {}
        # seq group name -> dict(query=[slots], sequence=[slots], length_feature)
        self._seq_groups: Dict[str, Dict[str, Any]] = {}
        self._group_encoders: Dict[str, List[SequenceEncoder]] = {}
        self._dense_emb_modules: Dict[str, Any] = {}
        self._group_is_sequence: Dict[str, bool] = {}

        def _add_table(feat: BaseFeature, dim_override=None, suffix="",
                       init_override=None) -> str:
            cfg = feat.emb_config()
            name = cfg.name + suffix
            dim = dim_override or cfg.embedding_dim
            sharding = self._plan.get(
                name,
                ROW_WISE if cfg.num_embeddings >= _DP_ROWS_THRESHOLD
                else DATA_PARALLEL,
            )
            if cfg.sharding_types and sharding not in cfg.sharding_types:
                # constraint wins over the plan/default; any engine
                # layout is honored (row/column/table/table_row-wise,
                # data_parallel, host_offload)
                sharding = cfg.sharding_types[0]
            spec = TableSpec(
                name=name,
                rows=cfg.num_embeddings,
                dim=dim,
                init_fn=init_override or cfg.init_fn,
                trainable=cfg.trainable,
                sharding=sharding,
                dtype=(getattr(feat.config, "data_type", "FP32")
                       or "FP32").upper(),
                sharding_types=tuple(cfg.sharding_types),
            )
            if name in tables:
                prev = tables[name]
                if (prev.rows, prev.dim) != (spec.rows, spec.dim):
                    raise ValueError(
                        f"shared embedding {name}: conflicting shapes "
                        f"{(prev.rows, prev.dim)} vs {(spec.rows, spec.dim)}"
                    )
            else:
                tables[name] = spec
            return name

        def _add_lookup(feat, table_name, is_sequence=False) -> Tuple[str, int]:
            key = f"{table_name}:{feat.name}" + (":seq" if is_sequence else "")
            if key not in lookups:
                lookups[key] = LookupSpec(
                    key=key,
                    feature_name=feat.name,
                    table_name=table_name,
                    combiner="none" if is_sequence else feat.pooling,
                    is_sequence=is_sequence,
                )
            return key, tables[table_name].dim

        def _build_seq_group(seq_name: str, feature_names, suffix="") -> None:
            if seq_name in self._seq_groups:
                raise ValueError(
                    f"duplicate sequence group name {seq_name!r}: "
                    "encoders would consume a different group's layout"
                )
            q_slots, s_slots = [], []
            length_feature = None
            for fname in feature_names:
                feat = self._name_to_feature[fname]
                if feat.is_sequence:
                    if feat.is_sparse:
                        tname = _add_table(feat, suffix=suffix)
                        key, dim = _add_lookup(feat, tname, is_sequence=True)
                        s_slots.append(("emb", key, dim))
                    else:
                        s_slots.append(
                            ("seq_dense", fname, max(feat.value_dim, 1))
                        )
                    if length_feature is None:
                        length_feature = fname
                else:
                    if feat.is_sparse:
                        tname = _add_table(feat, suffix=suffix)
                        key, dim = _add_lookup(feat, tname)
                        q_slots.append(("emb", key, dim))
                    else:
                        q_slots.append(self._dense_slot(feat))
            if length_feature is None:
                raise ValueError(
                    f"sequence group {seq_name} has no sequence feature"
                )
            self._seq_groups[seq_name] = {
                "query": q_slots,
                "sequence": s_slots,
                "length_feature": length_feature,
            }

        for group in feature_groups:
            gname = group.group_name
            gtype = group.group_type
            suffix = getattr(group, "embedding_name_suffix", "") or ""
            if gtype in (model_pb2.SEQUENCE, model_pb2.JAGGED_SEQUENCE):
                self._group_is_sequence[gname] = True
                _build_seq_group(gname, group.feature_names, suffix)
                continue
            self._group_is_sequence[gname] = False
            slots: List[Tuple[str, str, int]] = []
            is_wide = gtype == model_pb2.WIDE
            for fname in group.feature_names:
                feat = self._name_to_feature[fname]
                if feat.is_sequence:
                    raise ValueError(
                        f"sequence feature {fname} must be in a SEQUENCE "
                        f"group or sequence_groups (group {gname})"
                    )
                if is_wide and not feat.is_sparse:
                    raise ValueError(
                        f"dense feature {fname} should not be configured "
                        f"in wide group {gname}"
                    )
                if feat.is_sparse:
                    if is_wide:
                        wd = wide_embedding_dim or 4
                        tname = _add_table(
                            feat, dim_override=wd, suffix=suffix + "__wide",
                            init_override=wide_init_fn,
                        )
                    else:
                        tname = _add_table(feat, suffix=suffix)
                    key, dim = _add_lookup(feat, tname)
                    slots.append(("emb", key, dim))
                else:
                    slots.append(self._dense_slot(feat))
            self._group_slots[gname] = slots
            for sg in group.sequence_groups:
                sg_name = sg.group_name or gname
                _build_seq_group(
                    sg_name, sg.feature_names,
                    getattr(sg, "embedding_name_suffix", "") or suffix,
                )
            if len(group.sequence_encoders) > 0:
                dims = self.seq_group_dims()
                default_input = (
                    group.sequence_groups[0].group_name or gname
                    if len(group.sequence_groups) == 1 else ""
                )
                self._group_encoders[gname] = [
                    create_seq_encoder(c, dims, default_input)
                    for c in group.sequence_encoders
                ]

        # zch/dynamicemb table names must be known BEFORE engine
        # construction: they are excluded from co-keyed merging (their
        # feature ids are collision-remapped in-step; a merged gather
        # would feed remapped slots to co-keyed plain tables, and the
        # stage_route skip set below is keyed by these original names)
        zch_table_names = {
            f.embedding_name
            for f in features
            if (getattr(f.config, "zch", None) is not None
                and _has_field(f.config, "zch"))
            or (getattr(f.config, "dynamicemb", None) is not None
                and _has_field(f.config, "dynamicemb"))
        }
        self.engine = EmbeddingEngine(
            list(tables.values()),
            list(lookups.values()),
            mesh=mesh,
            optimizer=sparse_optimizer,
            no_merge_tables=zch_table_names or None,
        )

        # zero-collision-hash managers (reference feature.py:693-736)
        from torcheasyrec_tpu.parallel import zch as zch_mod

        # keyed by embedding table: features sharing an embedding_name
        # MUST share one collision mapping (reference _add_mc_module,
        # embedding.py:603-622) or the same raw id would read different
        # rows of the shared table
        self._zch_cfgs: Dict[str, zch_mod.ZchConfig] = {}
        self._zch_features: Dict[str, str] = {}  # feature -> table key
        # dynamicemb tables get a host-memory spill tier behind the
        # device cache (reference HKV: unbounded key space, evicted
        # keys keep their trained vectors in host memory and restore
        # on readmission — feature.proto:90-117). parallel/host_spill.
        self._spill_tables: set = set()
        self._spill_scatter_fns: Dict[Any, Any] = {}
        for f in features:
            zc = getattr(f.config, "zch", None)
            if zc is not None and f.config.HasField("zch"):
                which = zc.WhichOneof("eviction_policy") or "lfu"
                policy = {
                    "lfu": "lfu", "lru": "lru",
                    "distance_lfu": "distance_lfu",
                }[which]
                decay = 1.0
                if which in ("lru", "distance_lfu"):
                    decay = float(getattr(zc, which).decay_exponent)
                self._zch_features[f.name] = f.embedding_name
                self._zch_cfgs.setdefault(
                    f.embedding_name, zch_mod.ZchConfig(
                    size=int(zc.zch_size), policy=policy,
                    decay_exponent=decay,
                    eviction_interval=int(
                        getattr(zc, "eviction_interval", 1) or 1
                    ),
                    filter_fn=(
                        zc.threshold_filtering_func
                        if getattr(zc, "threshold_filtering_func", "")
                        else None
                    ),
                ))
                continue
            # DynamicEmbedding maps onto the same zero-collision table
            # (reference dynamicemb HKV hash table, feature.proto
            # DynamicEmbedding; score_strategy -> eviction policy)
            de = getattr(f.config, "dynamicemb", None)
            if de is not None and hasattr(
                f.config, "HasField"
            ) and _has_field(f.config, "dynamicemb"):
                policy = {
                    "LFU": "lfu", "STEP": "lru", "TIMESTAMP": "lru",
                    "NO_EVICTION": "lfu",
                }.get((de.score_strategy or "STEP").upper(), "lru")
                admit_threshold = 0
                counter_size = 0
                if de.WhichOneof("admission_strategy") == (
                    "frequency_admission_strategy"
                ):
                    fas = de.frequency_admission_strategy
                    admit_threshold = int(fas.threshold)
                    counter_size = int(
                        fas.counter_capacity or 4 * de.max_capacity
                    )
                self._zch_features[f.name] = f.embedding_name
                self._zch_cfgs.setdefault(
                    f.embedding_name, zch_mod.ZchConfig(
                        size=int(de.max_capacity), policy=policy,
                        admit_threshold=admit_threshold,
                        counter_size=counter_size,
                    ),
                )
                if os.environ.get("TZREC_HOST_SPILL", "1") != "0":
                    if jax.process_count() > 1:
                        # the spill tier device_gets the per-step spill
                        # records and keeps a per-host LRU — under
                        # multi-host those arrays are not fully
                        # addressable and each host would only see its
                        # shard's evictions (mirrors the
                        # sparse_dist_overlap guard in main.py)
                        from torcheasyrec_tpu.utils.logging_util import (
                            logger,
                        )

                        logger.warning(
                            f"table {f.embedding_name}: host-spill "
                            "tier disabled under multi-process "
                            "training (single-process only in v1)"
                        )
                    else:
                        self._spill_tables.add(f.embedding_name)

        # host-offloaded tables gather rows BEFORE the jitted step, but
        # zch remap runs inside it — the host gather would see raw ids
        for tname in self._zch_cfgs:
            gk = self.engine._table_group.get(tname)
            if gk and self.engine.groups[gk].sharding == "host_offload":
                raise ValueError(
                    f"table {tname}: zch/dynamicemb tables cannot be "
                    "host_offload (ids are remapped on-device)"
                )

    @property
    def has_zch(self) -> bool:
        return bool(self._zch_cfgs)

    def init_zch_states(self) -> Dict[str, Any]:
        from torcheasyrec_tpu.parallel import zch as zch_mod

        return {
            name: zch_mod.init_state(
                cfg.size,
                counter_size=(
                    cfg.counter_size if cfg.admit_threshold > 0 else 0
                ),
            )
            for name, cfg in self._zch_cfgs.items()
        }

    def remap_zch(
        self, batch: Batch, zch_states: Dict[str, Any], step, training: bool,
        collect_spill: bool = False,
    ) -> Tuple[Batch, Dict[str, Any]]:
        """Remap raw ids of zch features into collision-managed slots.

        With ``collect_spill=True`` returns a third value: per-spill-
        table eviction/readmission records (concatenated over the
        table's features) for the host-spill tier — see
        parallel/host_spill.py. Tables without a spill tier are absent.
        """
        from torcheasyrec_tpu.datasets.utils import SparseField
        from torcheasyrec_tpu.parallel import zch as zch_mod

        if not self._zch_cfgs:
            return (batch, zch_states, {}) if collect_spill else (
                batch, zch_states
            )
        new_states = dict(zch_states)
        sparse = dict(batch.sparse_features)
        seq_sparse = dict(batch.sequence_sparse_features)
        spills: Dict[str, Dict[str, list]] = {}
        for fname, table_key in self._zch_features.items():
            cfg = self._zch_cfgs[table_key]
            want_spill = collect_spill and table_key in self._spill_tables
            for container in (sparse, seq_sparse):
                if fname in container:
                    field = container[fname]
                    if want_spill:
                        slots, ns, sp = zch_mod.lookup_insert(
                            new_states[table_key], cfg, field.values,
                            step, training, collect_spill=True,
                        )
                        acc = spills.setdefault(
                            table_key,
                            {k: [] for k in sp},
                        )
                        for k, v in sp.items():
                            acc[k].append(v)
                    else:
                        slots, ns = zch_mod.lookup_insert(
                            new_states[table_key], cfg, field.values,
                            step, training,
                        )
                    new_states[table_key] = ns
                    container[fname] = SparseField(
                        values=slots, lengths=field.lengths,
                        weights=field.weights, segments=field.segments,
                    )
        spill_out = {
            t: {k: jnp.concatenate(v) if len(v) > 1 else v[0]
                for k, v in rec.items()}
            for t, rec in spills.items()
        }
        new_batch = Batch(
            dense_features=batch.dense_features,
            sparse_features=sparse,
            sequence_sparse_features=seq_sparse,
            sequence_dense_features=batch.sequence_dense_features,
            labels=batch.labels,
            sample_weights=batch.sample_weights,
            additional=batch.additional,
            tile_size=batch.tile_size,
        )
        if collect_spill:
            return new_batch, new_states, spill_out
        return new_batch, new_states

    @property
    def has_host_spill(self) -> bool:
        return bool(self._spill_tables)

    def gather_spill_rows(
        self, tables: Dict[str, jnp.ndarray],
        spills: Dict[str, Dict[str, jnp.ndarray]],
    ) -> Dict[str, Dict[str, jnp.ndarray]]:
        """Inside the jitted train step, against the PRE-update tables:
        gather each evicted key's trained row so the host can store it.
        Adds ``evicted_rows`` [N, d] to every spill record."""
        out = {}
        for tname, rec in spills.items():
            gk, off, _rows, coff, d = self.engine._table_slice(tname)
            g = self.engine.groups[gk]
            ids = jnp.where(
                rec["evicted_keys"] >= 0, off + rec["slots"], -1
            )
            full = self.engine._dist_gather(tables[gk], ids, g)
            out[tname] = dict(rec, evicted_rows=full[:, coff:coff + d])
        return out

    def make_spill_manager(self):
        from torcheasyrec_tpu.parallel.host_spill import SpillManager

        dims = {}
        for tname in self._spill_tables:
            _gk, _off, _rows, _coff, d = self.engine._table_slice(tname)
            dims[tname] = d
        return SpillManager(dims)

    def apply_spill_restores(
        self, tables: Dict[str, jnp.ndarray],
        restores: Dict[str, Tuple[Any, Any]],
    ) -> Dict[str, jnp.ndarray]:
        """Host-side (between steps): scatter readmitted keys' stored
        vectors back into the device tables. Restore counts are padded
        to the next power of two so the jitted scatter compiles O(log)
        distinct shapes, not one per step."""
        import numpy as np

        new_tables = dict(tables)
        for tname, (slots, rows) in restores.items():
            gk, off, _rows, coff, d = self.engine._table_slice(tname)
            g = self.engine.groups[gk]
            m = len(slots)
            cap = 1 << max(0, (m - 1).bit_length())
            ids = np.full((cap,), -1, np.int32)
            ids[:m] = np.asarray(slots, np.int32) + off
            vecs = np.zeros((cap, d), np.float32)
            vecs[:m] = rows
            fn = self._spill_scatter_fns.get((gk, coff, d))
            if fn is None:
                fn = jax.jit(
                    lambda w, i, r, _g=g, _c=coff: (
                        self.engine.write_logical_rows(w, _g, i, r, _c)
                    ),
                    donate_argnums=(0,),
                )
                self._spill_scatter_fns[(gk, coff, d)] = fn
            new_tables[gk] = fn(new_tables[gk], ids, vecs)
        return new_tables

    # -- construction helpers ----------------------------------------------

    def _dense_slot(self, feat: BaseFeature) -> Tuple[str, str, int]:
        kind = "dense"
        dim = max(feat.value_dim, 1)
        demb = getattr(feat.config, "WhichOneof", lambda _: None)("dense_emb") \
            if hasattr(feat.config, "DESCRIPTOR") and any(
                o.name == "dense_emb"
                for o in feat.config.DESCRIPTOR.oneofs
            ) else None
        if demb == "autodis":
            vd = max(feat.value_dim, 1)
            kind = "autodis"
            dim = int(feat.config.embedding_dim) * vd
            c = feat.config.autodis
            self._dense_emb_modules[feat.name] = AutoDisEmbedding(
                num_channels=int(c.num_channels),
                embedding_dim=int(feat.config.embedding_dim),
                temperature=float(c.temperature),
                keep_prob=float(c.keep_prob),
            )
        elif demb == "mlp":
            kind, dim = "mlpemb", int(feat.config.embedding_dim)
            self._dense_emb_modules[feat.name] = MLPEmbedding(
                in_dim=max(feat.value_dim, 1), embedding_dim=dim
            )
        return (kind, feat.name, dim)

    # -- dims API (reference embedding.py:358-419) -------------------------

    def group_dims(self, group_name: str) -> List[int]:
        if self._group_is_sequence.get(group_name):
            return [d for _, _, d in self._seq_groups[group_name]["sequence"]]
        dims = [d for _, _, d in self._group_slots[group_name]]
        for enc in self._group_encoders.get(group_name, []):
            dims.append(enc.output_dim())
        return dims

    def group_total_dim(self, group_name: str) -> int:
        if self._group_is_sequence.get(group_name):
            sg = self._seq_groups[group_name]
            return sum(d for _, _, d in sg["sequence"])
        return sum(self.group_dims(group_name))

    def group_feature_dims(self, group_name: str) -> "collections.OrderedDict":
        out = collections.OrderedDict()
        for kind, key, dim in self._group_slots[group_name]:
            out[key] = dim
        for i, enc in enumerate(self._group_encoders.get(group_name, [])):
            out[f"__encoder_{i}"] = enc.output_dim()
        return out

    def seq_group_dims(self) -> Dict[str, int]:
        """{seq}.query / {seq}.sequence -> dim, for encoder factories."""
        out = {}
        for name, sg in self._seq_groups.items():
            out[f"{name}.query"] = sum(d for _, _, d in sg["query"])
            out[f"{name}.sequence"] = sum(d for _, _, d in sg["sequence"])
        return out

    def group_names(self):
        """NON-sequence feature-group names in config order. (Narrower
        than the reference's group_names(), which also lists sequence
        groups; callers here use it to resolve the main input group.)"""
        return list(self._group_slots.keys())

    def has_group(self, group_name: str) -> bool:
        return group_name in self._group_slots or group_name in self._seq_groups

    # -- params ------------------------------------------------------------

    def init(self, key: jax.Array) -> M.Params:
        params: M.Params = {"encoders": {}, "dense_emb": {}}
        for gname, encs in self._group_encoders.items():
            eps = []
            for enc in encs:
                key, sub = jax.random.split(key)
                eps.append(enc.init(sub))
            params["encoders"][gname] = eps
        for fname, mod in self._dense_emb_modules.items():
            key, sub = jax.random.split(key)
            params["dense_emb"][fname] = mod.init(sub)
        return params

    def init_tables(self, key: jax.Array):
        return self.engine.init(key)

    def init_opt_state(self):
        return self.engine.init_opt_state()

    # -- forward -----------------------------------------------------------

    def lookup(
        self, tables: Dict[str, jnp.ndarray], batch: Batch,
        staged: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        """Engine lookup only: (emb_out, residuals). The train step takes
        grads w.r.t. emb_out and routes them to engine.update — the
        in-backward-optimizer split (SURVEY.md §7 build decision).
        staged: pre-exchanged id routes from stage_route (the sparse-
        input-dist overlap pipeline)."""
        host_rows = {
            k[len("__host_rows__"):]: v
            for k, v in batch.additional.items()
            if k.startswith("__host_rows__")
        } or None
        return self.engine.lookup(
            tables, batch.sparse_features, batch.sequence_sparse_features,
            host_rows=host_rows, staged=staged,
        )

    def stage_route(self, batch: Batch) -> Dict[str, Any]:
        """Issue batch's embedding id exchange ahead of its step (the
        TrainPipelineSparseDist overlap; engine.stage_route). Groups
        holding zch/dynamicemb tables are skipped: their ids are only
        known after the in-step collision remap, so pre-staged raw-id
        routes would serve the wrong rows."""
        skip = {
            self.engine._table_group[t]
            for t in self._zch_cfgs
            if t in self.engine._table_group
        }
        return self.engine.stage_route(
            batch.sparse_features, batch.sequence_sparse_features,
            skip_groups=skip,
        )

    def host_prefetch_into(self, batch: Batch) -> Dict[str, Any]:
        """HOST_OFFLOAD support: gather this (numpy, pre-device_put)
        batch's rows from the host tables into batch.additional and
        return the flat ids for engine.host_apply after the step."""
        rows, ids = self.engine.host_prefetch(
            batch.sparse_features, batch.sequence_sparse_features
        )
        for gk, r in rows.items():
            batch.additional[f"__host_rows__{gk}"] = r
        return ids

    # -- per-tower export/serving subsets ----------------------------------

    def groups_closure(self, group_names) -> List[str]:
        """Group names + the sequence groups their encoders consume
        (a tower artifact must assemble those too)."""
        out = list(dict.fromkeys(group_names))
        for g in group_names:
            for enc in self._group_encoders.get(g, []):
                if enc.input not in out:
                    out.append(enc.input)
        return out

    def features_for_groups(self, group_names) -> List[str]:
        """Feature names a subset of groups reads (tower fg.json /
        dataloader projection for per-tower serving)."""
        names: List[str] = []

        def _add_slot(slot):
            kind, key, _ = slot
            f = key.split(":")[1] if kind == "emb" else key
            if f not in names:
                names.append(f)

        for g in group_names:
            sg = self._seq_groups.get(g)
            if sg is not None:
                for s in sg["query"]:
                    _add_slot(s)
                for s in sg["sequence"]:
                    _add_slot(s)
                if sg["length_feature"] not in names:
                    names.append(sg["length_feature"])
            for s in self._group_slots.get(g, []):
                _add_slot(s)
        return names

    def tables_for_groups(self, group_names) -> set:
        return self.engine.tables_for_features(
            set(self.features_for_groups(group_names))
        )

    def assemble(
        self,
        emb_out: Dict[str, jnp.ndarray],
        batch: Batch,
        params: M.Params,
        ctx: M.Context,
        groups: Optional[List[str]] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Pure function of emb_out: group concat + seq encoders.

        ``groups`` restricts assembly to the named (closure of) groups —
        the per-tower serving path (reference exports each MatchTower
        with only its side's features, main.py:1032-1056)."""
        gset = None if groups is None else set(groups)
        result: Dict[str, jnp.ndarray] = {}

        tile_size = batch.tile_size

        def _maybe_tile(v, fname):
            # INPUT_TILE: user-side rows parsed once -> tile to batch
            if (
                tile_size is not None
                and fname in self._user_side_features
                and v.shape[0] == 1
            ):
                import jax.numpy as _jnp

                reps = (int(tile_size),) + (1,) * (v.ndim - 1)
                return _jnp.tile(v, reps)
            return v

        def _slot_value(slot, seq=False):
            kind, key, dim = slot
            if kind == "emb":
                v = emb_out[key]
                fname = key.split(":")[1] if ":" in key else key
                return _maybe_tile(v.astype(ctx.compute_dtype), fname)
            if kind == "seq_dense":
                v = batch.sequence_dense_features[key].values.astype(
                    ctx.compute_dtype
                )
                return _maybe_tile(v, key)
            v = batch.dense_features[key].values.astype(ctx.compute_dtype)
            if kind == "autodis" or kind == "mlpemb":
                mod = self._dense_emb_modules[key]
                v = mod(params["dense_emb"][key], v, ctx)
            return _maybe_tile(v, key)

        # sequence groups first (encoders read them)
        for name, sg in self._seq_groups.items():
            if gset is not None and name not in gset:
                continue
            qs = [_slot_value(s) for s in sg["query"]]
            ss = [_slot_value(s, seq=True) for s in sg["sequence"]]
            lf = sg["length_feature"]
            if lf in batch.sequence_sparse_features:
                lengths = batch.sequence_sparse_features[lf].lengths
            else:
                lengths = batch.sequence_dense_features[lf].lengths
            lengths = _maybe_tile(lengths, lf)
            if qs:
                result[f"{name}.query"] = jnp.concatenate(qs, axis=-1)
            result[f"{name}.sequence"] = jnp.concatenate(ss, axis=-1)
            result[f"{name}.sequence_length"] = lengths

        for gname, slots in self._group_slots.items():
            if gset is not None and gname not in gset:
                continue
            vals = [_slot_value(s) for s in slots]
            encs = self._group_encoders.get(gname, [])
            for i, enc in enumerate(encs):
                vals.append(
                    enc(params["encoders"][gname][i], result, ctx,
                        f"embedding_group.encoders.{gname}.{i}")
                )
            result[gname] = (
                jnp.concatenate(vals, axis=-1) if len(vals) > 1 else vals[0]
            ) if vals else jnp.zeros((batch.batch_size, 0), ctx.compute_dtype)
        return result

    def forward(
        self,
        tables: Dict[str, jnp.ndarray],
        batch: Batch,
        params: M.Params,
        ctx: M.Context,
        groups: Optional[List[str]] = None,
    ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any]]:
        """lookup + assemble in one call (eval/predict path). ``groups``
        restricts both to a tower's group closure."""
        if groups is None:
            emb_out, residuals = self.lookup(tables, batch)
        else:
            emb_out, residuals = self.engine.lookup(
                tables, batch.sparse_features,
                batch.sequence_sparse_features,
                feature_filter=set(self.features_for_groups(groups)),
            )
        return (
            self.assemble(emb_out, batch, params, ctx, groups=groups),
            residuals,
        )

    def node_embedding(
        self,
        tables: Dict[str, jnp.ndarray],
        batch: Batch,
        params: M.Params,
        ctx: M.Context,
        seq_group: str,
    ) -> jnp.ndarray:
        """Per-candidate (tree-node/item) embedding: concat of the
        sequence group's QUERY slots only — the TDM embedding-split
        artifact (reference tdm.py:101 TDMEmbedding strips the sequence
        features and keeps the candidate-side ones)."""
        sg = self._seq_groups[seq_group]
        feats = {
            key.split(":")[1] if kind == "emb" else key
            for kind, key, _ in sg["query"]
        }
        emb_out, _ = self.engine.lookup(
            tables, batch.sparse_features, batch.sequence_sparse_features,
            feature_filter=feats,
        )
        vals = []
        for kind, key, _dim in sg["query"]:
            if kind == "emb":
                vals.append(emb_out[key].astype(ctx.compute_dtype))
                continue
            v = batch.dense_features[key].values.astype(ctx.compute_dtype)
            if kind in ("autodis", "mlpemb"):
                v = self._dense_emb_modules[key](
                    params["dense_emb"][key], v, ctx
                )
            vals.append(v)
        return (
            jnp.concatenate(vals, axis=-1) if len(vals) > 1 else vals[0]
        )


class AutoDisEmbedding(M.Module):
    """AutoDis learnable discretization for dense values
    (reference dense_embedding_collection.py:97; AutoDis paper):
    h = leaky_relu(x * w1); logits = h @ w2 + keep_prob * h;
    out = softmax(logits / t) @ meta_embeddings."""

    def __init__(self, num_channels: int, embedding_dim: int,
                 temperature: float = 0.1, keep_prob: float = 0.8) -> None:
        self.c = num_channels
        self.d = embedding_dim
        self.t = temperature
        self.keep_prob = keep_prob

    def output_dim(self) -> int:
        return self.d

    def init(self, key: jax.Array) -> M.Params:
        k1, k2, k3 = M.split_keys(key, 3)
        return {
            "w1": jax.random.normal(k1, (self.c,), jnp.float32) * 0.1,
            "w2": jax.random.normal(k2, (self.c, self.c), jnp.float32) * 0.1,
            "meta": jax.random.normal(k3, (self.c, self.d), jnp.float32) * 0.1,
        }

    def __call__(self, params, x, ctx: M.Context):
        # x: [B, 1] (per-value; value_dim>1 handled per-column then concat)
        outs = []
        for i in range(x.shape[-1]):
            h = jax.nn.leaky_relu(x[..., i : i + 1] * params["w1"])  # [B, C]
            logits = jnp.dot(
                h, params["w2"], preferred_element_type=jnp.float32
            ) + self.keep_prob * h
            p = jax.nn.softmax(logits / self.t, axis=-1)
            outs.append(
                jnp.dot(p, params["meta"], preferred_element_type=jnp.float32)
            )
        # per-column embeddings CONCATENATE (reference
        # dense_embedding_collection.py reshape to [b, n*d])
        out = (
            jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
        )
        return out.astype(ctx.compute_dtype)


class MLPEmbedding(M.Module):
    """Linear projection of a dense value vector into embedding space
    (reference dense_embedding_collection.py:215)."""

    def __init__(self, in_dim: int, embedding_dim: int) -> None:
        self.in_dim = in_dim
        self.d = embedding_dim

    def output_dim(self) -> int:
        return self.d

    def init(self, key: jax.Array) -> M.Params:
        return {"linear": M.linear_init(key, self.in_dim, self.d)}

    def __call__(self, params, x, ctx: M.Context):
        return M.linear_apply(params["linear"], x, ctx)
