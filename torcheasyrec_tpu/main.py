"""Driver: train/eval/export/predict pipelines.

Counterpart of /root/reference/tzrec/main.py (train_and_evaluate:595,
evaluate:861, export:961, predict:1120). TPU-native structure: one
jitted train step fuses embedding lookup -> dense fwd/bwd -> fused
sparse update -> dense optax update; the host loop streams prefetched
numpy batches, folds checkpoint-position state, and drives cadence
(log / eval / checkpoint), replacing TorchRec's TrainPipelineSparseDist
(XLA overlaps transfer/compute via async dispatch).
"""

import json
import os
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torcheasyrec_tpu import constant
from torcheasyrec_tpu.datasets.dataset import create_dataloader
from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.features import create_features as _create_feature_objs
from torcheasyrec_tpu.models import create_model
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.optim.optimizer_builder import (
    create_dense_optimizer,
    create_grad_clipper,
    create_sparse_optimizer,
)
from torcheasyrec_tpu.parallel.mesh import maybe_mesh
from torcheasyrec_tpu.utils import checkpoint_util, config_util
from torcheasyrec_tpu.utils.logging_util import ProgressLogger, logger


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _create_features(pipeline_config):
    data_config = pipeline_config.data_config
    neg_fields = None
    sampler_type = data_config.WhichOneof("sampler")
    if sampler_type is not None:
        sampler_cfg = getattr(data_config, sampler_type)
        neg_fields = list(sampler_cfg.attr_fields) or [
            sampler_cfg.item_id_field
        ]
    return _create_feature_objs(
        list(pipeline_config.feature_configs),
        fg_mode=data_config.fg_mode,
        fg_encoded_multival_sep=data_config.fg_encoded_multival_sep or None,
        neg_fields=neg_fields,
    )


def _compute_dtype(train_config) -> Any:
    mp = getattr(train_config, "mixed_precision", "") or ""
    if mp.upper() == "BF16":
        return jnp.bfloat16
    if mp.upper() == "FP16":
        return jnp.float16
    return jnp.float32


def apply_state_updates(
    params: Dict[str, Any],
    updates: Dict[str, Any],
    return_skipped: bool = False,
):
    """Fold collected batch-norm running-stat updates into params.

    Paths are dot-joined keys/list-indices rooted at the dense-params
    tree. Unresolvable paths are skipped with a warning; tests assert
    none are (test_model_zoo bn coverage).
    """
    if not updates:
        return (params, []) if return_skipped else params

    import copy

    params = copy.copy(params)

    def _set(root, parts, value):
        node = root
        trail = []
        for p in parts[:-1]:
            trail.append((node, p))
            if isinstance(node, (list, tuple)):
                node = node[int(p)]
            elif p in node:
                node = node[p]
            else:
                return False
        leaf_key = parts[-1]
        if isinstance(node, dict) and leaf_key in node:
            node[leaf_key] = {**node[leaf_key], **value}
            return True
        return False

    skipped = []
    for path, value in updates.items():
        parts = path.split(".")
        ok = _set(params, parts, value)
        if not ok:
            skipped.append(path)
            logger.warning(f"state update path {path} not found; skipped")
    return (params, skipped) if return_skipped else params


def _shard_batch(batch: Batch, mesh) -> Batch:
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.devices.size

    from torcheasyrec_tpu.parallel.mesh import data_axes

    ax = data_axes(mesh)

    def _sharding(x):
        arr = np.asarray(x)
        if arr.ndim >= 1 and arr.shape[0] % n == 0:
            return NamedSharding(mesh, P(ax))
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map(_sharding, batch)
    # single device_put over the whole tree amortizes dispatch latency
    return jax.device_put(batch, shardings)


def _build_model_and_optim(pipeline_config, mesh, for_train=True,
                           plan=None):
    features = _create_features(pipeline_config)
    train_config = pipeline_config.train_config
    sparse_opt, sparse_sched = create_sparse_optimizer(
        train_config.sparse_optimizer
    )
    labels = list(pipeline_config.data_config.label_fields)
    sample_weights = list(pipeline_config.data_config.sample_weight_fields)
    model = create_model(
        pipeline_config.model_config,
        features,
        labels,
        sample_weights,
        mesh=mesh,
        sparse_optimizer=sparse_opt,
        plan=plan,
    )
    if plan is None and mesh is not None and mesh.devices.size > 1:
        # two-phase build: collect table specs, run the planner, rebuild
        # with the chosen plan (reference planner.collective_plan,
        # main.py:730-742)
        from torcheasyrec_tpu.parallel import planner

        specs = list(model.embedding_group.engine._specs.values())
        spg = jax.local_device_count()
        while mesh.devices.size % spg:
            spg -= 1
        plan = planner.create_plan(
            specs,
            n_devices=mesh.devices.size,
            batch_size=int(pipeline_config.data_config.batch_size),
            optimizer_kind=sparse_opt.kind,
            # same host-group width the engine lays TWRW out with
            shards_per_host=max(spg, 1),
            # zch/dynamicemb tables remap ids on-device — never offload
            host_excluded=set(model.embedding_group._zch_cfgs),
        )
        model = create_model(
            pipeline_config.model_config,
            features,
            labels,
            sample_weights,
            mesh=mesh,
            sparse_optimizer=sparse_opt,
            plan=plan,
        )
        model.sharding_plan = plan
    return model, features, sparse_sched


def _init_state(model, pipeline_config, seed: int = 42):
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    dense_params = model.init(k1)
    tables = model.embedding_group.init_tables(k2)
    sparse_opt_state = model.embedding_group.init_opt_state()
    return dense_params, tables, sparse_opt_state


def _host_rows_for(model, batch):
    """HOST_OFFLOAD support: gather the batch's rows from the host
    (DDR-resident) tables. Runs synchronously right before the step —
    after the previous step's host_apply — so host rows are never
    stale. Returns ({"__host_rows__<gk>": device rows}, ids)."""
    engine = model.embedding_group.engine
    if not engine.has_host_groups:
        return {}, None
    hb = getattr(batch, "host_batch", None)
    if hb is None:
        raise ValueError(
            "host_offload tables need the numpy host batch; the "
            "device_put wrapper must keep a host_batch reference"
        )
    rows, ids = engine.host_prefetch(
        hb.sparse_features, hb.sequence_sparse_features
    )
    rows = jax.device_put(
        {f"__host_rows__{gk}": v for gk, v in rows.items()}
    )
    return rows, ids


class _HostRowPrefetcher:
    """Overlapped HOST_OFFLOAD gather (exact).

    Rows for step N+1 are gathered from the host-DDR tables in a worker
    thread while the device runs step N; after step N's host_apply, any
    prefetched row whose id step N updated is re-read
    (engine.host_refresh), so results are bit-identical to the
    synchronous gather. Disable with TZREC_HOST_PREFETCH=0.
    """

    def __init__(self, model) -> None:
        self.engine = model.embedding_group.engine
        self.enabled = (
            os.environ.get("TZREC_HOST_PREFETCH", "1") != "0"
        )
        self._thread = None
        self._batch = None
        self._out: Optional[Tuple[Any, Any]] = None

    def _gather_np(self, batch):
        hb = getattr(batch, "host_batch", None)
        if hb is None:
            raise ValueError(
                "host_offload tables need the numpy host batch; the "
                "device_put wrapper must keep a host_batch reference"
            )
        return self.engine.host_prefetch(
            hb.sparse_features, hb.sequence_sparse_features
        )

    def start(self, batch) -> None:
        """Begin gathering `batch`'s rows in the background (called
        right after the current step was dispatched, before its
        host_apply sync point)."""
        if not self.enabled or batch is None:
            return
        import threading

        def _run():
            self._out = self._gather_np(batch)

        self._batch = batch
        self._out = None
        self._thread = threading.Thread(target=_run, daemon=True)
        self._thread.start()

    def repair(self, touched_ids) -> None:
        """After host_apply: re-read prefetched rows whose ids were just
        updated."""
        if self._thread is None:
            return
        self._thread.join()
        self._thread = None
        if self._out is not None and touched_ids:
            rows, ids = self._out
            self.engine.host_refresh(rows, ids, touched_ids)

    def rows_for(self, batch):
        """Device rows + host ids for `batch`: the repaired prefetch
        when it matches, else a synchronous gather."""
        if not self.engine.has_host_groups:
            return {}, None
        if self._thread is not None:  # repair() not reached (no apply)
            self._thread.join()
            self._thread = None
        if self._batch is batch and self._out is not None:
            rows, ids = self._out
            self._batch, self._out = None, None
        else:
            rows, ids = self._gather_np(batch)
        rows = jax.device_put(
            {f"__host_rows__{gk}": v for gk, v in rows.items()}
        )
        return rows, ids


def _inject_host_rows(model, batch):
    """Predict-path HOST_OFFLOAD support: batches reach jit as host
    numpy pytrees there, so the gathered rows ride inside
    batch.additional (transferred with the batch)."""
    engine = model.embedding_group.engine
    if not engine.has_host_groups:
        return batch
    rows, _ = engine.host_prefetch(
        batch.sparse_features, batch.sequence_sparse_features
    )
    for gk, v in rows.items():
        batch.additional[f"__host_rows__{gk}"] = v
    return batch


def make_train_step(model, tx, sparse_sched, dense_sched, compute_dtype,
                    grad_accum_steps: int = 1,
                    grad_scaler_cfg=None):
    engine = model.embedding_group.engine
    use_scaler = grad_scaler_cfg is not None and compute_dtype == jnp.float16

    def train_step(state, batch: Batch, rng, host_rows=None,
                   next_batch=None):
        """next_batch: batch N+1 for the sparse-input-dist overlap
        (reference TrainPipelineSparseDist, dist_util.py:221-303) —
        its embedding id exchange is issued in THIS step's jit, where
        XLA overlaps the collective with the dense fwd/bwd; the result
        rides ``state["staged"]`` into the next step. Ids are data, so
        the math is bit-identical (tests/test_sparse_overlap.py)."""
        from torcheasyrec_tpu.datasets.pack import maybe_unpack

        batch = maybe_unpack(batch)
        if host_rows:
            batch.additional.update(host_rows)
        step = state["step"]
        new_zch = state.get("zch", {})
        spill_rec = None
        if model.embedding_group.has_zch:
            if model.embedding_group.has_host_spill:
                # dynamicemb host tier: capture evicted keys' trained
                # rows from the PRE-update tables; the driver loop
                # stores them host-side and restores readmitted keys
                # (parallel/host_spill.py)
                batch, new_zch, spills = (
                    model.embedding_group.remap_zch(
                        batch, state["zch"], step, training=True,
                        collect_spill=True,
                    )
                )
                spill_rec = model.embedding_group.gather_spill_rows(
                    state["tables"], spills
                )
            else:
                batch, new_zch = model.embedding_group.remap_zch(
                    batch, state["zch"], step, training=True
                )
        emb_out, residuals = model.embedding_group.lookup(
            state["tables"], batch, staged=state.get("staged")
        )

        def loss_fn(dense_params, emb_out_in):
            ctx = M.Context(
                training=True, rng=rng, compute_dtype=compute_dtype
            )
            grouped = model.embedding_group.assemble(
                emb_out_in, batch, dense_params["embedding_group"], ctx
            )
            grouped, vd_losses = model.build_input(
                dense_params, grouped, batch, ctx
            )
            preds = model.predict(dense_params, grouped, batch, ctx)
            # preds ride the has_aux channel — assigning them to a
            # closure cell would leak linearize tracers out of
            # value_and_grad and crash the jitted step
            preds_small = {
                k: v for k, v in preds.items()
                if not isinstance(v, (list, tuple))
            }
            losses = model.loss(preds, batch)
            losses.update(vd_losses)
            total = model.total_loss(losses)
            return total, (losses, ctx.state_updates, preds_small)

        if use_scaler:
            scale = state["scaler"]["scale"]

            def scaled_loss_fn(dense, emb):
                total, aux = loss_fn(dense, emb)
                return total * scale, (total, aux)

            (_, (total, (losses, state_updates, preds_small))), grads = (
                jax.value_and_grad(
                    scaled_loss_fn, argnums=(0, 1), has_aux=True
                )(state["dense"], emb_out)
            )
            inv = 1.0 / scale
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        else:
            (total, (losses, state_updates, preds_small)), grads = (
                jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(state["dense"], emb_out)
            )
        dgrads, emb_grads = grads
        grads_finite = jnp.bool_(True)
        if use_scaler:
            grads_finite = jnp.all(jnp.asarray([
                jnp.all(jnp.isfinite(g))
                for g in jax.tree_util.tree_leaves((dgrads, emb_grads))
            ]))
            # zero out non-finite grads so 0*inf=NaN can't reach the
            # tables or optimizer accumulators; lr gating alone would
            # still poison adagrad acc and write NaN rows
            dgrads, emb_grads = jax.tree_util.tree_map(
                lambda g: jnp.where(grads_finite, g, jnp.zeros_like(g)),
                (dgrads, emb_grads),
            )

        # by_epoch schedules step once per epoch (the host loop tracks
        # state["epoch"]); per-part dense schedules return a pytree of
        # per-leaf multipliers (optimizer_builder.create_dense_optimizer)
        epoch = state.get("epoch")
        sparse_t = (
            epoch if (sparse_sched.get("by_epoch") and epoch is not None)
            else step
        )

        def _dense_mult():
            try:
                m = dense_sched["fn"](step, epoch)
            except TypeError:  # plain one-arg schedule fn
                m = dense_sched["fn"](
                    epoch if (dense_sched.get("by_epoch")
                              and epoch is not None) else step
                )
            return m, bool(dense_sched.get("per_part"))

        def _scale_updates(updates, mult, per_part, gate):
            if per_part:
                return jax.tree_util.tree_map(
                    lambda u, m: u * (m * gate), updates, mult
                )
            return jax.tree_util.tree_map(
                lambda u: u * (mult * gate), updates
            )

        lr_scale = sparse_sched["fn"](sparse_t)
        if use_scaler:
            # skip the whole sparse update on overflow steps (zeroed
            # grads would still advance adam moments)
            lr_scale = jnp.where(grads_finite, lr_scale, 0.0)
        tables, sparse_opt = engine.update(
            state["tables"], state["sparse_opt"], residuals, emb_grads,
            lr_scale,
        )

        if grad_accum_steps > 1:
            accum = jax.tree_util.tree_map(
                lambda a, g: a + g, state["accum_grads"], dgrads
            )
            apply_now = (step + 1) % grad_accum_steps == 0
            dgrads = jax.tree_util.tree_map(
                lambda a: a / grad_accum_steps, accum
            )
            updates, dense_opt_new = tx.update(
                dgrads, state["dense_opt"], state["dense"]
            )
            mult, per_part = _dense_mult()
            gate = apply_now.astype(jnp.float32)
            if use_scaler:
                # overflow microbatch: don't apply the window's update
                gate = jnp.where(grads_finite, gate, 0.0)
                apply_now = apply_now & grads_finite
            updates = _scale_updates(updates, mult, per_part, gate)
            dense = optax.apply_updates(state["dense"], updates)
            dense_opt = jax.tree_util.tree_map(
                lambda new, old: jnp.where(apply_now, new, old)
                if hasattr(new, "dtype") else new,
                dense_opt_new, state["dense_opt"],
            )
            accum = jax.tree_util.tree_map(
                lambda a: a * (1.0 - apply_now.astype(jnp.float32)), accum
            )
        else:
            updates, dense_opt = tx.update(
                dgrads, state["dense_opt"], state["dense"]
            )
            mult, per_part = _dense_mult()
            gate = jnp.float32(1.0)
            if use_scaler:
                gate = jnp.where(grads_finite, gate, 0.0)
            updates = _scale_updates(updates, mult, per_part, gate)
            dense = optax.apply_updates(state["dense"], updates)
            accum = None

        new_state = {
            "dense": dense,
            "tables": tables,
            "sparse_opt": sparse_opt,
            "dense_opt": dense_opt,
            "step": step + 1,
        }
        if epoch is not None:
            new_state["epoch"] = epoch
        if next_batch is not None:
            nb = maybe_unpack(next_batch)
            new_state["staged"] = model.embedding_group.stage_route(nb)
        if model.embedding_group.has_zch:
            new_state["zch"] = new_zch
        if grad_accum_steps > 1:
            new_state["accum_grads"] = accum
        if use_scaler:
            sc = state["scaler"]
            growth = float(grad_scaler_cfg.growth_factor)
            backoff = float(grad_scaler_cfg.backoff_factor)
            interval = int(grad_scaler_cfg.growth_interval)
            good = jnp.where(grads_finite, sc["good_steps"] + 1, 0)
            new_scale = jnp.where(
                grads_finite,
                jnp.where(good >= interval, sc["scale"] * growth,
                          sc["scale"]),
                sc["scale"] * backoff,
            )
            new_state["scaler"] = {
                "scale": new_scale,
                "good_steps": jnp.where(good >= interval, 0, good),
            }
        metrics = {"total_loss": total, **losses}
        if spill_rec is not None:
            metrics["__zch_spill"] = spill_rec
        if getattr(model, "_train_metric_cfgs", None) or any(
            len(getattr(t, "train_metrics", []))
            for t in getattr(model, "_task_tower_cfgs", [])
        ):
            metrics["__preds"] = preds_small
        if engine.has_host_groups:
            # host-tier row grads exit the jitted step; the loop applies
            # them to the numpy tables with the same schedule-scaled lr
            metrics["__host_grads"] = engine.host_row_grads(
                residuals, emb_grads
            )
            metrics["__host_lr_scale"] = lr_scale
        return new_state, metrics, state_updates

    return train_step


def make_train_step_scan(model, tx, sparse_sched, dense_sched,
                         compute_dtype, grad_accum_steps: int = 1,
                         grad_scaler_cfg=None):
    """Multi-step dispatch: ONE jitted call runs K consecutive train
    steps via ``lax.scan`` over a PackedBatchGroup's (K, W) wire.

    Host->device dispatch through a latency-bound link costs a fixed
    ~0.4 ms per call in this environment; per-batch stepping caps the
    pipeline at ~2 dispatches/batch (put + step). Scanning K steps per
    call amortizes that to ~1/K dispatches/batch — the standard TPU
    host-pipeline pattern (t5x-style) — with bit-identical math: the
    scan body IS make_train_step's step, and the per-step rng matches
    the per-batch path's ``fold_in(rng, step)``.

    Returns (state, metrics, state_updates) where metrics are the LAST
    step's values except ``__preds``, which stays stacked (K, ...) so
    the host can update exact train metrics for every batch in the
    group. Not usable with host-offloaded embedding groups (their row
    gather/apply needs a host hop per step).
    """
    from torcheasyrec_tpu.datasets.pack import PackedBatch

    base = make_train_step(
        model, tx, sparse_sched, dense_sched, compute_dtype,
        grad_accum_steps=grad_accum_steps, grad_scaler_cfg=grad_scaler_cfg,
    )
    if model.embedding_group.engine.has_host_groups:
        raise ValueError(
            "steps_per_dispatch > 1 is incompatible with host-offloaded "
            "embedding groups (per-step host row exchange)"
        )

    def scan_step(state, group, rng):
        spec = group.spec

        def body(st, row):
            step_rng = jax.random.fold_in(rng, st["step"])
            st, metrics, state_updates = base(
                st, PackedBatch(row, spec), step_rng
            )
            return st, (metrics, state_updates)

        state, (ms, sus) = jax.lax.scan(body, state, group.wire)
        preds = ms.pop("__preds", None)
        metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
        if preds is not None:
            metrics["__preds"] = preds  # stacked (K, ...) for the host
        state_updates = jax.tree_util.tree_map(lambda x: x[-1], sus)
        return state, metrics, state_updates

    return scan_step


def make_eval_step(model, compute_dtype, with_loss: bool = True):
    def eval_step(state, batch: Batch, host_rows=None):
        from torcheasyrec_tpu.datasets.pack import maybe_unpack

        batch = maybe_unpack(batch)
        if host_rows:
            batch.additional.update(host_rows)
        ctx = M.Context(training=False, compute_dtype=compute_dtype)
        if model.embedding_group.has_zch:
            batch, _ = model.embedding_group.remap_zch(
                batch, state["zch"], state.get("step", 0), training=False
            )
        preds = model.forward(
            state["dense"], state["tables"], batch, ctx
        )
        losses = model.loss(preds, batch) if with_loss else {}
        return preds, losses

    return eval_step


# ---------------------------------------------------------------------------
# train_and_evaluate
# ---------------------------------------------------------------------------


def train_and_evaluate(
    pipeline_config_path: str,
    train_input_path: Optional[str] = None,
    eval_input_path: Optional[str] = None,
    continue_train: bool = False,
    fine_tune_checkpoint: Optional[str] = None,
    edit_config_json: Optional[str] = None,
) -> Dict[str, float]:
    pipeline_config = config_util.load_pipeline_config(pipeline_config_path)
    if edit_config_json:
        config_util.edit_config(pipeline_config, json.loads(edit_config_json))
    if train_input_path:
        pipeline_config.train_input_path = train_input_path
    if eval_input_path:
        pipeline_config.eval_input_path = eval_input_path

    model_dir = pipeline_config.model_dir
    train_config = pipeline_config.train_config
    data_config = pipeline_config.data_config
    mesh = maybe_mesh()
    compute_dtype = _compute_dtype(train_config)

    from torcheasyrec_tpu.parallel import planner as planner_mod

    saved_plan = planner_mod.load_plan(model_dir) if continue_train else None
    model, features, sparse_sched = _build_model_and_optim(
        pipeline_config, mesh, plan=saved_plan
    )
    if getattr(model, "sharding_plan", None):
        os.makedirs(model_dir, exist_ok=True)
        planner_mod.save_plan(model.sharding_plan, model_dir)
    dense_params, tables, sparse_opt_state = _init_state(
        model, pipeline_config
    )
    tx, dense_sched = create_dense_optimizer(
        train_config.dense_optimizer, dense_params
    )
    clipper = None
    if train_config.HasField("grad_clipping"):
        clipper = create_grad_clipper(train_config.grad_clipping)
    if clipper is not None:
        tx = optax.chain(clipper, tx)
    dense_opt_state = tx.init(dense_params)

    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt_state,
        "dense_opt": dense_opt_state,
        "step": jnp.zeros((), jnp.int32),
        # epoch index for by_epoch LR schedules (stepped by the loop)
        "epoch": jnp.zeros((), jnp.int32),
    }
    if model.embedding_group.has_zch:
        state["zch"] = model.embedding_group.init_zch_states()

    # checkpoint restore / fine-tune
    ckpt_manager = checkpoint_util.CheckpointManager(
        model_dir,
        save_checkpoints_steps=train_config.save_checkpoints_steps,
        save_checkpoints_epochs=train_config.save_checkpoints_epochs,
        keep_checkpoint_max=train_config.keep_checkpoint_max,
        save_checkpoints_timestamp_interval=(
            train_config.save_checkpoints_timestamp_interval
        ),
        save_checkpoints_timestamps=list(
            train_config.save_checkpoints_timestamps
        ),
    )
    grad_accum = int(train_config.gradient_accumulation_steps or 1)
    scaler_cfg = (
        train_config.grad_scaler
        if train_config.HasField("grad_scaler") else None
    )
    # scaler / accumulation state must exist BEFORE restore or the
    # checkpointed values are silently dropped by the graft
    if grad_accum > 1:
        state["accum_grads"] = jax.tree_util.tree_map(
            jnp.zeros_like, state["dense"]
        )
    if scaler_cfg is not None and compute_dtype == jnp.float16:
        state["scaler"] = {
            "scale": jnp.float32(scaler_cfg.init_scale),
            "good_steps": jnp.int32(0),
        }

    dataloader_state: Dict[int, int] = {}
    latest = checkpoint_util.latest_checkpoint(model_dir)
    if continue_train and latest:
        state = checkpoint_util.restore_train_state(latest, model, state)
        dataloader_state = checkpoint_util.load_dataloader_state(latest)
    elif fine_tune_checkpoint or train_config.fine_tune_checkpoint:
        ft = fine_tune_checkpoint or train_config.fine_tune_checkpoint
        state = checkpoint_util.restore_train_state(ft, model, state)

    os.makedirs(model_dir, exist_ok=True)
    config_util.save_message(
        pipeline_config, os.path.join(model_dir, "pipeline.config")
    )

    # multi-step dispatch (docs/pipeline.md): K scanned steps per
    # jitted call. Only sound single-process (the dim-sync collective
    # runs per step) and without host-offloaded tables (per-step host
    # row exchange).
    steps_per_dispatch = max(
        int(getattr(train_config, "steps_per_dispatch", 1) or 1), 1
    )
    if steps_per_dispatch > 1 and jax.process_count() > 1:
        logger.warning(
            "steps_per_dispatch > 1 is single-process only (per-step "
            "batch-dim sync); using per-batch stepping"
        )
        steps_per_dispatch = 1
    if steps_per_dispatch > 1 and (
        model.embedding_group.engine.has_host_groups
    ):
        logger.warning(
            "steps_per_dispatch > 1 is incompatible with host_offload "
            "tables; using per-batch stepping"
        )
        steps_per_dispatch = 1
    if steps_per_dispatch > 1 and model.embedding_group.has_host_spill:
        logger.warning(
            "steps_per_dispatch > 1 is incompatible with the dynamicemb "
            "host-spill tier (per-step host store/restore); using "
            "per-batch stepping"
        )
        steps_per_dispatch = 1

    # sparse-input-dist overlap (TrainPipelineSparseDist analogue):
    # batch N+1's embedding id exchange issues inside step N's jit
    sparse_overlap = (
        bool(getattr(train_config, "sparse_dist_overlap", False))
        and mesh is not None
        and jax.process_count() == 1
        and steps_per_dispatch == 1
        and not model.embedding_group.engine.has_host_groups
    )
    if getattr(train_config, "sparse_dist_overlap", False) and (
        not sparse_overlap
    ):
        logger.warning(
            "sparse_dist_overlap requires a sharded mesh, a single "
            "process, per-batch stepping and no host_offload groups; "
            "running unpipelined"
        )

    train_dl = create_dataloader(
        data_config, features, pipeline_config.train_input_path,
        mode="train", resume_state=dataloader_state,
        pack_dense_bf16=compute_dtype == jnp.bfloat16,
        group_size=steps_per_dispatch,
    )
    eval_dl = create_dataloader(
        data_config, features, pipeline_config.eval_input_path, mode="eval",
        pack_dense_bf16=compute_dtype == jnp.bfloat16,
    )

    train_step = jax.jit(
        make_train_step(
            model, tx, sparse_sched, dense_sched, compute_dtype,
            grad_accum_steps=grad_accum, grad_scaler_cfg=scaler_cfg,
        ),
        donate_argnums=(0,),
    )
    scan_step = None
    if steps_per_dispatch > 1:
        scan_step = jax.jit(
            make_train_step_scan(
                model, tx, sparse_sched, dense_sched, compute_dtype,
                grad_accum_steps=grad_accum, grad_scaler_cfg=scaler_cfg,
            ),
            donate_argnums=(0,),
        )
    eval_step = jax.jit(make_eval_step(model, compute_dtype))
    host_pipe = _HostRowPrefetcher(model)
    spill_mgr = (
        model.embedding_group.make_spill_manager()
        if model.embedding_group.has_host_spill else None
    )

    num_steps = train_config.num_steps or 0
    num_epochs = train_config.num_epochs or (1 if not num_steps else 10 ** 9)
    log_every = train_config.log_step_count_steps or 100
    rng = jax.random.key(1234)

    train_metrics = model.init_train_metrics()
    tb = None
    if train_config.use_tensorboard:
        from torcheasyrec_tpu.utils.summary_util import SummaryWriter

        tb = SummaryWriter(
            os.path.join(model_dir, "tb"),
            list(train_config.tensorboard_summaries) or None,
        )
    delta_dumper = None
    if train_config.HasField("delta_embedding_dump_config"):
        from torcheasyrec_tpu.utils.delta_embedding_dump import (
            DeltaEmbeddingDumper,
        )

        dcfg = train_config.delta_embedding_dump_config
        delta_dumper = DeltaEmbeddingDumper(
            dcfg.output_dir or os.path.join(
                model_dir, "delta_embedding_dump"
            ),
            model.embedding_group,
            dump_interval_steps=dcfg.dump_interval_steps,
            file_prefix=dcfg.file_prefix,
        )
    plogger = ProgressLogger("train")
    step = int(state["step"])
    t_start = time.time()
    examples = 0
    stop = False
    eval_result: Dict[str, float] = {}

    profiling = bool(train_config.is_profiling)
    if profiling:
        jax.profiler.start_trace(os.path.join(model_dir, "profile"))

    def _to_device(b):
        from torcheasyrec_tpu.datasets.pack import (
            PackedBatch,
            pack_and_put,
            put_packed,
        )

        if isinstance(b, PackedBatch):  # mp-loader workers pre-pack
            if mesh is None:
                return put_packed(b)
            b = b.host_batch
        if mesh is not None:
            d = _shard_batch(b, mesh)
            if model.embedding_group.engine.has_host_groups:
                d.host_batch = b  # numpy originals for the host gather
            return d
        # single device: coalesce the whole pytree into one narrow wire
        # buffer — ONE H2D call instead of one per leaf, ids in the
        # smallest dtype that fits them (datasets/pack.py)
        return pack_and_put(b, dense_bf16=compute_dtype == jnp.bfloat16)

    # multi-process SPMD: batches stay host-side in the prefetch thread;
    # the main loop runs ONE dim-sync collective per step (shape
    # equalization + stop-together + event-time quorum) and assembles
    # the global batch. Single-process keeps the fully overlapped path.
    multi_process = jax.process_count() > 1
    if multi_process and delta_dumper is not None:
        logger.warning(
            "delta embedding dump is disabled under multi-host (sharded "
            "tables are not host-addressable); use single-host dumps"
        )
        delta_dumper = None

    # epochs-completed watermark (reference EPOCHS_COMPLETED,
    # main.py:356-373): a resume continues the epoch the checkpoint was
    # taken in (its data position restores) instead of replaying
    # finished epochs from zero
    start_epoch = 0
    if continue_train and latest:
        start_epoch = min(
            int(jax.device_get(state.get("epoch", 0))),
            max(num_epochs - 1, 0),
        )
    for epoch in range(start_epoch, num_epochs):
        if stop:
            break
        if epoch > start_epoch:
            # positions are per-pass: a checkpoint taken in epoch N
            # must not skip epoch N's rows on resume
            dataloader_state.clear()
        state["epoch"] = jnp.full((), epoch, jnp.int32)
        # epoch boundary: staged id routes belong to the previous
        # epoch's tail batch, not the next epoch's first batch
        state.pop("staged", None)
        train_iter = iter(train_dl(
            device_put_fn=None if multi_process else _to_device
        ))
        if sparse_overlap:
            train_iter = _paired_iter(train_iter)
        _pending = ()  # one-item lookahead (filled by the host pipeline)
        try:
          while True:
            batch_next = None
            if _pending:
                batch, info, have = _pending
                _pending = ()
            else:
                try:
                    if sparse_overlap:
                        (batch, info), batch_next = next(train_iter)
                    else:
                        batch, info = next(train_iter)
                    have = True
                except StopIteration:
                    batch, info, have = None, None, False
            host_batch = batch
            if batch is not None and hasattr(batch, "host_batch"):
                host_batch = batch.host_batch
            if multi_process:
                from torcheasyrec_tpu.datasets.pack import PackedBatch
                from torcheasyrec_tpu.utils import multihost as mh

                if isinstance(batch, PackedBatch):
                    # mp-loader workers pre-pack; the shape-sync path
                    # needs the raw host pytree (host_batch = numpy
                    # views over the wire)
                    batch = host_batch = batch.host_batch
                all_have, _, _, min_ts, target = mh.sync_batch_dims(
                    mh.batch_dims_vector(
                        batch, have,
                        info.data_timestamp if info else None,
                    )
                )
                if not all_have:
                    # stop together on uneven shards (reference
                    # check_all_workers_data_status)
                    break
                info.data_timestamp = min_ts  # global event-time quorum
                padded = mh.pad_batch_to(
                    batch, target, round_dim0_to=jax.local_device_count()
                )
                padded = mh.attach_global_segments(
                    padded, jax.process_index(), jax.process_count()
                )
                batch = mh.make_global_batch(padded, mesh)
            elif not have:
                break
            if isinstance(info, list):
                # multi-step dispatch: ONE scanned call over the K
                # packed batches of this group (docs/pipeline.md). The
                # scan body folds the rng by state["step"], matching
                # the per-batch path bit-for-bit.
                state, metrics, state_updates = scan_step(
                    state, batch, rng
                )
                if state_updates:
                    state["dense"] = apply_state_updates(
                        state["dense"], jax.device_get(state_updates)
                    )
                step += len(info)
                hbs = batch.host_batches or []
                for inf in info:
                    examples += inf.batch_size
                    for sid, row in inf.checkpoint_info.items():
                        dataloader_state[sid] = max(
                            dataloader_state.get(sid, -1), row
                        )
                for hb in hbs:
                    if hasattr(model, "collect_from_batch"):
                        model.collect_from_batch(hb.host_batch)
                    if delta_dumper is not None:
                        delta_dumper.observe(hb.host_batch)
                if delta_dumper is not None:
                    delta_dumper.maybe_dump(step, state["tables"])
                preds_for_metrics = metrics.pop("__preds", None)
                if train_metrics and preds_for_metrics is not None and hbs:
                    preds_np = jax.device_get(preds_for_metrics)
                    for ki, hb in enumerate(hbs):
                        model.update_metrics(
                            train_metrics,
                            jax.tree_util.tree_map(
                                lambda x, _k=ki: x[_k], preds_np
                            ),
                            hb.host_batch,
                        )
                if step % log_every < len(info):
                    m = jax.device_get(metrics)
                    lr_mult = float(jax.device_get(
                        sparse_sched["fn"](jnp.int32(step))
                    ))
                    loss_str = " ".join(
                        f"{k}={float(v):.5f}" for k, v in m.items()
                    )
                    rate = examples / max(time.time() - t_start, 1e-9)
                    logger.info(
                        f"step {step}: {loss_str} "
                        f"lr_mult={lr_mult:.4f} ({rate:.0f} ex/s)"
                    )
                    if tb is not None:
                        tb.log_scalars(step, m, lr_mult)
                plogger.log(step)
                if ckpt_manager.should_save(
                    step, data_timestamp=info[-1].data_timestamp
                ):
                    _save_train_ckpt(
                        ckpt_manager, step, model, state,
                        dataloader_state, multi_process,
                    )
                    eval_result = _run_eval(
                        model, eval_step, state, eval_dl, mesh,
                        pipeline_config, step, model_dir,
                    )
                if num_steps and step >= num_steps:
                    stop = True
                    break
                continue
            step_rng = jax.random.fold_in(rng, step)
            host_rows, host_ids = host_pipe.rows_for(batch)
            state, metrics, state_updates = train_step(
                state, batch, step_rng, host_rows, batch_next
            )
            if spill_mgr is not None:
                spill_out = metrics.pop("__zch_spill", None)
                if spill_out is not None:
                    restores = spill_mgr.process(
                        jax.device_get(spill_out)
                    )
                    if restores:
                        state["tables"] = (
                            model.embedding_group.apply_spill_restores(
                                state["tables"], restores
                            )
                        )
            if host_ids is not None:
                # overlap: fetch batch N+1 and gather its host rows in a
                # worker thread while the device runs step N (the
                # device_get below is the sync point); rows step N
                # updates are repaired after host_apply
                if not multi_process and host_pipe.enabled:
                    try:
                        _nb, _ni = next(train_iter)
                        _pending = (_nb, _ni, True)
                    except StopIteration:
                        _pending = (None, None, False)
                    host_pipe.start(_pending[0])
                engine = model.embedding_group.engine
                engine.host_apply(
                    jax.device_get(metrics.pop("__host_grads")),
                    host_ids,
                    float(jax.device_get(
                        metrics.pop("__host_lr_scale")
                    )),
                )
                host_pipe.repair(host_ids)
            if state_updates:
                state["dense"] = apply_state_updates(
                    state["dense"], jax.device_get(state_updates)
                )
            step += 1
            examples += info.batch_size
            if hasattr(model, "collect_from_batch"):
                model.collect_from_batch(host_batch)
            if delta_dumper is not None:
                delta_dumper.observe(host_batch)
                delta_dumper.maybe_dump(step, state["tables"])
            for sid, row in info.checkpoint_info.items():
                dataloader_state[sid] = max(
                    dataloader_state.get(sid, -1), row
                )

            preds_for_metrics = metrics.pop("__preds", None)
            if train_metrics and preds_for_metrics is not None:
                if multi_process:
                    from torcheasyrec_tpu.utils import multihost as mh

                    # this host's true rows only; the metric sync at
                    # compute() merges hosts
                    local_preds = jax.tree_util.tree_map(
                        lambda x: mh.local_rows(x, info.batch_size)
                        if getattr(x, "ndim", 0) >= 1 else np.asarray(x),
                        preds_for_metrics,
                    )
                    model.update_metrics(
                        train_metrics, local_preds, host_batch
                    )
                else:
                    model.update_metrics(
                        train_metrics, jax.device_get(preds_for_metrics),
                        host_batch if host_batch is not batch
                        else jax.device_get(batch),
                    )
            if step % log_every == 0:
                m = jax.device_get(metrics)
                lr_mult = float(
                    jax.device_get(sparse_sched["fn"](jnp.int32(step)))
                )
                loss_str = " ".join(
                    f"{k}={float(v):.5f}" for k, v in m.items()
                )
                rate = examples / max(time.time() - t_start, 1e-9)
                tm_str = ""
                if train_metrics:
                    tm_vals = model.compute_metrics(train_metrics)
                    tm_str = " " + " ".join(
                        f"train_{k}={v:.4f}" for k, v in tm_vals.items()
                        if np.isfinite(v)
                    )
                logger.info(
                    f"step {step}: {loss_str} lr_mult={lr_mult:.4f} "
                    f"({rate:.0f} ex/s){tm_str}"
                )
                if tb is not None:
                    tb.log_scalars(step, m, lr_mult)
            plogger.log(step)

            if ckpt_manager.should_save(
                step, data_timestamp=info.data_timestamp
            ):
                _save_train_ckpt(
                    ckpt_manager, step, model, state, dataloader_state,
                    multi_process,
                )
                eval_result = _run_eval(
                    model, eval_step, state, eval_dl, mesh,
                    pipeline_config, step, model_dir,
                )
            if num_steps and step >= num_steps:
                stop = True
                break
        finally:
          # stop prefetch threads / worker processes even when the
          # step raises (device OOM, KeyboardInterrupt): the mp
          # loader's close() also unlinks its /dev/shm rings
          if hasattr(train_iter, "close"):
            train_iter.close()
        if not stop:
            # epoch completed
            if train_config.save_checkpoints_epochs and (
                (epoch + 1) % train_config.save_checkpoints_epochs == 0
            ):
                _save_train_ckpt(
                    ckpt_manager, step, model, state, dataloader_state,
                    multi_process,
                )
                eval_result = _run_eval(
                    model, eval_step, state, eval_dl, mesh,
                    pipeline_config, step, model_dir,
                )

    if profiling:
        jax.profiler.stop_trace()

    if delta_dumper is not None:
        delta_dumper.dump(step, state["tables"])

    # on_train_end hook (reference model.py:153-160, main.py:556-560)
    if hasattr(model, "on_train_end"):
        state["dense"] = model.on_train_end(jax.device_get(state["dense"]))

    # final save + eval
    _save_train_ckpt(
        ckpt_manager, step, model, state, dataloader_state, multi_process
    )
    eval_result = _run_eval(
        model, eval_step, state, eval_dl, mesh, pipeline_config, step,
        model_dir,
    )
    if tb is not None:
        tb.log_eval(step, eval_result)
        tb.close()
    logger.info(f"training done at step {step}: {eval_result}")
    return eval_result


def _paired_iter(it):
    """(batch, info) stream -> ((batch, info), next_batch) pairs for
    the sparse-input-dist overlap; the tail batch stages itself (the
    extra route is discarded — staging is read-only)."""
    try:
        cur = next(it)
    except StopIteration:
        return
    for nxt in it:
        yield cur, nxt[0]
        cur = nxt
    yield cur, cur[0]


def _save_train_ckpt(ckpt_manager, step, model, state, dataloader_state,
                     multi_process: bool) -> None:
    """Checkpoint save: canonical per-table layout single-host; raw
    sharded orbax save multi-host (collective — every process calls at
    the same step via the train-loop quorum)."""
    # transient overlap carry: batch-scoped id routes, not model state
    state = {k: v for k, v in state.items() if k != "staged"}
    if multi_process:
        ckpt_manager.save(step, state, dataloader_state)
    else:
        ckpt_manager.save(
            step,
            checkpoint_util.state_for_save(model, jax.device_get(state)),
            dataloader_state,
        )


def _sync_metrics(metrics) -> None:
    """Collective cross-process metric-state merge before compute().

    The reference reduces every torchmetrics state with dist_reduce_fx
    (/root/reference/tzrec/metrics/recall_at_k.py:36-41); here each
    Metric.sync() gathers/sums its host-local numpy state. Must run the
    same number of times on every process, in the same metric order —
    guaranteed because init_metrics() is config-driven."""
    for m in metrics:
        metric = m.get("metric") if isinstance(m, dict) else None
        if metric is not None and hasattr(metric, "sync"):
            metric.sync()


def _run_eval_multiprocess(
    model, eval_step, state, eval_dl, mesh, metrics, loss_sums, num_steps,
) -> int:
    """Multi-host SPMD eval loop.

    One jitted eval step spans every host's devices, so all processes
    must step TOGETHER. A host that runs out of rows keeps feeding its
    last batch as a dummy (the reference's dummy-batch anti-hang,
    /root/reference/tzrec/utils/dist_util.py:285-340) and stops updating
    metrics; eval ends when no host has fresh rows or the step cap hits.
    Each host updates metrics with its OWN true rows only; the caller
    merges states via _sync_metrics. Losses from eval_step are computed
    over the global batch (replicated scalars), so every host
    accumulates them every step — no cross-host reduction needed.
    Returns the number of global steps executed (== loss count)."""
    loader = eval_dl(device_put_fn=None)
    it = iter(loader)
    last: Optional[Tuple[Any, Any]] = None
    n_global = 0
    try:
        n_global = _run_eval_multiprocess_loop(
            model, eval_step, state, mesh, metrics, loss_sums, num_steps,
            it, last,
        )
    finally:
        if hasattr(loader, "close"):
            loader.close()
    return n_global


def _run_eval_multiprocess_loop(
    model, eval_step, state, mesh, metrics, loss_sums, num_steps, it, last,
) -> int:
    from torcheasyrec_tpu.utils import multihost as mh

    from torcheasyrec_tpu.datasets.pack import PackedBatch

    n_global = 0
    while True:
        try:
            batch, info = next(it)
            have = True
        except StopIteration:
            batch, info, have = None, None, False
        if isinstance(batch, PackedBatch):  # mp-loader workers pre-pack
            batch = batch.host_batch
        feed = batch if have else (last[0] if last is not None else None)
        _, any_have, all_cont, _, target = mh.sync_batch_dims(
            mh.batch_dims_vector(
                feed, have, None, can_continue=feed is not None
            )
        )
        if not any_have or not all_cont:
            break
        if have:
            last = (batch, info)
        else:
            batch, info = last
        padded = mh.pad_batch_to(
            batch, target, round_dim0_to=jax.local_device_count()
        )
        padded = mh.attach_global_segments(
            padded, jax.process_index(), jax.process_count()
        )
        gbatch = mh.make_global_batch(padded, mesh)
        preds, losses = eval_step(state, gbatch)
        n_global += 1
        for k, v in jax.device_get(losses).items():
            loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
        if have:
            local_preds = jax.tree_util.tree_map(
                lambda x: mh.local_rows(x, info.batch_size)
                if getattr(x, "ndim", 0) >= 1 else np.asarray(x),
                preds,
            )
            model.update_metrics(metrics, local_preds, batch)
        if num_steps and n_global >= num_steps:
            break
    return n_global


def _run_eval(
    model, eval_step, state, eval_dl, mesh, pipeline_config, step, model_dir,
    max_steps: Optional[int] = None,
) -> Dict[str, float]:
    eval_config = pipeline_config.eval_config
    num_steps = max_steps or (eval_config.num_steps or 0)
    metrics = model.init_metrics()
    n = 0
    loss_sums: Dict[str, float] = {}
    loss_count = 0

    def _put(b):
        from torcheasyrec_tpu.datasets.pack import (
            PackedBatch,
            pack_and_put,
            put_packed,
        )

        if isinstance(b, PackedBatch):  # mp-loader workers pre-pack
            if mesh is None:
                return put_packed(b)
            b = b.host_batch
        if mesh is not None:
            d = _shard_batch(b, mesh)
            if model.embedding_group.engine.has_host_groups:
                d.host_batch = b
            return d
        return pack_and_put(
            b,
            dense_bf16=_compute_dtype(pipeline_config.train_config)
            == jnp.bfloat16,
        )

    multi_process = jax.process_count() > 1
    if multi_process:
        n = _run_eval_multiprocess(
            model, eval_step, state, eval_dl, mesh, metrics, loss_sums,
            num_steps,
        )
        loss_count = max(n, 1)
        _sync_metrics(metrics)
    else:
        # one-step software pipeline: dispatch batch N (async under XLA),
        # then drain batch N-1's host-side metric update while N computes
        # on device (reference's eval prefetch overlap, main.py:167-233)
        def _drain(pending) -> None:
            nonlocal loss_count
            preds, losses, b = pending
            model.update_metrics(
                metrics, jax.device_get(preds),
                b.host_batch if hasattr(b, "host_batch")
                else jax.device_get(b),
            )
            for k, v in jax.device_get(losses).items():
                loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
            loss_count += 1

        pending = None
        eval_iter = eval_dl(device_put_fn=_put)
        try:
            for batch, info in eval_iter:
                host_rows, _ = _host_rows_for(model, batch)
                preds, losses = eval_step(state, batch, host_rows)
                if pending is not None:
                    _drain(pending)
                pending = (preds, losses, batch)
                n += 1
                if num_steps and n >= num_steps:
                    break
        finally:
            # an early break (num_steps) must not leak the loader: the
            # mp loader pins worker processes + shm rings, the prefetch
            # thread pins ~prefetch+1 device_put batches in HBM
            if hasattr(eval_iter, "close"):
                eval_iter.close()
        if pending is not None:
            _drain(pending)
    result = model.compute_metrics(metrics)
    for k, v in loss_sums.items():
        result[f"loss_{k}"] = v / max(loss_count, 1)
    if model_dir and jax.process_index() == 0:
        line = json.dumps(
            {"global_step": step, **{k: _jsonable(v) for k, v in
                                     result.items()}}
        )
        with open(
            os.path.join(model_dir, constant.TRAIN_EVAL_RESULT_FILENAME), "a"
        ) as f:
            f.write(line + "\n")
    logger.info(f"eval @ step {step}: {result}")
    return result


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return str(v)


# ---------------------------------------------------------------------------
# evaluate
# ---------------------------------------------------------------------------


def evaluate(
    pipeline_config_path: str,
    checkpoint_path: Optional[str] = None,
    eval_input_path: Optional[str] = None,
    eval_result_filename: str = constant.EVAL_RESULT_FILENAME,
) -> Dict[str, float]:
    pipeline_config = config_util.load_pipeline_config(pipeline_config_path)
    if eval_input_path:
        pipeline_config.eval_input_path = eval_input_path
    model_dir = pipeline_config.model_dir
    mesh = maybe_mesh()
    compute_dtype = _compute_dtype(pipeline_config.train_config)

    model, features, _ = _build_model_and_optim(pipeline_config, mesh)
    dense_params, tables, sparse_opt_state = _init_state(
        model, pipeline_config
    )
    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt_state,
        "step": jnp.zeros((), jnp.int32),
    }
    if model.embedding_group.has_zch:
        state["zch"] = model.embedding_group.init_zch_states()
    ckpt = checkpoint_path or checkpoint_util.latest_checkpoint(model_dir)
    if ckpt:
        state = checkpoint_util.restore_train_state(ckpt, model, state)

    eval_dl = create_dataloader(
        pipeline_config.data_config, features,
        pipeline_config.eval_input_path, mode="eval",
        pack_dense_bf16=compute_dtype == jnp.bfloat16,
    )
    eval_step = jax.jit(make_eval_step(model, compute_dtype))
    step = int(jax.device_get(state["step"]))
    result = _run_eval(
        model, eval_step, state, eval_dl, mesh, pipeline_config, step, None
    )
    if model_dir:
        with open(os.path.join(model_dir, eval_result_filename), "w") as f:
            f.write(json.dumps({k: _jsonable(v) for k, v in result.items()}))
    logger.info(f"eval result: {result}")
    return result


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------


def export(
    pipeline_config_path: str,
    export_dir: str,
    checkpoint_path: Optional[str] = None,
) -> None:
    """Export = restored weights + pipeline.config + fg.json
    (reference export_util.py:126; serving loads them into the jitted
    predict function). Match models export per-tower subdirectories;
    TDM exports an embedding/model split."""
    pipeline_config = config_util.load_pipeline_config(pipeline_config_path)
    model_dir = pipeline_config.model_dir
    mesh = None  # export is single-host
    model, features, _ = _build_model_and_optim(pipeline_config, mesh)
    dense_params, tables, sparse_opt_state = _init_state(
        model, pipeline_config
    )
    ckpt = checkpoint_path
    if ckpt is None and (
        pipeline_config.export_config.exporter_type == "best"
    ):
        ckpt = _best_checkpoint(pipeline_config, model_dir)
    if ckpt is None:
        ckpt = checkpoint_util.latest_checkpoint(model_dir)
    sub = {"dense": dense_params, "tables": tables}
    if model.embedding_group.has_zch:
        sub["zch"] = model.embedding_group.init_zch_states()
    if ckpt:
        sub = checkpoint_util.restore_train_state(ckpt, model, sub)

    from torcheasyrec_tpu.models.match_model import MatchModel
    from torcheasyrec_tpu.models.tdm import TDM

    if isinstance(model, MatchModel):
        # per-tower artifacts: item tower feeds the ANN index build,
        # user tower serves online (reference main.py:1032-1056); the
        # root keeps a whole-model artifact for pair scoring/predict
        for tower, spec in model.tower_specs().items():
            _export_tower(
                pipeline_config, model, features, sub,
                os.path.join(export_dir, tower), tower, spec,
            )
        _export_artifact(pipeline_config, model, features, sub, export_dir)
        logger.info(
            f"exported match towers "
            f"{sorted(model.tower_specs())} to {export_dir}"
        )
        return
    if isinstance(model, TDM):
        # embedding/model split (reference main.py:1053-1070): the
        # embedding artifact maps candidate/tree-node features to their
        # embedding for tree building; model/ scores (user, node) pairs
        _export_tdm_embedding(
            pipeline_config, model, features, sub,
            os.path.join(export_dir, "embedding"),
        )
        _export_artifact(
            pipeline_config, model, features, sub,
            os.path.join(export_dir, "model"),
        )
        return
    _export_artifact(pipeline_config, model, features, sub, export_dir)


def _export_artifact(pipeline_config, model, features, sub,
                     export_dir: str) -> None:
    """Whole-model export artifact: weights + pipeline.config + fg.json
    + StableHLO (reference export_util.py:126 export_model)."""
    from torcheasyrec_tpu.features.feature import create_fg_json

    os.makedirs(export_dir, exist_ok=True)
    # optional embedding quantization (reference export_util.py:264-289,
    # env contract acc/utils.py QUANT_EMB)
    quant_dtype = os.environ.get("QUANT_EMB", "").upper()
    if quant_dtype:
        from torcheasyrec_tpu.acc.quant_util import quantize_rowwise

        tables_np = model.embedding_group.engine.export_weight_matrices(
            sub["tables"]
        )
        quant_meta = {"dtype": quant_dtype, "groups": {}}
        qdir = os.path.join(export_dir, "quant_tables")
        os.makedirs(qdir, exist_ok=True)
        for gk, w in tables_np.items():
            q = quantize_rowwise(np.asarray(w), quant_dtype)
            np.savez(
                os.path.join(qdir, f"{gk}.npz"),
                values=q["values"], scales=q["scales"],
            )
            quant_meta["groups"][gk] = {
                "rows": int(w.shape[0]), "dim": int(w.shape[1]),
            }
        with open(os.path.join(export_dir, "quant_meta.json"), "w") as f:
            json.dump(quant_meta, f)
        sub = {
            "dense": sub["dense"],
            **({"zch": sub["zch"]} if "zch" in sub else {}),
        }
    if quant_dtype:
        # quantized tables live in quant_tables/; save dense (+zch) only
        checkpoint_util.save_model(os.path.join(export_dir, "model"), sub)
    else:
        checkpoint_util.save_train_state(
            os.path.join(export_dir, "model"), model, sub
        )
    config_util.save_message(
        pipeline_config, os.path.join(export_dir, "pipeline.config")
    )
    with open(os.path.join(export_dir, "fg.json"), "w") as f:
        json.dump(create_fg_json(features), f, indent=2)
    if not quant_dtype:
        _export_stablehlo(
            pipeline_config, model, features, sub, export_dir
        )
    logger.info(
        f"exported model to {export_dir}"
        + (f" (embeddings quantized {quant_dtype})" if quant_dtype else "")
    )


def _tower_weights(model, sub, table_names) -> Dict[str, Any]:
    """Serving weight tree: full dense params + canonical per-table
    embeddings pruned to the tower's tables (from_canonical leaves
    absent tables at init; the tower fn never reads them)."""
    engine = model.embedding_group.engine
    canon = engine.to_canonical(jax.device_get(sub["tables"]), None)
    out: Dict[str, Any] = {
        "dense": jax.device_get(sub["dense"]),
        "canonical_tables": {
            k: v for k, v in canon.items() if k in table_names
        },
    }
    if "zch" in sub:
        out["zch"] = jax.device_get(sub["zch"])
    return out


def _export_tower(pipeline_config, model, features, sub, tower_dir: str,
                  tower: str, spec: Dict[str, Any]) -> None:
    """One tower's serving artifact: pruned weights + fg.json subset +
    tower.json marker + StableHLO of the tower function."""
    from torcheasyrec_tpu.features.feature import create_fg_json

    eg = model.embedding_group
    groups = eg.groups_closure(spec["groups"])
    feat_names = eg.features_for_groups(groups)
    table_names = eg.tables_for_groups(groups)
    os.makedirs(tower_dir, exist_ok=True)
    checkpoint_util.save_model(
        os.path.join(tower_dir, "model"),
        _tower_weights(model, sub, table_names),
    )
    config_util.save_message(
        pipeline_config, os.path.join(tower_dir, "pipeline.config")
    )
    tower_features = [f for f in features if f.name in set(feat_names)]
    with open(os.path.join(tower_dir, "fg.json"), "w") as f:
        json.dump(create_fg_json(tower_features), f, indent=2)
    with open(os.path.join(tower_dir, "tower.json"), "w") as f:
        json.dump(
            {
                "tower": tower,
                "groups": groups,
                "output": spec["output"],
                "features": feat_names,
            },
            f, indent=2,
        )
    ctx_dtype = _compute_dtype(pipeline_config.train_config)

    def tower_fn(dense, tables, batch):
        ctx = M.Context(training=False, compute_dtype=ctx_dtype)
        grouped, _ = model.embedding_group.forward(
            tables, batch, dense["embedding_group"], ctx, groups=groups,
        )
        grouped, _ = model.build_input(dense, grouped, batch, ctx)
        emb = model.predict_tower(dense, grouped, batch, ctx, tower)
        return {spec["output"]: emb.astype(jnp.float32)}

    _serialize_stablehlo(
        pipeline_config, tower_features, tower_fn,
        (sub["dense"], sub["tables"]), tower_dir, "tower_fn.stablehlo",
    )
    logger.info(f"exported {tower} tower to {tower_dir}")


def _export_tdm_embedding(pipeline_config, model, features, sub,
                          emb_dir: str) -> None:
    """TDM embedding artifact: candidate/tree-node features -> node
    embedding (the seq group's query slots; reference tdm.py:101
    TDMEmbedding)."""
    from torcheasyrec_tpu.features.feature import create_fg_json

    eg = model.embedding_group
    seq_group = model._seq_group
    sg = eg._seq_groups[seq_group]
    feat_names = [
        key.split(":")[1] if kind == "emb" else key
        for kind, key, _ in sg["query"]
    ]
    table_names = eg.engine.tables_for_features(set(feat_names))
    os.makedirs(emb_dir, exist_ok=True)
    checkpoint_util.save_model(
        os.path.join(emb_dir, "model"),
        _tower_weights(model, sub, table_names),
    )
    config_util.save_message(
        pipeline_config, os.path.join(emb_dir, "pipeline.config")
    )
    node_features = [f for f in features if f.name in set(feat_names)]
    with open(os.path.join(emb_dir, "fg.json"), "w") as f:
        json.dump(create_fg_json(node_features), f, indent=2)
    with open(os.path.join(emb_dir, "tower.json"), "w") as f:
        json.dump(
            {
                "tower": "embedding",
                "seq_group": seq_group,
                "output": "item_emb",
                "features": feat_names,
            },
            f, indent=2,
        )
    ctx_dtype = _compute_dtype(pipeline_config.train_config)

    def emb_fn(dense, tables, batch):
        ctx = M.Context(training=False, compute_dtype=ctx_dtype)
        emb = model.embedding_group.node_embedding(
            tables, batch, dense["embedding_group"], ctx, seq_group,
        )
        return {"item_emb": emb.astype(jnp.float32)}

    _serialize_stablehlo(
        pipeline_config, node_features, emb_fn,
        (sub["dense"], sub["tables"]), emb_dir, "tower_fn.stablehlo",
    )
    logger.info(f"exported TDM embedding artifact to {emb_dir}")


def _serialize_stablehlo(pipeline_config, features, serve_fn, weights,
                         export_dir: str, filename: str) -> None:
    """Trace serve_fn(dense, tables, batch) over a mock batch of the
    given features and serialize it (jax.export). Raises on failure —
    an export artifact must not silently ship without its serving
    program (set TZREC_EXPORT_BEST_EFFORT=1 to downgrade to a
    warning)."""
    try:
        from jax import export as jax_export

        from torcheasyrec_tpu.datasets.data_parser import DataParser
        from torcheasyrec_tpu.utils.test_util import generate_mock_table

        dc = pipeline_config.data_config
        bs = int(dc.eval_batch_size or dc.batch_size)
        tbl = generate_mock_table(features, bs, [], seed=0)
        parser = DataParser(features, labels=[])
        batch = parser.parse_to_batch(
            {name: tbl.column(i)
             for i, name in enumerate(tbl.schema.names)}
        )
        dense, tables = weights
        args = (dense, tables, batch)
        leaves, treedef = jax.tree_util.tree_flatten(args)

        def serve_flat(*flat):
            d, t, b = jax.tree_util.tree_unflatten(treedef, flat)
            return serve_fn(d, t, b)

        shapes = [
            jax.ShapeDtypeStruct(
                np.asarray(x).shape, jnp.asarray(x).dtype
            )
            for x in leaves
        ]
        exp = jax_export.export(jax.jit(serve_flat))(*shapes)
        with open(os.path.join(export_dir, filename), "wb") as f:
            f.write(exp.serialize())
        with open(os.path.join(export_dir, "serving_spec.json"), "w") as f:
            json.dump(
                {
                    "batch_size": bs,
                    "platforms": list(exp.platforms),
                    "num_inputs": len(leaves),
                    "input_tree": str(treedef),
                },
                f,
            )
        logger.info(f"wrote {filename}")
    except Exception as e:  # noqa: BLE001
        if os.environ.get("TZREC_EXPORT_BEST_EFFORT") == "1":
            logger.warning(f"stablehlo export skipped: {e}")
            return
        raise RuntimeError(
            f"stablehlo serialization failed for {export_dir}: {e}"
        ) from e


def _export_stablehlo(pipeline_config, model, features, state, export_dir):
    """Serialize the jitted predict function as StableHLO
    (jax.export) — the TPU-native analogue of the reference's
    jit.script/AOTI artifact (export_util.py:199-370): a serving runtime
    can execute it without the python model code. Raises on failure
    (the reference's export errors out too)."""
    ctx_dtype = _compute_dtype(pipeline_config.train_config)

    def serve_fn(dense, tables, batch):
        ctx = M.Context(training=False, compute_dtype=ctx_dtype)
        preds = model.forward(dense, tables, batch, ctx)
        return {
            k: v for k, v in preds.items() if not k.startswith("__")
            and not isinstance(v, (list, tuple))
        }

    _serialize_stablehlo(
        pipeline_config, features, serve_fn,
        (state["dense"], state["tables"]), export_dir,
        "predict_fn.stablehlo",
    )


def _best_checkpoint(pipeline_config, model_dir) -> Optional[str]:
    """Pick the checkpoint whose eval metric was best (reference
    export.proto exporter_type=best + eval_result jsonl,
    checkpoint_util.py:236-299)."""
    metric = pipeline_config.export_config.best_exporter_metric or "auc"
    larger = pipeline_config.export_config.metric_larger_is_better
    path = os.path.join(model_dir, constant.TRAIN_EVAL_RESULT_FILENAME)
    if not os.path.exists(path):
        return None
    best_step, best_val = None, None
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if metric not in rec:
                continue
            v = float(rec[metric])
            better = (
                best_val is None
                or (v > best_val if larger else v < best_val)
            )
            if better:
                best_val, best_step = v, int(rec["global_step"])
    if best_step is None:
        return None
    candidates = checkpoint_util.list_checkpoints(model_dir)
    if best_step not in candidates:
        return None
    logger.info(
        f"best exporter: step {best_step} ({metric}={best_val:.5f})"
    )
    return os.path.join(model_dir, f"model.ckpt-{best_step}")


# ---------------------------------------------------------------------------
# predict
# ---------------------------------------------------------------------------


def predict_checkpoint(
    pipeline_config_path: str,
    predict_input_path: str,
    predict_output_path: str,
    checkpoint_path: Optional[str] = None,
    reserved_columns: Optional[str] = None,
    output_columns: Optional[str] = None,
    batch_size: Optional[int] = None,
) -> None:
    """Batch inference directly from a training checkpoint
    (reference main.py:1358 predict_checkpoint)."""
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.dataset import create_writer

    pipeline_config = config_util.load_pipeline_config(pipeline_config_path)
    if batch_size:
        pipeline_config.data_config.batch_size = batch_size
    compute_dtype = _compute_dtype(pipeline_config.train_config)
    model, features, _ = _build_model_and_optim(pipeline_config, None)
    dense_params, tables, _ = _init_state(model, pipeline_config)
    sub = {"dense": dense_params, "tables": tables}
    if model.embedding_group.has_zch:
        sub["zch"] = model.embedding_group.init_zch_states()
    ckpt = checkpoint_path or checkpoint_util.latest_checkpoint(
        pipeline_config.model_dir
    )
    if ckpt:
        sub = checkpoint_util.restore_train_state(ckpt, model, sub)
    state = dict(sub)
    state["step"] = jnp.zeros((), jnp.int32)

    reserved = [c.strip() for c in (reserved_columns or "").split(",")
                if c.strip()]
    dl = create_dataloader(
        pipeline_config.data_config, features, predict_input_path,
        mode="predict", reserved_columns=reserved,
    )
    writer = create_writer(
        predict_output_path,
        "ParquetWriter"
        if not predict_output_path.endswith(".csv") else "CsvWriter",
    )
    _estep = make_eval_step(model, compute_dtype, with_loss=False)
    eval_step = jax.jit(lambda state, batch: _estep(state, batch)[0])
    out_cols = [c.strip() for c in (output_columns or "").split(",")
                if c.strip()]

    def _convert(preds, reserved) -> Dict[str, pa.Array]:
        preds = jax.device_get(preds)
        out: Dict[str, pa.Array] = {}
        # reserved input columns first so predictions stay joinable
        for k, col in reserved.items():
            out[k] = col
        for k, v in preds.items():
            if k.startswith("__") or (out_cols and k not in out_cols):
                continue
            v = np.asarray(v)
            out[k] = pa.array(v) if v.ndim == 1 else pa.array(list(v))
        return out

    aw = _AsyncPredictWriter(writer, _convert)
    n = 0
    for batch, info in dl():
        batch = _inject_host_rows(model, batch)
        aw.put(eval_step(state, batch), info.reserved)
        n += info.batch_size
    aw.close()
    logger.info(f"predicted {n} examples -> {predict_output_path}")


class _AsyncPredictWriter:
    """Overlap device compute with host IO during batch predict
    (reference's threaded predict pipeline, main.py:1120-1357): the
    main loop only dispatches async jitted steps and enqueues the
    on-device results; this thread device_gets them, converts to Arrow
    columns, and writes. The bounded queue applies backpressure so at
    most ``maxsize`` batches of predictions live on device/host."""

    def __init__(self, writer, convert, maxsize: int = 4) -> None:
        import queue
        import threading

        self._writer = writer
        self._convert = convert
        self._q: Any = queue.Queue(maxsize=maxsize)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._err is not None:
                continue  # drain remaining items after a failure
            try:
                self._writer.write(self._convert(*item))
            except BaseException as e:  # noqa: BLE001 — surfaced on close
                self._err = e

    def put(self, *item: Any) -> None:
        if self._err is not None:
            raise self._err
        self._q.put(item)

    def close(self) -> None:
        self._q.put(None)
        self._thread.join()
        try:
            self._writer.close()
        except BaseException:  # noqa: BLE001
            # a writer broken mid-write may raise from close() too;
            # the first (recorded) failure is the one to propagate
            if self._err is None:
                raise
        if self._err is not None:
            raise self._err


def _predict_tower_artifact(
    pipeline_config,
    tower_dir: str,
    tower_meta: Dict[str, Any],
    predict_input_path: str,
    predict_output_path: str,
    compute_dtype,
    reserved_columns: Optional[str],
) -> None:
    """Batch inference from a per-tower export artifact: the input holds
    only that tower's side (e.g. an item table -> item embeddings for
    the ANN index; user requests -> query embeddings)."""
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.dataset import create_writer

    model, features, _ = _build_model_and_optim(pipeline_config, None)
    dense_params, tables, _ = _init_state(model, pipeline_config)
    sub = {"dense": dense_params, "tables": tables}
    if model.embedding_group.has_zch:
        sub["zch"] = model.embedding_group.init_zch_states()
    state = checkpoint_util.restore_train_state(
        os.path.join(tower_dir, "model"), model, sub
    )
    tower = tower_meta["tower"]
    out_key = tower_meta["output"]
    feat_set = set(tower_meta["features"])
    tower_features = [f for f in features if f.name in feat_set]

    def _tower_fn(st, batch):
        from torcheasyrec_tpu.datasets.pack import maybe_unpack

        batch = maybe_unpack(batch)
        ctx = M.Context(training=False, compute_dtype=compute_dtype)
        if model.embedding_group.has_zch:
            batch, _ = model.embedding_group.remap_zch(
                batch, st["zch"], jnp.zeros((), jnp.int32), False
            )
        if tower == "embedding":
            emb = model.embedding_group.node_embedding(
                st["tables"], batch, st["dense"]["embedding_group"], ctx,
                tower_meta["seq_group"],
            )
        else:
            grouped, _ = model.embedding_group.forward(
                st["tables"], batch, st["dense"]["embedding_group"], ctx,
                groups=tower_meta["groups"],
            )
            grouped, _ = model.build_input(st["dense"], grouped, batch, ctx)
            emb = model.predict_tower(
                st["dense"], grouped, batch, ctx, tower
            )
        return emb.astype(jnp.float32)

    tower_step = jax.jit(_tower_fn)
    reserved = [c.strip() for c in (reserved_columns or "").split(",")
                if c.strip()]
    dl = create_dataloader(
        pipeline_config.data_config, tower_features, predict_input_path,
        mode="predict", reserved_columns=reserved,
    )
    writer = create_writer(
        predict_output_path,
        "ParquetWriter"
        if not predict_output_path.endswith(".csv") else "CsvWriter",
    )
    def _convert(emb, reserved, bs) -> Dict[str, pa.Array]:
        emb = np.asarray(jax.device_get(emb))
        if emb.ndim == 3:  # multi-interest [B, K, D] -> [B, K*D]
            emb = emb.reshape(emb.shape[0], -1)
        out: Dict[str, pa.Array] = {}
        for k, col in reserved.items():
            out[k] = col
        out[out_key] = pa.array(list(emb[:bs]))
        return out

    aw = _AsyncPredictWriter(writer, _convert)
    n = 0
    for batch, info in dl():
        batch = _inject_host_rows(model, batch)
        aw.put(tower_step(state, batch), info.reserved, info.batch_size)
        n += info.batch_size
    aw.close()
    logger.info(
        f"predicted {n} {tower}-tower embeddings -> {predict_output_path}"
    )


def predict(
    predict_input_path: str,
    predict_output_path: str,
    scripted_model_path: str,
    reserved_columns: Optional[str] = None,
    output_columns: Optional[str] = None,
    batch_size: Optional[int] = None,
) -> None:
    """Offline batch inference over an exported model
    (reference main.py:1120)."""
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.dataset import create_writer

    pipeline_config = config_util.load_pipeline_config(
        os.path.join(scripted_model_path, "pipeline.config")
    )
    if batch_size:
        pipeline_config.data_config.batch_size = batch_size
    mesh = None
    compute_dtype = _compute_dtype(pipeline_config.train_config)
    tower_meta_path = os.path.join(scripted_model_path, "tower.json")
    if os.path.exists(tower_meta_path):
        with open(tower_meta_path) as f:
            tower_meta = json.load(f)
        _predict_tower_artifact(
            pipeline_config, scripted_model_path, tower_meta,
            predict_input_path, predict_output_path, compute_dtype,
            reserved_columns,
        )
        return
    model, features, _ = _build_model_and_optim(pipeline_config, mesh)
    dense_params, tables, _ = _init_state(model, pipeline_config)
    base_state = {"dense": dense_params, "tables": tables}
    if model.embedding_group.has_zch:
        base_state["zch"] = model.embedding_group.init_zch_states()
    quant_meta_path = os.path.join(scripted_model_path, "quant_meta.json")
    if os.path.exists(quant_meta_path):
        from torcheasyrec_tpu.acc.quant_util import dequantize_rowwise

        with open(quant_meta_path) as f:
            quant_meta = json.load(f)
        sub_t = {k: v for k, v in base_state.items() if k != "tables"}
        sub_t = checkpoint_util.restore_model(
            os.path.join(scripted_model_path, "model"), sub_t
        )
        state = dict(sub_t)
        new_tables = {}
        for gk, meta in quant_meta["groups"].items():
            z = np.load(os.path.join(
                scripted_model_path, "quant_tables", f"{gk}.npz"
            ))
            new_tables[gk] = dequantize_rowwise(
                {"values": z["values"], "scales": z["scales"]},
                quant_meta["dtype"], meta["dim"],
            )
        # repack the [padded_rows, dim] weight matrices into whatever
        # physical layout the live engine uses (packed groups store
        # [p_rows, 128] rows — assigning the logical matrix directly
        # would corrupt every lookup)
        state["tables"] = (
            model.embedding_group.engine.import_weight_matrices(new_tables)
        )
    else:
        state = checkpoint_util.restore_train_state(
            os.path.join(scripted_model_path, "model"), model, base_state
        )

    reserved = [c.strip() for c in (reserved_columns or "").split(",")
                if c.strip()]
    dl = create_dataloader(
        pipeline_config.data_config, features, predict_input_path,
        mode="predict", reserved_columns=reserved,
    )
    writer = create_writer(
        predict_output_path,
        "ParquetWriter"
        if not predict_output_path.endswith(".csv") else "CsvWriter",
    )
    _estep = make_eval_step(model, compute_dtype, with_loss=False)
    eval_step = jax.jit(lambda state, batch: _estep(state, batch)[0])

    out_cols = [c.strip() for c in (output_columns or "").split(",")
                if c.strip()]

    def _convert(preds, reserved) -> Dict[str, pa.Array]:
        preds = jax.device_get(preds)
        out: Dict[str, pa.Array] = {}
        for k, col in reserved.items():
            out[k] = col
        for k, v in preds.items():
            if k.startswith("__") or (out_cols and k not in out_cols):
                continue
            if isinstance(v, (list, tuple)):
                continue
            v = np.asarray(v)
            if v.ndim == 1:
                out[k] = pa.array(v)
            else:
                out[k] = pa.array(list(v))
        return out

    aw = _AsyncPredictWriter(writer, _convert)
    n = 0
    for batch, info in dl():
        batch = _inject_host_rows(model, batch)
        aw.put(eval_step(state, batch), info.reserved)
        n += info.batch_size
    aw.close()
    logger.info(f"predicted {n} examples -> {predict_output_path}")
