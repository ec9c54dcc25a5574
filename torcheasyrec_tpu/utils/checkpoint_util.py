"""Checkpointing: sharded train-state save/restore + cadence manager.

Counterpart of /root/reference/tzrec/utils/checkpoint_util.py
(CheckpointManager:302, save_model:988, restore_model:876). Backend is
Orbax (PyTree checkpointing with sharding-aware restore — the TPU
equivalent of torch.distributed.checkpoint), plus sidecars:

- ``dataloader_state.json``: per-source max consumed row for exact
  data-position resume (reference datasets/utils.py:39-71, main.py:491).
- ``eval_result.txt`` jsonl for best-checkpoint export.
- step/epoch/event-time cadence + keep_checkpoint_max pruning.
"""

import json
import os
import re
import shutil
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from torcheasyrec_tpu.utils.logging_util import logger

CKPT_PREFIX = "model.ckpt-"


def _ckpt_path(model_dir: str, step: int) -> str:
    return os.path.join(model_dir, f"{CKPT_PREFIX}{step}")


def list_checkpoints(model_dir: str) -> List[int]:
    if not os.path.isdir(model_dir):
        return []
    out = []
    for name in os.listdir(model_dir):
        m = re.fullmatch(rf"{re.escape(CKPT_PREFIX)}(\d+)", name)
        if m and os.path.isdir(os.path.join(model_dir, name)):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_checkpoint(model_dir: str) -> Optional[str]:
    steps = list_checkpoints(model_dir)
    return _ckpt_path(model_dir, steps[-1]) if steps else None


def save_model(
    ckpt_dir: str,
    state: Dict[str, Any],
    dataloader_state: Optional[Dict[int, int]] = None,
) -> None:
    """Save a train-state pytree (+ dataloader sidecar)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    is_lead = jax.process_index() == 0
    if is_lead and os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    if jax.process_count() > 1:
        # barrier: no process may enter the orbax save while the lead
        # is still clearing a stale directory
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("ckpt_cleanup:" + ckpt_dir)
    # orbax handles multihost coordination for sharded arrays itself
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(ckpt_dir, "state"), state)
    if dataloader_state is not None and is_lead:
        with open(os.path.join(ckpt_dir, "dataloader_state.json"), "w") as f:
            json.dump({str(k): int(v) for k, v in dataloader_state.items()}, f)
    logger.info(f"saved checkpoint to {ckpt_dir}")


def restore_model(
    ckpt_dir: str, state: Dict[str, Any]
) -> Dict[str, Any]:
    """Restore into the given state pytree, preserving shardings.

    Partial restore is supported (reference PartialLoadPlanner,
    checkpoint_util.py:66-183): the saved tree is read raw, then values
    are grafted onto the target structure by path; target leaves missing
    from the checkpoint keep their current (e.g. freshly-initialized)
    values, and each restored array is device_put with the target
    leaf's sharding.
    """
    ckpt_dir = os.path.abspath(ckpt_dir)
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.join(ckpt_dir, "state"))

    restored = _graft_tree(state, raw)
    logger.info(f"restored checkpoint from {ckpt_dir}")
    return restored


def jnp_asarray_like(source, target):
    import jax.numpy as jnp

    return jnp.asarray(np.asarray(source), dtype=target.dtype)


def load_dataloader_state(ckpt_dir: str) -> Dict[int, int]:
    path = os.path.join(ckpt_dir, "dataloader_state.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return {int(k): int(v) for k, v in json.load(f).items()}


class CheckpointManager:
    """Cadence (steps / epochs / event-time) + retention.

    Event-time triggers (reference checkpoint_util.py:404-505): with a
    single-process runtime the quorum reduction is local; multi-host,
    the train loop feeds ``should_save`` the GLOBAL min data-timestamp
    — synced each step through the batch-dim host collective
    (main.py, sync_batch_dims carries min-timestamp) — so every process
    reaches the save decision in lockstep.
    """

    def __init__(
        self,
        model_dir: str,
        save_checkpoints_steps: int = 1000,
        save_checkpoints_epochs: int = 0,
        keep_checkpoint_max: int = 0,
        save_checkpoints_timestamp_interval: int = 0,
        save_checkpoints_timestamps: Optional[List[int]] = None,
    ) -> None:
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self._steps = save_checkpoints_steps
        self._epochs = save_checkpoints_epochs
        self._keep_max = keep_checkpoint_max
        self._ts_interval = save_checkpoints_timestamp_interval
        self._ts_targets = sorted(save_checkpoints_timestamps or [])
        self._last_event_time: Optional[int] = None
        self._last_trigger_time: Optional[int] = None

    def should_save(
        self,
        step: int,
        epoch_end: bool = False,
        data_timestamp: Optional[int] = None,
    ) -> bool:
        if epoch_end and self._epochs and True:
            return True
        if self._steps and step > 0 and step % self._steps == 0:
            return True
        if data_timestamp is not None:
            self._last_event_time = data_timestamp
            if self._ts_interval:
                if self._last_trigger_time is None:
                    self._last_trigger_time = data_timestamp
                elif data_timestamp - self._last_trigger_time >= self._ts_interval:
                    self._last_trigger_time = data_timestamp
                    return True
            while self._ts_targets and data_timestamp >= self._ts_targets[0]:
                self._ts_targets.pop(0)
                return True
        return False

    def save(
        self,
        step: int,
        state: Dict[str, Any],
        dataloader_state: Optional[Dict[int, int]] = None,
    ) -> str:
        path = _ckpt_path(self.model_dir, step)
        save_model(path, state, dataloader_state)
        self._prune()
        return path

    def _prune(self) -> None:
        if not self._keep_max:
            return
        if jax.process_index() != 0:
            # lead-only: concurrent rmtree across processes races
            return
        steps = list_checkpoints(self.model_dir)
        while len(steps) > self._keep_max:
            victim = steps.pop(0)
            shutil.rmtree(_ckpt_path(self.model_dir, victim),
                          ignore_errors=True)
            logger.info(f"pruned checkpoint model.ckpt-{victim}")


# ---------------------------------------------------------------------------
# model-aware train-state save/restore: embedding tables + sparse optimizer
# state are stored in a canonical PER-TABLE layout so checkpoints are
# independent of device count / fused-group layout / sharding plan
# (the reference's reshard-on-load, checkpoint_util.py:66-183).
# ---------------------------------------------------------------------------


def state_for_save(model, state: Dict[str, Any]) -> Dict[str, Any]:
    engine = model.embedding_group.engine
    out = {k: v for k, v in state.items()
           if k not in ("tables", "sparse_opt")}
    out["canonical_tables"] = engine.to_canonical(
        state["tables"], state.get("sparse_opt")
    )
    return out


def save_train_state(ckpt_dir: str, model, state: Dict[str, Any],
                     dataloader_state=None) -> None:
    if jax.process_count() > 1:
        # multihost: device_get / per-table canonicalization can't read
        # non-addressable shards — save the sharded arrays directly
        # (orbax distributed save); restore reshards via orbax. Layout
        # portability across plans uses single-host canonical saves.
        save_model(ckpt_dir, state, dataloader_state)
        return
    save_model(ckpt_dir, state_for_save(model, jax.device_get(state)),
               dataloader_state)


def restore_train_state(ckpt_dir: str, model,
                        state: Dict[str, Any]) -> Dict[str, Any]:
    """Partial-restore into `state`: keys absent from the checkpoint keep
    their current values; tables restore through the canonical layout."""
    target = {k: v for k, v in state.items()
              if k not in ("tables", "sparse_opt")}
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.join(os.path.abspath(ckpt_dir), "state"))
    restored = dict(state)
    # graft non-table subtrees with shape checking
    grafted = _graft_tree(target, {k: v for k, v in raw.items()
                                   if k != "canonical_tables"})
    restored.update(grafted)
    canon = raw.get("canonical_tables")
    if canon:
        engine = model.embedding_group.engine
        tables, sparse_opt = engine.from_canonical(
            canon, state["tables"], state.get("sparse_opt")
        )
        restored["tables"] = tables
        if state.get("sparse_opt") is not None and sparse_opt:
            restored["sparse_opt"] = sparse_opt
    elif "tables" in raw and "tables" in state:
        legacy = {"tables": state["tables"]}
        if "sparse_opt" in raw and state.get("sparse_opt") is not None:
            legacy["sparse_opt"] = state["sparse_opt"]
        restored.update(_graft_tree(
            legacy, {k: raw[k] for k in legacy if k in raw}
        ))
    logger.info(f"restored checkpoint from {ckpt_dir}")
    return restored


def _graft_tree(target, source):
    """Graft checkpoint values onto a target pytree by structure.

    Handles orbax raw-restore shapes: optax namedtuple states come back
    as dicts (by field name) or lists — both are matched onto
    namedtuple targets field-wise so optimizer state survives resume.
    """

    def _graft(t, s):
        if isinstance(t, tuple) and hasattr(t, "_fields"):  # namedtuple
            if isinstance(s, dict):
                vals = [
                    _graft(getattr(t, f), s[f]) if f in s
                    else getattr(t, f)
                    for f in t._fields
                ]
                return type(t)(*vals)
            if isinstance(s, (list, tuple)):
                vals = [_graft(a, b) for a, b in zip(t, s)]
                vals += list(t[len(s):])
                return type(t)(*vals)
            return t
        if isinstance(t, dict):
            if not isinstance(s, dict):
                return t
            return {k: _graft(v, s[k]) if k in s else v
                    for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            if not isinstance(s, (list, tuple)):
                return t
            out = [_graft(a, b) for a, b in zip(t, s)] + list(t[len(s):])
            return type(t)(out) if isinstance(t, tuple) else out
        if s is None:
            return t
        if hasattr(t, "sharding") and getattr(
            t.sharding, "mesh", None
        ) is not None:
            return jax.device_put(np.asarray(s), t.sharding)
        if hasattr(t, "dtype"):
            return jnp_asarray_like(s, t)
        return s

    return _graft(target, source)
