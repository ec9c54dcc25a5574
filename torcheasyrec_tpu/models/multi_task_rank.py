"""MultiTaskRank base + SimpleMultiTask.

Counterpart of /root/reference/tzrec/models/multi_task_rank.py (220 LoC):
per-task towers each with label, losses, metrics, task weight and
task-space indicator weighting (in/out task-space sample weights).
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.losses import create_loss_fn
from torcheasyrec_tpu.metrics import TrainMetricWrapper, create_metric
from torcheasyrec_tpu.models.model import _grouping_value
from torcheasyrec_tpu.models.rank_model import RankModel, _grouping_value_dev
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class MultiTaskRank(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._task_tower_cfgs = list(
            getattr(self._model_config, "task_towers", [])
        )
        self._use_pareto = bool(
            getattr(model_config, "use_pareto_loss_weight", False)
        )
        self._pareto_floors = {}
        for t in self._task_tower_cfgs:
            for lf_cfg in t.losses:
                which = lf_cfg.WhichOneof("loss")
                if which:
                    self._pareto_floors[f"{which}_{t.tower_name}"] = float(
                        getattr(t, "pareto_min_loss_weight", 0.0) or 0.0
                    )
        self._task_loss_fns: Dict[str, List[Dict]] = {}
        for i, t in enumerate(self._task_tower_cfgs):
            self._task_loss_fns[t.tower_name] = [
                create_loss_fn(c) for c in t.losses
            ]
            for lf in self._task_loss_fns[t.tower_name]:
                need = int(lf.get("num_class", 1))
                have = int(getattr(t, "num_class", 1) or 1)
                if need > max(have, 1):
                    # e.g. jrc_loss reads logits[:, 1]; a 1-wide head
                    # would silently clamp the index and train nothing
                    raise ValueError(
                        f"task tower '{t.tower_name}': loss "
                        f"{lf['name']} needs num_class >= {need}, "
                        f"config has {have}"
                    )

    def _task_label(self, t, idx: int) -> str:
        return t.label_name if t.label_name else self._labels[idx]

    def _task_output_to_prediction(self, t, output) -> Dict[str, jnp.ndarray]:
        suffix = f"_{t.tower_name}"
        num_class = int(getattr(t, "num_class", 1) or 1)
        output = output.astype(jnp.float32)
        loss_names = [lf["name"] for lf in self._task_loss_fns[t.tower_name]]
        use_softmax = any(
            n in ("softmax_cross_entropy", "jrc_loss") for n in loss_names
        )
        preds = {}
        if num_class == 1 and not use_softmax:
            logits = output[..., 0] if output.ndim > 1 else output
            preds[f"logits{suffix}"] = logits
            preds[f"probs{suffix}"] = jax.nn.sigmoid(logits)
        else:
            preds[f"logits{suffix}"] = output
            probs = jax.nn.softmax(output, axis=-1)
            preds[f"probs{suffix}"] = (
                probs[..., 1] if num_class <= 2 else probs
            )
        return preds

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        losses = {}
        for i, t in enumerate(self._task_tower_cfgs):
            label = batch.labels[self._task_label(t, i)]
            task_w = float(getattr(t, "weight", 1.0) or 1.0)
            extra_w = None
            ind_label = getattr(t, "task_space_indicator_label", "")
            if ind_label:
                ind = (batch.labels[ind_label] > 0).astype(jnp.float32) \
                    if ind_label in batch.labels else (
                        _grouping_value_dev(batch, ind_label) > 0
                    ).astype(jnp.float32)
                extra_w = (
                    float(t.in_task_space_weight) * ind
                    + float(t.out_task_space_weight) * (1.0 - ind)
                )
            sw_name = getattr(t, "sample_weight_name", "") or None
            for lf in self._task_loss_fns[t.tower_name]:
                kw = {}
                if lf["name"] == "jrc_loss":
                    kw["session_ids"] = _grouping_value_dev(
                        batch, lf["session_name"]
                    )
                logits = predictions[f"logits_{t.tower_name}"]
                per_sample = lf["fn"](logits, label, **kw)
                losses[f"{lf['name']}_{t.tower_name}"] = task_w * self._reduce(
                    per_sample, batch, sw_name, extra_w
                )
        if self._use_pareto and len(losses) > 1:
            from torcheasyrec_tpu.losses.pe_mtl_loss import (
                apply_pareto_weights,
            )

            losses = apply_pareto_weights(losses, self._pareto_floors)
        return losses

    # -- metrics -----------------------------------------------------------

    def init_metrics(self) -> List[Dict]:
        out = []
        for i, t in enumerate(self._task_tower_cfgs):
            for c in t.metrics:
                m = create_metric(c)
                m["name"] = f"{m['name']}_{t.tower_name}"
                m["tower"] = t.tower_name
                m["label"] = self._task_label(t, i)
                out.append(m)
        return out

    def init_train_metrics(self) -> List[Dict]:
        out = []
        for i, t in enumerate(self._task_tower_cfgs):
            for c in t.train_metrics:
                m = create_metric(c)
                m["metric"] = TrainMetricWrapper(
                    m["metric"], decay_rate=c.decay_rate,
                    decay_step=c.decay_step,
                )
                m["name"] = f"{m['name']}_{t.tower_name}"
                m["tower"] = t.tower_name
                m["label"] = self._task_label(t, i)
                out.append(m)
        return out

    def update_metrics(self, metrics, predictions, batch: Batch) -> None:
        import numpy as np

        for m in metrics:
            tower = m["tower"]
            label = np.asarray(batch.labels[m["label"]])
            preds = predictions.get(f"probs_{tower}")
            kw = {}
            gk = m["config"].get("grouping_key")
            if gk:
                kw["grouping_key"] = _grouping_value(batch, gk)
            m["metric"].update(np.asarray(preds), label, **kw)


class SimpleMultiTask(MultiTaskRank):
    """Shared bottom features -> per-task MLP towers
    (reference multi_task_rank.py SimpleMultiTask)."""

    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        self.towers = []
        for t in self._task_tower_cfgs:
            mlp = (
                mlp_from_config(in_dim, config_to_kwargs(t.mlp))
                if t.HasField("mlp") else None
            )
            self.towers.append(mlp)

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"towers": [], "outputs": []}
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        for t, mlp in zip(self._task_tower_cfgs, self.towers):
            key, k1, k2 = jax.random.split(key, 3)
            params["towers"].append(mlp.init(k1) if mlp else {})
            out_in = mlp.output_dim() if mlp else in_dim
            params["outputs"].append(
                M.linear_init(k2, out_in, int(t.num_class))
            )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()]
        preds = {}
        for i, (t, mlp) in enumerate(zip(self._task_tower_cfgs, self.towers)):
            h = mlp(params["towers"][i], x, ctx, f"towers.{i}") if mlp else x
            y = M.linear_apply(params["outputs"][i], h, ctx)
            preds.update(self._task_output_to_prediction(t, y))
        return preds
