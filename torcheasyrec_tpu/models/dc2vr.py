"""DC2VR intervention-based CVR model (reference
/root/reference/tzrec/models/dc2vr.py, 165 LoC): MMoE-style bottom +
intervention task towers where the CVR tower's representation is
causally intervened by the CTR towers' representations."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.multi_task_rank import MultiTaskRank
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.intervention import Intervention
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.modules.mmoe import MMoE as MMoEModule
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class DC2VR(MultiTaskRank):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        mc = self._model_config
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        self.bottom_mlp = (
            mlp_from_config(in_dim, config_to_kwargs(mc.bottom_mlp))
            if mc.HasField("bottom_mlp") else None
        )
        d = self.bottom_mlp.output_dim() if self.bottom_mlp else in_dim
        self.mmoe = None
        if mc.HasField("expert_mlp"):
            self.mmoe = MMoEModule(
                in_features=d,
                expert_mlp=config_to_kwargs(mc.expert_mlp),
                num_expert=int(mc.num_expert),
                num_task=len(self._task_tower_cfgs),
                gate_mlp=config_to_kwargs(mc.gate_mlp)
                if mc.HasField("gate_mlp") else None,
            )
            d = self.mmoe.output_dim()
        self.towers = {}
        self._hidden = {}
        for t in self._task_tower_cfgs:
            mlp = (
                mlp_from_config(d, config_to_kwargs(t.mlp))
                if t.HasField("mlp") else None
            )
            self.towers[t.tower_name] = mlp
            self._hidden[t.tower_name] = mlp.output_dim() if mlp else d
        self.interventions = {}
        for t in self._task_tower_cfgs:
            if len(t.intervention_tower_names) > 0:
                cond = sum(
                    self._hidden[r] for r in t.intervention_tower_names
                )
                self.interventions[t.tower_name] = Intervention(
                    main_dim=self._hidden[t.tower_name],
                    cond_dim=cond,
                    low_rank_dim=int(t.low_rank_dim),
                    dropout_ratio=float(t.dropout_ratio),
                )

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"towers": {}, "interventions": {}, "outputs": {}}
        if self.bottom_mlp is not None:
            key, sub = jax.random.split(key)
            params["bottom"] = self.bottom_mlp.init(sub)
        if self.mmoe is not None:
            key, sub = jax.random.split(key)
            params["mmoe"] = self.mmoe.init(sub)
        for t in self._task_tower_cfgs:
            name = t.tower_name
            key, k1, k2, k3 = jax.random.split(key, 4)
            if self.towers[name] is not None:
                params["towers"][name] = self.towers[name].init(k1)
            if name in self.interventions:
                params["interventions"][name] = (
                    self.interventions[name].init(k2)
                )
            params["outputs"][name] = M.linear_init(
                k3, self._hidden[name], int(t.num_class)
            )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()]
        if self.bottom_mlp is not None:
            x = self.bottom_mlp(params["bottom"], x, ctx, "bottom")
        task_inputs = (
            self.mmoe(params["mmoe"], x, ctx)
            if self.mmoe is not None
            else [x] * len(self._task_tower_cfgs)
        )
        hidden = {}
        for i, t in enumerate(self._task_tower_cfgs):
            name = t.tower_name
            h = task_inputs[i]
            if self.towers[name] is not None:
                h = self.towers[name](
                    params["towers"][name], h, ctx, f"towers.{name}"
                )
            hidden[name] = h
        preds = {}
        for t in self._task_tower_cfgs:
            name = t.tower_name
            h = hidden[name]
            if name in self.interventions:
                cond = jnp.concatenate(
                    [jax.lax.stop_gradient(hidden[r])
                     for r in t.intervention_tower_names],
                    axis=-1,
                )
                h = self.interventions[name](
                    params["interventions"][name], h, cond, ctx
                )
            y = M.linear_apply(params["outputs"][name], h, ctx)
            preds.update(self._task_output_to_prediction(t, y))
        return preds
