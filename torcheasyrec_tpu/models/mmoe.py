"""MMoE model (reference /root/reference/tzrec/models/mmoe.py:86)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.multi_task_rank import MultiTaskRank
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.modules.mmoe import MMoE as MMoEModule
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class MMoE(MultiTaskRank):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        self.mmoe = MMoEModule(
            in_features=in_dim,
            expert_mlp=config_to_kwargs(self._model_config.expert_mlp),
            num_expert=int(self._model_config.num_expert),
            num_task=len(self._task_tower_cfgs),
            gate_mlp=config_to_kwargs(self._model_config.gate_mlp)
            if self._model_config.HasField("gate_mlp") else None,
        )
        self.towers = []
        for t in self._task_tower_cfgs:
            self.towers.append(
                mlp_from_config(
                    self.mmoe.output_dim(), config_to_kwargs(t.mlp)
                ) if t.HasField("mlp") else None
            )

    def init_dense(self, key: jax.Array) -> M.Params:
        key, sub = jax.random.split(key)
        params = {"mmoe": self.mmoe.init(sub), "towers": [], "outputs": []}
        for t, mlp in zip(self._task_tower_cfgs, self.towers):
            key, k1, k2 = jax.random.split(key, 3)
            params["towers"].append(mlp.init(k1) if mlp else {})
            out_in = mlp.output_dim() if mlp else self.mmoe.output_dim()
            params["outputs"].append(
                M.linear_init(k2, out_in, int(t.num_class))
            )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        task_inputs = self.mmoe(params["mmoe"], grouped[self._main_group()], ctx)
        preds = {}
        for i, (t, mlp) in enumerate(zip(self._task_tower_cfgs, self.towers)):
            h = task_inputs[i]
            if mlp:
                h = mlp(params["towers"][i], h, ctx, f"towers.{i}")
            y = M.linear_apply(params["outputs"][i], h, ctx)
            preds.update(self._task_output_to_prediction(t, y))
        return preds
