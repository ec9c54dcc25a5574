"""PLE (reference /root/reference/tzrec/models/ple.py:109): stacked
extraction networks (CGC) + task towers."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.multi_task_rank import MultiTaskRank
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.extraction_net import ExtractionNet
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class PLE(MultiTaskRank):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        num_task = len(self._task_tower_cfgs)
        self.extraction_nets = []
        task_dims = [in_dim] * num_task
        share_dim = in_dim
        n_nets = len(self._model_config.extraction_networks)
        for li, en_cfg in enumerate(self._model_config.extraction_networks):
            cfg = config_to_kwargs(en_cfg)
            net = ExtractionNet(
                in_task=task_dims,
                in_share=share_dim,
                num_task=num_task,
                network_name=cfg.get("network_name", f"cgc_{li}"),
                expert_num_per_task=int(cfg["expert_num_per_task"]),
                share_num=int(cfg.get("share_num", 1) or 1),
                task_expert_net=cfg["task_expert_net"],
                share_expert_net=cfg.get("share_expert_net"),
                final_flag=(li == n_nets - 1),
            )
            self.extraction_nets.append(net)
            task_dims = [net.task_output_dim()] * num_task
            share_dim = net.share_output_dim() or share_dim
        self.towers = []
        for t in self._task_tower_cfgs:
            self.towers.append(
                mlp_from_config(task_dims[0], config_to_kwargs(t.mlp))
                if t.HasField("mlp") else None
            )
        self._tower_in = task_dims[0]

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"extraction": [], "towers": [], "outputs": []}
        for net in self.extraction_nets:
            key, sub = jax.random.split(key)
            params["extraction"].append(net.init(sub))
        for t, mlp in zip(self._task_tower_cfgs, self.towers):
            key, k1, k2 = jax.random.split(key, 3)
            params["towers"].append(mlp.init(k1) if mlp else {})
            out_in = mlp.output_dim() if mlp else self._tower_in
            params["outputs"].append(
                M.linear_init(k2, out_in, int(t.num_class))
            )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()]
        task_inputs = [x] * len(self._task_tower_cfgs)
        share = x
        for i, net in enumerate(self.extraction_nets):
            task_inputs, share = net(
                params["extraction"][i], task_inputs, share, ctx,
                path=f"extraction.{i}"
            )
        preds = {}
        for i, (t, mlp) in enumerate(zip(self._task_tower_cfgs, self.towers)):
            h = task_inputs[i]
            if mlp:
                h = mlp(params["towers"][i], h, ctx, f"towers.{i}")
            y = M.linear_apply(params["outputs"][i], h, ctx)
            preds.update(self._task_output_to_prediction(t, y))
        return preds
