"""DBMTL (reference /root/reference/tzrec/models/dbmtl.py:175): shared
bottom (optional MaskNet/MLP/MMoE) + bayesian task towers where each
tower conditions on its relation towers' hidden outputs."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.multi_task_rank import MultiTaskRank
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.masknet import MaskNetModule
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.modules.mmoe import MMoE as MMoEModule
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class DBMTL(MultiTaskRank):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        mc = self._model_config
        self.masknet = None
        self.bottom_mlp = None
        self.mmoe = None
        bottom_out = in_dim
        if mc.HasField("mask_net"):
            cfg = config_to_kwargs(mc.mask_net)
            self.masknet = MaskNetModule(
                feature_dim=in_dim,
                n_mask_blocks=int(cfg["n_mask_blocks"]),
                mask_block=cfg["mask_block"],
                top_mlp=cfg.get("top_mlp"),
                use_parallel=bool(cfg.get("use_parallel", True)),
            )
            bottom_out = self.masknet.output_dim()
        if mc.HasField("bottom_mlp"):
            self.bottom_mlp = mlp_from_config(
                bottom_out, config_to_kwargs(mc.bottom_mlp)
            )
            bottom_out = self.bottom_mlp.output_dim()
        if mc.HasField("expert_mlp"):
            self.mmoe = MMoEModule(
                in_features=bottom_out,
                expert_mlp=config_to_kwargs(mc.expert_mlp),
                num_expert=int(mc.num_expert),
                num_task=len(self._task_tower_cfgs),
                gate_mlp=config_to_kwargs(mc.gate_mlp)
                if mc.HasField("gate_mlp") else None,
            )
            bottom_out = self.mmoe.output_dim()
        self._bottom_out = bottom_out

        # task towers + relation mlps
        self.towers = {}
        self.relation_mlps = {}
        self._tower_hidden = {}
        for t in self._task_tower_cfgs:
            name = t.tower_name
            mlp = (
                mlp_from_config(bottom_out, config_to_kwargs(t.mlp))
                if t.HasField("mlp") else None
            )
            self.towers[name] = mlp
            self._tower_hidden[name] = (
                mlp.output_dim() if mlp else bottom_out
            )
        for t in self._task_tower_cfgs:
            name = t.tower_name
            if len(t.relation_tower_names) > 0 and t.HasField("relation_mlp"):
                rel_in = self._tower_hidden[name] + sum(
                    self._tower_hidden[r] for r in t.relation_tower_names
                )
                self.relation_mlps[name] = mlp_from_config(
                    rel_in, config_to_kwargs(t.relation_mlp)
                )

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"towers": {}, "relations": {}, "outputs": {}}
        if self.masknet is not None:
            key, sub = jax.random.split(key)
            params["masknet"] = self.masknet.init(sub)
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
            out_in = self._tower_hidden[name]
            if name in self.relation_mlps:
                params["relations"][name] = self.relation_mlps[name].init(k2)
                out_in = self.relation_mlps[name].output_dim()
            params["outputs"][name] = M.linear_init(
                k3, out_in, int(t.num_class)
            )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()]
        if self.masknet is not None:
            x = self.masknet(params["masknet"], x, ctx)
        if self.bottom_mlp is not None:
            x = self.bottom_mlp(params["bottom"], x, ctx, "bottom")
        if self.mmoe is not None:
            task_inputs = self.mmoe(params["mmoe"], x, ctx)
        else:
            task_inputs = [x] * len(self._task_tower_cfgs)

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
        fused = {}
        for t in self._task_tower_cfgs:
            name = t.tower_name
            h = hidden[name]
            if len(t.relation_tower_names) > 0:
                rel = [fused.get(r, hidden[r]) for r in t.relation_tower_names]
                h = jnp.concatenate([h] + rel, axis=-1)
                if name in self.relation_mlps:
                    h = self.relation_mlps[name](
                        params["relations"][name], h, ctx, f"relations.{name}"
                    )
            fused[name] = h
            y = M.linear_apply(params["outputs"][name], h, ctx)
            preds.update(self._task_output_to_prediction(t, y))
        return preds
