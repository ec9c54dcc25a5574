"""MultiTower + MultiTowerDIN (reference
/root/reference/tzrec/models/multi_tower.py:85, multi_tower_din.py:104):
per-group MLP towers concatenated into a final MLP; the DIN variant adds
target-attention towers over SEQUENCE groups."""

from typing import Dict, List

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.modules.sequence import DINEncoder
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class MultiTower(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self.towers = []
        total = 0
        for t in self._model_config.towers:
            mlp = mlp_from_config(
                self.embedding_group.group_total_dim(t.input),
                config_to_kwargs(t.mlp),
            )
            self.towers.append((t.input, mlp))
            total += mlp.output_dim()
        self.final = mlp_from_config(
            total, config_to_kwargs(self._model_config.final)
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"towers": {}}
        for name, mlp in self.towers:
            key, sub = jax.random.split(key)
            params["towers"][name] = mlp.init(sub)
        key, k1, k2 = jax.random.split(key, 3)
        params["final"] = self.final.init(k1)
        params["output"] = M.linear_init(
            k2, self.final.output_dim(), self._num_class
        )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        outs = [
            mlp(params["towers"][name], grouped[name], ctx, f"towers.{name}")
            for name, mlp in self.towers
        ]
        h = self.final(
            params["final"], jnp.concatenate(outs, axis=1), ctx, "final"
        )
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)


class MultiTowerDIN(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self.towers = []
        total = 0
        for t in self._model_config.towers:
            mlp = mlp_from_config(
                self.embedding_group.group_total_dim(t.input),
                config_to_kwargs(t.mlp),
            )
            self.towers.append((t.input, mlp))
            total += mlp.output_dim()
        self.din_towers: List[DINEncoder] = []
        dims = self.embedding_group.seq_group_dims()
        for t in self._model_config.din_towers:
            enc = DINEncoder(
                sequence_dim=dims[f"{t.input}.sequence"],
                query_dim=dims.get(f"{t.input}.query",
                                   dims[f"{t.input}.sequence"]),
                input=t.input,
                attn_mlp=config_to_kwargs(t.attn_mlp),
            )
            self.din_towers.append(enc)
            total += enc.output_dim()
        self.final = mlp_from_config(
            total, config_to_kwargs(self._model_config.final)
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"towers": {}, "din": []}
        for name, mlp in self.towers:
            key, sub = jax.random.split(key)
            params["towers"][name] = mlp.init(sub)
        for enc in self.din_towers:
            key, sub = jax.random.split(key)
            params["din"].append(enc.init(sub))
        key, k1, k2 = jax.random.split(key, 3)
        params["final"] = self.final.init(k1)
        params["output"] = M.linear_init(
            k2, self.final.output_dim(), self._num_class
        )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        outs = [
            mlp(params["towers"][name], grouped[name], ctx, f"towers.{name}")
            for name, mlp in self.towers
        ]
        for i, enc in enumerate(self.din_towers):
            outs.append(enc(params["din"][i], grouped, ctx, f"din.{i}"))
        h = self.final(
            params["final"], jnp.concatenate(outs, axis=1), ctx, "final"
        )
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)
