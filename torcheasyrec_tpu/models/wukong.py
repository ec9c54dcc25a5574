"""WuKong (reference /root/reference/tzrec/models/wukong.py:130):
stacked WuKong interaction layers over per-feature embeddings."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.interaction import WuKongLayer
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class WuKong(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        dims = self.embedding_group.group_dims("sparse")
        assert len(set(dims)) == 1, "sparse embedding dims must match"
        self._emb_dim = dims[0]
        num_feats = len(dims)
        self.dense_mlp = None
        if self.embedding_group.has_group("dense") and \
                self._model_config.HasField("dense_mlp"):
            dense_dim = self.embedding_group.group_total_dim("dense")
            self.dense_mlp = mlp_from_config(
                dense_dim, config_to_kwargs(self._model_config.dense_mlp)
            )
            assert self.dense_mlp.output_dim() % self._emb_dim == 0
            num_feats += self.dense_mlp.output_dim() // self._emb_dim
        self.layers = []
        f = num_feats
        for lc in self._model_config.wukong_layers:
            cfg = config_to_kwargs(lc)
            layer = WuKongLayer(
                num_features=f,
                emb_dim=self._emb_dim,
                lcb_feature_num=int(cfg["lcb_feature_num"]),
                fmb_feature_num=int(cfg["fmb_feature_num"]),
                compressed_feature_num=int(
                    cfg.get("compressed_feature_num", 16)
                ),
                feature_num_mlp=cfg["feature_num_mlp"],
            )
            self.layers.append(layer)
            f = layer.out_features
        self.final = mlp_from_config(
            f * self._emb_dim, config_to_kwargs(self._model_config.final)
        )
        self._num_feats = num_feats

    def init_dense(self, key: jax.Array) -> M.Params:
        params = {"layers": []}
        if self.dense_mlp is not None:
            key, sub = jax.random.split(key)
            params["dense_mlp"] = self.dense_mlp.init(sub)
        for layer in self.layers:
            key, sub = jax.random.split(key)
            params["layers"].append(layer.init(sub))
        key, k1, k2 = jax.random.split(key, 3)
        params["final"] = self.final.init(k1)
        params["output"] = M.linear_init(
            k2, self.final.output_dim(), self._num_class
        )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        b = grouped["sparse"].shape[0]
        x = grouped["sparse"].reshape(b, -1, self._emb_dim)
        if self.dense_mlp is not None:
            d = self.dense_mlp(
                params["dense_mlp"], grouped["dense"], ctx, "dense_mlp"
            ).reshape(b, -1, self._emb_dim)
            x = jnp.concatenate([d, x], axis=1)
        for i, layer in enumerate(self.layers):
            x = layer(params["layers"][i], x, ctx, f"layers.{i}")
        h = self.final(params["final"], x.reshape(b, -1), ctx, "final")
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)
