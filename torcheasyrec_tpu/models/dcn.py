"""DCN v1/v2 (reference /root/reference/tzrec/models/{dcn,dcn_v2}.py)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.interaction import Cross, CrossV2
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class DCNV1(RankModel):
    """Parallel cross net + deep MLP -> final MLP."""

    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        self.cross = Cross(in_dim, int(self._model_config.cross.cross_num))
        self.deep = mlp_from_config(
            in_dim, config_to_kwargs(self._model_config.deep)
        )
        self.final = mlp_from_config(
            in_dim + self.deep.output_dim(),
            config_to_kwargs(self._model_config.final),
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        return {
            "cross": self.cross.init(ks[0]),
            "deep": self.deep.init(ks[1]),
            "final": self.final.init(ks[2]),
            "output": M.linear_init(
                ks[3], self.final.output_dim(), self._num_class
            ),
        }

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()]
        xc = self.cross(params["cross"], x, ctx)
        xd = self.deep(params["deep"], x, ctx, "deep")
        h = self.final(
            params["final"], jnp.concatenate([xc, xd], axis=1), ctx, "final"
        )
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)


class DCNV2(RankModel):
    """Stacked: optional backbone MLP -> low-rank cross -> deep -> final."""

    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        in_dim = self.embedding_group.group_total_dim(self._main_group())
        self.backbone = None
        if self._model_config.HasField("backbone"):
            self.backbone = mlp_from_config(
                in_dim, config_to_kwargs(self._model_config.backbone)
            )
            in_dim = self.backbone.output_dim()
        c = self._model_config.cross
        self.cross = CrossV2(in_dim, int(c.cross_num), int(c.low_rank))
        self.deep = None
        deep_out = in_dim
        if self._model_config.HasField("deep"):
            self.deep = mlp_from_config(
                in_dim, config_to_kwargs(self._model_config.deep)
            )
            deep_out = self.deep.output_dim()
        self.final = mlp_from_config(
            deep_out, config_to_kwargs(self._model_config.final)
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 5)
        params = {
            "cross": self.cross.init(ks[0]),
            "final": self.final.init(ks[1]),
            "output": M.linear_init(
                ks[2], self.final.output_dim(), self._num_class
            ),
        }
        if self.backbone is not None:
            params["backbone"] = self.backbone.init(ks[3])
        if self.deep is not None:
            params["deep"] = self.deep.init(ks[4])
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        x = grouped[self._main_group()]
        if self.backbone is not None:
            x = self.backbone(params["backbone"], x, ctx, "backbone")
        x = self.cross(params["cross"], x, ctx)
        if self.deep is not None:
            x = self.deep(params["deep"], x, ctx, "deep")
        h = self.final(params["final"], x, ctx, "final")
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)
