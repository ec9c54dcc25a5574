"""WideAndDeep (reference /root/reference/tzrec/models/wide_and_deep.py)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class WideAndDeep(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        deep_dim = self.embedding_group.group_total_dim("deep")
        self.deep_mlp = mlp_from_config(
            deep_dim, config_to_kwargs(self._model_config.deep)
        )
        final_dim = self.deep_mlp.output_dim()
        self._has_final = self._model_config.HasField("final")
        if self._has_final:
            self.final_mlp = mlp_from_config(
                final_dim + 1, config_to_kwargs(self._model_config.final)
            )
            final_dim = self.final_mlp.output_dim()
        self._final_dim = final_dim

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 3)
        params = {"deep_mlp": self.deep_mlp.init(ks[0])}
        if self._has_final:
            params["final_mlp"] = self.final_mlp.init(ks[1])
        params["output"] = M.linear_init(ks[2], self._final_dim,
                                         self._num_class)
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        y_wide = jnp.sum(grouped["wide"], axis=1, keepdims=True)
        y_deep = self.deep_mlp(params["deep_mlp"], grouped["deep"], ctx,
                               "deep_mlp")
        if self._has_final:
            y_final = self.final_mlp(
                params["final_mlp"],
                jnp.concatenate([y_wide, y_deep], axis=1), ctx, "final_mlp",
            )
            y = M.linear_apply(params["output"], y_final, ctx)
        else:
            y = y_wide + M.linear_apply(params["output"], y_deep, ctx)
        return self._output_to_prediction(y)
