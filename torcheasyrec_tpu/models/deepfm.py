"""DeepFM (reference /root/reference/tzrec/models/deepfm.py:26-110):
wide sum + FM over deep (or 'fm') group + deep MLP, optional final MLP."""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.fm import FactorizationMachine
from torcheasyrec_tpu.modules.mlp import MLP, mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class DeepFM(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self.fm = FactorizationMachine()
        fm_group = "fm" if self.embedding_group.has_group("fm") else "deep"
        self._fm_group = fm_group
        self._fm_feature_dims = self.embedding_group.group_dims(fm_group)
        assert len(set(self._fm_feature_dims)) == 1, (
            "fm feature embedding dims must match, got "
            f"{set(self._fm_feature_dims)}"
        )
        deep_dim = self.embedding_group.group_total_dim("deep")
        self.deep_mlp = mlp_from_config(
            deep_dim, config_to_kwargs(self._model_config.deep)
        )
        final_dim = self.deep_mlp.output_dim()
        self._has_final = self._model_config.HasField("final")
        if self._has_final:
            self.final_mlp = mlp_from_config(
                1 + self._fm_feature_dims[0] + final_dim,
                config_to_kwargs(self._model_config.final),
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
        wide = grouped["wide"]
        y_wide = jnp.sum(wide, axis=1, keepdims=True)

        deep = grouped["deep"]
        y_deep = self.deep_mlp(params["deep_mlp"], deep, ctx, "deep_mlp")

        fm_feat = grouped[self._fm_group]
        fm_feat = fm_feat.reshape(
            -1, len(self._fm_feature_dims), self._fm_feature_dims[0]
        )
        y_fm = self.fm({}, fm_feat, ctx)

        if self._has_final:
            y_cat = jnp.concatenate([y_wide, y_fm, y_deep], axis=1)
            y_final = self.final_mlp(params["final_mlp"], y_cat, ctx, "final_mlp")
            y = M.linear_apply(params["output"], y_final, ctx)
        else:
            y = (
                y_wide
                + jnp.sum(y_fm, axis=1, keepdims=True)
                + M.linear_apply(params["output"], y_deep, ctx)
            )
        return self._output_to_prediction(y)
