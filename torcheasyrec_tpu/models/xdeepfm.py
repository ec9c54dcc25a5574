"""xDeepFM (reference /root/reference/tzrec/models/xdeepfm.py:86):
CIN over per-feature embeddings + deep MLP + wide."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.interaction import CIN
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class XDeepFM(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        cin_group = "fm" if self.embedding_group.has_group("fm") else "deep"
        self._cin_group = cin_group
        dims = self.embedding_group.group_dims(cin_group)
        assert len(set(dims)) == 1, (
            f"{cin_group} embedding dims must match for CIN"
        )
        self._emb_dim = dims[0]
        self._num_feats = len(dims)
        self.cin = CIN(self._num_feats, list(self._model_config.cin.cin_layer_size))
        deep_dim = self.embedding_group.group_total_dim("deep")
        self.deep = mlp_from_config(
            deep_dim, config_to_kwargs(self._model_config.deep)
        )
        self.final = mlp_from_config(
            1 + self.cin.output_dim() + self.deep.output_dim(),
            config_to_kwargs(self._model_config.final),
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        return {
            "cin": self.cin.init(ks[0]),
            "deep": self.deep.init(ks[1]),
            "final": self.final.init(ks[2]),
            "output": M.linear_init(
                ks[3], self.final.output_dim(), self._num_class
            ),
        }

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        b = grouped["deep"].shape[0]
        y_wide = jnp.sum(grouped["wide"], axis=1, keepdims=True)
        feats = grouped[self._cin_group].reshape(
            b, self._num_feats, self._emb_dim
        )
        y_cin = self.cin(params["cin"], feats, ctx)
        y_deep = self.deep(params["deep"], grouped["deep"], ctx, "deep")
        h = self.final(
            params["final"],
            jnp.concatenate([y_wide, y_cin, y_deep], axis=1), ctx, "final",
        )
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)


# registry alias matching the proto message name "xDeepFM"
xDeepFM = XDeepFM
