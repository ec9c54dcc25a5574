"""DLRM (reference /root/reference/tzrec/models/dlrm.py:135): dense MLP
to embedding dim + dot interaction over [dense, sparse...] features."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.interaction import InteractionArch
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class DLRM(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._sparse_dims = self.embedding_group.group_dims("sparse")
        assert len(set(self._sparse_dims)) == 1, (
            f"sparse embedding dims must match, got {set(self._sparse_dims)}"
        )
        self._emb_dim = self._sparse_dims[0]
        self._has_dense = self.embedding_group.has_group("dense")
        num_feats = len(self._sparse_dims)
        self.dense_mlp = None
        if self._has_dense:
            dense_dim = self.embedding_group.group_total_dim("dense")
            self.dense_mlp = mlp_from_config(
                dense_dim, config_to_kwargs(self._model_config.dense_mlp)
            )
            assert self.dense_mlp.output_dim() == self._emb_dim, (
                "dense_mlp output must equal sparse embedding_dim"
            )
            num_feats += 1
        self.interaction = InteractionArch(num_feats)
        self._arch_with_sparse = bool(
            getattr(self._model_config, "arch_with_sparse", True)
        )
        final_in = self.interaction.output_dim()
        if self._arch_with_sparse:
            final_in += num_feats * self._emb_dim
        self.final_mlp = mlp_from_config(
            final_in, config_to_kwargs(self._model_config.final)
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 3)
        params = {}
        if self.dense_mlp is not None:
            params["dense_mlp"] = self.dense_mlp.init(ks[0])
        params["final_mlp"] = self.final_mlp.init(ks[1])
        params["output"] = M.linear_init(
            ks[2], self.final_mlp.output_dim(), self._num_class
        )
        return params

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        b = grouped["sparse"].shape[0]
        feats = grouped["sparse"].reshape(b, -1, self._emb_dim)
        if self.dense_mlp is not None:
            d = self.dense_mlp(params["dense_mlp"], grouped["dense"], ctx,
                               "dense_mlp")
            feats = jnp.concatenate([d[:, None, :], feats], axis=1)
        inter = self.interaction({}, feats, ctx)
        if self._arch_with_sparse:
            inter = jnp.concatenate([feats.reshape(b, -1), inter], axis=1)
        h = self.final_mlp(params["final_mlp"], inter, ctx, "final_mlp")
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)
