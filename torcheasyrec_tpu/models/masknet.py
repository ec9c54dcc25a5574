"""MaskNet model (reference /root/reference/tzrec/models/masknet.py)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.rank_model import RankModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.masknet import MaskNetModule
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class MaskNet(RankModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        cfg = config_to_kwargs(self._model_config.mask_net_module)
        # first feature group, whatever its name (reference
        # masknet.py:45 uses group_names()[0])
        self._group = self.embedding_group.group_names()[0]
        feat_dim = self.embedding_group.group_total_dim(self._group)
        self.masknet = MaskNetModule(
            feature_dim=feat_dim,
            n_mask_blocks=int(cfg["n_mask_blocks"]),
            mask_block=cfg["mask_block"],
            top_mlp=cfg.get("top_mlp"),
            use_parallel=bool(cfg.get("use_parallel", True)),
        )

    def init_dense(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        return {
            "masknet": self.masknet.init(k1),
            "output": M.linear_init(
                k2, self.masknet.output_dim(), self._num_class
            ),
        }

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        h = self.masknet(params["masknet"], grouped[self._group], ctx)
        y = M.linear_apply(params["output"], h, ctx)
        return self._output_to_prediction(y)
