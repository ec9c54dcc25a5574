"""DSSM two-tower retrieval (reference
/root/reference/tzrec/models/dssm.py:155, dssm_v2.py:202).

DSSM uses separate user/item feature groups; DSSMV2 shares one
EmbeddingGroup across towers (identical here since the engine already
dedupes shared tables by embedding_name)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.match_model import MatchModel, MatchTower
from torcheasyrec_tpu.modules import module as M


class DSSM(MatchModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        self.user_tower = MatchTower(
            mc.user_tower, self._output_dim, self._similarity,
            self.embedding_group.group_total_dim(mc.user_tower.input),
        )
        self.item_tower = MatchTower(
            mc.item_tower, self._output_dim, self._similarity,
            self.embedding_group.group_total_dim(mc.item_tower.input),
        )
        self._user_group = mc.user_tower.input
        self._item_group = mc.item_tower.input

    def init_dense(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        return {
            "user_tower": self.user_tower.init(k1),
            "item_tower": self.item_tower.init(k2),
        }

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        user_emb = self.user_tower(params["user_tower"], grouped[self._user_group], ctx, "user_tower")
        item_emb = self.item_tower(params["item_tower"], grouped[self._item_group], ctx, "item_tower")
        preds = self._sim_to_prediction(self._sim(
            user_emb, item_emb,
            batch.additional.get("hard_neg_indices"),
        ))
        preds["user_tower_emb"] = user_emb
        preds["item_tower_emb"] = item_emb
        return preds


class DSSMV2(DSSM):
    pass
