"""DAT dual-augmented two-tower (reference
/root/reference/tzrec/models/dat.py, 259 LoC): each tower consumes its
feature group plus an 'augment' vector group; the adaptive-mimic
mechanism (AMM) loss pulls each side's augment vector toward the other
tower's output embedding for positive pairs."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.models.match_model import MatchModel, MatchTower
from torcheasyrec_tpu.modules import module as M


class DAT(MatchModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        eg = self.embedding_group
        ut, it = mc.user_tower, mc.item_tower
        self.user_tower = MatchTower(
            ut, self._output_dim, self._similarity,
            eg.group_total_dim(ut.input) + eg.group_total_dim(
                ut.augment_input
            ),
        )
        self.item_tower = MatchTower(
            it, self._output_dim, self._similarity,
            eg.group_total_dim(it.input) + eg.group_total_dim(
                it.augment_input
            ),
        )
        self._groups = (ut.input, ut.augment_input, it.input,
                        it.augment_input)
        self._amm_i = float(mc.amm_i_weight)
        self._amm_u = float(mc.amm_u_weight)

    def init_dense(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        return {
            "user_tower": self.user_tower.init(k1),
            "item_tower": self.item_tower.init(k2),
        }

    def tower_specs(self) -> Dict[str, Dict]:
        ug, uag, ig, iag = self._groups
        return {
            "user": {"groups": [ug, uag], "output": "user_tower_emb"},
            "item": {"groups": [ig, iag], "output": "item_tower_emb"},
        }

    def predict_tower(self, params, grouped, batch, ctx,
                      tower: str) -> jnp.ndarray:
        ug, uag, ig, iag = self._groups
        if tower == "user":
            user_in = jnp.concatenate([grouped[ug], grouped[uag]], axis=-1)
            return self.user_tower(
                params["user_tower"], user_in, ctx, "user_tower"
            )
        item_in = jnp.concatenate([grouped[ig], grouped[iag]], axis=-1)
        return self.item_tower(
            params["item_tower"], item_in, ctx, "item_tower"
        )

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        ug, uag, ig, iag = self._groups
        user_emb = self.predict_tower(params, grouped, batch, ctx, "user")
        item_emb = self.predict_tower(params, grouped, batch, ctx, "item")
        preds = self._sim_to_prediction(self._sim(
            user_emb, item_emb,
            batch.additional.get("hard_neg_indices"),
        ))
        preds["user_tower_emb"] = user_emb
        preds["item_tower_emb"] = item_emb
        preds["__augment_a_user"] = grouped[uag]
        preds["__augment_a_item"] = grouped[iag]
        return preds

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        losses = super().loss(predictions, batch)
        ue = predictions["user_tower_emb"].astype(jnp.float32)
        ie = predictions["item_tower_emb"].astype(jnp.float32)
        b = ue.shape[0]
        au = predictions["__augment_a_user"].astype(jnp.float32)
        ai = predictions["__augment_a_item"].astype(jnp.float32)
        d = ue.shape[-1]
        # AMM: user augment vector mimics positive item embedding & v.v.
        # (stop grad on the target side, truncated to output_dim)
        au_t = au[..., :d]
        ai_t = ai[:b, :d] if ai.shape[-1] >= d else jnp.pad(
            ai[:b], ((0, 0), (0, d - ai.shape[-1]))
        )
        if au_t.shape[-1] < d:
            au_t = jnp.pad(au_t, ((0, 0), (0, d - au_t.shape[-1])))
        losses["amm_loss_u"] = self._amm_u * jnp.mean(
            jnp.sum(jnp.square(
                au_t - jax.lax.stop_gradient(ie[:b])
            ), axis=-1)
        )
        losses["amm_loss_i"] = self._amm_i * jnp.mean(
            jnp.sum(jnp.square(
                ai_t - jax.lax.stop_gradient(ue)
            ), axis=-1)
        )
        return losses
