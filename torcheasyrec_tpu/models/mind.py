"""MIND multi-interest retrieval (reference
/root/reference/tzrec/models/mind.py, 365 LoC): B2I capsule routing over
user history -> K interest capsules; user/interest concat MLP; training
scores use label-aware attention (simi_pow softmax over interests)."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.losses import softmax_cross_entropy
from torcheasyrec_tpu.models.match_model import MatchModel, MatchTower
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.capsule import CapsuleLayer
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.protos import simi_pb2
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class MIND(MatchModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        ut = mc.user_tower
        eg = self.embedding_group
        self._user_group = ut.input
        self._hist_group = ut.history_input
        self._item_group = mc.item_tower.input
        dims = eg.seq_group_dims()
        hist_dim = dims[f"{self._hist_group}.sequence"]

        self.user_mlp = mlp_from_config(
            eg.group_total_dim(self._user_group),
            config_to_kwargs(ut.user_mlp),
        )
        self.hist_seq_mlp = (
            mlp_from_config(hist_dim, config_to_kwargs(ut.hist_seq_mlp))
            if ut.HasField("hist_seq_mlp") else None
        )
        seq_dim = (
            self.hist_seq_mlp.output_dim() if self.hist_seq_mlp else hist_dim
        )
        cc = config_to_kwargs(ut.capsule_config)
        self.capsule = CapsuleLayer(
            input_dim=seq_dim,
            max_k=int(cc.get("max_k", 5)),
            max_seq_len=int(cc["max_seq_len"]),
            high_dim=int(cc["high_dim"]),
            num_iters=int(cc.get("num_iters", 3)),
            routing_logits_scale=float(cc.get("routing_logits_scale", 20)),
            routing_logits_stddev=float(cc.get("routing_logits_stddev", 1)),
            squash_pow=float(cc.get("squash_pow", 1)),
            const_caps_num=bool(cc.get("const_caps_num", False)),
        )
        self._combine = ut.user_seq_combine  # 0 CONCAT | 1 SUM
        if (
            self._combine == 1
            and self.user_mlp.output_dim() != self.capsule.high_dim
        ):
            # reference mind.py:177-182 always concatenates (the proto's
            # SUM default is never read there); honor SUM only when the
            # dims line up, else concat like the reference
            self._combine = 0
        concat_in = self.capsule.high_dim + (
            self.user_mlp.output_dim()
            if self._combine == 0 else 0
        )
        self.concat_mlp = mlp_from_config(
            concat_in, config_to_kwargs(ut.concat_mlp)
        )
        self.item_tower = MatchTower(
            mc.item_tower, self._output_dim, self._similarity,
            eg.group_total_dim(self._item_group),
        )
        self._user_proj_dim = self._output_dim
        self._simi_pow = float(mc.simi_pow)

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 6)
        params = {
            "user_mlp": self.user_mlp.init(ks[0]),
            "capsule": self.capsule.init(ks[1]),
            "concat_mlp": self.concat_mlp.init(ks[2]),
            "item_tower": self.item_tower.init(ks[3]),
            "user_out": M.linear_init(
                ks[4], self.concat_mlp.output_dim(), self._output_dim
            ),
        }
        if self.hist_seq_mlp is not None:
            params["hist_mlp"] = self.hist_seq_mlp.init(ks[5])
        return params

    def _interests(self, params, grouped, ctx) -> jnp.ndarray:
        """[B, K, output_dim] interest embeddings + [B, K] mask."""
        seq = grouped[f"{self._hist_group}.sequence"]
        lengths = grouped[f"{self._hist_group}.sequence_length"]
        if self.hist_seq_mlp is not None:
            seq = self.hist_seq_mlp(params["hist_mlp"], seq, ctx, "hist_mlp")
        interests, cap_mask = self.capsule(
            params["capsule"], seq, lengths, ctx
        )  # [B, K, high]
        user = self.user_mlp(
            params["user_mlp"], grouped[self._user_group], ctx, "user_mlp"
        )
        k = interests.shape[1]
        user_k = jnp.broadcast_to(
            user[:, None, :], (user.shape[0], k, user.shape[-1])
        )
        if self._combine == 1:  # SUM
            h = interests + user_k
        else:
            h = jnp.concatenate([interests, user_k], axis=-1)
        h = self.concat_mlp(params["concat_mlp"], h, ctx, "concat_mlp")
        out = M.linear_apply(params["user_out"], h, ctx)
        if self._similarity == simi_pb2.COSINE:
            out = out * jax.lax.rsqrt(
                jnp.sum(jnp.square(out.astype(jnp.float32)), -1,
                        keepdims=True) + 1e-12
            ).astype(out.dtype)
        return out, cap_mask

    def tower_specs(self) -> Dict[str, Dict]:
        return {
            "user": {"groups": [self._user_group, self._hist_group],
                     "output": "user_interests"},
            "item": {"groups": [self._item_group],
                     "output": "item_tower_emb"},
        }

    def predict_tower(self, params, grouped, batch, ctx,
                      tower: str) -> jnp.ndarray:
        if tower == "user":
            # [B, K, D] multi-interest embeddings; serving retrieves
            # per-interest and unions the candidates
            return self._interests(params, grouped, ctx)[0]
        return self.item_tower(
            params["item_tower"], grouped[self._item_group], ctx,
            "item_tower",
        )

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        interests, cap_mask = self._interests(params, grouped, ctx)
        item_emb = self.item_tower(params["item_tower"], grouped[self._item_group], ctx, "item_tower")
        b, k, d = interests.shape
        # per (user-interest, item) scores -> label-aware attention:
        # weight interests by softmax(simi_pow * score), masked
        scores = jnp.einsum(
            "bkd,nd->bkn", interests, item_emb,
            preferred_element_type=jnp.float32,
        )  # [B, K, B+neg]
        neg = jnp.float32(-(2 ** 31) + 1)
        masked = jnp.where(cap_mask[:, :, None], scores, neg)
        attn = jax.nn.softmax(self._simi_pow * masked, axis=1)
        sim_all = jnp.sum(attn * masked, axis=1)  # [B, B+neg]
        # reference layout: positive = own item (col i), negatives appended
        pos = jnp.take_along_axis(
            sim_all, jnp.arange(b)[:, None], axis=1
        )
        if sim_all.shape[1] > b:
            sim = jnp.concatenate([pos, sim_all[:, b:]], axis=1)
        else:
            sim = sim_all if self._in_batch_negative else pos
        preds = self._sim_to_prediction(sim)
        preds["user_interests"] = interests
        preds["item_tower_emb"] = item_emb
        return preds
