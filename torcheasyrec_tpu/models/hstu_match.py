"""HSTU-Match retrieval (reference /root/reference/tzrec/models/hstu.py,
429 LoC): HSTU encoder over the user history as the user tower (last
valid position's output = user embedding), plain item tower."""

from typing import Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.models.match_model import MatchModel, MatchTower
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.encoders import PositionalEncoder
from torcheasyrec_tpu.modules.gr.stu import stu_from_config
from torcheasyrec_tpu.protos import simi_pb2
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class HSTUMatch(MatchModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        ut = mc.user_tower
        eg = self.embedding_group
        self._seq_group = ut.input
        self._item_group = mc.item_tower.input
        dims = eg.seq_group_dims()
        seq_dim = dims[f"{self._seq_group}.sequence"]
        hstu_cfg = ut.hstu
        stu_cfg = config_to_kwargs(hstu_cfg.stu)
        self._e = int(stu_cfg["embedding_dim"])
        self.in_proj_needed = seq_dim != self._e
        self._seq_dim = seq_dim
        self.stack = stu_from_config(stu_cfg)
        self.max_seq_len = int(ut.max_seq_len)
        self.pos = None
        if hstu_cfg.HasField("positional_encoder"):
            pc = hstu_cfg.positional_encoder
            self.pos = PositionalEncoder(
                embedding_dim=self._e,
                num_position_buckets=int(pc.num_position_buckets or 8192),
                num_time_buckets=int(pc.num_time_buckets or 0),
                use_time_encoding=bool(pc.use_time_encoding),
            )
        self.item_tower = MatchTower(
            mc.item_tower, self._output_dim, self._similarity,
            eg.group_total_dim(self._item_group),
        )
        self._user_out_dim = self._output_dim or self._e

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 5)
        params = {
            "stack": self.stack.init(ks[0]),
            "item_tower": self.item_tower.init(ks[1]),
        }
        if self.in_proj_needed:
            params["in_proj"] = M.linear_init(ks[2], self._seq_dim, self._e)
        if self.pos is not None:
            params["pos"] = self.pos.init(ks[3])
        if self._output_dim > 0:
            params["user_out"] = M.linear_init(
                ks[4], self._e, self._output_dim
            )
        return params

    def predict_tower(self, params, grouped, batch, ctx,
                      tower: str) -> jnp.ndarray:
        if tower == "item":
            return self.item_tower(
                params["item_tower"], grouped[self._item_group], ctx,
                "item_tower",
            )
        seq = grouped[f"{self._seq_group}.sequence"]
        lengths = grouped[f"{self._seq_group}.sequence_length"]
        if self.in_proj_needed:
            seq = M.linear_apply(params["in_proj"], seq, ctx)
        if self.pos is not None:
            seq = self.pos(params["pos"], seq, lengths, None, ctx)
        out = self.stack(
            params["stack"], seq, lengths, ctx,
            scaling_seqlen=self.max_seq_len or seq.shape[1],
        )
        # user embedding = output at the last valid position
        last = jnp.maximum(lengths.astype(jnp.int32) - 1, 0)
        user_emb = jnp.take_along_axis(
            out, last[:, None, None], axis=1
        )[:, 0]
        if self._output_dim > 0:
            user_emb = M.linear_apply(params["user_out"], user_emb, ctx)
        if self._similarity == simi_pb2.COSINE:
            user_emb = user_emb * jax.lax.rsqrt(
                jnp.sum(jnp.square(user_emb.astype(jnp.float32)), -1,
                        keepdims=True) + 1e-12
            ).astype(user_emb.dtype)
        return user_emb

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        user_emb = self.predict_tower(params, grouped, batch, ctx, "user")
        item_emb = self.predict_tower(params, grouped, batch, ctx, "item")
        preds = self._sim_to_prediction(self._sim(
            user_emb, item_emb,
            batch.additional.get("hard_neg_indices"),
        ))
        preds["user_tower_emb"] = user_emb
        preds["item_tower_emb"] = item_emb
        return preds
