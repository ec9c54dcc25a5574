"""HSTU-Match retrieval (reference /root/reference/tzrec/models/hstu.py:
HSTUUserTower:40, HSTUMatchItemTower:142, HSTUMatch:262).

The user tower runs the user interaction history through a UIH
preprocessor (optional action encoder + contextual prefix tokens), a
positional encoder with a query-time-anchored time bias, and the STU
stack; the LAST valid position's output is the user embedding. The item
tower projects candidate embeddings.

Two candidate modes:

- **scalar** (DEEP item group): one positive per row; supports
  ``in_batch_negative`` or sampled negatives via ``MatchModel._sim``.
- **jagged** (reference parity): the item group is a sequence group
  carrying K_i positives per row. Sampled negatives ride as EXTRA ROWS
  of the candidate columns (single-element sequences) — our
  static-shape equivalent of the reference's block-(B-1) suffix combine
  (datasets/utils.py:635-723): per-row positive lengths
  (``CAND_POS_LENGTHS``) are simply the candidate group's
  ``sequence_length`` array, so no extra plumbing crosses the batch.
  The user embedding is scored per positive against
  ``[own positive | shared negatives | own hard negatives]``
  (reference hstu.py:362-390 repeat_interleaves the user embedding by
  pos lengths; here the repeat is a broadcast over the padded
  candidate axis with a validity mask).
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.losses import softmax_cross_entropy
from torcheasyrec_tpu.models.match_model import MatchModel, MatchTower
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.encoders import (
    OutputPostprocessor,
    PositionalEncoder,
)
from torcheasyrec_tpu.modules.gr.hstu_transducer import HSTUTransducer
from torcheasyrec_tpu.modules.gr.preprocessors import (
    UIHPreprocessor,
    _action_encoder_from_config,
    preprocessor_from_config,
)
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
        self.max_seq_len = int(ut.max_seq_len)

        # candidate mode: jagged sequence group vs scalar DEEP group
        self._jagged_items = f"{self._item_group}.sequence" in dims
        if self._jagged_items and self._in_batch_negative:
            # reference hstu.py:309-313: multi-positive rows make the
            # BxB in-batch path ill-defined
            raise ValueError(
                "HSTUMatch with a jagged candidate group does not "
                "support in_batch_negative; use a negative sampler."
            )

        # optional auxiliary groups (reference hstu.py:269-283)
        self._ctx_key = None
        if eg.has_group("contextual"):
            self._ctx_key = "contextual"
        elif "contextual.query" in dims:
            self._ctx_key = "contextual.query"
        ctx_dim = eg.group_total_dim(self._ctx_key) if self._ctx_key else 0
        n_ctx = len(eg.group_dims(self._ctx_key)) if self._ctx_key else 0
        self._aux_groups = {
            name: f"{name}.sequence" in dims
            for name in ("uih_action", "uih_watchtime", "uih_timestamp")
        }
        self._has_qt = eg.has_group("query_time")

        # user-tower encode pipeline (reference HSTUMatchEncoder,
        # gr/hstu_transducer.py:455): preprocessor + positional encoder
        # + STU stack + postprocessor
        pre = None
        which_pre = (
            hstu_cfg.input_preprocessor.WhichOneof("input_preprocessor")
            if hstu_cfg.HasField("input_preprocessor") else None
        )
        if which_pre == "uih_preprocessor":
            pre = preprocessor_from_config(
                hstu_cfg.input_preprocessor,
                embedding_dim=self._e,
                uih_content_dim=seq_dim,
                cand_content_dim=0,
                contextual_dim=ctx_dim,
                n_contextual_tokens=n_ctx,
                input_dropout_ratio=float(hstu_cfg.input_dropout_ratio),
            )
        if pre is None:
            action_encoder = None
            if which_pre is not None:
                pcfg = getattr(hstu_cfg.input_preprocessor, which_pre)
                if pcfg.HasField("action_encoder"):
                    action_encoder = _action_encoder_from_config(
                        pcfg.action_encoder
                    )
            pre = UIHPreprocessor(
                embedding_dim=self._e,
                uih_content_dim=seq_dim,
                contextual_dim=ctx_dim,
                n_contextual_tokens=n_ctx,
                action_encoder=action_encoder,
                action_mlp_cfg=(
                    pcfg.action_mlp
                    if which_pre is not None and pcfg.HasField("action_mlp")
                    else None
                ),
                input_dropout_ratio=float(hstu_cfg.input_dropout_ratio),
            )
        self.stack = stu_from_config(stu_cfg)
        pos = None
        if hstu_cfg.HasField("positional_encoder"):
            pc = hstu_cfg.positional_encoder
            pos = PositionalEncoder(
                embedding_dim=self._e,
                num_position_buckets=int(pc.num_position_buckets or 8192),
                num_time_buckets=int(pc.num_time_buckets or 0),
                use_time_encoding=bool(pc.use_time_encoding),
            )
        post = None
        if hstu_cfg.HasField("output_postprocessor"):
            which = hstu_cfg.output_postprocessor.WhichOneof(
                "output_postprocessor"
            )
            kind = {
                "l2norm_postprocessor": "l2_norm",
                "layernorm_postprocessor": "layer_norm",
                "timestamp_layernorm_postprocessor": "timestamp_layer_norm",
            }[which]
            post = OutputPostprocessor(kind, self._e)
        self.transducer = HSTUTransducer(
            pre, self.stack, pos, post, max_seq_len=self.max_seq_len,
            attn_truncation_split_layer=int(
                hstu_cfg.attn_truncation_split_layer
            ),
            attn_truncation_tail_len=int(hstu_cfg.attn_truncation_tail_len),
        )

        item_in = (
            dims[f"{self._item_group}.sequence"] if self._jagged_items
            else eg.group_total_dim(self._item_group)
        )
        self.item_tower = MatchTower(
            mc.item_tower, self._output_dim, self._similarity, item_in,
        )
        self._user_out_dim = self._output_dim or self._e

    def tower_specs(self) -> Dict[str, Dict]:
        """User tower consumes uih + every auxiliary group it reads at
        forward time (reference hstu.py:326-336)."""
        user_groups = [self._seq_group]
        if self._ctx_key:
            user_groups.append(self._ctx_key.split(".")[0])
        user_groups += [g for g, ok in self._aux_groups.items() if ok]
        if self._has_qt:
            user_groups.append("query_time")
        return {
            "user": {"groups": user_groups, "output": "user_tower_emb"},
            "item": {"groups": [self._item_group],
                     "output": "item_tower_emb"},
        }

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 3)
        params = {
            "transducer": self.transducer.init(ks[0]),
            "item_tower": self.item_tower.init(ks[1]),
        }
        if self._output_dim > 0:
            params["user_out"] = M.linear_init(
                ks[2], self._e, self._output_dim
            )
        return params

    # -- towers --------------------------------------------------------

    def _seq_scalar(self, grouped, group: str) -> Optional[jnp.ndarray]:
        """[B, L] scalar values from an aux sequence group (or None)."""
        if not self._aux_groups.get(group):
            return None
        return grouped[f"{group}.sequence"][..., 0]

    def _encode_user(self, params, grouped, batch, ctx) -> jnp.ndarray:
        seq = grouped[f"{self._seq_group}.sequence"]
        lengths = grouped[f"{self._seq_group}.sequence_length"]
        inputs = dict(
            uih_emb=seq,
            uih_lengths=lengths,
            contextual_emb=(
                grouped[self._ctx_key] if self._ctx_key else None
            ),
            action_weights=self._seq_scalar(grouped, "uih_action"),
            watchtimes=self._seq_scalar(grouped, "uih_watchtime"),
            uih_timestamps=self._seq_scalar(grouped, "uih_timestamp"),
        )
        if self._has_qt:
            qt = grouped["query_time"]
            inputs["time_anchor"] = qt[..., 0] if qt.ndim > 1 else qt
        seq_out, out_lengths, _ = self.transducer(
            params["transducer"], ctx, **inputs
        )
        last = jnp.maximum(out_lengths.astype(jnp.int32) - 1, 0)
        user_emb = jnp.take_along_axis(
            seq_out, last[:, None, None], axis=1
        )[:, 0]
        if self._output_dim > 0:
            user_emb = M.linear_apply(params["user_out"], user_emb, ctx)
        if self._similarity == simi_pb2.COSINE:
            user_emb = user_emb * jax.lax.rsqrt(
                jnp.sum(jnp.square(user_emb.astype(jnp.float32)), -1,
                        keepdims=True) + 1e-12
            ).astype(user_emb.dtype)
        return user_emb

    def predict_tower(self, params, grouped, batch, ctx,
                      tower: str) -> jnp.ndarray:
        if tower == "item":
            if self._jagged_items:
                # serving rows are single-element candidate sequences;
                # position 0 is the item (reference
                # HSTUMatchItemTower._build_scalar_features)
                tok = self.item_tower(
                    params["item_tower"],
                    grouped[f"{self._item_group}.sequence"], ctx,
                    "item_tower",
                )
                return tok[:, 0]
            return self.item_tower(
                params["item_tower"], grouped[self._item_group], ctx,
                "item_tower",
            )
        return self._encode_user(params, grouped, batch, ctx)

    # -- forward -------------------------------------------------------

    def predict(self, params, grouped, batch, ctx) -> Dict[str, jnp.ndarray]:
        user_emb = self._encode_user(params, grouped, batch, ctx)
        hard_neg_indices = batch.additional.get("hard_neg_indices")
        if not self._jagged_items:
            item_emb = self.predict_tower(params, grouped, batch, ctx,
                                          "item")
            preds = self._sim_to_prediction(self._sim(
                user_emb, item_emb, hard_neg_indices,
            ))
            preds["user_tower_emb"] = user_emb
            preds["item_tower_emb"] = item_emb
            return preds

        # jagged mode: [B rows of K_i positives | M shared negatives |
        # hard slots] as candidate rows
        cand = grouped[f"{self._item_group}.sequence"]
        cand_len = grouped[f"{self._item_group}.sequence_length"]
        item_tok = self.item_tower(
            params["item_tower"], cand, ctx, "item_tower"
        )  # [R, Lc, D]
        b = user_emb.shape[0]
        lc = item_tok.shape[1]
        pos_item = item_tok[:b]
        pos_len = cand_len[:b].astype(jnp.int32)
        neg_rows = item_tok[b:, 0]  # [M + hard, D]
        n_hard = (
            hard_neg_indices.shape[0] if hard_neg_indices is not None else 0
        )
        uf = user_emb.astype(jnp.float32)
        blocks = [
            jnp.einsum(
                "bd,bcd->bc", uf, pos_item.astype(jnp.float32)
            )[..., None]  # [B, Lc, 1] own positive
        ]
        n_simple = neg_rows.shape[0] - n_hard
        if n_simple > 0:
            neg_sim = jnp.dot(
                uf, neg_rows[:n_simple].astype(jnp.float32).T
            )  # [B, M]
            blocks.append(
                jnp.broadcast_to(
                    neg_sim[:, None, :], (b, lc, n_simple)
                )
            )
        if n_hard:
            # per-user hard negatives: same column scatter as
            # MatchModel._sim, broadcast over that user's positives
            hard_emb = neg_rows[n_simple:].astype(jnp.float32)
            rows = hard_neg_indices[:, 0]
            cols = hard_neg_indices[:, 1]
            hard_user = jnp.take(uf, jnp.minimum(rows, b - 1), axis=0)
            hard_sim = jnp.sum(hard_user * hard_emb, axis=-1)
            n_cols = max(n_hard // b, 1)
            hard_mat = jnp.full((b, n_cols), -1e9, jnp.float32)
            hard_mat = hard_mat.at[rows, cols].set(hard_sim, mode="drop")
            blocks.append(
                jnp.broadcast_to(hard_mat[:, None, :], (b, lc, n_cols))
            )
        sim = jnp.concatenate(blocks, axis=-1)  # [B, Lc, 1+M+hc]
        mask = (
            jnp.arange(lc, dtype=jnp.int32)[None, :] < pos_len[:, None]
        )
        return {
            "similarity": sim.reshape(b * lc, -1).astype(jnp.float32),
            "similarity_mask": mask.reshape(-1),
            "user_tower_emb": user_emb,
            "item_tower_emb": item_tok[:, 0],
        }

    # -- loss / metrics (jagged mode masks padded positives) ------------

    def loss(self, predictions, batch) -> Dict[str, jnp.ndarray]:
        if not self._jagged_items:
            return super().loss(predictions, batch)
        sim = predictions["similarity"] / self._temperature
        mask = predictions["similarity_mask"].astype(jnp.float32)
        per = softmax_cross_entropy(
            sim, jnp.zeros((sim.shape[0],), jnp.int32)
        )
        if self._sample_weight_name:
            w = batch.sample_weights[self._sample_weight_name]
            lc = sim.shape[0] // w.shape[0]
            mask = mask * jnp.repeat(w.astype(jnp.float32), lc)
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        return {
            "softmax_cross_entropy": jnp.sum(per * mask) / denom
        }

    def update_metrics(self, metrics, predictions, batch) -> None:
        if not self._jagged_items:
            return super().update_metrics(metrics, predictions, batch)
        import numpy as np

        sim = np.asarray(predictions["similarity"])
        mask = np.asarray(predictions["similarity_mask"]).astype(bool)
        sim = sim[mask]
        for m in metrics:
            m["metric"].update(sim, None)
