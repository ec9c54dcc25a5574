"""DLRM-HSTU generative ranking model.

Counterpart of /root/reference/tzrec/models/dlrm_hstu.py (:82-200):
uih + candidate sequences -> HSTUTransducer -> per-candidate item MLP ->
FusionMTLTower multi-task heads, with packed-bitmask labels
(FusionSubTaskConfig.task_bitmask) and per-candidate masked losses.

Feature-group contract (kuairand config layout): groups named
``contextual`` (DEEP, optional), ``uih``, ``candidate`` (SEQUENCE), and
optional ``uih_action`` / ``uih_watchtime`` / ``uih_timestamp`` /
``candidate_timestamp`` sequence groups carrying scalar per-step values.
Task ``label_name`` refers to a per-candidate sequence feature parsed
into the batch (e.g. ``item_action_weight``).
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.datasets.utils import Batch
from torcheasyrec_tpu.losses import binary_cross_entropy, create_loss_fn
from torcheasyrec_tpu.metrics import create_metric
from torcheasyrec_tpu.models.model import BaseModel
from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.encoders import (
    OutputPostprocessor,
    PositionalEncoder,
    SimpleActionEncoder,
)
from torcheasyrec_tpu.modules.gr.hstu_transducer import (
    ContextualPreprocessor,
    HSTUTransducer,
    extract_candidates,
)
from torcheasyrec_tpu.modules.gr.preprocessors import (
    preprocessor_from_config,
)
from torcheasyrec_tpu.modules.gr.stu import stu_from_config
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


class DlrmHSTU(BaseModel):
    def __init__(self, model_config, features, labels, sample_weights=None,
                 **kwargs) -> None:
        super().__init__(model_config, features, labels, sample_weights,
                         **kwargs)
        self._build_embedding_group()
        mc = self._model_config
        hstu_cfg = mc.hstu
        if hasattr(hstu_cfg, "__len__"):  # repeated field (UltraHSTU)
            hstu_cfg = hstu_cfg[0]
        stu_cfg = config_to_kwargs(hstu_cfg.stu)
        self._e = int(stu_cfg["embedding_dim"])
        self.max_seq_len = int(mc.max_seq_len)

        eg = self.embedding_group
        dims = eg.seq_group_dims()
        uih_dim = dims["uih.sequence"]
        cand_dim = dims["candidate.sequence"]
        ctx_dim = (
            eg.group_total_dim("contextual")
            if eg.has_group("contextual") else 0
        )
        n_ctx_features = (
            len(eg.group_dims("contextual"))
            if eg.has_group("contextual") else 0
        )
        self._has_ctx = ctx_dim > 0
        self._aux_groups = {
            name: eg.has_group(name)
            for name in ("uih_action", "uih_watchtime", "uih_timestamp",
                         "candidate_timestamp")
        }

        pre_cfg = hstu_cfg.input_preprocessor
        which_pre = pre_cfg.WhichOneof("input_preprocessor")
        input_dropout = float(hstu_cfg.input_dropout_ratio)
        pre = None
        if which_pre in (
            "contextual_preprocessor", "contextual_interleave_preprocessor"
        ) and getattr(pre_cfg, which_pre).content_mlp.WhichOneof(
            "contextualized_mlp"
        ):
            # full content/action-MLP family (reference
            # preprocessors.py:93; factory :721-747)
            pre = preprocessor_from_config(
                pre_cfg,
                embedding_dim=self._e,
                uih_content_dim=uih_dim,
                cand_content_dim=cand_dim,
                contextual_dim=ctx_dim,
                n_contextual_tokens=n_ctx_features,
                input_dropout_ratio=input_dropout,
            )
        if pre is None:
            action_encoder = None
            if which_pre is not None:
                pcfg = getattr(pre_cfg, which_pre)
                if pcfg.HasField("action_encoder") and (
                    pcfg.action_encoder.WhichOneof("action_encoder")
                ):
                    ac = pcfg.action_encoder.simple_action_encoder
                    action_encoder = SimpleActionEncoder(
                        action_embedding_dim=int(
                            ac.action_embedding_dim or 8
                        ),
                        action_weights=list(ac.action_weights) or [1],
                        watchtime_to_action_thresholds=list(
                            ac.watchtime_to_action_thresholds
                        ),
                        watchtime_to_action_weights=list(
                            ac.watchtime_to_action_weights
                        ),
                        embedding_init_std=float(
                            ac.embedding_init_std or 0.1
                        ),
                    )
            pre = ContextualPreprocessor(
                embedding_dim=self._e,
                uih_content_dim=uih_dim,
                cand_content_dim=cand_dim,
                contextual_dim=ctx_dim,
                # one token per contextual feature (reference
                # preprocessors.py:105 max_contextual_seq_len = feature
                # num)
                n_contextual_tokens=n_ctx_features,
                action_encoder=action_encoder,
                input_dropout_ratio=input_dropout,
            )
        self.pre = pre
        # layer count inside HSTU comes from attn_num_layers unless
        # stu.num_layers is explicitly set (reference hstu.py stacks
        # attn_num_layers STU layers)
        if not hstu_cfg.stu.HasField("num_layers"):
            stu_cfg["num_layers"] = int(hstu_cfg.attn_num_layers)
        stack = stu_from_config(stu_cfg)
        # contextual prefix length feeds the attention mask
        stack.layer.contextual_seq_len = pre.n_ctx

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
            pre, stack, pos, post, max_seq_len=self.max_seq_len,
            attn_truncation_split_layer=int(
                hstu_cfg.attn_truncation_split_layer
            ),
            attn_truncation_tail_len=int(hstu_cfg.attn_truncation_tail_len),
        )

        # fusion multi-task tower
        ft = mc.fusion_mtl_tower
        self._task_cfgs = list(ft.task_configs)
        self._item_hidden = int(mc.item_embedding_hidden_dim or 512)
        self.item_proj_in = cand_dim
        tower_in = self._e + self._item_hidden
        self.tower_mlp = (
            mlp_from_config(tower_in, config_to_kwargs(ft.mlp))
            if ft.HasField("mlp") else None
        )
        self._tower_out = (
            self.tower_mlp.output_dim() if self.tower_mlp else tower_in
        )
        self._task_loss_fns = {
            t.task_name: [create_loss_fn(c) for c in t.losses]
            for t in self._task_cfgs
        }

    # ------------------------------------------------------------------

    def init_dense(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4 + len(self._task_cfgs))
        params = {
            "transducer": self.transducer.init(ks[0]),
            "item_proj": M.linear_init(
                ks[1], self.item_proj_in, self._item_hidden
            ),
            "task_heads": {},
        }
        if self.tower_mlp is not None:
            params["tower_mlp"] = self.tower_mlp.init(ks[2])
        for i, t in enumerate(self._task_cfgs):
            params["task_heads"][t.task_name] = M.linear_init(
                ks[3 + i], self._tower_out, int(t.num_class)
            )
        return params

    def _seq_scalar(self, grouped, batch: Batch, group: str):
        """[B, L] scalar values from an aux sequence group (or None)."""
        if not self._aux_groups.get(group):
            return None
        v = grouped[f"{group}.sequence"]
        return v[..., 0]

    def predict(self, params, grouped, batch: Batch, ctx
                ) -> Dict[str, jnp.ndarray]:
        uih = grouped["uih.sequence"]
        uih_len = grouped["uih.sequence_length"]
        cand = grouped["candidate.sequence"]
        cand_len = grouped["candidate.sequence_length"]
        inputs = dict(
            uih_emb=uih,
            uih_lengths=uih_len,
            cand_emb=cand,
            cand_lengths=cand_len,
            contextual_emb=grouped.get("contextual")
            if self._has_ctx else None,
            action_weights=self._seq_scalar(grouped, batch, "uih_action"),
            watchtimes=self._seq_scalar(grouped, batch, "uih_watchtime"),
            uih_timestamps=self._seq_scalar(grouped, batch, "uih_timestamp"),
            cand_timestamps=self._seq_scalar(
                grouped, batch, "candidate_timestamp"
            ),
        )
        seq_out, lengths, num_targets = self.transducer(
            params["transducer"], ctx, **inputs
        )
        lc_max = cand.shape[1]
        # targets sit at [lengths - num_targets, lengths) in the
        # RETURNED layout (which truncation may have repacked); under
        # target interleaving each candidate owns a [content, action]
        # token pair and the content token carries the prediction
        stride = 2 if self.pre.interleave_targets(ctx.training) else 1
        cand_out = extract_candidates(
            seq_out, 0, lengths - num_targets, lc_max, stride=stride
        )  # [B, Lc, E]
        item_h = jax.nn.silu(
            M.linear_apply(params["item_proj"], cand, ctx)
        )
        h = jnp.concatenate([cand_out, item_h], axis=-1)
        if self.tower_mlp is not None:
            h = self.tower_mlp(params["tower_mlp"], h, ctx, "fusion_mlp")
        preds: Dict[str, jnp.ndarray] = {
            "__candidate_lengths": cand_len,
        }
        for t in self._task_cfgs:
            y = M.linear_apply(
                params["task_heads"][t.task_name], h, ctx
            ).astype(jnp.float32)
            logits = y[..., 0]  # [B, Lc]
            preds[f"logits_{t.task_name}"] = logits
            preds[f"probs_{t.task_name}"] = jax.nn.sigmoid(logits)
        return preds

    # ------------------------------------------------------------------

    def _task_labels(self, t, batch: Batch, lc_max: int) -> jnp.ndarray:
        """Per-candidate labels [B, Lc] from a sequence feature column."""
        name = t.label_name
        if name in batch.sequence_dense_features:
            vals = batch.sequence_dense_features[name].values[..., 0]
        elif name in batch.sequence_sparse_features:
            vals = batch.sequence_sparse_features[name].values
        elif name in batch.labels:
            vals = batch.labels[name]
            if vals.ndim == 1:
                vals = vals[:, None]
        else:
            raise KeyError(f"label {name} not found in batch")
        # align to candidate padded length
        cur = vals.shape[1]
        if cur < lc_max:
            vals = jnp.pad(vals, ((0, 0), (0, lc_max - cur)))
        elif cur > lc_max:
            vals = vals[:, :lc_max]
        if getattr(t, "task_bitmask", 0):
            vals = (
                (vals.astype(jnp.int32) & jnp.int32(t.task_bitmask)) > 0
            )
        return vals.astype(jnp.float32)

    def loss(self, predictions, batch: Batch) -> Dict[str, jnp.ndarray]:
        cand_len = predictions["__candidate_lengths"]
        losses = {}
        for t in self._task_cfgs:
            logits = predictions[f"logits_{t.task_name}"]
            lc_max = logits.shape[1]
            labels = self._task_labels(t, batch, lc_max)
            mask = (
                jnp.arange(lc_max, dtype=jnp.int32)[None, :]
                < cand_len.astype(jnp.int32)[:, None]
            ).astype(jnp.float32)
            per = binary_cross_entropy(logits, labels) * mask
            denom = jnp.maximum(jnp.sum(mask), 1.0)
            losses[f"bce_{t.task_name}"] = (
                float(getattr(t, "weight", 1.0) or 1.0)
                * jnp.sum(per) / denom
            )
        return losses

    # ------------------------------------------------------------------

    def init_metrics(self) -> List[Dict]:
        out = []
        for t in self._task_cfgs:
            for c in t.metrics:
                m = create_metric(c)
                m["name"] = f"{m['name']}_{t.task_name}"
                m["task"] = t
                out.append(m)
        return out

    def update_metrics(self, metrics, predictions, batch: Batch) -> None:
        import numpy as np

        cand_len = np.asarray(predictions["__candidate_lengths"])
        for m in metrics:
            t = m["task"]
            probs = np.asarray(predictions[f"probs_{t.task_name}"])
            lc_max = probs.shape[1]
            labels = np.asarray(
                jax.device_get(self._task_labels(t, batch, lc_max))
            )
            mask = (
                np.arange(lc_max)[None, :] < cand_len[:, None]
            )
            m["metric"].update(probs[mask], labels[mask])
