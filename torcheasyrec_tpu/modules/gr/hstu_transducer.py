"""HSTUTransducer: preprocess -> STU stack -> postprocess.

Counterpart of /root/reference/tzrec/modules/gr/hstu_transducer.py (:318)
+ preprocessors.py (ContextualPreprocessor:93, UIHPreprocessor:484).

TPU-first sequence assembly: instead of jagged concat ops
(concat_2D_jagged etc.), the combined [contextual | uih | candidates]
sequence is built as ONE static-shape gather with per-sample index
arithmetic (contiguous tokens per sample, so the attention mask's
"valid = position < length" semantics hold).
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.encoders import (
    OutputPostprocessor,
    PositionalEncoder,
    SimpleActionEncoder,
)
from torcheasyrec_tpu.modules.gr.stu import STUStack, truncate_uih


def compact_concat(
    sources: jnp.ndarray,  # [B, n_ctx + Lu + Lc, D] (ctx | uih | cand)
    n_ctx: int,
    lu_max: int,
    uih_lengths: jnp.ndarray,  # [B]
    cand_lengths: jnp.ndarray,  # [B]
) -> jnp.ndarray:
    """Per-sample contiguous [ctx, uih[:lu], cand[:lc]] via one gather."""
    b, total, _ = sources.shape
    lu = uih_lengths.astype(jnp.int32)[:, None]
    j = jnp.arange(total, dtype=jnp.int32)[None, :]
    idx = jnp.where(j < n_ctx + lu, j, j - lu + lu_max)
    idx = jnp.clip(idx, 0, total - 1)
    if sources.ndim == 3:
        return jnp.take_along_axis(sources, idx[..., None], axis=1)
    return jnp.take_along_axis(sources, idx, axis=1)


def compact_concat_2d(sources, n_ctx, lu_max, uih_lengths, cand_lengths):
    b, total = sources.shape
    lu = uih_lengths.astype(jnp.int32)[:, None]
    j = jnp.arange(total, dtype=jnp.int32)[None, :]
    idx = jnp.where(j < n_ctx + lu, j, j - lu + lu_max)
    idx = jnp.clip(idx, 0, total - 1)
    return jnp.take_along_axis(sources, idx, axis=1)


def extract_candidates(
    seq_out: jnp.ndarray,  # [B, N, D]
    n_ctx: int,
    uih_lengths: jnp.ndarray,
    lc_max: int,
    stride: int = 1,
) -> jnp.ndarray:
    """Gather candidate-position outputs -> [B, Lc, D].

    ``stride=2`` selects the content token of each interleaved
    [content, action] target pair (reference hstu_transducer.py:430-433
    takes ``candidate_embeddings.view(-1, 2, D)[:, 0]``)."""
    b = seq_out.shape[0]
    lu = uih_lengths.astype(jnp.int32)[:, None]
    c = jnp.arange(lc_max, dtype=jnp.int32)[None, :]
    idx = jnp.clip(n_ctx + lu + stride * c, 0, seq_out.shape[1] - 1)
    return jnp.take_along_axis(seq_out, idx[..., None], axis=1)


class ContextualPreprocessor(M.Module):
    """Projects contextual/uih/candidate inputs into E-dim tokens and
    assembles the combined sequence (reference gr/preprocessors.py:93).

    Legacy linear-projection variant kept for configs that set
    ``contextual_preprocessor`` without the content/action MLP family;
    the full-fidelity family lives in gr/preprocessors.py."""

    def interleave_targets(self, training: bool) -> bool:
        return False

    def uih_multiplier(self) -> int:
        return 1

    def __init__(
        self,
        embedding_dim: int,  # E
        uih_content_dim: int,
        cand_content_dim: int,
        contextual_dim: int = 0,
        n_contextual_tokens: int = 1,
        action_encoder: Optional[SimpleActionEncoder] = None,
        input_dropout_ratio: float = 0.0,
    ) -> None:
        self.e = embedding_dim
        self.uih_dim = uih_content_dim
        self.cand_dim = cand_content_dim
        self.ctx_dim = contextual_dim
        self.n_ctx = n_contextual_tokens if contextual_dim > 0 else 0
        self.action_encoder = action_encoder
        self.dropout = input_dropout_ratio

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        uih_in = self.uih_dim + (
            self.action_encoder.output_dim() if self.action_encoder else 0
        )
        p = {
            "uih_proj": M.linear_init(ks[0], uih_in, self.e),
            "cand_proj": M.linear_init(ks[1], self.cand_dim, self.e),
        }
        if self.n_ctx:
            p["ctx_proj"] = M.linear_init(
                ks[2], self.ctx_dim, self.n_ctx * self.e
            )
        if self.action_encoder is not None:
            p["action"] = self.action_encoder.init(ks[3])
        return p

    def __call__(
        self,
        params: M.Params,
        uih_emb: jnp.ndarray,  # [B, Lu, uih_dim]
        uih_lengths: jnp.ndarray,
        cand_emb: jnp.ndarray,  # [B, Lc, cand_dim]
        cand_lengths: jnp.ndarray,
        ctx: M.Context,
        contextual_emb: Optional[jnp.ndarray] = None,  # [B, ctx_dim]
        action_weights: Optional[jnp.ndarray] = None,  # [B, Lu]
        watchtimes: Optional[jnp.ndarray] = None,
        uih_timestamps: Optional[jnp.ndarray] = None,  # [B, Lu]
        cand_timestamps: Optional[jnp.ndarray] = None,  # [B, Lc]
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (x [B, N, E], lengths [B], num_targets [B], timestamps)."""
        b, lu_max, _ = uih_emb.shape
        lc_max = cand_emb.shape[1]

        uih_in = uih_emb
        if self.action_encoder is not None and action_weights is not None:
            act = self.action_encoder(
                params["action"], action_weights, watchtimes, ctx
            )
            uih_in = jnp.concatenate(
                [uih_emb, act.astype(uih_emb.dtype)], axis=-1
            )
        uih_tok = M.linear_apply(params["uih_proj"], uih_in, ctx)
        cand_tok = M.linear_apply(params["cand_proj"], cand_emb, ctx)
        pieces = [uih_tok, cand_tok]
        if self.n_ctx and contextual_emb is not None:
            ctx_tok = M.linear_apply(
                params["ctx_proj"], contextual_emb, ctx
            ).reshape(b, self.n_ctx, self.e)
            pieces = [ctx_tok] + pieces
        src = jnp.concatenate(pieces, axis=1)
        x = compact_concat(
            src, self.n_ctx, lu_max, uih_lengths, cand_lengths
        )
        x = M.dropout(x, self.dropout, ctx)
        lengths = (
            self.n_ctx
            + uih_lengths.astype(jnp.int32)
            + cand_lengths.astype(jnp.int32)
        )
        # timestamps ride along for positional/postprocessor encoding
        timestamps = None
        if uih_timestamps is not None:
            zeros_ctx = jnp.zeros((b, self.n_ctx), jnp.float32)
            cand_ts = (
                cand_timestamps.astype(jnp.float32)
                if cand_timestamps is not None
                else jnp.zeros((b, lc_max), jnp.float32)
            )
            ts_src = jnp.concatenate(
                [zeros_ctx, uih_timestamps.astype(jnp.float32), cand_ts],
                axis=1,
            )
            timestamps = compact_concat_2d(
                ts_src, self.n_ctx, lu_max, uih_lengths, cand_lengths
            )
        return x, lengths, cand_lengths.astype(jnp.int32), timestamps


class HSTUTransducer(M.Module):
    def __init__(
        self,
        preprocessor: ContextualPreprocessor,
        stack: STUStack,
        positional_encoder: Optional[PositionalEncoder] = None,
        postprocessor: Optional[OutputPostprocessor] = None,
        max_seq_len: int = 0,
        attn_truncation_split_layer: int = 0,
        attn_truncation_tail_len: int = 0,
    ) -> None:
        self.pre = preprocessor
        self.stack = stack
        self.pos = positional_encoder
        self.post = postprocessor
        self.max_seq_len = max_seq_len
        self.trunc_split = attn_truncation_split_layer
        self.trunc_tail = attn_truncation_tail_len

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        p = {"pre": self.pre.init(ks[0]), "stack": self.stack.init(ks[1])}
        if self.pos is not None:
            p["pos"] = self.pos.init(ks[2])
        if self.post is not None:
            p["post"] = self.post.init(ks[3])
        return p

    def __call__(
        self, params: M.Params, ctx: M.Context, **inputs: Any
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """-> (seq_out [B, N, E], lengths, num_targets)."""
        # per-row time-bias anchor (reference models/hstu.py query_time)
        time_anchor = inputs.pop("time_anchor", None)
        x, lengths, num_targets, timestamps = self.pre(
            params["pre"], ctx=ctx, **inputs
        )
        if self.pos is not None:
            x = self.pos(
                params["pos"], x, lengths, timestamps, ctx,
                anchor=time_anchor,
            )
        scaling = self.max_seq_len or x.shape[1]
        do_trunc = (
            0 < self.trunc_split < self.stack.num_layers
            and self.trunc_tail > 0
        )
        if do_trunc:
            x = self.stack(
                params["stack"], x, lengths, ctx, num_targets,
                scaling_seqlen=scaling, end=self.trunc_split,
            )
            cand = inputs.get("cand_emb")
            max_targets = cand.shape[1] if cand is not None else 0
            if self.pre.interleave_targets(ctx.training):
                max_targets *= 2
            x, lengths, (safe, valid) = truncate_uih(
                x, lengths, num_targets, self.trunc_tail,
                self.pre.n_ctx, max_targets,
            )
            if timestamps is not None:
                timestamps = jnp.take_along_axis(
                    timestamps, safe, axis=1
                ) * valid.astype(timestamps.dtype)
            x = self.stack(
                params["stack"], x, lengths, ctx, num_targets,
                scaling_seqlen=scaling, start=self.trunc_split,
            )
        else:
            x = self.stack(
                params["stack"], x, lengths, ctx, num_targets,
                scaling_seqlen=scaling,
            )
        if self.post is not None:
            x = self.post(params["post"], x, timestamps, ctx)
        return x, lengths, num_targets
