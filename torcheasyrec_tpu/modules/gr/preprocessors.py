"""GR input preprocessors: content encoders, contextualized MLPs, the
interleave/sum preprocessor, and the UIH-only preprocessor.

Counterparts of /root/reference/tzrec/modules/gr/{content_encoder.py,
contextualize_mlps.py, preprocessors.py}. TPU-first: all paths operate
on padded static-shape [B, L, D] tensors; sequence assembly is the one
static gather in ``hstu_transducer.compact_concat``. Interleaving is a
stack+reshape (train) or a per-sample arithmetic gather (eval, where
targets stay single), never a jagged compaction kernel.

Factory parity (reference preprocessors.py:721-747):
  contextual_preprocessor            -> interleave class, interleaving OFF
  contextual_interleave_preprocessor -> interleave class, interleaving ON
  uih_preprocessor                   -> UIHPreprocessor
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.encoders import SimpleActionEncoder
from torcheasyrec_tpu.modules.mlp import mlp_from_config
from torcheasyrec_tpu.ops.norms import swish_layer_norm
from torcheasyrec_tpu.utils.config_util import config_to_kwargs


# ---------------------------------------------------------------------------
# content encoders (reference content_encoder.py:66-281)
# ---------------------------------------------------------------------------


class SliceContentEncoder(M.Module):
    """Slice candidate dims down to the uih dim
    (reference content_encoder.py:66)."""

    def __init__(self, uih_dim: int, cand_dim: int) -> None:
        if cand_dim < uih_dim:
            raise ValueError(
                f"slice_content_encoder needs cand_dim >= uih_dim "
                f"({cand_dim} < {uih_dim})"
            )
        self.uih_dim = uih_dim
        self.cand_dim = cand_dim

    def output_dim(self) -> int:
        return self.uih_dim

    def init(self, key: jax.Array) -> M.Params:
        return {}

    def __call__(self, params, uih_emb, cand_emb, ctx):
        return uih_emb, cand_emb[..., : self.uih_dim]


class PadContentEncoder(M.Module):
    """Pad uih up to the candidate dim with a learnable enrich vector
    (reference content_encoder.py:133)."""

    def __init__(self, uih_dim: int, cand_dim: int) -> None:
        if cand_dim <= uih_dim:
            raise ValueError(
                f"pad_content_encoder needs cand_dim > uih_dim "
                f"({cand_dim} <= {uih_dim})"
            )
        self.uih_dim = uih_dim
        self.cand_dim = cand_dim

    def output_dim(self) -> int:
        return self.cand_dim

    def init(self, key: jax.Array) -> M.Params:
        return {
            "enrich": 0.1 * jax.random.normal(
                key, (self.cand_dim - self.uih_dim,), jnp.float32
            )
        }

    def __call__(self, params, uih_emb, cand_emb, ctx):
        b, lu, _ = uih_emb.shape
        pad = jnp.broadcast_to(
            params["enrich"].astype(uih_emb.dtype),
            (b, lu, self.cand_dim - self.uih_dim),
        )
        return jnp.concatenate([uih_emb, pad], axis=-1), cand_emb


class MLPContentEncoder(M.Module):
    """Separate uih/target MLPs onto a common dim
    (reference content_encoder.py:209)."""

    def __init__(self, uih_dim: int, cand_dim: int,
                 uih_mlp: dict, target_mlp: dict) -> None:
        self.uih_mlp = mlp_from_config(uih_dim, uih_mlp)
        self.target_mlp = mlp_from_config(cand_dim, target_mlp)
        if self.uih_mlp.output_dim() != self.target_mlp.output_dim():
            raise ValueError(
                "mlp_content_encoder: uih_mlp and target_mlp output "
                "dims must match"
            )

    def output_dim(self) -> int:
        return self.uih_mlp.output_dim()

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = M.split_keys(key, 2)
        return {"uih": self.uih_mlp.init(k1),
                "target": self.target_mlp.init(k2)}

    def __call__(self, params, uih_emb, cand_emb, ctx):
        return (
            self.uih_mlp(params["uih"], uih_emb, ctx, "ce_uih"),
            self.target_mlp(params["target"], cand_emb, ctx, "ce_target"),
        )


def content_encoder_from_config(cfg, uih_dim: int, cand_dim: int):
    which = cfg.WhichOneof("content_encoder")
    if which == "slice_content_encoder":
        return SliceContentEncoder(uih_dim, cand_dim)
    if which == "pad_content_encoder":
        return PadContentEncoder(uih_dim, cand_dim)
    if which == "mlp_content_encoder":
        mc = cfg.mlp_content_encoder
        return MLPContentEncoder(
            uih_dim, cand_dim,
            config_to_kwargs(mc.uih_mlp), config_to_kwargs(mc.target_mlp),
        )
    raise ValueError(f"unknown content encoder: {which}")


# ---------------------------------------------------------------------------
# contextualized MLPs (reference contextualize_mlps.py:53-196)
# ---------------------------------------------------------------------------


class SimpleContextualizedMLP(M.Module):
    """Linear -> SwishLayerNorm -> Linear -> LayerNorm, applied per
    token; ignores the contextual input (reference :53)."""

    def __init__(self, in_dim: int, out_dim: int, hidden_dim: int) -> None:
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.hidden = hidden_dim

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = M.split_keys(key, 2)
        return {
            "l1": M.linear_init(k1, self.in_dim, self.hidden),
            "sln": M.layer_norm_init(self.hidden),
            "l2": M.linear_init(k2, self.hidden, self.out_dim),
            "ln": M.layer_norm_init(self.out_dim),
        }

    def __call__(self, params, x, contextual_raw, ctx):
        h = M.linear_apply(params["l1"], x, ctx)
        h = swish_layer_norm(
            h, params["sln"]["scale"], params["sln"]["bias"]
        )
        y = M.linear_apply(params["l2"], h, ctx)
        return M.layer_norm_apply(params["ln"], y)


class ParameterizedContextualizedMLP(M.Module):
    """Per-sample weights/bias generated from the contextual features
    (reference :106): y = x @ W(ctx) + b(ctx)."""

    def __init__(self, ctx_dim: int, in_dim: int, out_dim: int,
                 hidden_dim: int, contextual_dropout_ratio: float = 0.3
                 ) -> None:
        self.ctx_dim = ctx_dim
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.hidden = hidden_dim
        self.ctx_dropout = contextual_dropout_ratio

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        return {
            "compress": M.linear_init(ks[0], self.ctx_dim, self.hidden),
            "raw_w": M.linear_init(
                ks[1], self.hidden, self.in_dim * self.out_dim
            ),
            # LayerNorm over the [in, out] weight matrix jointly
            # (torch nn.LayerNorm([in, out]))
            "w_norm": {
                "scale": jnp.ones((self.in_dim, self.out_dim), jnp.float32),
                "bias": jnp.zeros((self.in_dim, self.out_dim), jnp.float32),
            },
            "res1": M.linear_init(ks[2], self.hidden, self.hidden),
            "res_sln": M.layer_norm_init(self.hidden),
            "res2": M.linear_init(ks[3], self.hidden, self.out_dim),
        }

    def _weights(self, params, contextual_raw, ctx):
        c = M.dropout(contextual_raw, self.ctx_dropout, ctx)
        shared = M.linear_apply(params["compress"], c, ctx)  # [B, H]
        w = M.linear_apply(params["raw_w"], shared, ctx).reshape(
            -1, self.in_dim, self.out_dim
        )
        mu = jnp.mean(w.astype(jnp.float32), axis=(1, 2), keepdims=True)
        var = jnp.var(w.astype(jnp.float32), axis=(1, 2), keepdims=True)
        w = (w.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
        w = w * params["w_norm"]["scale"] + params["w_norm"]["bias"]
        r = M.linear_apply(params["res1"], shared, ctx)
        r = swish_layer_norm(
            r, params["res_sln"]["scale"], params["res_sln"]["bias"]
        )
        bias = M.linear_apply(params["res2"], r, ctx)  # [B, out]
        return w.astype(contextual_raw.dtype), bias

    def __call__(self, params, x, contextual_raw, ctx):
        if contextual_raw is None:
            raise ValueError(
                "parameterized_mlp requires contextual features"
            )
        w, bias = self._weights(params, contextual_raw, ctx)
        y = jnp.einsum(
            "bli,bio->blo", x, w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        return y + bias[:, None, :].astype(x.dtype)


def contextualized_mlp_from_config(cfg, ctx_dim: int, in_dim: int,
                                   out_dim: int):
    which = cfg.WhichOneof("contextualized_mlp")
    if which == "simple_mlp":
        return SimpleContextualizedMLP(
            in_dim, out_dim, int(cfg.simple_mlp.hidden_dim)
        )
    if which == "parameterized_mlp":
        pm = cfg.parameterized_mlp
        return ParameterizedContextualizedMLP(
            ctx_dim, in_dim, out_dim, int(pm.hidden_dim),
            float(pm.contextual_dropout_ratio),
        )
    raise ValueError(f"unknown contextualized mlp: {which}")


# ---------------------------------------------------------------------------
# interleave helpers
# ---------------------------------------------------------------------------


def interleave_tokens(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[B, L, E] x2 -> [B, 2L, E] as a0 b0 a1 b1 ..."""
    bsz, length, e = a.shape
    return jnp.stack([a, b], axis=2).reshape(bsz, 2 * length, e)


def repeat2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, 2L] repeating each step twice."""
    b, length = x.shape
    return jnp.repeat(x, 2, axis=1)


# ---------------------------------------------------------------------------
# preprocessors
# ---------------------------------------------------------------------------


class ContextualInterleavePreprocessor(M.Module):
    """Content/action two-path preprocessor (reference
    preprocessors.py:93). With ``enable_interleaving`` every history
    step becomes [content_token, action_token] (targets too during
    training); without it the two paths are summed per step. Targets
    carry a learnable target-action embedding (reference
    action_encoder.py:119-121)."""

    def __init__(
        self,
        embedding_dim: int,
        uih_content_dim: int,
        cand_content_dim: int,
        content_encoder: M.Module,
        content_mlp_cfg,
        contextual_dim: int = 0,
        n_contextual_tokens: int = 0,
        action_encoder: Optional[SimpleActionEncoder] = None,
        action_mlp_cfg=None,
        enable_interleaving: bool = True,
        input_dropout_ratio: float = 0.0,
    ) -> None:
        self.e = embedding_dim
        self.uih_dim = uih_content_dim
        self.cand_dim = cand_content_dim
        self.ctx_dim = contextual_dim
        self.n_ctx = n_contextual_tokens if contextual_dim > 0 else 0
        self.content_encoder = content_encoder
        self.content_mlp = contextualized_mlp_from_config(
            content_mlp_cfg, contextual_dim,
            content_encoder.output_dim(), embedding_dim,
        )
        self.action_encoder = action_encoder
        self.action_mlp = None
        if action_encoder is not None:
            if action_mlp_cfg is None or not action_mlp_cfg.WhichOneof(
                "contextualized_mlp"
            ):
                raise ValueError(
                    "action_mlp must be set when action_encoder is set"
                )
            self.action_mlp = contextualized_mlp_from_config(
                action_mlp_cfg, contextual_dim,
                action_encoder.output_dim(), embedding_dim,
            )
        if enable_interleaving and action_encoder is None:
            raise ValueError(
                "enable_interleaving requires an action_encoder"
            )
        self.enable_interleaving = enable_interleaving
        self.dropout = input_dropout_ratio

    # model-side layout contract ------------------------------------
    def interleave_targets(self, training: bool) -> bool:
        return bool(training and self.enable_interleaving)

    def uih_multiplier(self) -> int:
        return 2 if self.enable_interleaving else 1

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 5)
        p = {
            "content_encoder": self.content_encoder.init(ks[0]),
            "content_mlp": self.content_mlp.init(ks[1]),
        }
        if self.n_ctx:
            p["ctx_proj"] = M.linear_init(
                ks[2], self.ctx_dim, self.n_ctx * self.e
            )
        if self.action_encoder is not None:
            p["action"] = self.action_encoder.init(ks[3])
            p["action_mlp"] = self.action_mlp.init(ks[4])
            p["target_action"] = 0.1 * jax.random.normal(
                jax.random.fold_in(ks[3], 1),
                (self.action_encoder.output_dim(),), jnp.float32,
            )
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
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Any]:
        """-> (x [B, N, E], lengths [B], num_targets [B], timestamps)."""
        from torcheasyrec_tpu.modules.gr.hstu_transducer import (
            compact_concat,
            compact_concat_2d,
        )

        b, lu_max, _ = uih_emb.shape
        lc_max = cand_emb.shape[1]
        lu = uih_lengths.astype(jnp.int32)
        lc = cand_lengths.astype(jnp.int32)

        u_c, c_c = self.content_encoder(
            params["content_encoder"], uih_emb, cand_emb, ctx
        )
        content_u = self.content_mlp(
            params["content_mlp"], u_c, contextual_emb, ctx
        )
        content_c = self.content_mlp(
            params["content_mlp"], c_c, contextual_emb, ctx
        )

        action_u = action_c = None
        if self.action_encoder is not None:
            aw = (
                action_weights
                if action_weights is not None
                else jnp.zeros((b, lu_max), jnp.int32)
            )
            a_u = self.action_encoder(params["action"], aw, watchtimes, ctx)
            a_c = jnp.broadcast_to(
                params["target_action"].astype(a_u.dtype),
                (b, lc_max, a_u.shape[-1]),
            )
            action_u = self.action_mlp(
                params["action_mlp"], a_u.astype(content_u.dtype),
                contextual_emb, ctx,
            )
            action_c = self.action_mlp(
                params["action_mlp"], a_c.astype(content_c.dtype),
                contextual_emb, ctx,
            )

        if self.enable_interleaving:
            u_tok = interleave_tokens(content_u, action_u)
            out_lu = 2 * lu
            ts_u = (
                repeat2(uih_timestamps.astype(jnp.float32))
                if uih_timestamps is not None else None
            )
            if self.interleave_targets(ctx.training):
                c_tok = interleave_tokens(content_c, action_c)
                num_targets = 2 * lc
                ts_c_width = 2 * lc_max
                ts_c = (
                    repeat2(cand_timestamps.astype(jnp.float32))
                    if cand_timestamps is not None else None
                )
            else:
                c_tok = content_c
                num_targets = lc
                ts_c_width = lc_max
                ts_c = (
                    cand_timestamps.astype(jnp.float32)
                    if cand_timestamps is not None else None
                )
        else:
            u_tok = (
                content_u + action_u
                if action_u is not None else content_u
            )
            c_tok = (
                content_c + action_c
                if action_c is not None else content_c
            )
            out_lu = lu
            num_targets = lc
            ts_c_width = lc_max
            ts_u = (
                uih_timestamps.astype(jnp.float32)
                if uih_timestamps is not None else None
            )
            ts_c = (
                cand_timestamps.astype(jnp.float32)
                if cand_timestamps is not None else None
            )

        pieces = [u_tok, c_tok]
        if self.n_ctx and contextual_emb is not None:
            ctx_tok = M.linear_apply(
                params["ctx_proj"], contextual_emb, ctx
            ).reshape(b, self.n_ctx, self.e)
            pieces = [ctx_tok] + pieces
        src = jnp.concatenate(pieces, axis=1)
        x = compact_concat(
            src, self.n_ctx, u_tok.shape[1], out_lu, num_targets
        )
        x = M.dropout(x, self.dropout, ctx)
        lengths = self.n_ctx + out_lu + num_targets

        timestamps = None
        if ts_u is not None:
            zeros_ctx = jnp.zeros((b, self.n_ctx), jnp.float32)
            if ts_c is None:
                ts_c = jnp.zeros((b, ts_c_width), jnp.float32)
            ts_src = jnp.concatenate([zeros_ctx, ts_u, ts_c], axis=1)
            timestamps = compact_concat_2d(
                ts_src, self.n_ctx, u_tok.shape[1], out_lu, num_targets
            )
        return x, lengths, num_targets, timestamps


class UIHPreprocessor(M.Module):
    """UIH-only preprocessor (reference preprocessors.py:484): projects
    the history to the STU dim, optionally sums per-step action-MLP
    embeddings, prepends contextual tokens; num_targets = 0."""

    def __init__(
        self,
        embedding_dim: int,
        uih_content_dim: int,
        contextual_dim: int = 0,
        n_contextual_tokens: int = 0,
        action_encoder: Optional[SimpleActionEncoder] = None,
        action_mlp_cfg=None,
        input_dropout_ratio: float = 0.0,
    ) -> None:
        self.e = embedding_dim
        self.uih_dim = uih_content_dim
        self.ctx_dim = contextual_dim
        self.n_ctx = n_contextual_tokens if contextual_dim > 0 else 0
        self.action_encoder = action_encoder
        self.action_mlp = None
        if action_encoder is not None:
            if action_mlp_cfg is None or not action_mlp_cfg.WhichOneof(
                "contextualized_mlp"
            ):
                raise ValueError(
                    "action_mlp must be set when action_encoder is set"
                )
            self.action_mlp = contextualized_mlp_from_config(
                action_mlp_cfg, contextual_dim,
                action_encoder.output_dim(), embedding_dim,
            )
        self.enable_interleaving = False
        self.dropout = input_dropout_ratio

    def interleave_targets(self, training: bool) -> bool:
        return False

    def uih_multiplier(self) -> int:
        return 1

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        p = {"proj": M.linear_init(ks[0], self.uih_dim, self.e)}
        if self.n_ctx:
            p["ctx_proj"] = M.linear_init(
                ks[1], self.ctx_dim, self.n_ctx * self.e
            )
        if self.action_encoder is not None:
            p["action"] = self.action_encoder.init(ks[2])
            p["action_mlp"] = self.action_mlp.init(ks[3])
        return p

    def __call__(
        self,
        params: M.Params,
        uih_emb: jnp.ndarray,
        uih_lengths: jnp.ndarray,
        ctx: M.Context,
        contextual_emb: Optional[jnp.ndarray] = None,
        action_weights: Optional[jnp.ndarray] = None,
        watchtimes: Optional[jnp.ndarray] = None,
        uih_timestamps: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, Any]:
        from torcheasyrec_tpu.modules.gr.hstu_transducer import (
            compact_concat,
            compact_concat_2d,
        )

        b, lu_max, _ = uih_emb.shape
        lu = uih_lengths.astype(jnp.int32)
        x_u = M.linear_apply(params["proj"], uih_emb, ctx)
        if self.action_encoder is not None and action_weights is not None:
            a_u = self.action_encoder(
                params["action"], action_weights, watchtimes, ctx
            )
            x_u = x_u + self.action_mlp(
                params["action_mlp"], a_u.astype(x_u.dtype),
                contextual_emb, ctx,
            )
        if self.n_ctx and contextual_emb is not None:
            ctx_tok = M.linear_apply(
                params["ctx_proj"], contextual_emb, ctx
            ).reshape(b, self.n_ctx, self.e)
            x = jnp.concatenate([ctx_tok, x_u], axis=1)
        else:
            x = x_u
        x = M.dropout(x, self.dropout, ctx)
        lengths = self.n_ctx + lu
        num_targets = jnp.zeros_like(lu)
        timestamps = None
        if uih_timestamps is not None:
            zeros_ctx = jnp.zeros((b, self.n_ctx), jnp.float32)
            timestamps = jnp.concatenate(
                [zeros_ctx, uih_timestamps.astype(jnp.float32)], axis=1
            )
        return x, lengths, num_targets, timestamps


# ---------------------------------------------------------------------------
# factory (reference preprocessors.py:721-747)
# ---------------------------------------------------------------------------


def _action_encoder_from_config(cfg) -> Optional[SimpleActionEncoder]:
    if cfg is None or not cfg.WhichOneof("action_encoder"):
        return None
    ac = cfg.simple_action_encoder
    return SimpleActionEncoder(
        action_embedding_dim=int(ac.action_embedding_dim or 8),
        action_weights=list(ac.action_weights) or [1],
        watchtime_to_action_thresholds=list(
            ac.watchtime_to_action_thresholds
        ),
        watchtime_to_action_weights=list(ac.watchtime_to_action_weights),
        embedding_init_std=float(ac.embedding_init_std or 0.1),
    )


def preprocessor_from_config(
    pre_cfg,  # GRInputPreprocessor
    embedding_dim: int,
    uih_content_dim: int,
    cand_content_dim: int,
    contextual_dim: int = 0,
    n_contextual_tokens: int = 0,
    input_dropout_ratio: float = 0.0,
):
    """Build the configured preprocessor; None when no oneof is set."""
    which = pre_cfg.WhichOneof("input_preprocessor") if pre_cfg else None
    if which is None:
        return None
    pcfg = getattr(pre_cfg, which)
    if which == "uih_preprocessor":
        return UIHPreprocessor(
            embedding_dim=embedding_dim,
            uih_content_dim=uih_content_dim,
            contextual_dim=contextual_dim,
            n_contextual_tokens=n_contextual_tokens,
            action_encoder=_action_encoder_from_config(
                pcfg.action_encoder if pcfg.HasField("action_encoder")
                else None
            ),
            action_mlp_cfg=pcfg.action_mlp
            if pcfg.HasField("action_mlp") else None,
            input_dropout_ratio=input_dropout_ratio,
        )
    enable_interleaving = which == "contextual_interleave_preprocessor" and (
        not pcfg.HasField("enable_interleaving")
        or bool(pcfg.enable_interleaving)
    )
    content_encoder = content_encoder_from_config(
        pcfg.content_encoder, uih_content_dim, cand_content_dim
    )
    return ContextualInterleavePreprocessor(
        embedding_dim=embedding_dim,
        uih_content_dim=uih_content_dim,
        cand_content_dim=cand_content_dim,
        content_encoder=content_encoder,
        content_mlp_cfg=pcfg.content_mlp,
        contextual_dim=contextual_dim,
        n_contextual_tokens=n_contextual_tokens,
        action_encoder=_action_encoder_from_config(
            pcfg.action_encoder if pcfg.HasField("action_encoder")
            else None
        ),
        action_mlp_cfg=pcfg.action_mlp
        if pcfg.HasField("action_mlp") else None,
        enable_interleaving=enable_interleaving,
        input_dropout_ratio=input_dropout_ratio,
    )
