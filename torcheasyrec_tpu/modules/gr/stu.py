"""STU layer / stack: the HSTU transformer core.

Counterpart of /root/reference/tzrec/modules/gr/stu.py (STULayer:217,
STUStack:644). Per layer (SURVEY.md §3.3 HSTU math):
LN -> fused uvqk projection (SiLU on u) -> pointwise-SiLU attention
(Pallas kernel) -> Norm(attn) * u -> output proj -> residual, with
jax.checkpoint rematerialization replacing the reference's
recompute_*_in_backward flags.
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.ops import Kernel
from torcheasyrec_tpu.ops.hstu import (
    delta_hstu_mha,
    hstu_compute_output,
    hstu_compute_uqvk,
    hstu_mha,
)


class STULayer(M.Module):
    def __init__(
        self,
        embedding_dim: int,
        linear_hidden_dim: int,
        attention_dim: int,
        num_heads: int = 1,
        max_attn_len: int = 0,
        output_dropout_ratio: float = 0.0,
        use_group_norm: bool = False,
        attn_alpha: float = 0.0,
        contextual_seq_len: int = 0,
        recompute: bool = True,
        recompute_y: bool = True,
        kernel: Kernel = Kernel.PALLAS,
        sla_k1: int = 0,
        sla_k2: int = 0,
    ) -> None:
        self.e = embedding_dim
        self.ld = linear_hidden_dim
        self.ad = attention_dim
        self.h = num_heads
        self.max_attn_len = max_attn_len
        self.dropout = output_dropout_ratio
        self.use_group_norm = use_group_norm
        self.alpha = attn_alpha or (attention_dim ** -0.5)
        self.contextual_seq_len = contextual_seq_len
        self.recompute = recompute
        self.recompute_y = recompute_y
        self.kernel = kernel
        self.sla_k1 = sla_k1
        self.sla_k2 = sla_k2

    def init(self, key: jax.Array) -> M.Params:
        h, ld, ad, e = self.h, self.ld, self.ad, self.e
        k1, k2 = jax.random.split(key)
        uvqk_out = h * ld * 2 + h * ad * 2
        return {
            "input_ln": M.layer_norm_init(e),
            "uvqk_w": jax.random.normal(k1, (e, uvqk_out), jnp.float32)
            * (e ** -0.5),
            "uvqk_b": jnp.zeros((uvqk_out,), jnp.float32),
            "output_ln": M.layer_norm_init(h * ld),
            "output_w": jax.random.normal(k2, (h * ld, e), jnp.float32)
            * ((h * ld) ** -0.5),
        }

    def __call__(
        self,
        params: M.Params,
        x: jnp.ndarray,  # [B, N, E]
        lengths: jnp.ndarray,  # [B]
        ctx: M.Context,
        num_targets: Optional[jnp.ndarray] = None,
        scaling_seqlen: int = -1,
    ) -> jnp.ndarray:
        # STAGE-WISE rematerialization, matching the reference's
        # recompute_{uvqk,normed_x,y}_in_backward flags (stu.py /
        # hstu_compute.py): the cheap projection/norm stages recompute in
        # backward, but the attention kernel's forward NEVER re-runs —
        # a whole-layer jax.checkpoint re-executed it and cost ~32 ms of
        # a 430 ms DLRM-HSTU step for activation savings the attention
        # custom-VJP (which stores q/k/v residuals anyway) can't realize.
        remat = self.recompute and ctx.training

        def uqvk_fn(x_in):
            return hstu_compute_uqvk(
                x_in,
                params["input_ln"]["scale"], params["input_ln"]["bias"],
                params["uvqk_w"], params["uvqk_b"],
                self.h, self.ld, self.ad,
            )

        if remat:
            uqvk_fn = jax.checkpoint(uqvk_fn)
        u, v, q, k = uqvk_fn(x)
        attn = hstu_mha(
            q, k, v, lengths,
            alpha=self.alpha,
            causal=True,
            num_targets=num_targets,
            max_attn_len=self.max_attn_len,
            contextual_seq_len=self.contextual_seq_len,
            scaling_seqlen=scaling_seqlen,
            kernel=self.kernel,
            sla_k1=self.sla_k1,
            sla_k2=self.sla_k2,
        )
        dropout_rng = (
            ctx.next_rng()
            if (ctx.training and self.dropout > 0) else None
        )

        def out_fn(attn_in, u_in, x_in):
            return hstu_compute_output(
                attn_in, u_in, x_in,
                params["output_ln"]["scale"], params["output_ln"]["bias"],
                params["output_w"],
                dropout_pr=self.dropout,
                dropout_rng=dropout_rng,
                training=ctx.training,
                group_norm=self.use_group_norm,
                num_heads=self.h,
                linear_dim=self.ld,
            )

        if self.recompute_y and ctx.training:
            out_fn = jax.checkpoint(out_fn)
        return out_fn(attn, u, x)

    def init_cache(self, b: int, n_max: int) -> Dict[str, jnp.ndarray]:
        """Per-layer KV cache for incremental inference (reference
        stu.py k_cache/v_cache/kv_caching_offsets)."""
        return {
            "k": jnp.zeros((b, n_max, self.h, self.ad), jnp.float32),
            "v": jnp.zeros((b, n_max, self.h, self.ld), jnp.float32),
        }

    def cached_forward(
        self,
        params: M.Params,
        x_new: jnp.ndarray,  # [B, Ld, E] NEW tokens only
        lengths: jnp.ndarray,  # [B] TOTAL valid tokens incl. the new
        cache: Dict[str, jnp.ndarray],
        ctx: M.Context,
        scaling_seqlen: int = -1,
        num_targets=None,
    ):
        """Incremental decode: only the Ld new tokens' q/k/v are
        computed; keys/values are scattered into the cache at
        [lengths - Ld, lengths) and the new queries attend the cached
        sequence (delta_hstu_mha). Returns (y_new, new_cache)."""
        ld_new = x_new.shape[1]
        u, v, q, k = hstu_compute_uqvk(
            x_new,
            params["input_ln"]["scale"], params["input_ln"]["bias"],
            params["uvqk_w"], params["uvqk_b"],
            self.h, self.ld, self.ad,
        )
        starts = (lengths.astype(jnp.int32) - ld_new)

        def _scatter(buf, new):
            return jax.vmap(
                lambda c, n_, s: jax.lax.dynamic_update_slice(
                    c, n_.astype(c.dtype), (s, 0, 0)
                )
            )(buf, new, starts)

        new_cache = {
            "k": _scatter(cache["k"], k),
            "v": _scatter(cache["v"], v),
        }
        attn = delta_hstu_mha(
            q, new_cache["k"].astype(q.dtype),
            new_cache["v"].astype(q.dtype), lengths,
            alpha=self.alpha,
            num_targets=num_targets,
            max_attn_len=self.max_attn_len,
            contextual_seq_len=self.contextual_seq_len,
            scaling_seqlen=scaling_seqlen,
            sla_k1=self.sla_k1,
            sla_k2=self.sla_k2,
        )
        y = hstu_compute_output(
            attn, u, x_new,
            params["output_ln"]["scale"], params["output_ln"]["bias"],
            params["output_w"],
            dropout_pr=0.0, dropout_rng=None, training=False,
            group_norm=self.use_group_norm,
            num_heads=self.h, linear_dim=self.ld,
        )
        return y, new_cache


class STUStack(M.Module):
    def __init__(self, layer: STULayer, num_layers: int) -> None:
        self.layer = layer
        self.num_layers = num_layers

    def init(self, key: jax.Array) -> M.Params:
        return {
            f"layer_{i}": self.layer.init(k)
            for i, k in enumerate(M.split_keys(key, self.num_layers))
        }

    def __call__(self, params, x, lengths, ctx, num_targets=None,
                 scaling_seqlen: int = -1, start: int = 0,
                 end: Optional[int] = None):
        for i in range(start, self.num_layers if end is None else end):
            x = self.layer(
                params[f"layer_{i}"], x, lengths, ctx, num_targets,
                scaling_seqlen,
            )
        return x


    def init_cache(self, b: int, n_max: int):
        return [
            self.layer.init_cache(b, n_max) for _ in range(self.num_layers)
        ]

    def cached_forward(self, params, x_new, lengths, caches, ctx,
                       scaling_seqlen: int = -1, num_targets=None):
        """Incremental decode through every layer, threading one KV
        cache per layer. Returns (y_new, new_caches)."""
        new_caches = []
        for i in range(self.num_layers):
            x_new, c = self.layer.cached_forward(
                params[f"layer_{i}"], x_new, lengths, caches[i], ctx,
                scaling_seqlen, num_targets=num_targets,
            )
            new_caches.append(c)
        return x_new, new_caches


def truncate_uih(
    x: jnp.ndarray,  # [B, N, E] = [ctx | uih | targets | pad]
    lengths: jnp.ndarray,  # [B] valid tokens incl. ctx + targets
    num_targets: Optional[jnp.ndarray],  # [B]
    tail_len: int,
    n_ctx: int,
    max_targets: int,
):
    """Attention truncation (reference module.proto HSTU
    attn_truncation_*): keep the contextual prefix, the LAST
    ``tail_len`` UIH tokens, and the targets, repacked contiguously
    into a shorter static width. Returns
    (x', lengths', (src_idx, valid)) — the gather applies identically
    to any aligned per-token tensor (e.g. timestamps)."""
    b, n, _ = x.shape
    t = (
        num_targets.astype(jnp.int32)
        if num_targets is not None
        else jnp.zeros((b,), jnp.int32)
    )
    h_bound = lengths.astype(jnp.int32) - t  # ctx + uih
    keep = jnp.minimum(jnp.maximum(h_bound - n_ctx, 0), tail_len)
    n_new = min(n, n_ctx + tail_len + max_targets)
    s = jnp.arange(n_new, dtype=jnp.int32)[None, :]  # [1, n']
    rel = s - n_ctx
    keep_b = keep[:, None]
    rel2 = rel - keep_b
    src = jnp.where(
        s < n_ctx, jnp.broadcast_to(s, (b, n_new)),
        jnp.where(
            rel < keep_b, h_bound[:, None] - keep_b + rel,
            jnp.where(rel2 < t[:, None], h_bound[:, None] + rel2, n),
        ),
    )
    valid = src < n
    safe = jnp.minimum(src, n - 1)
    x_new = jnp.take_along_axis(
        x, safe[..., None], axis=1
    ) * valid[..., None].astype(x.dtype)
    new_lengths = n_ctx + keep + t
    return x_new, new_lengths, (safe, valid)


def stu_from_config(cfg: Dict[str, Any], kernel=Kernel.PALLAS) -> STUStack:
    """Build from the STU proto's config_to_kwargs dict (module.proto STU)."""
    layer = STULayer(
        embedding_dim=int(cfg["embedding_dim"]),
        linear_hidden_dim=int(cfg["hidden_dim"]),
        attention_dim=int(cfg["attention_dim"]),
        num_heads=int(cfg.get("num_heads", 1) or 1),
        max_attn_len=int(cfg.get("max_attn_len", 0) or 0),
        output_dropout_ratio=float(cfg.get("output_dropout_ratio", 0.0)),
        use_group_norm=bool(cfg.get("use_group_norm", False)),
        attn_alpha=float(cfg.get("attn_alpha", 0.0) or 0.0),
        # reference sentinel: < 0 = derive from the input preprocessor
        contextual_seq_len=max(
            int(cfg.get("contextual_seq_len", 0) or 0), 0
        ),
        recompute=bool(cfg.get("recompute_uvqk", True)),
        recompute_y=bool(cfg.get("recompute_y", True)),
        kernel=kernel,
        sla_k1=int(cfg.get("sla_k1", 0) or 0),
        sla_k2=int(cfg.get("sla_k2", 0) or 0),
    )
    return STUStack(layer, int(cfg.get("num_layers", 1) or 1))
