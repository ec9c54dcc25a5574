"""HSTU core ops: uvqk projection, pointwise-nonlinear attention, output.

Counterpart of /root/reference/tzrec/ops/{hstu_compute.py,
hstu_attention.py, _pytorch/pt_hstu_attention.py}. TPU-first layout:
sequences are PADDED dense ``[B, N, ...]`` with per-sample ``lengths``
(the Batch is already padded/bucketed; no jagged<->dense conversions),
masks reproduce the reference's `_get_valid_attn_mask`
(pt_hstu_attention.py:23-75) exactly: causal + local window
(max_attn_len, with min_full_attn_seq_len escape), contextual prefix,
and target-token isolation (num_targets).

HSTU attention is softmax-free: attn = SiLU(q.k^T * alpha)/scaling_seqlen,
so the Pallas kernel (ops/pallas/hstu_attention.py) is a pure blockwise
accumulation without flash rescaling.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.ops import Kernel, normalize_kernel


def valid_attn_mask(
    n: int,
    lengths: jnp.ndarray,  # [B]
    causal: bool = True,
    num_targets: Optional[jnp.ndarray] = None,  # [B]
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    sla_k1: int = 0,
    sla_k2: int = 0,
    row_pos: Optional[jnp.ndarray] = None,  # [B, R] row subset
) -> jnp.ndarray:
    """[B, N, N] bool mask (reference pt_hstu_attention.py:23-75), or
    [B, R, N] when ``row_pos`` selects a row subset (the cached/delta
    path computes only its Ld rows instead of the full N x N mask).

    When sla_k1 or sla_k2 > 0, Semi-Local Attention REPLACES the
    standard causal mask (reference hstu_attention_utils.py
    build_sla_func_tensor:26-130): history rows attend to the global
    prefix [0, min(eff_k2, pos+1)) plus the local causal window
    [max(eff_k2, pos - k1 + 1), pos + 1) where
    eff_k2 = max(sla_k2, contextual_seq_len); target rows attend to
    all history only.

    Rows >= length are masked like columns: padded rows output ZEROS
    (not unspecified values) and contribute nothing to gradients. The
    Pallas kernel (ops/pallas/hstu_attention.py) relies on this
    contract for its jagged-equivalent loop bounds.
    """
    b = lengths.shape[0]
    if row_pos is None:
        rows = jnp.arange(n, dtype=jnp.int32)[None, :, None]  # [1, N, 1]
    else:
        rows = row_pos.astype(jnp.int32)[:, :, None]  # [B, R, 1]
    cols = jnp.arange(n, dtype=jnp.int32)[None, None, :]  # [1, 1, N]
    len_b = lengths.astype(jnp.int32).reshape(b, 1, 1)
    col_valid = (cols < len_b) & (rows < len_b)

    if sla_k1 > 0 or sla_k2 > 0:
        eff_k2 = max(sla_k2, contextual_seq_len)
        t = (
            num_targets.astype(jnp.int32).reshape(b, 1, 1)
            if num_targets is not None
            else jnp.zeros((b, 1, 1), jnp.int32)
        )
        h_bound = jnp.maximum(len_b - t, 0)
        hist = (cols < jnp.minimum(eff_k2, rows + 1)) | (
            (cols >= jnp.maximum(eff_k2, rows - sla_k1 + 1))
            & (cols <= rows)
        )
        tgt = cols < h_bound
        mask = jnp.where(rows < h_bound, hist, tgt)
        return jnp.broadcast_to(mask & col_valid, (b, rows.shape[1], n))

    ids_r, ids_c = rows, cols
    max_ids = len_b
    if contextual_seq_len > 0:
        ids_r = jnp.maximum(ids_r - contextual_seq_len + 1, 0)
        ids_c = jnp.maximum(ids_c - contextual_seq_len + 1, 0)
        max_ids = max_ids - contextual_seq_len + 1
    if num_targets is not None:
        max_ids = max_ids - num_targets.astype(jnp.int32).reshape(b, 1, 1)
        ids_r = jnp.minimum(ids_r, max_ids)
        ids_c = jnp.minimum(ids_c, max_ids)
    dist = ids_r - ids_c
    if not causal:
        dist = jnp.abs(dist)
    mask = (rows == cols) | (dist > 0)
    if max_attn_len > 0:
        if min_full_attn_seq_len > 0:
            mask = mask & (
                (dist <= max_attn_len)
                | (ids_r >= max_ids - min_full_attn_seq_len)
            )
        else:
            mask = mask & (dist <= max_attn_len)
    if contextual_seq_len > 0:
        mask = mask | ((ids_r == 0) & (ids_c < max_ids))
    mask = mask & col_valid
    return jnp.broadcast_to(mask, (b, rows.shape[1], n))


def hstu_mha(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,  # [B, N, H, D]
    v: jnp.ndarray,  # [B, N, H, V]
    lengths: jnp.ndarray,  # [B]
    alpha: float,
    causal: bool = True,
    num_targets: Optional[jnp.ndarray] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    min_full_attn_seq_len: int = 0,
    scaling_seqlen: int = -1,
    dropout_pr: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    kernel: Kernel = Kernel.PALLAS,
    sla_k1: int = 0,
    sla_k2: int = 0,
) -> jnp.ndarray:
    """Pointwise-nonlinear attention (reference pt_hstu_attention.py:174-236).

    Returns [B, N, H, V]."""
    kernel = normalize_kernel(kernel)
    n = q.shape[1]
    if scaling_seqlen == -1:
        scaling_seqlen = n
    if (
        kernel == Kernel.PALLAS
        and dropout_pr == 0.0
        and jax.default_backend() == "tpu"
    ):
        # non-TPU backends compile the XLA reference (CPU CI exercises
        # the kernel itself through interpret-mode tests instead)
        from torcheasyrec_tpu.ops.pallas.hstu_attention import (
            pallas_hstu_mha,
        )

        # the kernel tiles N in 128-row blocks; pad ragged N up rather
        # than fall back — the XLA path materializes [B, H, N, N]
        # score/mask buffers whose backward is catastrophically
        # HBM-bound at long N (measured 337 ms of a 430 ms DLRM-HSTU
        # step at N=4017 before this pad). Padded tail tokens sit past
        # every sample's length, so the in-kernel masks drop them.
        pad = (-n) % 128 if n >= 128 else 128 - n
        if pad:
            cfg_pad = [(0, 0), (0, pad), (0, 0), (0, 0)]
            q = jnp.pad(q, cfg_pad)
            k = jnp.pad(k, cfg_pad)
            v = jnp.pad(v, cfg_pad)
        try:
            out = pallas_hstu_mha(
                q, k, v, lengths,
                alpha=alpha, causal=causal, num_targets=num_targets,
                max_attn_len=max_attn_len,
                contextual_seq_len=contextual_seq_len,
                min_full_attn_seq_len=min_full_attn_seq_len,
                scaling_seqlen=scaling_seqlen,
                sla_k1=sla_k1, sla_k2=sla_k2,
            )
            return out[:, :n] if pad else out
        except NotImplementedError:
            if pad:
                q, k, v = q[:, :n], k[:, :n], v[:, :n]
            # fall back to the XLA path
    return _jax_hstu_mha(
        q, k, v, lengths, alpha, causal, num_targets, max_attn_len,
        contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
        dropout_pr, dropout_rng, sla_k1, sla_k2,
    )


def _jax_hstu_mha(
    q, k, v, lengths, alpha, causal, num_targets, max_attn_len,
    contextual_seq_len, min_full_attn_seq_len, scaling_seqlen,
    dropout_pr=0.0, dropout_rng=None, sla_k1=0, sla_k2=0,
):
    n = q.shape[1]
    qk = jnp.einsum(
        "bxhd,byhd->bhxy", q, k, preferred_element_type=jnp.float32
    ) * alpha
    attn = jax.nn.silu(qk) / scaling_seqlen
    mask = valid_attn_mask(
        n, lengths, causal, num_targets, max_attn_len, contextual_seq_len,
        min_full_attn_seq_len, sla_k1=sla_k1, sla_k2=sla_k2,
    )
    attn = attn * mask[:, None].astype(attn.dtype)
    if dropout_pr > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1 - dropout_pr, attn.shape)
        attn = jnp.where(keep, attn / (1 - dropout_pr), 0.0)
    out = jnp.einsum(
        "bhxy,byhv->bxhv", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def delta_hstu_mha(
    delta_q: jnp.ndarray,  # [B, Ld, H, D] — queries for NEW tokens only
    k: jnp.ndarray,  # [B, N, H, D] cached + new keys
    v: jnp.ndarray,  # [B, N, H, V]
    lengths: jnp.ndarray,  # [B] total valid tokens (incl. the new ones)
    alpha: float,
    num_targets: Optional[jnp.ndarray] = None,
    max_attn_len: int = 0,
    contextual_seq_len: int = 0,
    scaling_seqlen: int = -1,
    sla_k1: int = 0,
    sla_k2: int = 0,
) -> jnp.ndarray:
    """Cached/incremental attention (reference pt_hstu_attention.py
    pytorch_cached_hstu_mha :239-267, delta dispatch
    ops/hstu_attention.py:199-267): the Ld new tokens sit at positions
    [lengths - Ld, lengths); each attends causally over the cached
    sequence. Returns [B, Ld, H, V]."""
    b, ld, h, d = delta_q.shape
    n = k.shape[1]
    if scaling_seqlen == -1:
        scaling_seqlen = n
    qk = jnp.einsum(
        "bxhd,byhd->bhxy", delta_q, k, preferred_element_type=jnp.float32
    ) * alpha
    attn = jax.nn.silu(qk) / scaling_seqlen
    # row position of delta token x = lengths - Ld + x; only these Ld
    # mask rows are computed (O(Ld*N), not O(N^2) — matters for
    # one-token serving decode)
    row_pos = jnp.clip(
        lengths.astype(jnp.int32)[:, None] - ld
        + jnp.arange(ld, dtype=jnp.int32)[None, :],
        0, n - 1,
    )  # [B, Ld]
    mask = valid_attn_mask(
        n, lengths, True, num_targets, max_attn_len, contextual_seq_len, 0,
        sla_k1=sla_k1, sla_k2=sla_k2, row_pos=row_pos,
    )  # [B, Ld, N]
    attn = attn * mask[:, None].astype(attn.dtype)
    out = jnp.einsum(
        "bhxy,byhv->bxhv", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def hstu_compute_uqvk(
    x: jnp.ndarray,  # [B, N, E]
    norm_scale: jnp.ndarray,
    norm_bias: jnp.ndarray,
    uvqk_weight: jnp.ndarray,  # [E, (U + V + Q + K)]
    uvqk_bias: jnp.ndarray,
    num_heads: int,
    linear_dim: int,  # per-head u/v dim
    attn_dim: int,  # per-head q/k dim
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LayerNorm + fused uvqk projection + SiLU(u)
    (reference ops/hstu_compute.py:53-143). Returns (u, v, q, k):
    u,v [B, N, H*linear_dim]-shaped as [B, N, H, linear] for v; u stays
    flat for the output gate."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = ((xf - mean) * jax.lax.rsqrt(var + eps)) * norm_scale + norm_bias
    normed = normed.astype(x.dtype)
    uvqk = (
        jnp.einsum(
            "bne,ef->bnf", normed, uvqk_weight.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        + uvqk_bias
    ).astype(x.dtype)
    h, ld, ad = num_heads, linear_dim, attn_dim
    splits = [h * ld, 2 * h * ld, 2 * h * ld + h * ad]
    u, v, q, k = jnp.split(uvqk, splits, axis=-1)
    b, n = x.shape[0], x.shape[1]
    u = jax.nn.silu(u)
    v = v.reshape(b, n, h, ld)
    q = q.reshape(b, n, h, ad)
    k = k.reshape(b, n, h, ad)
    return u, v, q, k


def hstu_compute_output(
    attn: jnp.ndarray,  # [B, N, H, linear_dim]
    u: jnp.ndarray,  # [B, N, H*linear_dim]
    x: jnp.ndarray,  # [B, N, E] residual
    norm_scale: jnp.ndarray,
    norm_bias: jnp.ndarray,
    output_weight: jnp.ndarray,  # [H*linear (maybe *2 w/ concat_ux), E]
    dropout_pr: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    training: bool = False,
    concat_ux: bool = False,
    group_norm: bool = False,
    num_heads: int = 1,
    linear_dim: int = 0,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Norm(attn) * u -> output proj -> dropout -> residual
    (reference ops/hstu_compute.py:241-298)."""
    b, n = attn.shape[0], attn.shape[1]
    a = attn.reshape(b, n, -1).astype(jnp.float32)
    if group_norm:
        # per-head layer norm
        ah = a.reshape(b, n, num_heads, linear_dim)
        mean = jnp.mean(ah, axis=-1, keepdims=True)
        var = jnp.var(ah, axis=-1, keepdims=True)
        normed = (ah - mean) * jax.lax.rsqrt(var + eps)
        normed = normed.reshape(b, n, -1) * norm_scale + norm_bias
    else:
        mean = jnp.mean(a, axis=-1, keepdims=True)
        var = jnp.var(a, axis=-1, keepdims=True)
        normed = (a - mean) * jax.lax.rsqrt(var + eps) * norm_scale + norm_bias
    gated = normed.astype(u.dtype) * u
    if concat_ux:
        # reference concatenates [u, raw attn, normed*u]
        # (pt_hstu_linear.py:53-54) => output_weight is 3*H*linear wide
        gated = jnp.concatenate([u, a.astype(u.dtype), gated], axis=-1)
    # dropout on the gated features BEFORE the projection
    # (pt_hstu_linear.py:55-59; post-projection dropout is a different
    # regularizer since the matmul mixes features)
    if training and dropout_pr > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1 - dropout_pr, gated.shape
        )
        gated = jnp.where(
            keep, gated / (1 - dropout_pr), 0.0
        ).astype(gated.dtype)
    y = jnp.einsum(
        "bnf,fe->bne", gated, output_weight.astype(gated.dtype),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return x + y
