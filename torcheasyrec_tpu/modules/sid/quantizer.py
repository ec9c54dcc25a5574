"""Vector / residual quantizers for semantic-ID generation.

Counterpart of /root/reference/tzrec/modules/sid/ (1621 LoC: kmeans /
vector / residual quantizers used by models/sid_rqvae.py and
sid_rqkmeans.py). Straight-through-estimator and gumbel-softmax
forward modes; optional l2-normalized residuals and cosine distance.
"""

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M


def _pairwise_dist(x, codebook, distance_type: str):
    """[B, D] x [K, D] -> [B, K] distances (smaller = closer)."""
    if distance_type == "cosine":
        xn = x * jax.lax.rsqrt(
            jnp.sum(jnp.square(x), -1, keepdims=True) + 1e-12
        )
        cn = codebook * jax.lax.rsqrt(
            jnp.sum(jnp.square(codebook), -1, keepdims=True) + 1e-12
        )
        return 1.0 - jnp.dot(xn, cn.T, preferred_element_type=jnp.float32)
    # l2
    x2 = jnp.sum(jnp.square(x), -1, keepdims=True)
    c2 = jnp.sum(jnp.square(codebook), -1)
    return x2 + c2[None] - 2 * jnp.dot(
        x, codebook.T, preferred_element_type=jnp.float32
    )


def sinkhorn_assign(dist, iters: int = 5, epsilon: float = 10.0):
    """Balanced assignment via Sinkhorn iterations over -dist/eps
    (reference SinkhornConfig): returns soft assignment [B, K]."""
    log_p = -dist / epsilon
    b, k = dist.shape
    for _ in range(iters):
        log_p = log_p - jax.nn.logsumexp(log_p, axis=1, keepdims=True)
        log_p = log_p - jax.nn.logsumexp(log_p, axis=0, keepdims=True) \
            + jnp.log(jnp.float32(b) / k)
    return jnp.exp(log_p)


class VectorQuantizer(M.Module):
    def __init__(
        self,
        dim: int,
        codebook_size: int,
        forward_mode: str = "ste",  # ste | gumbel_softmax
        distance_type: str = "l2",
        sinkhorn_iters: int = 0,
        sinkhorn_epsilon: float = 10.0,
        rotation_trick: bool = False,
    ) -> None:
        self.dim = dim
        self.k = codebook_size
        self.forward_mode = forward_mode
        self.distance_type = distance_type
        self.sinkhorn_iters = sinkhorn_iters
        self.sinkhorn_epsilon = sinkhorn_epsilon
        self.rotation_trick = rotation_trick

    def init(self, key):
        return {
            "codebook": jax.random.normal(
                key, (self.k, self.dim), jnp.float32
            ) * (self.dim ** -0.5)
        }

    def __call__(self, params, x, ctx: M.Context):
        """x [B, D] -> (quantized [B, D], codes [B], dist [B, K])."""
        codebook = params["codebook"]
        dist = _pairwise_dist(
            x.astype(jnp.float32), codebook, self.distance_type
        )
        if ctx.training and self.sinkhorn_iters > 0:
            assign = sinkhorn_assign(
                dist, self.sinkhorn_iters, self.sinkhorn_epsilon
            )
            codes = jnp.argmax(assign, axis=-1)
        else:
            codes = jnp.argmin(dist, axis=-1)
        if self.forward_mode == "gumbel_softmax" and ctx.training:
            g = -jnp.log(-jnp.log(
                jax.random.uniform(ctx.next_rng(), dist.shape,
                                   minval=1e-9, maxval=1.0) + 1e-9
            ))
            soft = jax.nn.softmax((-dist + g) / 0.5, axis=-1)
            q = jnp.dot(soft, codebook, preferred_element_type=jnp.float32)
        else:
            hard = codebook[codes]
            # straight-through: grads flow to x
            q = x + jax.lax.stop_gradient(hard - x.astype(jnp.float32))
        return q.astype(x.dtype), codes, dist


class ResidualQuantizer(M.Module):
    """Stack of VQ layers over successive residuals."""

    def __init__(
        self,
        dim: int,
        codebook_sizes: List[int],
        forward_mode: str = "ste",
        distance_type: str = "l2",
        normalize_residuals: bool = False,
        sinkhorn_iters: int = 0,
        sinkhorn_epsilon: float = 10.0,
    ) -> None:
        self.dim = dim
        self.layers = [
            VectorQuantizer(
                dim, k, forward_mode, distance_type,
                sinkhorn_iters, sinkhorn_epsilon,
            )
            for k in codebook_sizes
        ]
        self.normalize_residuals = normalize_residuals

    def init(self, key):
        return {
            f"vq_{i}": vq.init(k)
            for i, (vq, k) in enumerate(
                zip(self.layers, M.split_keys(key, len(self.layers)))
            )
        }

    def __call__(self, params, x, ctx: M.Context):
        """-> (quantized [B, D], codes [B, L], per-level (residual, q))."""
        residual = x
        total_q = jnp.zeros_like(x)
        codes = []
        levels = []
        for i, vq in enumerate(self.layers):
            r_in = residual
            if self.normalize_residuals:
                r_in = r_in * jax.lax.rsqrt(
                    jnp.sum(jnp.square(r_in.astype(jnp.float32)), -1,
                            keepdims=True) + 1e-12
                ).astype(r_in.dtype)
            q, c, _ = vq(params[f"vq_{i}"], r_in, ctx)
            codes.append(c)
            levels.append((r_in, q))
            total_q = total_q + q
            residual = residual - jax.lax.stop_gradient(q)
        return total_q, jnp.stack(codes, axis=-1), levels
