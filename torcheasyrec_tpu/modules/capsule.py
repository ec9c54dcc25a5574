"""B2I capsule layer with dynamic routing (MIND).

Counterpart of /root/reference/tzrec/modules/capsule.py (CapsuleLayer:65):
behavior-to-interest capsules: squash + iterative routing over the user
history sequence, masked by sequence length; capsule count scales with
log2(history length) unless const_caps_num.
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M


def squash(x: jnp.ndarray, pow_: float = 1.0) -> jnp.ndarray:
    n2 = jnp.sum(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    scale = (n2 / (1.0 + n2)) ** pow_ * jax.lax.rsqrt(n2 + 1e-9)
    return (x * scale).astype(x.dtype)


class CapsuleLayer(M.Module):
    def __init__(
        self,
        input_dim: int,
        max_k: int = 5,
        max_seq_len: int = 64,
        high_dim: int = 64,
        num_iters: int = 3,
        routing_logits_scale: float = 20.0,
        routing_logits_stddev: float = 1.0,
        squash_pow: float = 1.0,
        const_caps_num: bool = False,
        **_: Any,
    ) -> None:
        self.input_dim = input_dim
        self.max_k = max_k
        self.max_seq_len = max_seq_len
        self.high_dim = high_dim
        self.num_iters = num_iters
        self.scale = routing_logits_scale
        self.stddev = routing_logits_stddev
        self.squash_pow = squash_pow
        self.const_caps_num = const_caps_num

    def output_dim(self) -> int:
        return self.high_dim * self.max_k

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "bilinear": jax.random.normal(
                k1, (self.input_dim, self.high_dim), jnp.float32
            ) * (self.input_dim ** -0.5),
            # fixed (non-trainable in routing) initial logits
            "routing_logits": jax.random.normal(
                k2, (self.max_k, self.max_seq_len), jnp.float32
            ) * self.stddev,
        }

    def __call__(self, params, seq, lengths, ctx: M.Context):
        """seq [B, L, D], lengths [B] -> (interests [B, K, high_dim],
        interest mask [B, K])."""
        b, L, _ = seq.shape
        u = jnp.einsum(
            "bld,dh->blh", seq,
            params["bilinear"].astype(ctx.compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(seq.dtype)  # low capsules mapped to high space
        valid = (
            jnp.arange(L, dtype=jnp.int32)[None, :]
            < lengths.astype(jnp.int32)[:, None]
        )  # [B, L]
        # active interest count: ~log2(len) capped at max_k
        if self.const_caps_num:
            k_num = jnp.full((b,), self.max_k, jnp.int32)
        else:
            k_num = jnp.clip(
                jnp.ceil(
                    jnp.log2(jnp.maximum(lengths.astype(jnp.float32), 1.0))
                ).astype(jnp.int32),
                1, self.max_k,
            )
        cap_mask = (
            jnp.arange(self.max_k, dtype=jnp.int32)[None, :] < k_num[:, None]
        )  # [B, K]

        logits = jnp.broadcast_to(
            params["routing_logits"][: self.max_k, :L][None],
            (b, self.max_k, L),
        )
        logits = jax.lax.stop_gradient(logits)
        u_detached = jax.lax.stop_gradient(u)
        neg = jnp.float32(-(2 ** 31) + 1)
        interests = None
        for it in range(self.num_iters):
            # scale applied once inside the softmax (reference
            # capsule.py); the accumulated logits stay raw
            masked = jnp.where(
                valid[:, None, :] & cap_mask[:, :, None],
                logits * self.scale, neg,
            )
            w = jax.nn.softmax(masked, axis=1)  # route each behavior
            # padded behaviors contribute zero (not uniform 1/K)
            w = w * valid[:, None, :].astype(w.dtype)
            last = it + 1 == self.num_iters
            # routing iterations use DETACHED low capsules (reference
            # detaches them); only the final read-out sees gradients
            u_in = u if last else u_detached
            s = jnp.einsum(
                "bkl,blh->bkh", w.astype(u_in.dtype), u_in,
                preferred_element_type=jnp.float32,
            ).astype(u.dtype)
            interests = squash(s, self.squash_pow)
            if not last:
                logits = logits + jnp.einsum(
                    "bkh,blh->bkl", jax.lax.stop_gradient(interests),
                    u_detached, preferred_element_type=jnp.float32,
                )
        return interests, cap_mask
