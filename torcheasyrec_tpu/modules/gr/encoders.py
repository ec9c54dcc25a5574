"""GR encoders: action / positional / postprocessors.

Counterparts of /root/reference/tzrec/modules/gr/{preprocessors.py
action/content encoders, positional encoders, postprocessors.py:54-131}.
"""

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M


class SimpleActionEncoder(M.Module):
    """Bitmask action weights -> summed per-action embeddings
    (reference gr/action_encoders; GRSimpleActionEncoder proto)."""

    def __init__(
        self,
        action_embedding_dim: int,
        action_weights: List[int],
        watchtime_to_action_thresholds: Optional[List[int]] = None,
        watchtime_to_action_weights: Optional[List[int]] = None,
        embedding_init_std: float = 0.1,
    ) -> None:
        self.d = action_embedding_dim
        self.action_weights = list(action_weights)
        self.wt_thresholds = list(watchtime_to_action_thresholds or [])
        self.wt_weights = list(watchtime_to_action_weights or [])
        self.std = embedding_init_std
        self.num_actions = len(self.action_weights) + len(self.wt_thresholds)

    def output_dim(self) -> int:
        return self.d * self.num_actions

    def init(self, key: jax.Array) -> M.Params:
        return {
            "emb": jax.random.normal(
                key, (self.num_actions, self.d), jnp.float32
            ) * self.std
        }

    def __call__(
        self,
        params: M.Params,
        action_weights: jnp.ndarray,  # [B, N] packed bitmask
        watchtimes: Optional[jnp.ndarray] = None,  # [B, N]
        ctx: Optional[M.Context] = None,
    ) -> jnp.ndarray:
        """-> [B, N, num_actions * d]: each action slot's embedding or 0."""
        aw = action_weights.astype(jnp.int32)
        flags = [
            (aw & jnp.int32(w)) > 0 for w in self.action_weights
        ]
        if self.wt_thresholds and watchtimes is not None:
            wt = watchtimes.astype(jnp.int32)
            flags += [wt >= t for t in self.wt_thresholds]
        elif self.wt_thresholds:
            flags += [jnp.zeros_like(aw, bool) for _ in self.wt_thresholds]
        onehot = jnp.stack(flags, axis=-1).astype(jnp.float32)  # [B,N,A]
        out = onehot[..., None] * params["emb"]  # [B, N, A, d]
        return out.reshape(*aw.shape, -1)


class PositionalEncoder(M.Module):
    """Learned position (+ log-bucketed time-delta) embeddings
    (reference gr/positional_encoder; GRPositionalEncoder proto)."""

    def __init__(
        self,
        embedding_dim: int,
        num_position_buckets: int,
        num_time_buckets: int = 0,
        use_time_encoding: bool = True,
    ) -> None:
        self.d = embedding_dim
        self.pos_buckets = num_position_buckets
        self.time_buckets = num_time_buckets
        self.use_time = use_time_encoding and num_time_buckets > 0

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        p = {
            "pos": jax.random.normal(
                k1, (self.pos_buckets, self.d), jnp.float32
            ) * 0.02
        }
        if self.use_time:
            p["time"] = jax.random.normal(
                k2, (self.time_buckets, self.d), jnp.float32
            ) * 0.02
        return p

    def __call__(
        self,
        params: M.Params,
        x: jnp.ndarray,  # [B, N, D]
        lengths: jnp.ndarray,
        timestamps: Optional[jnp.ndarray] = None,  # [B, N] unix secs
        ctx: Optional[M.Context] = None,
        anchor: Optional[jnp.ndarray] = None,  # [B] request time
    ) -> jnp.ndarray:
        b, n, d = x.shape
        # position measured from the sequence end (recent = low bucket),
        # matching the reference's high-position-bucket scheme
        pos = jnp.arange(n, dtype=jnp.int32)[None, :]
        rel = jnp.clip(
            lengths.astype(jnp.int32)[:, None] - 1 - pos, 0,
            self.pos_buckets - 1,
        )
        out = x + params["pos"][rel].astype(x.dtype)
        if self.use_time and timestamps is not None:
            ts = timestamps.astype(jnp.float32)
            if anchor is not None:
                # per-row request-time anchor (reference models/hstu.py
                # query_time group feeding the HSTU time bias)
                last_ts = anchor.astype(jnp.float32).reshape(b, 1)
            else:
                # delta vs the most recent event; log2 bucketing
                last_idx = jnp.maximum(lengths.astype(jnp.int32) - 1, 0)
                last_ts = jnp.take_along_axis(
                    ts, last_idx[:, None], axis=1
                )
            delta = jnp.maximum(last_ts - ts, 0.0)
            bucket = jnp.clip(
                jnp.floor(jnp.log2(delta + 1.0)).astype(jnp.int32),
                0, self.time_buckets - 1,
            )
            out = out + params["time"][bucket].astype(x.dtype)
        return out


class OutputPostprocessor(M.Module):
    """l2_norm | layer_norm | timestamp_layer_norm
    (reference gr/postprocessors.py:54-131)."""

    def __init__(self, kind: str, embedding_dim: int,
                 time_period_units: Optional[List[int]] = None) -> None:
        self.kind = kind
        self.d = embedding_dim
        self.time_units = list(time_period_units or [3600, 86400])

    def init(self, key: jax.Array) -> M.Params:
        if self.kind == "layer_norm":
            return {"ln": M.layer_norm_init(self.d)}
        if self.kind == "timestamp_layer_norm":
            extra = 2 * len(self.time_units)
            k1, k2 = jax.random.split(key)
            return {
                "ln": M.layer_norm_init(self.d),
                "time_mlp": M.linear_init(k1, extra, self.d),
            }
        return {}

    def __call__(
        self, params, x: jnp.ndarray,
        timestamps: Optional[jnp.ndarray] = None,
        ctx: Optional[M.Context] = None,
    ) -> jnp.ndarray:
        if self.kind == "l2_norm":
            return x * jax.lax.rsqrt(
                jnp.sum(jnp.square(x.astype(jnp.float32)), -1,
                        keepdims=True) + 1e-12
            ).astype(x.dtype)
        if self.kind == "layer_norm":
            return M.layer_norm_apply(params["ln"], x)
        if self.kind == "timestamp_layer_norm":
            y = M.layer_norm_apply(params["ln"], x)
            if timestamps is not None:
                ts = timestamps.astype(jnp.float32)
                feats = []
                for unit in self.time_units:
                    phase = 2 * jnp.pi * jnp.mod(ts, unit) / unit
                    feats += [jnp.sin(phase), jnp.cos(phase)]
                tfeat = jnp.stack(feats, axis=-1)
                y = y + M.linear_apply(
                    params["time_mlp"], tfeat,
                    ctx or M.Context(),
                ).astype(y.dtype)
            return y
        return x
