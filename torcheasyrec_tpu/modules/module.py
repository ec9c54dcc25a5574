"""Minimal pure-functional module system for the dense stack.

Design (TPU-first, not a torch port): a Module is a *configuration* object;
parameters live in plain nested-dict pytrees so the whole train step is a
pure jittable function and pjit/shard_map see every array. This replaces
torch.nn.Module in the reference (e.g. /root/reference/tzrec/modules/mlp.py)
with:

  - ``Module.init(key) -> params``  (nested dict of jnp arrays)
  - ``module(params, *inputs, ctx=Context(...)) -> outputs``  (pure)

Stochasticity (dropout) and train/eval mode are carried by an explicit
``Context``; batch-norm running-statistic updates are collected into
``ctx.state_updates`` and folded into the train state by the driver.
Mixed precision: ``ctx.compute_dtype`` (bf16 on TPU) is applied inside
linear layers with fp32 accumulation (``preferred_element_type``).
"""

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass
class Context:
    """Per-call context threaded through module applications."""

    training: bool = False
    rng: Optional[jax.Array] = None
    compute_dtype: Any = jnp.float32
    # collected mutable-state updates (e.g. batchnorm running stats),
    # keyed by state path
    state: Dict[str, Any] = dataclasses.field(default_factory=dict)
    state_updates: Dict[str, Any] = dataclasses.field(default_factory=dict)
    _rng_count: int = 0

    def next_rng(self) -> jax.Array:
        if self.rng is None:
            raise ValueError("Context.rng is required for stochastic modules")
        self._rng_count += 1
        return jax.random.fold_in(self.rng, self._rng_count)


def eval_ctx(compute_dtype=jnp.float32) -> Context:
    return Context(training=False, compute_dtype=compute_dtype)


class Module:
    """Base class; subclasses implement init() and __call__()."""

    def init(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def output_dim(self) -> int:
        """Flattened output feature dim (when meaningful)."""
        raise NotImplementedError


def split_keys(key: jax.Array, n: int):
    return list(jax.random.split(key, n))


# ---------------------------------------------------------------------------
# initializers — parse the reference's "nn.init.uniform_,a=-0.01" strings
# (/root/reference/tzrec/utils/init_util.py:98)
# ---------------------------------------------------------------------------


def parse_init_fn(spec: Optional[str]):
    """Return fn(key, shape, dtype) for a torch-style init spec string."""
    if not spec:
        return None
    parts = [p.strip() for p in spec.split(",")]
    name = parts[0].rsplit(".", 1)[-1].rstrip("_")
    kwargs = {}
    for p in parts[1:]:
        if "=" in p:
            k, v = p.split("=", 1)
            try:
                kwargs[k.strip()] = float(v)
            except ValueError:
                kwargs[k.strip()] = v.strip()

    def _init(key, shape, dtype=jnp.float32, fan_rows=None):
        # fan_rows: the TABLE's total rows when a big table is
        # generated in chunks (emb_engine._member_chunks) — fan-based
        # inits must scale by the table, not the chunk
        fan_in = fan_rows if fan_rows is not None else shape[0]
        fan_out = shape[1] if len(shape) > 1 else 1
        if name in ("uniform", "uniform_"):
            a = kwargs.get("a", 0.0)
            b = kwargs.get("b", 1.0)
            return jax.random.uniform(key, shape, dtype, minval=a, maxval=b)
        if name in ("normal", "normal_", "trunc_normal"):
            mean = kwargs.get("mean", 0.0)
            std = kwargs.get("std", 1.0)
            return mean + std * jax.random.normal(key, shape, dtype)
        if name in ("constant", "constant_"):
            return jnp.full(shape, kwargs.get("val", 0.0), dtype)
        if name in ("zeros", "zeros_"):
            return jnp.zeros(shape, dtype)
        if name in ("ones", "ones_"):
            return jnp.ones(shape, dtype)
        if name in ("xavier_uniform", "glorot_uniform"):
            lim = (6.0 / (fan_in + fan_out)) ** 0.5
            return jax.random.uniform(key, shape, dtype, minval=-lim,
                                      maxval=lim)
        if name in ("xavier_normal", "glorot_normal"):
            std = (2.0 / (fan_in + fan_out)) ** 0.5
            return std * jax.random.normal(key, shape, dtype)
        if name in ("kaiming_uniform", "he_uniform"):
            lim = (6.0 / fan_in) ** 0.5
            return jax.random.uniform(key, shape, dtype, minval=-lim,
                                      maxval=lim)
        if name in ("kaiming_normal", "he_normal"):
            std = (2.0 / fan_in) ** 0.5
            return std * jax.random.normal(key, shape, dtype)
        raise ValueError(f"unknown init fn {spec}")

    return _init


def default_emb_init(key, shape, dtype=jnp.float32, fan_rows=None):
    """TorchRec-style default embedding init: uniform(-1/sqrt(rows), ...).

    ``fan_rows`` overrides the row count used for the bound — the
    embedding engine generates big tables in CHUNKS (emb_engine.
    _member_chunks), and the bound must come from the TABLE's total
    rows, not the chunk's."""
    rows = fan_rows if fan_rows is not None else shape[0]
    bound = 1.0 / jnp.sqrt(jnp.maximum(rows, 1)).astype(jnp.float32)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# core layers
# ---------------------------------------------------------------------------


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    """Kaiming-uniform linear init matching torch.nn.Linear defaults."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / (in_dim ** 0.5)
    p = {
        "kernel": jax.random.uniform(
            kw, (in_dim, out_dim), jnp.float32, -bound, bound
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
    return p


def linear_apply(p: Params, x: jnp.ndarray, ctx: Context) -> jnp.ndarray:
    """y = x @ W + b computed in ctx.compute_dtype, fp32 accumulation."""
    dt = ctx.compute_dtype
    y = jnp.dot(
        x.astype(dt), p["kernel"].astype(dt), preferred_element_type=jnp.float32
    )
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(dt) if dt != jnp.float32 else y


def dropout(x: jnp.ndarray, rate: float, ctx: Context) -> jnp.ndarray:
    if (not ctx.training) or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(ctx.next_rng(), keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def batch_norm_init(dim: int) -> Params:
    return {
        "scale": jnp.ones((dim,), jnp.float32),
        "bias": jnp.zeros((dim,), jnp.float32),
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }


def batch_norm_apply(
    p: Params, x: jnp.ndarray, ctx: Context, path: str,
    momentum: float = 0.1, eps: float = 1e-5,
) -> jnp.ndarray:
    """BatchNorm1d; in training, batch stats are used and running-stat
    updates are collected in ctx.state_updates[path]."""
    xf = x.astype(jnp.float32)
    # normalize per channel over ALL leading axes so 3D [B, L, D] inputs
    # (DIN attn MLPs, Dice) keep [D]-shaped running stats (reference
    # Dice transposes to normalize over batch*positions)
    axes = tuple(range(x.ndim - 1))
    if ctx.training:
        mean = jnp.mean(xf, axis=axes)
        var = jnp.var(xf, axis=axes)
        ctx.state_updates[path] = {
            "mean": (1 - momentum) * p["mean"] + momentum * mean,
            "var": (1 - momentum) * p["var"] + momentum * var,
        }
    else:
        mean, var = p["mean"], p["var"]
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)
