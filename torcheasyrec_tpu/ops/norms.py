"""Norm + addmm ops with kernel dispatch.

Counterparts of /root/reference/tzrec/ops/{layer_norm.py, addmm.py}
(L0 inventory, SURVEY.md §1): layer_norm, rms_norm, swish_layer_norm,
addmm. On TPU the JAX path already fuses into surrounding matmuls via
XLA; the PALLAS path exists for the large-sequence HSTU stack where a
single fused kernel avoids extra HBM round trips.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.ops import Kernel, normalize_kernel


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    kernel: Kernel = Kernel.JAX,
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def rms_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    kernel: Kernel = Kernel.JAX,
) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
    )
    if weight is not None:
        y = y * weight
    return y.astype(x.dtype)


def swish_layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
    kernel: Kernel = Kernel.JAX,
) -> jnp.ndarray:
    """x * sigmoid(LN(x)) (reference norm.py SwishLayerNorm)."""
    y = layer_norm(x, weight, bias, eps)
    return (x.astype(jnp.float32) * jax.nn.sigmoid(
        y.astype(jnp.float32)
    )).astype(x.dtype)


def addmm(
    bias: jnp.ndarray,
    x: jnp.ndarray,
    w: jnp.ndarray,
    kernel: Kernel = Kernel.JAX,
) -> jnp.ndarray:
    """bias + x @ w with fp32 accumulation (reference ops/addmm.py)."""
    return (
        jnp.dot(x, w, preferred_element_type=jnp.float32) + bias
    ).astype(x.dtype)
