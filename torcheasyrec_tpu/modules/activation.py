"""Activation registry, incl. Dice.

Counterpart of /root/reference/tzrec/modules/activation.py. Accepts both
torch-style config names ("nn.ReLU") and jax-style names ("relu").
"""

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M

_SIMPLE = {
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "softmax": jax.nn.softmax,
    "leakyrelu": jax.nn.leaky_relu,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "prelu": None,  # parameterized, handled below
    "dice": None,  # parameterized, handled below
    "identity": lambda x: x,
    "none": lambda x: x,
}


def normalize_act_name(name: Optional[str]) -> str:
    if not name:
        return "identity"
    n = name.strip()
    # "nn.ReLU" / "torch.nn.ReLU" / "ReLU" -> "relu"
    n = n.rsplit(".", 1)[-1]
    # strip call parens e.g. "Dice(dim=64)"
    n = n.split("(", 1)[0]
    return n.lower()


def act_needs_params(name: Optional[str]) -> bool:
    return normalize_act_name(name) in ("dice", "prelu")


def init_activation(name: Optional[str], dim: int, key) -> M.Params:
    n = normalize_act_name(name)
    if n == "dice":
        return {"alpha": jnp.zeros((dim,), jnp.float32),
                "bn": M.batch_norm_init(dim)}
    if n == "prelu":
        return {"alpha": jnp.full((dim,), 0.25, jnp.float32)}
    return {}


def apply_activation(
    name: Optional[str], params: M.Params, x: jnp.ndarray,
    ctx: M.Context, path: str = "",
) -> jnp.ndarray:
    n = normalize_act_name(name)
    if n == "dice":
        # Dice (DIN paper): p = sigmoid(BN(x)); y = p*x + (1-p)*alpha*x
        xn = M.batch_norm_apply(params["bn"], x, ctx, path + ".bn")
        p = jax.nn.sigmoid(xn)
        return (p * x + (1.0 - p) * params["alpha"] * x).astype(x.dtype)
    if n == "prelu":
        return jnp.where(x >= 0, x, params["alpha"] * x).astype(x.dtype)
    fn = _SIMPLE.get(n)
    if fn is None:
        raise ValueError(f"unknown activation {name}")
    return fn(x)


def get_plain_activation(name: Optional[str]) -> Callable:
    """For non-parameterized activations used inside kernels."""
    n = normalize_act_name(name)
    fn = _SIMPLE.get(n)
    if fn is None:
        raise ValueError(f"activation {name} needs parameters; use apply_activation")
    return fn
