"""Fused sparse (embedding) optimizers as row-sparse functional updates.

TPU-native equivalent of the reference's in-backward fused optimizers
(/root/reference/tzrec/optim/optimizer_builder.py:30, applied via
torchrec ``apply_optimizer_in_backward`` in main.py:721-728, kernels in
fbgemm TBE). Here each optimizer is a pure function over the *touched
rows only*: given deduplicated row indices + summed row gradients it
scatters new weights/state into the (possibly sharded) table, so a
40M-row table costs only O(touched) bandwidth per step.

Dedup contract: callers pass ``uids`` [K_pad] (unique row ids, padding
slots set OUT OF BOUNDS so ``.at[].set(mode="drop")`` ignores them) and
``grads`` [K_pad, dim] (summed over duplicates). All updates run in fp32.

Covers the full sparse-optimizer oneof (optimizer.proto:4-16 /
reference optimizer.proto): sgd, adagrad, adam, lars_sgd, lamb,
partial_rowwise_lamb, partial_rowwise_adam, rowwise_adagrad, adadelta,
rmsprop.
"""

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_DROP = dict(mode="drop")


def _dim_sum(x, axis_name: Optional[str]):
    """Row-wise sum over the embedding dim; psums across a column-sharded
    mesh axis so row-wise optimizer state (rowwise_adagrad acc, partial
    rowwise v, lamb/lars norms) is EXACT under column_wise sharding."""
    s = jnp.sum(x, axis=-1, keepdims=True)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
    return s


def _dim_mean(x, axis_name: Optional[str], full_dim: Optional[int]):
    d = full_dim if full_dim is not None else x.shape[-1]
    return _dim_sum(x, axis_name) / d


def _dim_norm(x, axis_name: Optional[str]):
    return jnp.sqrt(_dim_sum(x * x, axis_name))


def _set_rows(weight, uids, new_rows):
    return weight.at[uids].set(new_rows.astype(weight.dtype), **_DROP)


def create_sparse_optimizer(type_name: str, cfg: Dict[str, Any]) -> "SparseOptimizer":
    return SparseOptimizer(type_name.replace("_optimizer", ""), cfg)


class SparseOptimizer:
    """Stateless descriptor; state lives in plain pytrees."""

    def __init__(self, kind: str, cfg: Dict[str, Any]) -> None:
        self.kind = kind
        self.cfg = dict(cfg)
        self.base_lr = float(cfg.get("lr", 0.002))

    # -- state -------------------------------------------------------------

    def init_state(self, rows: int, dim: int) -> Params:
        c = self.cfg
        k = self.kind
        if k == "sgd":
            return {}
        if k == "adagrad":
            iv = float(c.get("initial_accumulator_value", 0.0))
            return {"acc": jnp.full((rows, dim), iv, jnp.float32)}
        if k == "rowwise_adagrad":
            iv = float(c.get("initial_accumulator_value", 0.0))
            return {"acc": jnp.full((rows, 1), iv, jnp.float32)}
        if k == "adam":
            return {
                "m": jnp.zeros((rows, dim), jnp.float32),
                "v": jnp.zeros((rows, dim), jnp.float32),
                "step": jnp.zeros((), jnp.int32),
            }
        if k == "partial_rowwise_adam":
            return {
                "m": jnp.zeros((rows, dim), jnp.float32),
                "v": jnp.zeros((rows, 1), jnp.float32),
                "step": jnp.zeros((), jnp.int32),
            }
        if k in ("lamb", "partial_rowwise_lamb"):
            vshape = (rows, 1) if k == "partial_rowwise_lamb" else (rows, dim)
            return {
                "m": jnp.zeros((rows, dim), jnp.float32),
                "v": jnp.zeros(vshape, jnp.float32),
                "step": jnp.zeros((), jnp.int32),
            }
        if k == "lars_sgd":
            return {"mom": jnp.zeros((rows, dim), jnp.float32)}
        if k == "adadelta":
            return {
                "acc": jnp.zeros((rows, dim), jnp.float32),
                "delta_acc": jnp.zeros((rows, dim), jnp.float32),
            }
        if k == "rmsprop":
            return {"sq": jnp.zeros((rows, dim), jnp.float32)}
        raise ValueError(f"unknown sparse optimizer {self.kind}")

    # -- update ------------------------------------------------------------

    def apply(
        self,
        weight: jnp.ndarray,  # [rows, dim] fp32
        state: Params,
        uids: jnp.ndarray,  # [K] int32, OOB for padding
        grads: jnp.ndarray,  # [K, dim] fp32 (deduped row sums)
        lr: jnp.ndarray,  # scalar (schedule-scaled)
        dim_psum_axis: Optional[str] = None,  # set under column_wise
        full_dim: Optional[int] = None,  # global dim when column-sharded
    ) -> Tuple[jnp.ndarray, Params]:
        c = self.cfg
        k = self.kind
        if c.get("gradient_clipping", False):
            mg = float(c.get("max_gradient", 1.0))
            grads = jnp.clip(grads, -mg, mg)
        w_rows = weight.at[uids].get(
            mode="fill", fill_value=0.0
        ).astype(jnp.float32)
        wd = float(c.get("weight_decay", 0.0))
        if wd and k in ("adam", "lamb", "partial_rowwise_lamb",
                        "partial_rowwise_adam", "lars_sgd", "adadelta",
                        "rmsprop"):
            grads = grads + wd * w_rows

        if k == "sgd":
            new_rows = w_rows - lr * grads
            return _set_rows(weight, uids, new_rows), state

        if k == "adagrad":
            eps = float(c.get("eps", 1e-10))
            acc = state["acc"].at[uids].get(mode="fill", fill_value=0.0)
            acc = acc + grads * grads
            new_rows = w_rows - lr * grads / (jnp.sqrt(acc) + eps)
            return (
                _set_rows(weight, uids, new_rows),
                {"acc": state["acc"].at[uids].set(acc, **_DROP)},
            )

        if k == "rowwise_adagrad":
            eps = float(c.get("eps", 1e-10))
            acc = state["acc"].at[uids].get(mode="fill", fill_value=0.0)
            acc = acc + _dim_mean(grads * grads, dim_psum_axis, full_dim)
            new_rows = w_rows - lr * grads / (jnp.sqrt(acc) + eps)
            return (
                _set_rows(weight, uids, new_rows),
                {"acc": state["acc"].at[uids].set(acc, **_DROP)},
            )

        if k in ("adam", "partial_rowwise_adam"):
            b1 = float(c.get("beta1", 0.9))
            b2 = float(c.get("beta2", 0.999))
            eps = float(c.get("eps", 1e-8))
            step = state["step"] + 1
            m = state["m"].at[uids].get(mode="fill", fill_value=0.0)
            v = state["v"].at[uids].get(mode="fill", fill_value=0.0)
            m = b1 * m + (1 - b1) * grads
            g2 = grads * grads
            if k == "partial_rowwise_adam":
                g2 = _dim_mean(g2, dim_psum_axis, full_dim)
            v = b2 * v + (1 - b2) * g2
            mh = m / (1 - b1 ** step.astype(jnp.float32))
            vh = v / (1 - b2 ** step.astype(jnp.float32))
            new_rows = w_rows - lr * mh / (jnp.sqrt(vh) + eps)
            return (
                _set_rows(weight, uids, new_rows),
                {
                    "m": state["m"].at[uids].set(m, **_DROP),
                    "v": state["v"].at[uids].set(v, **_DROP),
                    "step": step,
                },
            )

        if k in ("lamb", "partial_rowwise_lamb"):
            b1 = float(c.get("beta1", 0.9))
            b2 = float(c.get("beta2", 0.999))
            eps = float(c.get("eps", 1e-6))
            step = state["step"] + 1
            m = state["m"].at[uids].get(mode="fill", fill_value=0.0)
            v = state["v"].at[uids].get(mode="fill", fill_value=0.0)
            m = b1 * m + (1 - b1) * grads
            g2 = grads * grads
            if k == "partial_rowwise_lamb":
                g2 = _dim_mean(g2, dim_psum_axis, full_dim)
            v = b2 * v + (1 - b2) * g2
            mh = m / (1 - b1 ** step.astype(jnp.float32))
            vh = v / (1 - b2 ** step.astype(jnp.float32))
            upd = mh / (jnp.sqrt(vh) + eps)
            w_norm = _dim_norm(w_rows, dim_psum_axis)
            u_norm = _dim_norm(upd, dim_psum_axis)
            trust = jnp.where(
                (w_norm > 0) & (u_norm > 0), w_norm / (u_norm + 1e-12), 1.0
            )
            new_rows = w_rows - lr * trust * upd
            return (
                _set_rows(weight, uids, new_rows),
                {
                    "m": state["m"].at[uids].set(m, **_DROP),
                    "v": state["v"].at[uids].set(v, **_DROP),
                    "step": step,
                },
            )

        if k == "lars_sgd":
            momentum = float(c.get("momentum", 0.9))
            eta = float(c.get("eta", 0.001))
            w_norm = _dim_norm(w_rows, dim_psum_axis)
            g_norm = _dim_norm(grads, dim_psum_axis)
            local_lr = jnp.where(
                (w_norm > 0) & (g_norm > 0),
                eta * w_norm / (g_norm + 1e-12),
                1.0,
            )
            mom = state["mom"].at[uids].get(mode="fill", fill_value=0.0)
            mom = momentum * mom + local_lr * lr * grads
            new_rows = w_rows - mom
            return (
                _set_rows(weight, uids, new_rows),
                {"mom": state["mom"].at[uids].set(mom, **_DROP)},
            )

        if k == "adadelta":
            rho = float(c.get("rho", 0.95))
            eps = float(c.get("eps", 1e-6))
            acc = state["acc"].at[uids].get(mode="fill", fill_value=0.0)
            dacc = state["delta_acc"].at[uids].get(mode="fill", fill_value=0.0)
            acc = rho * acc + (1 - rho) * grads * grads
            delta = jnp.sqrt(dacc + eps) / jnp.sqrt(acc + eps) * grads
            dacc = rho * dacc + (1 - rho) * delta * delta
            new_rows = w_rows - lr * delta
            return (
                _set_rows(weight, uids, new_rows),
                {
                    "acc": state["acc"].at[uids].set(acc, **_DROP),
                    "delta_acc": state["delta_acc"].at[uids].set(dacc, **_DROP),
                },
            )

        if k == "rmsprop":
            alpha = float(c.get("alpha", 0.99))
            eps = float(c.get("eps", 1e-8))
            sq = state["sq"].at[uids].get(mode="fill", fill_value=0.0)
            sq = alpha * sq + (1 - alpha) * grads * grads
            new_rows = w_rows - lr * grads / (jnp.sqrt(sq) + eps)
            return (
                _set_rows(weight, uids, new_rows),
                {"sq": state["sq"].at[uids].set(sq, **_DROP)},
            )

        raise ValueError(f"unknown sparse optimizer {self.kind}")
