"""LR schedules as pure functions of (step, epoch).

Counterpart of /root/reference/tzrec/optim/lr_scheduler.py (:26-212):
constant, exponential_decay, manual_step, cosine_annealing,
cosine_annealing_warm_restarts, each supporting by_epoch stepping and
warmup. Returned callables map a (possibly traced) step scalar to a
multiplier on the base lr, so they compose with both the dense optax
chain and the fused sparse updates inside jit.
"""

import math
from typing import Any, Callable, Dict

import jax.numpy as jnp


def _warmup_wrap(fn, warmup_lr_ratio: float, warmup_size: int):
    if warmup_size <= 0:
        return fn

    def wrapped(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / warmup_size, 0.0, 1.0)
        warm = warmup_lr_ratio + (1.0 - warmup_lr_ratio) * frac
        return jnp.where(step < warmup_size, warm, fn(step))

    return wrapped


def create_lr_scheduler(
    lr_oneof_holder: Any, base_lr: float, steps_per_epoch: int = 0
) -> Dict[str, Any]:
    """Build from the learning_rate oneof of an optimizer proto.

    Returns dict(fn=step->multiplier, by_epoch=bool).
    """
    which = lr_oneof_holder.WhichOneof("learning_rate")
    if which is None or which == "constant_learning_rate":
        return {"fn": lambda step: jnp.float32(1.0), "by_epoch": False}
    cfg = getattr(lr_oneof_holder, which)
    by_epoch = bool(getattr(cfg, "by_epoch", False))

    if which == "exponential_decay_learning_rate":
        decay_size = max(int(cfg.decay_size), 1)
        factor = float(cfg.decay_factor)
        staircase = bool(cfg.staircase)
        min_ratio = float(cfg.min_learning_rate) / base_lr if base_lr else 0.0
        warm = int(cfg.warmup_size)

        def fn(step):
            # decay starts from 0 AFTER warmup ends (reference
            # ExponentialDecayLR: p = (step - warmup_size) / decay_size)
            t = jnp.maximum(
                jnp.asarray(step, jnp.float32) - warm, 0.0
            ) / decay_size
            if staircase:
                t = jnp.floor(t)
            return jnp.maximum(factor ** t, min_ratio)

        warm_ratio = (
            float(cfg.warmup_learning_rate) / base_lr if base_lr else 0.0
        )
        return {
            "fn": _warmup_wrap(fn, warm_ratio, int(cfg.warmup_size)),
            "by_epoch": by_epoch,
        }

    if which == "manual_step_learning_rate":
        sizes = list(cfg.schedule_sizes)
        lrs = [lr / base_lr if base_lr else 1.0 for lr in cfg.learning_rates]
        boundaries = jnp.asarray(
            [sum(sizes[: i + 1]) for i in range(len(sizes))], jnp.float32
        )
        ratios = jnp.asarray([1.0] + lrs, jnp.float32)

        def fn(step):
            idx = jnp.sum(
                jnp.asarray(step, jnp.float32) >= boundaries
            ).astype(jnp.int32)
            return ratios[jnp.minimum(idx, len(ratios) - 1)]

        return {"fn": fn, "by_epoch": by_epoch}

    if which == "cosine_annealing_learning_rate":
        t_max = max(int(cfg.T_max), 1)
        min_ratio = float(cfg.min_learning_rate) / base_lr if base_lr else 0.0
        warm_c = int(cfg.warmup_size)

        def fn(step):
            t = jnp.clip(
                jnp.asarray(step, jnp.float32) - warm_c, 0, t_max
            )
            return min_ratio + (1 - min_ratio) * 0.5 * (
                1 + jnp.cos(math.pi * t / t_max)
            )

        warm_ratio = (
            float(cfg.warmup_learning_rate) / base_lr if base_lr else 0.0
        )
        return {
            "fn": _warmup_wrap(fn, warm_ratio, int(cfg.warmup_size)),
            "by_epoch": by_epoch,
        }

    if which == "cosine_annealing_warm_restarts_learning_rate":
        t0 = max(int(cfg.T_0), 1)
        t_mult = max(int(cfg.T_mult), 1)
        min_ratio = float(cfg.min_learning_rate) / base_lr if base_lr else 0.0

        def fn(step):
            t = jnp.asarray(step, jnp.float32)
            if t_mult == 1:
                t_cur = jnp.mod(t, t0)
                t_i = jnp.float32(t0)
            else:
                # closed form: number of completed restarts n satisfies
                # t0 * (t_mult^n - 1)/(t_mult - 1) <= t
                n = jnp.floor(
                    jnp.log1p(t / t0 * (t_mult - 1)) / jnp.log(
                        jnp.float32(t_mult)
                    )
                )
                start = t0 * (t_mult ** n - 1) / (t_mult - 1)
                t_cur = t - start
                t_i = t0 * t_mult ** n
            return min_ratio + (1 - min_ratio) * 0.5 * (
                1 + jnp.cos(math.pi * t_cur / t_i)
            )

        warm_ratio = (
            float(cfg.warmup_learning_rate) / base_lr if base_lr else 0.0
        )
        return {
            "fn": _warmup_wrap(fn, warm_ratio, int(cfg.warmup_size)),
            "by_epoch": by_epoch,
        }

    raise ValueError(f"unknown lr schedule {which}")
