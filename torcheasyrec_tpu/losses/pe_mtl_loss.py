"""Pareto-efficient multi-task loss weighting.

Counterpart of /root/reference/tzrec/loss/pe_mtl_loss.py
(ParetoEfficientMultiTaskLoss, used by TrainWrapper model.py:262-293
when model_config.use_pareto_loss_weight): solves the min-norm
Frank-Wolfe problem over per-task gradient norms to pick loss weights
on the Pareto front (Sener & Koltun, NeurIPS'18 / the PE-LTR variant),
with per-task minimum weights (pareto_min_loss_weight).

Functional variant: weights are recomputed each step from the task
losses' gradient magnitudes approximated by the loss values themselves
(the reference's least-squares variant over loss ratios), entirely
inside jit.
"""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp


def pareto_loss_weights(
    losses: Dict[str, jnp.ndarray],
    min_weights: Optional[Dict[str, float]] = None,
    iters: int = 20,
) -> Dict[str, jnp.ndarray]:
    """Weights on the simplex minimizing || sum_i w_i * l_i ||^2 with
    per-task floors; projected-gradient iterations (jit-safe)."""
    names = sorted(losses)
    l = jnp.stack([jnp.asarray(losses[n], jnp.float32) for n in names])
    k = len(names)
    floors = jnp.asarray(
        [float((min_weights or {}).get(n, 0.0)) for n in names], jnp.float32
    )
    w = jnp.full((k,), 1.0 / k, jnp.float32)
    # min_w (w . l)^2 s.t. simplex + floors -> push weight toward smaller
    # losses while keeping the floor; projected gradient descent on
    # max-normalized losses (weights depend only on loss RATIOS, and the
    # normalization bounds the step so iterates can't overshoot to zero)
    l = l / (jnp.max(jnp.abs(l)) + 1e-12)
    lr = 0.15

    uniform = jnp.full((k,), 1.0 / k, jnp.float32)

    def body(_, w):
        grad = 2.0 * jnp.dot(w, l) * l
        w = w - lr * grad
        w = jnp.maximum(w, floors)
        total = jnp.sum(w)
        # an aggressive step can clip EVERY weight to its floor-0; a
        # bare renormalization would then freeze the solver at all-zero
        return jnp.where(total > 1e-12, w / jnp.maximum(total, 1e-12),
                         uniform)

    w = jax.lax.fori_loop(0, iters, body, w)
    # scale so weights average 1 (keeps loss magnitude comparable)
    w = w * k
    return {n: w[i] for i, n in enumerate(names)}


def apply_pareto_weights(
    losses: Dict[str, jnp.ndarray],
    min_weights: Optional[Dict[str, float]] = None,
) -> Dict[str, jnp.ndarray]:
    weights = pareto_loss_weights(losses, min_weights)
    return {
        n: jax.lax.stop_gradient(weights[n]) * v for n, v in losses.items()
    }
