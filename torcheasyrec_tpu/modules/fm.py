"""Factorization Machine.

Counterpart of /root/reference/tzrec/modules/fm.py (:17): second-order
interaction 0.5 * ((sum v)^2 - sum v^2) over per-feature embeddings.
"""

import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M


class FactorizationMachine(M.Module):
    """Input [B, F, D] -> [B, D]."""

    def init(self, key):
        return {}

    def __call__(self, params, x: jnp.ndarray, ctx: M.Context) -> jnp.ndarray:
        sum_sq = jnp.square(jnp.sum(x, axis=1))
        sq_sum = jnp.sum(jnp.square(x), axis=1)
        return 0.5 * (sum_sq - sq_sum)
