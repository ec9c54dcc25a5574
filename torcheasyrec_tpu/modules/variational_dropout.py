"""Variational dropout for feature-importance estimation.

Counterpart of /root/reference/tzrec/modules/variational_dropout.py
(:38, wired in rank_model.py:96-131): learnable per-feature (or
per-embedding-dim) drop logits; concrete (gumbel-sigmoid) sampling at
train time; an L0-style regularization term is added to the loss; the
learned drop probabilities rank feature importance
(tools/feature_selection.py).
"""

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M


class VariationalDropout(M.Module):
    def __init__(
        self,
        feature_dims: List[int],  # per-feature dims inside the group
        regularization_lambda: float = 0.01,
        embedding_wise: bool = False,
    ) -> None:
        self.feature_dims = list(feature_dims)
        self.lam = regularization_lambda
        self.embedding_wise = embedding_wise
        self.n = (
            sum(feature_dims) if embedding_wise else len(feature_dims)
        )

    def init(self, key):
        return {"logit_p": jnp.full((self.n,), -2.0, jnp.float32)}

    def __call__(
        self, params, x: jnp.ndarray, ctx: M.Context
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B, sum(dims)] -> (dropped x, regularization loss)."""
        p = jax.nn.sigmoid(params["logit_p"])  # drop probability
        if ctx.training:
            u = jax.random.uniform(
                ctx.next_rng(), (self.n,), minval=1e-6, maxval=1 - 1e-6
            )
            temp = 0.1
            z = jax.nn.sigmoid(
                (jnp.log(1 - p + 1e-9) - jnp.log(p + 1e-9)
                 + jnp.log(u) - jnp.log(1 - u)) / temp
            )  # keep gate
        else:
            z = 1.0 - p
        if not self.embedding_wise:
            z = jnp.concatenate([
                jnp.broadcast_to(z[i : i + 1], (d,))
                for i, d in enumerate(self.feature_dims)
            ])
        out = x * z.astype(x.dtype)[None, :]
        reg = self.lam * jnp.sum(1.0 - p)
        return out, reg

    def drop_probabilities(self, params) -> jnp.ndarray:
        """Per-feature drop probability (for feature selection)."""
        return jax.nn.sigmoid(params["logit_p"])
