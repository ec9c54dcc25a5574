"""Intervention module for DC2VR.

Counterpart of /root/reference/tzrec/modules/intervention.py (used by
models/dc2vr.py:165): low-rank causal intervention of a target tower's
representation by other towers' representations."""

from typing import List

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M


class Intervention(M.Module):
    def __init__(self, main_dim: int, cond_dim: int, low_rank_dim: int,
                 dropout_ratio: float = 0.1):
        self.main_dim = main_dim
        self.cond_dim = cond_dim
        self.r = low_rank_dim
        self.dropout = dropout_ratio

    def output_dim(self) -> int:
        return self.main_dim

    def init(self, key):
        k1, k2, k3 = M.split_keys(key, 3)
        return {
            "down": M.linear_init(k1, self.cond_dim, self.r, bias=False),
            "up": M.linear_init(k2, self.r, self.main_dim, bias=False),
            "gate": M.linear_init(k3, self.cond_dim, self.main_dim),
        }

    def __call__(self, params, main, cond, ctx: M.Context):
        delta = M.linear_apply(
            params["up"], M.linear_apply(params["down"], cond, ctx), ctx
        )
        gate = jax.nn.sigmoid(M.linear_apply(params["gate"], cond, ctx))
        out = main + gate * delta
        return M.dropout(out, self.dropout, ctx)
