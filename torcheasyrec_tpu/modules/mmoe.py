"""MMoE gating module.

Counterpart of /root/reference/tzrec/modules/mmoe.py (:21): N shared
experts + per-task softmax gates.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config


class MMoE(M.Module):
    def __init__(self, in_features: int, expert_mlp: dict, num_expert: int,
                 num_task: int, gate_mlp: Optional[dict] = None):
        self.num_expert = num_expert
        self.num_task = num_task
        self.experts = [
            mlp_from_config(in_features, expert_mlp) for _ in range(num_expert)
        ]
        self.gate_mlps = (
            [mlp_from_config(in_features, gate_mlp) for _ in range(num_task)]
            if gate_mlp else [None] * num_task
        )
        self.gate_in = (
            self.gate_mlps[0].output_dim() if gate_mlp else in_features
        )
        self._out = self.experts[0].output_dim()

    def output_dim(self) -> int:
        return self._out

    def init(self, key):
        params = {"experts": [], "gates": []}
        for e in self.experts:
            key, sub = jax.random.split(key)
            params["experts"].append(e.init(sub))
        for t in range(self.num_task):
            key, k1, k2 = jax.random.split(key, 3)
            g = {"linear": M.linear_init(k1, self.gate_in, self.num_expert)}
            if self.gate_mlps[t] is not None:
                g["mlp"] = self.gate_mlps[t].init(k2)
            params["gates"].append(g)
        return params

    def __call__(self, params, x, ctx: M.Context,
                 path: str = "mmoe") -> List[jnp.ndarray]:
        # experts stacked: [B, E, D]
        expert_out = jnp.stack(
            [
                e(params["experts"][i], x, ctx, f"{path}.experts.{i}")
                for i, e in enumerate(self.experts)
            ],
            axis=1,
        )
        outs = []
        for t in range(self.num_task):
            g_in = x
            if self.gate_mlps[t] is not None:
                g_in = self.gate_mlps[t](
                    params["gates"][t]["mlp"], g_in, ctx, f"{path}.gates.{t}.mlp"
                )
            gate = jax.nn.softmax(
                M.linear_apply(
                    params["gates"][t]["linear"], g_in, ctx
                ).astype(jnp.float32),
                axis=-1,
            ).astype(expert_out.dtype)
            outs.append(jnp.einsum("be,bed->bd", gate, expert_out))
        return outs
