"""PLE ExtractionNet (reference /root/reference/tzrec/modules/
extraction_net.py:20): per-task experts + shared experts with gated
fusion, stackable (CGC layers)."""

from typing import List, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config


class ExtractionNet(M.Module):
    def __init__(
        self,
        in_task: List[int],  # input dim per task
        in_share: int,
        num_task: int,
        network_name: str,
        expert_num_per_task: int,
        share_num: int,
        task_expert_net: dict,
        share_expert_net: Optional[dict] = None,
        final_flag: bool = False,
    ) -> None:
        self.name = network_name
        self.num_task = num_task
        self.expert_num_per_task = expert_num_per_task
        self.share_num = share_num
        self.final_flag = final_flag
        self.task_experts = [
            [mlp_from_config(in_task[t], task_expert_net)
             for _ in range(expert_num_per_task)]
            for t in range(num_task)
        ]
        self.share_experts = [
            mlp_from_config(in_share, share_expert_net or task_expert_net)
            for _ in range(max(share_num, 1))
        ] if (share_expert_net or share_num) else []
        self._task_out = self.task_experts[0][0].output_dim()
        self._share_out = (
            self.share_experts[0].output_dim() if self.share_experts
            else 0
        )
        self._in_task = in_task
        self._in_share = in_share

    def task_output_dim(self) -> int:
        return self._task_out

    def share_output_dim(self) -> int:
        return self._share_out

    def init(self, key):
        params = {"task_experts": [], "share_experts": [], "gates": [],
                  "share_gate": {}}
        for t in range(self.num_task):
            eps = []
            for e in self.task_experts[t]:
                key, sub = jax.random.split(key)
                eps.append(e.init(sub))
            params["task_experts"].append(eps)
            # task gate: over (task experts + share experts)
            n_options = self.expert_num_per_task + len(self.share_experts)
            key, sub = jax.random.split(key)
            params["gates"].append(
                M.linear_init(sub, self._in_task[t], n_options)
            )
        for e in self.share_experts:
            key, sub = jax.random.split(key)
            params["share_experts"].append(e.init(sub))
        if self.share_experts and not self.final_flag:
            n_all = self.num_task * self.expert_num_per_task + len(
                self.share_experts
            )
            key, sub = jax.random.split(key)
            params["share_gate"] = M.linear_init(sub, self._in_share, n_all)
        return params

    def __call__(self, params, task_inputs: List[jnp.ndarray],
                 share_input: jnp.ndarray, ctx: M.Context,
                 path: str = "extraction"):
        all_task_outs = []  # flattened task expert outputs
        per_task_outs = []
        for t in range(self.num_task):
            outs = [
                e(params["task_experts"][t][i], task_inputs[t], ctx,
                  f"{path}.task_experts.{t}.{i}")
                for i, e in enumerate(self.task_experts[t])
            ]
            per_task_outs.append(outs)
            all_task_outs.extend(outs)
        share_outs = [
            e(params["share_experts"][i], share_input, ctx,
              f"{path}.share_experts.{i}")
            for i, e in enumerate(self.share_experts)
        ]
        new_task_inputs = []
        for t in range(self.num_task):
            options = jnp.stack(per_task_outs[t] + share_outs, axis=1)
            gate = jax.nn.softmax(
                M.linear_apply(
                    params["gates"][t], task_inputs[t], ctx
                ).astype(jnp.float32), axis=-1,
            ).astype(options.dtype)
            new_task_inputs.append(jnp.einsum("be,bed->bd", gate, options))
        new_share = share_input
        if self.share_experts and not self.final_flag:
            options = jnp.stack(all_task_outs + share_outs, axis=1)
            gate = jax.nn.softmax(
                M.linear_apply(
                    params["share_gate"], share_input, ctx
                ).astype(jnp.float32), axis=-1,
            ).astype(options.dtype)
            new_share = jnp.einsum("be,bed->bd", gate, options)
        return new_task_inputs, new_share
