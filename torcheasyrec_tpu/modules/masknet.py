"""MaskNet modules.

Counterpart of /root/reference/tzrec/modules/masknet.py (MaskBlock:20,
MaskNetModule:88): instance-guided masks over (layer-normed) feature
embeddings, parallel or serial blocks + top MLP.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import mlp_from_config


class MaskBlock(M.Module):
    def __init__(self, input_dim: int, mask_input_dim: int, hidden_dim: int,
                 aggregation_dim: int = 0, reduction_ratio: float = 1.0):
        self.input_dim = input_dim
        self.mask_input_dim = mask_input_dim
        self.hidden_dim = hidden_dim
        self.agg_dim = aggregation_dim or int(mask_input_dim * reduction_ratio)

    def output_dim(self) -> int:
        return self.hidden_dim

    def init(self, key):
        k1, k2, k3 = M.split_keys(key, 3)
        return {
            "agg": M.linear_init(k1, self.mask_input_dim, self.agg_dim),
            "mask": M.linear_init(k2, self.agg_dim, self.input_dim),
            "hidden": M.linear_init(k3, self.input_dim, self.hidden_dim),
            "ln": M.layer_norm_init(self.hidden_dim),
        }

    def __call__(self, params, x, mask_input, ctx: M.Context):
        a = jax.nn.relu(M.linear_apply(params["agg"], mask_input, ctx))
        mask = M.linear_apply(params["mask"], a, ctx)
        hidden = M.linear_apply(params["hidden"], x * mask, ctx)
        return jax.nn.relu(M.layer_norm_apply(params["ln"], hidden))


class MaskNetModule(M.Module):
    def __init__(self, feature_dim: int, n_mask_blocks: int, mask_block: dict,
                 top_mlp: Optional[dict] = None, use_parallel: bool = True):
        self.feature_dim = feature_dim
        self.n = n_mask_blocks
        self.use_parallel = use_parallel
        mb = dict(mask_block)
        hidden_dim = int(mb.get("hidden_dim"))
        agg = int(mb.get("aggregation_dim", 0) or 0)
        rr = float(mb.get("reduction_ratio", 1.0))
        self.blocks = []
        if use_parallel:
            for _ in range(n_mask_blocks):
                self.blocks.append(
                    MaskBlock(feature_dim, feature_dim, hidden_dim, agg, rr)
                )
            top_in = hidden_dim * n_mask_blocks
        else:
            in_dim = feature_dim
            for _ in range(n_mask_blocks):
                self.blocks.append(
                    MaskBlock(in_dim, feature_dim, hidden_dim, agg, rr)
                )
                in_dim = hidden_dim
            top_in = hidden_dim
        self.top_mlp = mlp_from_config(top_in, top_mlp) if top_mlp else None
        self._out = self.top_mlp.output_dim() if self.top_mlp else top_in

    def output_dim(self) -> int:
        return self._out

    def init(self, key):
        params = {"ln_in": M.layer_norm_init(self.feature_dim)}
        for i, blk in enumerate(self.blocks):
            key, sub = jax.random.split(key)
            params[f"block_{i}"] = blk.init(sub)
        if self.top_mlp:
            key, sub = jax.random.split(key)
            params["top"] = self.top_mlp.init(sub)
        return params

    def __call__(self, params, x, ctx: M.Context):
        xn = M.layer_norm_apply(params["ln_in"], x)
        if self.use_parallel:
            outs = [
                blk(params[f"block_{i}"], xn, x, ctx)
                for i, blk in enumerate(self.blocks)
            ]
            h = jnp.concatenate(outs, axis=-1)
        else:
            h = xn
            for i, blk in enumerate(self.blocks):
                h = blk(params[f"block_{i}"], h, x, ctx)
        if self.top_mlp:
            h = self.top_mlp(params["top"], h, ctx, "masknet.top")
        return h
