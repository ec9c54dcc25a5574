"""Feature-interaction modules.

Counterpart of /root/reference/tzrec/modules/interaction.py:
InputSENet (:28), InteractionArch dot-interaction (:57), Cross (:94),
CrossV2 (:135), CIN (:183), WuKong blocks (:236-324). All are
MXU-shaped: batched matmuls over [B, F, D] stacks, fp32 accumulation.
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import MLP


class InputSENet(M.Module):
    """Squeeze-excitation over per-feature embeddings (FiBiNET style)."""

    def __init__(self, field_dims: Sequence[int], reduction_ratio: int = 2):
        self.field_dims = list(field_dims)
        f = len(self.field_dims)
        self.hidden = max(f // reduction_ratio, 1)
        self.f = f

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "w1": M.linear_init(k1, self.f, self.hidden, bias=False),
            "w2": M.linear_init(k2, self.hidden, self.f, bias=False),
        }

    def __call__(self, params, x_list: List[jnp.ndarray], ctx: M.Context):
        z = jnp.stack([jnp.mean(x, axis=-1) for x in x_list], axis=-1)  # [B,F]
        a = jax.nn.relu(M.linear_apply(params["w1"], z, ctx))
        a = 2.0 * jax.nn.sigmoid(M.linear_apply(params["w2"], a, ctx))
        return [x * a[:, i : i + 1] for i, x in enumerate(x_list)]


class InteractionArch(M.Module):
    """DLRM dot interaction: pairwise dots of F feature vectors
    (reference interaction.py:57): output [B, F*(F-1)/2]."""

    def __init__(self, num_features: int):
        self.f = num_features
        self._tri = jnp.triu_indices(num_features, k=1)

    def output_dim(self) -> int:
        return self.f * (self.f - 1) // 2

    def init(self, key):
        return {}

    def __call__(self, params, x: jnp.ndarray, ctx: M.Context) -> jnp.ndarray:
        # x: [B, F, D]
        dots = jnp.einsum(
            "bfd,bgd->bfg", x, x, preferred_element_type=jnp.float32
        )
        return dots[:, self._tri[0], self._tri[1]].astype(x.dtype)


class Cross(M.Module):
    """DCN v1 cross layers (reference interaction.py:94):
    x_{l+1} = x0 * (w_l . x_l) + b_l + x_l."""

    def __init__(self, in_features: int, cross_num: int = 3):
        self.dim = in_features
        self.n = cross_num

    def output_dim(self) -> int:
        return self.dim

    def init(self, key):
        ks = M.split_keys(key, self.n)
        return {
            f"layer_{i}": {
                "w": jax.random.normal(ks[i], (self.dim,), jnp.float32)
                * (self.dim ** -0.5),
                "b": jnp.zeros((self.dim,), jnp.float32),
            }
            for i in range(self.n)
        }

    def __call__(self, params, x0: jnp.ndarray, ctx: M.Context) -> jnp.ndarray:
        x = x0
        for i in range(self.n):
            p = params[f"layer_{i}"]
            xw = jnp.sum(x * p["w"], axis=-1, keepdims=True)
            x = x0 * xw + p["b"] + x
        return x


class CrossV2(M.Module):
    """DCN v2 low-rank cross (reference interaction.py:135):
    x_{l+1} = x0 * (U_l (V_l^T x_l) + b_l) + x_l."""

    def __init__(self, in_features: int, cross_num: int = 3, low_rank: int = 32):
        self.dim = in_features
        self.n = cross_num
        self.r = low_rank

    def output_dim(self) -> int:
        return self.dim

    def init(self, key):
        params = {}
        for i in range(self.n):
            key, k1, k2 = jax.random.split(key, 3)
            params[f"layer_{i}"] = {
                "u": M.linear_init(k1, self.r, self.dim, bias=True),
                "v": M.linear_init(k2, self.dim, self.r, bias=False),
            }
        return params

    def __call__(self, params, x0: jnp.ndarray, ctx: M.Context) -> jnp.ndarray:
        x = x0
        for i in range(self.n):
            p = params[f"layer_{i}"]
            low = M.linear_apply(p["v"], x, ctx)
            up = M.linear_apply(p["u"], low, ctx)
            x = x0 * up + x
        return x


class CIN(M.Module):
    """Compressed Interaction Network (xDeepFM, reference interaction.py:183).

    Input [B, F, D]; layer k: X^k[B, H_k, D] from outer products of
    X^{k-1} and X^0 compressed by 1x1 conv; output sum over D of all
    layers' features."""

    def __init__(self, num_features: int, cin_layer_size: Sequence[int]):
        self.f = num_features
        self.sizes = list(cin_layer_size)

    def output_dim(self) -> int:
        return sum(self.sizes)

    def init(self, key):
        params = {}
        h_prev = self.f
        for i, h in enumerate(self.sizes):
            key, sub = jax.random.split(key)
            params[f"layer_{i}"] = {
                "w": jax.random.normal(
                    sub, (h_prev * self.f, h), jnp.float32
                ) * ((h_prev * self.f) ** -0.5)
            }
            h_prev = h
        return params

    def __call__(self, params, x0: jnp.ndarray, ctx: M.Context) -> jnp.ndarray:
        b, f, d = x0.shape
        xk = x0
        outs = []
        for i, h in enumerate(self.sizes):
            w = params[f"layer_{i}"]["w"].astype(ctx.compute_dtype)
            # z: [B, H_prev*F, D] outer products along feature dims
            z = jnp.einsum("bhd,bfd->bhfd", xk, x0).reshape(
                b, xk.shape[1] * f, d
            )
            xk = jnp.einsum(
                "bzd,zh->bhd", z, w, preferred_element_type=jnp.float32
            ).astype(x0.dtype)
            outs.append(jnp.sum(xk, axis=-1))  # [B, H]
        return jnp.concatenate(outs, axis=-1)


class LinearCompressBlock(M.Module):
    """WuKong LCB (reference interaction.py:236): compress F features to
    K by a learned [F, K] map."""

    def __init__(self, num_features: int, out_features: int):
        self.f = num_features
        self.k = out_features

    def init(self, key):
        return {
            "w": jax.random.normal(key, (self.f, self.k), jnp.float32)
            * (self.f ** -0.5)
        }

    def __call__(self, params, x: jnp.ndarray, ctx: M.Context) -> jnp.ndarray:
        return jnp.einsum(
            "bfd,fk->bkd", x, params["w"].astype(ctx.compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)


class FactorizationMachineBlock(M.Module):
    """WuKong FMB (reference interaction.py:268): compressed FM + MLP."""

    def __init__(self, num_features: int, emb_dim: int, out_features: int,
                 compressed_num: int, mlp_cfg: dict):
        self.f = num_features
        self.d = emb_dim
        self.k = out_features
        self.c = compressed_num
        from torcheasyrec_tpu.modules.mlp import mlp_from_config

        self.mlp = mlp_from_config(num_features * compressed_num, mlp_cfg)
        self.out_linear_in = self.mlp.output_dim()

    def init(self, key):
        k1, k2, k3 = M.split_keys(key, 3)
        return {
            "compress": jax.random.normal(
                k1, (self.f, self.c), jnp.float32
            ) * (self.f ** -0.5),
            "mlp": self.mlp.init(k2),
            "out": M.linear_init(k3, self.out_linear_in, self.k * self.d),
        }

    def __call__(self, params, x: jnp.ndarray, ctx: M.Context,
                 path: str = "fmb") -> jnp.ndarray:
        b = x.shape[0]
        compressed = jnp.einsum(
            "bfd,fc->bcd", x, params["compress"].astype(ctx.compute_dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        fm = jnp.einsum(
            "bfd,bcd->bfc", x, compressed, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        h = self.mlp(params["mlp"], fm.reshape(b, -1), ctx, f"{path}.mlp")
        out = M.linear_apply(params["out"], h, ctx)
        return out.reshape(b, self.k, self.d)


class WuKongLayer(M.Module):
    """One WuKong layer (reference interaction.py:296): concat(LCB, FMB)
    + per-feature-num projection MLP + residual + LN."""

    def __init__(self, num_features: int, emb_dim: int, lcb_feature_num: int,
                 fmb_feature_num: int, compressed_feature_num: int,
                 feature_num_mlp: dict):
        self.f = num_features
        self.d = emb_dim
        self.lcb = LinearCompressBlock(num_features, lcb_feature_num)
        self.fmb = FactorizationMachineBlock(
            num_features, emb_dim, fmb_feature_num, compressed_feature_num,
            feature_num_mlp,
        )
        self.out_features = lcb_feature_num + fmb_feature_num

    def init(self, key):
        k1, k2, k3 = M.split_keys(key, 3)
        p = {
            "lcb": self.lcb.init(k1),
            "fmb": self.fmb.init(k2),
            "ln": M.layer_norm_init(self.d),
        }
        if self.out_features != self.f:
            p["residual_proj"] = {
                "w": jax.random.normal(
                    k3, (self.f, self.out_features), jnp.float32
                ) * (self.f ** -0.5)
            }
        return p

    def __call__(self, params, x: jnp.ndarray, ctx: M.Context,
                 path: str = "layer") -> jnp.ndarray:
        lcb = self.lcb(params["lcb"], x, ctx)
        fmb = self.fmb(params["fmb"], x, ctx, f"{path}.fmb")
        out = jnp.concatenate([fmb, lcb], axis=1)  # [B, K, D]
        if "residual_proj" in params:
            res = jnp.einsum(
                "bfd,fk->bkd", x,
                params["residual_proj"]["w"].astype(ctx.compute_dtype),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        else:
            res = x
        return M.layer_norm_apply(params["ln"], out + res)
