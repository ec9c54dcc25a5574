"""PEPNet building blocks: EPNet (embedding personalization gate) and
PPNet (parameter personalization towers).

Counterpart of /root/reference/tzrec/modules/personalized_net.py
(used by models/pepnet.py:244).
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import activation as A
from torcheasyrec_tpu.modules import module as M


class GateNU(M.Module):
    """Gate neural unit: 2-layer MLP ending in gamma * sigmoid."""

    def __init__(self, in_dim: int, hidden_dim: int, out_dim: int,
                 gamma: float = 2.0):
        self.in_dim = in_dim
        self.hidden = hidden_dim
        self.out = out_dim
        self.gamma = gamma

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "l1": M.linear_init(k1, self.in_dim, self.hidden),
            "l2": M.linear_init(k2, self.hidden, self.out),
        }

    def __call__(self, params, x, ctx: M.Context):
        h = jax.nn.relu(M.linear_apply(params["l1"], x, ctx))
        return self.gamma * jax.nn.sigmoid(
            M.linear_apply(params["l2"], h, ctx)
        )


class EPNet(M.Module):
    """Scales the shared embedding by a domain-conditioned gate."""

    def __init__(self, feature_dim: int, domain_dim: int, hidden_dim: int,
                 gamma: float = 2.0):
        self.gate = GateNU(
            domain_dim + feature_dim, hidden_dim or feature_dim,
            feature_dim, gamma,
        )

    def init(self, key):
        return {"gate": self.gate.init(key)}

    def __call__(self, params, features, domain_emb, ctx: M.Context):
        gate_in = jnp.concatenate(
            [domain_emb, jax.lax.stop_gradient(features)], axis=-1
        )
        return features * self.gate(params["gate"], gate_in, ctx)


class PPNet(M.Module):
    """Per-task MLP whose layer outputs are gated by user/item priors."""

    def __init__(self, in_dim: int, prior_dim: int,
                 hidden_units: Sequence[int], activation: str = "nn.ReLU",
                 dropout_ratio: Sequence[float] = (), gamma: float = 2.0):
        self.in_dim = in_dim
        self.hidden_units = list(hidden_units)
        self.activation = activation
        dr = list(dropout_ratio)
        self.dropout = dr + [0.0] * (len(self.hidden_units) - len(dr))
        self.gates: List[GateNU] = []
        d = in_dim
        for h in self.hidden_units:
            self.gates.append(GateNU(prior_dim + in_dim, h, h, gamma))
            d = h
        self._out = d

    def output_dim(self) -> int:
        return self._out

    def init(self, key):
        params = {"layers": [], "gates": []}
        d = self.in_dim
        for i, h in enumerate(self.hidden_units):
            key, k1, k2 = jax.random.split(key, 3)
            params["layers"].append(M.linear_init(k1, d, h))
            params["gates"].append(self.gates[i].init(k2))
            d = h
        return params

    def __call__(self, params, x, prior, ctx: M.Context):
        gate_in = jnp.concatenate(
            [prior, jax.lax.stop_gradient(x)], axis=-1
        )
        h = x
        for i in range(len(self.hidden_units)):
            h = M.linear_apply(params["layers"][i], h, ctx)
            h = A.apply_activation(self.activation, {}, h, ctx)
            gate = self.gates[i](params["gates"][i], gate_in, ctx)
            h = h * gate
            h = M.dropout(h, self.dropout[i], ctx)
        return h
