"""MLP / Perceptron stack.

Counterpart of /root/reference/tzrec/modules/mlp.py (MLP:21, Perceptron:86):
per layer Linear -> [BN|LN] -> activation -> dropout.
"""

from typing import List, Optional, Sequence

import jax

from torcheasyrec_tpu.modules import activation as A
from torcheasyrec_tpu.modules import module as M


class MLP(M.Module):
    def __init__(
        self,
        in_features: int,
        hidden_units: Sequence[int],
        activation: str = "nn.ReLU",
        use_bn: bool = False,
        use_ln: bool = False,
        dropout_ratio: Optional[Sequence[float]] = None,
        bias: bool = True,
        **_: object,
    ) -> None:
        self.in_features = in_features
        self.hidden_units = list(hidden_units)
        self.activation = activation
        self.use_bn = use_bn
        self.use_ln = use_ln
        self.bias = bias
        dr = list(dropout_ratio or [])
        if len(dr) == 1 and len(self.hidden_units) > 1:
            dr = dr * len(self.hidden_units)
        self.dropout_ratio: List[float] = dr + [0.0] * (
            len(self.hidden_units) - len(dr)
        )

    def output_dim(self) -> int:
        return self.hidden_units[-1] if self.hidden_units else self.in_features

    def init(self, key: jax.Array) -> M.Params:
        params = {}
        dim = self.in_features
        keys = M.split_keys(key, max(len(self.hidden_units) * 2, 1))
        for i, h in enumerate(self.hidden_units):
            layer = {"linear": M.linear_init(keys[2 * i], dim, h, self.bias)}
            if self.use_bn:
                layer["bn"] = M.batch_norm_init(h)
            if self.use_ln:
                layer["ln"] = M.layer_norm_init(h)
            if A.act_needs_params(self.activation):
                layer["act"] = A.init_activation(
                    self.activation, h, keys[2 * i + 1]
                )
            params[f"layer_{i}"] = layer
            dim = h
        return params

    def __call__(self, params: M.Params, x, ctx: M.Context, path: str = "mlp"):
        for i in range(len(self.hidden_units)):
            layer = params[f"layer_{i}"]
            x = M.linear_apply(layer["linear"], x, ctx)
            if self.use_bn:
                x = M.batch_norm_apply(layer["bn"], x, ctx, f"{path}.layer_{i}.bn")
            if self.use_ln:
                x = M.layer_norm_apply(layer["ln"], x)
            x = A.apply_activation(
                self.activation, layer.get("act", {}), x, ctx,
                f"{path}.layer_{i}.act",
            )
            x = M.dropout(x, self.dropout_ratio[i], ctx)
        return x


def mlp_from_config(in_features: int, cfg: dict) -> MLP:
    """Build an MLP from a config_to_kwargs dict of the MLP proto."""
    return MLP(
        in_features=in_features,
        hidden_units=cfg.get("hidden_units", []),
        activation=cfg.get("activation", "nn.ReLU"),
        use_bn=cfg.get("use_bn", False),
        use_ln=cfg.get("use_ln", False),
        dropout_ratio=cfg.get("dropout_ratio", []),
        bias=cfg.get("bias", True),
    )
