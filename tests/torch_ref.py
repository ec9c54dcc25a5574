"""Torch reference implementations for cross-framework parity tests.

These mirror the REFERENCE's module math (tzrec/modules/interaction.py,
masknet.py, mmoe.py, sequence.py, fm.py, ops/_pytorch/pt_hstu_attention.py)
in plain torch, written independently from the formulas. The parity
tests inject identical weights into these and into the jax modules and
assert forward/grad equality — substituting for the reference's
real-data AUC labels, which need datasets absent from this
environment (see BASELINE.md).

torch runs CPU-only here; keep shapes small.
"""

from typing import List, Optional, Sequence

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

torch.set_num_threads(2)


def t(x) -> torch.Tensor:
    return torch.tensor(np.array(x), dtype=torch.float32)


def load_linear(mod: nn.Linear, p: dict) -> None:
    """Load a jax linear param dict {kernel [in,out], bias [out]}."""
    with torch.no_grad():
        mod.weight.copy_(t(p["kernel"]).T)
        if "bias" in p and mod.bias is not None:
            mod.bias.copy_(t(p["bias"]))


def make_linear(p: dict) -> nn.Linear:
    kin, kout = np.asarray(p["kernel"]).shape
    lin = nn.Linear(kin, kout, bias="bias" in p)
    load_linear(lin, p)
    return lin


class TorchMLP(nn.Module):
    """Linear -> ReLU stack (reference mlp.py Perceptron, ReLU/no-norm)."""

    def __init__(self, jax_params: dict, n_layers: int):
        super().__init__()
        self.layers = nn.ModuleList(
            [make_linear(jax_params[f"layer_{i}"]["linear"])
             for i in range(n_layers)]
        )

    def forward(self, x):
        for lin in self.layers:
            x = F.relu(lin(x))
        return x


def torch_fm(x: torch.Tensor) -> torch.Tensor:
    """0.5 * ((sum_f v)^2 - sum_f v^2), x: [B, F, D] (reference fm.py:17)."""
    sum_sq = x.sum(dim=1).square()
    sq_sum = x.square().sum(dim=1)
    return 0.5 * (sum_sq - sq_sum)


class TorchCross(nn.Module):
    """DCN v1: x_{l+1} = x0 * (w_l . x_l) + b_l + x_l
    (reference interaction.py:94)."""

    def __init__(self, jax_params: dict, n: int):
        super().__init__()
        self.w = nn.ParameterList(
            [nn.Parameter(t(jax_params[f"layer_{i}"]["w"]))
             for i in range(n)]
        )
        self.b = nn.ParameterList(
            [nn.Parameter(t(jax_params[f"layer_{i}"]["b"]))
             for i in range(n)]
        )

    def forward(self, x0):
        x = x0
        for w, b in zip(self.w, self.b):
            xw = (x * w).sum(dim=-1, keepdim=True)
            x = x0 * xw + b + x
        return x


class TorchCrossV2(nn.Module):
    """DCN v2 low-rank: x_{l+1} = x0 * (U (V^T x) + b) + x
    (reference interaction.py:135)."""

    def __init__(self, jax_params: dict, n: int):
        super().__init__()
        self.u = nn.ModuleList(
            [make_linear(jax_params[f"layer_{i}"]["u"]) for i in range(n)]
        )
        self.v = nn.ModuleList(
            [make_linear(jax_params[f"layer_{i}"]["v"]) for i in range(n)]
        )

    def forward(self, x0):
        x = x0
        for u, v in zip(self.u, self.v):
            x = x0 * u(v(x)) + x
        return x


class TorchCIN(nn.Module):
    """xDeepFM CIN (reference interaction.py:183)."""

    def __init__(self, jax_params: dict, sizes: Sequence[int]):
        super().__init__()
        self.w = nn.ParameterList(
            [nn.Parameter(t(jax_params[f"layer_{i}"]["w"]))
             for i in range(len(sizes))]
        )

    def forward(self, x0):
        b, f, d = x0.shape
        xk = x0
        outs = []
        for w in self.w:
            z = torch.einsum("bhd,bfd->bhfd", xk, x0).reshape(b, -1, d)
            xk = torch.einsum("bzd,zh->bhd", z, w)
            outs.append(xk.sum(dim=-1))
        return torch.cat(outs, dim=-1)


class TorchMaskBlock(nn.Module):
    """MaskNet block (reference masknet.py:20-85): mask_generator =
    Linear->ReLU->Linear over mask_input; ffn = Linear->LN->ReLU over
    masked input."""

    def __init__(self, jax_params: dict):
        super().__init__()
        self.agg = make_linear(jax_params["agg"])
        self.mask = make_linear(jax_params["mask"])
        self.hidden = make_linear(jax_params["hidden"])
        h = self.hidden.out_features
        self.ln = nn.LayerNorm(h)
        with torch.no_grad():
            self.ln.weight.copy_(t(jax_params["ln"]["scale"]))
            self.ln.bias.copy_(t(jax_params["ln"]["bias"]))

    def forward(self, x, mask_input):
        weights = self.mask(F.relu(self.agg(mask_input)))
        return F.relu(self.ln(self.hidden(x * weights)))


class TorchDINAttention(nn.Module):
    """DIN target attention (reference sequence.py:65-128): scores =
    masked softmax of Linear(MLP([q, s, q-s, q*s])); out = scores @ s."""

    def __init__(self, jax_params: dict, n_mlp_layers: int):
        super().__init__()
        self.mlp = TorchMLP(jax_params["mlp"], n_mlp_layers)
        self.linear = make_linear(jax_params["linear"])

    def forward(self, query, sequence, lengths):
        b, n, d = sequence.shape
        queries = query.unsqueeze(1).expand(b, n, d)
        attn_in = torch.cat(
            [queries, sequence, queries - sequence, queries * sequence],
            dim=-1,
        )
        scores = self.linear(self.mlp(attn_in)).squeeze(-1)  # [B, N]
        mask = torch.arange(n).view(1, n) < lengths.view(b, 1)
        scores = scores.masked_fill(~mask, float(-(2 ** 31)))
        scores = torch.softmax(scores, dim=-1)
        return torch.einsum("bn,bnd->bd", scores, sequence)


class TorchMMoE(nn.Module):
    """MMoE (reference mmoe.py:21): N experts + per-task softmax gates."""

    def __init__(self, jax_params: dict, n_expert: int, n_task: int,
                 n_mlp_layers: int):
        super().__init__()
        self.experts = nn.ModuleList(
            [TorchMLP(jax_params["experts"][i], n_mlp_layers)
             for i in range(n_expert)]
        )
        self.gates = nn.ModuleList(
            [make_linear(jax_params["gates"][i]["linear"])
             for i in range(n_task)]
        )

    def forward(self, x) -> List[torch.Tensor]:
        eo = torch.stack([e(x) for e in self.experts], dim=1)  # [B, E, D]
        outs = []
        for g in self.gates:
            gate = torch.softmax(g(x), dim=-1)
            outs.append(torch.einsum("be,bed->bd", gate, eo))
        return outs


def torch_hstu_mha(
    q: torch.Tensor,  # [B, N, H, D]
    k: torch.Tensor,
    v: torch.Tensor,
    lengths: torch.Tensor,  # [B]
    alpha: float,
    causal: bool = True,
    num_targets: Optional[torch.Tensor] = None,
    max_attn_len: int = 0,
    scaling_seqlen: int = -1,
) -> torch.Tensor:
    """Padded-dense HSTU attention per the reference formula
    (pt_hstu_attention.py:195-233 + _get_valid_attn_mask): out =
    (SiLU(qk^T * alpha) / scaling) * mask @ v. Inputs are zero-padded
    beyond lengths (the jagged->dense convention), so padded columns
    contribute exactly zero; only rows < length are meaningful."""
    b, n, h, d = q.shape
    if scaling_seqlen == -1:
        scaling_seqlen = n
    # zero-pad beyond lengths like fbgemm jagged->dense
    pos = torch.arange(n).view(1, n, 1, 1)
    pad = pos < lengths.view(b, 1, 1, 1)
    q, k, v = q * pad, k * pad, v * pad
    qk = torch.einsum("bnhd,bmhd->bhnm", q, k) * alpha
    a = F.silu(qk) / scaling_seqlen

    ids = torch.arange(n).view(1, n)
    max_ids = lengths.view(-1, 1, 1)
    if num_targets is not None:
        max_ids = max_ids - num_targets.view(-1, 1, 1)
        ids = torch.minimum(
            ids.view(1, n, 1).expand(b, n, 1), max_ids
        )
        row_ids = ids.view(b, n, 1).expand(b, n, n)
        col_ids = ids.view(b, 1, n).expand(b, n, n)
    else:
        row_ids = ids.view(n, 1).expand(n, n).unsqueeze(0)
        col_ids = row_ids.transpose(1, 2)
    dist = row_ids - col_ids
    if not causal:
        dist = dist.abs()
    mask = torch.eye(n, dtype=torch.bool).view(1, n, n) | (dist > 0)
    if max_attn_len > 0:
        mask = mask & (dist <= max_attn_len)
    a = a * mask.unsqueeze(1)
    out = torch.einsum("bhnm,bmhv->bnhv", a, v)
    return out
