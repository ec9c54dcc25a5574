"""Sequence encoders: DIN / SimpleAttention / Pooling / SelfAttention /
MultiWindowDIN.

Counterpart of /root/reference/tzrec/modules/sequence.py (:49-330).
Encoders consume the embedded-group dict keys ``{input}.query`` [B, Dq],
``{input}.sequence`` [B, L, Ds], ``{input}.sequence_length`` [B] and
return [B, D_out]. All math is masked static-shape XLA (no jagged ops
needed at these sizes; padding positions are masked to -2^31 before
softmax exactly like the reference).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.mlp import MLP, mlp_from_config
from torcheasyrec_tpu.utils.load_class import get_register_class_meta

_SEQ_ENCODER_CLASS_MAP: Dict[str, type] = {}
_meta = get_register_class_meta(_SEQ_ENCODER_CLASS_MAP)

_NEG_PAD = -(2.0 ** 31) + 1


class SequenceEncoder(M.Module, metaclass=_meta):
    def __init__(self, input: str) -> None:
        self.input = input

    def output_dim(self) -> int:
        raise NotImplementedError

    def init(self, key: jax.Array) -> M.Params:
        return {}

    def __call__(self, params, group: Dict[str, jnp.ndarray], ctx: M.Context):
        raise NotImplementedError


def _mask_scores(scores, lengths, max_len):
    mask = (
        jnp.arange(max_len, dtype=jnp.int32)[None, :]
        < lengths.astype(jnp.int32)[:, None]
    )
    return jnp.where(mask, scores, _NEG_PAD)


class DINEncoder(SequenceEncoder):
    """Target attention (reference sequence.py:65-128): scores =
    masked softmax over Linear(MLP([q, s, q-s, q*s])); out = scores @ s."""

    def __init__(
        self,
        sequence_dim: int,
        query_dim: int,
        input: str,
        attn_mlp: Dict[str, Any],
        max_seq_length: int = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(input)
        if query_dim > sequence_dim:
            raise ValueError("query_dim > sequence_dim not supported")
        self._query_dim = query_dim
        self._sequence_dim = sequence_dim
        self._max_seq_length = max_seq_length
        self.mlp = mlp_from_config(sequence_dim * 4, attn_mlp)

    def output_dim(self) -> int:
        return self._sequence_dim

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        return {
            "mlp": self.mlp.init(k1),
            "linear": M.linear_init(k2, self.mlp.output_dim(), 1),
        }

    def __call__(self, params, group, ctx, path: str = "din"):
        query = group[f"{self.input}.query"]
        sequence = group[f"{self.input}.sequence"]
        lengths = group[f"{self.input}.sequence_length"]
        if self._max_seq_length > 0:
            lengths = jnp.minimum(lengths, self._max_seq_length)
            sequence = sequence[:, : self._max_seq_length, :]
        b, max_len, d = sequence.shape
        if self._query_dim < self._sequence_dim:
            query = jnp.pad(
                query, ((0, 0), (0, self._sequence_dim - self._query_dim))
            )
        queries = jnp.broadcast_to(query[:, None, :], (b, max_len, d))
        attn_in = jnp.concatenate(
            [queries, sequence, queries - sequence, queries * sequence], axis=-1
        )
        h = self.mlp(params["mlp"], attn_in, ctx, path=f"{path}.mlp")
        scores = M.linear_apply(params["linear"], h, ctx)[..., 0]  # [B, L]
        scores = jax.nn.softmax(
            _mask_scores(scores.astype(jnp.float32), lengths, max_len), axis=-1
        )
        return jnp.einsum(
            "bl,bld->bd", scores.astype(sequence.dtype), sequence
        )


class SimpleAttention(SequenceEncoder):
    """Dot-product attention (reference sequence.py:131-176)."""

    def __init__(
        self,
        sequence_dim: int,
        query_dim: int,
        input: str,
        max_seq_length: int = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(input)
        self._sequence_dim = sequence_dim
        self._max_seq_length = max_seq_length

    def output_dim(self) -> int:
        return self._sequence_dim

    def __call__(self, params, group, ctx, path: str = "din"):
        query = group[f"{self.input}.query"]
        sequence = group[f"{self.input}.sequence"]
        lengths = group[f"{self.input}.sequence_length"]
        if self._max_seq_length > 0:
            lengths = jnp.minimum(lengths, self._max_seq_length)
            sequence = sequence[:, : self._max_seq_length, :]
        b, max_len, d = sequence.shape
        scores = jnp.einsum("bld,bd->bl", sequence, query)
        scores = jax.nn.softmax(
            _mask_scores(scores.astype(jnp.float32), lengths, max_len), axis=-1
        )
        return jnp.einsum("bl,bld->bd", scores.astype(sequence.dtype), sequence)


class PoolingEncoder(SequenceEncoder):
    """Masked sum/mean pooling (reference sequence.py:179-230)."""

    def __init__(
        self,
        sequence_dim: int,
        input: str,
        pooling_type: str = "mean",
        max_seq_length: int = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(input)
        assert pooling_type in ("sum", "mean")
        self._sequence_dim = sequence_dim
        self._pooling_type = pooling_type
        self._max_seq_length = max_seq_length

    def output_dim(self) -> int:
        return self._sequence_dim

    def __call__(self, params, group, ctx, path: str = ""):
        sequence = group[f"{self.input}.sequence"]
        lengths = group[f"{self.input}.sequence_length"]
        if self._max_seq_length > 0:
            lengths = jnp.minimum(lengths, self._max_seq_length)
            sequence = sequence[:, : self._max_seq_length, :]
        b, max_len, d = sequence.shape
        mask = (
            jnp.arange(max_len, dtype=jnp.int32)[None, :]
            < lengths.astype(jnp.int32)[:, None]
        )
        pooled = jnp.sum(sequence * mask[..., None], axis=1)
        if self._pooling_type == "mean":
            pooled = pooled / jnp.maximum(
                lengths.astype(pooled.dtype), 1.0
            )[:, None]
        return pooled


class SelfAttentionEncoder(SequenceEncoder):
    """Multi-head self attention + masked mean (reference sequence.py:233+)."""

    def __init__(
        self,
        sequence_dim: int,
        input: str,
        multihead_attn_dim: int = 512,
        num_heads: int = 8,
        dropout: float = 0.0,
        max_seq_length: int = 0,
        **kwargs: Any,
    ) -> None:
        super().__init__(input)
        self._sequence_dim = sequence_dim
        self._attn_dim = multihead_attn_dim
        self._num_heads = num_heads
        self._dropout = dropout
        self._max_seq_length = max_seq_length
        assert multihead_attn_dim % num_heads == 0

    def output_dim(self) -> int:
        return self._attn_dim

    def init(self, key: jax.Array) -> M.Params:
        ks = M.split_keys(key, 4)
        d, a = self._sequence_dim, self._attn_dim
        return {
            "q": M.linear_init(ks[0], d, a),
            "k": M.linear_init(ks[1], d, a),
            "v": M.linear_init(ks[2], d, a),
            "o": M.linear_init(ks[3], a, a),
        }

    def __call__(self, params, group, ctx, path: str = ""):
        sequence = group[f"{self.input}.sequence"]
        lengths = group[f"{self.input}.sequence_length"]
        if self._max_seq_length > 0:
            lengths = jnp.minimum(lengths, self._max_seq_length)
            sequence = sequence[:, : self._max_seq_length, :]
        b, L, _ = sequence.shape
        h = self._num_heads
        dh = self._attn_dim // h
        q = M.linear_apply(params["q"], sequence, ctx).reshape(b, L, h, dh)
        k = M.linear_apply(params["k"], sequence, ctx).reshape(b, L, h, dh)
        v = M.linear_apply(params["v"], sequence, ctx).reshape(b, L, h, dh)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dh)
        ).astype(q.dtype)
        mask = (
            jnp.arange(L, dtype=jnp.int32)[None, :]
            < lengths.astype(jnp.int32)[:, None]
        )  # [B, L]
        logits = jnp.where(
            mask[:, None, None, :], logits.astype(jnp.float32), _NEG_PAD
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        attn = M.dropout(attn, self._dropout, ctx)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, L, -1)
        out = M.linear_apply(params["o"], out, ctx)
        # masked mean over valid positions
        out = jnp.sum(out * mask[..., None], axis=1) / jnp.maximum(
            lengths.astype(out.dtype), 1.0
        )[:, None]
        return out


class MultiWindowDINEncoder(SequenceEncoder):
    """DIN attention pooled per time window (reference sequence.py:270-330,
    used by TDM). windows_len partitions the sequence into contiguous
    windows; each window's attended sum is a separate output block."""

    def __init__(
        self,
        sequence_dim: int,
        query_dim: int,
        input: str,
        attn_mlp: Dict[str, Any],
        windows_len: Optional[list] = None,
        **kwargs: Any,
    ) -> None:
        super().__init__(input)
        self._sequence_dim = sequence_dim
        self._query_dim = query_dim
        self.windows_len = list(windows_len or [])
        self.mlp = mlp_from_config(sequence_dim * 4, attn_mlp)

    def output_dim(self) -> int:
        return self._sequence_dim * (len(self.windows_len) + 1)

    def init(self, key: jax.Array) -> M.Params:
        k1, k2 = jax.random.split(key)
        return {
            "mlp": self.mlp.init(k1),
            "linear": M.linear_init(k2, self.mlp.output_dim(), 1),
        }

    def __call__(self, params, group, ctx, path: str = "din"):
        query = group[f"{self.input}.query"]
        sequence = group[f"{self.input}.sequence"]
        lengths = group[f"{self.input}.sequence_length"]
        b, max_len, d = sequence.shape
        if self._query_dim < self._sequence_dim:
            query = jnp.pad(
                query, ((0, 0), (0, self._sequence_dim - self._query_dim))
            )
        queries = jnp.broadcast_to(query[:, None, :], (b, max_len, d))
        attn_in = jnp.concatenate(
            [queries, sequence, queries - sequence, queries * sequence], axis=-1
        )
        h = self.mlp(params["mlp"], attn_in, ctx, path=f"{path}.mlp")
        scores = M.linear_apply(params["linear"], h, ctx)[..., 0]
        valid = (
            jnp.arange(max_len, dtype=jnp.int32)[None, :]
            < lengths.astype(jnp.int32)[:, None]
        )
        weighted = sequence * jax.nn.sigmoid(
            scores.astype(jnp.float32)
        ).astype(sequence.dtype)[..., None] * valid[..., None]
        # per-window sums + whole-sequence sum
        outs = [jnp.sum(weighted, axis=1)]
        start = 0
        for w in self.windows_len:
            end = min(start + int(w), max_len)
            if end > start:
                outs.append(jnp.sum(weighted[:, start:end], axis=1))
            else:
                outs.append(jnp.zeros((b, d), weighted.dtype))
            start = end
        return jnp.concatenate(outs, axis=-1)[:, : self.output_dim()]


def create_seq_encoder(
    seq_encoder_config, group_total_dims: Dict[str, int],
    default_input: str = "",
) -> SequenceEncoder:
    """Factory from SeqEncoderConfig proto (reference sequence.py registry).

    group_total_dims: maps "{group}.query"/"{group}.sequence" -> dim.
    """
    from torcheasyrec_tpu.utils.config_util import config_to_kwargs

    which = seq_encoder_config.WhichOneof("seq_module")
    cfg = getattr(seq_encoder_config, which)
    kwargs = config_to_kwargs(cfg)
    kwargs.pop("name", None)
    # `input` is optional when the feature group has exactly one
    # sequence group (reference sequence configs omit it)
    input_name = kwargs.pop("input", "") or default_input
    seq_dim = group_total_dims[f"{input_name}.sequence"]
    query_dim = group_total_dims.get(f"{input_name}.query", seq_dim)
    cls_name = {
        "din_encoder": "DINEncoder",
        "simple_attention": "SimpleAttention",
        "pooling_encoder": "PoolingEncoder",
        "self_attention_encoder": "SelfAttentionEncoder",
        "multi_window_din_encoder": "MultiWindowDINEncoder",
    }[which]
    cls = _SEQ_ENCODER_CLASS_MAP[cls_name]
    return cls(
        sequence_dim=seq_dim, query_dim=query_dim, input=input_name, **kwargs
    )
