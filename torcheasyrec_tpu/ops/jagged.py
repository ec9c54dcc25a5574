"""Jagged-tensor ops on the padded-dense TPU representation.

Counterparts of /root/reference/tzrec/ops/{jagged_tensors.py,
_triton/triton_jagged_tensors.py}: concat_2D_jagged, split_2D_jagged,
jagged_dense_bmm_broadcast_add, and dense<->jagged conversion. On TPU
"jagged" means padded [B, N, D] + lengths [B]; concatenation compacts
per-sample segments with a single gather (no dynamic shapes), the same
primitive the HSTU preprocessor uses
(modules/gr/hstu_transducer.py compact_concat).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def concat_2D_jagged(
    a_values: jnp.ndarray,  # [B, Na, D]
    a_lengths: jnp.ndarray,  # [B]
    b_values: jnp.ndarray,  # [B, Nb, D]
    b_lengths: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample [a_i ; b_i] -> padded [B, Na+Nb, D] + lengths."""
    b, na, d = a_values.shape
    nb = b_values.shape[1]
    src = jnp.concatenate([a_values, b_values], axis=1)
    la = a_lengths.astype(jnp.int32)[:, None]
    j = jnp.arange(na + nb, dtype=jnp.int32)[None, :]
    idx = jnp.where(j < la, j, j - la + na)
    idx = jnp.clip(idx, 0, na + nb - 1)
    out = jnp.take_along_axis(src, idx[..., None], axis=1)
    return out, a_lengths.astype(jnp.int32) + b_lengths.astype(jnp.int32)


def split_2D_jagged(
    values: jnp.ndarray,  # [B, N, D] (concat layout from concat_2D_jagged)
    a_lengths: jnp.ndarray,
    max_a: int,
    max_b: int,
    b_lengths: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of concat_2D_jagged: -> ([B, max_a, D], [B, max_b, D]).
    Positions past each segment's length are zeroed."""
    b = values.shape[0]
    la = a_lengths.astype(jnp.int32)[:, None]
    ja = jnp.arange(max_a, dtype=jnp.int32)[None, :]
    a_idx = jnp.clip(jnp.minimum(ja, values.shape[1] - 1), 0, None)
    a_out = jnp.take_along_axis(values, a_idx[..., None], axis=1)
    a_out = jnp.where(
        (ja < la)[..., None], a_out, jnp.zeros_like(a_out)
    )
    jb = jnp.arange(max_b, dtype=jnp.int32)[None, :]
    b_idx = jnp.clip(la + jb, 0, values.shape[1] - 1)
    b_out = jnp.take_along_axis(values, b_idx[..., None], axis=1)
    lb = (
        b_lengths.astype(jnp.int32)[:, None]
        if b_lengths is not None
        else jnp.int32(values.shape[1]) - la
    )
    b_out = jnp.where(
        (jb < lb)[..., None], b_out, jnp.zeros_like(b_out)
    )
    return a_out, b_out


def jagged_dense_bmm_broadcast_add(
    seq_values: jnp.ndarray,  # [B, N, K]
    lengths: jnp.ndarray,  # [B]
    dense: jnp.ndarray,  # [B, K, D]
    bias: jnp.ndarray,  # [B, D] broadcast-added per position
) -> jnp.ndarray:
    """out[b, n] = seq[b, n] @ dense[b] + bias[b], zero past lengths
    (reference ops/jagged_tensors.py jagged_dense_bmm_broadcast_add)."""
    out = jnp.einsum(
        "bnk,bkd->bnd", seq_values, dense,
        preferred_element_type=jnp.float32,
    ) + bias[:, None, :]
    n = seq_values.shape[1]
    mask = (
        jnp.arange(n, dtype=jnp.int32)[None, :]
        < lengths.astype(jnp.int32)[:, None]
    )
    return jnp.where(mask[..., None], out, 0.0).astype(seq_values.dtype)


def dense_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    return (
        jnp.arange(max_len, dtype=jnp.int32)[None, :]
        < lengths.astype(jnp.int32)[:, None]
    )


def add_positional_embeddings(
    values: jnp.ndarray,  # [B, N, D]
    lengths: jnp.ndarray,
    pos_emb: jnp.ndarray,  # [max_pos, D]
    high_inds_from_end: bool = False,
) -> jnp.ndarray:
    """(reference ops/_triton/triton_position.py): add learned positional
    embeddings; optionally indexed from the sequence end."""
    b, n, d = values.shape
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    if high_inds_from_end:
        pos = jnp.maximum(
            lengths.astype(jnp.int32)[:, None] - 1 - pos, 0
        )
    pos = jnp.clip(pos, 0, pos_emb.shape[0] - 1)
    out = values + pos_emb[pos].astype(values.dtype)
    mask = dense_to_mask(lengths, n)
    return jnp.where(mask[..., None], out, values)
