"""Ops-layer parity tests: norms, addmm, jagged ops, delta attention."""

import jax
import jax.numpy as jnp
import numpy as np

from torcheasyrec_tpu.ops.hstu import _jax_hstu_mha, delta_hstu_mha
from torcheasyrec_tpu.ops.jagged import (
    add_positional_embeddings,
    concat_2D_jagged,
    jagged_dense_bmm_broadcast_add,
    split_2D_jagged,
)
from torcheasyrec_tpu.ops.norms import (
    addmm,
    layer_norm,
    rms_norm,
    swish_layer_norm,
)


def test_norms():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    w = jnp.ones((16,))
    b = jnp.zeros((16,))
    ln = np.asarray(layer_norm(x, w, b))
    np.testing.assert_allclose(ln.mean(axis=-1), 0, atol=1e-5)
    np.testing.assert_allclose(ln.std(axis=-1), 1, atol=1e-2)
    rn = np.asarray(rms_norm(x, w))
    ref = np.asarray(x) / np.sqrt(
        (np.asarray(x) ** 2).mean(-1, keepdims=True) + 1e-5
    )
    np.testing.assert_allclose(rn, ref, rtol=1e-5)
    sn = np.asarray(swish_layer_norm(x, w, b))
    np.testing.assert_allclose(
        sn, np.asarray(x) * (1 / (1 + np.exp(-ln))), rtol=1e-4
    )
    y = addmm(jnp.ones((4,)), x[:, :4], jnp.eye(4, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x[:, :4]) + 1,
                               rtol=1e-6)


def test_concat_split_roundtrip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(3, 5, 4)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(3, 4, 4)).astype(np.float32))
    la = jnp.asarray([5, 2, 0], jnp.int32)
    lb = jnp.asarray([1, 4, 3], jnp.int32)
    cat, lengths = concat_2D_jagged(a, la, b, lb)
    np.testing.assert_array_equal(np.asarray(lengths), [6, 6, 3])
    # sample 1: [a[1,:2], b[1,:4]]
    np.testing.assert_allclose(np.asarray(cat[1, :2]), np.asarray(a[1, :2]))
    np.testing.assert_allclose(np.asarray(cat[1, 2:6]), np.asarray(b[1, :4]))
    # split back
    a2, b2 = split_2D_jagged(cat, la, 5, 4)
    np.testing.assert_allclose(np.asarray(a2[1, :2]), np.asarray(a[1, :2]))
    np.testing.assert_allclose(np.asarray(b2[1, :4]), np.asarray(b[1, :4]))


def test_jagged_dense_bmm():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    lengths = jnp.asarray([6, 2], jnp.int32)
    out = np.asarray(jagged_dense_bmm_broadcast_add(s, lengths, d, bias))
    ref = np.einsum("bnk,bkd->bnd", np.asarray(s), np.asarray(d)) + \
        np.asarray(bias)[:, None]
    np.testing.assert_allclose(out[0], ref[0], rtol=1e-5)
    np.testing.assert_allclose(out[1, :2], ref[1, :2], rtol=1e-5)
    np.testing.assert_allclose(out[1, 2:], 0)


def test_add_positional_embeddings():
    rng = np.random.default_rng(0)
    v = jnp.zeros((2, 4, 3), jnp.float32)
    pe = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
    lengths = jnp.asarray([4, 2], jnp.int32)
    out = np.asarray(add_positional_embeddings(v, lengths, pe))
    np.testing.assert_allclose(out[0], np.asarray(pe[:4]))
    # padding positions untouched (stay 0)
    np.testing.assert_allclose(out[1, 2:], 0)


def test_delta_attention_matches_full():
    """delta_hstu_mha on the last Ld tokens == full attention's rows."""
    rng = np.random.default_rng(0)
    b, n, h, d, ld = 2, 16, 2, 8, 3
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    lengths = jnp.asarray([16, 10], jnp.int32)
    full = _jax_hstu_mha(q, k, v, lengths, 0.2, True, None, 0, 0, 0, n)
    # extract the last ld valid rows' queries per sample
    rows = (lengths[:, None] - ld + jnp.arange(ld)[None, :])
    dq = jnp.take_along_axis(q, rows[:, :, None, None], axis=1)
    delta = delta_hstu_mha(dq, k, v, lengths, 0.2, scaling_seqlen=n)
    ref = jnp.take_along_axis(full, rows[:, :, None, None], axis=1)
    np.testing.assert_allclose(
        np.asarray(delta), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
