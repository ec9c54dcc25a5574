"""HSTU op tests: mask semantics, jax path, pallas-vs-jax equivalence.

Pallas kernels run in TPU-interpret mode on the CPU CI mesh (the real
compiled path is exercised by bench/TPU runs), mirroring the reference's
kernel-vs-_pytorch testing strategy (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from torcheasyrec_tpu.ops import Kernel
from torcheasyrec_tpu.ops.hstu import (
    _jax_hstu_mha,
    hstu_compute_output,
    hstu_compute_uqvk,
    valid_attn_mask,
)
from torcheasyrec_tpu.ops.pallas.hstu_attention import pallas_hstu_mha


def test_valid_attn_mask_causal():
    lengths = jnp.array([4, 2])
    m = np.asarray(valid_attn_mask(4, lengths, causal=True))
    # sample 0: strictly lower triangular + diagonal
    expect0 = np.tril(np.ones((4, 4), bool))
    np.testing.assert_array_equal(m[0], expect0)
    # sample 1: cols >= 2 masked (padding)
    assert not m[1][:, 2:].any()


def test_valid_attn_mask_local_window():
    lengths = jnp.array([6])
    m = np.asarray(valid_attn_mask(6, lengths, causal=True, max_attn_len=2))
    # row 5 attends cols 3,4 (dist<=2) and itself
    np.testing.assert_array_equal(
        m[0][5], [False, False, False, True, True, True]
    )


def test_valid_attn_mask_num_targets():
    # 2 target tokens at the end of a length-6 sequence: targets must not
    # attend to each other (both clamp to id 4 -> dist 0, only diag true)
    lengths = jnp.array([6])
    m = np.asarray(
        valid_attn_mask(6, lengths, causal=True,
                        num_targets=jnp.array([2]))
    )
    assert not m[0][5, 4]  # target 5 does not see target 4
    assert m[0][5, 5]  # itself via eye
    assert m[0][5, :4].all()  # sees full history


def _rand_qkv(b=2, n=128, h=2, d=32, vd=32, seed=0):  # noqa: D103
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, n, h, vd)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, n + 1, size=b).astype(np.int32))
    return q, k, v, lengths


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(causal=True),
        dict(causal=True, max_attn_len=16),
        dict(causal=True, contextual_seq_len=4),
        dict(causal=True, num_targets=True),
        dict(causal=True, max_attn_len=16, min_full_attn_seq_len=8),
        # contextual rows attend ALL columns: must hold across MULTIPLE
        # key blocks (regression: causal block-bound skipped them)
        dict(causal=True, contextual_seq_len=4, n=512),
        dict(causal=True, contextual_seq_len=2, num_targets=True, n=512),
    ],
)
def test_pallas_matches_jax(kwargs):
    kwargs = dict(kwargs)
    n = kwargs.pop("n", 128)
    q, k, v, lengths = _rand_qkv(n=n)
    num_targets = None
    if kwargs.pop("num_targets", False):
        num_targets = jnp.minimum(lengths // 4 + 1, lengths)
    alpha = 0.08
    ref = _jax_hstu_mha(
        q, k, v, lengths, alpha, kwargs.get("causal", True), num_targets,
        kwargs.get("max_attn_len", 0), kwargs.get("contextual_seq_len", 0),
        kwargs.get("min_full_attn_seq_len", 0), n,
    )
    with pltpu.force_tpu_interpret_mode():
        out = pallas_hstu_mha(
            q, k, v, lengths, alpha=alpha, num_targets=num_targets,
            scaling_seqlen=n, **kwargs,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_pallas_grads_match_jax():
    q, k, v, lengths = _rand_qkv(b=2, n=128, h=1, d=16, vd=16)
    alpha = 0.1

    def loss_ref(q, k, v):
        out = _jax_hstu_mha(
            q, k, v, lengths, alpha, True, None, 0, 0, 0, 128
        )
        return jnp.sum(out * out)

    def loss_pl(q, k, v):
        out = pallas_hstu_mha(
            q, k, v, lengths, alpha=alpha, causal=True, scaling_seqlen=128
        )
        return jnp.sum(out * out)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-5
        )


def test_uqvk_and_output_shapes():
    b, n, e, h, ld, ad = 2, 8, 32, 2, 16, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, n, e)).astype(np.float32))
    w = jnp.asarray(
        rng.normal(size=(e, h * ld * 2 + h * ad * 2)).astype(np.float32)
    )
    bias = jnp.zeros((h * ld * 2 + h * ad * 2,), jnp.float32)
    u, v, q, k = hstu_compute_uqvk(
        x, jnp.ones((e,)), jnp.zeros((e,)), w, bias, h, ld, ad
    )
    assert u.shape == (b, n, h * ld)
    assert v.shape == (b, n, h, ld)
    assert q.shape == (b, n, h, ad)
    out = hstu_compute_output(
        v, u, x, jnp.ones((h * ld,)), jnp.zeros((h * ld,)),
        jnp.asarray(rng.normal(size=(h * ld, e)).astype(np.float32)),
        num_heads=h, linear_dim=ld,
    )
    assert out.shape == (b, n, e)
