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


def test_sla_mask_semantics():
    """SLA mask (reference build_sla_func_tensor semantics): history rows
    attend to global prefix + local causal window; target rows attend to
    all history only; k1 >= N with k2 = 0 degrades to plain causal."""
    import numpy as np

    from torcheasyrec_tpu.ops.hstu import valid_attn_mask

    n = 12
    lengths = jnp.asarray([12, 9], jnp.int32)
    num_targets = jnp.asarray([3, 2], jnp.int32)
    k1, k2 = 3, 2
    got = np.asarray(valid_attn_mask(
        n, lengths, causal=True, num_targets=num_targets,
        sla_k1=k1, sla_k2=k2,
    ))

    for b, (L, T) in enumerate([(12, 3), (9, 2)]):
        H = L - T
        for r in range(n):
            for c in range(n):
                if c >= L or r >= L:  # padded rows output zeros
                    expect = False
                elif r < H:
                    expect = (c < min(k2, r + 1)) or (
                        max(k2, r - k1 + 1) <= c <= r
                    )
                else:
                    expect = c < H
                assert got[b, r, c] == expect, (b, r, c)

    # k1 >= N, k2 = 0, no targets -> plain causal
    full = np.asarray(valid_attn_mask(
        n, lengths, causal=True, sla_k1=n, sla_k2=0,
    ))
    causal = np.asarray(valid_attn_mask(n, lengths, causal=True))
    np.testing.assert_array_equal(full, causal)


def test_sla_attention_runs_and_differs():
    """SLA restricts attention: outputs differ from full causal but agree
    when the window spans everything."""
    from torcheasyrec_tpu.ops import Kernel
    from torcheasyrec_tpu.ops.hstu import hstu_mha

    rng = jax.random.key(0)
    b, n, h, d = 2, 16, 2, 8
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)
    lengths = jnp.asarray([16, 11], jnp.int32)
    base = hstu_mha(q, k, v, lengths, alpha=0.1, kernel=Kernel.JAX)
    sla_full = hstu_mha(
        q, k, v, lengths, alpha=0.1, kernel=Kernel.JAX, sla_k1=n,
    )
    np.testing.assert_allclose(base, sla_full, rtol=1e-5, atol=1e-6)
    sla_narrow = hstu_mha(
        q, k, v, lengths, alpha=0.1, kernel=Kernel.JAX, sla_k1=2, sla_k2=1,
    )
    assert np.abs(np.asarray(sla_narrow - base)).max() > 1e-3


def test_truncate_uih_repacking():
    """truncate_uih keeps [ctx | last tail UIH | targets] contiguously
    and rewrites lengths (reference HSTU attn_truncation_*)."""
    from torcheasyrec_tpu.modules.gr.stu import truncate_uih

    b, n, e = 2, 12, 4
    n_ctx, tail, max_t = 2, 3, 2
    # token value = its position, to track the gather
    x = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32)[None, :, None], (b, n, e)
    )
    lengths = jnp.asarray([10, 5], jnp.int32)  # sample 1: short uih
    num_targets = jnp.asarray([2, 1], jnp.int32)
    x2, len2, (safe, valid) = truncate_uih(
        x, lengths, num_targets, tail, n_ctx, max_t
    )
    assert x2.shape == (b, n_ctx + tail + max_t, e)
    # sample 0: H=8, uih=[2..7], keep last 3 -> [5,6,7], targets [8,9]
    np.testing.assert_array_equal(
        np.asarray(x2[0, :, 0]), [0, 1, 5, 6, 7, 8, 9]
    )
    assert int(len2[0]) == 2 + 3 + 2
    # sample 1: H=4, uih=[2,3] (keep 2), target [4], rest zero-padded
    np.testing.assert_array_equal(
        np.asarray(x2[1, :5, 0]), [0, 1, 2, 3, 4]
    )
    np.testing.assert_array_equal(np.asarray(x2[1, 5:, 0]), [0, 0])
    assert int(len2[1]) == 2 + 2 + 1


@pytest.mark.parametrize("ctx_len", [0, 4])
def test_pallas_sla_matches_xla(ctx_len):
    """Pallas SLA (block-skipping) must match the XLA masked path for
    forward AND gradients, with targets and contextual prefix."""
    from torcheasyrec_tpu.ops.hstu import _jax_hstu_mha
    from torcheasyrec_tpu.ops.pallas.hstu_attention import pallas_hstu_mha

    b, n, h, d = 2, 256, 2, 32
    ks = jax.random.split(jax.random.key(3), 3)
    q = jax.random.normal(ks[0], (b, n, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, n, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, n, h, d), jnp.float32)
    lengths = jnp.asarray([256, 190], jnp.int32)
    num_targets = jnp.asarray([8, 5], jnp.int32)
    k1, k2 = 32, 16

    def xla_fn(q, k, v):
        return _jax_hstu_mha(
            q, k, v, lengths, 0.1, True, num_targets, 0, ctx_len, 0, n,
            sla_k1=k1, sla_k2=k2,
        ).sum()

    def pallas_fn(q, k, v):
        return pallas_hstu_mha(
            q, k, v, lengths, alpha=0.1, causal=True,
            num_targets=num_targets, contextual_seq_len=ctx_len,
            scaling_seqlen=n, sla_k1=k1, sla_k2=k2,
        ).sum()

    o1, g1 = jax.value_and_grad(xla_fn, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        o2, g2 = jax.value_and_grad(pallas_fn, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(o1, o2, rtol=2e-4)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-5)


def test_stu_cached_incremental_matches_full():
    """KV-cached incremental decode through a 2-layer STU stack must
    reproduce the full forward's outputs for the new tokens."""
    from torcheasyrec_tpu.modules.gr.stu import STULayer, STUStack
    from torcheasyrec_tpu.modules import module as M
    from torcheasyrec_tpu.ops import Kernel

    b, n, e = 2, 24, 16
    layer = STULayer(
        embedding_dim=e, linear_hidden_dim=8, attention_dim=8,
        num_heads=2, kernel=Kernel.JAX,
    )
    stack = STUStack(layer, 2)
    params = stack.init(jax.random.key(0))
    ctx = M.Context(training=False)
    x = jax.random.normal(jax.random.key(1), (b, n, e), jnp.float32)
    lengths = jnp.asarray([20, 20], jnp.int32)

    full = stack(params, x, lengths, ctx, scaling_seqlen=n)

    # prefill 16 tokens, then decode 4 new tokens incrementally
    caches = stack.init_cache(b, n)
    _, caches = stack.cached_forward(
        params, x[:, :16], jnp.asarray([16, 16], jnp.int32), caches,
        ctx, scaling_seqlen=n,
    )
    y, caches = stack.cached_forward(
        params, x[:, 16:20], lengths, caches, ctx, scaling_seqlen=n,
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(full[:, 16:20]), rtol=1e-4, atol=1e-5,
    )

    # one-token-at-a-time decode also matches
    caches2 = stack.init_cache(b, n)
    _, caches2 = stack.cached_forward(
        params, x[:, :16], jnp.asarray([16, 16], jnp.int32), caches2,
        ctx, scaling_seqlen=n,
    )
    outs = []
    for t in range(16, 20):
        yt, caches2 = stack.cached_forward(
            params, x[:, t : t + 1],
            jnp.full((b,), t + 1, jnp.int32), caches2, ctx,
            scaling_seqlen=n,
        )
        outs.append(yt)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, axis=1)),
        np.asarray(full[:, 16:20]), rtol=1e-4, atol=1e-5,
    )
