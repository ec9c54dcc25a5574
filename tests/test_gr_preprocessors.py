"""GR preprocessor family: content encoders, contextualized MLPs,
interleave semantics (reference gr/{content_encoder,contextualize_mlps,
preprocessors}.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.modules import module as M
from torcheasyrec_tpu.modules.gr.encoders import SimpleActionEncoder
from torcheasyrec_tpu.modules.gr.hstu_transducer import extract_candidates
from torcheasyrec_tpu.modules.gr.preprocessors import (
    ContextualInterleavePreprocessor,
    MLPContentEncoder,
    PadContentEncoder,
    ParameterizedContextualizedMLP,
    SimpleContextualizedMLP,
    SliceContentEncoder,
    UIHPreprocessor,
    interleave_tokens,
    preprocessor_from_config,
)
from torcheasyrec_tpu.protos import module_pb2


def _ctx(training=True, seed=0):
    return M.Context(training=training, rng=jax.random.PRNGKey(seed))


# ---------------------------------------------------------------------------
# content encoders
# ---------------------------------------------------------------------------


def test_slice_content_encoder():
    enc = SliceContentEncoder(uih_dim=4, cand_dim=6)
    assert enc.output_dim() == 4
    u = jnp.ones((2, 3, 4))
    c = jnp.arange(2 * 2 * 6, dtype=jnp.float32).reshape(2, 2, 6)
    uo, co = enc({}, u, c, _ctx())
    np.testing.assert_array_equal(np.asarray(uo), np.asarray(u))
    np.testing.assert_array_equal(np.asarray(co), np.asarray(c[..., :4]))
    with pytest.raises(ValueError):
        SliceContentEncoder(uih_dim=8, cand_dim=6)


def test_pad_content_encoder():
    enc = PadContentEncoder(uih_dim=4, cand_dim=6)
    assert enc.output_dim() == 6
    p = enc.init(jax.random.PRNGKey(0))
    u = jnp.zeros((2, 3, 4))
    c = jnp.ones((2, 2, 6))
    uo, co = enc(p, u, c, _ctx())
    assert uo.shape == (2, 3, 6)
    # padded tail carries the learned enrich vector on every position
    np.testing.assert_allclose(
        np.asarray(uo[..., 4:]),
        np.broadcast_to(np.asarray(p["enrich"]), (2, 3, 2)),
    )
    np.testing.assert_array_equal(np.asarray(co), np.asarray(c))


def test_mlp_content_encoder():
    enc = MLPContentEncoder(
        uih_dim=4, cand_dim=6,
        uih_mlp={"hidden_units": [8]}, target_mlp={"hidden_units": [8]},
    )
    assert enc.output_dim() == 8
    p = enc.init(jax.random.PRNGKey(0))
    uo, co = enc(p, jnp.ones((2, 3, 4)), jnp.ones((2, 2, 6)), _ctx(False))
    assert uo.shape == (2, 3, 8) and co.shape == (2, 2, 8)
    with pytest.raises(ValueError):
        MLPContentEncoder(4, 6, {"hidden_units": [8]},
                          {"hidden_units": [9]})


# ---------------------------------------------------------------------------
# contextualized MLPs
# ---------------------------------------------------------------------------


def test_simple_contextualized_mlp_shape():
    m = SimpleContextualizedMLP(in_dim=4, out_dim=6, hidden_dim=8)
    p = m.init(jax.random.PRNGKey(0))
    y = m(p, jnp.ones((2, 5, 4)), None, _ctx(False))
    assert y.shape == (2, 5, 6)
    # final LayerNorm: per-token zero mean
    np.testing.assert_allclose(
        np.asarray(jnp.mean(y, -1)), np.zeros((2, 5)), atol=1e-5
    )


def test_parameterized_contextualized_mlp_matches_manual():
    m = ParameterizedContextualizedMLP(
        ctx_dim=3, in_dim=4, out_dim=5, hidden_dim=8,
        contextual_dropout_ratio=0.0,
    )
    p = m.init(jax.random.PRNGKey(1))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 4))
    c = jax.random.normal(jax.random.PRNGKey(3), (2, 3))
    ctx = _ctx(False)
    y = m(p, x, c, ctx)
    w, b = m._weights(p, c, ctx)
    manual = np.einsum(
        "bli,bio->blo", np.asarray(x), np.asarray(w)
    ) + np.asarray(b)[:, None, :]
    np.testing.assert_allclose(np.asarray(y), manual, rtol=1e-4, atol=1e-5)
    # per-sample weights actually differ across samples
    assert not np.allclose(np.asarray(w[0]), np.asarray(w[1]))
    with pytest.raises(ValueError):
        m(p, x, None, ctx)


# ---------------------------------------------------------------------------
# interleave preprocessor
# ---------------------------------------------------------------------------


def _build_pre(enable_interleaving, n_ctx=0, ctx_dim=0):
    content_mlp = text_format.Parse(
        "simple_mlp { hidden_dim: 8 }", module_pb2.GRContextualizedMLP()
    )
    action_mlp = text_format.Parse(
        "simple_mlp { hidden_dim: 8 }", module_pb2.GRContextualizedMLP()
    )
    enc = SliceContentEncoder(uih_dim=4, cand_dim=4)
    act = SimpleActionEncoder(action_embedding_dim=4, action_weights=[1, 2])
    return ContextualInterleavePreprocessor(
        embedding_dim=6,
        uih_content_dim=4,
        cand_content_dim=4,
        content_encoder=enc,
        content_mlp_cfg=content_mlp,
        contextual_dim=ctx_dim,
        n_contextual_tokens=n_ctx,
        action_encoder=act,
        action_mlp_cfg=action_mlp,
        enable_interleaving=enable_interleaving,
        input_dropout_ratio=0.0,
    )


def _inputs(b=2, lu_max=5, lc_max=3, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    return dict(
        uih_emb=jax.random.normal(ks[0], (b, lu_max, 4)),
        uih_lengths=jnp.array([5, 3], jnp.int32),
        cand_emb=jax.random.normal(ks[1], (b, lc_max, 4)),
        cand_lengths=jnp.array([3, 2], jnp.int32),
        action_weights=jax.random.randint(ks[2], (b, lu_max), 0, 4),
        uih_timestamps=jnp.cumsum(
            jax.random.randint(ks[3], (b, lu_max), 1, 100), axis=1
        ).astype(jnp.float32),
        cand_timestamps=jnp.full((b, lc_max), 1e6, jnp.float32),
    )


def test_interleave_train_doubles_all_tokens():
    pre = _build_pre(True)
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    x, lengths, num_targets, ts = pre(p, ctx=_ctx(True), **ins)
    # train: every uih and target step becomes [content, action]
    np.testing.assert_array_equal(np.asarray(lengths), [16, 10])
    np.testing.assert_array_equal(np.asarray(num_targets), [6, 4])
    assert x.shape == (2, 2 * 5 + 2 * 3, 6)
    # timestamps repeat per pair
    t = np.asarray(ts)
    np.testing.assert_array_equal(t[:, 0], t[:, 1])
    np.testing.assert_array_equal(t[:, 2], t[:, 3])


def test_interleave_eval_keeps_targets_single():
    pre = _build_pre(True)
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    x, lengths, num_targets, _ = pre(p, ctx=_ctx(False), **ins)
    np.testing.assert_array_equal(np.asarray(lengths), [13, 8])
    np.testing.assert_array_equal(np.asarray(num_targets), [3, 2])
    assert x.shape == (2, 2 * 5 + 3, 6)


def test_interleave_order_and_candidate_stride():
    """Even offsets carry content tokens, odd offsets action tokens, and
    extract_candidates(stride=2) recovers exactly the content-token
    outputs (reference hstu_transducer.py:430-433)."""
    pre = _build_pre(True)
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    ctx = _ctx(True)
    x, lengths, num_targets, _ = pre(p, ctx=ctx, **ins)

    # recompute the two paths with the module's own components
    u_c, c_c = pre.content_encoder(
        p["content_encoder"], ins["uih_emb"], ins["cand_emb"], ctx
    )
    content_u = pre.content_mlp(p["content_mlp"], u_c, None, ctx)
    a_u = pre.action_encoder(
        p["action"], ins["action_weights"], None, ctx
    )
    action_u = pre.action_mlp(
        p["action_mlp"], a_u.astype(content_u.dtype), None, ctx
    )
    # row 0 has lu=5: position 2k = content_u[k], 2k+1 = action_u[k]
    for k in range(5):
        np.testing.assert_allclose(
            np.asarray(x[0, 2 * k]), np.asarray(content_u[0, k]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(x[0, 2 * k + 1]), np.asarray(action_u[0, k]),
            rtol=1e-5, atol=1e-6,
        )
    # stride-2 candidate extraction pulls the content token of each pair
    content_c = pre.content_mlp(p["content_mlp"], c_c, None, ctx)
    got = extract_candidates(
        x, 0, lengths - num_targets, 3, stride=2
    )
    for row, lc in ((0, 3), (1, 2)):
        for c in range(lc):
            np.testing.assert_allclose(
                np.asarray(got[row, c]), np.asarray(content_c[row, c]),
                rtol=1e-5, atol=1e-6,
            )


def test_non_interleave_sums_paths():
    pre = _build_pre(False)
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    ctx = _ctx(True)
    x, lengths, num_targets, _ = pre(p, ctx=ctx, **ins)
    np.testing.assert_array_equal(np.asarray(lengths), [8, 5])
    np.testing.assert_array_equal(np.asarray(num_targets), [3, 2])
    u_c, _ = pre.content_encoder(
        p["content_encoder"], ins["uih_emb"], ins["cand_emb"], ctx
    )
    content_u = pre.content_mlp(p["content_mlp"], u_c, None, ctx)
    a_u = pre.action_encoder(p["action"], ins["action_weights"], None, ctx)
    action_u = pre.action_mlp(
        p["action_mlp"], a_u.astype(content_u.dtype), None, ctx
    )
    np.testing.assert_allclose(
        np.asarray(x[0, 0]),
        np.asarray(content_u[0, 0] + action_u[0, 0]),
        rtol=1e-5, atol=1e-6,
    )


def test_target_action_embedding_used():
    """Targets carry the learnable target-action vector through the
    action MLP (reference action_encoder.py:119-121,174-183)."""
    pre = _build_pre(True)
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    ctx = _ctx(True)
    x, lengths, num_targets, _ = pre(p, ctx=ctx, **ins)
    a_c = jnp.broadcast_to(p["target_action"], (2, 3, 8))
    action_c = pre.action_mlp(
        p["action_mlp"], a_c.astype(x.dtype), None, ctx
    )
    # row 0: first target pair starts at 2*lu = 10; action token at 11
    np.testing.assert_allclose(
        np.asarray(x[0, 11]), np.asarray(action_c[0, 0]),
        rtol=1e-5, atol=1e-6,
    )


def test_contextual_prefix_tokens():
    pre = _build_pre(True, n_ctx=2, ctx_dim=6)
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    ins["contextual_emb"] = jax.random.normal(jax.random.PRNGKey(9), (2, 6))
    x, lengths, num_targets, ts = pre(p, ctx=_ctx(True), **ins)
    np.testing.assert_array_equal(np.asarray(lengths), [18, 12])
    # contextual timestamps are zero
    np.testing.assert_array_equal(np.asarray(ts[:, :2]), np.zeros((2, 2)))


def test_interleave_requires_action_encoder():
    content_mlp = text_format.Parse(
        "simple_mlp { hidden_dim: 8 }", module_pb2.GRContextualizedMLP()
    )
    with pytest.raises(ValueError):
        ContextualInterleavePreprocessor(
            embedding_dim=6, uih_content_dim=4, cand_content_dim=4,
            content_encoder=SliceContentEncoder(4, 4),
            content_mlp_cfg=content_mlp,
            enable_interleaving=True,
        )


# ---------------------------------------------------------------------------
# UIH preprocessor
# ---------------------------------------------------------------------------


def test_uih_preprocessor():
    action_mlp = text_format.Parse(
        "simple_mlp { hidden_dim: 8 }", module_pb2.GRContextualizedMLP()
    )
    pre = UIHPreprocessor(
        embedding_dim=6, uih_content_dim=4,
        contextual_dim=6, n_contextual_tokens=2,
        action_encoder=SimpleActionEncoder(
            action_embedding_dim=4, action_weights=[1, 2]
        ),
        action_mlp_cfg=action_mlp,
    )
    p = pre.init(jax.random.PRNGKey(0))
    ins = _inputs()
    x, lengths, num_targets, ts = pre(
        p,
        uih_emb=ins["uih_emb"],
        uih_lengths=ins["uih_lengths"],
        ctx=_ctx(False),
        contextual_emb=jax.random.normal(jax.random.PRNGKey(4), (2, 6)),
        action_weights=ins["action_weights"],
        uih_timestamps=ins["uih_timestamps"],
    )
    assert x.shape == (2, 2 + 5, 6)
    np.testing.assert_array_equal(np.asarray(lengths), [7, 5])
    np.testing.assert_array_equal(np.asarray(num_targets), [0, 0])
    assert not pre.interleave_targets(True)


# ---------------------------------------------------------------------------
# factory
# ---------------------------------------------------------------------------


def _factory(pre_text, **kw):
    cfg = text_format.Parse(pre_text, module_pb2.GRInputPreprocessor())
    defaults = dict(
        embedding_dim=6, uih_content_dim=4, cand_content_dim=4,
        contextual_dim=0, n_contextual_tokens=0,
    )
    defaults.update(kw)
    return preprocessor_from_config(cfg, **defaults)


FULL_FAMILY = """
%s {
    action_encoder {
        simple_action_encoder { action_embedding_dim: 4
                                action_weights: [1, 2] }
    }
    action_mlp { simple_mlp { hidden_dim: 8 } }
    content_encoder { slice_content_encoder {} }
    content_mlp { simple_mlp { hidden_dim: 8 } }
}
"""


def test_factory_oneof_mapping():
    """contextual_preprocessor -> interleaving OFF;
    contextual_interleave_preprocessor -> ON (reference
    preprocessors.py:737-742)."""
    p1 = _factory(FULL_FAMILY % "contextual_preprocessor")
    assert isinstance(p1, ContextualInterleavePreprocessor)
    assert not p1.enable_interleaving
    p2 = _factory(FULL_FAMILY % "contextual_interleave_preprocessor")
    assert p2.enable_interleaving
    p3 = _factory("uih_preprocessor {}")
    assert isinstance(p3, UIHPreprocessor)
    assert _factory("") is None


def test_interleave_tokens_helper():
    a = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    b = -a
    out = interleave_tokens(a, b)
    np.testing.assert_array_equal(
        np.asarray(out[0, ::2]), np.asarray(a[0])
    )
    np.testing.assert_array_equal(
        np.asarray(out[0, 1::2]), np.asarray(b[0])
    )
