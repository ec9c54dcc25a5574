"""Module-level eager-vs-jit matrix over EVERY dense module.

The reference runs every nn module eager, FX-traced, and scripted
(SURVEY §4, tzrec/utils/test_util.py:77-101 create_test_module). The
TPU analogue: op-by-op (eager) and traced+compiled (jit) execution of
each module must agree — forward values AND gradients w.r.t. params.

tests/test_eager_vs_jit.py covers whole models; this file covers the
module zoo directly so a module not reachable from those six models
still gets the matrix.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torcheasyrec_tpu.modules import module as M

B = 4
MLP_CFG = {"hidden_units": [8, 4]}


def _ctx(training=False):
    return M.Context(
        training=training,
        rng=jax.random.key(3) if training else None,
        compute_dtype=jnp.float32,
    )


def _seq_group(key, dim=6, qdim=6, L=5, prefix="seq"):
    k1, k2 = jax.random.split(key)
    return {
        f"{prefix}.query": jax.random.normal(k1, (B, qdim)),
        f"{prefix}.sequence": jax.random.normal(k2, (B, L, dim)),
        f"{prefix}.sequence_length": jnp.array([5, 3, 1, 4], jnp.int32),
    }


def _cases():
    """(name, module factory, input factory) per module class."""
    from torcheasyrec_tpu.modules.capsule import CapsuleLayer
    from torcheasyrec_tpu.modules.extraction_net import ExtractionNet
    from torcheasyrec_tpu.modules.fm import FactorizationMachine
    from torcheasyrec_tpu.modules.interaction import (
        CIN,
        Cross,
        CrossV2,
        FactorizationMachineBlock,
        InputSENet,
        InteractionArch,
        LinearCompressBlock,
        WuKongLayer,
    )
    from torcheasyrec_tpu.modules.intervention import Intervention
    from torcheasyrec_tpu.modules.masknet import MaskBlock, MaskNetModule
    from torcheasyrec_tpu.modules.mlp import MLP
    from torcheasyrec_tpu.modules.mmoe import MMoE
    from torcheasyrec_tpu.modules.personalized_net import (
        EPNet,
        GateNU,
        PPNet,
    )
    from torcheasyrec_tpu.modules.sequence import (
        DINEncoder,
        MultiWindowDINEncoder,
        PoolingEncoder,
        SelfAttentionEncoder,
        SimpleAttention,
    )
    from torcheasyrec_tpu.modules.variational_dropout import (
        VariationalDropout,
    )

    def x(shape):
        return lambda k: (jax.random.normal(k, shape),)

    return [
        ("mlp", lambda: MLP(10, [8, 4], activation="nn.ReLU"),
         x((B, 10))),
        ("mlp_dice", lambda: MLP(10, [8], activation="Dice"),
         x((B, 10))),
        ("mlp_prelu", lambda: MLP(10, [8], activation="PReLU"),
         x((B, 10))),
        ("fm", lambda: FactorizationMachine(),
         x((B, 3, 6))),
        ("input_senet", lambda: InputSENet([4, 6, 8]),
         lambda k: ([jax.random.normal(jax.random.fold_in(k, i), (B, d))
                     for i, d in enumerate([4, 6, 8])],)),
        ("interaction_arch", lambda: InteractionArch(5),
         x((B, 5, 6))),
        ("cross", lambda: Cross(10, cross_num=2), x((B, 10))),
        ("cross_v2", lambda: CrossV2(10, cross_num=2, low_rank=4),
         x((B, 10))),
        ("cin", lambda: CIN(5, [4, 3]), x((B, 5, 6))),
        ("linear_compress", lambda: LinearCompressBlock(5, 3),
         x((B, 5, 6))),
        ("fm_block",
         lambda: FactorizationMachineBlock(5, 6, 4, 3, dict(MLP_CFG)),
         x((B, 5, 6))),
        ("wukong",
         lambda: WuKongLayer(5, 6, 2, 3, 2, dict(MLP_CFG)),
         x((B, 5, 6))),
        ("mask_block", lambda: MaskBlock(10, 10, 8, aggregation_dim=6),
         lambda k: (jax.random.normal(k, (B, 10)),
                    jax.random.normal(jax.random.fold_in(k, 1), (B, 10)))),
        ("masknet_module",
         lambda: MaskNetModule(
             10, 2, {"hidden_dim": 8, "aggregation_dim": 6},
             top_mlp=dict(MLP_CFG),
         ),
         x((B, 10))),
        ("mmoe",
         lambda: MMoE(10, dict(MLP_CFG), num_expert=2, num_task=2,
                      gate_mlp={"hidden_units": [4]}),
         x((B, 10))),
        ("extraction_net",
         lambda: ExtractionNet(
             [10, 10], 10, 2, "layer0", expert_num_per_task=2,
             share_num=1, task_expert_net=dict(MLP_CFG),
             share_expert_net=dict(MLP_CFG),
         ),
         lambda k: ([jax.random.normal(jax.random.fold_in(k, i), (B, 10))
                     for i in range(2)],
                    jax.random.normal(jax.random.fold_in(k, 9), (B, 10)))),
        ("capsule",
         lambda: CapsuleLayer(6, max_k=3, max_seq_len=5, high_dim=8),
         lambda k: (jax.random.normal(k, (B, 5, 6)),
                    jnp.array([5, 3, 1, 4], jnp.int32))),
        ("din",
         lambda: DINEncoder(6, 6, "seq", dict(MLP_CFG)),
         lambda k: (_seq_group(k),)),
        ("din_narrow_query",
         lambda: DINEncoder(6, 4, "seq", dict(MLP_CFG)),
         lambda k: (_seq_group(k, qdim=4),)),
        ("multi_window_din",
         lambda: MultiWindowDINEncoder(6, 6, "seq", dict(MLP_CFG),
                                       windows_len=[2, 3]),
         lambda k: (_seq_group(k),)),
        ("simple_attention",
         lambda: SimpleAttention(6, 6, "seq"),
         lambda k: (_seq_group(k),)),
        ("pooling_mean",
         lambda: PoolingEncoder(6, "seq", pooling_type="mean"),
         lambda k: (_seq_group(k),)),
        ("pooling_sum",
         lambda: PoolingEncoder(6, "seq", pooling_type="sum"),
         lambda k: (_seq_group(k),)),
        ("self_attention",
         lambda: SelfAttentionEncoder(6, "seq", multihead_attn_dim=8,
                                      num_heads=2),
         lambda k: (_seq_group(k),)),
        ("gate_nu", lambda: GateNU(10, 8, 6), x((B, 10))),
        ("ep_net", lambda: EPNet(10, 4, 8),
         lambda k: (jax.random.normal(k, (B, 10)),
                    jax.random.normal(jax.random.fold_in(k, 1), (B, 4)))),
        ("pp_net", lambda: PPNet(10, 4, [8, 6]),
         lambda k: (jax.random.normal(k, (B, 10)),
                    jax.random.normal(jax.random.fold_in(k, 1), (B, 4)))),
        ("intervention", lambda: Intervention(10, 6, 4),
         lambda k: (jax.random.normal(k, (B, 10)),
                    jax.random.normal(jax.random.fold_in(k, 1), (B, 6)))),
        ("variational_dropout",
         lambda: VariationalDropout([4, 6]),
         x((B, 10))),
    ]


_CASE_MAP = {c[0]: c for c in _cases()}


@pytest.mark.parametrize("name", sorted(_CASE_MAP))
@pytest.mark.parametrize("training", [False, True])
def test_module_eager_vs_jit(name, training):
    _, make_mod, make_in = _CASE_MAP[name]
    mod = make_mod()
    params = mod.init(jax.random.key(0))
    inputs = make_in(jax.random.key(1))

    def fwd(p, *ins):
        out = mod(p, *ins, _ctx(training))
        return out

    eager = fwd(params, *inputs)
    jitted = jax.jit(fwd)(params, *inputs)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=name,
        ),
        eager, jitted,
    )


@pytest.mark.parametrize("name", sorted(_CASE_MAP))
def test_module_grads_eager_vs_jit(name):
    _, make_mod, make_in = _CASE_MAP[name]
    mod = make_mod()
    params = mod.init(jax.random.key(0))
    if not jax.tree_util.tree_leaves(params):
        pytest.skip("parameter-free module")
    inputs = make_in(jax.random.key(1))

    def loss(p):
        out = mod(p, *inputs, _ctx(False))
        return sum(
            jnp.sum(jnp.square(leaf.astype(jnp.float32)))
            for leaf in jax.tree_util.tree_leaves(out)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        )

    g_eager = jax.grad(loss)(params)
    g_jit = jax.jit(jax.grad(loss))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=name,
        ),
        g_eager, g_jit,
    )
