"""Cross-framework parity: jax modules/models vs torch references.

Two lanes, substituting for the reference's real-data AUC labels
(BASELINE.md — Criteo/taobao datasets are absent here):

1. Seed-matched module numerics: identical weights injected into the
   jax module and a torch implementation of the REFERENCE formula
   (tests/torch_ref.py); forward and input-gradients must agree to
   float tolerance. Catches any semantic divergence from the
   reference's math (tzrec/modules/interaction.py, masknet.py,
   mmoe.py, sequence.py, ops/_pytorch/pt_hstu_attention.py:205-228).
2. End-to-end training parity: DeepFM / DLRM / MMoE mirrors in torch
   start from the SAME initial parameters (tables extracted via
   engine.extract_table), consume the SAME batch stream with matched
   optimizers (Adagrad sparse / Adam dense), and must land within
   0.003 AUC of the jax model.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn.functional as F
from google.protobuf import text_format

from torcheasyrec_tpu.protos import pipeline_pb2

import torch_ref as TR


def _ctx(training=False):
    import jax.numpy as jnp

    from torcheasyrec_tpu.modules import module as M

    return M.Context(training=training, compute_dtype=jnp.float32)


def _cmp_fwd_grad(jax_fn, torch_fn, x_np, rtol=1e-4, atol=1e-5):
    """Compare y = f(x) and dL/dx for L = sum(y * cos(iota))."""
    import jax
    import jax.numpy as jnp

    wvec = None

    def jax_loss(x):
        y = jax_fn(x)
        w = jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape)
        return jnp.sum(y * w), y

    (loss_j, y_j), gx_j = jax.value_and_grad(jax_loss, has_aux=True)(
        jnp.asarray(x_np)
    )

    xt = torch.tensor(x_np, requires_grad=True)
    yt = torch_fn(xt)
    wt = torch.cos(
        torch.arange(yt.numel(), dtype=torch.float32)
    ).reshape(yt.shape)
    loss_t = (yt * wt).sum()
    loss_t.backward()

    np.testing.assert_allclose(
        np.asarray(y_j), yt.detach().numpy(), rtol=rtol, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(gx_j), xt.grad.numpy(), rtol=rtol, atol=atol
    )


# ---------------------------------------------------------------------------
# lane 1: module numerics
# ---------------------------------------------------------------------------


def test_mlp_numerics():
    import jax

    from torcheasyrec_tpu.modules.mlp import MLP

    mlp = MLP(12, [16, 8])
    p = mlp.init(jax.random.key(0))
    tm = TR.TorchMLP(p, 2)
    x = np.random.default_rng(0).normal(size=(5, 12)).astype(np.float32)
    _cmp_fwd_grad(lambda x: mlp(p, x, _ctx()), tm, x)


def test_fm_numerics():
    from torcheasyrec_tpu.modules.fm import FactorizationMachine

    fm = FactorizationMachine()
    x = np.random.default_rng(1).normal(size=(4, 6, 8)).astype(np.float32)
    _cmp_fwd_grad(lambda x: fm({}, x, _ctx()), TR.torch_fm, x)


def test_cross_v1_numerics():
    import jax

    from torcheasyrec_tpu.modules.interaction import Cross

    m = Cross(10, cross_num=3)
    p = m.init(jax.random.key(2))
    tm = TR.TorchCross(p, 3)
    x = np.random.default_rng(2).normal(size=(6, 10)).astype(np.float32)
    _cmp_fwd_grad(lambda x: m(p, x, _ctx()), tm, x)


def test_cross_v2_numerics():
    import jax

    from torcheasyrec_tpu.modules.interaction import CrossV2

    m = CrossV2(10, cross_num=2, low_rank=4)
    p = m.init(jax.random.key(3))
    tm = TR.TorchCrossV2(p, 2)
    x = np.random.default_rng(3).normal(size=(6, 10)).astype(np.float32)
    _cmp_fwd_grad(lambda x: m(p, x, _ctx()), tm, x)


def test_cin_numerics():
    import jax

    from torcheasyrec_tpu.modules.interaction import CIN

    m = CIN(5, [7, 4])
    p = m.init(jax.random.key(4))
    tm = TR.TorchCIN(p, [7, 4])
    x = np.random.default_rng(4).normal(size=(3, 5, 6)).astype(np.float32)
    _cmp_fwd_grad(lambda x: m(p, x, _ctx()), tm, x)


def test_masknet_block_numerics():
    import jax

    from torcheasyrec_tpu.modules.masknet import MaskBlock

    m = MaskBlock(input_dim=12, mask_input_dim=12, hidden_dim=8,
                  reduction_ratio=2.0)
    p = m.init(jax.random.key(5))
    tm = TR.TorchMaskBlock(p)
    x = np.random.default_rng(5).normal(size=(4, 12)).astype(np.float32)
    _cmp_fwd_grad(
        lambda x: m(p, x, x, _ctx()), lambda x: tm(x, x), x
    )


def test_din_attention_numerics():
    import jax
    import jax.numpy as jnp

    from torcheasyrec_tpu.modules.sequence import DINEncoder

    d, n, b = 8, 6, 4
    m = DINEncoder(sequence_dim=d, query_dim=d, input="g",
                   attn_mlp={"hidden_units": [16]})
    p = m.init(jax.random.key(6))
    r = np.random.default_rng(6)
    q_np = r.normal(size=(b, d)).astype(np.float32)
    s_np = r.normal(size=(b, n, d)).astype(np.float32)
    lengths = np.asarray([6, 3, 1, 5], np.int64)

    def jax_fn(s):
        group = {
            "g.query": jnp.asarray(q_np),
            "g.sequence": s,
            "g.sequence_length": jnp.asarray(lengths),
        }
        return m(p, group, _ctx())

    tm = TR.TorchDINAttention(p, 1)

    _cmp_fwd_grad(
        jax_fn,
        lambda s: tm(torch.tensor(q_np), s, torch.tensor(lengths)),
        s_np,
    )


def test_mmoe_module_numerics():
    import jax

    from torcheasyrec_tpu.modules.mmoe import MMoE

    m = MMoE(in_features=10, expert_mlp={"hidden_units": [12]},
             num_expert=3, num_task=2)
    p = m.init(jax.random.key(7))
    tm = TR.TorchMMoE(p, 3, 2, 1)
    x = np.random.default_rng(7).normal(size=(5, 10)).astype(np.float32)
    import jax.numpy as jnp

    _cmp_fwd_grad(
        lambda x: jnp.stack(m(p, x, _ctx()), axis=0),
        lambda x: torch.stack(tm(x), dim=0),
        x,
    )


def test_dlrm_interaction_numerics():
    from torcheasyrec_tpu.modules.interaction import InteractionArch

    m = InteractionArch(5)
    x = np.random.default_rng(8).normal(size=(3, 5, 8)).astype(np.float32)

    def torch_fn(x):
        dots = torch.einsum("bfd,bgd->bfg", x, x)
        iu = torch.triu_indices(5, 5, offset=1)
        return dots[:, iu[0], iu[1]]

    _cmp_fwd_grad(lambda x: m({}, x, _ctx()), torch_fn, x)


@pytest.mark.parametrize("with_targets", [False, True])
def test_hstu_attention_numerics(with_targets):
    """jax hstu_mha vs a torch implementation of the reference formula
    (pt_hstu_attention.py:205-228). Only rows < length are compared —
    the reference's jagged storage has no padded rows; ours zeros
    them."""
    import jax
    import jax.numpy as jnp

    from torcheasyrec_tpu.ops.hstu import hstu_mha

    b, n, h, d = 3, 16, 2, 8
    r = np.random.default_rng(9)
    q = (r.normal(size=(b, n, h, d)) * 0.3).astype(np.float32)
    k = (r.normal(size=(b, n, h, d)) * 0.3).astype(np.float32)
    v = (r.normal(size=(b, n, h, d)) * 0.3).astype(np.float32)
    lengths = np.asarray([16, 9, 4], np.int64)
    tgt = np.asarray([2, 2, 1], np.int64) if with_targets else None
    # zero-pad inputs beyond lengths like the jagged->dense convention
    pad = (np.arange(n)[None, :, None, None]
           < lengths[:, None, None, None])
    q, k, v = q * pad, k * pad, v * pad
    alpha = 1.0 / d

    out_j = np.asarray(hstu_mha(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(lengths), alpha=alpha, causal=True,
        num_targets=None if tgt is None else jnp.asarray(tgt),
        kernel="JAX",
    ))
    out_t = TR.torch_hstu_mha(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        torch.tensor(lengths), alpha=alpha, causal=True,
        num_targets=None if tgt is None else torch.tensor(tgt),
    ).numpy()
    for i, L in enumerate(lengths):
        np.testing.assert_allclose(
            out_j[i, :L], out_t[i, :L], rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# lane 2: end-to-end training parity
# ---------------------------------------------------------------------------

B = 256
N_TRAIN = 12800
N_EVAL = 4096
CATS = [("cat_a", 100), ("cat_b", 50), ("cat_c", 20)]
NUMS = ["num_a", "num_b"]
EMB_DIM = 8


def _gen_rows(n, seed, two_labels=False):
    r = np.random.default_rng(seed)
    cols = {}
    logits = np.zeros(n)
    for name, nb in CATS:
        c = r.integers(0, nb, n)
        cols[name] = c
        logits = logits + np.sin(c * 2.3) * 0.8
    for name in NUMS:
        x = r.normal(size=n).astype(np.float32)
        cols[name] = x
        logits = logits + x * 0.5
    cols["label"] = (
        logits + r.normal(scale=0.5, size=n) > 0
    ).astype(np.float32)
    if two_labels:
        cols["label2"] = (
            -logits + r.normal(scale=0.8, size=n) > 0
        ).astype(np.float32)
    return cols


def _batches(features, labels, n, seed, two_labels=False):
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.data_parser import DataParser

    parser = DataParser(features, labels=labels)
    cols = _gen_rows(n, seed, two_labels)
    out = []
    for i in range(0, n, B):
        chunk = {
            k: pa.Array.from_pandas(v[i : i + B]) for k, v in cols.items()
        }
        out.append(parser.parse_to_batch(chunk))
    return out


def _np_auc(labels, scores):
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores))
    ranks[order] = np.arange(1, len(scores) + 1)
    # average ties via grouping on sorted scores
    s = scores[order]
    i = 0
    while i < len(s):
        j = i
        while j + 1 < len(s) and s[j + 1] == s[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    pos = labels > 0.5
    n_pos, n_neg = pos.sum(), (~pos).sum()
    return (ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def _build_pipeline(model_block, labels, extra_feats="", num_workers=""):
    feat_lines = []
    for name, nb in CATS:
        feat_lines.append(
            f"feature_configs {{ id_feature {{ feature_name: \"{name}\" "
            f"num_buckets: {nb} embedding_dim: {EMB_DIM} }} }}"
        )
    for name in NUMS:
        feat_lines.append(
            f"feature_configs {{ raw_feature {{ feature_name: \"{name}\" }} }}"
        )
    label_lines = "\n".join(f'    label_fields: "{x}"' for x in labels)
    txt = f"""
train_input_path: "unused"
eval_input_path: "unused"
model_dir: "/tmp/parity_model"
train_config {{
    sparse_optimizer {{ adagrad_optimizer {{ lr: 0.05 }}
                        constant_learning_rate {{}} }}
    dense_optimizer {{ adam_optimizer {{ lr: 0.002 }}
                       constant_learning_rate {{}} }}
    num_epochs: 1
}}
eval_config {{}}
data_config {{
    batch_size: {B}
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
{label_lines}
}}
{chr(10).join(feat_lines)}
model_config {{
{model_block}
}}
"""
    return text_format.Parse(txt, pipeline_pb2.EasyRecConfig())


def _jax_setup(cfg):
    import jax
    import jax.numpy as jnp

    from torcheasyrec_tpu.main import (
        _build_model_and_optim, _init_state, make_eval_step,
        make_train_step,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )

    model, features, sparse_sched = _build_model_and_optim(cfg, None)
    dense, tables, sparse_opt = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense
    )
    state = {
        "dense": dense, "tables": tables, "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense), "step": jnp.zeros((), jnp.int32),
    }
    train_step = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched, jnp.float32)
    )
    eval_step = jax.jit(make_eval_step(model, jnp.float32))
    return model, features, state, train_step, eval_step


def _jax_train_eval(cfg, state, train_step, eval_step, model, features,
                    labels, two_labels=False, prob_keys=("probs",)):
    import jax

    train_b = _batches(features, labels, N_TRAIN, 11, two_labels)
    eval_b = _batches(features, labels, N_EVAL, 12, two_labels)
    rng = jax.random.key(0)
    for i, b in enumerate(train_b):
        state, m, _ = train_step(state, b, jax.random.fold_in(rng, i))
    scores = {k: [] for k in prob_keys}
    ys = {k: [] for k in prob_keys}
    lab_of = {"probs": labels[0]}
    if two_labels:
        lab_of = {"probs_t0": labels[0], "probs_t1": labels[1]}
    for b in eval_b:
        preds, _ = eval_step(state, b)
        for k in prob_keys:
            scores[k].append(np.asarray(preds[k]))
            ys[k].append(np.asarray(b.labels[lab_of[k]]))
    return {
        k: _np_auc(np.concatenate(ys[k]), np.concatenate(scores[k]))
        for k in prob_keys
    }


class _TorchEmb(torch.nn.Module):
    """Embeddings copied from the jax engine's initial tables."""

    def __init__(self, model, state, wide=False):
        super().__init__()
        eng = model.embedding_group.engine
        self.emb = torch.nn.ModuleDict()
        suffix = "__wide" if wide else ""
        for name, _nb in CATS:
            tbl = np.asarray(
                eng.extract_table(state["tables"], f"{name}_emb{suffix}")
            )
            e = torch.nn.Embedding(tbl.shape[0], tbl.shape[1])
            with torch.no_grad():
                e.weight.copy_(TR.t(tbl))
            self.emb[name] = e

    def forward(self, ids):  # ids: dict name -> LongTensor [B]
        return [self.emb[name](ids[name]) for name, _ in CATS]


def _torch_batches(batches, labels):
    out = []
    for b in batches:
        ids = {
            name: torch.tensor(
                np.asarray(b.sparse_features[name].values).reshape(-1),
                dtype=torch.long,
            )
            for name, _ in CATS
        }
        dense = torch.tensor(np.concatenate(
            [np.asarray(b.dense_features[n].values).reshape(len(ids[CATS[0][0]]), -1)
             for n in NUMS], axis=1,
        ))
        labs = {
            x: torch.tensor(np.asarray(b.labels[x])) for x in labels
        }
        out.append((ids, dense, labs))
    return out


def _train_torch(model, batches, labels_key, sparse_params, dense_params,
                 loss_fn=None):
    opt_sparse = torch.optim.Adagrad(sparse_params, lr=0.05, eps=1e-10)
    opt_dense = torch.optim.Adam(dense_params, lr=0.002, eps=1e-8)
    model.train()
    for ids, dense, labs in batches:
        opt_sparse.zero_grad()
        opt_dense.zero_grad()
        if loss_fn is None:
            logit = model(ids, dense)
            loss = F.binary_cross_entropy_with_logits(
                logit, labs[labels_key]
            )
        else:
            loss = loss_fn(model, ids, dense, labs)
        loss.backward()
        opt_sparse.step()
        opt_dense.step()


def test_deepfm_training_auc_parity():
    model_block = """
    feature_groups { group_name: "wide"
        feature_names: "cat_a" feature_names: "cat_b" feature_names: "cat_c"
        group_type: WIDE }
    feature_groups { group_name: "fm"
        feature_names: "cat_a" feature_names: "cat_b" feature_names: "cat_c"
        group_type: DEEP }
    feature_groups { group_name: "deep"
        feature_names: "cat_a" feature_names: "cat_b" feature_names: "cat_c"
        feature_names: "num_a" feature_names: "num_b"
        group_type: DEEP }
    deepfm {
        deep { hidden_units: [32, 16] }
        final { hidden_units: [16] }
        wide_embedding_dim: 4
    }
    num_class: 1
    metrics { auc {} }
    losses { binary_cross_entropy {} }
    """
    cfg = _build_pipeline(model_block, ["label"])
    model, features, state, train_step, eval_step = _jax_setup(cfg)
    auc_jax = _jax_train_eval(
        cfg, state, train_step, eval_step, model, features, ["label"]
    )["probs"]

    class TorchDeepFM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.wide = _TorchEmb(model, state, wide=True)
            self.deep = _TorchEmb(model, state, wide=False)
            p = state["dense"]
            self.deep_mlp = TR.TorchMLP(p["deep_mlp"], 2)
            self.final_mlp = TR.TorchMLP(p["final_mlp"], 1)
            self.output = TR.make_linear(p["output"])

        def forward(self, ids, dense):
            wide = torch.cat(self.wide(ids), dim=1)
            y_wide = wide.sum(dim=1, keepdim=True)
            fm_embs = self.deep(ids)
            y_fm = TR.torch_fm(torch.stack(fm_embs, dim=1))
            deep_in = torch.cat(fm_embs + [dense], dim=1)
            y_deep = self.deep_mlp(deep_in)
            y = self.output(
                self.final_mlp(torch.cat([y_wide, y_fm, y_deep], dim=1))
            )
            return y[:, 0]

    tmodel = TorchDeepFM()
    train_b = _batches(features, ["label"], N_TRAIN, 11)
    eval_b = _batches(features, ["label"], N_EVAL, 12)
    tb = _torch_batches(train_b, ["label"])
    sparse = list(tmodel.wide.parameters()) + list(tmodel.deep.parameters())
    dense_ps = (
        list(tmodel.deep_mlp.parameters())
        + list(tmodel.final_mlp.parameters())
        + list(tmodel.output.parameters())
    )
    _train_torch(tmodel, tb, "label", sparse, dense_ps)
    tmodel.eval()
    scores, ys = [], []
    with torch.no_grad():
        for ids, dense, labs in _torch_batches(eval_b, ["label"]):
            scores.append(torch.sigmoid(tmodel(ids, dense)).numpy())
            ys.append(labs["label"].numpy())
    auc_torch = _np_auc(np.concatenate(ys), np.concatenate(scores))

    assert auc_jax > 0.7 and auc_torch > 0.7, (auc_jax, auc_torch)
    assert abs(auc_jax - auc_torch) < 0.003, (auc_jax, auc_torch)


def test_dlrm_training_auc_parity():
    model_block = """
    feature_groups { group_name: "sparse"
        feature_names: "cat_a" feature_names: "cat_b" feature_names: "cat_c"
        group_type: DEEP }
    feature_groups { group_name: "dense"
        feature_names: "num_a" feature_names: "num_b"
        group_type: DEEP }
    dlrm {
        dense_mlp { hidden_units: [16, 8] }
        final { hidden_units: [24, 12] }
    }
    num_class: 1
    metrics { auc {} }
    losses { binary_cross_entropy {} }
    """
    cfg = _build_pipeline(model_block, ["label"])
    model, features, state, train_step, eval_step = _jax_setup(cfg)
    auc_jax = _jax_train_eval(
        cfg, state, train_step, eval_step, model, features, ["label"]
    )["probs"]

    class TorchDLRM(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.sparse = _TorchEmb(model, state)
            p = state["dense"]
            self.dense_mlp = TR.TorchMLP(p["dense_mlp"], 2)
            self.final_mlp = TR.TorchMLP(p["final_mlp"], 2)
            self.output = TR.make_linear(p["output"])

        def forward(self, ids, dense):
            feats = torch.stack(
                [self.dense_mlp(dense)] + self.sparse(ids), dim=1
            )  # [B, F, D]
            dots = torch.einsum("bfd,bgd->bfg", feats, feats)
            f = feats.shape[1]
            iu = torch.triu_indices(f, f, offset=1)
            inter = dots[:, iu[0], iu[1]]
            b = feats.shape[0]
            h = self.final_mlp(
                torch.cat([feats.reshape(b, -1), inter], dim=1)
            )
            return self.output(h)[:, 0]

    tmodel = TorchDLRM()
    train_b = _batches(features, ["label"], N_TRAIN, 11)
    eval_b = _batches(features, ["label"], N_EVAL, 12)
    tb = _torch_batches(train_b, ["label"])
    sparse = list(tmodel.sparse.parameters())
    dense_ps = (
        list(tmodel.dense_mlp.parameters())
        + list(tmodel.final_mlp.parameters())
        + list(tmodel.output.parameters())
    )
    _train_torch(tmodel, tb, "label", sparse, dense_ps)
    tmodel.eval()
    scores, ys = [], []
    with torch.no_grad():
        for ids, dense, labs in _torch_batches(eval_b, ["label"]):
            scores.append(torch.sigmoid(tmodel(ids, dense)).numpy())
            ys.append(labs["label"].numpy())
    auc_torch = _np_auc(np.concatenate(ys), np.concatenate(scores))

    assert auc_jax > 0.7 and auc_torch > 0.7, (auc_jax, auc_torch)
    assert abs(auc_jax - auc_torch) < 0.003, (auc_jax, auc_torch)


def test_mmoe_training_auc_parity():
    model_block = """
    feature_groups { group_name: "all"
        feature_names: "cat_a" feature_names: "cat_b" feature_names: "cat_c"
        feature_names: "num_a" feature_names: "num_b"
        group_type: DEEP }
    mmoe {
        expert_mlp { hidden_units: [24, 12] }
        num_expert: 3
        task_towers {
            tower_name: "t0" label_name: "label" num_class: 1
            mlp { hidden_units: [8] }
            losses { binary_cross_entropy {} }
            metrics { auc {} }
        }
        task_towers {
            tower_name: "t1" label_name: "label2" num_class: 1
            mlp { hidden_units: [8] }
            losses { binary_cross_entropy {} }
            metrics { auc {} }
        }
    }
    """
    cfg = _build_pipeline(model_block, ["label", "label2"])
    model, features, state, train_step, eval_step = _jax_setup(cfg)
    aucs_jax = _jax_train_eval(
        cfg, state, train_step, eval_step, model, features,
        ["label", "label2"], two_labels=True,
        prob_keys=("probs_t0", "probs_t1"),
    )

    class TorchMMoEModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.embs = _TorchEmb(model, state)
            p = state["dense"]
            self.mmoe = TR.TorchMMoE(p["mmoe"], 3, 2, 2)
            self.towers = torch.nn.ModuleList(
                [TR.TorchMLP(p["towers"][i], 1) for i in range(2)]
            )
            self.outputs = torch.nn.ModuleList(
                [TR.make_linear(p["outputs"][i]) for i in range(2)]
            )

        def forward(self, ids, dense):
            x = torch.cat(self.embs(ids) + [dense], dim=1)
            task_in = self.mmoe(x)
            return [
                self.outputs[i](self.towers[i](task_in[i]))[:, 0]
                for i in range(2)
            ]

    tmodel = TorchMMoEModel()

    def loss_fn(m, ids, dense, labs):
        y0, y1 = m(ids, dense)
        return (
            F.binary_cross_entropy_with_logits(y0, labs["label"])
            + F.binary_cross_entropy_with_logits(y1, labs["label2"])
        )

    train_b = _batches(features, ["label", "label2"], N_TRAIN, 11, True)
    eval_b = _batches(features, ["label", "label2"], N_EVAL, 12, True)
    tb = _torch_batches(train_b, ["label", "label2"])
    sparse = list(tmodel.embs.parameters())
    dense_ps = (
        list(tmodel.mmoe.parameters())
        + list(tmodel.towers.parameters())
        + list(tmodel.outputs.parameters())
    )
    _train_torch(tmodel, tb, None, sparse, dense_ps, loss_fn=loss_fn)
    tmodel.eval()
    scores = {0: [], 1: []}
    ys = {0: [], 1: []}
    with torch.no_grad():
        for ids, dense, labs in _torch_batches(
            eval_b, ["label", "label2"]
        ):
            y0, y1 = tmodel(ids, dense)
            scores[0].append(torch.sigmoid(y0).numpy())
            scores[1].append(torch.sigmoid(y1).numpy())
            ys[0].append(labs["label"].numpy())
            ys[1].append(labs["label2"].numpy())
    for i, key in enumerate(["probs_t0", "probs_t1"]):
        auc_t = _np_auc(
            np.concatenate(ys[i]), np.concatenate(scores[i])
        )
        assert aucs_jax[key] > 0.6 and auc_t > 0.6, (key, aucs_jax, auc_t)
        assert abs(aucs_jax[key] - auc_t) < 0.003, (key, aucs_jax, auc_t)
