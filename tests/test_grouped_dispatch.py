"""Multi-step dispatch (main.make_train_step_scan +
datasets.pack.PackedBatchGroup): one jitted call scans K train steps
over a stacked (K, W) wire, amortizing per-call dispatch latency.

Must be bit-compatible with per-batch stepping: the scan body IS
make_train_step's step and the per-step rng folding matches, so K
scanned steps and K sequential per-batch steps produce the same state.

Reference counterpart: per-batch TrainPipelineSparseDist stepping
(tzrec/utils/dist_util.py:221-303) — the reference has no scan
equivalent because torch dispatches eagerly; this is the TPU-native
answer to the same host-bound-pipeline problem.
"""

import os

import numpy as np
import pyarrow as pa
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.protos import pipeline_pb2

CONFIG = """
train_input_path: "unused"
eval_input_path: "unused"
model_dir: "{model_dir}"
train_config {{
    sparse_optimizer {{
        adagrad_optimizer {{ lr: 0.05 }}
        constant_learning_rate {{}}
    }}
    dense_optimizer {{
        adam_optimizer {{ lr: 0.002 }}
        constant_learning_rate {{}}
    }}
    num_epochs: 1
}}
eval_config {{}}
data_config {{
    batch_size: 64
    dataset_type: ParquetDataset
    fg_mode: FG_NONE
    label_fields: "label"
}}
feature_configs {{
    id_feature {{ feature_name: "cat_a" num_buckets: 64 embedding_dim: 8 }}
}}
feature_configs {{
    raw_feature {{ feature_name: "num_a" }}
}}
model_config {{
    feature_groups {{
        group_name: "wide"
        feature_names: "cat_a"
        group_type: WIDE
    }}
    feature_groups {{
        group_name: "fm"
        feature_names: "cat_a"
        group_type: DEEP
    }}
    feature_groups {{
        group_name: "deep"
        feature_names: "cat_a"
        feature_names: "num_a"
        group_type: DEEP
    }}
    deepfm {{
        deep {{ hidden_units: [16, 8] }}
        final {{ hidden_units: [8] }}
        wide_embedding_dim: 4
    }}
    num_class: 1
    metrics {{ auc {{}} }}
    losses {{ binary_cross_entropy {{}} }}
}}
"""

B = 64


def _build(tmp_path):
    import jax.numpy as jnp

    from torcheasyrec_tpu.main import (
        _build_model_and_optim,
        _init_state,
    )
    from torcheasyrec_tpu.optim.optimizer_builder import (
        create_dense_optimizer,
    )

    cfg = text_format.Parse(
        CONFIG.format(model_dir=os.path.join(str(tmp_path), "m")),
        pipeline_pb2.EasyRecConfig(),
    )
    model, features, sparse_sched = _build_model_and_optim(cfg, None)
    dense, tables, sparse_opt = _init_state(model, cfg)
    tx, dense_sched = create_dense_optimizer(
        cfg.train_config.dense_optimizer, dense
    )
    state = {
        "dense": dense,
        "tables": tables,
        "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense),
        "step": jnp.zeros((), jnp.int32),
    }
    return cfg, model, features, sparse_sched, dense_sched, tx, state


def _packed_batches(features, n, seed=0):
    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.datasets.pack import pack_batch

    parser = DataParser(features, labels=["label"])
    out = []
    for i in range(n):
        r = np.random.default_rng(seed * 1000 + i)
        cols = {
            "cat_a": pa.array(r.integers(0, 64, B)),
            "num_a": pa.array(r.normal(size=B).astype(np.float32)),
            "label": pa.array(
                (r.random(B) > 0.5).astype(np.float32)
            ),
        }
        out.append(pack_batch(parser.parse_to_batch(cols)))
    return out


def test_scan_step_matches_per_batch(tmp_path):
    import jax
    import jax.numpy as jnp

    from torcheasyrec_tpu.datasets.pack import stack_packed
    from torcheasyrec_tpu.main import (
        make_train_step,
        make_train_step_scan,
    )

    cfg, model, features, sparse_sched, dense_sched, tx, state = _build(
        tmp_path
    )
    packed = _packed_batches(features, 8)
    rng = jax.random.key(7)

    per_step = jax.jit(
        make_train_step(model, tx, sparse_sched, dense_sched, jnp.float32)
    )
    s_ref = jax.tree_util.tree_map(lambda x: x, state)
    step = 0
    losses_ref = []
    for p in packed:
        step_rng = jax.random.fold_in(rng, step)
        s_ref, m, _ = per_step(s_ref, p, step_rng)
        losses_ref.append(float(m["total_loss"]))
        step += 1

    scan_step = jax.jit(
        make_train_step_scan(
            model, tx, sparse_sched, dense_sched, jnp.float32
        )
    )
    s_scan = state
    for k in range(0, 8, 4):
        group = stack_packed(packed[k : k + 4])
        s_scan, m, _ = scan_step(s_scan, group, rng)
    # last group's last-step loss must equal the per-batch 8th loss
    np.testing.assert_allclose(
        float(m["total_loss"]), losses_ref[-1], rtol=1e-5
    )

    ref_leaves = jax.tree_util.tree_leaves(
        {"dense": s_ref["dense"], "tables": s_ref["tables"]}
    )
    scan_leaves = jax.tree_util.tree_leaves(
        {"dense": s_scan["dense"], "tables": s_scan["tables"]}
    )
    for a, b in zip(ref_leaves, scan_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
    assert int(s_scan["step"]) == 8


def test_scan_step_stacked_preds_shape(tmp_path):
    """__preds (train-metric channel) stays stacked (K, B) so the host
    can update exact metrics for every batch of the group."""
    import jax
    import jax.numpy as jnp

    from torcheasyrec_tpu.datasets.pack import stack_packed
    from torcheasyrec_tpu.main import make_train_step_scan

    cfg, model, features, sparse_sched, dense_sched, tx, state = _build(
        tmp_path
    )
    # force the preds channel on (train metrics configured)
    model._train_metric_cfgs = list(cfg.model_config.metrics)
    packed = _packed_batches(features, 3)
    scan_step = jax.jit(
        make_train_step_scan(
            model, tx, sparse_sched, dense_sched, jnp.float32
        )
    )
    group = stack_packed(packed)
    state, metrics, _ = scan_step(state, group, jax.random.key(0))
    preds = metrics["__preds"]
    leaf = jax.tree_util.tree_leaves(preds)[0]
    assert leaf.shape[0] == 3 and leaf.shape[1] == B


def test_mp_loader_grouping(tmp_path):
    """group_size>1 yields (PackedBatchGroup, infos) whose row union
    matches the ungrouped stream; tails arrive as size-1 groups."""
    from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader
    from torcheasyrec_tpu.datasets.pack import (
        PackedBatchGroup,
        unpack_batch,
    )
    from torcheasyrec_tpu.datasets.utils import Batch, BatchInfo, DenseField

    class _Factory:
        def __call__(self, w):
            for i in range(5):
                b = Batch(
                    dense_features={
                        "x": DenseField(
                            values=np.full((4, 2), w * 10 + i, np.float32)
                        )
                    },
                    sparse_features={},
                    labels={
                        "y": np.full((4,), w * 10 + i, np.float32)
                    },
                )
                yield b, BatchInfo(batch_size=4)

    loader = MpBatchLoader(_Factory(), 2, group_size=3)
    seen = []
    sizes = []
    try:
        for group, infos in loader:
            assert isinstance(group, PackedBatchGroup)
            assert len(infos) == group.group_size
            sizes.append(group.group_size)
            for k in range(group.group_size):
                hb = unpack_batch(group.row(k))
                seen.append(float(np.asarray(hb.labels["y"])[0]))
    finally:
        loader.close()
    expect = sorted(
        float(w * 10 + i) for w in range(2) for i in range(5)
    )
    assert sorted(seen) == expect
    assert set(sizes) <= {3, 1}
    assert 3 in sizes


def test_mp_loader_grouping_device_put(tmp_path):
    """Grouped mode with a put pool: device groups arrive with host
    batches attached for host-side consumers."""
    import jax

    from torcheasyrec_tpu.datasets.mp_loader import MpBatchLoader
    from torcheasyrec_tpu.datasets.pack import PackedBatchGroup
    from torcheasyrec_tpu.datasets.utils import Batch, BatchInfo, DenseField

    class _Factory:
        def __call__(self, w):
            for i in range(6):
                b = Batch(
                    dense_features={
                        "x": DenseField(
                            values=np.full((4, 2), w + i, np.float32)
                        )
                    },
                    sparse_features={},
                    labels={"y": np.ones((4,), np.float32)},
                )
                yield b, BatchInfo(batch_size=4)

    loader = MpBatchLoader(
        _Factory(), 2, group_size=4,
        device_put_fn=lambda x: x,  # enables the put pool path
    )
    n = 0
    try:
        for group, infos in loader:
            assert isinstance(group, PackedBatchGroup)
            assert isinstance(group.wire, jax.Array) or hasattr(
                group.wire, "shape"
            )
            assert group.host_batches is not None
            assert len(group.host_batches) == group.group_size
            n += group.group_size
    finally:
        loader.close()
    assert n == 12


def test_steps_per_dispatch_end_to_end(tmp_path):
    """train_config.steps_per_dispatch wires the grouped mp loader +
    scanned step into train_and_evaluate: the run completes, steps
    count every batch, metrics/checkpoints land, and AUC learns."""
    import jax

    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    tmp = str(tmp_path)
    cfg_text = CONFIG.format(model_dir=os.path.join(tmp, "m")).replace(
        'train_input_path: "unused"',
        f'train_input_path: "{tmp}/train.parquet"',
    ).replace(
        'eval_input_path: "unused"',
        f'eval_input_path: "{tmp}/eval.parquet"',
    ).replace(
        "num_epochs: 1",
        "num_epochs: 4\n    steps_per_dispatch: 3\n"
        "    log_step_count_steps: 10",
    ).replace(
        "batch_size: 64",
        "batch_size: 128\n    num_workers: 2",
    )
    cfg = text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    assert cfg.train_config.steps_per_dispatch == 3
    cfg_path = os.path.join(tmp, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(
        f"{tmp}/train.parquet", features, 4096, ["label"], seed=0
    )
    write_mock_parquet(
        f"{tmp}/eval.parquet", features, 1024, ["label"], seed=1
    )

    from torcheasyrec_tpu import main as tzrec_main

    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result["auc"] > 0.60, f"AUC too low: {result}"
    model_dir = os.path.join(tmp, "m")
    ckpts = [n for n in os.listdir(model_dir)
             if n.startswith("model.ckpt-")]
    assert ckpts
    # every batch stepped exactly once: 4 epochs x (4096 / 128)
    final_step = max(int(n.split("-")[-1]) for n in ckpts)
    assert final_step == 4 * (4096 // 128)
