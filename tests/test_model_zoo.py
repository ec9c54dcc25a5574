"""Model-zoo smoke tests: every registered model builds from a config,
forwards a batch, and completes one jitted train step with finite loss.

Mirrors the reference's per-model module tests (SURVEY.md §4) at the
model granularity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pyarrow as pa
import pytest
from google.protobuf import text_format

from torcheasyrec_tpu.datasets.data_parser import DataParser
from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.main import _init_state, make_train_step
from torcheasyrec_tpu.models import create_model
from torcheasyrec_tpu.optim.optimizer_builder import create_dense_optimizer
from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
from torcheasyrec_tpu.protos import feature_pb2, model_pb2, pipeline_pb2

B = 16

FEATURES = [
    "id_feature { feature_name: 'uid' num_buckets: 50 embedding_dim: 16 }",
    "id_feature { feature_name: 'iid' num_buckets: 60 embedding_dim: 16 }",
    "id_feature { feature_name: 'cat' num_buckets: 10 embedding_dim: 16 }",
    "id_feature { feature_name: 'domain' num_buckets: 4 embedding_dim: 8 }",
    "raw_feature { feature_name: 'price' }",
    "sequence_id_feature { feature_name: 'clicks' num_buckets: 60 "
    "  embedding_dim: 16 sequence_length: 8 embedding_name: 'iid_emb' }",
]

GROUPS_RANK = """
feature_groups { group_name: "wide" feature_names: ["uid", "iid", "cat"]
                 group_type: WIDE }
feature_groups { group_name: "fm" feature_names: ["uid", "iid", "cat"]
                 group_type: DEEP }
feature_groups { group_name: "sparse" feature_names: ["uid", "iid", "cat"]
                 group_type: DEEP }
feature_groups { group_name: "dense" feature_names: ["price"]
                 group_type: DEEP }
feature_groups { group_name: "deep" feature_names: ["uid", "iid", "cat", "price"]
                 group_type: DEEP }
feature_groups { group_name: "all" feature_names: ["uid", "iid", "cat", "price"]
                 group_type: DEEP }
feature_groups { group_name: "domain" feature_names: ["domain"]
                 group_type: DEEP }
feature_groups { group_name: "ppnet" feature_names: ["uid", "iid"]
                 group_type: DEEP }
feature_groups { group_name: "seq" feature_names: ["iid", "clicks"]
                 group_type: SEQUENCE }
feature_groups { group_name: "user" feature_names: ["uid"]
                 group_type: DEEP }
feature_groups { group_name: "user_aug" feature_names: ["domain"]
                 group_type: DEEP }
feature_groups { group_name: "item" feature_names: ["iid", "cat"]
                 group_type: DEEP }
feature_groups { group_name: "item_aug" feature_names: ["price"]
                 group_type: DEEP }
"""

MLP16 = "{ hidden_units: [16] }"
TASKS2 = """
task_towers { tower_name: "t1" label_name: "label" mlp { hidden_units: [8] }
              losses { binary_cross_entropy {} } metrics { auc {} } }
task_towers { tower_name: "t2" label_name: "label2" mlp { hidden_units: [8] }
              losses { binary_cross_entropy {} } metrics { auc {} } }
"""

MODEL_CONFIGS = {
    "deepfm": f"deepfm {{ deep {MLP16} final {MLP16} }}",
    "wide_and_deep": f"wide_and_deep {{ deep {MLP16} final {MLP16} }}",
    "dlrm": f"dlrm {{ dense_mlp {{ hidden_units: [16] }} final {MLP16} }}",
    "dcn_v1": f"dcn_v1 {{ cross {{ cross_num: 2 }} deep {MLP16} final {MLP16} }}",
    "dcn_v2": f"dcn_v2 {{ cross {{ cross_num: 2 low_rank: 8 }} deep {MLP16} final {MLP16} }}",
    "xdeepfm": f"xdeepfm {{ cin {{ cin_layer_size: [8, 8] }} deep {MLP16} final {MLP16} }}",
    "mask_net": """mask_net { mask_net_module {
        n_mask_blocks: 2
        mask_block { hidden_dim: 16 aggregation_dim: 8 }
        top_mlp { hidden_units: [16] } } }""",
    "multi_tower": f"""multi_tower {{
        towers {{ input: "user" mlp {MLP16} }}
        towers {{ input: "item" mlp {MLP16} }}
        final {MLP16} }}""",
    "multi_tower_din": f"""multi_tower_din {{
        towers {{ input: "all" mlp {MLP16} }}
        din_towers {{ input: "seq" attn_mlp {{ hidden_units: [8] }} }}
        final {MLP16} }}""",
    "wukong": """wukong {
        wukong_layers { lcb_feature_num: 2 fmb_feature_num: 2
            compressed_feature_num: 2
            feature_num_mlp { hidden_units: [16] } }
        final { hidden_units: [16] } }""",
    "rocket_launching": f"""rocket_launching {{
        share_mlp {MLP16}
        booster_mlp {{ hidden_units: [16, 8] }}
        light_mlp {{ hidden_units: [8] }}
        feature_based_distillation: true }}""",
    "simple_multi_task": f"simple_multi_task {{ {TASKS2} }}",
    "mmoe": f"""mmoe {{ expert_mlp {MLP16} num_expert: 2 {TASKS2} }}""",
    "ple": """ple {
        extraction_networks { network_name: "l1" expert_num_per_task: 1
            share_num: 1 task_expert_net { hidden_units: [16] }
            share_expert_net { hidden_units: [16] } }
        task_towers { tower_name: "t1" label_name: "label"
            mlp { hidden_units: [8] }
            losses { binary_cross_entropy {} } metrics { auc {} } }
        task_towers { tower_name: "t2" label_name: "label2"
            mlp { hidden_units: [8] }
            losses { binary_cross_entropy {} } metrics { auc {} } } }""",
    "dbmtl": """dbmtl {
        bottom_mlp { hidden_units: [16] }
        expert_mlp { hidden_units: [16] }
        num_expert: 2
        task_towers { tower_name: "ctr" label_name: "label"
            mlp { hidden_units: [8] }
            losses { binary_cross_entropy {} } metrics { auc {} } }
        task_towers { tower_name: "cvr" label_name: "label2"
            mlp { hidden_units: [8] }
            relation_tower_names: "ctr"
            relation_mlp { hidden_units: [8] }
            losses { binary_cross_entropy {} } metrics { auc {} } } }""",
    "dc2vr": """dc2vr {
        bottom_mlp { hidden_units: [16] }
        task_towers { tower_name: "ctr" label_name: "label"
            mlp { hidden_units: [8] } low_rank_dim: 4
            losses { binary_cross_entropy {} } metrics { auc {} } }
        task_towers { tower_name: "cvr" label_name: "label2"
            mlp { hidden_units: [8] }
            intervention_tower_names: "ctr" low_rank_dim: 4
            losses { binary_cross_entropy {} } metrics { auc {} } } }""",
    "pepnet": """pepnet {
        epnet_hidden_unit: 16
        ppnet_hidden_units: [16, 8]
        task_towers { tower_name: "t1" label_name: "label"
            losses { binary_cross_entropy {} } metrics { auc {} } }
        }""",
    "dssm": """dssm {
        user_tower { input: "user" mlp { hidden_units: [16] } }
        item_tower { input: "item" mlp { hidden_units: [16] } }
        output_dim: 8 in_batch_negative: true }""",
    "dat": """dat {
        user_tower { input: "user" augment_input: "user_aug"
                     mlp { hidden_units: [16] } }
        item_tower { input: "item" augment_input: "item_aug"
                     mlp { hidden_units: [16] } }
        output_dim: 8 in_batch_negative: true
        amm_i_weight: 0.5 amm_u_weight: 0.5 }""",
    "mind": """mind {
        user_tower {
            input: "user" history_input: "seq"
            user_mlp { hidden_units: [16] }
            capsule_config { max_seq_len: 8 high_dim: 16 max_k: 3 }
            concat_mlp { hidden_units: [16] }
            user_seq_combine: CONCAT
        }
        item_tower { input: "item" mlp { hidden_units: [16] } }
        output_dim: 8 in_batch_negative: true simi_pow: 10 }""",
    "hstu_match": """hstu_match {
        user_tower {
            input: "seq"
            hstu { stu { embedding_dim: 32 hidden_dim: 8
                         attention_dim: 8 num_heads: 2 num_layers: 1 } }
            max_seq_len: 8
        }
        item_tower { input: "item" mlp { hidden_units: [32] } }
        output_dim: 8 in_batch_negative: true }""",
    "tdm": """tdm {
        multiwindow_din { windows_len: [2, 2, 4]
                          attn_mlp { hidden_units: [8] } }
        final { hidden_units: [16] } }""",
}


def _make_batch(features, labels):
    rng = np.random.default_rng(0)
    cols = {
        "uid": pa.array(rng.integers(0, 50, B)),
        "iid": pa.array(rng.integers(0, 60, B)),
        "cat": pa.array(rng.integers(0, 10, B)),
        "domain": pa.array(rng.integers(0, 4, B)),
        "price": pa.array(rng.normal(size=B).astype(np.float32)),
        "clicks": pa.array([
            ";".join(str(x) for x in rng.integers(0, 60, rng.integers(1, 8)))
            for _ in range(B)
        ]),
        "label": pa.array((rng.random(B) > 0.5).astype(np.float32)),
        "label2": pa.array((rng.random(B) > 0.5).astype(np.float32)),
    }
    parser = DataParser(features, labels=labels)
    return parser.parse_to_batch(cols)


@pytest.mark.parametrize("model_name", sorted(MODEL_CONFIGS))
def test_model_forward_and_train_step(model_name):
    feature_cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in FEATURES
    ]
    features = create_features(feature_cfgs)
    mc_text = GROUPS_RANK + MODEL_CONFIGS[model_name] + """
    losses { binary_cross_entropy {} }
    metrics { auc {} }
    """
    model_config = text_format.Parse(mc_text, model_pb2.ModelConfig())
    labels = ["label", "label2"]
    opt = SparseOptimizer("adagrad", {"lr": 0.01})
    model = create_model(
        model_config, features, labels, sparse_optimizer=opt
    )
    batch = _make_batch(features, labels)

    cfg = pipeline_pb2.EasyRecConfig()
    dense_params = model.init(jax.random.key(0))
    tables = model.embedding_group.init_tables(jax.random.key(1))
    sparse_opt = model.embedding_group.init_opt_state()

    from torcheasyrec_tpu.protos import optimizer_pb2

    dense_cfg = optimizer_pb2.DenseOptimizer()
    dense_cfg.adam_optimizer.lr = 0.01
    tx, sched = create_dense_optimizer(dense_cfg, dense_params)
    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense_params),
        "step": jnp.zeros((), jnp.int32),
    }
    step = jax.jit(make_train_step(
        model, tx, {"fn": lambda s: jnp.float32(1.0)},
        {"fn": lambda s: jnp.float32(1.0)}, jnp.float32,
    ))
    new_state, metrics, _ = step(state, batch, jax.random.key(2))
    loss = float(jax.device_get(metrics["total_loss"]))
    assert np.isfinite(loss), f"{model_name}: loss={loss}"
    # params actually moved
    moved = jax.tree_util.tree_reduce(
        lambda acc, pair: acc, [0], 0
    )
    # eval-mode metrics update runs
    from torcheasyrec_tpu.modules import module as M

    preds = model.forward(
        new_state["dense"], new_state["tables"], batch,
        M.Context(training=False),
    )
    metrics_list = model.init_metrics()
    model.update_metrics(metrics_list, jax.device_get(preds), batch)


@pytest.mark.parametrize("model_name", sorted(MODEL_CONFIGS))
def test_bn_state_updates_resolve(model_name):
    """Every batch-norm running-stat update path collected during a
    train step must resolve into the dense-params tree — a mismatched
    path silently freezes that layer's running stats."""
    import re

    from torcheasyrec_tpu.main import apply_state_updates

    feature_cfgs = [
        text_format.Parse(t, feature_pb2.FeatureConfig()) for t in FEATURES
    ]
    features = create_features(feature_cfgs)
    # force BN on every MLP in the config
    cfg_txt = re.sub(
        r"(?<!_)hidden_units: (\[[0-9, ]+\])",
        r"hidden_units: \1 use_bn: true",
        MODEL_CONFIGS[model_name],
    )
    mc_text = GROUPS_RANK + cfg_txt + """
    losses { binary_cross_entropy {} }
    metrics { auc {} }
    """
    model_config = text_format.Parse(mc_text, model_pb2.ModelConfig())
    labels = ["label", "label2"]
    opt = SparseOptimizer("adagrad", {"lr": 0.01})
    model = create_model(
        model_config, features, labels, sparse_optimizer=opt
    )
    batch = _make_batch(features, labels)
    dense_params = model.init(jax.random.key(0))
    tables = model.embedding_group.init_tables(jax.random.key(1))
    sparse_opt = model.embedding_group.init_opt_state()

    from torcheasyrec_tpu.protos import optimizer_pb2

    dense_cfg = optimizer_pb2.DenseOptimizer()
    dense_cfg.adam_optimizer.lr = 0.01
    tx, _ = create_dense_optimizer(dense_cfg, dense_params)
    state = {
        "dense": dense_params,
        "tables": tables,
        "sparse_opt": sparse_opt,
        "dense_opt": tx.init(dense_params),
        "step": jnp.zeros((), jnp.int32),
    }
    step = jax.jit(make_train_step(
        model, tx, {"fn": lambda s: jnp.float32(1.0)},
        {"fn": lambda s: jnp.float32(1.0)}, jnp.float32,
    ))
    new_state, _, state_updates = step(state, batch, jax.random.key(2))
    bn_updates = {
        k: v for k, v in jax.device_get(state_updates).items()
        if k.endswith(".bn")
    }
    if not bn_updates:
        pytest.skip(f"{model_name}: no BN-capable MLP in config")
    _, skipped = apply_state_updates(
        new_state["dense"], bn_updates, return_skipped=True
    )
    assert not skipped, f"{model_name}: unresolved BN paths {skipped}"
