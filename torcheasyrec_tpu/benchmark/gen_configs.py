"""Emit the criteo_synth benchmark configs.

Counterpart of the reference's hand-written benchmark configs
(/root/reference/tzrec/benchmark/configs/criteo/*.config): same model
families over the synthetic Criteo-statistics dataset
(benchmark/synthetic.py). Run as a module to (re)generate:

    python -m torcheasyrec_tpu.benchmark.gen_configs
"""

import os

from torcheasyrec_tpu.benchmark.synthetic import CRITEO_BUCKETS, N_DENSE

DATA_ROOT = "/tmp/tzrec_bench_data"
TRAIN = f"{DATA_ROOT}/criteo_synth_train_262144_v3.parquet"
EVAL = f"{DATA_ROOT}/criteo_synth_eval_65536_v3.parquet"
ITEMS = f"{DATA_ROOT}/criteo_synth_items.parquet"

CATS = [f"cat_{j}" for j in range(len(CRITEO_BUCKETS))]
INTS = [f"int_{i}" for i in range(N_DENSE)]


def _names(names):
    return "".join(f'    feature_names: "{n}"\n' for n in names)


def _header(model_name: str, labels, with_seq: bool = False) -> str:
    label_lines = "".join(f'  label_fields: "{la}"\n' for la in labels)
    feats = []
    for j, b in enumerate(CRITEO_BUCKETS):
        if with_seq and b > 50_000:
            continue  # see LOWCARD_CATS
        feats.append(
            f'feature_configs {{ id_feature {{ feature_name: "cat_{j}" '
            f"num_buckets: {b} embedding_dim: 16 }} }}"
        )
    for i in range(N_DENSE):
        feats.append(
            f'feature_configs {{ raw_feature {{ feature_name: "int_{i}" }} }}'
        )
    if with_seq:
        from torcheasyrec_tpu.benchmark.synthetic import N_ITEMS, SEQ_LEN

        feats.append(
            'feature_configs { id_feature { feature_name: "tgt_item" '
            f"num_buckets: {N_ITEMS} embedding_dim: 16 "
            'embedding_name: "item_emb" } }'
        )
        feats.append(
            "feature_configs { sequence_id_feature { "
            'feature_name: "click_seq" '
            f"num_buckets: {N_ITEMS} embedding_dim: 16 "
            f"sequence_length: {SEQ_LEN} "
            'embedding_name: "item_emb" } }'
        )
    return (
        f'train_input_path: "{TRAIN}"\n'
        f'eval_input_path: "{EVAL}"\n'
        f'model_dir: "/tmp/tzrec_bench_model/{model_name}"\n'
        "train_config {\n"
        "  sparse_optimizer { rowwise_adagrad_optimizer { lr: 0.01 }"
        " constant_learning_rate {} }\n"
        "  dense_optimizer { adam_optimizer { lr: 0.001 }"
        " constant_learning_rate {} }\n"
        "  num_epochs: 1\n"
        "  save_checkpoints_steps: 100000\n"
        "  log_step_count_steps: 20\n"
        '  mixed_precision: "BF16"\n'
        "}\n"
        "eval_config {}\n"
        "data_config {\n"
        "  batch_size: 4096\n"
        "  dataset_type: ParquetDataset\n"
        "  fg_mode: FG_NONE\n"
        f"{label_lines}"
        "}\n" + "\n".join(feats) + "\n"
    )


_RANK_GROUPS = (
    "  feature_groups {\n"
    '    group_name: "wide"\n' + _names(CATS) + "    group_type: WIDE\n  }\n"
    "  feature_groups {\n"
    '    group_name: "fm"\n' + _names(CATS) + "    group_type: DEEP\n  }\n"
    "  feature_groups {\n"
    '    group_name: "deep"\n' + _names(CATS + INTS)
    + "    group_type: DEEP\n  }\n"
)

_DLRM_GROUPS = (
    "  feature_groups {\n"
    '    group_name: "sparse"\n' + _names(CATS)
    + "    group_type: DEEP\n  }\n"
    "  feature_groups {\n"
    '    group_name: "dense"\n' + _names(INTS) + "    group_type: DEEP\n  }\n"
)

_DEEP_GROUP = (
    "  feature_groups {\n"
    '    group_name: "all"\n' + _names(CATS + INTS)
    + "    group_type: DEEP\n  }\n"
)

# sequence configs use only the LOW-cardinality cats: at 262k rows the
# 100k-bucket embeddings see ~2.6 rows/bucket and act as pure row
# memorizers, drowning the planted sequence signal the configs exist
# to regression-test (measured: full-cat DIN overfits past 1 epoch,
# eval BCE 0.64 -> 2.8)
LOWCARD_CATS = [
    f"cat_{j}" for j, b in enumerate(CRITEO_BUCKETS) if b <= 50_000
]

_DEEP_GROUP_SEQ = (
    "  feature_groups {\n"
    '    group_name: "all"\n' + _names(LOWCARD_CATS + INTS)
    + "    group_type: DEEP\n  }\n"
)

_TAIL_RANK = (
    "  num_class: 1\n"
    "  losses { binary_cross_entropy {} }\n"
    "  metrics { auc {} }\n"
    "  metrics { grouped_auc { grouping_key: \"cat_10\" } }\n"
)

_TASKS = """  task_towers { tower_name: "ctr" label_name: "label"
    mlp { hidden_units: [128, 64] }
    losses { binary_cross_entropy {} } metrics { auc {} } }
  task_towers { tower_name: "cvr" label_name: "conversion"
    mlp { hidden_units: [128, 64] }
    losses { binary_cross_entropy {} } metrics { auc {} } }
"""

_SEQ_GROUPS = (
    "  feature_groups {\n"
    '    group_name: "seq"\n'
    '    feature_names: "tgt_item"\n'
    '    feature_names: "click_seq"\n'
    "    group_type: SEQUENCE\n  }\n"
)

_TASKS_SEQ = """  task_towers { tower_name: "ctr" label_name: "label_seq"
    mlp { hidden_units: [128, 64] }
    losses { binary_cross_entropy {} } metrics { auc {} } }
  task_towers { tower_name: "cvr" label_name: "conversion"
    mlp { hidden_units: [128, 64] }
    losses { binary_cross_entropy {} } metrics { auc {} } }
"""

MODELS = {
    "deepfm": (
        ["label"],
        _RANK_GROUPS
        + "  deepfm {\n    deep { hidden_units: [512, 256, 128] }\n"
        "    final { hidden_units: [128, 64] }\n"
        "    wide_embedding_dim: 4\n  }\n" + _TAIL_RANK,
    ),
    "wide_and_deep": (
        ["label"],
        _RANK_GROUPS
        + "  wide_and_deep {\n    deep { hidden_units: [512, 256, 128] }\n"
        "    final { hidden_units: [128, 64] }\n"
        "    wide_embedding_dim: 4\n  }\n" + _TAIL_RANK,
    ),
    "dlrm": (
        ["label"],
        _DLRM_GROUPS
        + "  dlrm {\n    dense_mlp { hidden_units: [256, 64, 16] }\n"
        "    final { hidden_units: [256, 128, 64] }\n  }\n" + _TAIL_RANK,
    ),
    "dcn_v2": (
        ["label"],
        _DEEP_GROUP
        + "  dcn_v2 {\n    cross { cross_num: 3 low_rank: 64 }\n"
        "    deep { hidden_units: [512, 256] }\n"
        "    final { hidden_units: [128, 64] }\n  }\n" + _TAIL_RANK,
    ),
    "masknet": (
        ["label"],
        _DEEP_GROUP
        + "  mask_net {\n    mask_net_module {\n"
        "      n_mask_blocks: 3\n"
        "      mask_block { hidden_dim: 256 aggregation_dim: 64 }\n"
        "      top_mlp { hidden_units: [256, 128, 64] }\n    }\n  }\n"
        + _TAIL_RANK,
    ),
    "mmoe": (
        ["label", "conversion"],
        _DEEP_GROUP
        + "  mmoe {\n    expert_mlp { hidden_units: [256, 128] }\n"
        "    num_expert: 4\n" + _TASKS + "  }\n",
    ),
    "ple": (
        ["label", "conversion"],
        _DEEP_GROUP
        + "  ple {\n"
        '    extraction_networks { network_name: "l1"\n'
        "      expert_num_per_task: 2 share_num: 2\n"
        "      task_expert_net { hidden_units: [256, 128] }\n"
        "      share_expert_net { hidden_units: [256, 128] } }\n"
        + _TASKS + "  }\n",
    ),
    "dbmtl": (
        ["label", "conversion"],
        _DEEP_GROUP
        + "  dbmtl {\n    bottom_mlp { hidden_units: [512] }\n"
        "    expert_mlp { hidden_units: [256, 128] }\n    num_expert: 4\n"
        + _TASKS.replace(
            'tower_name: "cvr" label_name: "conversion"',
            'tower_name: "cvr" label_name: "conversion"\n'
            '    relation_tower_names: "ctr"\n'
            "    relation_mlp { hidden_units: [64] }",
        )
        + "  }\n",
    ),
    "rocket_launching": (
        ["label"],
        _DEEP_GROUP
        + "  rocket_launching {\n"
        "    share_mlp { hidden_units: [256, 128] }\n"
        "    booster_mlp { hidden_units: [128, 64] }\n"
        "    light_mlp { hidden_units: [64] }\n"
        "    feature_based_distillation: true\n  }\n" + _TAIL_RANK,
    ),
    # DBMTL with the ctr tower trained by JRC (session = cat_10, the
    # user-ish grouping column) — the taobao dbmtl_jrc analogue
    "dbmtl_jrc": (
        ["label", "conversion"],
        _DEEP_GROUP
        + "  dbmtl {\n    bottom_mlp { hidden_units: [512] }\n"
        "    expert_mlp { hidden_units: [256, 128] }\n    num_expert: 4\n"
        + _TASKS.replace(
            'tower_name: "ctr" label_name: "label"\n'
            "    mlp { hidden_units: [128, 64] }\n"
            "    losses { binary_cross_entropy {} }",
            'tower_name: "ctr" label_name: "label"\n'
            "    num_class: 2\n"
            "    mlp { hidden_units: [128, 64] }\n"
            '    losses { jrc_loss { session_name: "cat_12" } }',
        ).replace(
            'tower_name: "cvr" label_name: "conversion"',
            'tower_name: "cvr" label_name: "conversion"\n'
            '    relation_tower_names: "ctr"\n'
            "    relation_mlp { hidden_units: [64] }",
        )
        + "  }\n",
    ),
    # sequence-signal configs (label_seq head): DIN target attention
    # over the planted click history vs a plain deep model — the
    # dbmtl_has_sequence / mmoe_has_sequence benchmark analogue
    "multi_tower_din": (
        ["label_seq"],
        _DEEP_GROUP_SEQ + _SEQ_GROUPS
        + "  multi_tower_din {\n"
        '    towers { input: "all" mlp { hidden_units: [256, 128] } }\n'
        '    din_towers { input: "seq"\n'
        "      attn_mlp { hidden_units: [64, 32] } }\n"
        "    final { hidden_units: [128, 64] }\n  }\n"
        "  num_class: 1\n"
        "  losses { binary_cross_entropy {} }\n"
        "  metrics { auc {} }\n",
        True,
    ),
    "mmoe_has_sequence": (
        ["label_seq", "conversion"],
        _DEEP_GROUP_SEQ + _SEQ_GROUPS.replace(
            "group_type: SEQUENCE",
            "group_type: SEQUENCE\n"
            "    sequence_encoders { din_encoder "
            '{ input: "seq" attn_mlp { hidden_units: [64, 32] } } }',
        )
        + "  mmoe {\n    expert_mlp { hidden_units: [256, 128] }\n"
        "    num_expert: 4\n" + _TASKS_SEQ + "  }\n",
        True,
    ),
}


def main() -> None:
    out_dir = os.path.join(os.path.dirname(__file__), "configs",
                           "criteo_synth")
    os.makedirs(out_dir, exist_ok=True)
    for name, spec in MODELS.items():
        labels, model_body = spec[0], spec[1]
        with_seq = bool(spec[2]) if len(spec) > 2 else False
        txt = (
            _header(name, labels, with_seq)
            + "model_config {\n" + model_body + "}\n"
        )
        with open(os.path.join(out_dir, f"{name}.config"), "w") as f:
            f.write(txt)
        print(f"wrote {name}.config")
    with open(os.path.join(out_dir, "dssm.config"), "w") as f:
        f.write(_dssm_config())
    print("wrote dssm.config")
    hstu_dir = os.path.join(os.path.dirname(__file__), "configs",
                            "hstu_synth")
    os.makedirs(hstu_dir, exist_ok=True)
    with open(os.path.join(hstu_dir, "dlrm_hstu.config"), "w") as f:
        f.write(_dlrm_hstu_config())
    print("wrote hstu_synth/dlrm_hstu.config")


def _dlrm_hstu_config() -> str:
    """Generative recommender benchmark (the kuairand dlrm_hstu
    analogue): HSTU over per-user interaction histories with a
    multi-task fusion tower (is_click / is_like action bitmask)."""
    return f"""train_input_path: "{DATA_ROOT}/hstu_synth_train_20480.parquet"
eval_input_path: "{DATA_ROOT}/hstu_synth_eval_4096.parquet"
model_dir: "/tmp/tzrec_bench_model/dlrm_hstu"
train_config {{
  sparse_optimizer {{ rowwise_adagrad_optimizer {{ lr: 0.05 }} constant_learning_rate {{}} }}
  dense_optimizer {{ adam_optimizer {{ lr: 0.002 }} constant_learning_rate {{}} }}
  num_epochs: 2
  save_checkpoints_steps: 100000
  log_step_count_steps: 20
}}
eval_config {{}}
data_config {{
  batch_size: 128
  dataset_type: ParquetDataset
  fg_mode: FG_NONE
  label_fields: "unused_label"
}}
feature_configs {{ id_feature {{ feature_name: "user_id" num_buckets: 2000 embedding_dim: 32 }} }}
feature_configs {{ sequence_id_feature {{ feature_name: "video_id" num_buckets: 5000 embedding_dim: 64 sequence_length: 32 }} }}
feature_configs {{ sequence_id_feature {{ feature_name: "item_video_id" num_buckets: 5000 embedding_dim: 64 sequence_length: 10 embedding_name: "video_id_emb" }} }}
feature_configs {{ sequence_raw_feature {{ feature_name: "action_weight" sequence_length: 32 }} }}
feature_configs {{ sequence_raw_feature {{ feature_name: "action_timestamp" sequence_length: 32 }} }}
feature_configs {{ sequence_raw_feature {{ feature_name: "item_query_time" sequence_length: 10 }} }}
feature_configs {{ sequence_raw_feature {{ feature_name: "item_action_weight" sequence_length: 10 }} }}
model_config {{
  feature_groups {{ group_name: "contextual" feature_names: "user_id" group_type: DEEP }}
  feature_groups {{ group_name: "uih" feature_names: "video_id" group_type: JAGGED_SEQUENCE }}
  feature_groups {{ group_name: "candidate" feature_names: "item_video_id" group_type: JAGGED_SEQUENCE }}
  feature_groups {{ group_name: "uih_action" feature_names: "action_weight" group_type: JAGGED_SEQUENCE }}
  feature_groups {{ group_name: "uih_timestamp" feature_names: "action_timestamp" group_type: JAGGED_SEQUENCE }}
  feature_groups {{ group_name: "candidate_timestamp" feature_names: "item_query_time" group_type: JAGGED_SEQUENCE }}
  dlrm_hstu {{
    hstu {{
      stu {{
        embedding_dim: 128
        hidden_dim: 32
        attention_dim: 32
        num_heads: 4
        num_layers: 3
      }}
      positional_encoder {{
        num_position_buckets: 128
        num_time_buckets: 64
        use_time_encoding: true
      }}
      input_preprocessor {{
        contextual_preprocessor {{
          action_encoder {{
            simple_action_encoder {{
              action_embedding_dim: 16
              action_weights: [1, 2]
            }}
          }}
        }}
      }}
      output_postprocessor {{ layernorm_postprocessor {{}} }}
    }}
    fusion_mtl_tower {{
      mlp {{ hidden_units: [128] }}
      task_configs {{
        task_name: "is_click"
        label_name: "item_action_weight"
        task_bitmask: 1
        losses {{ binary_cross_entropy {{}} }}
        metrics {{ auc {{}} }}
      }}
      task_configs {{
        task_name: "is_like"
        label_name: "item_action_weight"
        task_bitmask: 2
        losses {{ binary_cross_entropy {{}} }}
        metrics {{ auc {{}} }}
      }}
    }}
    max_seq_len: 48
    item_embedding_hidden_dim: 128
  }}
}}
"""


def _dssm_config() -> str:
    """Two-tower match benchmark (the taobao dssm analogue): user taste
    vs clicked item with 32 sampled negatives; recall@k is the pinned
    metric. Signal: 80% of clicked items come from the user's taste
    cluster (benchmark/synthetic.py)."""
    from torcheasyrec_tpu.benchmark.synthetic import (
        N_CLUSTERS,
        N_ITEMS,
    )

    return f"""train_input_path: "{TRAIN}"
eval_input_path: "{EVAL}"
model_dir: "/tmp/tzrec_bench_model/dssm"
train_config {{
  sparse_optimizer {{ adagrad_optimizer {{ lr: 0.05 }} constant_learning_rate {{}} }}
  dense_optimizer {{ adam_optimizer {{ lr: 0.001 }} constant_learning_rate {{}} }}
  num_epochs: 1
  save_checkpoints_steps: 100000
  log_step_count_steps: 20
}}
eval_config {{}}
data_config {{
  batch_size: 4096
  dataset_type: ParquetDataset
  fg_mode: FG_NONE
  label_fields: "pos_label"
  negative_sampler {{
    input_path: "{ITEMS}"
    num_sample: 32
    attr_fields: "item_id"
    attr_fields: "item_cluster"
    item_id_field: "item_id"
  }}
}}
feature_configs {{ id_feature {{ feature_name: "user_taste" expression: "user:user_taste" num_buckets: {N_CLUSTERS} embedding_dim: 16 }} }}
feature_configs {{ raw_feature {{ feature_name: "int_0" expression: "user:int_0" }} }}
feature_configs {{ id_feature {{ feature_name: "item_id" expression: "item:item_id" num_buckets: {N_ITEMS} embedding_dim: 16 }} }}
feature_configs {{ id_feature {{ feature_name: "item_cluster" expression: "item:item_cluster" num_buckets: {N_CLUSTERS} embedding_dim: 8 }} }}
model_config {{
  feature_groups {{
    group_name: "user"
    feature_names: "user_taste"
    feature_names: "int_0"
    group_type: DEEP
  }}
  feature_groups {{
    group_name: "item"
    feature_names: "item_id"
    feature_names: "item_cluster"
    group_type: DEEP
  }}
  dssm {{
    user_tower {{ input: "user" mlp {{ hidden_units: [64, 32] }} }}
    item_tower {{ input: "item" mlp {{ hidden_units: [64, 32] }} }}
    output_dim: 16
    temperature: 0.2
  }}
  metrics {{ recall_at_k {{ top_k: 1 }} }}
  metrics {{ recall_at_k {{ top_k: 5 }} }}
  losses {{ softmax_cross_entropy {{}} }}
}}
"""


if __name__ == "__main__":
    main()
