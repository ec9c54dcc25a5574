"""TF-EasyRec config converter test: output parses and trains."""

import os

import pytest


TF_EASYREC_CONFIG = """
train_input_path: "train.parquet"
eval_input_path: "eval.parquet"
model_dir: "experiments/deepfm"
train_config {
  optimizer_config {
    adam_optimizer { learning_rate { constant_learning_rate { learning_rate: 0.001 } } }
  }
  num_steps: 2500
}
data_config {
  batch_size: 4096
  label_fields: "clk"
  input_type: CSVInput
}
feature_config: {
  features: {
    input_names: "user_id"
    feature_type: IdFeature
    embedding_dim: 16
    hash_bucket_size: 100000
  }
  features: {
    input_names: "price"
    feature_type: RawFeature
  }
}
model_config {
  model_class: "DeepFM"
  feature_groups: {
    group_name: "wide"
    feature_names: "user_id"
    wide_deep: WIDE
  }
  feature_groups: {
    group_name: "deep"
    feature_names: "user_id"
    feature_names: "price"
    wide_deep: DEEP
  }
}
"""


def test_convert_parses_and_loads(tmp_path):
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.convert_easyrec_config import convert

    converted, warnings = convert(TF_EASYREC_CONFIG)
    cfg = text_format.Parse(converted, pipeline_pb2.EasyRecConfig())
    assert cfg.train_input_path == "train.parquet"
    assert cfg.data_config.batch_size == 4096
    assert list(cfg.data_config.label_fields) == ["clk"]
    assert len(cfg.feature_configs) == 2
    assert cfg.feature_configs[0].id_feature.hash_bucket_size == 100000
    assert cfg.model_config.WhichOneof("model") == "deepfm"
    groups = {g.group_name for g in cfg.model_config.feature_groups}
    # 'fm' is synthesized from the deep group's embedded features so
    # the converted DeepFM trains without manual edits
    assert groups == {"wide", "deep", "fm"}
    # the TF optimizer is converted for real: lr + constant schedule
    assert abs(cfg.train_config.dense_optimizer.adam_optimizer.lr - 0.001) < 1e-9
    assert abs(cfg.train_config.sparse_optimizer.adam_optimizer.lr - 0.001) < 1e-9
    assert cfg.train_config.num_steps == 2500
    assert cfg.model_config.deepfm.deep.hidden_units  # dims present
    assert any("input_type" in w for w in warnings)


def test_convert_mmoe_with_decay_and_task_towers():
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.convert_easyrec_config import convert

    src = """
train_config {
  optimizer_config {
    adagrad_optimizer { learning_rate { exponential_decay_learning_rate {
      initial_learning_rate: 0.05 decay_steps: 2000 decay_factor: 0.7
      min_learning_rate: 0.0001 } } }
  }
  num_steps: 100
}
data_config { batch_size: 512 }
feature_config {
  features { input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 100 }
  features { input_names: "tags" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 50 kv_separator: ":" }
  features { input_names: "hist" feature_type: SequenceFeature
             sub_feature_type: IdFeature sequence_length: 30
             embedding_dim: 8 hash_bucket_size: 100 }
}
model_config {
  model_class: "MMoE"
  feature_groups { group_name: "all" feature_names: "uid"
                   feature_names: "tags" wide_deep: DEEP }
  mmoe {
    expert_dnn { hidden_units: [256, 128] }
    num_expert: 3
    task_towers { tower_name: "ctr" label_name: "clk"
                  dnn { hidden_units: [64] } }
    task_towers { tower_name: "cvr" label_name: "buy"
                  dnn { hidden_units: [32] } }
  }
}
"""
    converted, warnings = convert(src)
    cfg = text_format.Parse(converted, pipeline_pb2.EasyRecConfig())
    ad = cfg.train_config.dense_optimizer.adagrad_optimizer
    assert abs(ad.lr - 0.05) < 1e-7
    ed = cfg.train_config.dense_optimizer.exponential_decay_learning_rate
    assert ed.decay_size == 2000 and abs(ed.decay_factor - 0.7) < 1e-6
    # labels recovered from task towers
    assert list(cfg.data_config.label_fields) == ["clk", "buy"]
    m = cfg.model_config.mmoe
    assert list(m.expert_mlp.hidden_units) == [256, 128]
    assert m.num_expert == 3
    assert [t.tower_name for t in m.task_towers] == ["ctr", "cvr"]
    assert list(m.task_towers[0].mlp.hidden_units) == [64]
    assert m.task_towers[0].label_name == "clk"
    # feature types: TagFeature -> weighted id; SequenceFeature -> seq id
    f_by_name = {
        getattr(f, f.WhichOneof("feature")).feature_name: f
        for f in cfg.feature_configs
    }
    assert f_by_name["tags"].id_feature.weighted
    assert f_by_name["hist"].WhichOneof("feature") == "sequence_id_feature"
    assert f_by_name["hist"].sequence_id_feature.sequence_length == 30

    # the converted config BUILDS a real model
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.models import create_model
    from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer

    feats = create_features(list(cfg.feature_configs))
    model = create_model(
        cfg.model_config, feats, list(cfg.data_config.label_fields),
        sparse_optimizer=SparseOptimizer("adagrad", {"lr": 0.05}),
    )
    assert model is not None


def test_convert_from_fg_json():
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.convert_easyrec_config import convert

    fg = {"features": [
        {"feature_type": "id_feature", "feature_name": "user_id",
         "expression": "user:user_id", "hash_bucket_size": 1000,
         "embedding_dim": 16, "default_value": "-1"},
        {"feature_type": "raw_feature", "feature_name": "price",
         "expression": "item:price",
         "normalizer": "method=log10,threshold=1e-10,default=-10"},
        {"feature_type": "lookup_feature", "feature_name": "kv",
         "map": "user:kv_map", "key": "item:kv_key"},
        {"feature_type": "match_feature", "feature_name": "m",
         "user": "user:m_map", "category": "item:cate",
         "item": "item:iid"},
        {"sequence_name": "click_seq", "sequence_length": 40,
         "sequence_delim": ";", "features": [
             {"feature_type": "id_feature", "feature_name": "iid",
              "expression": "item:iid", "hash_bucket_size": 2000,
              "embedding_dim": 16},
             {"feature_type": "raw_feature", "feature_name": "ts",
              "expression": "item:ts"},
         ]},
    ]}
    src = """
model_config {
  model_class: "DSSM"
  feature_groups { group_name: "user" feature_names: "user_id"
                   wide_deep: DEEP }
  feature_groups { group_name: "item" feature_names: "price"
                   wide_deep: DEEP }
  dssm {
    user_tower { id: "user" dnn { hidden_units: [128, 32] } }
    item_tower { id: "item" dnn { hidden_units: [128, 32] } }
    temperature: 0.2
  }
}
data_config { batch_size: 256 label_fields: "clk" }
"""
    converted, warnings = convert(src, fg)
    cfg = text_format.Parse(converted, pipeline_pb2.EasyRecConfig())
    from torcheasyrec_tpu.protos import data_pb2

    assert cfg.data_config.fg_mode == data_pb2.FgMode.FG_NORMAL
    by = {}
    for f in cfg.feature_configs:
        which = f.WhichOneof("feature")
        msg = getattr(f, which)
        key = getattr(msg, "feature_name", None) or getattr(
            msg, "sequence_name", ""
        )
        by[key] = (which, msg)
    assert by["user_id"][0] == "id_feature"
    assert by["user_id"][1].hash_bucket_size == 1000
    assert by["price"][1].normalizer.startswith("method=log10")
    assert by["kv"][1].map == "user:kv_map"
    assert by["m"][1].nested_map == "user:m_map"
    assert by["m"][1].pkey == "item:cate"
    seq = by["click_seq"][1]
    assert seq.sequence_length == 40 and len(seq.features) == 2
    d = cfg.model_config.dssm
    assert d.user_tower.input == "user"
    assert list(d.user_tower.mlp.hidden_units) == [128, 32]
    assert abs(d.temperature - 0.2) < 1e-6


def test_reference_configs_parse():
    """Config vocabulary compat: every upstream example/test/benchmark
    config must parse with our proto schema (text_format.Merge, the
    reference's own load path)."""
    import glob
    import os

    import pytest
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not mounted")
    paths = sorted(
        glob.glob("/root/reference/examples/*.config")
        + glob.glob("/root/reference/tzrec/tests/configs/*.config")
        + glob.glob(
            "/root/reference/tzrec/benchmark/configs/**/*.config",
            recursive=True,
        )
    )
    assert len(paths) > 50
    fails = []
    for p in paths:
        try:
            text_format.Merge(
                open(p).read(), pipeline_pb2.EasyRecConfig()
            )
        except Exception as e:  # noqa: BLE001
            fails.append(f"{os.path.basename(p)}: {e}")
    assert not fails, "\n".join(fails)


def test_reference_example_configs_build_and_forward():
    """Upstream example configs BUILD real models and run a forward pass
    on generated mock data (full sweep: 17/17 — see COVERAGE.md).
    Gated: huge criteo/taobao vocab sizes make CPU table init slow, so
    CI covers two representative configs; set SWEEP_ALL_CONFIGS=1 for
    the full sweep."""
    import os

    import jax
    import jax.numpy as jnp
    import pytest

    if not os.path.isdir("/root/reference"):
        pytest.skip("reference checkout not mounted")

    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.models import create_model
    from torcheasyrec_tpu.modules import module as M
    from torcheasyrec_tpu.parallel.sparse_optim import SparseOptimizer
    from torcheasyrec_tpu.utils.test_util import generate_mock_table

    import numpy as np
    from google.protobuf import text_format

    from torcheasyrec_tpu.protos import pipeline_pb2

    names = ["dbmtl_taobao_seq", "mmoe_taobao"]
    if os.environ.get("SWEEP_ALL_CONFIGS"):
        import glob

        names = [
            os.path.basename(p)[:-7]
            for p in glob.glob("/root/reference/examples/*.config")
        ]
    for name in names:
        cfg = pipeline_pb2.EasyRecConfig()
        text_format.Merge(
            open(f"/root/reference/examples/{name}.config").read(), cfg
        )
        feats = create_features(
            list(cfg.feature_configs), fg_mode=cfg.data_config.fg_mode
        )
        labels = list(cfg.data_config.label_fields)
        model = create_model(
            cfg.model_config, feats, labels,
            sparse_optimizer=SparseOptimizer("adagrad", {"lr": 0.01}),
        )
        tbl = generate_mock_table(feats, 16, labels, seed=0)
        parser = DataParser(feats, labels=labels)
        batch = parser.parse_to_batch(
            {c: tbl.column(c) for c in tbl.schema.names}
        )
        dense = model.init(jax.random.key(0))
        tables = model.embedding_group.init_tables(jax.random.key(1))
        preds = model.forward(
            dense, tables, batch, M.Context(training=False)
        )
        losses = model.loss(preds, batch)
        total = float(sum(jnp.sum(v) for v in losses.values()))
        assert np.isfinite(total), name


# ------------------------------------------------------------------
# Golden conversion matrix (VERDICT r2 #8): one realistic TF-EasyRec
# config per model family -> convert -> parse -> build -> train 10
# steps on mock parquet. Mirrors the reference converter's family
# coverage (tzrec convert_easyrec_config_to_tzrec_config.py:855-939:
# DBMTL/SimpleMultiTask/MMoE/PLE/DeepFM/MultiTower/DSSM) plus the
# extra families this converter maps.
# ------------------------------------------------------------------

_TF_FEATURES = """
feature_config {
  features { input_names: "uid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 1000 }
  features { input_names: "iid" feature_type: IdFeature
             embedding_dim: 8 hash_bucket_size: 2000 }
  features { input_names: "tags" feature_type: TagFeature
             embedding_dim: 8 hash_bucket_size: 50 kv_separator: ":" }
  features { input_names: "price" feature_type: RawFeature }
}
"""

_TF_HEAD = """
train_input_path: "train.parquet"
eval_input_path: "eval.parquet"
model_dir: "model"
train_config {
  optimizer_config {
    adam_optimizer { learning_rate { constant_learning_rate {
      learning_rate: 0.002 } } }
  }
  num_steps: 50
}
data_config { batch_size: 128 label_fields: "clk" label_fields: "buy"
              input_type: ParquetInput }
"""

_RANK_GROUPS = """
  feature_groups { group_name: "wide" feature_names: "uid"
                   feature_names: "iid" wide_deep: WIDE }
  feature_groups { group_name: "deep" feature_names: "uid"
                   feature_names: "iid" feature_names: "tags"
                   feature_names: "price" wide_deep: DEEP }
"""

_TASK_TOWERS = """
    task_towers { tower_name: "ctr" label_name: "clk"
                  dnn { hidden_units: [16] } }
    task_towers { tower_name: "cvr" label_name: "buy"
                  dnn { hidden_units: [16] }
                  metrics_set { gauc { uid_field: "uid" } } }
"""

_FAMILY_CONFIGS = {
    "DeepFM": _RANK_GROUPS + """
  model_class: "DeepFM"
  deepfm { dnn { hidden_units: [32, 16] }
           final_dnn { hidden_units: [16] }
           wide_output_dim: 4 }
""",
    "WideAndDeep": _RANK_GROUPS + """
  model_class: "WideAndDeep"
  wide_and_deep { dnn { hidden_units: [32, 16] }
                  final_dnn { hidden_units: [16] } }
""",
    "MultiTower": """
  feature_groups { group_name: "user" feature_names: "uid"
                   feature_names: "tags" wide_deep: DEEP }
  feature_groups { group_name: "item" feature_names: "iid"
                   feature_names: "price" wide_deep: DEEP }
  model_class: "MultiTower"
  multi_tower {
    towers { input: "user" dnn { hidden_units: [32, 16] } }
    towers { input: "item" dnn { hidden_units: [32, 16] } }
    final_dnn { hidden_units: [16] }
  }
""",
    "DCN": _RANK_GROUPS + """
  model_class: "DCN"
  dcn { cross_tower { cross_num: 2 }
        deep_tower { dnn { hidden_units: [32, 16] } }
        final_dnn { hidden_units: [16] } }
""",
    "MMoE": _RANK_GROUPS + """
  model_class: "MMoE"
  mmoe { expert_dnn { hidden_units: [32, 16] } num_expert: 2
""" + _TASK_TOWERS + "  }\n",
    "DBMTL": _RANK_GROUPS + """
  model_class: "DBMTL"
  dbmtl {
    bottom_dnn { hidden_units: [32] }
    expert_dnn { hidden_units: [16] }
    num_expert: 2
    task_towers { tower_name: "ctr" label_name: "clk"
                  dnn { hidden_units: [16] } }
    task_towers { tower_name: "cvr" label_name: "buy"
                  dnn { hidden_units: [16] }
                  relation_tower_names: "ctr"
                  relation_dnn { hidden_units: [8] } }
  }
""",
    "PLE": _RANK_GROUPS + """
  model_class: "PLE"
  ple {
    extraction_networks {
      network_name: "layer1" expert_num_per_task: 2 share_num: 1
      task_expert_net { hidden_units: [32, 16] }
      share_expert_net { hidden_units: [32, 16] }
    }
""" + _TASK_TOWERS + "  }\n",
    "SimpleMultiTask": _RANK_GROUPS + """
  model_class: "SimpleMultiTask"
  simple_multi_task {
""" + _TASK_TOWERS + "  }\n",
}


def _mock_inputs(tmp_path, cfg):
    import os

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    features = create_features(list(cfg.feature_configs))
    labels = list(cfg.data_config.label_fields)
    write_mock_parquet(
        os.path.join(str(tmp_path), "train.parquet"), features, 2048,
        labels, seed=0,
    )
    write_mock_parquet(
        os.path.join(str(tmp_path), "eval.parquet"), features, 512,
        labels, seed=1,
    )


@pytest.mark.parametrize("family", sorted(_FAMILY_CONFIGS))
def test_golden_family_converts_and_trains(tmp_path, family):
    import os

    import numpy as np
    from google.protobuf import text_format

    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.convert_easyrec_config import convert

    src = _TF_HEAD + _TF_FEATURES + "model_config {\n" + (
        _FAMILY_CONFIGS[family]
    ) + "}\n"
    converted, warnings = convert(src)
    cfg = text_format.Parse(converted, pipeline_pb2.EasyRecConfig())
    # every family maps to its model oneof — no manual-review fallback
    assert cfg.model_config.WhichOneof("model") is not None
    assert not any("no direct mapping" in w for w in warnings), warnings

    # converted config must TRAIN, not just parse (reference converter
    # contract: the output is a runnable tzrec config)
    tmp = str(tmp_path)
    cfg.train_input_path = os.path.join(tmp, "train.parquet")
    cfg.eval_input_path = os.path.join(tmp, "eval.parquet")
    cfg.model_dir = os.path.join(tmp, "model")
    cfg.train_config.num_steps = 10
    cfg.train_config.ClearField("num_epochs")
    _mock_inputs(tmp_path, cfg)
    cfg_path = os.path.join(tmp, "converted.config")
    with open(cfg_path, "w") as f:
        f.write(text_format.MessageToString(cfg))
    result = tzrec_main.train_and_evaluate(cfg_path)
    assert result, family
    assert all(np.isfinite(v) for v in result.values()), result
    # multi-task conversions carry per-tower metrics incl. the gauc map
    if family in ("MMoE", "PLE", "SimpleMultiTask"):
        assert any(k.startswith(("auc", "grouped_auc")) for k in result)
        assert any("cvr" in k for k in result), result


def test_golden_dssm_converts_and_builds(tmp_path):
    """DSSM maps towers + similarity; build the converted model (the
    train loop needs a negative sampler config, out of matrix scope)."""
    from google.protobuf import text_format

    from torcheasyrec_tpu.main import _build_model_and_optim
    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.tools.convert_easyrec_config import convert

    src = _TF_HEAD + _TF_FEATURES + """
model_config {
  feature_groups { group_name: "user" feature_names: "uid"
                   feature_names: "tags" wide_deep: DEEP }
  feature_groups { group_name: "item" feature_names: "iid"
                   feature_names: "price" wide_deep: DEEP }
  model_class: "DSSM"
  dssm {
    user_tower { id: "user" dnn { hidden_units: [32, 16] } }
    item_tower { id: "item" dnn { hidden_units: [32, 16] } }
    temperature: 0.2
  }
}
"""
    converted, _ = convert(src)
    cfg = text_format.Parse(converted, pipeline_pb2.EasyRecConfig())
    assert cfg.model_config.WhichOneof("model") == "dssm"
    assert abs(cfg.model_config.dssm.temperature - 0.2) < 1e-6
    cfg.data_config.ClearField("label_fields")
    cfg.data_config.label_fields.append("clk")
    model, features, _ = _build_model_and_optim(cfg, None)
    assert model is not None
