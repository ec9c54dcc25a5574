"""TF-EasyRec config converter test: output parses and trains."""

import os


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
    assert groups == {"wide", "deep"}
    assert any("optimizer" in w for w in warnings)
    assert any("input_type" in w for w in warnings)


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
