"""Checkpoint-resume regressions: optimizer state survives the graft,
multi-epoch resume replays data, reserved columns reach predict output."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pyarrow as pa


def test_adam_state_survives_roundtrip(tmp_path):
    """orbax raw-restores optax namedtuples as dicts/lists; the graft
    must rebuild them field-wise (a silent mismatch resets Adam)."""
    from torcheasyrec_tpu.utils.checkpoint_util import (
        _graft_tree,
        save_model,
    )
    import orbax.checkpoint as ocp

    params = {"w": jnp.ones((4,), jnp.float32)}
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    g = {"w": jnp.full((4,), 0.5, jnp.float32)}
    _, opt = tx.update(g, opt, params)
    state = {"dense_opt": opt, "step": jnp.int32(7)}

    ckpt = str(tmp_path / "ckpt")
    save_model(ckpt, jax.device_get(state))
    with ocp.PyTreeCheckpointer() as c:
        raw = c.restore(os.path.join(ckpt, "state"))

    fresh = {"dense_opt": tx.init(params), "step": jnp.int32(0)}
    restored = _graft_tree(fresh, raw)
    adam = restored["dense_opt"][0]
    assert int(adam.count) == 1, "Adam count lost in graft"
    np.testing.assert_allclose(np.asarray(adam.mu["w"]),
                               np.asarray(opt[0].mu["w"]), rtol=1e-6)
    assert int(restored["step"]) == 7


def test_multi_epoch_resume_replays_data(tmp_path):
    """Resume positions apply only to the first pass: epoch 2 of a
    resumed run must see the whole source again."""
    import pyarrow.parquet as pq

    from torcheasyrec_tpu.datasets.dataset import create_reader

    path = str(tmp_path / "d.parquet")
    pq.write_table(pa.table({"x": pa.array(np.arange(100))}), path)
    reader = create_reader(path, 10, selected_cols=["x"])
    reader.load_state({0: 49})  # first 50 rows already consumed
    rows_pass1 = sum(
        len(b["x"]) for b in reader.to_batches()
    )
    rows_pass2 = sum(
        len(b["x"]) for b in reader.to_batches()
    )
    assert rows_pass1 == 50  # skips consumed rows once
    assert rows_pass2 == 100  # full replay on the next epoch


def test_predict_reserves_columns(tmp_path):
    """--reserved_columns values must appear in the predict output."""
    import pyarrow.parquet as pq
    from google.protobuf import text_format

    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.protos import pipeline_pb2
    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    tmp = str(tmp_path)
    cfg_text = """
    train_input_path: "{t}/train.parquet"
    eval_input_path: "{t}/train.parquet"
    model_dir: "{t}/model"
    train_config {{
        sparse_optimizer {{ adagrad_optimizer {{ lr: 0.05 }}
                            constant_learning_rate {{}} }}
        dense_optimizer {{ adam_optimizer {{ lr: 0.002 }}
                           constant_learning_rate {{}} }}
        num_epochs: 1
    }}
    eval_config {{}}
    data_config {{
        batch_size: 32
        dataset_type: ParquetDataset
        fg_mode: FG_NONE
        label_fields: "label"
    }}
    feature_configs {{
        id_feature {{ feature_name: "cat_a" num_buckets: 16
                      embedding_dim: 8 }}
    }}
    model_config {{
        feature_groups {{ group_name: "wide" feature_names: "cat_a"
                          group_type: WIDE }}
        feature_groups {{ group_name: "fm" feature_names: "cat_a"
                          group_type: DEEP }}
        feature_groups {{ group_name: "deep" feature_names: "cat_a"
                          group_type: DEEP }}
        deepfm {{ deep {{ hidden_units: [8] }} final {{ hidden_units: [8] }} }}
        num_class: 1
        metrics {{ auc {{}} }}
        losses {{ binary_cross_entropy {{}} }}
    }}
    """.format(t=tmp)
    cfg_path = os.path.join(tmp, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    cfg = text_format.Parse(cfg_text, pipeline_pb2.EasyRecConfig())
    feats = create_features(list(cfg.feature_configs))
    write_mock_parquet(
        os.path.join(tmp, "train.parquet"), feats, 128, ["label"],
        extra_columns={"request_id": np.arange(128, dtype=np.int64)},
    )

    from torcheasyrec_tpu import main as tzrec_main

    tzrec_main.train_and_evaluate(cfg_path)
    out = os.path.join(tmp, "preds.parquet")
    tzrec_main.predict_checkpoint(
        cfg_path, os.path.join(tmp, "train.parquet"), out,
        reserved_columns="request_id",
    )
    import pyarrow.parquet as pq2

    got = pq2.read_table(out)
    assert "request_id" in got.schema.names
    assert "probs" in got.schema.names
    np.testing.assert_array_equal(
        np.sort(got.column("request_id").to_numpy(zero_copy_only=False)),
        np.arange(128),
    )
