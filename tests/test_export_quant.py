"""Quantization + delta-dump + aux subsystem tests."""

import json
import os

import numpy as np
import pytest

from torcheasyrec_tpu.acc.quant_util import (
    QUANT_DTYPES,
    dequantize_rowwise,
    quantize_rowwise,
)


@pytest.mark.parametrize("dtype", QUANT_DTYPES)
def test_quant_roundtrip(dtype):
    rng = np.random.default_rng(0)
    table = rng.normal(size=(100, 16)).astype(np.float32) * 0.1
    q = quantize_rowwise(table, dtype)
    deq = dequantize_rowwise(q, dtype, 16)
    assert deq.shape == table.shape
    err = np.abs(deq - table).max()
    tol = {"FP16": 1e-3, "INT8": 3e-3, "INT4": 5e-2, "INT2": 0.35}[dtype]
    assert err < tol, f"{dtype}: {err}"


def test_quantized_export_predict(tmp_path, monkeypatch):
    """QUANT_EMB=INT8 export then predict matches fp32 predict closely."""
    import pyarrow.parquet as pq
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_integration import DEEPFM_CONFIG, _write_config

    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    tmp_path = str(tmp_path)
    cfg_path, cfg = _write_config(tmp_path, DEEPFM_CONFIG)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(os.path.join(tmp_path, "train.parquet"), features,
                       512, ["label"], seed=0)
    write_mock_parquet(os.path.join(tmp_path, "eval.parquet"), features,
                       256, ["label"], seed=1)
    tzrec_main.train_and_evaluate(cfg_path)

    fp32_dir = os.path.join(tmp_path, "export_fp32")
    tzrec_main.export(cfg_path, fp32_dir)
    monkeypatch.setenv("QUANT_EMB", "INT8")
    q_dir = os.path.join(tmp_path, "export_int8")
    tzrec_main.export(cfg_path, q_dir)
    monkeypatch.delenv("QUANT_EMB")
    assert os.path.exists(os.path.join(q_dir, "quant_meta.json"))

    out_fp32 = os.path.join(tmp_path, "p32")
    out_q = os.path.join(tmp_path, "p8")
    tzrec_main.predict(os.path.join(tmp_path, "eval.parquet"), out_fp32,
                       fp32_dir)
    tzrec_main.predict(os.path.join(tmp_path, "eval.parquet"), out_q, q_dir)
    p32 = pq.read_table(
        os.path.join(out_fp32, os.listdir(out_fp32)[0])
    ).column("probs").to_numpy()
    p8 = pq.read_table(
        os.path.join(out_q, os.listdir(out_q)[0])
    ).column("probs").to_numpy()
    assert np.abs(p32 - p8).max() < 0.05


def test_delta_embedding_dump(tmp_path):
    import pyarrow.parquet as pq
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_integration import DEEPFM_CONFIG, _write_config

    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.features import create_features
    from torcheasyrec_tpu.utils.test_util import write_mock_parquet

    tmp_path = str(tmp_path)
    cfg_text_extra = DEEPFM_CONFIG.replace(
        "num_epochs: 4",
        "num_epochs: 1\n    delta_embedding_dump_config {{ "
        "dump_interval_steps: 2 }}",
    )
    cfg_path, cfg = _write_config(tmp_path, cfg_text_extra)
    features = create_features(list(cfg.feature_configs))
    write_mock_parquet(os.path.join(tmp_path, "train.parquet"), features,
                       512, ["label"], seed=0)
    write_mock_parquet(os.path.join(tmp_path, "eval.parquet"), features,
                       128, ["label"], seed=1)
    tzrec_main.train_and_evaluate(cfg_path)
    dump_dir = os.path.join(tmp_path, "model", "delta_embedding_dump")
    files = os.listdir(dump_dir)
    assert files, "no delta dumps written"
    t = pq.read_table(os.path.join(dump_dir, files[0]))
    assert {"id", "embedding"} <= set(t.schema.names)
    assert t.num_rows > 0
