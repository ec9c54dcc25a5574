"""INPUT_TILE serving mode: user features parsed once, tiled on device;
outputs must match the untiled path exactly."""

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(__file__))

from test_match_integration import DSSM_CONFIG, _gen_data


def test_input_tile_predict_matches(tmp_path, monkeypatch):
    from torcheasyrec_tpu import main as tzrec_main

    tmp_path = str(tmp_path)
    train, evalp, item = _gen_data(tmp_path, n_rows=1024)
    cfg_text = DSSM_CONFIG.format(
        train=train, eval=evalp,
        model_dir=os.path.join(tmp_path, "model"), item_table=item,
    )
    cfg_path = os.path.join(tmp_path, "pipeline.config")
    with open(cfg_path, "w") as f:
        f.write(cfg_text)
    tzrec_main.train_and_evaluate(cfg_path)
    export_dir = os.path.join(tmp_path, "export")
    tzrec_main.export(cfg_path, export_dir)

    # a serving-style request: ONE user scored against many items
    rng = np.random.default_rng(0)
    n_items = 64
    req = pa.table({
        "user_id": pa.array(np.full(n_items, 7, np.int64)),
        "item_id": pa.array(rng.integers(0, 200, n_items)),
        "item_cat": pa.array(rng.integers(0, 10, n_items)),
        "label": pa.array(np.ones(n_items, np.float32)),
    })
    req_path = os.path.join(tmp_path, "request.parquet")
    pq.write_table(req, req_path)

    out_plain = os.path.join(tmp_path, "plain")
    tzrec_main.predict(req_path, out_plain, export_dir)

    monkeypatch.setenv("INPUT_TILE", "2")
    out_tiled = os.path.join(tmp_path, "tiled")
    tzrec_main.predict(req_path, out_tiled, export_dir)
    monkeypatch.delenv("INPUT_TILE")

    def _read(d):
        t = pq.read_table(os.path.join(d, os.listdir(d)[0]))
        return np.stack(
            t.column("user_tower_emb").to_numpy(zero_copy_only=False)
        ), np.stack(
            t.column("item_tower_emb").to_numpy(zero_copy_only=False)
        )

    u1, i1 = _read(out_plain)
    u2, i2 = _read(out_tiled)
    np.testing.assert_allclose(u2, u1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(i2, i1, rtol=1e-5, atol=1e-6)
