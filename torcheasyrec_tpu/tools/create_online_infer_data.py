"""Sample raw rows into a serving-request fixture.

Counterpart of /root/reference/tzrec/tools/create_online_infer_data.py:
takes N rows from the (raw, pre-FG) input and writes them as json lines
matching the exported fg.json's input columns, for online-service
smoke tests.
"""

import argparse
import json

import pyarrow.parquet as pq

from torcheasyrec_tpu.features import create_features
from torcheasyrec_tpu.utils import config_util


def create_online_data(
    pipeline_config_path: str,
    output_path: str,
    num_rows: int = 16,
) -> None:
    cfg = config_util.load_pipeline_config(pipeline_config_path)
    features = create_features(
        list(cfg.feature_configs), fg_mode=cfg.data_config.fg_mode
    )
    cols = []
    for f in features:
        cols.extend(c for c in f.inputs if c not in cols)
    tbl = pq.read_table(cfg.train_input_path).slice(0, num_rows)
    present = [c for c in cols if c in tbl.schema.names]
    rows = tbl.select(present).to_pylist()
    with open(output_path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, default=str) + "\n")
    print(f"wrote {len(rows)} rows x {len(present)} cols to {output_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config_path", required=True)
    parser.add_argument("--output_path", required=True)
    parser.add_argument("--num_rows", type=int, default=16)
    args = parser.parse_args()
    create_online_data(
        args.pipeline_config_path, args.output_path, args.num_rows
    )
