"""Emit the serving-side fg.json from a pipeline config.

Counterpart of /root/reference/tzrec/tools/create_fg_json.py."""

import argparse
import json
import os

from torcheasyrec_tpu.features import create_features, create_fg_json
from torcheasyrec_tpu.utils import config_util

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config_path", required=True)
    parser.add_argument("--fg_output_dir", required=True)
    args = parser.parse_args()
    cfg = config_util.load_pipeline_config(args.pipeline_config_path)
    features = create_features(
        list(cfg.feature_configs), fg_mode=cfg.data_config.fg_mode
    )
    os.makedirs(args.fg_output_dir, exist_ok=True)
    out = os.path.join(args.fg_output_dir, "fg.json")
    with open(out, "w") as f:
        json.dump(create_fg_json(features), f, indent=2)
    print(f"wrote {out}")
