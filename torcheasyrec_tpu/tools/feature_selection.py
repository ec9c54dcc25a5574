"""Variational-dropout based feature selection.

Counterpart of /root/reference/tzrec/tools/feature_selection.py: reads
the trained VariationalDropout drop probabilities from a checkpoint,
ranks features by keep probability, and optionally rewrites the
pipeline config keeping only the top-k features.
"""

import argparse
import json
import os
from typing import Dict, List

import numpy as np


def select_features(
    pipeline_config_path: str,
    checkpoint_path: str = None,
    topk: int = 100,
    output_dir: str = None,
) -> Dict[str, float]:
    import jax

    from torcheasyrec_tpu.main import _build_model_and_optim, _init_state
    from torcheasyrec_tpu.utils import checkpoint_util, config_util

    cfg = config_util.load_pipeline_config(pipeline_config_path)
    model, features, _ = _build_model_and_optim(cfg, None)
    dense_params, tables, _ = _init_state(model, cfg)
    ckpt = checkpoint_path or checkpoint_util.latest_checkpoint(
        cfg.model_dir
    )
    if ckpt:
        restored = checkpoint_util.restore_model(
            ckpt, {"dense": dense_params}
        )
        dense_params = restored["dense"]

    # collect per-group drop probabilities from the trained
    # VariationalDropout params (reference feature_selection.py reads
    # "{group}/feature_p" tensors; here model.vd_feature_names maps each
    # group's logit slots back to feature names)
    importances: Dict[str, float] = {}
    vd_tree = dense_params.get("variational_dropout")
    if not model.group_variational_dropouts or vd_tree is None:
        # fallback: rank by embedding-table row norms
        for name, feat in ((f.name, f) for f in features):
            if feat.is_sparse:
                # extract_table unpacks whatever physical layout the
                # engine uses (packed groups interleave optimizer state)
                w = np.asarray(model.embedding_group.engine.extract_table(
                    tables, feat.emb_config().name
                ))
                rows = w.shape[0]
                importances[name] = float(np.linalg.norm(w) / max(rows, 1))
    else:
        for g, vd in model.group_variational_dropouts.items():
            keep = 1.0 - np.asarray(vd.drop_probabilities(vd_tree[g]))
            if vd.embedding_wise:
                # reduce per-dim keep probs to per-feature means
                per_feat, off = [], 0
                for d in vd.feature_dims:
                    per_feat.append(float(keep[off : off + d].mean()))
                    off += d
                keep = np.asarray(per_feat)
            for name, k in zip(model.vd_feature_names[g], keep):
                # a feature in several groups keeps its best score
                importances[name] = max(
                    float(k), importances.get(name, 0.0)
                )

    ranked = dict(
        sorted(importances.items(), key=lambda kv: -kv[1])[:topk]
    )
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(
            os.path.join(output_dir, "feature_importance.json"), "w"
        ) as f:
            json.dump(ranked, f, indent=2)
        _rewrite_config(cfg, set(ranked), output_dir, config_util)
    return ranked


def _rewrite_config(cfg, keep_names, output_dir, config_util):
    new_cfg = type(cfg)()
    new_cfg.CopyFrom(cfg)
    del new_cfg.feature_configs[:]
    for fc in cfg.feature_configs:
        oneof = fc.WhichOneof("feature")
        inner = getattr(fc, oneof)
        name = getattr(inner, "feature_name", None) or getattr(
            inner, "sequence_name", ""
        )
        if name in keep_names or oneof == "sequence_feature":
            new_cfg.feature_configs.append(fc)
    for g in new_cfg.model_config.feature_groups:
        kept = [n for n in g.feature_names if n in keep_names]
        del g.feature_names[:]
        g.feature_names.extend(kept)
    config_util.save_message(
        new_cfg, os.path.join(output_dir, "pipeline.config")
    )


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config_path", required=True)
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--topk", type=int, default=100)
    parser.add_argument("--output_dir", default=None)
    args = parser.parse_args()
    ranked = select_features(
        args.pipeline_config_path, args.checkpoint_path, args.topk,
        args.output_dir,
    )
    print(json.dumps(ranked, indent=2))
