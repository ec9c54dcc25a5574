"""Migrate trained ZCH tables across a table-kind / table-size swap.

Counterpart of
/root/reference/tzrec/tools/dynamicemb/zch_to_dynamicemb_convert.py
(:1-802): the reference converts a ZCH-trained checkpoint into the
dynamicemb HKV shard format so the next run — whose pipeline.config has
swapped ``zch{}`` for ``dynamicemb{}`` — warm-starts from the trained
embeddings (and scores). In the TPU-native stack the dynamic table IS
the ZCH probe table (parallel/zch.py), so the equivalent migrations
are:

* **zch -> zch (resized / re-policied)**: trained (key, row, score)
  triples are re-inserted — hottest first — through the NEW table's
  real ``lookup_insert`` path, so every surviving id lands in exactly
  the slot later training lookups will probe. When the new table is
  smaller, the coldest ids are dropped (the same keep-the-hottest rule
  the reference's score-ordered export applies).
* **zch -> static**: each trained key's row is written at
  ``key % new_rows`` — the slot an integer raw id takes under the
  static ``num_buckets`` path. (String-tokened features hash BEFORE
  zch, so their zch keys are already post-hash ints; exactness then
  requires the static config to keep the same pre-hash space.)
* **export**: ``--dump_dir`` writes each ZCH table as an
  ``(id, embedding, score)`` parquet — the input format of
  ``create_zch_init_ckpt`` — closing the loop with the reference's
  keys/values/scores shard dump.

Dense params, optimizer state, and non-ZCH tables ride through the
canonical per-table layout untouched (matching the reference's
byte-copied ``model/`` + ``optimizer/`` dirs with PartialLoadPlanner
semantics: shape-mismatched entries are skipped with a warning).

Example::

    python -m torcheasyrec_tpu.tools.dynamicemb.convert_zch_ckpt \
        --pipeline_config_path old_pipeline.config \
        --checkpoint_path model_dir/model.ckpt-1000 \
        --new_pipeline_config_path new_pipeline.config \
        --save_dir model_dir/converted_ckpt
"""

import argparse
import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from torcheasyrec_tpu.utils.logging_util import logger


def _load_raw_ckpt(ckpt_dir: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.join(os.path.abspath(ckpt_dir), "state")
        )


def _extract_zch_rows(zch_state, weight):
    """(keys [M] int64, rows [M, D], scores [M]) for occupied slots,
    sorted by score descending (hottest first)."""
    keys = np.asarray(zch_state["keys"])
    count = np.asarray(zch_state["count"])
    occ = np.nonzero(keys >= 0)[0]
    order = occ[np.argsort(-count[occ], kind="stable")]
    return (
        keys[order].astype(np.int64),
        np.asarray(weight)[order],
        count[order].astype(np.float32),
    )


def convert_zch_ckpt(
    pipeline_config_path: str,
    checkpoint_path: str,
    new_pipeline_config_path: str,
    save_dir: Optional[str] = None,
    dump_dir: Optional[str] = None,
) -> Dict[str, Dict[str, int]]:
    """Returns {table: {"kept": n, "dropped": n}} per converted table."""
    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.parallel import zch as zch_mod
    from torcheasyrec_tpu.utils import checkpoint_util, config_util

    old_cfg = config_util.load_pipeline_config(pipeline_config_path)
    old_model, _, _ = tzrec_main._build_model_and_optim(old_cfg, None)
    old_zch_cfgs = dict(old_model.embedding_group._zch_cfgs)
    if not old_zch_cfgs:
        raise ValueError("old config has no ZCH tables to convert")

    raw = _load_raw_ckpt(checkpoint_path)
    canon = raw.get("canonical_tables")
    if canon is None:
        raise ValueError(
            f"{checkpoint_path} is not a canonical (single-host) "
            "checkpoint; convert from a single-host save"
        )
    old_zch_states = raw.get("zch", {})

    report: Dict[str, Dict[str, int]] = {}

    if dump_dir:
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(dump_dir, exist_ok=True)
        for tname in old_zch_cfgs:
            keys, rows, scores = _extract_zch_rows(
                old_zch_states[tname], canon[tname]["weight"]
            )
            pq.write_table(
                pa.table({
                    "id": pa.array(keys),
                    "embedding": pa.array(rows.tolist(),
                                          pa.list_(pa.float32())),
                    "score": pa.array(scores),
                }),
                os.path.join(dump_dir, f"{tname}.parquet"),
            )
            logger.info(f"dumped {len(keys)} rows of {tname} to {dump_dir}")
            report.setdefault(tname, {"kept": len(keys), "dropped": 0})

    if not save_dir:
        return report

    new_cfg = config_util.load_pipeline_config(new_pipeline_config_path)
    new_model, _, _ = tzrec_main._build_model_and_optim(new_cfg, None)
    dense, tables, sparse_opt = tzrec_main._init_state(new_model, new_cfg)
    new_eg = new_model.embedding_group
    engine = new_eg.engine
    new_canon = engine.to_canonical(tables, None)
    new_zch_states = new_eg.init_zch_states() if new_eg.has_zch else {}

    for tname, entry in canon.items():
        if tname not in new_canon:
            logger.warning(f"table {tname} absent in new config; skipped")
            continue
        old_w = np.asarray(entry["weight"])
        # to_canonical hands back read-only views of device arrays
        new_w = np.array(new_canon[tname]["weight"])
        new_canon[tname]["weight"] = new_w
        if tname not in old_zch_cfgs:
            # plain table: copy when shapes match (PartialLoadPlanner
            # semantics — mismatches skip, they don't fail the convert)
            if old_w.shape == new_w.shape:
                new_w[...] = old_w
            else:
                logger.warning(
                    f"table {tname}: shape {old_w.shape} -> "
                    f"{new_w.shape}; skipped"
                )
            continue

        keys, rows, scores = _extract_zch_rows(
            old_zch_states[tname], old_w
        )
        zcfg = new_eg._zch_cfgs.get(tname)
        if zcfg is not None:
            # zch -> zch: hottest-first reinsert through the real path.
            # Admission/filter gates are bypassed — these ids already
            # earned their slots in the source run.
            import dataclasses

            zcfg = dataclasses.replace(
                zcfg, admit_threshold=0, filter_fn=None
            )
            from torcheasyrec_tpu.tools.dynamicemb.create_zch_init_ckpt import (
                _insert_verified,
            )

            state = dict(new_zch_states[tname])
            sl, ok = _insert_verified(zch_mod, state, zcfg, keys)
            new_w[sl[ok]] = rows[ok]
            cnt = np.asarray(state["count"]).copy()
            cnt[sl[ok]] = np.maximum(cnt[sl[ok]], scores[ok])
            state = dict(state)
            state["count"] = jnp.asarray(cnt)
            new_zch_states[tname] = state
            kept = int(ok.sum())
            report[tname] = {"kept": kept, "dropped": len(keys) - kept}
        else:
            # zch -> static: integer raw id k owns slot k % rows
            slots = (keys % new_w.shape[0]).astype(np.int64)
            # hottest-first extraction means on collision the LAST
            # write wins — reverse so the hottest id keeps the slot
            new_w[slots[::-1]] = rows[::-1]
            kept = len(np.unique(slots))
            report[tname] = {"kept": kept, "dropped": len(keys) - kept}
        logger.info(f"converted {tname}: {report[tname]}")

    tables, _ = engine.from_canonical(new_canon, tables, None)
    state: Dict[str, Any] = {
        "dense": dense,
        "tables": tables,
        "sparse_opt": sparse_opt,
        "step": jnp.zeros((), jnp.int32),
    }
    if new_zch_states:
        state["zch"] = new_zch_states
    checkpoint_util.save_train_state(save_dir, new_model, state)
    logger.info(f"saved converted checkpoint to {save_dir}")
    return report


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config_path", required=True)
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--new_pipeline_config_path")
    parser.add_argument("--save_dir")
    parser.add_argument(
        "--dump_dir",
        help="also write each ZCH table as (id, embedding, score) parquet",
    )
    args = parser.parse_args()
    if args.save_dir and not args.new_pipeline_config_path:
        parser.error("--save_dir requires --new_pipeline_config_path")
    convert_zch_ckpt(
        args.pipeline_config_path,
        args.checkpoint_path,
        args.new_pipeline_config_path,
        args.save_dir,
        args.dump_dir,
    )
