"""Warm-start ZCH (dynamic-embedding) tables from pretrained vectors.

Counterpart of
/root/reference/tzrec/tools/dynamicemb/create_dynamicemb_init_ckpt.py
(:51-260): the reference streams (id, embedding) tables into dynamicemb
HKV checkpoint shards so hash-based tables start from pretrained
vectors. Here the dynamic table is the TPU-native ZCH probe table
(parallel/zch.py), so warm-starting means (a) inserting the ids through
the REAL ``zch.lookup_insert`` path — guaranteeing the exact slots a
later training lookup will probe — and (b) writing each id's vector
into that slot's row of the canonical per-table checkpoint layout.

Input per table: a parquet/CSV file whose first column is the raw int64
id and whose second column is the embedding — either a ``list<float>``
column or a separator-joined string (``--separator``, reference's
embedding field separator).

Example::

    python -m torcheasyrec_tpu.tools.dynamicemb.create_zch_init_ckpt \
        --pipeline_config_path pipeline.config \
        --init_embedding_paths '{"item_emb": "item_vectors.parquet"}' \
        --save_dir model_dir/init_ckpt
"""

import argparse
import json
from typing import Dict

import jax.numpy as jnp
import numpy as np

from torcheasyrec_tpu.utils.logging_util import logger

CHUNK = 65536


def _read_vectors(path: str, separator: str):
    """(ids int64 [N], vectors float32 [N, D]) from parquet/CSV."""
    import pyarrow as pa

    from torcheasyrec_tpu.datasets.sampler import _read_table

    tbl = _read_table(path)
    ids = tbl.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    col = tbl.column(1)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        vecs = np.asarray(flat, np.float32).reshape(len(ids), -1)
    else:
        rows = col.cast(pa.string()).to_pylist()
        vecs = np.asarray(
            [[float(x) for x in (r or "").split(separator)] for r in rows],
            np.float32,
        )
    return ids, vecs


def _insert_verified(zch_mod, state, zcfg, ids: np.ndarray):
    """Insert `ids` into the MUTATED `state`, retrying within-batch
    probe-race losers, then return (slots, verified_mask): slots whose
    FINAL key matches each id. Insert-time slots are not authoritative
    (races/eviction), and the read path maps unmatched ids to probe 0 —
    hence the key check."""
    import jax.numpy as jnp

    todo = ids
    for _ in range(5):
        if not len(todo):
            break
        for start in range(0, len(todo), CHUNK):
            _, new_state = zch_mod.lookup_insert(
                state, zcfg,
                jnp.asarray(todo[start : start + CHUNK], jnp.int32),
                jnp.int32(0), True,
            )
            state.clear()
            state.update(new_state)
        sl, _ = zch_mod.lookup_insert(
            state, zcfg, jnp.asarray(ids, jnp.int32), jnp.int32(0), False
        )
        sl = np.asarray(sl)
        keys = np.asarray(state["keys"])
        ok = (sl >= 0) & (keys[np.maximum(sl, 0)] == ids.astype(np.int32))
        todo = ids[~ok]
    return sl, ok


def create_init_ckpt(
    pipeline_config_path: str,
    init_embedding_paths: Dict[str, str],
    save_dir: str,
    separator: str = ",",
    initial_score: float = 1.0,
) -> Dict[str, int]:
    """Returns {table: number of ids inserted}."""
    from torcheasyrec_tpu import main as tzrec_main
    from torcheasyrec_tpu.parallel import zch as zch_mod
    from torcheasyrec_tpu.utils import checkpoint_util, config_util

    cfg = config_util.load_pipeline_config(pipeline_config_path)
    model, features, _ = tzrec_main._build_model_and_optim(cfg, None)
    dense, tables, sparse_opt = tzrec_main._init_state(model, cfg)
    eg = model.embedding_group
    if not eg.has_zch:
        raise ValueError("no ZCH features in this config")
    zch_states = eg.init_zch_states()
    engine = eg.engine

    inserted: Dict[str, int] = {}
    canon = engine.to_canonical(tables, None)
    for key, path in init_embedding_paths.items():
        zcfg = eg._zch_cfgs.get(key)
        if zcfg is None:
            raise ValueError(
                f"{key!r} is not a ZCH table; have {sorted(eg._zch_cfgs)}"
            )
        if key not in canon:
            raise ValueError(
                f"no embedding table named {key!r}; have {sorted(canon)}"
            )
        ids, vecs = _read_vectors(path, separator)
        if len(ids) > zcfg.size:
            logger.warning(
                f"{key}: {len(ids)} init ids > zch_size {zcfg.size}; "
                f"later ids evict earlier ones (keeping the last "
                f"{zcfg.size})"
            )
        # to_canonical hands back read-only views of device arrays
        weight = np.array(canon[key]["weight"])
        canon[key]["weight"] = weight
        if vecs.shape[1] != weight.shape[1]:
            raise ValueError(
                f"{key}: embedding dim {vecs.shape[1]} != table dim "
                f"{weight.shape[1]}"
            )
        # admission/filter gates are bypassed for warm-start inserts
        import dataclasses

        zcfg_ins = dataclasses.replace(
            zcfg, admit_threshold=0, filter_fn=None
        )
        state = zch_states[key]
        sl, ok = _insert_verified(zch_mod, state, zcfg_ins, ids)
        weight[sl[ok]] = vecs[ok]
        n_ok = int(ok.sum())
        if initial_score > 0:
            # pre-count inserted ids so fresh training ids don't
            # immediately evict the warm-started rows
            state = dict(state)
            state["count"] = jnp.where(
                state["keys"] >= 0,
                jnp.maximum(state["count"], initial_score),
                state["count"],
            )
        zch_states[key] = state
        inserted[key] = n_ok
        logger.info(f"{key}: inserted {n_ok} pretrained vectors")

    tables, _ = engine.from_canonical(canon, tables, None)
    checkpoint_util.save_train_state(
        save_dir, model,
        {
            "dense": dense,
            "tables": tables,
            "sparse_opt": sparse_opt,
            "zch": zch_states,
            "step": jnp.zeros((), jnp.int32),
        },
    )
    logger.info(f"saved warm-start checkpoint to {save_dir}")
    return inserted


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--pipeline_config_path", required=True)
    parser.add_argument(
        "--init_embedding_paths", required=True,
        help='JSON {"<zch table>": "<id,embedding file>"}',
    )
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--separator", default=",")
    parser.add_argument("--initial_score", type=float, default=1.0)
    args = parser.parse_args()
    create_init_ckpt(
        args.pipeline_config_path,
        json.loads(args.init_embedding_paths),
        args.save_dir,
        args.separator,
        args.initial_score,
    )
