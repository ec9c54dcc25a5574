"""TDM end-to-end retrieval: layered beam search + recall evaluation.

Counterpart of /root/reference/tzrec/tools/tdm/retrieval.py (498 LoC):
load a trained TDM checkpoint, and for each user start from the first
recall layer (all nodes of layer ceil(log_n(2 * n_cluster * recall_num))),
score (user x candidate-node) pairs with the rank model, keep the top
2*recall_num nodes, expand their children, and at the leaf layer emit the
top ``recall_num`` deduped item ids. Recall = fraction of users whose
ground-truth item id is retrieved.

TPU-shape notes: every layer scores a fixed-width candidate matrix
[B, W] (padding id -1 masked to -inf), so the jitted eval step compiles
once per (layer width, batch) shape instead of per batch.
"""

import math
import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

import jax
import jax.numpy as jnp


def tdm_retrieval(
    pipeline_config_path: str,
    predict_input_path: str,
    predict_output_path: Optional[str] = None,
    recall_num: int = 200,
    n_cluster: int = 2,
    checkpoint_path: Optional[str] = None,
    batch_size: Optional[int] = None,
    reserved_columns: Optional[str] = None,
) -> Dict[str, float]:
    """Returns {"recall": fraction, "total": n_users}."""
    from torcheasyrec_tpu.datasets.data_parser import DataParser
    from torcheasyrec_tpu.datasets.sampler import TDMPredictSampler, TDMSampler
    from torcheasyrec_tpu.main import (
        _build_model_and_optim,
        _compute_dtype,
        _init_state,
        make_eval_step,
    )
    from torcheasyrec_tpu.utils import checkpoint_util, config_util
    from torcheasyrec_tpu.utils.logging_util import logger

    pipeline_config = config_util.load_pipeline_config(pipeline_config_path)
    data_config = pipeline_config.data_config
    bs = batch_size or int(data_config.batch_size)
    compute_dtype = _compute_dtype(pipeline_config.train_config)

    model, features, _ = _build_model_and_optim(pipeline_config, None)
    dense_params, tables, _ = _init_state(model, pipeline_config)
    state = {"dense": dense_params, "tables": tables}
    if model.embedding_group.has_zch:
        state["zch"] = model.embedding_group.init_zch_states()
    ckpt = checkpoint_path or checkpoint_util.latest_checkpoint(
        pipeline_config.model_dir
    )
    if ckpt:
        state = checkpoint_util.restore_train_state(ckpt, model, state)
    state = dict(state)
    state["step"] = jnp.zeros((), jnp.int32)

    # tree structure + node attr columns from the training sampler tables
    sampler_config = data_config.tdm_sampler
    sampler = TDMSampler(sampler_config, is_training=False)
    sampler.init()
    item_id_field = sampler_config.item_id_field
    attr_fields = list(sampler_config.attr_fields)
    max_level = sampler._max_depth
    item_ids_table = sampler._item_ids
    # child expansion + node attr lookup via the predict sampler
    # (reference sampler.py:1082-1168 / retrieval.py beam loop)
    pred_sampler = TDMPredictSampler(sampler_config, is_training=False)
    pred_sampler.init()
    _node_attr_columns = pred_sampler.node_attr_columns

    first_layer = min(
        max_level,
        int(math.ceil(math.log(2 * n_cluster * recall_num, max(n_cluster, 2)))),
    )
    init_nodes = np.sort(sampler._layer_nodes[first_layer])

    parser = DataParser(features, labels=[])
    num_class = int(getattr(pipeline_config.model_config, "num_class", 1))
    prob_key = "probs1" if num_class == 2 else "probs"
    _estep = make_eval_step(model, compute_dtype, with_loss=False)
    eval_step = jax.jit(lambda s, b: _estep(s, b)[0])

    def _score(user_cols: Dict[str, pa.Array], cand: np.ndarray) -> np.ndarray:
        """cand [B, W] node ids (-1 pad) -> probs [B, W]."""
        b, w = cand.shape
        flat = cand.reshape(-1)
        data = {}
        idx = np.repeat(np.arange(b), w)
        for name, col in user_cols.items():
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            data[name] = col.take(pa.array(idx))
        data.update(_node_attr_columns(flat))
        batch = parser.parse_to_batch(data)
        preds = jax.device_get(eval_step(state, batch))
        probs = np.asarray(preds[prob_key]).reshape(b, w)
        return np.where(cand >= 0, probs, -np.inf)

    # stream the input in batches
    import pyarrow.parquet as pq

    tbl = pq.read_table(predict_input_path)
    reserved = [c.strip() for c in (reserved_columns or "").split(",")
                if c.strip()]
    out_chunks: List[Dict[str, pa.Array]] = []
    total = 0
    hits = 0
    beam = 2 * recall_num

    user_col_names = [
        c for c in tbl.schema.names if c not in set(attr_fields)
    ]

    for start in range(0, tbl.num_rows, bs):
        sl = tbl.slice(start, bs)
        b = sl.num_rows
        gt = sl.column(item_id_field).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        user_cols = {c: sl.column(c) for c in user_col_names}

        cand = np.broadcast_to(init_nodes, (b, len(init_nodes))).copy()
        for layer in range(first_layer, max_level + 1):
            probs = _score(user_cols, cand)
            if layer == max_level:
                order = np.argsort(-probs, axis=1)
                picked = np.take_along_axis(cand, order, axis=1)
                recall_ids = []
                for i in range(b):
                    seen = set()
                    row = []
                    for nid in picked[i]:
                        if nid >= 0 and nid not in seen:
                            seen.add(int(nid))
                            row.append(int(nid))
                            if len(row) == recall_num:
                                break
                    recall_ids.append(row)
                break
            k = min(beam, cand.shape[1])
            top = np.argpartition(-probs, k - 1, axis=1)[:, :k]
            kept = np.take_along_axis(cand, top, axis=1)  # [b, k]
            # expand children into a fixed-width next layer
            pred_sampler.init_sampler(n_cluster)
            cand = pred_sampler.get_children_ids(
                kept.reshape(-1)
            ).reshape(b, k * n_cluster)

        hit = np.asarray([
            int(g) in set(r) for g, r in zip(gt, recall_ids)
        ])
        hits += int(hit.sum())
        total += b
        chunk: Dict[str, pa.Array] = {}
        for c in reserved:
            if c in sl.schema.names:
                chunk[c] = sl.column(c)
        chunk["recall_ids"] = pa.array(recall_ids, type=pa.list_(pa.int64()))
        out_chunks.append(chunk)

    if predict_output_path:
        from torcheasyrec_tpu.datasets.dataset import create_writer

        writer = create_writer(
            predict_output_path,
            "CsvWriter" if predict_output_path.endswith(".csv")
            else "ParquetWriter",
        )
        for chunk in out_chunks:
            writer.write(chunk)
        writer.close()

    recall = hits / max(total, 1)
    logger.info(
        f"tdm_retrieval: recall@{recall_num} = {recall:.4f} over "
        f"{total} users ({len(item_ids_table)} items, "
        f"levels {first_layer}..{max_level})"
    )
    return {"recall": recall, "total": float(total)}


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--pipeline_config_path", required=True)
    p.add_argument("--predict_input_path", required=True)
    p.add_argument("--predict_output_path", default=None)
    p.add_argument("--recall_num", type=int, default=200)
    p.add_argument("--n_cluster", type=int, default=2)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--reserved_columns", default=None)
    a = p.parse_args()
    tdm_retrieval(
        a.pipeline_config_path, a.predict_input_path,
        a.predict_output_path, a.recall_num, a.n_cluster,
        a.checkpoint_path, a.batch_size, a.reserved_columns,
    )
