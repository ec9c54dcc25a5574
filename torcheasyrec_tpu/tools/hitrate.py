"""Hitrate evaluation for retrieval towers.

Counterpart of /root/reference/tzrec/tools/hitrate.py (468 LoC,
distributed hitrate eval): given query (user) embeddings with ground
truth item ids and an item embedding table, computes top-k hitrate via
brute-force similarity on device (batched matmuls — MXU-friendly; a
faiss index is unnecessary at eval scale and the reference's GPU path
is likewise brute-force for <10M items).

CLI:
python -m torcheasyrec_tpu.tools.hitrate \
  --query_path q.parquet --item_path items.parquet --top_k 100
query schema: id | embedding (list<float>) | gt_items (list<int> or str)
item schema:  id | embedding (list<float>)
"""

import argparse
import json
from typing import List, Tuple

import numpy as np
import pyarrow.parquet as pq


def _load_embeddings(path: str, emb_col: str = "embedding"):
    t = pq.read_table(path)
    ids = t.column(t.schema.names[0]).to_numpy(zero_copy_only=False)
    emb = np.stack(t.column(emb_col).to_numpy(zero_copy_only=False))
    return ids.astype(np.int64), emb.astype(np.float32), t


def compute_hitrate(
    query_emb: np.ndarray,  # [Q, D]
    gt_items: List[List[int]],
    item_ids: np.ndarray,  # [N]
    item_emb: np.ndarray,  # [N, D]
    top_k: int = 100,
    batch: int = 1024,
    similarity: str = "inner_product",
) -> Tuple[float, np.ndarray]:
    import jax
    import jax.numpy as jnp

    items = jnp.asarray(item_emb)
    if similarity == "cosine":
        items = items / (
            jnp.linalg.norm(items, axis=1, keepdims=True) + 1e-12
        )

    @jax.jit
    def _topk(q):
        if similarity == "cosine":
            q = q / (jnp.linalg.norm(q, axis=1, keepdims=True) + 1e-12)
        sim = jnp.dot(q, items.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(sim, top_k)[1]

    hits = np.zeros(len(query_emb), np.float64)
    for s in range(0, len(query_emb), batch):
        q = jnp.asarray(query_emb[s : s + batch])
        if q.shape[0] < batch:
            q = jnp.pad(q, ((0, batch - q.shape[0]), (0, 0)))
        idx = np.asarray(jax.device_get(_topk(q)))[: len(query_emb) - s]
        for i, row in enumerate(idx):
            gt = set(gt_items[s + i])
            if not gt:
                continue
            retrieved = set(int(item_ids[j]) for j in row)
            hits[s + i] = len(gt & retrieved) / len(gt)
    return float(hits.mean()), hits


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--query_path", required=True)
    parser.add_argument("--item_path", required=True)
    parser.add_argument("--gt_column", default="gt_items")
    parser.add_argument("--top_k", type=int, default=100)
    parser.add_argument("--similarity", default="inner_product")
    parser.add_argument("--output_path", default=None)
    args = parser.parse_args()

    q_ids, q_emb, q_tbl = _load_embeddings(args.query_path)
    i_ids, i_emb, _ = _load_embeddings(args.item_path)
    gt_raw = q_tbl.column(args.gt_column).to_pylist()
    gt = [
        [int(x) for x in (
            g if isinstance(g, list) else str(g).split(",")
        ) if str(x).strip()]
        for g in gt_raw
    ]
    hitrate, per_query = compute_hitrate(
        q_emb, gt, i_ids, i_emb, args.top_k, similarity=args.similarity
    )
    result = {"hitrate": hitrate, "top_k": args.top_k,
              "num_queries": len(q_ids)}
    print(json.dumps(result))
    if args.output_path:
        with open(args.output_path, "w") as f:
            json.dump(result, f)


if __name__ == "__main__":
    main()
