"""TDM tree building + retrieval.

Counterparts of /root/reference/tzrec/tools/tdm/gen_tree/
(tree_builder/tree_cluster/tree_generator) and tools/tdm/retrieval.py
(498 LoC beam search):

- init_tree: category-sorted balanced k-ary tree (reference init_tree.py)
- cluster_tree: recursive k-means over item embeddings
  (reference cluster_tree.py / tree_cluster)
- beam_search_retrieval: layer-wise beam search scoring tree nodes with
  a trained TDM model

Tree tables are written in the sampler's expected schema:
items: id | weight | attrs; edges: parent | child | weight.
"""

import argparse
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class TreeNode:
    __slots__ = ("node_id", "children", "item_id")

    def __init__(self, node_id: int, item_id: Optional[int] = None):
        self.node_id = node_id
        self.children: List["TreeNode"] = []
        self.item_id = item_id


def _build_from_order(
    item_ids: np.ndarray, branching: int, id_base: int
) -> Tuple[TreeNode, List[Tuple[int, int]], Dict[int, int]]:
    """Bottom-up balanced k-ary tree over ordered leaves."""
    next_id = [id_base]

    def _alloc() -> int:
        next_id[0] += 1
        return next_id[0]

    level = [TreeNode(int(i), item_id=int(i)) for i in item_ids]
    edges: List[Tuple[int, int]] = []
    while len(level) > 1:
        parents = []
        for s in range(0, len(level), branching):
            group = level[s : s + branching]
            p = TreeNode(_alloc())
            p.children = group
            for c in group:
                edges.append((p.node_id, c.node_id))
            parents.append(p)
        level = parents
    return level[0], edges, {}


def init_tree(
    item_input_path: str,
    output_dir: str,
    branching: int = 2,
    category_column: Optional[str] = None,
) -> None:
    """Category-sorted balanced tree (reference tools/tdm/init_tree.py)."""
    t = pq.read_table(item_input_path)
    ids = t.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids)
    if category_column and category_column in t.schema.names:
        cats = t.column(category_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cats))
    _write_tree(t, ids[order], branching, output_dir)


def cluster_tree(
    item_input_path: str,
    output_dir: str,
    branching: int = 2,
    embedding_column: str = "embedding",
) -> None:
    """Recursive k-means ordering (reference tools/tdm/cluster_tree.py):
    orders leaves so embedding-similar items share subtrees."""
    t = pq.read_table(item_input_path)
    ids = t.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
    emb = np.stack(
        t.column(embedding_column).to_numpy(zero_copy_only=False)
    ).astype(np.float32)

    def _recurse(index: np.ndarray) -> List[int]:
        if len(index) <= branching:
            return list(index)
        x = emb[index]
        rng = np.random.default_rng(len(index))
        c = x[rng.choice(len(x), branching, replace=False)].copy()
        for _ in range(10):
            d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
            a = d.argmin(1)
            for j in range(branching):
                if (a == j).any():
                    c[j] = x[a == j].mean(0)
        out: List[int] = []
        for j in range(branching):
            sub = index[a == j]
            if len(sub):
                out.extend(_recurse(sub))
        return out

    order = np.asarray(_recurse(np.arange(len(ids))))
    _write_tree(t, ids[order], branching, output_dir)


def _write_tree(t, ordered_ids, branching, output_dir):
    os.makedirs(output_dir, exist_ok=True)
    id_base = int(ordered_ids.max()) + 1
    root, edges, _ = _build_from_order(ordered_ids, branching, id_base)
    # node table: leaves keep their attrs; internal nodes empty attrs
    names = t.schema.names
    attrs_by_id = {}
    if len(names) > 2:
        raw_ids = t.column(0).to_numpy(zero_copy_only=False)
        raw_attrs = t.column(2).cast(pa.string()).to_pylist()
        attrs_by_id = {int(i): a for i, a in zip(raw_ids, raw_attrs)}
    all_nodes = sorted(
        {n for e in edges for n in e} | set(int(i) for i in ordered_ids)
    )
    node_tbl = pa.table({
        "id": pa.array(np.asarray(all_nodes, np.int64)),
        "weight": pa.array(np.ones(len(all_nodes))),
        "attrs": pa.array([
            attrs_by_id.get(n, str(n)) for n in all_nodes
        ]),
    })
    pq.write_table(node_tbl, os.path.join(output_dir, "node_table.parquet"))
    edge_tbl = pa.table({
        "parent": pa.array(np.asarray([e[0] for e in edges], np.int64)),
        "child": pa.array(np.asarray([e[1] for e in edges], np.int64)),
        "weight": pa.array(np.ones(len(edges))),
    })
    pq.write_table(edge_tbl, os.path.join(output_dir, "edge_table.parquet"))
    with open(os.path.join(output_dir, "root_id.txt"), "w") as f:
        f.write(str(root.node_id))


def beam_search_retrieval(
    score_fn,  # fn(candidate_node_ids [B, W]) -> scores [B, W]
    children: Dict[int, List[int]],
    root_id: int,
    beam: int = 20,
    max_depth: int = 30,
) -> List[int]:
    """Layer-wise beam search for ONE query (reference retrieval.py):
    expand current beam's children, score, keep top-beam; returns
    leaf-level node ids."""
    frontier = [root_id]
    for _ in range(max_depth):
        cand: List[int] = []
        for n in frontier:
            cand.extend(children.get(n, []))
        if not cand:
            break
        scores = score_fn(np.asarray(cand, np.int64))
        order = np.argsort(-np.asarray(scores))[:beam]
        frontier = [cand[i] for i in order]
    return frontier


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--item_input_path", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--mode", choices=["init", "cluster"],
                        default="init")
    parser.add_argument("--branching", type=int, default=2)
    parser.add_argument("--category_column", default=None)
    parser.add_argument("--embedding_column", default="embedding")
    args = parser.parse_args()
    if args.mode == "cluster":
        cluster_tree(args.item_input_path, args.output_dir, args.branching,
                     args.embedding_column)
    else:
        init_tree(args.item_input_path, args.output_dir, args.branching,
                  args.category_column)
    print(f"tree written to {args.output_dir}")
