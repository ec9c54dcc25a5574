"""Delta embedding dump for online serving sync.

Counterpart of /root/reference/tzrec/utils/delta_embedding_dump.py
(DeltaEmbeddingDumper:309, hooks main.py:513-514,561-568, config
train.proto:32-42): tracks which embedding rows were touched during an
interval and writes just those rows (+ ids) as parquet shards so the
online system can delta-sync instead of reloading full tables.

Touched ids are collected host-side from the batch's sparse fields
(pre-lookup), so no extra device work is added to the hot loop.
"""

import os
from typing import Dict, Set

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class DeltaEmbeddingDumper:
    def __init__(
        self,
        output_dir: str,
        embedding_group,
        dump_interval_steps: int = 1000,
        file_prefix: str = "delta_embedding",
    ) -> None:
        self._dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self._eg = embedding_group
        self._interval = dump_interval_steps
        self._prefix = file_prefix
        # feature -> set of touched ids
        self._touched: Dict[str, Set[int]] = {}
        self._feature_to_table = {
            lk.feature_name: lk.table_name
            for lk in embedding_group.engine.lookups
        }

    def observe(self, batch) -> None:
        for name, field in list(batch.sparse_features.items()) + list(
            batch.sequence_sparse_features.items()
        ):
            if name not in self._feature_to_table:
                continue
            vals = np.asarray(field.values).reshape(-1)
            if field.lengths is not None and field.values.ndim == 1:
                total = int(np.asarray(field.lengths).sum())
                vals = vals[:total]
            # accumulate per TABLE: features sharing an embedding table
            # touch the same row space and must land in one shard (a
            # per-feature split would overwrite the shared table's file)
            s = self._touched.setdefault(self._feature_to_table[name], set())
            s.update(int(v) for v in np.unique(vals) if v >= 0)

    def maybe_dump(self, step: int, tables) -> bool:
        if self._interval <= 0 or step % self._interval != 0:
            return False
        self.dump(step, tables)
        return True

    def dump(self, step: int, tables) -> None:
        for table_name, ids in self._touched.items():
            if not ids:
                continue
            full = self._eg.engine.extract_table(tables, table_name)
            id_arr = np.asarray(sorted(ids), np.int64)
            id_arr = id_arr[id_arr < full.shape[0]]
            rows = full[id_arr]
            tbl = pa.table({
                "id": pa.array(id_arr),
                "embedding": pa.array(list(rows.astype(np.float32))),
            })
            path = os.path.join(
                self._dir, f"{self._prefix}-{table_name}-{step}.parquet"
            )
            pq.write_table(tbl, path)
        self._touched.clear()
