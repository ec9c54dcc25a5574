"""Host-memory spill tier behind the device ZCH/dynamicemb cache.

Reference parity: dynamicemb's HKV table keeps an unbounded key space
— hot keys live in device HBM, evicted keys spill to host memory and
are pulled back (with their trained vectors) on readmission
(/root/reference/tzrec/protos/feature.proto:90-117,
/root/reference/tzrec/utils/dynamicemb_util.py:240). The TPU-native
composition: ``parallel/zch.py``'s device open-addressing table is the
HBM cache; this store is the host tier.

Flow per train step (driver loop, main.py):
  1. the jitted step returns ``__zch_spill``: per-table
     (evicted_keys, evicted_rows, fresh_keys, slots) — evicted rows
     are gathered from the PRE-update tables inside the step, so the
     spilled vector is the key's last trained state.
  2. the host stores evicted rows under their raw keys (bounded LRU).
  3. fresh keys are looked up in the store; hits produce
     (global_row, vector) restores applied to the device tables by a
     tiny jitted scatter BEFORE the next step (one-step-late
     readmission; documented in zch.lookup_insert).

The store is plain numpy — it is read/written between steps on the
host and never traced.
"""

from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np


class HostSpillStore:
    """Bounded LRU host store: raw id -> last trained row vector."""

    def __init__(self, dim: int, max_items: int = 0) -> None:
        self.dim = int(dim)
        self.max_items = int(max_items)  # 0 = unbounded
        self._d: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self.stored = 0  # lifetime counters (observability/tests)
        self.restored = 0
        self.dropped = 0

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key: int) -> bool:
        return int(key) in self._d

    def get(self, key: int) -> Optional[np.ndarray]:
        return self._d.get(int(key))

    def store(self, keys: np.ndarray, rows: np.ndarray) -> int:
        """Store rows[i] under keys[i] for keys[i] >= 0; returns count."""
        n = 0
        for k, r in zip(np.asarray(keys).tolist(), np.asarray(rows)):
            if k < 0:
                continue
            if k in self._d:
                self._d.move_to_end(k)
            self._d[k] = np.array(r, np.float32, copy=True)
            n += 1
            if self.max_items and len(self._d) > self.max_items:
                self._d.popitem(last=False)  # LRU drop
                self.dropped += 1
        self.stored += n
        return n

    def take(
        self, keys: np.ndarray
    ) -> Tuple[List[int], List[np.ndarray]]:
        """Pop stored rows for the given raw keys (>= 0); returns the
        positions (indices into ``keys``) that hit and their rows. Rows
        are REMOVED: after restore they live in the device table again
        (keeping both would double-count the key's state)."""
        idx: List[int] = []
        rows: List[np.ndarray] = []
        for i, k in enumerate(np.asarray(keys).tolist()):
            if k < 0:
                continue
            r = self._d.pop(k, None)
            if r is not None:
                idx.append(i)
                rows.append(r)
        self.restored += len(idx)
        return idx, rows


class SpillManager:
    """Per-zch-table spill stores + the store/restore step glue."""

    def __init__(
        self, dims: Dict[str, int], max_items: int = 0
    ) -> None:
        self.stores = {
            t: HostSpillStore(d, max_items) for t, d in dims.items()
        }

    def process(
        self, spill_out: Dict[str, Dict[str, np.ndarray]]
    ) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
        """Consume one step's device spill record (already device_get):
        store evictions, pop readmission hits. Returns per-table
        (slots [M] int32, rows [M, dim] float32) restores to scatter
        into the device tables (slots are table-LOCAL row indices; the
        caller offsets into its megatable layout)."""
        restores: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for tname, rec in spill_out.items():
            st = self.stores[tname]
            ek = np.asarray(rec["evicted_keys"])
            if (ek >= 0).any():
                st.store(ek, np.asarray(rec["evicted_rows"]))
            fk = np.asarray(rec["fresh_keys"])
            idx, rows = st.take(fk)
            if idx:
                slots = np.asarray(rec["slots"])[idx].astype(np.int32)
                restores[tname] = (
                    slots, np.stack(rows).astype(np.float32)
                )
        return restores
