"""Shared-memory item tables for the samplers (utils/shm_pack.py).

The reference runs one graphlearn server per host with per-worker gRPC
clients (/root/reference/tzrec/datasets/sampler.py:134-142,322-335);
here the parent parses the item file once, publishes the alias/id/attr
arrays in one shm segment, and every mp-loader worker's pickled sampler
re-attaches — no per-worker table copies, no re-parsing.
"""

import pickle

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from torcheasyrec_tpu.datasets import sampler as sampler_mod
from torcheasyrec_tpu.utils import shm_pack


class _Cfg:
    def __init__(self, path):
        self.input_path = path
        self.num_sample = 8
        self.num_eval_sample = 0
        self.attr_fields = ["item_id", "item_cat"]
        self.attr_delimiter = ":"
        self.item_id_field = "item_id"


@pytest.fixture()
def item_file(tmp_path):
    n = 1000
    ids = np.arange(100, 100 + n, dtype=np.int64)
    weights = np.linspace(1.0, 3.0, n)
    attrs = [f"{i}:{i % 7}" for i in ids]
    pq.write_table(
        pa.table({"id": ids, "weight": weights, "attrs": attrs}),
        str(tmp_path / "item.parquet"),
    )
    return str(tmp_path / "item.parquet")


def test_shm_pack_roundtrip():
    arrs = {
        "a": np.arange(10, dtype=np.int64),
        "b": np.linspace(0, 1, 7).astype(np.float64),
        "c": np.frombuffer(b"hello", dtype=np.uint8),
    }
    name = "tzrec_test_pack"
    try:
        views = shm_pack.build(name, dict(arrs))
        got = shm_pack.attach(name)
        for k in arrs:
            np.testing.assert_array_equal(got[k], arrs[k])
            np.testing.assert_array_equal(views[k], arrs[k])
        # attach returns views of the SAME memory, not copies
        views["a"][0] = 42
        assert got["a"][0] == 42
    finally:
        shm_pack.unlink(name)


def test_shared_sampler_matches_unshared(item_file):
    plain = sampler_mod.NegativeSampler(_Cfg(item_file), batch_size=4)
    plain.init()
    shared = sampler_mod.NegativeSampler(_Cfg(item_file), batch_size=4)
    shared.prepare_shared()
    try:
        # simulate the mp-loader worker hand-off
        blob = pickle.dumps(shared)
        # the pickled sampler must NOT carry the table (tiny payload)
        assert len(blob) < 20_000, len(blob)
        worker = pickle.loads(blob)
        worker.init()
        cols = {
            "item_id": pa.array([100, 101, 102, 103]),
            "item_cat": pa.array(["2", "3", "4", "5"]),
        }
        a = plain.process({k: v for k, v in cols.items()})
        b = worker.process({k: v for k, v in cols.items()})
        # same seeded rng + identical alias arrays => identical draws
        assert a["item_id"].to_pylist() == b["item_id"].to_pylist()
        assert a["item_cat"].to_pylist() == b["item_cat"].to_pylist()
        # worker's arrays are shm views, not copies
        assert np.shares_memory(
            worker._ids_sorted,
            shm_pack.attach(shared._shm_name)["ids_sorted"],
        )
    finally:
        shared.close_shared()


def test_shared_sampler_parses_item_file_once(item_file, monkeypatch):
    calls = {"n": 0}
    real = sampler_mod._read_table

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(sampler_mod, "_read_table", counting)
    s = sampler_mod.NegativeSampler(_Cfg(item_file), batch_size=4)
    s.prepare_shared()
    try:
        assert calls["n"] == 1
        for _ in range(3):  # three "workers"
            w = pickle.loads(pickle.dumps(s))
            w.init()
            assert w._inited
        assert calls["n"] == 1  # no worker re-parsed the item file
    finally:
        s.close_shared()


def test_attr_decode_matches_legacy(item_file):
    s = sampler_mod.NegativeSampler(_Cfg(item_file), batch_size=4)
    s.init()
    assert s._has_attrs
    assert s._attr_vals(0) == ["100", str(100 % 7)]
    assert s._attr_vals(999) == ["1099", str(1099 % 7)]
    # sorted-id lookup: known, unknown, boundary
    np.testing.assert_array_equal(
        s._rows_of(np.array([100, 1099, 99, 5000])),
        np.array([0, 999, -1, -1]),
    )


class _V2Cfg:
    def __init__(self, item_path, edge_path, hard_path=None):
        self.item_input_path = item_path
        self.input_path = item_path
        self.pos_edge_input_path = edge_path
        self.hard_neg_edge_input_path = hard_path or ""
        self.num_sample = 8
        self.num_hard_sample = 2
        self.num_eval_sample = 0
        self.attr_fields = ["item_id", "item_cat"]
        self.attr_delimiter = ":"
        self.item_id_field = "item_id"
        self.user_id_field = "user_id"


@pytest.fixture()
def edge_files(tmp_path, item_file):
    # user u has positive edges to items 100..100+8*u step small
    us, its = [], []
    for u in range(16):
        for j in range(10):
            us.append(u)
            its.append(100 + (u * 13 + j) % 400)
    pq.write_table(
        pa.table({"user": np.asarray(us, np.int64),
                  "item": np.asarray(its, np.int64)}),
        str(tmp_path / "edges.parquet"),
    )
    # hard edges: user u -> three specific items
    hu, hi = [], []
    for u in range(16):
        for j in range(3):
            hu.append(u)
            hi.append(100 + 500 + (u * 3 + j) % 100)
    pq.write_table(
        pa.table({"user": np.asarray(hu, np.int64),
                  "item": np.asarray(hi, np.int64)}),
        str(tmp_path / "hard.parquet"),
    )
    return (str(tmp_path / "edges.parquet"),
            str(tmp_path / "hard.parquet"))


def test_v2_edge_tables_ride_shm(item_file, edge_files, tmp_path,
                                 monkeypatch):
    """VERDICT r4 #7: the V2 pos-edge (and hard-neg) tables live in the
    shm pack next to the item table — a pickled worker attaches and
    enforces positive-edge exclusion WITHOUT the edge files (deleted
    after prepare_shared to prove no re-read), and its negatives match
    the unshared sampler draw-for-draw."""
    import os

    edge_path, hard_path = edge_files
    plain = sampler_mod.NegativeSamplerV2(
        _V2Cfg(item_file, edge_path), batch_size=4
    )
    plain.init()
    shared = sampler_mod.NegativeSamplerV2(
        _V2Cfg(item_file, edge_path), batch_size=4
    )
    shared.prepare_shared()
    try:
        blob = pickle.dumps(shared)
        assert len(blob) < 20_000, len(blob)
        # the worker must never touch the files again
        os.replace(edge_path, edge_path + ".gone")
        worker = pickle.loads(blob)
        worker.init()
        assert np.shares_memory(
            worker._pe_items,
            shm_pack.attach(shared._shm_name)["pe_items"],
        )
        cols = {
            "user_id": pa.array(np.asarray([3, 3, 7, 7], np.int64)),
            "item_id": pa.array(np.asarray([1000, 1001, 1002, 1003])),
            "item_cat": pa.array(["1", "2", "3", "4"]),
        }
        banned = set(
            (100 + (u * 13 + j) % 400) for u in (3, 7) for j in range(10)
        )
        a = plain.process(dict(cols))
        b = worker.process(dict(cols))
        assert a["item_id"].to_pylist() == b["item_id"].to_pylist()
        negs = set(int(x) for x in b["item_id"].to_pylist()[4:])
        assert not negs & banned
    finally:
        os.replace(edge_path + ".gone", edge_path)
        shared.close_shared()


def test_hard_negative_edges_ride_shm(item_file, edge_files):
    """HardNegativeSamplerV2's hard-edge CSR also ships in the pack:
    the worker's hard candidates come from shm and match unshared."""
    edge_path, hard_path = edge_files
    plain = sampler_mod.HardNegativeSamplerV2(
        _V2Cfg(item_file, edge_path, hard_path), batch_size=4
    )
    plain.init()
    shared = sampler_mod.HardNegativeSamplerV2(
        _V2Cfg(item_file, edge_path, hard_path), batch_size=4
    )
    shared.prepare_shared()
    try:
        worker = pickle.loads(pickle.dumps(shared))
        worker.init()
        assert np.shares_memory(
            worker._he_items,
            shm_pack.attach(shared._shm_name)["he_items"],
        )
        cols = {
            "user_id": pa.array(np.asarray([0, 1, 2, 5], np.int64)),
            "item_id": pa.array(np.asarray([1000, 1001, 1002, 1003])),
            "item_cat": pa.array(["1", "2", "3", "4"]),
        }
        a = plain.process(dict(cols))
        b = worker.process(dict(cols))
        assert a["item_id"].to_pylist() == b["item_id"].to_pylist()
        np.testing.assert_array_equal(
            np.asarray(a[sampler_mod.HARD_NEG_INDICES]),
            np.asarray(b[sampler_mod.HARD_NEG_INDICES]),
        )
        # hard block carries each user's hard-edge items
        got = b["item_id"].to_pylist()
        hard_block = got[4 + 8:]
        exp0 = {100 + 500 + j % 100 for j in range(3)}
        assert set(int(x) for x in hard_block[:2]) <= exp0
    finally:
        shared.close_shared()
