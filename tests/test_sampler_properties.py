"""Sampler distributional properties.

Counterpart of the reference's graphlearn sampler statistics tests:
the alias table must reproduce the configured weight distribution, and
the negative samplers must honor their exclusion semantics.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from google.protobuf import text_format

from torcheasyrec_tpu.datasets.sampler import (
    AliasTable,
    NegativeSampler,
    NegativeSamplerV2,
)
from torcheasyrec_tpu.protos import sampler_pb2


def test_alias_table_matches_weights():
    rng = np.random.default_rng(0)
    w = np.asarray([1.0, 5.0, 0.0, 2.0, 2.0])
    t = AliasTable(w)
    n = 200_000
    s = t.sample(n, rng)
    counts = np.bincount(s, minlength=5) / n
    expect = w / w.sum()
    # zero-weight entries are never drawn
    assert counts[2] == 0.0
    np.testing.assert_allclose(counts, expect, atol=0.01)


def test_alias_table_skewed_and_single():
    rng = np.random.default_rng(1)
    w = np.asarray([1e-6, 1.0])
    s = AliasTable(w).sample(100_000, rng)
    assert (s == 1).mean() > 0.999
    s1 = AliasTable(np.asarray([3.0])).sample(100, rng)
    assert (s1 == 0).all()


def _item_table(tmp, n=200, seed=3):
    rng = np.random.default_rng(seed)
    ids = np.arange(1000, 1000 + n)
    weights = rng.random(n) + 0.1
    path = os.path.join(tmp, "items.parquet")
    # item-table contract: col0 = id, col1 = weight, col2 = the
    # attr_delimiter-joined attr values named by attr_fields
    pq.write_table(pa.table({
        "id": pa.array(ids.astype(np.int64)),
        "weight": pa.array(weights),
        "attrs": pa.array([f"{i}:c{k % 7}" for k, i in enumerate(ids)]),
    }), path)
    return path, ids, weights


def test_negative_sampler_distribution_and_exclusion(tmp_path):
    tmp = str(tmp_path)
    path, ids, weights = _item_table(tmp)
    cfg = text_format.Parse(f"""
        input_path: "{path}"
        num_sample: 64
        attr_fields: ["id", "attrs"]
        item_id_field: "item_id"
    """, sampler_pb2.NegativeSampler())
    sampler = NegativeSampler(cfg, batch_size=8)

    pos = ids[:4]
    freq = np.zeros(len(ids))
    for trial in range(300):
        out = sampler.process({
            "item_id": pa.array(pos.astype(np.int64)),
            "id": pa.array(pos.astype(np.int64)),
        })
        # negatives are APPENDED to the item-side columns (positives
        # first, shared negatives after — the __NEG__ group parses them
        # downstream at B + num_sample)
        neg = np.asarray(out["id"].to_pylist()[4:], np.int64)
        assert len(neg) == 64
        # in-batch positives excluded (best-effort resampling: with 4/200
        # positives the two retries virtually always clear them)
        assert not set(neg.tolist()) & set(pos.tolist())
        freq[np.searchsorted(ids, neg)] += 1
    # sampled frequencies track the weight column (positives excluded)
    mask = np.ones(len(ids), bool)
    mask[:4] = False
    expect = weights[mask] / weights[mask].sum()
    got = freq[mask] / freq[mask].sum()
    np.testing.assert_allclose(got, expect, atol=0.01)


def test_negative_sampler_v2_excludes_user_edges(tmp_path):
    tmp = str(tmp_path)
    path, ids, _ = _item_table(tmp, n=20)
    # user 7 has positive edges to the first 10 items
    edges = os.path.join(tmp, "edges.parquet")
    pq.write_table(pa.table({
        "user": pa.array(np.full(10, 7, np.int64)),
        "item": pa.array(ids[:10].astype(np.int64)),
    }), edges)
    cfg = text_format.Parse(f"""
        item_input_path: "{path}"
        pos_edge_input_path: "{edges}"
        num_sample: 16
        attr_fields: ["id", "attrs"]
        item_id_field: "item_id"
        user_id_field: "user_id"
    """, sampler_pb2.NegativeSamplerV2())
    sampler = NegativeSamplerV2(cfg, batch_size=4)
    banned = set(ids[:10].tolist())
    for _ in range(50):
        out = sampler.process({
            "user_id": pa.array(np.full(4, 7, np.int64)),
            "item_id": pa.array(ids[10:14].astype(np.int64)),
            "id": pa.array(ids[10:14].astype(np.int64)),
        })
        neg = set(
            np.asarray(out["id"].to_pylist()[4:], np.int64).tolist()
        )
        assert not neg & banned, neg & banned
