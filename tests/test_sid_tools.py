"""SID collision-resolution + quality tools.

Counterpart coverage of /root/reference/tzrec/utils/sid/{collision,
quality}_test.py and tools/sid/{resolve_sid_collisions,
evaluate_sid_quality}_test.py.
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from torcheasyrec_tpu.utils.sid.collision import (
    group_items,
    random_candidates,
    resolve_collisions,
    stable_order_hash,
)
from torcheasyrec_tpu.utils.sid.quality import (
    SidQualityAccumulator,
    compare_sid_quality,
    compute_entropy,
    compute_gini,
    valid_code_rows,
)

# ---------------------------------------------------------------- quality


def test_gini_matches_naive_pairwise():
    rng = np.random.default_rng(0)
    x = rng.integers(1, 50, size=200).astype(np.float64)
    naive = np.abs(x[:, None] - x[None, :]).sum() / (
        2 * x.size**2 * x.mean()
    )
    assert compute_gini(x) == pytest.approx(naive, abs=1e-9)
    assert compute_gini([5, 5, 5]) == pytest.approx(0.0)
    assert compute_gini([]) == 0.0


def test_entropy():
    assert compute_entropy([1, 1, 1, 1]) == pytest.approx(np.log(4))
    assert compute_entropy([7]) == pytest.approx(0.0)
    assert compute_entropy([0, 0]) == 0.0


def test_quality_accumulator_exact():
    # buckets: (0,0) x3, (1,2) x2, (3,3) x1 over codebook [4, 4]
    codes = np.asarray(
        [[0, 0], [0, 0], [0, 0], [1, 2], [1, 2], [3, 3]]
    )
    acc = SidQualityAccumulator([4, 4], top_sids=2)
    acc.update(codes[:3])  # streaming across batches is exact
    acc.update(codes[3:])
    res = acc.finalize()
    m = res.metrics
    assert m.total == 6 and m.unique_sid == 3
    assert m.no_collision_rate == pytest.approx(0.5)
    assert m.uniquely_identified_item_rate == pytest.approx(1 / 6)
    assert m.max_collision == 3
    assert m.entropy == pytest.approx(compute_entropy([3, 2, 1]))
    assert m.max_entropy == pytest.approx(np.log(16))
    l0, l1 = res.layer_metrics
    assert l0.codebook_size == 4 and l0.dead_codes == 1  # 0,1,3 used
    assert l0.coverage == pytest.approx(3 / 4)
    assert l1.dead_codes == 1  # 0,2,3 used
    assert res.top_sids[0] == ("0,0", 3)
    assert res.top_sids[1] == ("1,2", 2)

    with pytest.raises(ValueError, match="out-of-codebook"):
        SidQualityAccumulator([4, 4]).update(np.asarray([[4, 0]]))


def test_compare_quality_delta():
    a = SidQualityAccumulator([8, 8])
    a.update(np.asarray([[0, 0], [0, 0], [1, 1]]))
    b = SidQualityAccumulator([8, 8])
    b.update(np.asarray([[0, 0], [0, 1], [1, 1]]))
    delta = compare_sid_quality(a.finalize(), b.finalize())
    assert delta.metrics.unique_sid == 1  # 2 -> 3
    assert delta.metrics.max_collision == -1  # 2 -> 1
    assert delta.metrics.total == 0

    c = SidQualityAccumulator([8, 8])
    c.update(np.asarray([[0, 0]]))
    with pytest.raises(ValueError, match="cohort"):
        compare_sid_quality(b2(), c.finalize())


def b2():
    b = SidQualityAccumulator([8, 8])
    b.update(np.asarray([[0, 0], [0, 1], [1, 1]]))
    return b.finalize()


def test_valid_code_rows():
    ok = valid_code_rows(
        np.asarray([[0, 3], [-1, 0], [0, 4], [2, 2]]), [4, 4]
    )
    np.testing.assert_array_equal(ok, [True, False, False, True])


# --------------------------------------------------------------- collision


def test_resolve_basic_first_fit():
    # one band (prefix 5), bucket last=2 holds 4 items, capacity 2
    ids = np.arange(100, 104)
    codes = np.asarray([[5, 2]] * 4)
    cands = np.tile(np.asarray([[2, 7, 7, 1]]), (4, 1))
    res = resolve_collisions(ids, codes, [8, 8], 2, cands)
    st = res.stats
    assert st.raw_collision_buckets == 1
    assert st.relocated_count == 2 and st.unresolved_count == 0
    # 2 stay at origin, first mover -> 7, second -> 7 (cap 2), so both
    # land on 7 (skipping origin 2); bucket occupancy never exceeds 2
    final = np.sort(res.resolved_last_codes)
    np.testing.assert_array_equal(final, [2, 2, 7, 7])
    assert st.final_collision_buckets == 0
    # slot indices are 1-based and unique within each final bucket
    for code in (2, 7):
        idx = res.slot_indices[res.resolved_last_codes == code]
        np.testing.assert_array_equal(np.sort(idx), [1, 2])


def test_resolve_unresolved_keeps_origin_over_capacity():
    ids = np.arange(5)
    codes = np.asarray([[0, 1]] * 5)
    # only candidate is the origin itself -> nothing relocates
    cands = np.ones((5, 1), np.int64)
    res = resolve_collisions(ids, codes, [2, 4], 2, cands)
    assert res.stats.unresolved_count == 3
    np.testing.assert_array_equal(res.resolved_last_codes, [1] * 5)
    np.testing.assert_array_equal(np.sort(res.slot_indices), [1, 2, 3, 4, 5])
    assert res.stats.final_collision_buckets == 1
    assert res.stats.max_final_bucket_size == 5


def test_resolve_order_independent():
    """Shuffling input rows does not change any item's resolved SID."""
    rng = np.random.default_rng(1)
    ids = rng.choice(10_000, size=64, replace=False)
    codes = np.stack(
        [rng.integers(0, 2, 64), rng.integers(0, 3, 64)], axis=1
    )
    cands = rng.integers(0, 3, size=(64, 4))
    r1 = resolve_collisions(ids, codes, [2, 3], 2, cands)
    perm = rng.permutation(64)
    r2 = resolve_collisions(ids[perm], codes[perm], [2, 3], 2, cands[perm])
    m1 = dict(zip(ids.tolist(), r1.resolved_last_codes.tolist()))
    m2 = dict(zip(ids[perm].tolist(), r2.resolved_last_codes.tolist()))
    assert m1 == m2


def test_resolve_relocation_stays_in_band():
    rng = np.random.default_rng(2)
    n = 200
    ids = np.arange(n)
    codes = np.stack(
        [rng.integers(0, 4, n), rng.integers(0, 4, n)], axis=1
    )
    res = resolve_collisions(
        ids, codes, [4, 32], 3, num_random_candidates=16
    )
    # band (first layer) never changes; only last codes move
    assert res.stats.relocated_count > 0
    moved = res.resolved_last_codes != codes[:, -1]
    assert moved.any()
    # total items preserved
    assert res.stats.total_items == n


def test_random_candidates_deterministic():
    ids = np.asarray([3, 14, 15])
    a = random_candidates(ids, 256, 8)
    b = random_candidates(ids, 256, 8)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 8) and (a >= 0).all() and (a < 256).all()
    # string ids hash stably too
    h1 = stable_order_hash(np.asarray(["a", "b"], object))
    h2 = stable_order_hash(np.asarray(["a", "b"], object))
    np.testing.assert_array_equal(h1, h2)
    assert h1[0] != h1[1]


def test_group_items_csr():
    ids = np.asarray([10, 11, 12, 13])
    codes = np.asarray([[0, 1], [0, 1], [2, 2], [0, 1]])
    sid_codes, offsets, row_order = group_items(ids, codes, [4, 4])
    assert sid_codes.shape[0] == 2
    sizes = np.diff(offsets)
    assert sorted(sizes.tolist()) == [1, 3]
    # the (0,1) group contains exactly rows 0,1,3
    gi = int(np.where((sid_codes == [0, 1]).all(axis=1))[0][0])
    rows = set(row_order[offsets[gi] : offsets[gi + 1]].tolist())
    assert rows == {0, 1, 3}


# ----------------------------------------------------------------- CLI e2e


def _make_sid_table(tmp, n=300, seed=0, layers=(4, 8)):
    rng = np.random.default_rng(seed)
    ids = rng.choice(100_000, size=n, replace=False)
    codes = np.stack(
        [rng.integers(0, s, n) for s in layers], axis=1
    )
    topk = 6
    cand = np.zeros((n, topk * len(layers)), np.int64)
    for j in range(topk):
        for li, s in enumerate(layers):
            cand[:, j * len(layers) + li] = rng.integers(0, s, n)
    path = os.path.join(tmp, "sid.parquet")
    pq.write_table(pa.table({
        "item_id": pa.array(ids),
        "codes": pa.array(codes.tolist(), pa.list_(pa.int64())),
        "candidate_codes": pa.array(cand.tolist(), pa.list_(pa.int64())),
    }), path)
    return path, ids, codes


def test_resolve_cli_end_to_end(tmp_path):
    from torcheasyrec_tpu.tools.sid.resolve_sid_collisions import (
        build_parser,
        run,
    )

    tmp = str(tmp_path)
    path, ids, codes = _make_sid_table(tmp)
    args = build_parser().parse_args([
        "--input_path", path,
        "--codebook", "4,8",
        "--max_items_per_codebook", "4",
        "--output_path", os.path.join(tmp, "map"),
        "--resolved_sid_groups_output_path", os.path.join(tmp, "groups"),
        "--original_sid_groups_output_path", os.path.join(tmp, "orig"),
    ])
    result = run(args)

    m = pq.read_table(os.path.join(tmp, "map"))
    assert m.num_rows == len(ids)
    assert set(m.column_names) == {
        "item_id", "origin_codebook", "codebook", "index"
    }
    origin = np.asarray(m["origin_codebook"].to_pylist())
    final = np.asarray(m["codebook"].to_pylist())
    # bands never change; resolved last codes match the result object
    np.testing.assert_array_equal(origin[:, 0], final[:, 0])
    order = {int(i): k for k, i in enumerate(m["item_id"].to_pylist())}
    np.testing.assert_array_equal(
        final[[order[int(i)] for i in ids], 1], result.resolved_last_codes
    )

    g = pq.read_table(os.path.join(tmp, "groups"))
    sizes = np.asarray(g["count"].to_pylist())
    # every bucket is within capacity except unresolved leftovers
    n_over = int((sizes > 4).sum())
    assert n_over <= result.stats.final_collision_buckets
    assert sizes.sum() == len(ids)
    # groups partition the item ids
    all_ids = [i for grp in g["item_ids"].to_pylist() for i in grp]
    assert sorted(all_ids) == sorted(ids.tolist())

    og = pq.read_table(os.path.join(tmp, "orig"))
    assert np.asarray(og["count"].to_pylist()).sum() == len(ids)


def test_resolve_cli_random_strategy(tmp_path):
    from torcheasyrec_tpu.tools.sid.resolve_sid_collisions import (
        build_parser,
        run,
    )

    tmp = str(tmp_path)
    path, ids, _ = _make_sid_table(tmp, seed=5, layers=(4, 32))
    args = build_parser().parse_args([
        "--input_path", path,
        "--codebook", "4,32",
        "--max_items_per_codebook", "3",
        "--strategy", "random",
        "--output_path", os.path.join(tmp, "map"),
    ])
    r1 = run(args)
    r2 = run(args)  # deterministic rerun
    np.testing.assert_array_equal(
        r1.resolved_last_codes, r2.resolved_last_codes
    )
    assert r1.stats.relocated_count > 0


def test_evaluate_cli_compare(tmp_path):
    from torcheasyrec_tpu.tools.sid.evaluate_sid_quality import evaluate

    tmp = str(tmp_path)
    rng = np.random.default_rng(7)
    n = 400
    before = np.stack(
        [rng.integers(0, 4, n), rng.integers(0, 4, n)], axis=1
    )
    after = before.copy()
    # resolution spreads the last layer -> strictly more unique SIDs
    after[:, 1] = rng.integers(0, 16, n) % 8
    path = os.path.join(tmp, "t.parquet")
    pq.write_table(pa.table({
        "item_id": pa.array(np.arange(n)),
        "orig": pa.array(before.tolist(), pa.list_(pa.int64())),
        "codes": pa.array(after.tolist(), pa.list_(pa.int64())),
    }), path)
    res = evaluate(path, [4, 8], "codes", original_codes_field="orig")
    assert set(res) == {"before", "after", "delta"}
    assert res["after"].metrics.unique_sid > res["before"].metrics.unique_sid
    assert res["delta"].metrics.unique_sid == (
        res["after"].metrics.unique_sid - res["before"].metrics.unique_sid
    )
    assert res["before"].metrics.total == res["after"].metrics.total


def test_evaluate_writes_outputs(tmp_path):
    from torcheasyrec_tpu.tools.sid.evaluate_sid_quality import (
        _write_outputs,
        evaluate,
    )

    tmp = str(tmp_path)
    path, _, _ = _make_sid_table(tmp, n=100, seed=9)
    res = evaluate(path, [4, 8], "codes", top_sids=3)
    assert res["after"].top_sids is not None
    _write_outputs(
        res, os.path.join(tmp, "summary"), os.path.join(tmp, "layers"),
        "ParquetWriter",
    )
    s = pq.read_table(os.path.join(tmp, "summary"))
    assert s.num_rows == 1 and "no_collision_rate" in s.column_names
    ls = pq.read_table(os.path.join(tmp, "layers"))
    assert ls.num_rows == 2  # one row per layer
