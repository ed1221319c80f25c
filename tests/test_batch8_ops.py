"""Batch-8 operators: count-min sketch (sketch.count_min/cms_lookup),
skyline / Pareto frontier (skyline.skyline), column profiler
(checksum.profile_table)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest


def _h40(seed: int, v) -> int:
    return int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:10], 16)


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


def test_cms_upper_bound_and_replay(spark):
    from osm_pbf_spark.operators.sketch import cms_lookup, count_min

    depth, width = 3, 32
    rows = [(i % 50,) for i in range(1000)] + [(7,)] * 200
    df = spark.createDataFrame(rows, "v int")
    sk = count_min(df, "v", depth=depth, width=width)
    skm = {(r.cms_row, r.cms_bucket): r.cms_count for r in sk.collect()}

    # pure-Python replay of the sketch build
    exp: dict[tuple[int, int], int] = {}
    for (v,) in rows:
        for i in range(depth):
            key = (i, _h40(i, v) % width)
            exp[key] = exp.get(key, 0) + 1
    assert skm == exp

    probes = spark.createDataFrame([(v,) for v in range(60)], "v int")
    est = {
        r.v: r.cms_estimate
        for r in cms_lookup(sk, probes, "v", depth=depth, width=width).collect()
    }
    true = {v: 20 + (200 if v == 7 else 0) for v in range(50)}
    true.update({v: 0 for v in range(50, 60)})
    for v in range(60):
        # CMS never underestimates
        assert est[v] >= true[v]
        # and replays exactly
        want = min(
            exp.get((i, _h40(i, v) % width), 0) for i in range(depth)
        )
        assert est[v] == want


def test_cms_weighted(spark):
    from osm_pbf_spark.operators.sketch import cms_lookup, count_min

    df = spark.createDataFrame([(1, 10), (1, 5), (2, 3)], "v int, w int")
    sk = count_min(df, "v", depth=4, width=64, weight_col="w")
    probes = spark.createDataFrame([(1,), (2,)], "v int")
    est = {r.v: r.cms_estimate for r in cms_lookup(sk, probes, "v", 4, 64).collect()}
    assert est[1] >= 15 and est[2] >= 3


def test_cms_partitioning_invariance(spark):
    from osm_pbf_spark.operators.sketch import count_min

    rows = [((i * 13) % 97,) for i in range(500)]
    a = count_min(spark.createDataFrame(rows, "v int").repartition(1), "v")
    b = count_min(spark.createDataFrame(rows, "v int").repartition(7), "v")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# skyline
# ---------------------------------------------------------------------------


def _brute_skyline(pts: list[tuple]) -> set[tuple]:
    out = set()
    for p in pts:
        dominated = any(
            all(q[i] >= p[i] for i in range(len(p)))
            and any(q[i] > p[i] for i in range(len(p)))
            for q in pts
        )
        if not dominated:
            out.add(p)
    return out


def test_skyline_vs_brute(spark):
    from osm_pbf_spark.operators.skyline import skyline

    rng = np.random.RandomState(7)
    pts = [(int(x), int(y)) for x, y in rng.randint(0, 40, size=(300, 2))]
    df = spark.createDataFrame(pts, "x int, y int")
    got = {(r.x, r.y) for r in skyline(df, ["x", "y"]).collect()}
    assert got == _brute_skyline(pts)


def test_skyline_keeps_duplicate_frontier_rows(spark):
    from osm_pbf_spark.operators.skyline import skyline

    df = spark.createDataFrame(
        [(1, 5, 5), (2, 5, 5), (3, 1, 1)], "id int, x int, y int"
    )
    got = sorted(r.id for r in skyline(df, ["x", "y"]).collect())
    # the two (5,5) copies tie — neither strictly dominates — both stay
    assert got == [1, 2]


def test_skyline_3d_and_partition_invariance(spark):
    from osm_pbf_spark.operators.skyline import skyline

    rng = np.random.RandomState(11)
    pts = [tuple(int(v) for v in row) for row in rng.randint(0, 12, size=(200, 3))]
    brute = _brute_skyline(pts)
    for parts in (1, 5):
        df = spark.createDataFrame(pts, "x int, y int, z int").repartition(parts)
        got = {(r.x, r.y, r.z) for r in skyline(df, ["x", "y", "z"], n_salts=8).collect()}
        assert got == brute


def test_skyline_candidate_guard(spark):
    from osm_pbf_spark.operators.skyline import skyline

    # perfectly anti-correlated: every point is on the frontier
    df = spark.createDataFrame([(i, 100 - i) for i in range(100)], "x int, y int")
    with pytest.raises(Exception, match="max_candidates"):
        skyline(df, ["x", "y"], max_candidates=10).collect()
    assert skyline(df, ["x", "y"]).count() == 100


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_table(spark):
    from osm_pbf_spark.operators.checksum import profile_table

    df = spark.createDataFrame(
        [(1, 2.5), (2, None), (2, -1.0), (4, 0.5)], "a int, b double"
    )
    rows = {r.col_name: r for r in profile_table(df, ["a", "b"]).collect()}
    assert rows["a"].n_rows == 4 and rows["a"].n_null == 0
    assert rows["a"].n_distinct == 3
    assert rows["a"].min_val == 1.0 and rows["a"].max_val == 4.0
    assert rows["b"].n_null == 1 and rows["b"].n_distinct == 3
    assert rows["b"].min_val == -1.0 and rows["b"].max_val == 2.5


def test_profile_table_requires_cols(spark):
    from osm_pbf_spark.operators.checksum import profile_table

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        profile_table(df, [])
