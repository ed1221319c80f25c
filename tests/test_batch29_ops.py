"""Batch-29 operators: concentration (Gini+HHI), modularity,
benford_deviation, cluster_hulls (dbscan -> convex hull composition)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------- concentration


def test_concentration_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import concentration

    vals = [(f"g{i % 2}", (i * 13) % 50) for i in range(300)]
    df = spark.createDataFrame(vals, "g string, v long")
    got = {
        r.g: (r.n, r.total, r.sumsq, r.gini_num, r.gini, r.hhi)
        for r in concentration(df, "v", group_cols=["g"]).collect()
    }
    for gk in ("g0", "g1"):
        xs = sorted(v for g, v in vals if g == gk)
        n, S = len(xs), sum(xs)
        ix = sum((i + 1) * x for i, x in enumerate(xs))
        gn = 2 * ix - (n + 1) * S
        assert got[gk] == (
            n,
            S,
            sum(x * x for x in xs),
            gn,
            float(gn) / float(n * S),
            float(sum(x * x for x in xs)) / float(S * S),
        ), gk


def test_concentration_extremes_and_guard(spark):
    from osm_pbf_spark.operators.stats import concentration

    # perfectly equal -> gini 0, hhi = 1/n
    eq = spark.createDataFrame([(5,)] * 10, "v long")
    r = concentration(eq, "v").collect()[0]
    assert r.gini == 0.0 and r.hhi == pytest.approx(0.1, abs=0)
    # total concentration -> gini = 1 - 1/n, hhi = 1
    one = spark.createDataFrame([(0,)] * 9 + [(100,)], "v long")
    r = concentration(one, "v").collect()[0]
    assert r.gini == (2 * 10 * 100 - 11 * 100) / (10 * 100) and r.hhi == 1.0
    bad = spark.createDataFrame([(-1,)], "v long")
    with pytest.raises(Exception, match="must be >= 0"):
        concentration(bad, "v").collect()


# ------------------------------------------------------------- modularity


def test_modularity_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import modularity

    # two triangles joined by one bridge edge
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (1, 0)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "node long, label long"
    )
    r = modularity(edf, labels).collect()
    assert len(r) == 1
    r = r[0]
    # und edges: 7 (dup (1,0) collapses); intra: 6; degrees: community
    # 0 = {0:2,1:2,2:3} -> 7, community 1 = {3:3,4:2,5:2} -> 7
    m, intra, dc2 = 7, 6, 7 * 7 + 7 * 7
    assert (r.m, r.intra, r.q_num) == (m, intra, 4 * m * intra - dc2)
    assert r.modularity == float(4 * m * intra - dc2) / float(4 * m * m)


def test_modularity_extremes_and_guard(spark):
    from osm_pbf_spark.operators.graph import modularity

    edges = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    # all one community: Q = 0 (intra = m, sum d_c^2 = (2m)^2)
    same = spark.createDataFrame([(i, 0) for i in range(4)], "node long, label long")
    assert modularity(edges, same).collect()[0].modularity == 0.0
    # unlabeled endpoint raises through the guard branch
    partial = spark.createDataFrame([(0, 0), (1, 0), (2, 0)], "node long, label long")
    with pytest.raises(Exception, match="unlabeled"):
        modularity(edges, partial).collect()


# ------------------------------------------------------ benford_deviation


def test_benford_counts_and_chi2(spark):
    from osm_pbf_spark.operators.dq import benford_deviation, benford_probs_micro

    vals = [int(10 ** ((i * 0.37) % 4)) + i % 7 + 1 for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = benford_deviation(df, "v").collect()[0]
    cnt = {d: 0 for d in range(1, 10)}
    for v in vals:
        cnt[int(str(v)[0])] += 1
    assert r.n == 500
    for d in range(1, 10):
        assert r[f"n{d}"] == cnt[d], d
    probs = benford_probs_micro()
    chi2 = 0.0
    for d in range(1, 10):
        dev = float(cnt[d] * 1_000_000 - 500 * probs[d - 1])
        chi2 = chi2 + (dev * dev) / float(500 * probs[d - 1] * 1_000_000)
    assert r.chi2 == chi2  # identical fixed chain
    bad = spark.createDataFrame([(0,)], "v long")
    with pytest.raises(Exception, match="must be > 0"):
        benford_deviation(bad, "v").collect()


def test_benford_perfect_sample_scores_low(spark):
    """A sample drawn ~proportional to Benford has a far smaller chi2
    than a uniform-leading-digit one."""
    from osm_pbf_spark.operators.dq import benford_deviation

    benfordish = []
    for d in range(1, 10):
        benfordish += [d * 1000 + 1] * int(1000 * math.log10(1 + 1 / d) + 0.5)
    uniform = [d * 1000 + 1 for d in range(1, 10)] * 111
    b = benford_deviation(
        spark.createDataFrame([(v,) for v in benfordish], "v long"), "v"
    ).collect()[0]
    u = benford_deviation(
        spark.createDataFrame([(v,) for v in uniform], "v long"), "v"
    ).collect()[0]
    assert b.chi2 < u.chi2 / 10


# ---------------------------------------------------------- cluster_hulls


def test_cluster_hulls_two_blobs(spark):
    """Two well-separated dense blobs -> two clusters, each hull
    containing exactly its blob's corner points."""
    from osm_pbf_spark.operators.clustering import cluster_hulls

    pts = []
    for i in range(25):  # blob A: 5x5 grid at (0..4, 0..4)
        pts.append((i, float(i % 5), float(i // 5)))
    for i in range(25):  # blob B at (100..104, 0..4)
        pts.append((100 + i, 100.0 + i % 5, float(i // 5)))
    df = spark.createDataFrame(pts, "id long, x double, y double")
    rows = cluster_hulls(df, eps=1.5, min_pts=3, scale=10.0).collect()
    by_cl = {}
    for r in rows:
        by_cl.setdefault(r.cluster, []).append((r.hull_pos, r.ix, r.iy))
    assert len(by_cl) == 2
    hulls = {cl: {(x, y) for _, x, y in v} for cl, v in by_cl.items()}
    assert {(0, 0), (40, 0), (40, 40), (0, 40)} <= hulls[min(hulls)]
    assert {(1000, 0), (1040, 0), (1040, 40), (1000, 40)} <= hulls[max(hulls)]
    # hull_pos is a contiguous CCW sequence
    for v in by_cl.values():
        assert sorted(p for p, _, _ in v) == list(range(len(v)))


def test_cluster_hulls_noise_excluded(spark):
    from osm_pbf_spark.operators.clustering import cluster_hulls

    pts = [(i, float(i % 3), float(i // 3)) for i in range(9)]
    pts.append((99, 500.0, 500.0))  # isolated noise point
    df = spark.createDataFrame(pts, "id long, x double, y double")
    rows = cluster_hulls(df, eps=1.5, min_pts=3, scale=1.0).collect()
    assert all(r.cluster >= 0 for r in rows)
    assert not any(r.ix == 500 for r in rows)
