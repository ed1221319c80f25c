"""Batch-10 operators: k-core decomposition (graph.kcore), mergeable
KMV sketch set operations (sketch.kmv_sketch/kmv_set_estimate), and
the WITH RECURSIVE SQL surface."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _h40(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16)


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def _brute_kcore(edges: set[tuple[int, int]], k: int) -> dict[int, int]:
    """Sequential peeling to fixpoint; returns {node: degree-in-core}."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(s) for n, s in adj.items() if s}


def test_kcore_matches_brute_fixpoint(spark):
    from osm_pbf_spark.operators.graph import kcore

    # two 5-cliques joined by a path of degree-2 nodes + pendant leaves
    edges = set()
    for base in (0, 100):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.add((base + i, base + j))
    edges |= {(4, 50), (50, 51), (51, 100), (0, 900), (900, 901)}
    df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    want = _brute_kcore(edges, 3)
    got = {r.node: r.degree for r in kcore(df, k=3, rounds=None).collect()}
    assert got == want  # the two 5-cliques, each node at degree 4
    assert set(got) == {i for i in range(5)} | {100 + i for i in range(5)}

    # fixed-round budget reaching the fixpoint gives the same answer
    got6 = {r.node: r.degree for r in kcore(df, k=3, rounds=6).collect()}
    assert got6 == want


def test_kcore_self_loops_and_duplicates_ignored(spark):
    from osm_pbf_spark.operators.graph import kcore

    rows = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(rows, "src bigint, dst bigint")
    got = {r.node: r.degree for r in kcore(df, k=2, rounds=None).collect()}
    assert got == {1: 2, 2: 2, 3: 2}  # the triangle; self-loop/dups dropped


def test_kcore_validation(spark):
    from osm_pbf_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    with pytest.raises(ValueError):
        kcore(df, k=0)


# ---------------------------------------------------------------------------
# KMV sketch merge
# ---------------------------------------------------------------------------


def test_kmv_sketch_and_merge_replay(spark):
    from osm_pbf_spark.operators.sketch import kmv_set_estimate, kmv_sketch

    k = 32
    a_vals = list(range(0, 600))          # |A| = 600
    b_vals = list(range(400, 900))        # |B| = 500, |A ∩ B| = 200
    da = spark.createDataFrame([("g", v) for v in a_vals], "grp string, v int")
    db = spark.createDataFrame([("g", v) for v in b_vals], "grp string, v int")
    sa = kmv_sketch(da, ["grp"], "v", k=k)
    sb = kmv_sketch(db, ["grp"], "v", k=k)
    ra = sa.collect()[0]
    assert ra.kmv_k == k and ra.hashes == sorted(ra.hashes)
    # scalar replay of the sketch content
    assert ra.hashes == sorted({_h40(v) for v in a_vals})[:k]

    est = kmv_set_estimate(sa, sb, ["grp"], k=k).collect()[0]
    ha = sorted({_h40(v) for v in a_vals})[:k]
    hb = sorted({_h40(v) for v in b_vals})[:k]
    hu = sorted(set(ha) | set(hb))[:k]
    want_u = (k - 1) * (1 << 40) / hu[k - 1]
    assert est.est_union == want_u
    assert est.est_intersect == (est.est_a + est.est_b) - est.est_union
    # statistical sanity (4-sigma-ish at k=32)
    assert abs(est.est_union - 900) / 900 < 0.8
    assert abs(est.est_intersect - 200) < 250


def test_kmv_merge_exact_when_small(spark):
    from osm_pbf_spark.operators.sketch import kmv_set_estimate, kmv_sketch

    da = spark.createDataFrame([("g", v) for v in range(10)], "grp string, v int")
    db = spark.createDataFrame([("g", v) for v in range(5, 15)], "grp string, v int")
    sa = kmv_sketch(da, ["grp"], "v", k=64)
    sb = kmv_sketch(db, ["grp"], "v", k=64)
    est = kmv_set_estimate(sa, sb, ["grp"], k=64).collect()[0]
    # both sketches below k: every estimate is EXACT
    assert (est.est_a, est.est_b, est.est_union, est.est_intersect) == (
        10.0, 10.0, 15.0, 5.0
    )
    assert est.jaccard_est == 5.0 / 15.0


# ---------------------------------------------------------------------------
# recursive CTE surface
# ---------------------------------------------------------------------------


def test_recursive_cte_chain(spark):
    spark.range(1, 9).select(F.col("id").alias("n")).createOrReplaceTempView(
        "rc_nums"
    )
    rows = {
        r.root: (r.chain_len, r.chain_sum)
        for r in spark.sql(
            """
            WITH RECURSIVE ch(root, node) AS (
              SELECT n, n FROM rc_nums
              UNION ALL
              SELECT root, node DIV 2 FROM ch WHERE node > 0
            )
            SELECT root, count(*) AS chain_len, sum(node) AS chain_sum
            FROM ch GROUP BY root
            """
        ).collect()
    }
    # 5 -> 2 -> 1 -> 0 : len 4, sum 8
    assert rows[5] == (4, 8)
    assert rows[1] == (2, 1)
    assert rows[8] == (5, 15)


def _brute_cc(edges: set[tuple[int, int]]) -> dict[int, tuple[int, int, float]]:
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for n, nbrs in adj.items():
        d = len(nbrs)
        t = sum(len(adj[m] & nbrs) for m in nbrs) // 2
        cc = (2.0 * t) / (d * (d - 1)) if d >= 2 else 0.0
        out[n] = (d, t, cc)
    return out


def test_clustering_coefficient_vs_brute(spark):
    import numpy as np

    from osm_pbf_spark.operators.graph import clustering_coefficient

    rng = np.random.RandomState(9)
    edges = {tuple(sorted((int(a), int(b)))) for a, b in rng.randint(0, 40, (300, 2)) if a != b}
    df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    got = {r.node: (r.degree, r.n_tri, r.cc) for r in clustering_coefficient(df).collect()}
    want = _brute_cc(edges)
    assert set(got) == set(want)
    for n in want:
        assert got[n][0] == want[n][0] and got[n][1] == want[n][1]
        assert got[n][2] == want[n][2]  # exact-int ratio: identical bits
    # a triangle + pendant: classic values
    tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 4)], "src bigint, dst bigint")
    r = {x.node: x.cc for x in clustering_coefficient(tri).collect()}
    assert r[2] == 1.0 and r[3] == 1.0 and r[4] == 0.0
    assert abs(r[1] - 1.0 / 3.0) < 1e-15
