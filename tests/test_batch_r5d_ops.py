"""Batch r5-D: sink branches (WAP), mis_coloring, perm_test, fk_check."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("cell"),
        F.concat(F.lit("p-"), F.col("id")).alias("text"),
    )


# ------------------------------------------------------------ branches
def test_branch_wap_flow(spark, tmp_path):
    """write-audit-publish: stage -> branch -> rollback main -> audit
    through the branch -> publish; branch protects its snapshot from
    expiry; fast-forward-only moves."""
    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "base")
    snap_a = sink.commit_snapshot({"stage": "base"})
    sink.write_split(_docs(spark, 50, 80), "staged")
    snap_b = sink.commit_snapshot({"stage": "staged"})
    br = sink.branch_snapshot("audit")
    assert br == {"audit": snap_b["snapshot_id"]}
    sink.rollback_to(snap_a["snapshot_id"])
    assert sink.read(spark).count() == 50           # main is back to base
    assert sink.read_branch(spark, "audit").count() == 80  # branch sees staged
    # the branched snapshot survives aggressive expiry
    sink.expire_snapshots(keep_last=1)
    assert sink.read_branch(spark, "audit").count() == 80
    # publish: main adopts the branch
    pub = sink.publish_branch("audit")
    assert sink.read(spark).count() == 80
    sink.advance_branch("audit")                     # to current = fine
    sink.write_split(_docs(spark, 80, 90), "more")
    sink.commit_snapshot({"stage": "more"})
    sink.advance_branch("audit")                     # forward again
    with pytest.raises(ValueError, match="fast-forward"):
        sink.advance_branch("audit", pub["snapshot_id"])  # rewind refused
    with pytest.raises(ValueError, match="already exists"):
        sink.branch_snapshot("audit")
    sink.delete_branch("audit")
    with pytest.raises(KeyError):
        sink.read_branch(spark, "audit")


# ------------------------------------------------------------ coloring
def _greedy_mis(edges, alive):
    nbrs: dict = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    pri = lambda v: (int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16), v)
    taken, blocked = set(), set()
    for v in sorted({x for e in edges for x in e}, key=pri):
        if v in blocked:
            continue
        taken.add(v)
        blocked |= nbrs.get(v, set())
    return taken


def _coloring_replay(edges):
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    alive = {x for e in und for x in e}
    rem = set(und)
    color = {}
    c = 0
    while alive:
        c += 1
        endpoints = {x for e in rem for x in e}
        isolated = alive - endpoints
        mis = _greedy_mis(rem, alive) | isolated
        for v in mis:
            color[v] = c
        alive -= mis
        rem = {(u, v) for u, v in rem if u not in mis and v not in mis}
    return color


def test_mis_coloring_proper_and_matches_replay(spark):
    from osm_pbf_spark.operators.graph import mis_coloring

    edges = [((i * 7) % 40, (i * 11 + 3) % 40) for i in range(150)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.color for r in mis_coloring(df).collect()}
    assert got == _coloring_replay(edges)
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    for u, v in und:
        assert got[u] != got[v]          # proper coloring
    assert max(got.values()) >= 2        # non-trivial


# ------------------------------------------------------------ perm test
def test_perm_test_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import perm_test

    rows = [(i, "a" if i % 3 == 0 else "b", (i * 13) % 50 + (20 if i % 3 == 0 else 0))
            for i in range(90)]
    df = spark.createDataFrame(rows, "rid long, g string, v long")
    (r,) = perm_test(df, "v", "g", "rid", n_perms=99, seed=7).collect()

    data = {rid: (g, v) for rid, g, v in rows}
    n_a = sum(1 for g, _ in data.values() if g == "a")
    n_b = len(data) - n_a
    s_a = sum(v for g, v in data.values() if g == "a")
    s_tot = sum(v for _, v in data.values())
    obs = abs(s_a * n_b - (s_tot - s_a) * n_a)
    key = lambda i, rid: (
        int(hashlib.md5(f"7:{i}:{rid}".encode()).hexdigest()[:10], 16), rid
    )
    n_ge = 0
    for i in range(99):
        order = sorted(data, key=lambda rid: key(i, rid))
        sa = sum(data[rid][1] for rid in order[:n_a])
        if abs(sa * n_b - (s_tot - sa) * n_a) >= obs:
            n_ge += 1
    assert (r.n_a, r.n_b, r.diff_num, r.n_perms, r.n_ge) == (
        n_a, n_b, obs, 99, n_ge
    )
    assert r.p == (1 + n_ge) / 100.0
    # an obviously-shifted sample is significant
    assert r.p < 0.05


def test_perm_test_rejects_bad_groups(spark):
    from osm_pbf_spark.operators.stats import perm_test

    df = spark.createDataFrame([(1, "a", 5)], "rid long, g string, v long")
    with pytest.raises(ValueError, match="2 groups"):
        perm_test(df, "v", "g", "rid")


# ------------------------------------------------------------ fk check
def test_fk_check_counts(spark):
    from osm_pbf_spark.operators.dq import fk_check

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, 77), (7, None)],
        "rid long, fk long",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    (r,) = fk_check(child, parent, "fk", "pk").collect()
    assert (r.n_child_rows, r.n_null_keys, r.n_orphan_rows, r.n_orphan_keys) == (
        7, 1, 3, 2
    )
