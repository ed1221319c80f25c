"""connected_components vs a scalar union-find oracle; fixed-rounds
lazy plan vs iterated fixpoint; near-dup group assignment end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.graph import (
    connected_components,
    dedup_canonical,
    near_dup_groups,
)


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
    # component id = min node in component
    comp_min = {}
    for x in nodes:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in nodes}


def _cc_dict(df):
    return {r.node: r.component for r in df.collect()}


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 200, 150), (3, 300, 600)])
def test_cc_matches_union_find_random(spark, seed, n, m):
    rng = np.random.default_rng(seed)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _cc_dict(connected_components(e))
    want = _union_find(n, edges)
    assert got == want


def test_cc_long_chain_converges(spark):
    # worst-case diameter: a 64-node path (plus a reversed one)
    edges = [(i, i + 1) for i in range(63)] + [(200 - i, 199 - i) for i in range(40)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _cc_dict(connected_components(e))
    want = _union_find(201, edges)
    assert got == want


def test_cc_fixed_rounds_matches_fixpoint(spark):
    rng = np.random.default_rng(7)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 80, size=(70, 2))]
    e = spark.createDataFrame(edges, "src long, dst long")
    want = _cc_dict(connected_components(e))
    got = _cc_dict(connected_components(e, rounds=4))
    assert got == want


def test_cc_self_loops_and_dups(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (9, 9)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = _cc_dict(connected_components(e))
    # self-loop-only nodes survive as singleton components
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_near_dup_groups_and_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (4, 5)], "id_a long, id_b long"
    )
    groups = near_dup_groups(docs, pairs)
    got = {r.doc_id: r.group_id for r in groups.collect()}
    assert got == {0: 0, 3: 0, 7: 0, 4: 4, 5: 4, 1: 1, 2: 2, 6: 6, 8: 8, 9: 9}
    surv = dedup_canonical(groups)
    got_s = {r.group_id: (r.doc_id, r.group_size) for r in surv.collect()}
    assert got_s[0] == (0, 3)
    assert got_s[4] == (4, 2)
    assert got_s[9] == (9, 1)
    # survivors: one per group, min id
    assert sorted(r.doc_id for r in surv.collect()) == [0, 1, 2, 4, 6, 8, 9]


def test_cc_fixed_rounds_plan_stays_constant_size(spark):
    """rounds=k must truncate each round's logical plan (localCheckpoint
    -> LogicalRDD leaf). Without truncation the analyzed tree grows
    ~30x per round (k=4 ≈ 10^6 leaves — minutes of Catalyst analysis);
    with it, the final plan is one constant-size round over an RDD leaf
    regardless of k."""
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    df = connected_components(e, rounds=4)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in analyzed or "ExistingRDD" in analyzed
    assert len(analyzed) < 20_000, f"rounds=k plan blew up: {len(analyzed)} chars"
    assert {r.component for r in df.collect()} == {1}


def _py_bfs(edges, sources, max_hops):
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    hops = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in hops:
                    nxt.add(v)
        for v in nxt:
            hops[v] = h
        if not nxt:
            break
        frontier = nxt
    return hops


def test_bfs_matches_python_oracle(spark):
    from osm_pbf_spark.operators.graph import bfs_hops

    rng = np.random.default_rng(13)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 150, size=(160, 2))]
    e = spark.createDataFrame(edges, "src long, dst long")
    srcs = spark.createDataFrame([(0,), (7,), (7,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(e, srcs).collect()}
    assert got == _py_bfs(edges, [0, 7], 24)


def test_bfs_max_hops_caps_both_sides(spark):
    from osm_pbf_spark.operators.graph import bfs_hops

    edges = [(i, i + 1) for i in range(30)]  # a path
    e = spark.createDataFrame(edges, "src long, dst long")
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.hops for r in bfs_hops(e, srcs, max_hops=5).collect()}
    assert got == {i: i for i in range(6)}  # nodes beyond hop 5 absent


def _py_bellman(edges, sources, rounds):
    adj = {}
    for a, b, w in edges:
        if a != b:
            adj.setdefault(a, {})
            adj.setdefault(b, {})
            adj[a][b] = min(adj[a].get(b, w), w)
            adj[b][a] = min(adj[b].get(a, w), w)
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, {}).items():
                if v not in nxt or d + w < nxt[v]:
                    nxt[v] = d + w
        if nxt == dist:
            break
        dist = nxt
    return dist


def test_sssp_matches_python_bellman(spark):
    from osm_pbf_spark.operators.graph import sssp

    rng = np.random.default_rng(31)
    edges = [
        (int(a), int(b), int(w))
        for (a, b), w in zip(rng.integers(0, 120, size=(200, 2)), rng.integers(1, 20, 200))
    ]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    srcs = spark.createDataFrame([(0,), (3,)], "node long")
    got = {r.node: r.dist for r in sssp(e, srcs, max_rounds=50).collect()}
    assert got == _py_bellman(edges, [0, 3], 50)
    assert len(got) > 10


def test_sssp_round_cap_semantics(spark):
    from osm_pbf_spark.operators.graph import sssp

    # path 0-1-...-10 with weight 1 each, plus a heavy shortcut 0->10
    edges = [(i, i + 1, 1) for i in range(10)] + [(0, 10, 100)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    srcs = spark.createDataFrame([(0,)], "node long")
    got = {r.node: r.dist for r in sssp(e, srcs, max_rounds=3).collect()}
    # within 3 rounds: nodes 1..3 exact, node 10 only via the shortcut
    assert got[1] == 1 and got[3] == 3 and got[10] == 100
    assert 4 not in got or got[4] >= 4


def test_sssp_rejects_negative_weights(spark):
    from osm_pbf_spark.operators.graph import sssp

    e = spark.createDataFrame([(1, 2, -5)], "src long, dst long, w long")
    srcs = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(Exception, match="non-negative"):
        sssp(e, srcs)
