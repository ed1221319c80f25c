"""Batch-43: k_truss, hits_scores."""

from __future__ import annotations

import pytest


def _truss_py(edges, k, rounds):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))

    def support(e):
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
        sup = {}
        for a, b in e:
            sup[(a, b)] = len(adj.get(a, set()) & adj.get(b, set()))
        return sup

    e = und
    for _ in range(rounds):
        sup = support(e)
        e = {ab for ab, s in sup.items() if s >= k - 2}
    return {
        (a, b): s for (a, b), s in support(e).items() if a < b and s > 0
    }


def test_ktruss_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import k_truss

    # K5 (a solid 4-truss) + a pendant path + one extra triangle
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    extra = [(4, 10), (10, 11), (11, 12), (20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(k5 + extra, "src long, dst long")
    got = {(r.a, r.b): r.support for r in k_truss(df, 4, rounds=3).collect()}
    want = _truss_py(k5 + extra, 4, 3)
    assert got == want
    # the K5 survives with support 3 on every edge
    assert all(got[(i, j)] == 3 for i, j in k5)
    # pendant path and the lone triangle (support 1 < 2) are gone
    assert all((a, b) not in got for a, b in [(4, 10), (20, 21)])


def test_ktruss_rejects_small_k(spark):
    from osm_pbf_spark.operators.graph import k_truss

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be >= 3"):
        k_truss(df, 2)


def _hits_py(edges, iters, scale):
    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in e} | {b for _, b in e})
    a = {n: scale for n in nodes}
    h = dict(a)
    for _ in range(iters):
        hraw = {n: 0 for n in nodes}
        for s, d in e:
            hraw[s] += a[d]
        q = max(max(hraw.values()) // scale, 1)
        h = {n: hraw[n] // q for n in nodes}
        araw = {n: 0 for n in nodes}
        for s, d in e:
            araw[d] += h[s]
        q = max(max(araw.values()) // scale, 1)
        a = {n: araw[n] // q for n in nodes}
    return h, a


def test_hits_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import hits_scores

    edges = [(i % 9, (i * 5 + 2) % 9) for i in range(40)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in
           hits_scores(df, iterations=3).collect()}
    h, a = _hits_py(edges, 3, 10**12)
    assert got == {n: (h[n], a[n]) for n in h}


def test_hits_star_graph_roles(spark):
    from osm_pbf_spark.operators.graph import hits_scores

    # spokes all point at the center: center = top authority (and the
    # spokes are the hubs); center's hub score starves to 0
    edges = [(i, 99) for i in range(1, 8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r for r in hits_scores(df, iterations=2).collect()}
    assert got[99].auth == max(r.auth for r in got.values())
    assert got[99].hub == 0
    assert all(got[i].auth == 0 for i in range(1, 8))
    hubs = {got[i].hub for i in range(1, 8)}
    assert len(hubs) == 1 and hubs.pop() > 0  # symmetric spokes tie
