"""Batch-35: line_dissolve (degree-2 chain merging)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401


def _edges(spark, rows):
    return spark.createDataFrame(rows, "edge_id long, a long, b long")


def test_dissolve_simple_chain_and_junction(spark):
    from osm_pbf_spark.operators.graph import line_dissolve

    # 0-1-2-3 chain, plus a spur at node 2 (junction, degree 3)
    rows = [(0, 0, 1), (1, 1, 2), (2, 2, 3), (9, 2, 99)]
    got = {
        r.edge_id: (r.chain_id, r.n_edges)
        for r in line_dissolve(_edges(spark, rows)).collect()
    }
    # node1 links edges 0-1 (chain {0,1}); node 2 is degree 3 -> break
    assert got == {0: (0, 2), 1: (0, 2), 2: (2, 1), 9: (9, 1)}


def test_dissolve_ring_and_self_loop(spark):
    from osm_pbf_spark.operators.graph import line_dissolve

    ring = [(i, 100 + i, 100 + (i + 1) % 6) for i in range(6)]
    loop = [(50, 7, 7)]  # self-loop: its own chain, never links
    got = {
        r.edge_id: (r.chain_id, r.n_edges)
        for r in line_dissolve(_edges(spark, ring + loop)).collect()
    }
    for i in range(6):
        assert got[i] == (0, 6)  # whole ring is one closed chain
    assert got[50] == (50, 1)


def test_dissolve_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import line_dissolve

    # pseudo-random sparse graph with chains, junctions and isolates
    rows = [(i, (i * 7) % 40, (i * 7 + 3) % 40) for i in range(60)]
    rows = [(e, a, b) for e, a, b in rows]
    got = {
        r.edge_id: r.chain_id
        for r in line_dissolve(_edges(spark, rows), cc_rounds=8).collect()
    }
    # scalar replay
    inc: dict[int, list[int]] = {}
    for e, a, b in rows:
        if a == b:
            continue
        inc.setdefault(a, []).append(e)
        inc.setdefault(b, []).append(e)
    links: dict[int, set[int]] = {e: set() for e, _, _ in rows}
    for node, es in inc.items():
        if len(es) == 2 and es[0] != es[1]:
            links[es[0]].add(es[1])
            links[es[1]].add(es[0])
    exp = {}
    for e, _, _ in sorted(rows):
        if e in exp:
            continue
        stack, comp = [e], [e]
        seen = {e}
        while stack:
            u = stack.pop()
            for v in links.get(u, ()):
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    stack.append(v)
        lab = min(comp)
        for c in comp:
            exp[c] = lab
    assert got == exp
