"""Batch-22 operators: common-neighbor link prediction, integer-
recurrence EWMA smoothing, syntactic PII scan/mask. Scalar replays,
partition-invariance, plan-shape pins — the established discipline."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _no_python(plan: str) -> bool:
    return (
        "ArrowEvalPython" not in plan
        and "BatchEvalPython" not in plan
        and "InPandas" not in plan
    )


# -------------------------------------------------------------- link_predict

def _link_predict_py(edges: list[tuple[int, int]], min_common: int):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj: dict[int, set[int]] = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in und:
                continue
            nc = len(adj[u] & adj[v])
            if nc >= min_common:
                j = nc / (len(adj[u]) + len(adj[v]) - nc)
                out[(u, v)] = (nc, len(adj[u]), len(adj[v]), j)
    return out


def test_link_predict_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import link_predict

    # deterministic graph with hubs, a triangle-free star, duplicate
    # and reversed input edges, and self loops (all must be ignored)
    edges = []
    for i in range(200):
        a = (i * i * 7 + i) % 40
        b = (i * 13 + 5) % 40
        edges.append((a, b))
    edges += [(1, 1), (2, 3), (3, 2), (2, 3)]  # self loop + dup + reverse
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r.u, r.v): (r.n_common, r.deg_u, r.deg_v, r.jaccard)
        for r in link_predict(df, min_common=2).collect()
    }
    assert got == _link_predict_py(edges, 2)


def test_link_predict_excludes_existing_edges_and_is_native(spark):
    from osm_pbf_spark.operators.graph import link_predict

    # square 0-1-2-3-0: diagonals (0,2) and (1,3) are the only
    # predictions, each with both corners as common neighbors
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    out = link_predict(df, min_common=1)
    rows = {(r.u, r.v): r for r in out.collect()}
    assert set(rows) == {(0, 2), (1, 3)}
    assert rows[(0, 2)].n_common == 2 and rows[(0, 2)].jaccard == 1.0
    assert _no_python(_plan(out))


# ---------------------------------------------------------------------- ewma

def _ewma_py(rows, num, den, sc):
    by_key: dict[int, list] = {}
    for k, s, v in rows:
        by_key.setdefault(k, []).append((s, v))
    out = {}
    for k, items in by_key.items():
        y = 0
        for i, (s, v) in enumerate(sorted(items)):
            y = v * sc if i == 0 else (num * v * sc + (den - num) * y) // den
            out[(k, s)] = (v, y, y / sc)
    return out


def test_ewma_matches_scalar_recurrence(spark):
    from osm_pbf_spark.operators.temporal import ewma

    rows = [
        (k, s, (k * 31 + s * s * 17) % 1000) for k in range(6) for s in range(40)
    ]
    df = spark.createDataFrame(rows, "key long, seq long, val long")
    got = {
        (r.key, r.seq): (r.val, r.ewma_q, r.ewma)
        for r in ewma(df, 3, 10).collect()
    }
    assert got == _ewma_py(rows, 3, 10, 1_000_000)


def test_ewma_partition_invariant_and_plan_shape(spark):
    from osm_pbf_spark.operators.temporal import ewma

    rows = [(k, s, (k + s * 7) % 50) for k in range(4) for s in range(25)]
    df = spark.createDataFrame(rows, "key long, seq long, val long")
    a = sorted(map(tuple, ewma(df, 1, 4).collect()))
    b = sorted(map(tuple, ewma(df.repartition(7), 1, 4).collect()))
    assert a == b
    plan = _plan(ewma(df, 1, 4))
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_ewma_rejects_bad_alpha_and_negative_values(spark):
    from osm_pbf_spark.operators.temporal import ewma

    df = spark.createDataFrame([(1, 1, -5)], "key long, seq long, val long")
    with pytest.raises(ValueError):
        ewma(df, 0, 10)
    with pytest.raises(Exception, match="non-negative"):
        ewma(df, 3, 10).collect()


def test_ewma_alpha_one_is_identity_scaled(spark):
    from osm_pbf_spark.operators.temporal import ewma

    rows = [(0, s, s * 3) for s in range(10)]
    df = spark.createDataFrame(rows, "key long, seq long, val long")
    for r in ewma(df, 1, 1).collect():
        assert r.ewma_q == r.val * 1_000_000


# ------------------------------------------------------------------ pii_scan

def _pii_py(text: str):
    from osm_pbf_spark.operators.text import _PII_PATTERNS

    counts, cur = [], text
    for _, pat, tag in _PII_PATTERNS:
        counts.append(len(re.findall(pat, cur)))
        cur = re.sub(pat, tag, cur)
    return (*counts, sum(counts), cur)


def test_pii_scan_matches_python_re(spark):
    # Python `re` is a THIRD regex engine next to Spark's Java regex
    # and the oracle's RE2 — the portable-subset claim checked thrice
    from osm_pbf_spark.operators.text import pii_scan

    texts = [
        "write bob.smith+spam@mail.example.org or call +44-201-5550199",
        "two mails a@b.io c%x@d-e.net one ip 192.168.0.1",
        "no pii here, just 3.14 and v1.2.3 and a@@b and +1 555",
        "edge 999.999.999.999 still counts as syntactic ipv4",
        "email inside url http://u:p@host.com/path stays an email",
        "",
        "+1-555-0100 then +999-123-456789 then +12-000 111",
        "ip chain 1.2.3.4.5.6 overlap check",
        "mail a.b@c.de ip 10.0.0.1 phone +7-999-1234567 all three",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = pii_scan(df)
    got = {
        r.doc_id: (r.n_email, r.n_phone, r.n_ipv4, r.n_pii, r.masked)
        for r in out.collect()
    }
    assert got == {i: _pii_py(t) for i, t in enumerate(texts)}
    plan = _plan(out)
    assert _no_python(plan)
    assert "Exchange" not in plan  # map-only projection
