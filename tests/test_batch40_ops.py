"""Batch-40: bipartite_project, textrank_keywords, holt_linear."""

from __future__ import annotations

import pytest


# -------------------------------------------------------- bipartite_project


def test_bipartite_scalar_replay(spark):
    from osm_pbf_spark.operators.graph import bipartite_project

    rows = [(d, f"t{t}") for d in range(20) for t in range(10)
            if (d * 7 + t * 3) % 4 != 0]
    df = spark.createDataFrame(rows, "l long, r string")
    got = {
        (r.left_a, r.left_b): r.weight
        for r in bipartite_project(df, "l", "r").collect()
    }
    adj: dict = {}
    for d, t in set(rows):
        adj.setdefault(t, set()).add(d)
    want: dict = {}
    for t, ds in adj.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                want[(ds[i], ds[j])] = want.get((ds[i], ds[j]), 0) + 1
    assert got == want


def test_bipartite_degree_cap_and_min_weight(spark):
    from osm_pbf_spark.operators.graph import bipartite_project

    # hub token shared by all 30 docs; rare token by docs 0..2
    rows = [(d, "hub") for d in range(30)] + [(d, "rare") for d in range(3)]
    df = spark.createDataFrame(rows, "l long, r string")
    capped = bipartite_project(df, "l", "r", max_right_degree=5).collect()
    # hub (degree 30) dropped; only the 3 rare-pairs remain
    assert {(r.left_a, r.left_b) for r in capped} == {(0, 1), (0, 2), (1, 2)}
    uncapped = bipartite_project(df, "l", "r", min_weight=2).collect()
    # weight 2 requires sharing BOTH tokens -> pairs within docs 0..2
    assert {(r.left_a, r.left_b) for r in uncapped} == {
        (0, 1), (0, 2), (1, 2)
    }
    # duplicate (l, r) rows must not inflate weights
    dup = spark.createDataFrame(rows + rows, "l long, r string")
    again = {
        (r.left_a, r.left_b): r.weight
        for r in bipartite_project(dup, "l", "r").collect()
    }
    assert again[(0, 1)] == 2  # hub + rare, not 4


# ------------------------------------------------------ textrank_keywords


def test_textrank_hub_word_ranks_first(spark):
    from osm_pbf_spark.operators.text import textrank_keywords

    docs = [(i, f"w{i} center w{i + 50} center w{i + 100}")
            for i in range(20)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank_keywords(df, top_k=5, iterations=4).collect()
    assert out[0].token == "center"  # adjacent to every other word
    assert out[0].rank > out[1].rank
    # determinism: identical rerun gives identical rows
    again = textrank_keywords(df, top_k=5, iterations=4).collect()
    assert [(r.token, r.rank) for r in out] == [
        (r.token, r.rank) for r in again
    ]


def test_textrank_tie_break_by_token(spark):
    from osm_pbf_spark.operators.text import textrank_keywords

    # perfectly symmetric 2-cliques -> equal ranks, token-asc order
    docs = [(1, "aa bb"), (2, "cc dd")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = textrank_keywords(df, top_k=4).collect()
    assert [r.token for r in out] == ["aa", "bb", "cc", "dd"]
    assert len({r.rank for r in out}) == 1


# ----------------------------------------------------------- holt_linear


def _tdiv(a: int, d: int) -> int:
    return -((-a) // d) if a < 0 else a // d


def _scalar_holt(xs, an, ad, bn, bd, sc):
    out = []
    for i, x in enumerate(xs):
        if i == 0:
            l_cur, b_cur = x * sc, 0
        else:
            l_prev, b_prev = out[-1]
            l_cur = _tdiv(an * x * sc + (ad - an) * (l_prev + b_prev), ad)
            b_cur = _tdiv(bn * (l_cur - l_prev) + (bd - bn) * b_prev, bd)
        out.append((l_cur, b_cur))
    return out


def test_holt_scalar_replay(spark):
    from osm_pbf_spark.operators.temporal import holt_linear

    # rising then falling series -> the trend term goes NEGATIVE,
    # exercising the truncating-division branch
    xs = [10, 20, 30, 45, 60, 50, 30, 10, 5, 0]
    rows = [(1, i, x) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "key long, seq long, val long")
    got = sorted(
        holt_linear(df, 3, 10, 2, 10).collect(), key=lambda r: r.seq
    )
    want = _scalar_holt(xs, 3, 10, 2, 10, 1_000_000)
    assert [(r.level_q, r.trend_q) for r in got] == want
    assert any(b < 0 for _, b in want)  # the negative branch fired
    for r, (l, b) in zip(got, want):
        assert r.forecast_q == l + b
        assert r.level == float(l) / 1e6 and r.trend == float(b) / 1e6


def test_holt_tracks_linear_ramp(spark):
    from osm_pbf_spark.operators.temporal import holt_linear

    # a pure ramp x_i = 100*i: trend must converge near 100*scale
    rows = [(1, i, 100 * i) for i in range(60)]
    df = spark.createDataFrame(rows, "key long, seq long, val long")
    last = sorted(
        holt_linear(df, 5, 10, 3, 10).collect(), key=lambda r: r.seq
    )[-1]
    assert abs(last.trend - 100.0) < 5.0
    assert abs(last.level - 100.0 * 59) < 100.0


def test_holt_rejects_negative_values(spark):
    from osm_pbf_spark.operators.temporal import holt_linear

    df = spark.createDataFrame(
        [(1, 0, 5), (1, 1, -3)], "key long, seq long, val long"
    )
    with pytest.raises(Exception, match="non-negative"):
        holt_linear(df, 3, 10, 2, 10).collect()
