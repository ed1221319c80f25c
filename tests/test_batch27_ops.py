"""Batch-27 operators: seasonal_decompose (classical additive),
ripley_k (point-pattern K function), repeated_ngram_spans (exact
substring-level dedup spans)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- seasonal_decompose


def _seasonal_py(vals, period, scale):
    q = [math.floor(v * float(scale) + 0.5) for v in vals]
    p, h, n = period, period // 2, len(vals)
    even = p % 2 == 0
    rows = {}
    t2p = []
    for t in range(n):
        if t - h < 0 or t + h >= n:
            t2p.append(None)
            continue
        s = sum(q[t - h : t + h + 1])
        t2p.append(2 * s - q[t - h] - q[t + h] if even else 2 * s)
    by_phase = {}
    for t in range(n):
        if t2p[t] is not None:
            by_phase.setdefault(t % p, []).append(2 * p * q[t] - t2p[t])
    for t in range(n):
        ph = t % p
        dn = by_phase.get(ph, [])
        s_num = sum(dn) if dn else None
        s_cnt = len(dn)
        trend = float(t2p[t]) / float(2 * p) if t2p[t] is not None else None
        seasonal = (
            float(s_num) / float(s_cnt * 2 * p) if s_cnt > 0 else None
        )
        residual = (
            (float(q[t]) - trend) - seasonal
            if trend is not None and seasonal is not None
            else None
        )
        rows[t] = (ph, q[t], t2p[t], s_num, s_cnt, trend, seasonal, residual)
    return rows


@pytest.mark.parametrize("period", [7, 4])
def test_seasonal_matches_scalar_replay(spark, period):
    from osm_pbf_spark.operators.temporal import seasonal_decompose

    vals = [
        10.0 * math.sin(2 * math.pi * (i % period) / period) + 0.3 * i + (i % 3)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        [("k", i, float(v)) for i, v in enumerate(vals)],
        "key string, seq long, val double",
    )
    got = {
        r.seq: (r.phase, r.q, r.trend2p, r.s_num, r.s_cnt, r.trend, r.seasonal, r.residual)
        for r in seasonal_decompose(df, period=period).collect()
    }
    exp = _seasonal_py(vals, period, 100)
    assert got == exp


def test_seasonal_phase_constancy_and_validation(spark):
    """Seasonal index is identical for every row of the same phase,
    and edge rows (incomplete window) carry NULL trend."""
    from osm_pbf_spark.operators.temporal import seasonal_decompose

    df = spark.createDataFrame(
        [("k", i, float((i % 5) * 3 + 1)) for i in range(40)],
        "key string, seq long, val double",
    )
    rows = seasonal_decompose(df, period=5).collect()
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r.phase, set()).add(r.seasonal)
    assert all(len(v) == 1 for v in by_phase.values())
    assert sum(1 for r in rows if r.trend is None) == 4  # h=2 at each end
    with pytest.raises(ValueError):
        seasonal_decompose(df, period=1)


# ------------------------------------------------------------ ripley_k


def test_ripley_matches_brute_pairs(spark):
    from osm_pbf_spark.operators.spatialstats import ripley_k

    pts = [
        (i, -30.0 + (i * 13 % 60) * 0.83, -60.0 + (i * 7 % 120) * 0.71)
        for i in range(400)
    ]
    df = spark.createDataFrame(pts, "doc_id long, lat double, lon double")
    radii = [0.5, 1.0, 1.75, 3.0]
    area = 7200.0
    got = {r.r: (r.n_pairs, r.n, r.k_hat) for r in
           ripley_k(df, radii=radii, area=area).collect()}
    n = len(pts)
    for r in radii:
        cnt = sum(
            1
            for i in range(n)
            for j in range(i + 1, n)
            if (pts[i][1] - pts[j][1]) ** 2 + (pts[i][2] - pts[j][2]) ** 2
            <= r * r
        )
        k_hat = float(cnt) * 2.0 * area / float(n * (n - 1))
        assert got[r] == (cnt, n, k_hat), r
    # monotone in r
    rs = sorted(got)
    assert all(got[rs[i]][0] <= got[rs[i + 1]][0] for i in range(len(rs) - 1))


def test_ripley_degenerate_and_validation(spark):
    from osm_pbf_spark.operators.spatialstats import ripley_k

    one = spark.createDataFrame([(1, 0.0, 0.0)], "doc_id long, lat double, lon double")
    r = ripley_k(one, radii=[1.0], area=100.0).collect()[0]
    assert (r.n_pairs, r.n, r.k_hat) == (0, 1, None)
    with pytest.raises(ValueError):
        ripley_k(one, radii=[], area=1.0)
    with pytest.raises(ValueError):
        ripley_k(one, radii=[-1.0], area=1.0)


# -------------------------------------------------- repeated_ngram_spans


def _spans_py(docs: dict[int, str], k: int):
    wins = []
    for did in docs:
        toks = [t for t in docs[did].split(" ") if t]
        for i in range(len(toks) - k + 1):
            wins.append((did, i, " ".join(toks[i : i + k])))
    from collections import Counter

    cnt = Counter(w[2] for w in wins)
    first = {}
    for did, pos, key in sorted(wins):
        first.setdefault(key, (did, pos))
    dups = {}
    for did, pos, key in wins:
        if cnt[key] > 1 and first[key] != (did, pos):
            dups.setdefault(did, []).append(pos)
    out = []
    for did, ps in dups.items():
        ps.sort()
        start, prev, nw = ps[0], ps[0], 1
        for p in ps[1:]:
            if p > prev + k:
                out.append((did, start, prev + k, nw))
                start, nw = p, 0
            prev = p
            nw += 1
        out.append((did, start, prev + k, nw))
    return sorted(out)


def test_ngram_spans_cross_doc_copy(spark):
    """A full copy of a doc becomes ONE maximal span covering it; the
    keeper (min doc_id) emits nothing."""
    from osm_pbf_spark.operators.dedup import repeated_ngram_spans

    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(1, text), (2, text)], "doc_id long, text string")
    rows = repeated_ngram_spans(df, k=8).collect()
    assert [(r.doc_id, r.start, r.end, r.n_windows) for r in rows] == [(2, 0, 20, 13)]


def test_ngram_spans_within_doc_repeat_and_touch_merge(spark):
    from osm_pbf_spark.operators.dedup import repeated_ngram_spans

    # 'a b c d' repeats at pos 0 and 4 (k=4: touching spans merge)
    df = spark.createDataFrame(
        [(1, "a b c d a b c d x y z q")], "doc_id long, text string"
    )
    rows = repeated_ngram_spans(df, k=4).collect()
    assert [(r.doc_id, r.start, r.end, r.n_windows) for r in rows] == [(1, 4, 8, 1)]


def test_ngram_spans_matches_scalar_replay(spark):
    """Small-vocab corpus (forced window collisions) vs the pure-
    Python replay, including partial overlaps and multi-span docs."""
    from osm_pbf_spark.operators.dedup import repeated_ngram_spans

    docs = {
        did: " ".join(f"t{(did * 31 + j * 7) % 5}" for j in range(30))
        for did in range(12)
    }
    docs[20] = "short doc"
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.start, r.end, r.n_windows)
        for r in repeated_ngram_spans(df, k=6).collect()
    )
    assert got == _spans_py(docs, 6)
    assert len(got) > 0
    with pytest.raises(ValueError):
        repeated_ngram_spans(df, k=0)


def test_ngram_spans_no_python_stage(spark):
    from osm_pbf_spark.operators.dedup import repeated_ngram_spans

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        repeated_ngram_spans(df, k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Python" not in plan and "FlatMap" not in plan
