"""Batch-26 operators: kde_grid (separable binomial heatmap), ccf
(exact-integer cross-correlation), roc_auc (doubled-rank exact AUC),
rake_keywords (RAKE phrase extraction)."""

from __future__ import annotations

import math
from math import comb

import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- kde_grid


def test_kde_isolated_point_mass(spark):
    """An interior point's full window sums to 2^(4k) (separable
    binomial), and the peak cell carries C(2k,k)^2."""
    from osm_pbf_spark.operators.tiling import kde_grid

    # level 7 grid over lat [-90,90): cell centers well inside
    df = spark.createDataFrame([(0.1, 0.1)], "lat double, lon double")
    rows = kde_grid(df, level=7, k=2).collect()
    assert len(rows) == 25
    assert sum(r.w for r in rows) == 2 ** (4 * 2)
    assert max(r.w for r in rows) == comb(4, 2) ** 2


def test_kde_k0_is_raw_counts(spark):
    from osm_pbf_spark.operators.tiling import kde_grid

    pts = spark.range(500).select(
        (F.pmod(F.col("id") * 7, F.lit(100)).cast("double") - 50.0).alias("lat"),
        (F.pmod(F.col("id") * 13, F.lit(200)).cast("double") - 100.0).alias("lon"),
    )
    got = sorted(map(tuple, kde_grid(pts, level=6, k=0).collect()))
    from osm_pbf_spark.functions.cells import _quant_col

    exp = sorted(
        map(
            tuple,
            pts.select(
                _quant_col(F.col("lon"), 180.0, 360.0, 6).alias("x"),
                _quant_col(F.col("lat"), 90.0, 180.0, 6).alias("y"),
            )
            .groupBy("x", "y")
            .agg(F.count(F.lit(1)).alias("w"))
            .collect(),
        )
    )
    assert got == exp


def test_kde_matches_brute_2d_convolution(spark):
    """Separable passes == direct 2-D convolution with the outer-
    product kernel, including edge truncation at the grid border."""
    from osm_pbf_spark.functions.cells import quantize
    from osm_pbf_spark.operators.tiling import kde_grid

    pts = [
        (-89.9 + (i * 13 % 40) * 0.7, -179.9 + (i * 7 % 40) * 0.9)
        for i in range(300)
    ]
    df = spark.createDataFrame(pts, "lat double, lon double")
    k, level = 3, 5
    n = 1 << level
    got = {(r.x, r.y): r.w for r in kde_grid(df, level=level, k=k).collect()}

    cells: dict[tuple[int, int], int] = {}
    for lat, lon in pts:
        xa, ya = quantize([lat], [lon], level)
        x, y = int(xa[0]), int(ya[0])
        cells[(x, y)] = cells.get((x, y), 0) + 1
    exp: dict[tuple[int, int], int] = {}
    for (x, y), c in cells.items():
        for dx in range(-k, k + 1):
            for dy in range(-k, k + 1):
                xx, yy = x + dx, y + dy
                if 0 <= xx < n and 0 <= yy < n:
                    w = comb(2 * k, k + dx) * comb(2 * k, k + dy)
                    exp[(xx, yy)] = exp.get((xx, yy), 0) + c * w
    assert got == exp


def test_kde_no_python_stage_and_validation(spark):
    from osm_pbf_spark.operators.tiling import kde_grid

    df = spark.createDataFrame([(0.0, 0.0)], "lat double, lon double")
    plan = kde_grid(df, level=6, k=2)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Python" not in plan and "FlatMap" not in plan
    with pytest.raises(ValueError):
        kde_grid(df, level=6, k=13)
    with pytest.raises(ValueError):
        kde_grid(df, level=99, k=1)


# ---------------------------------------------------------------- ccf


def _ccf_py(xs, ys, max_lag, scale):
    qx = [math.floor(v * float(scale) + 0.5) for v in xs]
    qy = [math.floor(v * float(scale) + 0.5) for v in ys]
    out = {}
    T = len(qx)
    for h in range(-max_lag, max_lag + 1):
        pairs = [
            (qx[t], qy[t + h]) for t in range(T) if 0 <= t + h < T
        ]
        if not pairs:
            continue
        n = len(pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        sxy = sum(a * b for a, b in pairs)
        sxx = sum(a * a for a, _ in pairs)
        syy = sum(b * b for _, b in pairs)
        num = n * sxy - sx * sy
        d1 = n * sxx - sx * sx
        d2 = n * syy - sy * sy
        r = (
            float(num) / math.sqrt(float(d1) * float(d2))
            if d1 > 0 and d2 > 0
            else None
        )
        out[h] = (n, num, d1, d2, r)
    return out


def test_ccf_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.temporal import ccf

    xs = [math.sin(i / 4.0) * 30 + (i % 5) for i in range(150)]
    ys = [xs[max(0, i - 3)] * 0.8 + (i % 11) for i in range(150)]  # x leads y by ~3
    rows = [("k", i, float(xs[i]), float(ys[i])) for i in range(150)]
    df = spark.createDataFrame(rows, "key string, seq long, x double, y double")
    got = {
        r.lag: (r.n, r.num, r.d1, r.d2, r.r)
        for r in ccf(df, max_lag=4, scale=100).collect()
    }
    exp = _ccf_py(xs, ys, 4, 100)
    assert got == exp
    # the injected 3-step lead shows up as the argmax of r at h = +3
    best = max((h for h in exp if exp[h][4] is not None), key=lambda h: exp[h][4])
    assert best == 3


def test_ccf_lag0_equals_pearson_and_acf_consistency(spark):
    """ccf(x, x) restricted to h >= 1 must equal acf bit-for-bit, and
    lag 0 of ccf(x, x) is r = 1 with n = series length."""
    from osm_pbf_spark.operators.temporal import acf, ccf

    vals = [((i * 37) % 23) / 3.0 for i in range(80)]
    rows = [("k", i, float(v), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, seq long, x double, y double")
    c = {r.lag: (r.n, r.num, r.d1, r.d2, r.r) for r in ccf(df, max_lag=3).collect()}
    a = {
        r.lag: (r.n, r.num, r.d1, r.d2, r.r)
        for r in acf(
            df.select("key", "seq", F.col("x").alias("val")), max_lag=3
        ).collect()
    }
    for h in (1, 2, 3):
        assert c[h] == a[h]
    assert c[0][0] == 80 and c[0][4] == 1.0
    with pytest.raises(ValueError):
        ccf(df, max_lag=-1)


# ------------------------------------------------------------ roc_auc


def test_roc_auc_perfect_and_reversed(spark):
    from osm_pbf_spark.operators.stats import roc_auc

    rows = [(1, 10 + i) for i in range(20)] + [(0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "label int, score long")
    r = roc_auc(df, "label", "score").collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (20, 10, 1.0)
    rev = spark.createDataFrame(
        [(1 - lab, s) for lab, s in rows], "label int, score long"
    )
    assert roc_auc(rev, "label", "score").collect()[0].auc == 0.0


def test_roc_auc_matches_pair_counting(spark):
    """AUC == (wins + 0.5*ties) / (n_pos*n_neg) by brute pair count,
    with heavy score ties and groups."""
    from osm_pbf_spark.operators.stats import roc_auc

    rows = [
        (f"g{i % 2}", 1 if (i * 7) % 3 == 0 else 0, (i * 13) % 8)
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, label int, score long")
    got = {r.g: (r.n_pos, r.n_neg, r.u2, r.auc) for r in
           roc_auc(df, "label", "score", group_cols=["g"]).collect()}
    for gk in ("g0", "g1"):
        pos = [s for g, lab, s in rows if g == gk and lab == 1]
        neg = [s for g, lab, s in rows if g == gk and lab == 0]
        u2 = sum(
            2 if p > q else (1 if p == q else 0) for p in pos for q in neg
        )
        auc = float(u2) / float(2 * len(pos) * len(neg))
        assert got[gk] == (len(pos), len(neg), u2, auc), gk


def test_roc_auc_degenerate_and_guard(spark):
    from osm_pbf_spark.operators.stats import roc_auc

    only_pos = spark.createDataFrame([(1, 5), (1, 7)], "label int, score long")
    r = roc_auc(only_pos, "label", "score").collect()[0]
    assert r.n_neg == 0 and r.auc is None
    bad = spark.createDataFrame([(2, 5)], "label int, score long")
    with pytest.raises(Exception, match="must be 0/1"):
        roc_auc(bad, "label", "score").collect()


# ------------------------------------------------------ rake_keywords


def _rake_py(docs: dict[int, str], stopwords: set[str], top_k: int):
    """Independent scalar RAKE replay under the quantized-DIV spec."""
    phrases_by_doc: dict[int, list[list[str]]] = {}
    for did, text in docs.items():
        toks = [t for t in text.lower().split(" ") if t]
        runs, cur = [], []
        for t in toks:
            if t in stopwords:
                if cur:
                    runs.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            runs.append(cur)
        phrases_by_doc[did] = runs
    freq: dict[str, int] = {}
    deg: dict[str, int] = {}
    for runs in phrases_by_doc.values():
        for ph in runs:
            for w in ph:
                freq[w] = freq.get(w, 0) + 1
                deg[w] = deg.get(w, 0) + len(ph)
    ws = {w: (deg[w] * 1_000_000) // freq[w] for w in freq}
    out = {}
    for did, runs in phrases_by_doc.items():
        scored = {}
        for ph in runs:
            scored[" ".join(ph)] = (len(ph), sum(ws[w] for w in ph))
        ranked = sorted(
            scored.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:top_k]
        out[did] = [
            (p, n, s, i + 1) for i, (p, (n, s)) in enumerate(ranked)
        ]
    return out


def test_rake_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.text import RAKE_STOPWORDS, rake_keywords

    docs = {
        1: "the quick brown fox and a lazy dog in the quick brown field",
        2: "fast table scan of the table scan engine for fast table scan",
        3: "a an of to",  # stopwords only -> no phrases
        4: "singleton",
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got: dict[int, list] = {}
    for r in rake_keywords(df, top_k=2).collect():
        got.setdefault(r.doc_id, []).append(
            (r.phrase, r.n_words, r.score_q, r.rank)
        )
    for did in got:
        got[did].sort(key=lambda t: t[3])
    exp = _rake_py(docs, set(RAKE_STOPWORDS), 2)
    assert got.get(1) == exp[1]
    assert got.get(2) == exp[2]
    assert 3 not in got  # stopword-only doc emits nothing
    assert got.get(4) == exp[4]


def test_rake_multiword_phrases_outrank_frequent_words(spark):
    """RAKE's point: a co-occurring multi-word phrase beats the bare
    high-frequency word."""
    from osm_pbf_spark.operators.text import rake_keywords

    text = "deep neural network of data and deep neural network of data and data"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(rake_keywords(df, top_k=5).collect(), key=lambda r: r.rank)
    assert rows[0].phrase == "deep neural network"
    assert rows[0].n_words == 3
    with pytest.raises(ValueError):
        rake_keywords(df, top_k=0)
