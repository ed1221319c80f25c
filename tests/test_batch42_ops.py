"""Batch-42: moments_profile, jsd_divergence, average_precision."""

from __future__ import annotations

import math


# --------------------------------------------------------- moments_profile


def _scalar_moments(xs):
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    s3 = sum(x * x * x for x in xs)
    s4 = sum(x * x * x * x for x in xs)
    nd, s1d, s2d, s3d, s4d = map(float, (n, s1, s2, s3, s4))
    m2 = float(n * s2 - s1 * s1) / (nd * nd)
    m3 = (nd * nd * s3d - 3.0 * nd * s1d * s2d + 2.0 * s1d * s1d * s1d) / (
        nd * nd * nd
    )
    m4 = (
        nd * nd * nd * s4d
        - 4.0 * nd * nd * s1d * s3d
        + 6.0 * nd * s1d * s1d * s2d
        - 3.0 * s1d * s1d * s1d * s1d
    ) / (nd * nd * nd * nd)
    return n, s1d / nd, m2, m3, m4


def test_moments_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import moments_profile

    xs = [(i * 7) % 90 + (3 if i % 11 == 0 else 0) for i in range(400)]
    df = spark.createDataFrame([(x,) for x in xs], "v long")
    r = moments_profile(df, "v").collect()[0]
    n, mean, m2, m3, m4 = _scalar_moments(xs)
    assert (r.n, r.mean) == (n, mean)
    assert (r.m2, r.m3, r.m4) == (m2, m3, m4)
    assert r.skewness == m3 / (math.sqrt(m2) * m2)
    assert r.kurtosis_ex == m4 / (m2 * m2) - 3.0


def test_moments_known_shapes(spark):
    from osm_pbf_spark.operators.stats import moments_profile

    # symmetric two-point mass: skew 0, kurtosis_ex = -2 exactly
    sym = spark.createDataFrame([(0,)] * 50 + [(10,)] * 50, "v long")
    r = moments_profile(sym, "v").collect()[0]
    assert r.skewness == 0.0 and r.kurtosis_ex == -2.0
    # right-skewed mass -> positive skewness
    skewed = spark.createDataFrame([(0,)] * 90 + [(100,)] * 10, "v long")
    assert moments_profile(skewed, "v").collect()[0].skewness > 1.0
    # constant column -> m2 = 0, shape stats NULL
    const = spark.createDataFrame([(5,)] * 20, "v long")
    rc = moments_profile(const, "v").collect()[0]
    assert rc.m2 == 0.0 and rc.skewness is None


# --------------------------------------------------------- jsd_divergence


def _scalar_jsd(rows):
    cats = sorted({c for c, _ in rows})
    k = len(cats)
    ca = {c: 0 for c in cats}
    cb = {c: 0 for c in cats}
    for c, s in rows:
        (ca if s == "a" else cb)[c] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    s2 = 0
    for c in cats:
        a1, b1 = ca[c] + 1, cb[c] + 1
        n1, n2 = na + k, nb + k
        cra, crb = a1 * n2, b1 * n1
        ta = (a1 / n1) * math.log(2 * cra / float(cra + crb))
        tb = (b1 / n2) * math.log(2 * crb / float(cra + crb))
        for t in (ta, tb):
            s2 += int(math.floor(t * 1e6 + 0.5)) if t >= 0 else -int(
                math.floor(-t * 1e6 + 0.5)
            )
    trunc = s2 // 2 if s2 >= 0 else -((-s2) // 2)
    return na, nb, k, trunc


def test_jsd_scalar_replay(spark):
    from osm_pbf_spark.operators.stats import jsd_divergence

    rows = [(f"c{i % 4}", "a" if i % 2 == 0 else "b") for i in range(200)] + [
        ("c9", "b")
    ] * 30  # a category one side never sees
    df = spark.createDataFrame(rows, "cat string, side string")
    r = jsd_divergence(df, "cat", "side").collect()[0]
    na, nb, k, jm = _scalar_jsd(rows)
    assert (r.n_a, r.n_b, r.n_cats) == (na, nb, k)
    assert r.jsd_micro == jm
    assert r.jsd == float(jm) / 1e6
    assert 0 < r.jsd < math.log(2.0) + 1e-9  # bounded by ln 2


def test_jsd_identical_sides_zero(spark):
    from osm_pbf_spark.operators.stats import jsd_divergence

    rows = [(f"c{i % 5}", s) for i in range(100) for s in ("a", "b")]
    df = spark.createDataFrame(rows, "cat string, side string")
    assert jsd_divergence(df, "cat", "side").collect()[0].jsd_micro == 0


# ------------------------------------------------------ average_precision


def test_ap_scalar_replay(spark):
    from osm_pbf_spark.operators.evals import average_precision

    rows = [("q1", i, 1 if i % 3 == 0 else 0, (i * 37) % 50)
            for i in range(60)] + [("q2", i, 0, i) for i in range(10)]
    df = spark.createDataFrame(rows, "query string, item long, rel long, score long")
    got = {r.query: r for r in
           average_precision(df, "query", "item", "rel", "score").collect()}
    docs = sorted(
        [(i, rel) for q, i, rel, s in rows if q == "q1"],
        key=lambda d: (-[(s) for q, i, r, s in rows
                         if q == "q1" and i == d[0]][0], d[0]),
    )
    cum, ap_u = 0, 0
    for rank, (_, rel) in enumerate(docs, start=1):
        cum += 1 if rel else 0
        if rel:
            ap_u += (cum << 40) // rank
    n_rel = sum(1 for _, rel in docs if rel)
    r1 = got["q1"]
    assert (r1.n, r1.n_rel, r1.ap_u) == (60, n_rel, ap_u)
    assert r1.ap == float(ap_u) / (float(n_rel) * float(1 << 40))
    assert got["q2"].ap is None and got["q2"].ap_u == 0


def test_ap_perfect_and_worst(spark):
    from osm_pbf_spark.operators.evals import average_precision

    # all relevant docs ranked first -> AP ~ 1 (up to 2^-40 floors)
    rows = [("q", i, 1, 100 - i) for i in range(5)] + [
        ("q", 10 + i, 0, 50 - i) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "query string, item long, rel long, score long")
    ap = average_precision(df, "query", "item", "rel", "score").collect()[0].ap
    assert abs(ap - 1.0) < 1e-9
    # k truncation: only the first k ranks contribute
    ap2 = (
        average_precision(df, "query", "item", "rel", "score", k=2)
        .collect()[0]
        .ap
    )
    assert abs(ap2 - 2.0 / 5.0) < 1e-9  # 2 hits of 5 relevant
