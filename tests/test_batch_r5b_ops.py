"""Batch r5-B: bh_fdr, fisher_exact, flow_accumulation, ams_f2."""

from __future__ import annotations

import hashlib
from fractions import Fraction
from math import comb

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------- BH-FDR
def _bh_replay(ps, anum, aden):
    m = len(ps)
    s = sorted(ps)
    cutoff = None
    for i, p in enumerate(s, start=1):
        if p * m * aden <= i * anum * 1_000_000:
            cutoff = p
    if cutoff is None:
        return m, 0, None
    return m, sum(1 for p in ps if p <= cutoff), cutoff


def test_bh_fdr_global_matches_replay(spark):
    from osm_pbf_spark.operators.stats import bh_fdr

    ps = [((i * 37) % 1009) * 991 % 1_000_001 for i in range(4000)]
    df = spark.createDataFrame([(p,) for p in ps], "p_ppm long")
    (r,) = bh_fdr(df, alpha_num=5, alpha_den=100).collect()
    assert (r.m, r.n_discoveries, r.p_cutoff_ppm) == _bh_replay(ps, 5, 100)
    assert r.n_discoveries > 0


def test_bh_fdr_grouped_and_none_found(spark):
    from osm_pbf_spark.operators.stats import bh_fdr

    rows = [("a", p) for p in (1000, 2000, 900000)] + [
        ("b", p) for p in (999000, 999500)
    ]
    df = spark.createDataFrame(rows, "g string, p_ppm long")
    got = {
        r.g: (r.m, r.n_discoveries, r.p_cutoff_ppm)
        for r in bh_fdr(df, group_cols=["g"], alpha_num=5, alpha_den=100).collect()
    }
    assert got["a"] == (3,) + _bh_replay([1000, 2000, 900000], 5, 100)[1:]
    assert got["b"] == (2, 0, None)
    bad = spark.createDataFrame([(2_000_000,)], "p_ppm long")
    with pytest.raises(Exception, match="ppm"):
        bh_fdr(bad).collect()


# ------------------------------------------------------- Fisher exact
def _fisher_replay(a, b, c, d):
    r1, r2, c1, n = a + b, c + d, a + c, a + b + c + d
    obs = comb(r1, a) * comb(r2, c1 - a)
    num = sum(
        w
        for k in range(max(0, c1 - r2), min(r1, c1) + 1)
        if (w := comb(r1, k) * comb(r2, c1 - k)) <= obs
    )
    return float(Fraction(num, comb(n, c1)))


def test_fisher_exact_known_and_replay(spark):
    from osm_pbf_spark.operators.stats import fisher_exact

    rows = [(1, 9, 11, 3), (3, 0, 0, 3), (5, 5, 5, 5), (0, 0, 0, 0)]
    df = spark.createDataFrame(rows, "a long, b long, c long, d long")
    got = {(r.a, r.b, r.c, r.d): (r.p_two, r.odds_ratio)
           for r in fisher_exact(df).collect()}
    # the textbook tea-tasting-class table
    assert got[(1, 9, 11, 3)][0] == _fisher_replay(1, 9, 11, 3)
    assert abs(got[(1, 9, 11, 3)][0] - 0.002759) < 1e-4
    assert got[(3, 0, 0, 3)][0] == _fisher_replay(3, 0, 0, 3) == 0.1
    assert got[(5, 5, 5, 5)][0] == 1.0
    assert got[(5, 5, 5, 5)][1] == 1.0
    assert got[(3, 0, 0, 3)][1] is None          # zero cell -> no OR
    assert got[(0, 0, 0, 0)][0] is None          # empty table -> NULL
    big = spark.createDataFrame([(3000, 1, 1, 1)], "a long, b long, c long, d long")
    with pytest.raises(Exception, match="max_n"):
        fisher_exact(big).collect()


# -------------------------------------------------- flow accumulation
def test_flow_accumulation_valley_grid(spark):
    from osm_pbf_spark.operators.tiling import flow_accumulation, flow_direction

    # 5x3 tilted valley: z = 10*x + |y-1|*2 -> everything drains to
    # (0, 1); column x receives its own 3 cells + everything upstream
    cells = [(x, y, 10 * x + abs(y - 1) * 2) for x in range(5) for y in range(3)]
    fd = flow_direction(spark.createDataFrame(cells, "x long, y long, z long"))
    got = {(r.x, r.y): r.acc for r in flow_accumulation(fd).collect()}
    assert len(got) == 15
    assert got[(0, 1)] == 15                     # the outlet drains all
    assert got[(4, 0)] == 1 and got[(4, 2)] == 1  # ridge corners
    # conservation: every cell's acc = 1 + sum of direct upstream accs
    dirs = {(r.x, r.y): r.flow_dir for r in fd.collect()}
    offs = {0: (1, 0), 1: (1, -1), 2: (0, -1), 3: (-1, -1),
            4: (-1, 0), 5: (-1, 1), 6: (0, 1), 7: (1, 1)}
    for c in got:
        ups = [
            u for u, d in dirs.items()
            if d >= 0 and (u[0] + offs[d][0], u[1] + offs[d][1]) == c
        ]
        assert got[c] == 1 + sum(got[u] for u in ups), c


def test_flow_accumulation_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.tiling import flow_accumulation, flow_direction

    cells = [
        (x, y, ((x * 13 + y * 7) % 19) + ((x + y) % 3) * 5 + x + y)
        for x in range(8)
        for y in range(8)
    ]
    df = spark.createDataFrame(cells, "x long, y long, z long")
    fd = flow_direction(df)
    dirs = {(r.x, r.y): r.flow_dir for r in fd.collect()}
    offs = {0: (1, 0), 1: (1, -1), 2: (0, -1), 3: (-1, -1),
            4: (-1, 0), 5: (-1, 1), 6: (0, 1), 7: (1, 1)}
    down = {}
    for (x, y), d in dirs.items():
        if d >= 0:
            dx, dy = offs[d]
            down[(x, y)] = (x + dx, y + dy)
    want = {}

    def acc_of(c):
        if c in want:
            return want[c]
        total = 1 + sum(acc_of(u) for u, v in down.items() if v == c)
        want[c] = total
        return total

    for c in dirs:
        acc_of(c)
    got = {(r.x, r.y): r.acc for r in flow_accumulation(fd).collect()}
    assert got == want


# ------------------------------------------------------------- AMS F2
def test_ams_f2_exact_signs_and_merge(spark):
    from osm_pbf_spark.operators.sketch import ams_f2

    vals = [f"v{i % 37}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "tok string")
    got = {r.sketch: (r.x, r.x2) for r in ams_f2(df, "tok", n_sketches=8).collect()}
    sig = lambda s, v: 1 if int(
        hashlib.md5(f"{s}:{v}".encode()).hexdigest()[0], 16) % 2 == 1 else -1
    for s in range(8):
        x = sum(sig(s, v) for v in vals)
        assert got[s] == (x, x * x)
    # mergeability: sketches of two halves sum to the whole
    h1 = {r.sketch: r.x for r in
          ams_f2(df.limit(250), "tok", n_sketches=8).collect()}
    # deterministic split: first 250 rows by construction order isn't
    # stable under limit; split by value instead
    d1 = df.where(F.col("tok") < "v3")
    d2 = df.where(~(F.col("tok") < "v3"))
    m1 = {r.sketch: r.x for r in ams_f2(d1, "tok", n_sketches=8).collect()}
    m2 = {r.sketch: r.x for r in ams_f2(d2, "tok", n_sketches=8).collect()}
    for s in range(8):
        assert m1.get(s, 0) + m2.get(s, 0) == got[s][0]
    _ = h1
