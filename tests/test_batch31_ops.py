"""Batch-31 operators: ohlc_resample, raster_coarsen, mix_sources."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------- ohlc_resample


def test_ohlc_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.temporal import ohlc_resample

    base = dt.datetime(2024, 3, 1)
    rows = [
        ("k", base + dt.timedelta(minutes=(i * 37) % 300), i, float((i * 13) % 97) / 3.0)
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "key string, ts timestamp, tb long, val double")
    got = {
        (r.key, r.bucket_start): (r.open, r.high, r.low, r.close, r.n, r.sum_q)
        for r in ohlc_resample(df, "1 hour", tiebreak_col="tb").collect()
    }
    import math

    buckets: dict = {}
    for k, ts, tb, v in rows:
        b = ts.replace(minute=0, second=0)
        q = math.floor(v * 100.0 + 0.5)
        buckets.setdefault((k, b), []).append((ts, tb, q))
    exp = {}
    for kb, items in buckets.items():
        items.sort()
        qs = [q for _, _, q in items]
        exp[kb] = (items[0][2], max(qs), min(qs), items[-1][2], len(qs), sum(qs))
    assert got == exp


def test_ohlc_open_close_tiebreak(spark):
    """Two rows on the same timestamp: the tiebreak column decides
    open and close deterministically."""
    from osm_pbf_spark.operators.temporal import ohlc_resample

    t = dt.datetime(2024, 3, 1, 0, 30)
    df = spark.createDataFrame(
        [("k", t, 2, 9.0), ("k", t, 1, 3.0)],
        "key string, ts timestamp, tb long, val double",
    )
    r = ohlc_resample(df, "1 hour", tiebreak_col="tb").collect()[0]
    assert (r.open, r.close) == (300, 900)


# -------------------------------------------------------- raster_coarsen


def test_raster_coarsen_sum_and_negative_coords(spark):
    from osm_pbf_spark.operators.tiling import raster_coarsen

    cells = [(-5, -5, 10), (-4, -5, 1), (0, 0, 7), (3, 3, 2), (4, 0, 5)]
    df = spark.createDataFrame(cells, "x long, y long, w long")
    got = sorted(map(tuple, raster_coarsen(df, 2).collect()))
    # floor division: -5 >> 2 = -2; -4 >> 2 = -1; 0..3 -> 0; 4 -> 1
    assert got == [(-2, -2, 10), (-1, -2, 1), (0, 0, 9), (1, 0, 5)]


def test_raster_coarsen_min_max_and_validation(spark):
    from osm_pbf_spark.operators.tiling import raster_coarsen

    df = spark.createDataFrame(
        [(0, 0, 5), (1, 1, 9), (2, 0, 3)], "x long, y long, w long"
    )
    assert raster_coarsen(df, 1, agg="max").collect()[0][2] in (9, 3)
    mx = {tuple(r)[:2]: r.w for r in raster_coarsen(df, 1, agg="max").collect()}
    assert mx == {(0, 0): 9, (1, 0): 3}
    mn = {tuple(r)[:2]: r.w for r in raster_coarsen(df, 1, agg="min").collect()}
    assert mn == {(0, 0): 5, (1, 0): 3}
    with pytest.raises(ValueError):
        raster_coarsen(df, 0)
    with pytest.raises(ValueError):
        raster_coarsen(df, 1, agg="median")
    with pytest.raises(ValueError):
        raster_coarsen(df, 1, val_col="x")


# ----------------------------------------------------------- mix_sources


def _mix_py(rows, weights, seed=0):
    ranked = []
    by_g: dict = {}
    for gid, g in rows:
        by_g.setdefault(g, []).append(gid)
    for g, ids in by_g.items():
        order = sorted(
            ids,
            key=lambda d: (hashlib.md5(f"{seed}:{g}:{d}".encode()).hexdigest()[:8], d),
        )
        for i, d in enumerate(order, start=1):
            ranked.append((d, g, i, (i * (1 << 20)) // weights[g]))
    ranked.sort(key=lambda r: (r[3], r[1], r[2]))
    return {r[0]: (r[1], r[2], r[3], pos) for pos, r in enumerate(ranked)}


def test_mix_sources_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.packing import mix_sources

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(90)]
    weights = {"a": 4, "b": 1, "c": 2}
    df = spark.createDataFrame(rows, "doc_id long, src string")
    got = {
        r.doc_id: (r.src, r.i, r.mix_t, r.mix_pos)
        for r in mix_sources(df, "src", "doc_id", weights).collect()
    }
    assert got == _mix_py(rows, weights)


def test_mix_sources_prefix_ratios(spark):
    """Every output prefix carries the sources in ~the weight ratios
    (off by at most one stride per source)."""
    from osm_pbf_spark.operators.packing import mix_sources

    rows = [(i, "big" if i % 4 else "small") for i in range(400)]
    weights = {"big": 3, "small": 1}
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = sorted(
        mix_sources(df, "src", "doc_id", weights).collect(),
        key=lambda r: r.mix_pos,
    )
    for L in (40, 100, 200):
        n_big = sum(1 for r in out[:L] if r.src == "big")
        assert abs(n_big - L * 3 / 4) <= 2, L


def test_mix_sources_guard_and_validation(spark):
    from osm_pbf_spark.operators.packing import mix_sources

    df = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, src string")
    with pytest.raises(Exception, match="no weight for group"):
        mix_sources(df, "src", "doc_id", {"x": 1}).collect()
    with pytest.raises(ValueError):
        mix_sources(df, "src", "doc_id", {})
    with pytest.raises(ValueError):
        mix_sources(df, "src", "doc_id", {"x": 0, "y": 1})
