"""Batch-25 operators: acf (exact-integer autocorrelation),
voronoi_assign (nearest-site labeling, broadcast vs two-round parity),
feature_hash (hashing-trick vectorizer replay), streaming session
windows (gap semantics + cross-batch merge), stream-stream join
(batch parity over closed input)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- acf


def _acf_py(vals: list[float], max_lag: int, scale: int):
    """Independent scalar replay of the acf spec: quantize, exact int
    pair sums, one fixed IEEE chain at the end."""
    q = [math.floor(v * float(scale) + 0.5) for v in vals]
    out = {}
    for h in range(1, max_lag + 1):
        pairs = [(q[i], q[i + h]) for i in range(len(q) - h)]
        if not pairs:
            continue
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
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


def test_acf_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.temporal import acf

    series = {
        "sine": [math.sin(i / 3.0) * 40 + (i % 7) for i in range(200)],
        "ramp": [0.25 * i for i in range(50)],
    }
    rows = [
        (k, i, float(v)) for k, vals in series.items() for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "key string, seq long, val double")
    got = {
        (r.key, r.lag): (r.n, r.num, r.d1, r.d2, r.r)
        for r in acf(df, max_lag=4, scale=100).collect()
    }
    for k, vals in series.items():
        exp = _acf_py(vals, 4, 100)
        for h, tup in exp.items():
            g = got[(k, h)]
            assert g[:4] == tup[:4], (k, h, g, tup)
            # final chain must be bit-identical (same fixed IEEE ops)
            assert g[4] == tup[4], (k, h, g[4], tup[4])


def test_acf_constant_series_r_null(spark):
    from osm_pbf_spark.operators.temporal import acf

    df = spark.createDataFrame(
        [("c", i, 7.0) for i in range(20)], "key string, seq long, val double"
    )
    rows = acf(df, max_lag=2).collect()
    assert len(rows) == 2
    assert all(r.r is None and r.d1 == 0 and r.d2 == 0 for r in rows)


def test_acf_single_shuffle_plan(spark):
    """All lags ride ONE Window node over one sort — no self-join, and
    exactly one Exchange before the final agg's partial/final pair."""
    from osm_pbf_spark.operators.temporal import acf

    df = spark.createDataFrame(
        [("k", i, float(i % 9)) for i in range(50)],
        "key string, seq long, val double",
    )
    plan = acf(df, max_lag=5)._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan


def test_acf_rejects_bad_lag(spark):
    from osm_pbf_spark.operators.temporal import acf

    df = spark.createDataFrame([("k", 0, 1.0)], "key string, seq long, val double")
    with pytest.raises(ValueError):
        acf(df, max_lag=0)


# ------------------------------------------------------- voronoi_assign


def _vor_points(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 7919, F.lit(1000)).cast("double") / 50.0).alias("lat"),
        (F.pmod(F.col("id") * 104729, F.lit(1000)).cast("double") / 50.0).alias(
            "lon"
        ),
    )


def _vor_sites(spark, n=25):
    return spark.range(n).select(
        F.col("id").alias("station_id"),
        (F.pmod(F.col("id") * 37, F.lit(100)).cast("double") / 5.0).alias("s_lat"),
        (F.pmod(F.col("id") * 61, F.lit(100)).cast("double") / 5.0).alias("s_lon"),
    )


def test_voronoi_broadcast_equals_two_round(spark):
    from osm_pbf_spark.operators.distance import voronoi_assign

    pts, st = _vor_points(spark), _vor_sites(spark)
    b = sorted(
        map(tuple, voronoi_assign(pts, st).select("point_id", "site_id").collect())
    )
    t = sorted(
        map(
            tuple,
            voronoi_assign(pts, st, method="two_round", level=4)
            .select("point_id", "site_id")
            .collect(),
        )
    )
    assert b == t and len(b) == 2000


def test_voronoi_tie_breaks_to_min_site(spark):
    from osm_pbf_spark.operators.distance import voronoi_assign

    pts = spark.createDataFrame([(1, 0.0, 0.0)], "doc_id long, lat double, lon double")
    st = spark.createDataFrame(
        [(9, 0.0, 2.0), (3, 0.0, -2.0), (5, 2.0, 0.0)],
        "station_id long, s_lat double, s_lon double",
    )
    rows = voronoi_assign(pts, st).collect()
    assert [(r.point_id, r.site_id, r.d2) for r in rows] == [(1, 3, 4.0)]


def test_voronoi_rejects_unknown_method(spark):
    from osm_pbf_spark.operators.distance import voronoi_assign

    with pytest.raises(ValueError):
        voronoi_assign(_vor_points(spark, 1), _vor_sites(spark, 1), method="nope")


# -------------------------------------------------------- feature_hash


def _fh_py(text: str, dim: int):
    out: dict[int, int] = {}
    for t in text.split(" "):
        if not t:
            continue
        h = hashlib.md5(t.encode()).hexdigest()
        idx = int(h[:10], 16) % dim
        s = 1 - 2 * (int(h[10], 16) % 2)
        out[idx] = out.get(idx, 0) + s
    return out


def test_feature_hash_matches_scalar_replay(spark):
    from osm_pbf_spark.operators.text import feature_hash

    docs = [
        (1, "the quick brown fox jumps over the lazy dog the end"),
        (2, "  spaced   out  tokens "),
        (3, "singleton"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {}
    for r in feature_hash(df, dim=64).collect():
        got.setdefault(r.doc_id, {})[r.idx] = r.weight
    for did, text in docs:
        assert got.get(did, {}) == _fh_py(text, 64), did


def test_feature_hash_keeps_cancelled_zero_rows(spark):
    """Two opposite-sign tokens colliding into one bucket sum to 0 —
    the row is KEPT (the count is part of the spec). Tokens found by
    searching the md5 spec, not hand-picked magic."""
    from osm_pbf_spark.operators.text import feature_hash

    dim = 8
    pos = neg = None
    i = 0
    while pos is None or neg is None:
        t = f"tok{i}"
        h = hashlib.md5(t.encode()).hexdigest()
        if int(h[:10], 16) % dim == 0:
            if int(h[10], 16) % 2 == 0 and pos is None:
                pos = t
            elif int(h[10], 16) % 2 == 1 and neg is None:
                neg = t
        i += 1
    df = spark.createDataFrame([(1, f"{pos} {neg}")], "doc_id long, text string")
    rows = feature_hash(df, dim=dim).collect()
    assert [(r.doc_id, r.idx, r.weight) for r in rows] == [(1, 0, 0)]


def test_feature_hash_rejects_bad_dim(spark):
    from osm_pbf_spark.operators.text import feature_hash

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        feature_hash(df, dim=0)


# --------------------------------------------------- stream_sessionize


def test_stream_session_gap_boundary(spark, tmp_path):
    """An event exactly `gap` after the previous one MERGES; strictly
    greater splits. End = last ts + gap."""
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_sessionize,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        ("u", base),
        ("u", base + dt.timedelta(minutes=10)),  # == gap: merges
        ("u", base + dt.timedelta(minutes=20, seconds=1)),  # > gap: new session
    ]
    src = str(tmp_path / "ev")
    spark.createDataFrame(rows, "user_id string, ts timestamp").write.parquet(src)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in run_available_now(
            stream_sessionize(stream_parquet(spark, src), "ts", ["user_id"], "10 minutes")
        ).collect()
    )
    assert got == [
        ("u", base, base + dt.timedelta(minutes=20), 2),
        (
            "u",
            base + dt.timedelta(minutes=20, seconds=1),
            base + dt.timedelta(minutes=30, seconds=1),
            1,
        ),
    ]


def test_stream_session_cross_batch_merge(spark, tmp_path):
    """A session split across two micro-batches is ONE output row —
    the state store merges adjacent partial sessions."""
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_sessionize,
    )

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    src = str(tmp_path / "src")
    os.makedirs(src)

    def land(name, rows, mtime):
        d = str(tmp_path / ("stage_" + name))
        spark.createDataFrame(rows, "user_id string, ts timestamp").coalesce(
            1
        ).write.parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        os.rename(os.path.join(d, f), os.path.join(src, name + ".parquet"))
        os.utime(os.path.join(src, name + ".parquet"), (mtime, mtime))

    land("a", [("u", base), ("u", base + dt.timedelta(minutes=5))], 1_700_000_000)
    land("b", [("u", base + dt.timedelta(minutes=12))], 1_700_000_100)

    got = run_available_now(
        stream_sessionize(
            stream_parquet(spark, src, max_files_per_trigger=1),
            "ts",
            ["user_id"],
            "10 minutes",
        )
    ).collect()
    assert [(r.user_id, r.session_start, r.session_end, r.n_events) for r in got] == [
        ("u", base, base + dt.timedelta(minutes=22), 3)
    ]


def test_stream_session_equals_batch_islands(spark, tmp_path):
    """Complete-mode drain == batch gaps-and-islands sessionization."""
    from pyspark.sql import Window

    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_sessionize,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (f"u{i % 7}", base + dt.timedelta(seconds=(i * 977) % 90000))
        for i in range(500)
    ]
    src = str(tmp_path / "ev")
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    df.write.parquet(src)
    gap_s = 3600

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in run_available_now(
            stream_sessionize(stream_parquet(spark, src), "ts", ["user_id"], "1 hour")
        ).collect()
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    exp = sorted(
        map(
            tuple,
            df.withColumn(
                "nw",
                F.when(
                    F.lag("ts").over(w).isNull()
                    | (
                        F.unix_micros(F.to_utc_timestamp("ts", "UTC"))
                        - F.unix_micros(F.to_utc_timestamp(F.lag("ts").over(w), "UTC"))
                        > gap_s * 1_000_000
                    ),
                    1,
                ).otherwise(0),
            )
            .withColumn("g", F.sum("nw").over(w))
            .groupBy("user_id", "g")
            .agg(
                F.min("ts").alias("session_start"),
                (F.max("ts") + F.expr("INTERVAL 1 HOUR")).alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .select("user_id", "session_start", "session_end", "n_events")
            .collect(),
        )
    )
    assert got == exp and len(got) > 0


# -------------------------------------------------- stream_stream_join


def test_stream_stream_join_equals_batch(spark, tmp_path):
    """An availableNow drain over closed input == the plain batch join
    (every on-time pair emitted exactly once)."""
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_stream_join,
    )

    base = dt.datetime(2024, 3, 1)
    clicks = [
        (f"u{i % 11}", i, base + dt.timedelta(seconds=(i * 631) % 40000))
        for i in range(300)
    ]
    buys = [
        (f"u{i % 11}", 1000 + i, base + dt.timedelta(seconds=(i * 887) % 40000))
        for i in range(200)
    ]
    cp, bp = str(tmp_path / "c"), str(tmp_path / "b")
    cdf = spark.createDataFrame(clicks, "user_id string, click_id long, click_ts timestamp")
    bdf = spark.createDataFrame(buys, "user_id string, buy_id long, buy_ts timestamp")
    cdf.write.parquet(cp)
    bdf.write.parquet(bp)

    j = stream_stream_join(
        stream_parquet(spark, cp),
        stream_parquet(spark, bp),
        on=["user_id"],
        left_ts="click_ts",
        right_ts="buy_ts",
        upper="30 minutes",
        watermark="2 hours",
    )
    got = sorted(
        (r.user_id, r.click_id, r.buy_id)
        for r in run_available_now(j, output_mode="append").collect()
    )
    exp = sorted(
        map(
            tuple,
            cdf.join(bdf, "user_id")
            .filter(
                (F.col("buy_ts") >= F.col("click_ts"))
                & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
            )
            .select("user_id", "click_id", "buy_id")
            .collect(),
        )
    )
    assert got == exp and len(exp) > 0
