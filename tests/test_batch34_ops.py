"""Batch-34: theil_sen robust slope, stream_stream_join left_outer."""

from __future__ import annotations

import datetime as dt
import os
from fractions import Fraction

import pytest
from pyspark.sql import functions as F


# -------------------------------------------------------------- theil_sen


def _ts_py(rows):
    slopes = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            dx = rows[j][0] - rows[i][0]
            dy = rows[j][1] - rows[i][1]
            if dx == 0:
                continue
            if dx < 0:
                dx, dy = -dx, -dy
            slopes.append(Fraction(dy, dx))
    if not slopes:
        return 0, None
    slopes.sort()
    m = slopes[(len(slopes) - 1) // 2]
    return len(slopes), m


def test_theil_sen_matches_fraction_replay(spark):
    from osm_pbf_spark.operators.stats import theil_sen

    rows = [((i * 7) % 40, 3 * ((i * 7) % 40) + (i * 13) % 11) for i in range(150)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = theil_sen(df, "x", "y").collect()[0]
    n_pairs, med = _ts_py(rows)
    assert (r.n, r.n_pairs) == (150, n_pairs)
    assert Fraction(r.slope_num, r.slope_den) == med
    assert Fraction(r.slope_num, r.slope_den) == Fraction(
        r.slope_num, r.slope_den
    )  # reduced
    assert r.slope == float(r.slope_num) / float(r.slope_den)


def test_theil_sen_robust_to_outliers_and_groups(spark):
    """A third of wild outliers barely moves the slope (OLS would)."""
    from osm_pbf_spark.operators.stats import theil_sen

    clean = [("g", x, 5 * x + 2) for x in range(30)]
    dirty = clean + [("g", x, 100000) for x in range(0, 30, 3)]
    df = spark.createDataFrame(dirty, "g string, x long, y long")
    r = theil_sen(df, "x", "y", group_cols=["g"]).collect()[0]
    assert abs(r.slope - 5.0) < 0.5


def test_theil_sen_degenerate_and_guards(spark):
    from osm_pbf_spark.operators.stats import theil_sen

    vert = spark.createDataFrame([(1, 1), (1, 2)], "x long, y long")
    r = theil_sen(vert, "x", "y").collect()[0]
    assert (r.n_pairs, r.slope_num, r.slope) == (0, None, None)
    big = spark.createDataFrame([(0, 0), (1 << 27, 1)], "x long, y long")
    with pytest.raises(Exception, match="2\\^26"):
        theil_sen(big, "x", "y").collect()
    many = spark.createDataFrame([(i, i) for i in range(10)], "x long, y long")
    with pytest.raises(Exception, match="max_n"):
        theil_sen(many, "x", "y", max_n=5).collect()


# --------------------------------------- stream_stream_join left_outer


def test_stream_join_left_outer_emits_after_horizon(spark, tmp_path):
    """Unmatched lefts emit null-joined once the watermark passes
    left_ts + upper + delay; unmatched lefts still inside the horizon
    at end-of-input stay in state (no emission)."""
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        stream_stream_join,
    )

    base = dt.datetime(2024, 3, 1)

    def land(dirname, rows, schema, mtime):
        d = str(tmp_path / ("stage_" + dirname))
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        src = str(tmp_path / dirname.split("_")[0])
        os.makedirs(src, exist_ok=True)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        os.rename(os.path.join(d, f), os.path.join(src, dirname + ".parquet"))
        os.utime(os.path.join(src, dirname + ".parquet"), (mtime, mtime))
        return src

    lschema = "k string, click_ts timestamp, click_id long"
    rschema = "k string, buy_ts timestamp, buy_id long"
    # left batch 1: one matched, one unmatched-old, one unmatched-recent
    lsrc = land(
        "l_a",
        [
            ("u", base, 1),
            ("u", base + dt.timedelta(minutes=20), 2),  # window misses the buy
            ("u", base + dt.timedelta(hours=30), 3),
        ],
        lschema,
        1_700_000_000,
    )
    rsrc = land("r_a", [("u", base + dt.timedelta(minutes=5), 10)], rschema, 1_700_000_000)
    # batch 2: a far-future right row pushes the watermark way past
    # click 1/2's horizon but NOT click 3's
    land(
        "r_b",
        [("u", base + dt.timedelta(hours=40), 11)],
        rschema,
        1_700_000_100,
    )

    j = stream_stream_join(
        stream_parquet(spark, lsrc, max_files_per_trigger=1),
        stream_parquet(spark, rsrc, max_files_per_trigger=1),
        on=["k"],
        left_ts="click_ts",
        right_ts="buy_ts",
        upper="10 minutes",
        watermark="1 hour",
        how="left_outer",
    )
    rows = run_available_now(
        j, output_mode="append", checkpoint_dir=str(tmp_path / "ck")
    ).collect()
    got = sorted((r.click_id, r.buy_id) for r in rows)
    # click 1 matched buy 10; click 2 expired unmatched -> null row;
    # click 3 still inside the horizon -> NOT emitted
    assert got == [(1, 10), (2, None)]


def test_stream_join_rejects_unknown_how(spark, tmp_path):
    from osm_pbf_spark.streaming import stream_parquet, stream_stream_join

    src = str(tmp_path / "x")
    spark.createDataFrame(
        [("u", dt.datetime(2024, 3, 1), 1)], "k string, ts timestamp, i long"
    ).write.parquet(src)
    s = stream_parquet(spark, src)
    with pytest.raises(ValueError):
        stream_stream_join(
            s, s, on=["k"], left_ts="ts", right_ts="ts", upper="1 hour",
            how="full",
        )
