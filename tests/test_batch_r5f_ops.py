"""Batch r5-F: stream_upsert (CDC apply), attribution_last_touch."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------- stream CDC
def test_stream_upsert_last_write_wins(spark, tmp_path):
    import os

    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink
    from osm_pbf_spark.streaming import stream_parquet, stream_upsert

    # two changelog files landed in order (mtime drives file order)
    def land(name, rows, mtime):
        d = str(tmp_path / "stage" / name)
        spark.createDataFrame(
            rows, "k long, ver long, payload string"
        ).coalesce(1).write.parquet(d)
        src = str(tmp_path / "cdc")
        os.makedirs(src, exist_ok=True)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        os.rename(os.path.join(d, f), os.path.join(src, name + ".parquet"))
        os.utime(os.path.join(src, name + ".parquet"), (mtime, mtime))
        return src

    land("b1", [(1, 1, "a1"), (2, 1, "b1"), (1, 2, "a2")], 1_700_000_000)
    src = land("b2", [(2, 3, "b2"), (3, 1, "c1")], 1_700_000_100)

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="k")
    q = stream_upsert(
        stream_parquet(spark, src, max_files_per_trigger=1),
        sink,
        ["k"],
        checkpoint_dir=str(tmp_path / "ck"),
        dedup_order_col="ver",
    )
    q.awaitTermination()
    got = {(r.k): (r.ver, r.payload) for r in sink.read(spark).collect()}
    # within-batch dedup kept (1, ver 2); batch 2 replaced key 2
    assert got == {1: (2, "a2"), 2: (3, "b2"), 3: (1, "c1")}


def test_stream_upsert_rejects_silent_dups(spark, tmp_path):
    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink
    from osm_pbf_spark.streaming import stream_parquet, stream_upsert

    src = str(tmp_path / "cdc2")
    spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y")], "k long, ver long, payload string"
    ).write.parquet(src)
    sink = IcebergLikeSink(str(tmp_path / "t2"), stats_col="k")
    q = stream_upsert(
        stream_parquet(spark, src),
        sink,
        ["k"],
        checkpoint_dir=str(tmp_path / "ck2"),
        dedup_order_col=None,
    )
    with pytest.raises(Exception, match="duplicate keys"):
        q.awaitTermination()


# ----------------------------------------------------- last-touch attr
def test_attribution_last_touch_windows_and_ties(spark):
    from osm_pbf_spark.operators.temporal import attribution_last_touch

    t0 = dt.datetime(2024, 5, 1, 12, 0, 0)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        # user 1: touch 10 @0, touch 11 @30, conv 100 @40 -> 11
        (1, 10, m(0), "click"), (1, 11, m(30), "click"),
        (1, 100, m(40), "purchase"),
        # user 2: touch @0, conv @200 -> outside 60-minute lookback
        (2, 20, m(0), "click"), (2, 200, m(200), "purchase"),
        # user 3: organic (no touch at all)
        (3, 300, m(10), "purchase"),
        # user 4: two touches at the SAME ts -> larger id wins
        (4, 40, m(5), "click"), (4, 41, m(5), "click"),
        (4, 400, m(6), "purchase"),
        # user 5: touch exactly AT the conversion ts counts
        (5, 50, m(7), "click"), (5, 500, m(7), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        r.conv_id: r.touch_id
        for r in attribution_last_touch(
            df,
            F.col("event_type") == "purchase",
            F.col("event_type") == "click",
            "60 minutes",
        ).collect()
    }
    assert got == {100: 11, 200: None, 300: None, 400: 41, 500: 50}
