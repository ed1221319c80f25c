"""Timestamp manifest stats: normalization to epoch micros + temporal
file pruning (the day-transform use case)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink, _stat_jsonable


def test_stat_jsonable_normalization():
    assert _stat_jsonable(5) == 5 and _stat_jsonable(2.5) == 2.5
    assert _stat_jsonable("x") == "x"
    assert _stat_jsonable(True) is None  # unorderable portably
    assert _stat_jsonable(dt.datetime(1970, 1, 1)) == 0
    assert _stat_jsonable(dt.datetime(1970, 1, 2, 0, 0, 0, 7)) == 86_400_000_000 + 7
    # tz-aware collapses to the same UTC instant
    aware = dt.datetime(1970, 1, 2, 1, 0, tzinfo=dt.timezone(dt.timedelta(hours=1)))
    assert _stat_jsonable(aware) == 86_400_000_000
    assert _stat_jsonable(dt.date(1970, 1, 3)) == 2 * 86_400_000_000


def test_timestamp_stats_recorded_and_pruned(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col=None, stats_cols=["ts"])
    base = dt.datetime(2026, 3, 1)
    rows = [(i, base + dt.timedelta(hours=i)) for i in range(240)]  # 10 days
    # NTZ: written as int64 micros with parquet stats (LTZ would write
    # INT96 under Spark's default outputTimestampType — no min/max stats,
    # and the read path then conservatively keeps every file)
    df = spark.createDataFrame(rows, "event_id bigint, ts timestamp_ntz")
    sink.write_split(df.repartitionByRange(5, "ts").sortWithinPartitions("ts"), "0000")
    sink.commit_snapshot()

    m = sink._read_manifest("0000")
    # stats are plain ints (epoch micros) — JSON round-trips by construction
    for st in m["file_stats_multi"].values():
        lo, hi = st["ts"]
        assert isinstance(lo, int) and isinstance(hi, int) and lo <= hi
    json.dumps(m)

    n_all = len(sink.committed_files())
    assert n_all >= 4
    day3, day4 = base + dt.timedelta(days=3), base + dt.timedelta(days=4)
    kept = sink.committed_files(stats_ranges={"ts": (day3, day4)})
    assert 0 < len(kept) < n_all
    # pruned read + exact predicate = truth (datetime range normalized)
    got = sorted(
        r.event_id
        for r in sink.read(spark, stats_ranges={"ts": (day3, day4)})
        .filter(F.col("ts").between(day3, day4))
        .collect()
    )
    assert got == [i for i in range(240) if 72 <= i <= 96]
    # int (epoch-micros) ranges behave identically
    lo_us = _stat_jsonable(day3)
    hi_us = _stat_jsonable(day4)
    assert sink.committed_files(stats_ranges={"ts": (lo_us, hi_us)}) == kept
