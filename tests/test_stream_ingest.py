"""stream_ingest: continuous ingestion into the Iceberg-shaped sink —
per-micro-batch atomic split commits, retry idempotence, and restart
from checkpoint picking up only new files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _write_file(spark, src, lo, hi, name):
    d = src + "_stage"
    spark.createDataFrame(
        [(i, (i * 37) % 1000) for i in range(lo, hi)], "doc_id long, cell long"
    ).coalesce(1).write.mode("overwrite").parquet(d)
    f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
    os.makedirs(src, exist_ok=True)
    os.rename(os.path.join(d, f), os.path.join(src, name))


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_stream_ingest_commits_per_batch_and_restarts(spark, tmp_path):
    from osm_pbf_spark.streaming import stream_ingest, stream_parquet

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_file(spark, src, 0, 50, "a.parquet")
    _write_file(spark, src, 50, 80, "b.parquet")
    os.utime(os.path.join(src, "a.parquet"), (1_700_000_000,) * 2)
    os.utime(os.path.join(src, "b.parquet"), (1_700_000_100,) * 2)

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    schema = spark.read.parquet(src).schema
    sdf = stream_parquet(spark, src, schema=schema, max_files_per_trigger=1)
    q = stream_ingest(sdf, sink, ckpt)
    q.awaitTermination()

    # one split per micro-batch, batch-id named, all rows landed
    splits = sorted(sink.completed_splits())
    assert splits == ["stream-00000000", "stream-00000001"]
    assert _ids(sink.read(spark)) == list(range(80))

    # restart with the SAME checkpoint + one new file: only the new
    # file is processed, as a new batch id — committed data untouched
    _write_file(spark, src, 80, 95, "c.parquet")
    os.utime(os.path.join(src, "c.parquet"), (1_700_000_200,) * 2)
    sdf2 = stream_parquet(spark, src, schema=schema, max_files_per_trigger=1)
    q2 = stream_ingest(sdf2, sink, ckpt)
    q2.awaitTermination()
    assert sorted(sink.completed_splits()) == [
        "stream-00000000", "stream-00000001", "stream-00000002",
    ]
    assert _ids(sink.read(spark)) == list(range(95))


def test_stream_ingest_batch_retry_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch id — Spark's at-least-once
    contract after a foreachBatch failure) must not duplicate rows:
    the sink's split commit is idempotent by id."""
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    bdf = spark.createDataFrame(
        [(i, i % 7) for i in range(40)], "doc_id long, cell long"
    )
    sink.write_split(bdf, "stream-00000004", lineage={"stream_batch": 4})
    # the retry: same batch id, same (or re-computed) data
    sink.write_split(bdf, "stream-00000004", lineage={"stream_batch": 4})
    assert sorted(sink.completed_splits()) == ["stream-00000004"]
    assert _ids(sink.read(spark)) == list(range(40))


def test_stream_ingest_feeds_incremental_reads(spark, tmp_path):
    """Streamed splits participate in the sink's CDC windows like any
    batch append."""
    from osm_pbf_spark.streaming import stream_ingest, stream_parquet

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_file(spark, src, 0, 30, "a.parquet")
    _write_file(spark, src, 30, 45, "b.parquet")
    os.utime(os.path.join(src, "a.parquet"), (1_700_000_000,) * 2)
    os.utime(os.path.join(src, "b.parquet"), (1_700_000_100,) * 2)

    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    s0 = sink.commit_snapshot()
    schema = spark.read.parquet(src).schema
    q = stream_ingest(
        stream_parquet(spark, src, schema=schema, max_files_per_trigger=1),
        sink,
        ckpt,
    )
    q.awaitTermination()
    s1 = sink.commit_snapshot()
    assert _ids(sink.read_incremental(spark, s0["snapshot_id"], s1["snapshot_id"])) == list(range(45))
