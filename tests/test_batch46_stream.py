"""Batch-46: stream_ewma (stateful streaming EWMA, batch parity)."""

from __future__ import annotations

import os

import pytest


def _rows(n):
    return [(i % 4, i, (i * 37) % 500) for i in range(n)]


def test_stream_ewma_single_batch_equals_batch(spark, tmp_path):
    from osm_pbf_spark.operators.temporal import ewma
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_ewma,
        stream_parquet,
    )

    src = str(tmp_path / "src")
    df = spark.createDataFrame(_rows(200), "key long, seq long, val long")
    df.coalesce(1).write.parquet(src)
    sdf = stream_parquet(spark, src)
    got = sorted(
        run_available_now(
            stream_ewma(sdf, 3, 10), output_mode="append"
        ).collect(),
        key=lambda r: (r.key, r.seq),
    )
    want = sorted(ewma(df, 3, 10).collect(), key=lambda r: (r.key, r.seq))
    assert [(r.key, r.seq, r.ewma_q) for r in got] == [
        (r.key, r.seq, r.ewma_q) for r in want
    ]


def test_stream_ewma_cross_batch_carries_state(spark, tmp_path):
    """Two mtime-ordered files drained one per micro-batch must equal
    the batch operator over the union — the state (last_y) carries."""
    from osm_pbf_spark.operators.temporal import ewma
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_ewma,
        stream_parquet,
    )

    all_rows = _rows(120)
    first, second = all_rows[:60], all_rows[60:]
    src = str(tmp_path / "src")
    os.makedirs(src)
    for name, rows, mtime in [
        ("a", first, 1_700_000_000),
        ("b", second, 1_700_000_100),
    ]:
        d = str(tmp_path / name)
        spark.createDataFrame(
            rows, "key long, seq long, val long"
        ).coalesce(1).write.parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        dst = os.path.join(src, f"{name}_{f}")
        os.rename(os.path.join(d, f), dst)
        os.utime(dst, (mtime, mtime))
    sdf = stream_parquet(spark, src, max_files_per_trigger=1)
    got = sorted(
        run_available_now(
            stream_ewma(sdf, 3, 10),
            output_mode="append",
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect(),
        key=lambda r: (r.key, r.seq),
    )
    batch = spark.createDataFrame(all_rows, "key long, seq long, val long")
    want = sorted(ewma(batch, 3, 10).collect(), key=lambda r: (r.key, r.seq))
    assert [(r.key, r.seq, r.ewma_q) for r in got] == [
        (r.key, r.seq, r.ewma_q) for r in want
    ]


def test_stream_ewma_out_of_order_batch_raises(spark, tmp_path):
    """A later batch whose seqs precede the state's last_seq must fail
    loudly, not silently break parity."""
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_ewma,
        stream_parquet,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    for name, rows, mtime in [
        ("a", [(1, 100, 5), (1, 101, 6)], 1_700_000_000),
        ("b", [(1, 50, 7)], 1_700_000_100),  # goes BACKWARD
    ]:
        d = str(tmp_path / name)
        spark.createDataFrame(
            rows, "key long, seq long, val long"
        ).coalesce(1).write.parquet(d)
        f = [x for x in os.listdir(d) if x.endswith(".parquet")][0]
        dst = os.path.join(src, f"{name}_{f}")
        os.rename(os.path.join(d, f), dst)
        os.utime(dst, (mtime, mtime))
    sdf = stream_parquet(spark, src, max_files_per_trigger=1)
    with pytest.raises(Exception, match="out-of-order|StreamingQuery"):
        run_available_now(
            stream_ewma(sdf, 3, 10),
            output_mode="append",
            checkpoint_dir=str(tmp_path / "ckpt"),
        ).collect()


def test_stream_ewma_rejects_negative(spark, tmp_path):
    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_ewma,
        stream_parquet,
    )

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 0, 5), (1, 1, -2)], "key long, seq long, val long"
    ).coalesce(1).write.parquet(src)
    sdf = stream_parquet(spark, src)
    with pytest.raises(Exception, match="non-negative|StreamingQuery"):
        run_available_now(stream_ewma(sdf, 3, 10), output_mode="append")
