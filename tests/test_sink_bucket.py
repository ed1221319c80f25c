"""Hidden bucket partitioning (Iceberg bucket transform) on the sink."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _docs(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 100).alias("val"),
    )


def _b(v, n=8):
    return int(hashlib.md5(str(v).encode()).hexdigest()[:10], 16) % n


def test_bucket_layout_roundtrip_and_hidden(spark, tmp_path):
    sink = IcebergLikeSink(
        str(tmp_path / "t"), stats_col=None, bucket_by=("doc_id", 8)
    )
    sink.write_split(_docs(spark, 0, 500), "0000")
    sink.write_split(_docs(spark, 500, 800), "0001")
    sink.commit_snapshot()
    df = sink.read(spark)
    # the bucket column is HIDDEN: never part of the table schema
    assert df.columns == ["doc_id", "val"]
    assert sorted(r.doc_id for r in df.collect()) == list(range(800))
    # every file carries a recorded bucket matching the Python replay
    m = sink._read_manifest("0000")
    assert m["bucket_by"] == ["doc_id", 8]
    assert len(m["file_buckets"]) == len(m["files"]) >= 2


def test_bucket_pruning_exact_and_conservative(spark, tmp_path):
    sink = IcebergLikeSink(
        str(tmp_path / "t"), stats_col=None, bucket_by=("doc_id", 8)
    )
    sink.write_split(_docs(spark, 0, 2000), "0000")
    sink.commit_snapshot()
    probes = [3, 977, 1501]
    n_all = len(sink.committed_files())
    kept = sink.committed_files(bucket_keys=probes)
    assert 0 < len(kept) < n_all
    got = sorted(
        r.doc_id
        for r in sink.read(spark, bucket_keys=probes)
        .filter(F.col("doc_id").isin(probes))
        .collect()
    )
    assert got == probes
    # the pruned read contains exactly the probes' buckets
    want_buckets = {_b(v) for v in probes}
    assert {sink.bucket_of(v) for v in probes} == want_buckets
    extra = {r.doc_id for r in sink.read(spark, bucket_keys=probes).collect()}
    assert all(_b(v) in want_buckets for v in extra)


def test_bucket_resume_and_delete_compose(spark, tmp_path):
    sink = IcebergLikeSink(
        str(tmp_path / "t"), stats_col=None, bucket_by=("doc_id", 4)
    )
    sink.write_split(_docs(spark, 0, 100), "0000")
    # idempotent re-write is a no-op
    assert sink.write_split(_docs(spark, 0, 100), "0000") is None
    keys = spark.createDataFrame([(5,), (6,)], "doc_id bigint")
    sink.delete_keys(keys, ["doc_id"])
    sink.commit_snapshot()
    got = sorted(r.doc_id for r in sink.read(spark).collect())
    assert got == [i for i in range(100) if i not in (5, 6)]
    # bucket-pruned read still applies the delete
    got5 = [r.doc_id for r in sink.read(spark, bucket_keys=[5]).collect()]
    assert 5 not in got5


def test_bucket_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="bucket_by"):
        IcebergLikeSink(str(tmp_path / "x"), bucket_by=("doc_id", 0))
    sink = IcebergLikeSink(
        str(tmp_path / "t"), stats_col=None, bucket_by=("doc_id", 4)
    )
    sink.write_split(_docs(spark, 0, 100), "0000")
    sink.write_split(_docs(spark, 100, 200), "0001")
    sink.commit_snapshot()
    with pytest.raises(ValueError, match="bucket"):
        sink.compact(spark)
    with pytest.raises(ValueError, match="no bucket_by"):
        IcebergLikeSink(str(tmp_path / "u")).bucket_of(1)
