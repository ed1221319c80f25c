"""Manifest-level Bloom filters: point-lookup file pruning on columns
the physical layout is NOT organized by (iceberg_like.py bloom_cols +
read(bloom_keys=...))."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _table(spark, tmp_path, **kw):
    sink = IcebergLikeSink(
        str(tmp_path / "t"),
        stats_col=None,
        bloom_cols=["uid"],
        bloom_words=64,
        bloom_depth=3,
        target_file_bytes=64 * 1024,
        **kw,
    )
    # two splits of disjoint uid ranges, several files each
    d = spark.range(0, 4000).select(
        F.col("id").alias("uid"),
        (F.col("id") % 17).alias("v"),
        F.sha1(F.col("id").cast("string")).alias("pad"),
    )
    sink.write_split(d.filter("uid < 2000").repartition(4), "0000")
    sink.write_split(d.filter("uid >= 2000").repartition(4), "0001")
    sink.commit_snapshot()
    return sink


def test_bloom_pruning_is_superset_and_prunes(spark, tmp_path):
    sink = _table(spark, tmp_path)
    n_all = len(sink.committed_files())
    assert n_all >= 8
    probes = [3, 777]  # both in split 0000
    kept = sink.committed_files(bloom_keys={"uid": probes})
    assert 0 < len(kept) < n_all  # pruned something, kept the hits
    got = sorted(
        tuple(r)
        for r in sink.read(spark, bloom_keys={"uid": probes})
        .filter(F.col("uid").isin(probes))
        .select("uid", "v")
        .collect()
    )
    want = sorted((p, p % 17) for p in probes)
    assert got == want  # superset read + exact filter == truth


def test_bloom_absent_key_prunes_everything(spark, tmp_path):
    sink = _table(spark, tmp_path)
    kept = sink.committed_files(bloom_keys={"uid": [10_000_000]})
    # no false negatives needed here — absence CAN still collide, but
    # with 2048 bits/file and 2000/8 keys per file the fp chance per
    # file is tiny; allow a couple of survivors, require real pruning
    assert len(kept) <= 2
    df = sink.read(spark, bloom_keys={"uid": [10_000_000]})
    assert df.filter(F.col("uid") == 10_000_000).count() == 0


def test_bloom_no_false_negative_across_all_keys(spark, tmp_path):
    sink = _table(spark, tmp_path)
    # EVERY present key must keep at least its own file
    for probe in range(0, 4000, 397):
        rows = (
            sink.read(spark, bloom_keys={"uid": [probe]})
            .filter(F.col("uid") == probe)
            .count()
        )
        assert rows == 1, f"bloom pruning lost uid={probe}"


def test_bloom_composes_with_deletes_and_compact(spark, tmp_path):
    sink = _table(spark, tmp_path)
    sink.delete_keys(spark.createDataFrame([(3,)], "uid bigint"), ["uid"])
    df = sink.read(spark, bloom_keys={"uid": [3, 5]}).filter(
        F.col("uid").isin([3, 5])
    )
    assert sorted(r.uid for r in df.collect()) == [5]  # delete respected
    # compaction rewrites files through write_split -> fresh blooms
    sink.compact(spark)
    kept = sink.committed_files(bloom_keys={"uid": [5]})
    assert 0 < len(kept) < len(sink.committed_files())
    assert (
        sink.read(spark, bloom_keys={"uid": [5]}).filter(F.col("uid") == 5).count()
        == 1
    )


def test_bloom_rejects_bad_params(tmp_path):
    with pytest.raises(ValueError):
        IcebergLikeSink(str(tmp_path / "x"), bloom_cols=["a"], bloom_words=0)
