"""Sink maintenance protocol: compaction (``replaces``), snapshot
history + time travel, and snapshot expiry / vacuum.

Invariants pinned here:
- compaction is atomic and lossless: identical rows before/after, file
  count reduced, replaced splits stay committed (resume-safe) but not
  live;
- a crash before the compaction manifest commit leaves the table
  byte-identical to readers;
- time travel reads exactly the files a snapshot froze, across later
  appends AND compactions;
- expire_snapshots deletes ONLY data files referenced by no retained
  snapshot and no live split, never touches manifests (resume_plan is
  vacuum-proof), and makes expired time travel fail loudly;
- post-compaction manifests carry tight stats again (global sort on
  stats_col), so stats_range pruning keeps working.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _docs(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("cell"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.select("doc_id", "cell", "text").collect())


def test_compact_lossless_and_atomic(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    for i in range(4):
        sink.write_split(_docs(spark, i * 100, (i + 1) * 100).coalesce(2), f"{i:04d}")
    sink.commit_snapshot()
    before = _rows(sink.read(spark))
    n_files_before = len(sink.committed_files())
    assert n_files_before >= 4

    # injected crash before the manifest rename: readers see no change
    try:
        sink.compact(spark, fail_before_commit=True)
        raise AssertionError("expected injected failure")
    except RuntimeError:
        pass
    assert _rows(sink.read(spark)) == before
    assert sink.live_splits() == {f"{i:04d}" for i in range(4)}

    m = sink.compact(spark)
    assert m is not None and m["replaces"] == [f"{i:04d}" for i in range(4)]
    assert _rows(sink.read(spark)) == before
    assert len(sink.committed_files()) < n_files_before
    # replaced splits: committed (resume-safe) but not live
    assert sink.live_splits() == {m["split_id"]}
    assert sink.resume_plan([f"{i:04d}" for i in range(4)]) == []
    # compacting a single live split is a no-op, not an error
    assert sink.compact(spark) is None
    # compacting an already-replaced split is an error
    try:
        sink.compact(spark, split_ids=["0001"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_compact_restores_stats_clustering(spark, tmp_path):
    """Inputs whose cell ranges fully interleave -> compacted files carry
    tight disjoint ranges again, and stats_range pruning still agrees
    with the exact predicate."""
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell",
                           target_file_bytes=64 * 1024)
    for i in range(3):  # every split spans the whole cell space
        sink.write_split(_docs(spark, i * 1000, (i + 1) * 1000).coalesce(1), f"{i:04d}")
    m = sink.compact(spark)
    stats = list(m["file_stats"].values())
    assert stats, "compacted files must carry stats"
    spans = sorted((s["min"], s["max"]) for s in stats)
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, "global sort must make file ranges disjoint"
    full = sink.read(spark).filter("cell between 100 and 200")
    pruned = sink.read(spark, stats_range=(100, 200)).filter(
        "cell between 100 and 200"
    )
    assert pruned.count() == full.count() > 0


def test_snapshot_history_and_time_travel(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 100, 250), "b")
    s2 = sink.commit_snapshot()
    sink.compact(spark)
    s3 = sink.commit_snapshot()

    assert [s["sequence_number"] for s in sink.snapshots()] == [1, 2, 3]
    assert s2["parent_snapshot_id"] == s1["snapshot_id"]
    assert s3["parent_snapshot_id"] == s2["snapshot_id"]
    assert s3["splits"] != s2["splits"] and len(s3["splits"]) == 1

    exp_s1 = _rows(_docs(spark, 0, 100))
    exp_all = _rows(_docs(spark, 0, 250))
    # by id and by sequence number; compaction/appends don't perturb
    assert _rows(sink.read_snapshot(spark, s1["snapshot_id"])) == exp_s1
    assert _rows(sink.read_snapshot(spark, 1)) == exp_s1
    assert _rows(sink.read_snapshot(spark, 2)) == exp_all
    assert _rows(sink.read_snapshot(spark, 3)) == exp_all
    assert _rows(sink.read(spark)) == exp_all
    try:
        sink.read_snapshot(spark, "nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_expire_snapshots_vacuums_only_unreferenced(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    for i in range(3):
        sink.write_split(_docs(spark, i * 100, (i + 1) * 100), f"{i:04d}")
    sink.commit_snapshot()
    before = _rows(sink.read(spark))
    replaced_files = [
        f for f in sink.committed_files()
    ]
    sink.compact(spark)
    sink.commit_snapshot()

    # snapshot 1 still references the replaced files -> nothing deleted
    rep = sink.expire_snapshots(keep_last=2)
    assert rep["deleted_files"] == 0
    assert all(os.path.exists(f) for f in replaced_files)

    rep = sink.expire_snapshots(keep_last=1)
    assert rep["deleted_files"] == len(replaced_files)
    assert not any(os.path.exists(f) for f in replaced_files)
    # current table unaffected; resume still sees the old splits as done
    assert _rows(sink.read(spark)) == before
    assert sink.resume_plan(["0000", "0001", "0002"]) == []
    assert len(sink.snapshots()) == 1
    # expired time travel fails loudly
    try:
        sink.read_snapshot(spark, 1)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # idempotent
    assert sink.expire_snapshots(keep_last=1)["deleted_files"] == 0
