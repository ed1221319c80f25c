"""Incremental append scan (sink.read_incremental) — the
consume-new-data primitive.

Invariants pinned here:
- a window returns exactly the rows of splits committed inside it;
- windows are time-travel-stable: later appends/compactions never
  change a past window's result;
- a compaction of pre-window data inside the window contributes no
  rows (pure rewrite);
- a compaction that folded IN-window appends raises loudly;
- a delete split inside the window raises loudly;
- an empty window returns an empty frame with the table schema;
- reversed refs raise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _docs(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("cell"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_incremental_windows_exact_and_stable(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "0000")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 100, 150), "0001")
    s2 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 150, 180), "0002")
    s3 = sink.commit_snapshot()

    assert _ids(sink.read_incremental(spark, s1["snapshot_id"], s2["snapshot_id"])) == list(range(100, 150))
    assert _ids(sink.read_incremental(spark, s1["snapshot_id"], s3["snapshot_id"])) == list(range(100, 180))
    assert _ids(sink.read_incremental(spark, s2["snapshot_id"], s3["snapshot_id"])) == list(range(150, 180))
    # sequence-number refs resolve too
    assert _ids(sink.read_incremental(spark, s1["sequence_number"], s2["sequence_number"])) == list(range(100, 150))

    # stability: compact + append, then re-ask the old window
    assert sink.compact(spark) is not None
    sink.commit_snapshot()
    sink.write_split(_docs(spark, 180, 200), "0003")
    sink.commit_snapshot()
    assert _ids(sink.read_incremental(spark, s1["snapshot_id"], s2["snapshot_id"])) == list(range(100, 150))


def test_incremental_pure_rewrite_window_is_empty(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "0000")
    sink.write_split(_docs(spark, 50, 100), "0001")
    s1 = sink.commit_snapshot()
    assert sink.compact(spark) is not None
    s2 = sink.commit_snapshot()
    inc = sink.read_incremental(spark, s1["snapshot_id"], s2["snapshot_id"])
    assert inc.count() == 0
    assert set(inc.columns) == {"doc_id", "cell", "text"}
    # empty window (same ref twice) also empty
    assert sink.read_incremental(spark, s2["snapshot_id"], s2["snapshot_id"]).count() == 0


def test_incremental_folded_appends_raise(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "0000")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 50, 100), "0001")
    sink.commit_snapshot()
    assert sink.compact(spark) is not None  # folds the in-window append
    s3 = sink.commit_snapshot()
    with pytest.raises(ValueError, match="folded in-window appends"):
        sink.read_incremental(spark, s1["snapshot_id"], s3["snapshot_id"])


def test_incremental_delete_in_window_raises(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "0000")
    s1 = sink.commit_snapshot()
    sink.delete_where(spark, "doc_id < 10", ["doc_id"])
    s2 = sink.commit_snapshot()
    with pytest.raises(ValueError, match="equality-delete"):
        sink.read_incremental(spark, s1["snapshot_id"], s2["snapshot_id"])


def test_incremental_reversed_refs_raise(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "0000")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 50, 60), "0001")
    s2 = sink.commit_snapshot()
    with pytest.raises(ValueError, match="precedes"):
        sink.read_incremental(spark, s2["snapshot_id"], s1["snapshot_id"])
