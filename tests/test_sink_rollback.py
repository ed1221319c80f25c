"""rollback_to: manifest-state restore + new snapshot.

Invariants pinned here:
- after rollback the CURRENT read equals the target snapshot's rows
  exactly, across later appends, equality deletes, and compactions;
- the rollback is DURABLE: a later append + commit builds on the
  rolled-back state (post-target splits stay atticed, they do not
  resurrect);
- abandoned snapshots still time-travel (their manifest lists and data
  files are untouched);
- unknown / expired snapshot ids raise KeyError.
"""

from __future__ import annotations

import os

import pytest
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


def test_rollback_restores_target_state(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "base")
    s1 = sink.commit_snapshot({"step": "base"})
    want = _rows(sink.read(spark))

    sink.write_split(_docs(spark, 100, 150), "extra")
    sink.commit_snapshot({"step": "extra"})
    sink.delete_keys(_docs(spark, 0, 10).select("doc_id"), ["doc_id"], "del-1")
    s3 = sink.commit_snapshot({"step": "delete"})
    assert _rows(sink.read(spark)) != want

    rb = sink.rollback_to(s1["snapshot_id"])
    assert rb["properties"]["rollback_of"] == s1["snapshot_id"]
    assert set(rb["properties"]["atticed_splits"]) >= {"extra"}
    assert _rows(sink.read(spark)) == want
    # abandoned snapshot still time-travels (manifest list untouched)
    assert len(_rows(sink.read_snapshot(spark, s3["snapshot_id"]))) == 100 + 50 - 10


def test_rollback_is_durable_against_future_commits(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "base")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 50, 80), "later")
    sink.commit_snapshot()
    sink.rollback_to(s1["snapshot_id"])
    # a post-rollback append + commit must NOT resurrect 'later'
    sink.write_split(_docs(spark, 200, 220), "fresh")
    snap = sink.commit_snapshot()
    assert "later" not in snap["splits"]
    assert _rows(sink.read(spark)) == _rows(
        _docs(spark, 0, 50).unionAll(_docs(spark, 200, 220))
    )
    # the atticed manifest survives on disk for forensics
    attic_root = str(tmp_path / "t" / "_rollback")
    atticed = [
        f
        for _, _, fs in os.walk(attic_root)
        for f in fs
        if f == "split-later.json"
    ]
    assert atticed


def test_rollback_by_sequence_number_and_unknown_raises(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 30), "base")
    sink.commit_snapshot()
    sink.write_split(_docs(spark, 30, 60), "more")
    sink.commit_snapshot()
    rb = sink.rollback_to(1)  # sequence number form
    assert len(_rows(sink.read(spark))) == 30
    assert rb["sequence_number"] == 3
    with pytest.raises(KeyError, match="not in retained history"):
        sink.rollback_to("nope")


def test_rollback_across_compaction(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    for i in range(3):
        sink.write_split(_docs(spark, i * 40, (i + 1) * 40), f"{i:02d}")
    s1 = sink.commit_snapshot()
    want = _rows(sink.read(spark))
    assert sink.compact(spark) is not None
    sink.commit_snapshot()
    rb = sink.rollback_to(s1["snapshot_id"])
    assert _rows(sink.read(spark)) == want
    # the original (pre-compaction) splits are live again
    assert set(rb["splits"]) == {f"{i:02d}" for i in range(3)}


def test_roll_forward_restores_atticed_manifests(spark, tmp_path):
    """ADVICE r3: rollback to s1, then rollback_to a LATER retained
    snapshot (roll-forward) — the second rollback must restore the
    atticed split manifests so the live set equals the target exactly,
    never silently commit a partial state."""
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "base")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 50, 90), "later")
    s2 = sink.commit_snapshot()
    want_s2 = _rows(sink.read(spark))

    sink.rollback_to(s1["snapshot_id"])
    assert len(_rows(sink.read(spark))) == 50

    rf = sink.rollback_to(s2["snapshot_id"])  # roll FORWARD
    assert "later" in rf["splits"]
    assert "later" in rf["properties"]["restored_splits"]
    assert _rows(sink.read(spark)) == want_s2

    # and back again: ping-pong keeps both states exact
    sink.rollback_to(s1["snapshot_id"])
    assert len(_rows(sink.read(spark))) == 50


def test_roll_forward_with_missing_manifest_raises(spark, tmp_path):
    """If a needed manifest is gone from BOTH the live set and the
    attic, rollback_to must refuse loudly (KeyError), not commit a
    snapshot missing splits."""
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "base")
    s1 = sink.commit_snapshot()
    sink.write_split(_docs(spark, 50, 90), "later")
    s2 = sink.commit_snapshot()
    sink.rollback_to(s1["snapshot_id"])
    # destroy the atticed manifest out-of-band
    for root, _, fs in os.walk(str(tmp_path / "t" / "_rollback")):
        for f in fs:
            if f == "split-later.json":
                os.remove(os.path.join(root, f))
    with pytest.raises(KeyError, match="no manifest"):
        sink.rollback_to(s2["snapshot_id"])
