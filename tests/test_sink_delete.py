"""Equality-delete (merge-on-read) lifecycle of the Iceberg-shaped
sink.

Invariants pinned here:
- delete_keys removes exactly the keyed rows from reads, without
  touching any data file (merge-on-read);
- SCOPING: rows appended AFTER a delete keep their keys even when they
  collide with deleted ones (the Iceberg v2 sequence rule, expressed
  via ``applies_to``);
- delete_where == delete_keys of the predicate's keys;
- a crash before the delete manifest commit leaves reads unchanged;
- time travel: a pre-delete snapshot still sees the rows, a post-delete
  snapshot hides them even after later appends/compactions;
- compact() applies deletes PHYSICALLY: rewritten files no longer
  contain the rows, fully-covered delete splits retire (replaced),
  partially-covered ones stay live for the splits they still scope;
- expire_snapshots vacuums retired delete files once unreferenced;
- stats_range pruning composes with deletes;
- multi-column equality keys work;
- snapshot total_rows counts data rows only.
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


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_delete_merge_on_read_and_scoping(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    sink.write_split(_docs(spark, 100, 200), "b")
    files_before = sorted(sink.committed_files())

    keys = spark.createDataFrame([(i,) for i in range(50, 160)], "doc_id long")
    m = sink.delete_keys(keys, ["doc_id"], split_id="d1")
    assert m["kind"] == "equality_deletes"
    assert m["applies_to"] == ["a", "b"]
    # merge-on-read: the data files are untouched
    assert sorted(sink.committed_files()) == files_before
    assert _ids(sink.read(spark)) == list(range(0, 50)) + list(range(160, 200))

    # rows appended AFTER the delete keep colliding keys (scoping)
    sink.write_split(_docs(spark, 50, 60), "c")
    got = _ids(sink.read(spark))
    assert got == sorted(list(range(0, 60)) + list(range(160, 200)))

    # idempotence guards
    try:
        sink.delete_keys(keys, ["doc_id"], split_id="d1")
        raise AssertionError("expected duplicate-split rejection")
    except ValueError:
        pass


def test_delete_crash_before_commit_invisible(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    keys = spark.createDataFrame([(7,)], "doc_id long")
    try:
        sink.delete_keys(keys, ["doc_id"], split_id="dx", fail_before_commit=True)
        raise AssertionError("expected injected failure")
    except RuntimeError:
        pass
    assert _ids(sink.read(spark)) == list(range(100))
    assert "dx" not in sink.completed_splits()


def test_delete_where_and_multi_column_keys(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    sink.delete_where(spark, "cell >= 900", ["doc_id"])
    want = [i for i in range(100) if (i * 7) % 1000 < 900]
    assert _ids(sink.read(spark)) == want

    # multi-column equality key: (cell, text) of two specific rows
    keys = (
        _docs(spark, 10, 12).select("cell", "text")
    )
    sink.delete_keys(keys, ["cell", "text"])
    want2 = [i for i in want if i not in (10, 11)]
    assert _ids(sink.read(spark)) == want2


def test_delete_time_travel_and_totals(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    s_pre = sink.commit_snapshot({"phase": "pre-delete"})
    assert s_pre["total_rows"] == 100
    sink.delete_keys(spark.createDataFrame([(i,) for i in range(40)], "doc_id long"), ["doc_id"])
    s_post = sink.commit_snapshot({"phase": "post-delete"})
    # total_rows counts DATA rows only (delete keys don't add)
    assert s_post["total_rows"] == 100
    sink.write_split(_docs(spark, 100, 150), "b")

    assert _ids(sink.read_snapshot(spark, s_pre["snapshot_id"])) == list(range(100))
    assert _ids(sink.read_snapshot(spark, s_post["snapshot_id"])) == list(range(40, 100))
    assert _ids(sink.read(spark)) == list(range(40, 150))


def test_compact_applies_deletes_physically(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    sink.write_split(_docs(spark, 100, 200), "b")
    sink.delete_keys(
        spark.createDataFrame([(i,) for i in range(90, 110)], "doc_id long"),
        ["doc_id"],
        split_id="d1",
    )
    want = sorted(set(range(200)) - set(range(90, 110)))
    assert _ids(sink.read(spark)) == want

    m = sink.compact(spark)
    assert m is not None
    # the delete split retires with the data splits it scoped
    assert m["replaces"] == ["a", "b", "d1"]
    assert _ids(sink.read(spark)) == want
    # physically applied: the new files contain no deleted row
    raw = spark.read.parquet(*sink.committed_files())
    assert _ids(raw) == want
    assert sink.live_splits() == {m["split_id"]}

    # vacuum reclaims the retired delete files
    sink.commit_snapshot()
    res = sink.expire_snapshots(keep_last=1)
    assert res["deleted_files"] > 0
    for rel in sink._read_manifest("d1")["files"]:
        assert not os.path.exists(os.path.join(str(tmp_path / "t"), rel))
    assert _ids(sink.read(spark)) == want


def test_partial_compaction_keeps_partially_covered_delete(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    sink.write_split(_docs(spark, 100, 200), "b")
    sink.write_split(_docs(spark, 200, 300), "c")
    # d1 scopes a+b+c; compact only a+b -> d1 must stay live for c
    sink.delete_keys(
        spark.createDataFrame([(50,), (250,)], "doc_id long"), ["doc_id"], split_id="d1"
    )
    m = sink.compact(spark, split_ids=["a", "b"])
    assert m is not None and m["replaces"] == ["a", "b"]
    assert "d1" in sink.live_splits()
    want = sorted(set(range(300)) - {50, 250})
    assert _ids(sink.read(spark)) == want
    # second compaction sweeps the rest; now d1 retires
    m2 = sink.compact(spark)
    assert "d1" in m2["replaces"]
    assert _ids(sink.read(spark)) == want


def test_delete_composes_with_stats_pruning(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    # two splits with disjoint cell ranges so pruning actually drops one
    sink.write_split(
        spark.range(0, 100).select(
            F.col("id").alias("doc_id"), F.col("id").alias("cell")
        ),
        "lo",
    )
    sink.write_split(
        spark.range(100, 200).select(
            F.col("id").alias("doc_id"), (F.col("id") + 400).alias("cell")
        ),
        "hi",
    )
    sink.delete_keys(
        spark.createDataFrame([(5,), (150,)], "doc_id long"), ["doc_id"]
    )
    pruned = sink.read(spark, stats_range=(0, 99))
    assert _ids(pruned) == [i for i in range(100) if i != 5]

    # delete-split manifests are not data: committed_files excludes them
    for f in sink.committed_files():
        assert "split=delete-" not in f


def test_chained_replaces_propagate_any_id_order(spark, tmp_path):
    """Regression (latent pre-delete bug surfaced by the partial-
    compaction test): replaces must propagate TRANSITIVELY even when
    the replacing splits' ids sort before the splits they replace and
    no snapshot has folded them yet. ids chosen so the final hop 'a'
    sorts FIRST: without propagation from the skipped middle hop 'm',
    'z' resurrects and reads double-count."""
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "z")
    sink.write_split(_docs(spark, 0, 50), "m", replaces=["z"])
    sink.write_split(_docs(spark, 0, 50), "a", replaces=["m"])
    assert sink.live_splits() == {"a"}
    assert _ids(sink.read(spark)) == list(range(50))


def test_upsert_replaces_and_appends(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 100), "a")
    # update 40..59 (new text) and insert 100..119
    upd = spark.range(40, 120).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("cell"),
        F.concat(F.lit("v2-"), F.col("id")).alias("text"),
    )
    dm, am = sink.upsert(upd, ["doc_id"], split_id="u1")
    assert dm["applies_to"] == ["a"] and am["split_id"] == "u1"
    rows = {r.doc_id: r.text for r in sink.read(spark).collect()}
    assert len(rows) == 120
    for i in range(120):
        assert rows[i] == (f"v2-{i}" if i >= 40 else f"payload-{i}")

    # a second upsert touching the SAME keys replaces the v2 rows too
    upd2 = spark.range(50, 55).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 1000).alias("cell"),
        F.concat(F.lit("v3-"), F.col("id")).alias("text"),
    )
    sink.upsert(upd2, ["doc_id"], split_id="u2")
    rows = {r.doc_id: r.text for r in sink.read(spark).collect()}
    assert len(rows) == 120 and rows[52] == "v3-52" and rows[60] == "v2-60"

    # resume path: re-running a committed upsert is a no-op
    dm3, am3 = sink.upsert(upd2, ["doc_id"], split_id="u2")
    assert dm3["split_id"] == "u2-del" and am3["split_id"] == "u2"
    assert {r.doc_id: r.text for r in sink.read(spark).collect()} == rows

    # compaction folds the whole history into plain files
    assert sink.compact(spark) is not None
    raw = {r.doc_id: r.text for r in spark.read.parquet(*sink.committed_files()).collect()}
    assert raw == rows


def test_delete_composes_with_schema_evolution(spark, tmp_path):
    """Equality deletes on an add-column-evolved table: keys may even
    live in the ADDED column — old splits read it as NULL (never
    matching a non-null key), new splits anti-join normally."""
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    sink.write_split(_docs(spark, 0, 50), "old")
    evolved = _docs(spark, 50, 100).withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, F.lit("en")).otherwise(F.lit("fr"))
    )
    sink.write_split(evolved, "new")
    sink.delete_keys(
        spark.createDataFrame([("fr",)], "lang string"), ["lang"]
    )
    got = sink.read(spark)
    assert set(got.columns) == {"doc_id", "cell", "text", "lang"}
    ids = _ids(got)
    # old rows (lang NULL) all survive; new 'fr' rows are gone
    assert ids == list(range(50)) + [i for i in range(50, 100) if i % 2 == 0]


def test_delete_guards(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    keys = spark.createDataFrame([(1,)], "doc_id long")
    # no data yet
    try:
        sink.delete_keys(keys, ["doc_id"])
        raise AssertionError("expected no-data rejection")
    except FileNotFoundError:
        pass
    sink.write_split(_docs(spark, 0, 10), "a")
    try:
        sink.delete_keys(keys, [])
        raise AssertionError("expected empty-cols rejection")
    except ValueError:
        pass
    try:
        sink.delete_keys(keys, ["nope"])
        raise AssertionError("expected missing-col rejection")
    except ValueError:
        pass
