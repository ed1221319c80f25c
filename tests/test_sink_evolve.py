"""Schema evolution (add-column) on the Iceberg-shaped sink: union
schema from manifests only (no footer scans), NULL back-fill for old
splits, snapshot-frozen schemas for time travel, evolution-safe
compaction, loud refusal of type changes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def test_sink_add_column_evolution(spark, tmp_path):
    sink = IcebergLikeSink(str(tmp_path / "t"), stats_col="cell")
    a = spark.createDataFrame(
        [(i, i * 10, f"d{i}") for i in range(20)], "cell int, doc_id long, text string"
    )
    sink.write_split(a, "000")
    s1 = sink.commit_snapshot()
    b = spark.createDataFrame(
        [(100 + i, 1000 + i, f"e{i}", "en") for i in range(10)],
        "cell int, doc_id long, text string, lang string",
    )
    sink.write_split(b, "001")
    sink.commit_snapshot()

    cur = sink.read(spark)
    assert cur.columns == ["cell", "doc_id", "text", "lang"]
    rows = {r.doc_id: r.lang for r in cur.collect()}
    assert all(rows[i * 10] is None for i in range(20))  # NULL back-fill
    assert rows[1005] == "en"

    # the union schema comes from manifests alone
    ts = sink.table_schema()
    assert ts is not None and [f.name for f in ts.fields] == cur.columns

    # time travel sees the schema AS OF the snapshot
    old = sink.read_snapshot(spark, s1["snapshot_id"])
    assert "lang" not in old.columns and old.count() == 20

    # manifest-stats pruning composes with the union schema
    assert sink.read(spark, stats_range=(100, 200)).count() == 10

    # compaction must carry the evolved column through the rewrite
    assert sink.compact(spark) is not None
    sink.commit_snapshot()
    after = sink.read(spark)
    assert after.columns == ["cell", "doc_id", "text", "lang"]
    assert after.count() == 30
    assert after.where(F.col("lang").isNotNull()).count() == 10

    # a TYPE change is not add-column evolution -> loud failure
    c = spark.createDataFrame([(1, 1, "x", 5)], "cell int, doc_id long, text string, lang int")
    sink.write_split(c, "002")
    with pytest.raises(ValueError, match="add-column only"):
        sink.read(spark)
