"""Kill-injection resume test (SURVEY.md §5.2.5, BASELINE.md resumability).

Crash after a split's data is written but before its manifest commits;
restart must produce the identical final table with no duplicate
doc_ids — exactly-once via the atomic manifest protocol.
"""

from __future__ import annotations

import pytest

from osm_pbf_spark.plans.ingest import ingest_pbf, read_documents
from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def test_kill_and_resume_identical(spark, fixtures_dir, tmp_path):
    pbf = f"{fixtures_dir}/multiblob.osm.pbf"

    # uninterrupted reference run
    ref_root = str(tmp_path / "ref")
    ingest_pbf(spark, pbf, ref_root, blobs_per_split=1)
    want = sorted(
        (r["doc_id"], r["cell"]) for r in read_documents(spark, ref_root).collect()
    )

    # killed run: crash before split 000002's commit
    killed_root = str(tmp_path / "killed")
    with pytest.raises(RuntimeError, match="injected failure"):
        ingest_pbf(spark, pbf, killed_root, blobs_per_split=1, fail_before_split="000002")
    sink = IcebergLikeSink(killed_root)
    assert sink.completed_splits() == {"000000", "000001"}
    # orphan parquet exists on disk but is invisible to readers
    import os
    assert os.path.isdir(os.path.join(killed_root, "data", "split=000002"))
    partial = read_documents(spark, killed_root)
    assert partial.count() < len(want)

    # resume: only the missing splits are reprocessed
    ingest_pbf(spark, pbf, killed_root, blobs_per_split=1)
    got = sorted(
        (r["doc_id"], r["cell"]) for r in read_documents(spark, killed_root).collect()
    )
    assert got == want
    # no duplicate doc_ids even without the dedup guard
    raw = IcebergLikeSink(killed_root).read(spark)
    assert raw.count() == raw.select("doc_id").distinct().count()


def test_rerun_is_noop(spark, fixtures_dir, tmp_path):
    pbf = f"{fixtures_dir}/minimal.osm.pbf"
    root = str(tmp_path / "t")
    s1 = ingest_pbf(spark, pbf, root, blobs_per_split=1)
    n1 = read_documents(spark, root).count()
    snap1 = sorted(s1.completed_splits())
    s2 = ingest_pbf(spark, pbf, root, blobs_per_split=1)  # all splits committed
    assert sorted(s2.completed_splits()) == snap1
    assert read_documents(spark, root).count() == n1


def test_manifest_lineage_recorded(spark, fixtures_dir, tmp_path):
    import json, os
    pbf = f"{fixtures_dir}/multiblob.osm.pbf"
    root = str(tmp_path / "lin")
    ingest_pbf(spark, pbf, root, blobs_per_split=2)
    mpath = os.path.join(root, "_manifests", "split-000000.json")
    m = json.load(open(mpath))
    assert m["lineage"]["input_sha256"]
    assert m["lineage"]["blob_seqs"] == [1, 2]
    assert m["n_rows"] > 0 and m["files"]
    snap = json.load(open(os.path.join(root, "snapshot.json")))
    assert snap["total_rows"] == sum(
        json.load(open(os.path.join(root, "_manifests", f"split-{s}.json")))["n_rows"]
        for s in snap["splits"]
    )
