"""Iceberg-style file metrics: sorted-layout manifests carry per-file
[cell_min, cell_max]; committed_files()/read() prune by range without
opening any parquet footer."""

from __future__ import annotations

import json
import os

from osm_pbf_spark.plans.ingest import ingest_pbf, read_documents
from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink
from tests.gen_documents import synth_pbf


def test_sorted_layout_stats_and_pruning(spark, tmp_path):
    pbf = synth_pbf(str(tmp_path / "c.pbf"), 20_000, nodes_per_blob=2_000)
    root = str(tmp_path / "table")
    sink = ingest_pbf(spark, pbf, root, cell_level=12, blobs_per_split=1_000_000)

    # every data file carries cell stats in the manifest
    mdir = os.path.join(root, "_manifests")
    manifests = [json.load(open(os.path.join(mdir, f))) for f in os.listdir(mdir)
                 if f.startswith("split-")]
    assert manifests
    for m in manifests:
        assert m["stats_col"] == "cell"
        assert set(m["file_stats"]) == set(m["files"])
        for st in m["file_stats"].values():
            assert st["min"] <= st["max"]

    # range pruning: query the narrowest corner of the cell space —
    # only files whose manifest range covers it survive pruning, and the
    # pruned read returns exactly what the full read returns there
    stats = [st for m in manifests for st in m["file_stats"].values()]
    lo = hi = min(st["min"] for st in stats)

    full = sink.read(spark).filter(f"cell >= {lo} and cell <= {hi}")
    pruned = sink.read(spark, stats_range=(lo, hi)).filter(
        f"cell >= {lo} and cell <= {hi}"
    )
    assert pruned.count() == full.count() > 0

    # disjoint range prunes everything and yields an empty, schema-stable DF
    empty = sink.read(spark, stats_range=(-5, -2))
    assert empty.count() == 0
    assert "spans" in empty.columns


def test_manifest_pruning_spatially_disjoint_splits(spark, tmp_path):
    """Real planet extracts are spatially correlated blob-to-blob; with
    one split per blob the manifest ranges are disjoint and file-level
    pruning actually skips files (no parquet footer opened)."""
    from tests.pbf_fixtures import build_multiblob

    pbf = build_multiblob(str(tmp_path), blobs=4, nodes_per_blob=200)
    root = str(tmp_path / "tj")
    sink = ingest_pbf(spark, pbf, root, cell_level=12, blobs_per_split=1)

    n_all = len(sink.committed_files())
    assert n_all >= 4
    # blob 0 sits around (40, -74); its cell range should exclude the
    # files of blob 3 around (43, -71)
    import json as _json
    import os as _os

    mdir = _os.path.join(root, "_manifests")
    ms = sorted(_os.listdir(mdir))
    m0 = _json.load(open(_os.path.join(mdir, ms[0])))
    st0 = list(m0["file_stats"].values())[0]
    n_pruned = len(sink.committed_files((st0["min"], st0["min"])))
    assert n_pruned < n_all
    got = sink.read(spark, stats_range=(st0["min"], st0["max"])).filter(
        f"cell >= {st0['min']} and cell <= {st0['max']}"
    )
    want = sink.read(spark).filter(
        f"cell >= {st0['min']} and cell <= {st0['max']}"
    )
    assert got.count() == want.count() > 0


def test_sorted_layout_roundtrip_matches_docs(spark, tmp_path):
    pbf = synth_pbf(str(tmp_path / "c2.pbf"), 5_000, nodes_per_blob=1_000)
    root = str(tmp_path / "t2")
    ingest_pbf(spark, pbf, root, cell_level=12, blobs_per_split=2)
    docs = read_documents(spark, root)
    assert docs.count() == 5_000
    assert docs.select("doc_id").distinct().count() == 5_000


def test_manifest_list_makes_read_o1(spark, tmp_path):
    """After commit_snapshot, committed_files resolves every indexed
    split from the ONE manifest-list file; per-split manifests are only
    opened for splits committed after the snapshot."""
    from unittest import mock

    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink

    root = str(tmp_path / "t")
    sink = IcebergLikeSink(root, stats_col=None)
    df = spark.range(10).selectExpr("id", "id * 2 as v")
    for sid in ("000", "001", "002"):
        sink.write_split(df, sid)
    before = sink.committed_files()
    sink.commit_snapshot()

    with mock.patch.object(
        IcebergLikeSink, "_read_manifest", side_effect=sink._read_manifest
    ) as rm:
        after = IcebergLikeSink(root, stats_col=None).committed_files()
        assert rm.call_count == 0  # all three splits served by the index
    assert sorted(after) == sorted(before)

    # a split committed after the snapshot: exactly one manifest read
    sink.write_split(df, "003")
    with mock.patch.object(
        IcebergLikeSink, "_read_manifest", side_effect=sink._read_manifest
    ) as rm:
        files = IcebergLikeSink(root, stats_col=None).committed_files()
        assert rm.call_count == 1
    assert len(files) > len(after)


def test_sink_fixture_roundtrip_span_equality(spark, tmp_path):
    """The driver-gate sink fixture, end to end: ingest -> committed read
    reproduces the oracle's exact span sequences (the per-row invariant,
    BASELINE.json:16) and the driver query's stats range prunes at least
    one whole data file at the manifest level."""
    from __spark_entry__ import SINK_PRUNE_RANGE
    from tests import oracle_pbf, oracle_render
    from tests.pbf_fixtures import build_sink

    pbf = build_sink(str(tmp_path))
    root = str(tmp_path / "rt")
    sink = ingest_pbf(spark, pbf, root, cell_level=12, blobs_per_split=1)

    got = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in sink.read(spark).collect()
    }
    docs = oracle_render.render_file(oracle_pbf.decode_file(pbf))
    assert set(got) == {d["doc_id"] for d in docs}
    for d in docs:
        assert got[d["doc_id"]] == d["spans"], d["doc_id"]

    assert len(sink.committed_files(SINK_PRUNE_RANGE)) < len(sink.committed_files())
