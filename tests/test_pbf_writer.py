"""Distributed PBF writer (sink/pbf_writer): decode -> write -> decode
must be the identity on every entity column; layout, chunking, info
defaults, and validation pinned."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _roundtrip(spark, tmp_path, fixture, n_files=2, **kw):
    from osm_pbf_spark.sink.pbf_writer import write_pbf_files
    from osm_pbf_spark.sources import pbf_source as src
    from tests import pbf_fixtures as FX

    fx = getattr(FX, f"build_{fixture}")(str(tmp_path))
    ents, hdr = src.read_pbf(spark, fx)
    man = write_pbf_files(
        ents, os.path.join(str(tmp_path), "rt"), n_files=n_files,
        header=hdr, **kw
    )
    ents2, hdr2 = src.read_pbf(spark, [m["path"] for m in man])
    return ents, ents2, hdr, hdr2, man


CONTENT = ["kind", "id", "lat", "lon", "tags", "refs", "members"]


def test_roundtrip_mixed_content_identity(spark, tmp_path):
    ents, ents2, hdr, hdr2, man = _roundtrip(spark, tmp_path, "mixed")
    a = sorted(map(tuple, ents.select(*CONTENT).collect()))
    b = sorted(map(tuple, ents2.select(*CONTENT).collect()))
    assert a == b and len(a) == 10
    assert hdr2["required_features"] == hdr["required_features"]
    # manifest counts match the data
    assert sum(m["n_nodes"] for m in man) == 7
    assert sum(m["n_ways"] for m in man) == 2
    assert sum(m["n_relations"] for m in man) == 1
    assert all(m["n_bytes"] > 0 for m in man)


def test_roundtrip_denseinfo_metadata_identity(spark, tmp_path):
    ents, ents2, *_ = _roundtrip(spark, tmp_path, "denseinfo", n_files=1)
    cols = CONTENT + ["version", "ts_ms", "changeset", "uid", "user", "visible"]
    a = sorted(map(tuple, ents.select(*cols).collect()))
    b = sorted(map(tuple, ents2.select(*cols).collect()))
    assert a == b


def test_block_chunking_and_file_layout(spark, tmp_path):
    from osm_pbf_spark.pbf.framing import scan_blobs
    from osm_pbf_spark.sink.pbf_writer import write_pbf_files
    from osm_pbf_spark.sources import pbf_source as src

    n = 25
    ents = spark.createDataFrame(
        [("node", i, float(i) * 0.001, float(i) * 0.002) for i in range(n)],
        "kind string, id long, lat double, lon double",
    )
    man = write_pbf_files(
        ents, os.path.join(str(tmp_path), "chunks"), n_files=1,
        entities_per_block=10,
    )
    assert len(man) == 1 and man[0]["n_nodes"] == n
    # 1 header blob + ceil(25/10)=3 data blocks
    blobs = scan_blobs(man[0]["path"])
    assert len(blobs) == 4
    ents2, _ = src.read_pbf(spark, man[0]["path"])
    got = sorted(r.id for r in ents2.collect())
    assert got == list(range(n))


def test_writer_rejects_unknown_kind_and_bad_args(spark, tmp_path):
    from osm_pbf_spark.sink.pbf_writer import write_pbf_files

    ents = spark.createDataFrame(
        [("blob", 1, 0.0, 0.0)], "kind string, id long, lat double, lon double"
    )
    with pytest.raises(Exception, match="unknown kind"):
        write_pbf_files(ents, os.path.join(str(tmp_path), "bad"))
    with pytest.raises(ValueError, match="n_files"):
        write_pbf_files(ents, str(tmp_path), n_files=0)


def test_header_bbox_roundtrip(spark, tmp_path):
    from osm_pbf_spark.sink.pbf_writer import write_pbf_files
    from osm_pbf_spark.sources import pbf_source as src

    ents = spark.createDataFrame(
        [("node", 1, 1.5, 2.25)], "kind string, id long, lat double, lon double"
    )
    hdr = {
        "required_features": ["OsmSchema-V0.6", "DenseNodes"],
        "optional_features": ["Sort.Type_then_ID"],
        "bbox": {"left": -1.0, "right": 3.0, "top": 4.0, "bottom": -2.0},
    }
    man = write_pbf_files(
        ents, os.path.join(str(tmp_path), "hdr"), header=hdr
    )
    _, hdr2 = src.read_pbf(spark, man[0]["path"])
    assert hdr2["bbox"] == hdr["bbox"]
    assert hdr2["optional_features"] == ["Sort.Type_then_ID"]
