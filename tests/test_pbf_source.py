"""Distributed decode vs pure-Python oracle over the golden fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_spark.sources import pbf_source as src
from tests import oracle_pbf


def _spark_decode(spark, path):
    entities, header = src.read_pbf(spark, path)
    return entities.cache(), header


def test_multiblob_distributed_decode(spark, fixtures_dir):
    path = f"{fixtures_dir}/multiblob.osm.pbf"
    entities, header = _spark_decode(spark, path)
    want = oracle_pbf.decode_file(path)

    got_nodes = {
        r["id"]: r
        for r in src.nodes(entities).collect()
    }
    assert len(got_nodes) == len(want["nodes"])
    for w in want["nodes"]:
        g = got_nodes[w["id"]]
        assert g["lat"] == w["lat"] and g["lon"] == w["lon"]
        assert (dict(g["tags"]) if g["tags"] else {}) == w["tags"]


def test_mixed_all_kinds(spark, fixtures_dir):
    path = f"{fixtures_dir}/mixed.osm.pbf"
    entities, _ = _spark_decode(spark, path)
    want = oracle_pbf.decode_file(path)

    assert src.nodes(entities).count() == len(want["nodes"])
    got_ways = {r["id"]: r for r in src.ways(entities).collect()}
    for w in want["ways"]:
        assert list(got_ways[w["id"]]["refs"]) == w["refs"]
    got_rels = {r["id"]: r for r in src.relations(entities).collect()}
    for w in want["relations"]:
        members = [
            {"role": m["role"], "ref": m["ref"], "type": m["type"]}
            for m in got_rels[w["id"]]["members"]
        ]
        assert members == w["members"]


def test_header_validation(spark, fixtures_dir):
    _, header = src.read_pbf(spark, f"{fixtures_dir}/minimal.osm.pbf")
    assert header["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert header["bbox"]["left"] == 13.0


def test_way_geometry_assembly(spark, fixtures_dir):
    path = f"{fixtures_dir}/mixed.osm.pbf"
    entities, _ = _spark_decode(spark, path)
    geoms = {
        r["way_id"]: r
        for r in src.assemble_way_geometries(src.ways(entities), src.nodes(entities)).collect()
    }
    want = oracle_pbf.decode_file(path)
    node_by_id = {n["id"]: n for n in want["nodes"]}
    for w in want["ways"]:
        g = geoms[w["id"]]
        assert [(p["lat"], p["lon"]) for p in g["points"]] == [
            (node_by_id[r]["lat"], node_by_id[r]["lon"]) for r in w["refs"]
        ]
    assert geoms[501]["is_closed"] is False
    assert geoms[502]["is_closed"] is True


def test_decode_is_distributed(spark, fixtures_dir):
    """The plan must contain no shuffle before the decode stage."""
    entities, _ = src.read_pbf(spark, f"{fixtures_dir}/multiblob.osm.pbf", parallelism=4)
    assert entities.rdd.getNumPartitions() == 4


def test_pack_vertex_out_of_range_raises(spark):
    """The probe-side (way_id << 24 | pos) pack must fail LOUDLY for a
    way id its 39-bit field cannot hold — a smeared pack would join and
    regroup under a silently wrong way id. Coordinates themselves pass
    through the assembly untouched (the regroup shuffles raw scalar
    rows), so out-of-range coords are NOT an error here — same
    tolerance the struct path always had."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from osm_pbf_spark.sources.pbf_source import assemble_way_geometries

    nodes = spark.createDataFrame(
        [(10, 0.0, -500.0), (11, 95.0, 1.0)], "id long, lat double, lon double"
    )
    ways_bad = spark.createDataFrame(
        [(1 << 39, [10, 11])], "id long, refs array<long>"
    )
    with pytest.raises(SparkRuntimeException, match="not packable"):
        assemble_way_geometries(ways_bad, nodes).collect()

    # wildly out-of-range coords flow through bit-exact, geometry intact
    ways = spark.createDataFrame([(1, [10, 11])], "id long, refs array<long>")
    ok = assemble_way_geometries(ways, nodes).collect()
    assert len(ok) == 1 and len(ok[0]["points"]) == 2
    assert ok[0]["points"][0]["lon"] == -500.0
    assert ok[0]["points"][1]["lat"] == 95.0
