"""Way decode + geometry assembly at volume (not just fixture size):
100k nodes + 10k ways through the distributed decode and the
posexplode+join assembly, with spot-checks against the pure-Python
spec oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_pbf_spark.sources import pbf_source as src
from tests import oracle_pbf
from tests.gen_documents import synth_pbf_mixed


def test_mixed_corpus_decode_and_assembly(spark, tmp_path):
    pbf = synth_pbf_mixed(str(tmp_path / "mixed100k.pbf"), 100_000, 10_000)
    entities, _ = src.read_pbf(spark, pbf)
    nodes = src.nodes(entities).cache()
    ways = src.ways(entities).cache()
    assert nodes.count() == 100_000
    assert ways.count() == 10_000

    # spot-check decode against the pure-Python oracle (first blob +
    # one way blob is enough to catch kernel drift; full-file oracle
    # decode at this size is slow in pure Python)
    want = oracle_pbf.decode_file(pbf)
    sample = ways.orderBy("id").limit(50).collect()
    want_ways = {w["id"]: w["refs"] for w in want["ways"]}
    for r in sample:
        assert list(r["refs"]) == want_ways[r["id"]]

    geoms = src.assemble_way_geometries(ways, nodes).cache()
    n_geoms = geoms.count()
    assert n_geoms == 10_000
    # every way's refs resolve fully (refs point at existing node runs)
    assert geoms.filter(F.size("points") < 10).count() == 0
    # closed ways (every 5th) assembled as closed
    n_closed = geoms.filter("is_closed").count()
    assert n_closed == 2_000
    geoms.unpersist(); nodes.unpersist(); ways.unpersist()


def test_relations_at_volume(spark, tmp_path):
    """5k multipolygon relations (each over a closed member way) through
    distributed decode + polygons_from_relations: D8 at volume, not
    fixture size."""
    pbf = synth_pbf_mixed(str(tmp_path / "rels50k.pbf"), 50_000, 5_000, n_rels=5_000)
    entities, _ = src.read_pbf(spark, pbf)
    rels = src.relations(entities).cache()
    assert rels.count() == 5_000
    # spot-check member decode against the spec oracle
    want = oracle_pbf.decode_file(pbf)
    want_rels = {r["id"]: r["members"] for r in want["relations"]}
    for r in rels.orderBy("id").limit(25).collect():
        assert [
            {"role": m["role"], "ref": m["ref"], "type": m["type"]} for m in r["members"]
        ] == want_rels[r["id"]]

    polys = src.polygons_from_relations(
        rels, src.ways(entities), src.nodes(entities), max_polygons=10_000
    )
    # every 5th way is closed and distinct relations may share one;
    # each relation with a resolvable closed outer yields one polygon
    assert len(polys) == 5_000
    assert all(len(p.rings) == 1 and len(p.rings[0]) == 10 for p in polys)
    rels.unpersist()
