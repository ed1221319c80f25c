"""End-to-end reference lifecycle: decode -> closed-way polygons ->
point-in-polygon join of the decoded nodes — the r-tree insert+query
path of the reference expressed as cover/broadcast/refine, verified
against the brute-force oracle."""

from __future__ import annotations

from osm_pbf_spark.operators.spatial_join import pip_join
from osm_pbf_spark.sources import pbf_source as src
from tests import oracle_geo
from tests.pbf_fixtures import build_way_pip


def test_decoded_way_polygons_pip_matches_oracle(spark, tmp_path):
    pbf = build_way_pip(str(tmp_path))
    entities, _ = src.read_pbf(spark, pbf)
    nodes = src.nodes(entities).cache()
    geoms = src.assemble_way_geometries(src.ways(entities), nodes)
    polys = src.polygons_from_closed_ways(geoms)
    assert [p.poly_id for p in polys] == ["way/600"]

    pts = nodes.selectExpr("cast(id as string) as doc_id", "lat", "lon")
    got = {
        (r["doc_id"], r["poly_id"])
        for r in pip_join(spark, pts, polys, level="auto").collect()
    }
    rings = [[(float(v[0]), float(v[1])) for v in polys[0].rings[0]]]
    want = set()
    for r in pts.collect():
        if oracle_geo.point_in_polygon(r["lat"], r["lon"], rings):
            want.add((r["doc_id"], "way/600"))
    assert got == want
    assert len(want) > 5  # the probe grid actually lands inside
