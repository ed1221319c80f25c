"""Multipolygon relation geometry: stitching, hole assignment, and the
decode -> relation polygons -> PIP lifecycle (a point inside a hole must
be EXCLUDED)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.spatial_join import pip_join
from osm_pbf_spark.sources import pbf_source as src
from osm_pbf_spark.sources.pbf_source import polygons_from_relations, stitch_rings
from tests import oracle_geo, oracle_pbf, pbf_fixtures


def test_stitch_rings_closed_and_chained():
    sq = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    closed = ([1, 2, 3, 4, 1], sq + [sq[0]])
    rings, leftover = stitch_rings([closed])
    assert leftover == 0 and len(rings) == 1 and rings[0] == sq

    # two open halves, second reversed
    a = ([1, 2, 3], [sq[0], sq[1], sq[2]])
    b = ([1, 4, 3], [sq[0], sq[3], sq[2]])
    rings, leftover = stitch_rings([a, b])
    assert leftover == 0 and len(rings) == 1
    assert sorted(rings[0]) == sorted(sq)

    # a dangling segment that can never close
    rings, leftover = stitch_rings([a])
    assert rings == [] and leftover == 1


@pytest.fixture(scope="module")
def relpip(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("relpip"))
    path = pbf_fixtures.build_rel_pip(d)
    entities, _ = src.read_pbf(spark, path)
    return path, entities


def test_relation_polygon_assembly(spark, relpip):
    _, entities = relpip
    polys = polygons_from_relations(
        src.relations(entities), src.ways(entities), src.nodes(entities)
    )
    assert [p.poly_id for p in polys] == ["relation/950"]  # decoy route ignored
    p = polys[0]
    assert len(p.rings) == 2  # outer + hole
    assert len(p.rings[0]) == 8
    assert len(p.rings[1]) == 4


def test_relation_pip_excludes_hole(spark, relpip):
    path, entities = relpip
    nodes = src.nodes(entities)
    polys = polygons_from_relations(
        src.relations(entities), src.ways(entities), nodes
    )
    pts = nodes.selectExpr("id as doc_id", "lat", "lon")
    got = sorted(r.doc_id for r in pip_join(spark, pts, polys, level="auto").collect())

    decoded = oracle_pbf.decode_file(path)
    rings = [p.rings for p in polys][0]
    want = sorted(
        n["id"]
        for n in decoded["nodes"]
        if oracle_geo.point_in_polygon(
            n["lat"], n["lon"], [list(map(tuple, r)) for r in rings]
        )
    )
    assert got == want
    assert len(want) > 0
    # a probe squarely inside the hole must NOT be in the result:
    # find one from the decode (hole spans 21.5..22.5 on both axes)
    hole_probe = [
        n["id"] for n in decoded["nodes"]
        if 21.6 < n["lat"] < 22.4 and 21.6 < n["lon"] < 22.4 and n["id"] < 200
    ]
    assert hole_probe and all(h not in got for h in hole_probe)
    # and a probe inside the outer but outside the hole IS included
    in_probe = [
        n["id"] for n in decoded["nodes"]
        if 20.1 < n["lat"] < 21.4 and 20.1 < n["lon"] < 23.9 and n["id"] < 200
    ]
    assert in_probe and all(h in got for h in in_probe)


def test_relations_vertex_budget(spark, relpip):
    """The driver-assembled multipolygon path streams member rows with
    a vertex budget — exceeding it fails loudly instead of OOMing the
    driver on member-heavy relations."""
    import pytest

    _, entities = relpip
    with pytest.raises(ValueError, match="max_vertices"):
        src.polygons_from_relations(
            src.relations(entities), src.ways(entities), src.nodes(entities),
            max_vertices=3,
        )


@pytest.fixture(scope="module")
def relmany(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("relmany"))
    path = pbf_fixtures.build_rel_many(d, n_rels=120)
    entities, _ = src.read_pbf(spark, path)
    return path, entities


def test_relation_rings_equals_driver_path(spark, relmany):
    """The distributed stitcher (relation_rings) and the driver
    broadcast path (polygons_from_relations) must produce IDENTICAL
    polygons — same poly_ids (incl. multi-outer /i naming), same ring
    order, same vertices — across 120 relations with split/reversed
    outers, holes, and double-outer cases."""
    _, entities = relmany
    polys = src.polygons_from_relations(
        src.relations(entities), src.ways(entities), src.nodes(entities)
    )
    driver = {
        p.poly_id: [[(la, lo) for la, lo in r] for r in p.rings]
        for p in polys
    }
    rings_rows = src.relation_rings(
        src.relations(entities), src.ways(entities), src.nodes(entities)
    ).collect()
    dist: dict = {}
    for r in sorted(rings_rows, key=lambda r: (r.poly_id, r.ring_idx)):
        dist.setdefault(r.poly_id, []).append(
            [(p["lat"], p["lon"]) for p in r.pts]
        )
    assert set(dist) == set(driver)
    assert len(driver) == 120 + 12  # 12 double-outer relations add /0 + /1
    for pid in driver:
        assert dist[pid] == driver[pid], pid


def test_relation_rings_scales_past_driver_bound(spark, relmany):
    """Past max_polygons, the broadcast path refuses loudly while the
    distributed rings path handles the same input and its PIP results
    match the scalar oracle per probe (annulus in, hole out, detached
    second outer in)."""
    from osm_pbf_spark.operators.spatial_join import pip_join_rings

    _, entities = relmany
    rels, ways_, nodes_ = (
        src.relations(entities), src.ways(entities), src.nodes(entities),
    )
    with pytest.raises(ValueError, match="max_polygons"):
        src.polygons_from_relations(rels, ways_, nodes_, max_polygons=50)
    rings = src.relation_rings(rels, ways_, nodes_)
    probes = nodes_.filter(F.pmod(F.col("id"), 1000) >= 50).selectExpr(
        "id as doc_id", "lat", "lon"
    )
    got = {
        (r.doc_id, r.poly_id)
        for r in pip_join_rings(spark, probes, rings, level="auto").collect()
    }
    want = set()
    for i in range(120):
        base = 1_000_000 + i * 1000
        rid = 5000 + i
        if i % 10 == 0:
            # closed members stitch first: the detached (closed) second
            # outer is ring 0, the chained main donut ring 1
            want.add((base + 50, f"relation/{rid}/1"))  # annulus probe
            want.add((base + 53, f"relation/{rid}/0"))  # detached outer
        else:
            want.add((base + 50, f"relation/{rid}"))    # annulus probe
    assert got == want


def test_validate_multipolygons_audit_dimensions(spark, tmp_path):
    """Each audit dimension fires on exactly its fixture case: clean
    donut valid; bowtie -> self-intersect; open chain -> unclosed;
    non-spec role -> bad_role; absent member way -> missing_geom."""
    path = pbf_fixtures.build_rel_invalid(str(tmp_path))
    entities, _ = src.read_pbf(spark, path)
    got = {
        r.rel_id: (
            r.n_way_members, r.n_bad_role, r.n_missing_geom,
            r.n_outer_rings, r.n_inner_rings, r.n_unclosed_outer,
            r.n_unclosed_inner, r.n_self_intersect, r.is_valid,
        )
        for r in src.validate_multipolygons(
            src.relations(entities), src.ways(entities), src.nodes(entities)
        ).collect()
    }
    assert got == {
        5500: (2, 0, 0, 1, 1, 0, 0, 0, True),
        5501: (1, 0, 0, 1, 0, 0, 0, 1, False),
        5502: (1, 0, 0, 0, 0, 1, 0, 0, False),
        5503: (2, 1, 0, 1, 0, 0, 0, 0, False),
        5504: (2, 0, 1, 1, 0, 0, 0, 0, False),
    }
