"""polygon_overlap_join vs an independent brute-force Python oracle.

The oracle re-implements the exact integer predicate with plain scalar
loops (no numpy broadcasting, different code path): all-pairs edge
intersection + half-open crossing-number containment. Shapes include
CONCAVE polygons, shared-edge touches, vertex touches, identical rings
(collinear overlap), and nesting — the degenerate surface the refine
must get exactly right.
"""

from __future__ import annotations

import pytest

from osm_pbf_spark.operators.segjoin import SEG_SNAP_SCALE


def _snap(v: float) -> int:
    import math

    return math.floor(v * SEG_SNAP_SCALE + 0.5)


def _ring(pts):
    r = [(_snap(lon), _snap(lat)) for lat, lon in pts]
    if len(r) > 1 and r[0] == r[-1]:
        r = r[:-1]
    return r


def _edges(ring):
    return [(ring[i], ring[(i + 1) % len(ring)]) for i in range(len(ring))]


def _orient(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _on_seg(a, b, p):
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _seg_intersect(p0, p1, q0, q1):
    d1 = _orient(p0, p1, q0)
    d2 = _orient(p0, p1, q1)
    d3 = _orient(q0, q1, p0)
    d4 = _orient(q0, q1, p1)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    return (
        (d1 == 0 and _on_seg(p0, p1, q0))
        or (d2 == 0 and _on_seg(p0, p1, q1))
        or (d3 == 0 and _on_seg(q0, q1, p0))
        or (d4 == 0 and _on_seg(q0, q1, p1))
    )


def _inside(p, ring):
    cnt = 0
    for a, b in _edges(ring):
        t = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        if a[1] <= p[1] < b[1] and t > 0:
            cnt += 1
        elif b[1] <= p[1] < a[1] and t < 0:
            cnt += 1
    return cnt % 2 == 1


def _oracle(polys):
    out = {}
    ids = sorted(polys)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1:]:
            ra, rb = _ring(polys[ia]), _ring(polys[ib])
            cross = any(
                _seg_intersect(p0, p1, q0, q1)
                for p0, p1 in _edges(ra)
                for q0, q1 in _edges(rb)
            )
            if cross:
                out[(ia, ib)] = "cross"
            elif _inside(ra[0], rb):
                out[(ia, ib)] = "a_in_b"
            elif _inside(rb[0], ra):
                out[(ia, ib)] = "b_in_a"
    return out


# (poly_id, [(lat, lon), ...]) — hand-built degenerate gallery
GALLERY = {
    "sq": [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0)],
    # strictly inside sq
    "inner": [(1.0, 1.0), (1.0, 2.0), (2.0, 2.0), (2.0, 1.0)],
    # shares sq's right edge (touch, no interior overlap)
    "shared_edge": [(0.0, 4.0), (0.0, 8.0), (4.0, 8.0), (4.0, 4.0)],
    # touches sq at one corner only
    "corner": [(4.0, 4.0), (4.0, 6.0), (6.0, 6.0), (6.0, 4.0)],
    # proper crossing through sq
    "crossing": [(-1.0, 2.0), (-1.0, 3.0), (5.0, 3.0), (5.0, 2.0)],
    # identical ring to sq (collinear overlap everywhere)
    "sq_copy": [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0)],
    # concave C-shape whose cavity holds 'in_cavity' WITHOUT overlap
    "cshape": [
        (10.0, 0.0), (16.0, 0.0), (16.0, 6.0), (10.0, 6.0),
        (10.0, 5.0), (15.0, 5.0), (15.0, 1.0), (10.0, 1.0),
    ],
    # inside the concave cavity — bbox overlaps cshape, polygon doesn't
    "in_cavity": [(11.0, 2.0), (11.0, 4.0), (14.0, 4.0), (14.0, 2.0)],
    # fully inside the cshape ARM (true containment in a concave host)
    "in_arm": [(15.2, 0.2), (15.2, 5.8), (15.8, 5.8), (15.8, 0.2)],
    # far away — no pair at all
    "island": [(-20.0, -20.0), (-20.0, -18.0), (-18.0, -18.0), (-18.0, -20.0)],
    # explicit closing vertex (dup first point) — must behave like open
    "closed_dup": [(2.0, -3.0), (2.0, -1.0), (3.0, -1.0), (3.0, -3.0), (2.0, -3.0)],
    # crosses closed_dup
    "hits_closed": [(1.5, -2.0), (3.5, -2.0), (3.5, -1.5), (1.5, -1.5)],
}


@pytest.fixture(scope="module")
def gallery_df(spark):
    rows = [
        (pid, [(float(la), float(lo)) for la, lo in pts])
        for pid, pts in GALLERY.items()
    ]
    return spark.createDataFrame(
        rows, "poly_id string, pts array<struct<lat: double, lon: double>>"
    )


def test_overlay_matches_brute_oracle(spark, gallery_df):
    from osm_pbf_spark.operators.overlay import polygon_overlap_join
    from pyspark.sql import functions as F

    out = polygon_overlap_join(gallery_df, gallery_df, level=3)
    got = {
        (r.id_a, r.id_b): r.kind
        for r in out.where(F.col("id_a") < F.col("id_b")).collect()
    }
    want = _oracle(GALLERY)
    assert got == want


def test_overlay_expected_kinds(spark, gallery_df):
    """Pin the hand-known classifications so the oracle itself is
    checked against human intent, not just engine-vs-oracle."""
    want = _oracle(GALLERY)
    assert want[("inner", "sq")] == "a_in_b"
    assert want[("shared_edge", "sq")] == "cross"  # boundary touch
    assert want[("corner", "sq")] == "cross"
    assert want[("crossing", "sq")] == "cross"
    assert want[("sq", "sq_copy")] == "cross"  # collinear overlap
    assert ("cshape", "in_cavity") not in want  # bbox overlap only
    assert want[("cshape", "in_arm")] == "b_in_a"
    assert want[("closed_dup", "hits_closed")] == "cross"
    assert not any("island" in pair for pair in want)


def test_overlay_level_invariance(spark, gallery_df):
    """The cover level changes the plan, never the answer."""
    from osm_pbf_spark.operators.overlay import polygon_overlap_join
    from pyspark.sql import functions as F

    ref = None
    for level in (1, 5, 9):
        out = polygon_overlap_join(gallery_df, gallery_df, level=level)
        got = sorted(
            (r.id_a, r.id_b, r.kind)
            for r in out.where(F.col("id_a") < F.col("id_b")).collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref, f"level {level} diverged"


def test_overlay_two_sided(spark, gallery_df):
    """Distinct left/right sides (no self-join filter) keep every
    ordered pair exactly once — responsibility dedup, not distinct."""
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.overlay import polygon_overlap_join

    left = gallery_df.where(F.col("poly_id").isin("sq", "cshape"))
    out = polygon_overlap_join(left, gallery_df, level=4).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate pair emitted"
    want = _oracle(GALLERY)
    expect = set()
    for (a, b), _k in want.items():
        if a in ("sq", "cshape"):
            expect.add((a, b))
        if b in ("sq", "cshape"):
            expect.add((b, a))
    # self-pairs exist in the two-sided join (sq x sq) — drop them
    got = {(a, b) for a, b in pairs if a != b}
    assert got == expect


def test_dissolve_matches_python_closure(spark, gallery_df):
    """dissolve_groups == transitive closure of the brute-oracle pair
    set, with singleton groups for isolated polygons."""
    from osm_pbf_spark.operators.overlay import dissolve_groups

    pairs = _oracle(GALLERY)
    parent = {pid: pid for pid in GALLERY}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {pid: find(pid) for pid in GALLERY}
    got = {r.poly_id: r.group_id for r in dissolve_groups(gallery_df, level=3).collect()}
    assert got == want
    assert got["island"] == "island"  # singleton keeps its own id
