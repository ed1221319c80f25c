"""Pure-Python (scalar) geometry oracles: PIP, haversine, kNN, tiles.

Brute-force implementations the Spark operators must match EXACTLY
(BASELINE.json:2: "exact match of reference join rows and tile
assignments"). The PIP uses the SAME crossing-number formula and
float64 operation order as osm_pbf_spark.functions.geometry so results
agree bit-for-bit, including the boundary convention.
"""

from __future__ import annotations

import math

EARTH_RADIUS_M = 6371008.8


def point_in_ring(lat: float, lon: float, ring: list[tuple[float, float]]) -> bool:
    pts = list(ring)
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    inside = False
    j = len(pts) - 1
    for i in range(len(pts)):
        yi, xi = pts[i]
        yj, xj = pts[j]
        if (yi > lat) != (yj > lat):
            xint = (xj - xi) * (lat - yi) / (yj - yi) + xi
            if lon < xint:
                inside = not inside
        j = i
    return inside


def point_in_polygon(lat: float, lon: float, rings: list[list[tuple[float, float]]]) -> bool:
    inside = False
    for ring in rings:
        if point_in_ring(lat, lon, ring):
            inside = not inside
    return inside


def haversine_m(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    p1 = math.radians(lat1)
    p2 = math.radians(lat2)
    dphi = p2 - p1
    dlmb = math.radians(lon2) - math.radians(lon1)
    a = math.sin(dphi / 2.0) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * math.asin(math.sqrt(min(max(a, 0.0), 1.0)))


def knn_bruteforce(
    queries: list[tuple[str, float, float]],
    candidates: list[tuple[str, float, float]],
    k: int,
    metric: str = "haversine",
    exclude_self: bool = True,
) -> list[tuple[str, str, int]]:
    """O(n*m) exact kNN -> [(query_id, neighbor_id, rank)], rank 1-based.

    Tie-break: (distance, candidate_id) ascending — same rule as the
    distributed operator.
    """
    out = []
    for qid, qlat, qlon in queries:
        dists = []
        for cid, clat, clon in candidates:
            if exclude_self and cid == qid:
                continue
            if metric == "haversine":
                d = haversine_m(qlat, qlon, clat, clon)
            else:
                d = (qlat - clat) * (qlat - clat) + (qlon - clon) * (qlon - clon)
            dists.append((d, cid))
        dists.sort()
        for rank, (d, cid) in enumerate(dists[:k], start=1):
            out.append((qid, cid, rank))
    return out


MAX_MERCATOR_LAT = 85.05112878


def point_to_tile_mercator(lat: float, lon: float, z: int) -> tuple[int, int]:
    n = float(1 << z)
    latc = min(max(lat, -MAX_MERCATOR_LAT), MAX_MERCATOR_LAT)
    x = int(math.floor((lon + 180.0) / 360.0 * n))
    lr = math.radians(latc)
    y = int(math.floor((1.0 - math.log(math.tan(lr) + 1.0 / math.cos(lr)) / math.pi) / 2.0 * n))
    return min(max(x, 0), (1 << z) - 1), min(max(y, 0), (1 << z) - 1)


def clip_ring_to_tile(
    ring_latlon: list[tuple[float, float]],
    zoom: int,
    tx: int,
    ty: int,
    extent: int = 4096,
) -> list[tuple[int, int]] | None:
    """SCALAR Sutherland-Hodgman replay of clip_polygons_to_tiles for
    one (ring, tile): same spec (closed half-planes, one fixed IEEE
    intersection chain, HALF-UP extent quantization, consecutive-dup
    collapse incl. wraparound, <3 vertices -> None), independent
    scalar formulation (the engine clips with numpy masks)."""
    n = float(1 << zoom)
    pts = []
    for lat, lon in ring_latlon:
        sx = (lon + 180.0) / 360.0 * n
        sy = (90.0 - lat) / 180.0 * n
        pts.append((sx, sy))

    def clip(poly, axis, e, keep_ge):
        out = []
        m = len(poly)
        for i in range(m):
            px, py = poly[i - 1]
            qx, qy = poly[i]
            pc = px if axis == 0 else py
            qc = qx if axis == 0 else qy
            pin = (pc >= e) if keep_ge else (pc <= e)
            qin = (qc >= e) if keep_ge else (qc <= e)
            if pin != qin:
                t = (e - pc) / (qc - pc)
                ix = px + t * (qx - px)
                iy = py + t * (qy - py)
                if axis == 0:
                    ix = e
                else:
                    iy = e
                out.append((ix, iy))
            if qin:
                out.append((qx, qy))
        return out

    for axis, e, ge in [
        (0, float(tx), True),
        (0, float(tx) + 1.0, False),
        (1, float(ty), True),
        (1, float(ty) + 1.0, False),
    ]:
        pts = clip(pts, axis, e, ge)
        if not pts:
            return None
    if len(pts) < 3:
        return None
    q = [
        (
            int(math.floor((x - float(tx)) * extent + 0.5)),
            int(math.floor((y - float(ty)) * extent + 0.5)),
        )
        for x, y in pts
    ]
    dedup = [q[0]]
    for v in q[1:]:
        if v != dedup[-1]:
            dedup.append(v)
    if len(dedup) > 1 and dedup[0] == dedup[-1]:
        dedup = dedup[:-1]
    return dedup if len(dedup) >= 3 else None
