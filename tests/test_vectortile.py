"""encode_tiles: payload byte-level pin, python decode round-trip vs
the quantized inputs, determinism, and plan shape (one shuffle, one
Python stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.operators.tiling import clip_lines_to_tiles
from osm_pbf_spark.operators.vectortile import encode_tiles


def _decode(payload: bytes):
    """Independent decoder for the documented payload subset."""
    feats = []
    i = 0

    def varint():
        nonlocal i
        v, shift = 0, 0
        while True:
            b = payload[i]
            i += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def unzz(v):
        return (v >> 1) ^ -(v & 1)

    while i < len(payload):
        assert payload[i] == 0x08
        i += 1
        fid = varint()
        assert payload[i] == 0x12
        i += 1
        glen = varint()
        gend = i + glen
        assert varint() == 9
        x0, y0 = unzz(varint()), unzz(varint())
        assert varint() == 10
        x1, y1 = x0 + unzz(varint()), y0 + unzz(varint())
        assert i == gend
        feats.append((fid, x0, y0, x1, y1))
    return feats


def _segments(spark):
    rows = [
        (i, -20.0 + i * 0.7, 10.0 + i * 1.3, -20.0 + i * 0.7 + 2.5, 10.0 + i * 1.3 - 3.0)
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows, "event_id long, lat0 double, lon0 double, lat1 double, lon1 double"
    )


def test_encode_roundtrip_matches_quantized_clip(spark):
    seg = _segments(spark)
    clipped = clip_lines_to_tiles(seg, zoom=5, scheme="linear")
    extent = 4096
    want = {}
    for r in clipped.collect():
        def q(c, base):
            return min(extent, max(0, int((c - base) * extent // 1)))

        key = (r.tile_z, r.tile_x, r.tile_y)
        want.setdefault(key, []).append(
            (
                r.event_id,
                q(r.cx0, r.tile_x),
                q(r.cy0, r.tile_y),
                q(r.cx1, r.tile_x),
                q(r.cy1, r.tile_y),
            )
        )
    got = encode_tiles(clipped, extent=extent).collect()
    assert {(r.tile_z, r.tile_x, r.tile_y) for r in got} == set(want)
    for r in got:
        feats = _decode(bytes(r.payload))
        assert r.n_features == len(feats)
        assert feats == sorted(want[(r.tile_z, r.tile_x, r.tile_y)])


def test_encode_known_bytes(spark):
    # one horizontal segment inside tile (0, 2, 1) at zoom 2: pinned bytes
    clipped = spark.createDataFrame(
        [(5, 2, 2, 1, 2.25, 1.5, 2.5, 1.5)],
        "event_id long, tile_z int, tile_x long, tile_y long, "
        "cx0 double, cy0 double, cx1 double, cy1 double",
    )
    rows = encode_tiles(clipped, extent=8).collect()
    assert len(rows) == 1
    # qx0=2, qy0=4, qx1=4, qy1=4 -> geom: 09 04 08 0a 04 00
    geom = bytes([9, 4, 8, 10, 4, 0])
    assert bytes(rows[0].payload) == bytes([0x08, 5, 0x12, len(geom)]) + geom


def test_encode_deterministic_across_partitionings(spark):
    seg = _segments(spark)
    a = encode_tiles(clip_lines_to_tiles(seg, zoom=5), extent=256).collect()
    b = encode_tiles(
        clip_lines_to_tiles(seg.repartition(13), zoom=5), extent=256
    ).collect()
    ka = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.payload) for r in a}
    kb = {(r.tile_z, r.tile_x, r.tile_y): bytes(r.payload) for r in b}
    assert ka == kb


def test_encode_plan_one_shuffle_one_python_stage(spark):
    seg = _segments(spark)
    plan = (
        encode_tiles(clip_lines_to_tiles(seg, zoom=5))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert plan.count("Exchange") == 1  # quantization runs BEFORE the shuffle


def test_encode_rejects_bad_extent(spark):
    with pytest.raises(ValueError):
        encode_tiles(_segments(spark), extent=0)
