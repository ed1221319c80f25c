"""hausdorff_join vs a scalar pure-Python oracle (plain loops, no
numpy) over irregular synthetic tracks, plus boundary cases: pairs at
exactly the radius, asymmetric point counts, and level invariance."""

from __future__ import annotations

import math

import pytest

from osm_pbf_spark.operators.segjoin import SEG_SNAP_SCALE


def _snap(v: float) -> int:
    return math.floor(v * SEG_SNAP_SCALE + 0.5)


def _h2(a, b) -> int:
    """Symmetric discrete Hausdorff^2 on the snapped grid — scalar."""
    pa = [(_snap(lon), _snap(lat)) for lat, lon in a]
    pb = [(_snap(lon), _snap(lat)) for lat, lon in b]

    def directed(ps, qs):
        return max(
            min((px - qx) ** 2 + (py - qy) ** 2 for qx, qy in qs)
            for px, py in ps
        )

    return max(directed(pa, pb), directed(pb, pa))


TRACKS = {
    # two near-identical traces (small jitter)
    "t0": [(10.0, 20.0), (10.125, 20.25), (10.25, 20.5), (10.375, 20.75)],
    "t1": [(10.0625, 20.0625), (10.1875, 20.3125), (10.3125, 20.5625)],
    # same start, divergent tail (Hausdorff large)
    "t2": [(10.0, 20.0), (12.0, 22.0), (14.0, 24.0)],
    # exactly radius away from t3b in one point (boundary inclusivity)
    "t3a": [(-5.0, -5.0), (-5.0, -4.0)],
    "t3b": [(-5.0, -5.0), (-5.0, -4.0), (-5.0, -3.5)],
    # far-away singleton-ish track
    "t4": [(60.0, 120.0), (60.125, 120.125)],
    # single-point track near t0
    "t5": [(10.125, 20.375)],
}
RADIUS = 0.5


@pytest.fixture(scope="module")
def tracks_df(spark):
    rows = [
        (tid, [(float(la), float(lo)) for la, lo in pts])
        for tid, pts in TRACKS.items()
    ]
    return spark.createDataFrame(
        rows, "track_id string, pts array<struct<lat: double, lon: double>>"
    )


def _expected(radius):
    r2 = int(math.ceil(radius * SEG_SNAP_SCALE)) ** 2
    ids = sorted(TRACKS)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h2 = _h2(TRACKS[a], TRACKS[b])
            if h2 <= r2:
                out[(a, b)] = h2
    return out


def test_hausdorff_matches_scalar_oracle(spark, tracks_df):
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.distance import hausdorff_join

    out = hausdorff_join(tracks_df, tracks_df, radius=RADIUS, level=8)
    got = {
        (r.id_a, r.id_b): r.h2
        for r in out.where(F.col("id_a") < F.col("id_b")).collect()
    }
    want = _expected(RADIUS)
    assert got == want
    # fixture sanity: near pair in, divergent + far pairs out,
    # sub-track pair in (t3b extends t3a by 0.5 deg exactly)
    assert ("t0", "t1") in want and ("t0", "t2") not in want
    assert ("t3a", "t3b") in want  # boundary h2 == r2 is INCLUDED
    assert want[("t3a", "t3b")] == int(math.ceil(RADIUS * SEG_SNAP_SCALE)) ** 2
    assert not any("t4" in p for p in want)
    assert ("t0", "t5") in want  # single-point track


def test_hausdorff_level_invariance(spark, tracks_df):
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.distance import hausdorff_join

    ref = None
    for level in (3, 6, 8):
        out = hausdorff_join(tracks_df, tracks_df, radius=RADIUS, level=level)
        got = sorted(
            (r.id_a, r.id_b, r.h2)
            for r in out.where(F.col("id_a") < F.col("id_b")).collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref, f"level {level} diverged"


def test_hausdorff_rejects_undersized_cells(spark, tracks_df):
    from osm_pbf_spark.operators.distance import hausdorff_join

    with pytest.raises(ValueError, match="smaller than"):
        hausdorff_join(tracks_df, tracks_df, radius=0.5, level=12)
