"""Hexagonal (H3-style) grid assignment over the lon/lat plane.

Pointy-top axial hex coordinates ``(hq, hr)`` with circumradius
``size`` degrees — the hexagonal sibling of the square Morton cells in
functions/cells.py. Together they cover the north star's "H3/S2 cell
indexes" family: cells.py is the S2-like quadtree, this is the H3-like
hex lattice. Unlike real H3 it tiles the PLANE, not the sphere (no
icosahedron, no antimeridian wrap) — the same documented equal-angle
simplification as the linear tile scheme beside mercator in
functions/tiles.py.

Why hexes at all: every hex has exactly 6 equidistant neighbors, so
k-ring smoothing / density kernels are isotropic where the square
grid's 3x3 window over-weights diagonals — the standard reason H3
exists.

Exactness contract (gate-hashable). The fractional axial transform is
ONE fixed chain of single IEEE-754 ops —

    xf = (lon * C_SQRT3_3 - lat * C_THIRD) / size      # axial q
    zf = (lat * C_2THIRD) / size                        # axial r
    yf = (0 - xf) - zf                                  # cube y

with the non-dyadic constants materialized as correctly-rounded Python
doubles and injected as LITERALS (via repr) into BOTH the Spark
expression and the DuckDB oracle — identical operands, identical ops,
identical bits on any IEEE-754 engine. Cube rounding uses
``floor(v + 0.5)`` (HALF-UP; ``round()`` is banned here because Spark
rounds HALF_UP while DuckDB rounds HALF_EVEN) kept as an exact
integer-valued DOUBLE for the residual compares, and the cube
constraint ``q + y + r = 0`` is restored with exact integer-valued
double arithmetic before the final BIGINT cast.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Correctly-rounded doubles, shared verbatim (via repr) with the SQL
# oracle — see module docstring.
C_SQRT3_3 = math.sqrt(3.0) / 3.0  # sqrt(3)/3: two correctly-rounded ops
C_THIRD = 1.0 / 3.0
C_2THIRD = 2.0 / 3.0

# Pointy-top axial neighbor offsets, ring 1 (self excluded).
AXIAL_NEIGHBORS: list[tuple[int, int]] = [
    (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1),
]


def _check_size(size: float) -> None:
    if not (isinstance(size, float) and size > 0.0):
        raise ValueError(f"size must be a positive float, got {size!r}")


def hex_cell_df(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    size: float = 0.25,
    out_q: str = "hq",
    out_r: str = "hr",
) -> DataFrame:
    """Append pointy-top axial hex coordinates ``(out_q, out_r)``
    (BIGINT) for each row's (lat, lon) at circumradius ``size``
    degrees. Pure native projection — whole-stage codegen, no shuffle,
    no UDF.

    The intermediate fractional / rounded values are materialized as
    named columns so each step is computed once (Spark does not CSE
    across one wide projection) and the op-chain is pinned for the
    bit-exactness contract.
    """
    _check_size(size)
    tmp = [
        "_hxf", "_hzf", "_hyf", "_hfx", "_hfy", "_hfz",
        "_hdx", "_hdy", "_hdz",
    ]
    out = (
        df.withColumn(
            "_hxf",
            (
                F.col(lon_col) * F.lit(C_SQRT3_3)
                - F.col(lat_col) * F.lit(C_THIRD)
            )
            / F.lit(size),
        )
        .withColumn("_hzf", F.col(lat_col) * F.lit(C_2THIRD) / F.lit(size))
        .withColumn("_hyf", (F.lit(0.0) - F.col("_hxf")) - F.col("_hzf"))
        # HALF-UP round kept as exact integer-valued doubles
        .withColumn("_hfx", F.floor(F.col("_hxf") + F.lit(0.5)).cast("double"))
        .withColumn("_hfy", F.floor(F.col("_hyf") + F.lit(0.5)).cast("double"))
        .withColumn("_hfz", F.floor(F.col("_hzf") + F.lit(0.5)).cast("double"))
        .withColumn("_hdx", F.abs(F.col("_hfx") - F.col("_hxf")))
        .withColumn("_hdy", F.abs(F.col("_hfy") - F.col("_hyf")))
        .withColumn("_hdz", F.abs(F.col("_hfz") - F.col("_hzf")))
        # cube-round tie-break: recompute the axis with the largest
        # residual from the other two (q + y + r = 0). Only q (=x) and
        # r (=z) are emitted, so the dy-branch correction (to y) is a
        # no-op for both outputs.
        .withColumn(
            out_q,
            F.when(
                (F.col("_hdx") > F.col("_hdy")) & (F.col("_hdx") > F.col("_hdz")),
                (F.lit(0.0) - F.col("_hfy")) - F.col("_hfz"),
            )
            .otherwise(F.col("_hfx"))
            .cast("bigint"),
        )
        .withColumn(
            out_r,
            F.when(
                (F.col("_hdx") > F.col("_hdy")) & (F.col("_hdx") > F.col("_hdz")),
                F.col("_hfz"),
            )
            .when(F.col("_hdy") > F.col("_hdz"), F.col("_hfz"))
            .otherwise((F.lit(0.0) - F.col("_hfx")) - F.col("_hfy"))
            .cast("bigint"),
        )
    )
    return out.drop(*tmp)


def hex_py(lat: float, lon: float, size: float = 0.25) -> tuple[int, int]:
    """Scalar replay of hex_cell_df's exact op chain (test oracle)."""
    xf = (lon * C_SQRT3_3 - lat * C_THIRD) / size
    zf = (lat * C_2THIRD) / size
    yf = (0.0 - xf) - zf
    fx = float(math.floor(xf + 0.5))
    fy = float(math.floor(yf + 0.5))
    fz = float(math.floor(zf + 0.5))
    dx, dy, dz = abs(fx - xf), abs(fy - yf), abs(fz - zf)
    if dx > dy and dx > dz:
        return int((0.0 - fy) - fz), int(fz)
    if dy > dz:
        return int(fx), int(fz)
    return int(fx), int((0.0 - fx) - fy)


def hex_center(hq: int, hr: int, size: float = 0.25) -> tuple[float, float]:
    """(lat, lon) center of an axial hex (forward transform; test aid)."""
    lat = size * 1.5 * hr
    lon = size * math.sqrt(3.0) * (hq + hr / 2.0)
    return lat, lon


def hex_counts(
    pts: DataFrame,
    size: float = 0.25,
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Per-hex point counts: ``(hq, hr, n)``. One narrow shuffle
    (map-side combinable hash aggregate on the derived key)."""
    return (
        hex_cell_df(pts, lat_col, lon_col, size)
        .groupBy("hq", "hr")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def hex_disk_offsets(k: int) -> list[tuple[int, int]]:
    """Axial offsets of the radius-``k`` hex disk (3k(k+1)+1 cells):
    all (dq, dr) with hex distance (|dq| + |dr| + |dq + dr|) / 2 <= k,
    in deterministic (dq, dr) order."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return [
        (dq, dr)
        for dq in range(-k, k + 1)
        for dr in range(-k, k + 1)
        if (abs(dq) + abs(dr) + abs(dq + dr)) // 2 <= k
    ]


def hex_kring_counts(
    pts: DataFrame,
    size: float = 0.25,
    lat_col: str = "lat",
    lon_col: str = "lon",
    k: int = 1,
) -> DataFrame:
    """Isotropic radius-``k`` density smoothing on the hex lattice:
    count points per hex, scatter each hex's count to every cell of
    its k-disk (3k(k+1)+1 cells — 7 at k=1), re-aggregate. Returns
    ``(hq, hr, n_ring)`` for every hex whose k-disk holds at least one
    point.

    The hex twin of tiling.grid_smooth, with the kernel the square
    grid cannot give you: every ring-1 neighbor is exactly one
    hex-width away (a 3x3 box over-weights its sqrt(2)-distant
    diagonals), and the k-disk stays round where a (2k+1)^2 box grows
    corners.

    Scale: the first aggregate collapses points to occupied hexes
    BEFORE the scatter, so the Generate is |disk| x |occupied hexes|,
    not |disk| x |points|; two narrow shuffles, all whole-stage
    codegen.
    """
    counts = hex_counts(pts, size, lat_col, lon_col)
    window = F.array(
        *[
            F.struct(F.lit(dq).alias("dq"), F.lit(dr).alias("dr"))
            for dq, dr in hex_disk_offsets(k)
        ]
    )
    return (
        counts.withColumn("_d", F.explode(window))
        .select(
            (F.col("hq") + F.col("_d.dq")).alias("hq"),
            (F.col("hr") + F.col("_d.dr")).alias("hr"),
            "n",
        )
        .groupBy("hq", "hr")
        .agg(F.sum("n").alias("n_ring"))
    )
