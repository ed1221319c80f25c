"""Within-radius spatial distance join (SURVEY.md §2.3 G-family, r3).

``distance_join(left, right, radius)`` returns every (left, right) pair
within ``radius`` of each other — the reference r-tree's fixed-radius
range query (BASELINE.json:6 class) as ONE equi-join plan:

  1. pick the coarsest cell level whose cell extent >= the radius in
     both axes (so all matches of a point lie in its 3x3 cell window);
  2. left side: quantize (x, y) ONCE, explode a 9-literal (dx, dy)
     array, re-encode the neighbor cell AFTER the Generate — the
     explode itself carries no Morton expression trees (the r3
     multi-level-PIP lesson: exploding full encode expressions knocks
     the Generate out of whole-stage codegen);
  3. right side: its own cell id;
  4. shuffle equi-join on cell, native distance refine (<= radius).

Candidate multiplicity is exactly 1 per true pair (lat rows outside the
grid are filtered, not clamped; lon wraps mod n), so there is no
dedup shuffle after the join. Everything is whole-stage codegen — no
Python stage anywhere.

Scale: one shuffle per side on cell ids sized by the radius. Dense
cells fan out quadratically in the OUTPUT (inherent to the operator,
not the plan); AQE skew-join splits oversized shuffle partitions, and
callers with a known hot extent can pre-filter or salt as in pip_join.

Metrics:
  - ``haversine``   radius in meters, refine via the same native
    expression as operators/measures.py (DEG2RAD literal multiply).
  - ``euclid2_deg`` radius in DEGREES, refine on squared degree
    distance — IEEE +,-,* only, bit-reproducible across engines, used
    by the driver gate (q_distance_join) exactly like the kNN oracles.
    It is a FLAT degree-space metric: pairs whose shortest path crosses
    the antimeridian measure the long way round (wrap-window candidates
    simply fail the refine — no false positives). Use haversine for
    real geography.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import MAX_LEVEL, _quant_col, cell_size_deg, xy_to_cell_col
from .measures import _hav_m

__all__ = [
    "distance_join",
    "frechet_join",
    "hausdorff_join",
    "pick_distance_level",
    "snap_to_segments",
]

# conservative meters-per-degree floors (true value varies with latitude)
_M_PER_DEG_LAT = 110_567.0
_M_PER_DEG_LON_EQ = 111_319.0


def pick_distance_level(radius: float, metric: str, max_abs_lat: float = 85.0) -> int:
    """Coarsest level whose cell extent covers ``radius`` in both axes."""
    if metric == "euclid2_deg":
        r_lat = r_lon = float(radius)
    elif metric == "haversine":
        r_lat = radius / _M_PER_DEG_LAT
        r_lon = radius / (_M_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)))
    else:
        raise ValueError(f"unknown metric {metric!r}")
    if r_lat <= 0 or r_lon <= 0:
        raise ValueError("radius must be positive")
    lv = min(int(math.floor(math.log2(180.0 / r_lat))), int(math.floor(math.log2(360.0 / r_lon))))
    return max(2, min(MAX_LEVEL, lv))  # level>=2 so the 3x3 lon wrap never self-dups


def distance_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    metric: str = "haversine",
    level: int | None = None,
    left_id: str = "id",
    right_id: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    max_abs_lat: float = 85.0,
) -> DataFrame:
    """All (id_a, id_b, dist) pairs with distance <= ``radius``.

    ``dist`` is meters for ``haversine``, SQUARED degrees for
    ``euclid2_deg`` (radius is compared against dist in those same
    units: ``dist2 <= radius*radius``). Pairs where both sides are the
    same id column name and value are NOT suppressed — self-join
    callers filter ``id_a < id_b`` themselves (cheaper than a generic
    guard, and asymmetric joins have no self-pairs).
    """
    if level is None:
        level = pick_distance_level(radius, metric, max_abs_lat)
    if not 2 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [2, {MAX_LEVEL}], got {level}")
    n = 1 << level
    dlat, dlon = cell_size_deg(level)
    if metric == "haversine":
        if dlat * _M_PER_DEG_LAT < radius or (
            dlon * _M_PER_DEG_LON_EQ * math.cos(math.radians(max_abs_lat)) < radius
        ):
            raise ValueError(f"level {level} cells are smaller than radius {radius} m")
    elif metric == "euclid2_deg":
        if dlat < radius or dlon < radius:
            raise ValueError(f"level {level} cells are smaller than radius {radius} deg")
    else:
        raise ValueError(f"unknown metric {metric!r}")

    window = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    lt = (
        left.select(
            F.col(left_id).alias("id_a"),
            F.col(lat_col).alias("_lat_a"),
            F.col(lon_col).alias("_lon_a"),
            _quant_col(F.col(lon_col), 180.0, 360.0, level).alias("_x"),
            _quant_col(F.col(lat_col), 90.0, 180.0, level).alias("_y"),
        )
        .withColumn("_d", F.explode(window))
        .withColumn("_ny", F.col("_y") + F.col("_d.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_nx", F.pmod(F.col("_x") + F.col("_d.dx"), F.lit(n)))
        .select(
            "id_a",
            "_lat_a",
            "_lon_a",
            xy_to_cell_col(F.col("_nx"), F.col("_ny"), level).alias("_cell"),
        )
    )
    rt = right.select(
        F.col(right_id).alias("id_b"),
        F.col(lat_col).alias("_lat_b"),
        F.col(lon_col).alias("_lon_b"),
        _quant_col(F.col(lon_col), 180.0, 360.0, level).alias("_x"),
        _quant_col(F.col(lat_col), 90.0, 180.0, level).alias("_y"),
    ).select("id_b", "_lat_b", "_lon_b", xy_to_cell_col(F.col("_x"), F.col("_y"), level).alias("_cell"))

    j = lt.join(rt, "_cell")
    if metric == "haversine":
        dist = _hav_m(F.col("_lat_a"), F.col("_lon_a"), F.col("_lat_b"), F.col("_lon_b"))
        cond = dist <= F.lit(float(radius))
    else:
        dla = F.col("_lat_a") - F.col("_lat_b")
        dlo = F.col("_lon_a") - F.col("_lon_b")
        dist = dla * dla + dlo * dlo
        cond = dist <= F.lit(float(radius) * float(radius))
    return j.select("id_a", "id_b", dist.alias("dist")).where(cond)


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    radius: float,
    level: int | None = None,
    point_id: str = "doc_id",
    max_seg_cells: int = 64,
) -> DataFrame:
    """Map-matching primitive: snap each point to its nearest line
    segment within ``radius`` DEGREES (flat euclid2_deg metric, same
    posture as distance_join's gate metric). Points with no segment in
    range produce no row.

    points:   (point_id, lat, lon)
    segments: (seg_id, alat, alon, blat, blon) — SHORT segments (road
              graph edges); a segment spanning more than
              ``max_seg_cells`` cover cells at the chosen level fails
              loudly (pre-split long lines with the supercover in
              operators/tiling.py first).

    Returns (point_id, seg_id, d2) — ``d2`` the squared degree distance
    to the winning segment; ties broken by smallest seg_id.

    Plan (all native, no Python stage):
      1. level = coarsest cell >= radius (same guarantee as
         distance_join: every in-range segment point lies in the
         point's 3x3 cell window);
      2. points explode their 9-cell window; segments explode their
         bbox cell cover (two nested native sequence Generates);
      3. equi-join on cell — a (point, segment) pair may appear
         SEVERAL times (segment covers several window cells), which is
         harmless because the final per-point min(struct(d2, seg_id))
         aggregate is idempotent — no dedup shuffle;
      4. exact point-to-segment refine: the inside/outside test
         compares dot vs len2 (multiplication only — engine-exact);
         the single division cross^2/len2 is IEEE-correctly-rounded
         and identical across engines.

    One shuffle per side + one hash aggregate. Skewed cells (urban
    cores) split via AQE skew-join like every equi-join in this module.
    """
    metric = "euclid2_deg"
    if level is None:
        level = pick_distance_level(radius, metric)
    if not 2 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [2, {MAX_LEVEL}], got {level}")
    n = 1 << level
    dlat, dlon = cell_size_deg(level)
    if dlat < radius or dlon < radius:
        raise ValueError(f"level {level} cells are smaller than radius {radius} deg")

    window = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dy in (-1, 0, 1)
            for dx in (-1, 0, 1)
        ]
    )
    pts = (
        points.select(
            F.col(point_id).alias("_pid"),
            F.col("lat").alias("_plat"),
            F.col("lon").alias("_plon"),
            _quant_col(F.col("lon"), 180.0, 360.0, level).alias("_x"),
            _quant_col(F.col("lat"), 90.0, 180.0, level).alias("_y"),
        )
        .withColumn("_d", F.explode(window))
        .withColumn("_ny", F.col("_y") + F.col("_d.dy"))
        .where((F.col("_ny") >= 0) & (F.col("_ny") < n))
        .withColumn("_nx", F.pmod(F.col("_x") + F.col("_d.dx"), F.lit(n)))
        .select(
            "_pid", "_plat", "_plon",
            xy_to_cell_col(F.col("_nx"), F.col("_ny"), level).alias("_cell"),
        )
    )

    seg = segments.select(
        F.col("seg_id").alias("_sid"),
        F.col("alat").alias("_alat"), F.col("alon").alias("_alon"),
        F.col("blat").alias("_blat"), F.col("blon").alias("_blon"),
        _quant_col(F.least("alon", "blon"), 180.0, 360.0, level).alias("_x0"),
        _quant_col(F.greatest("alon", "blon"), 180.0, 360.0, level).alias("_x1"),
        _quant_col(F.least("alat", "blat"), 90.0, 180.0, level).alias("_y0"),
        _quant_col(F.greatest("alat", "blat"), 90.0, 180.0, level).alias("_y1"),
    )
    # guard lives in a WHERE (an unused projected column would be
    # pruned by Catalyst and the check would never run)
    fanout = (F.col("_x1") - F.col("_x0") + 1) * (F.col("_y1") - F.col("_y0") + 1)
    seg = seg.where(
        F.when(fanout <= F.lit(int(max_seg_cells)), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("snap_to_segments: segment "),
                    F.col("_sid").cast("string"),
                    F.lit(f" covers > {max_seg_cells} cells at level {level}; "
                          "pre-split long segments"),
                )
            )
        )
    )
    seg = (
        seg.withColumn("_sx", F.explode(F.sequence(F.col("_x0"), F.col("_x1"))))
        .withColumn("_sy", F.explode(F.sequence(F.col("_y0"), F.col("_y1"))))
        .select(
            "_sid", "_alat", "_alon", "_blat", "_blon",
            xy_to_cell_col(F.col("_sx"), F.col("_sy"), level).alias("_cell"),
        )
    )

    j = pts.join(seg, "_cell")
    # exact point-to-segment squared distance (degree plane)
    ux = F.col("_blon") - F.col("_alon")
    uy = F.col("_blat") - F.col("_alat")
    vx = F.col("_plon") - F.col("_alon")
    vy = F.col("_plat") - F.col("_alat")
    wx = F.col("_plon") - F.col("_blon")
    wy = F.col("_plat") - F.col("_blat")
    dot = ux * vx + uy * vy
    len2 = ux * ux + uy * uy
    cross = ux * vy - uy * vx
    d2 = (
        F.when((len2 == 0) | (dot <= 0), vx * vx + vy * vy)
        .when(dot >= len2, wx * wx + wy * wy)
        .otherwise(cross * cross / len2)
    )
    cand = j.select(
        F.col("_pid"), F.col("_sid"), d2.alias("_d2")
    ).where(F.col("_d2") <= F.lit(float(radius) * float(radius)))
    best = cand.groupBy("_pid").agg(
        F.min(F.struct(F.col("_d2"), F.col("_sid"))).alias("_best")
    )
    return best.select(
        F.col("_pid").alias(point_id),
        F.col("_best._sid").alias("seg_id"),
        F.col("_best._d2").alias("d2"),
    )


def hausdorff_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    level: int,
    left_id: str = "track_id",
    right_id: str = "track_id",
) -> DataFrame:
    """Trajectory-similarity join: all (id_a, id_b, h2) track pairs
    whose symmetric DISCRETE HAUSDORFF distance is <= ``radius``
    (euclid2_deg: ``h2`` is the squared distance on the snapped
    micro-degree integer grid, radius in degrees) — the r-tree
    family's trajectory query, and the classic GPS-trace dedup /
    map-matching-candidate primitive.

    Sides carry ``(id, pts: array<struct<lat: double, lon: double>>)``
    (ordered or not — Hausdorff ignores order). Exactness: coordinates
    snap to the segjoin.py micro-degree grid natively, every pairwise
    d2 is an int64 (products <= ~5e17 < 2^63), and max/min over exact
    ints is engine-independent — so the gate can hash h2 values.

    Plan — the asymmetric-expansion variant of the bbox cover join:

      1. per-track snapped int arrays + bbox, all native;
      2. the LEFT side explodes its bbox cover EXPANDED by one cell
         ring (cells sized >= radius, validated), the right side its
         plain cover → tracks within ``radius`` always co-occur in
         some cell;
      3. one (cx, cy) equi-join + responsibility-cell dedup at the
         expanded-intersection min corner — multiplicity exactly 1,
         no distinct shuffle — plus an exact snapped-bbox prefilter
         (bboxes farther than radius apart cannot hold a pair);
      4. ONE Arrow-batched mapInPandas refine: numpy (na x nb) d2
         matrix per candidate pair, h2 = max(max-min by rows,
         max-min by cols), filter h2 <= r2.

    Self-join callers filter ``id_a < id_b`` themselves.
    """
    cand, r2 = _track_candidates(left, right, radius, level, left_id, right_id)

    import numpy as np
    import pandas as pd

    def refine(it):
        for pdf in it:
            ids_a, ids_b, h2s = [], [], []
            for id_a, xa, ya, id_b, xb, yb in zip(
                pdf["id_a"], pdf["xs_a"], pdf["ys_a"],
                pdf["id_b"], pdf["xs_b"], pdf["ys_b"],
            ):
                dx = np.asarray(xa, dtype=np.int64)[:, None] - np.asarray(xb, dtype=np.int64)[None, :]
                dy = np.asarray(ya, dtype=np.int64)[:, None] - np.asarray(yb, dtype=np.int64)[None, :]
                d2 = dx * dx + dy * dy
                h2 = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
                if h2 <= r2:
                    ids_a.append(id_a)
                    ids_b.append(id_b)
                    h2s.append(h2)
            yield pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "h2": h2s})

    out_schema = (
        f"id_a {cand.schema['id_a'].dataType.simpleString()}, "
        f"id_b {cand.schema['id_b'].dataType.simpleString()}, h2 bigint"
    )
    return cand.mapInPandas(refine, schema=out_schema)


def _track_candidates(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    level: int,
    left_id: str,
    right_id: str,
) -> tuple[DataFrame, int]:
    """Shared candidate stage of the trajectory-similarity joins
    (hausdorff_join, frechet_join): asymmetric-expansion cell-cover
    equi-join + responsibility-cell dedup + exact snapped-bbox
    prefilter. Returns ``(candidates, r2)`` where candidates carries
    ``(id_a, xs_a, ys_a, id_b, xs_b, ys_b)`` snapped int arrays with
    multiplicity exactly 1 per surviving pair, and ``r2`` is the
    squared radius on the snapped grid.

    Sound for ANY track metric >= Hausdorff (Frechet is): metric <= r
    implies Hausdorff <= r implies the pair co-occurs in a cell and
    passes the bbox prefilter.
    """
    if not 2 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [2, {MAX_LEVEL}], got {level}")
    dlat, dlon = cell_size_deg(level)
    if dlat < radius or dlon < radius:
        raise ValueError(
            f"level {level} cells ({dlat} x {dlon} deg) are smaller than "
            f"radius {radius} deg — the one-ring expansion would miss pairs"
        )
    from .overlay import _snap_arr
    from .segjoin import SEG_SNAP_SCALE

    r2 = int(math.ceil(radius * SEG_SNAP_SCALE)) ** 2

    def prep(df: DataFrame, ident: str, suffix: str, expand: int) -> DataFrame:
        lats = F.transform("pts", lambda p: p["lat"])
        lons = F.transform("pts", lambda p: p["lon"])
        # quantized bbox, then an `expand`-cell ring (clamped to the
        # grid) — expansion happens on the QUANTIZED ints, so the
        # Morton-free Generate stays whole-stage codegen
        n = 1 << level
        x0 = _quant_col(F.array_min(lons), 180.0, 360.0, level)
        x1 = _quant_col(F.array_max(lons), 180.0, 360.0, level)
        y0 = _quant_col(F.array_min(lats), 90.0, 180.0, level)
        y1 = _quant_col(F.array_max(lats), 90.0, 180.0, level)
        boxed = df.select(
            F.col(ident).alias(f"id_{suffix}"),
            _snap_arr(F.col("pts"), "lon").alias(f"xs_{suffix}"),
            _snap_arr(F.col("pts"), "lat").alias(f"ys_{suffix}"),
            F.greatest(x0 - F.lit(expand), F.lit(0).cast("long")).alias(f"_x0_{suffix}"),
            F.least(x1 + F.lit(expand), F.lit(n - 1).cast("long")).alias(f"_x1_{suffix}"),
            F.greatest(y0 - F.lit(expand), F.lit(0).cast("long")).alias(f"_y0_{suffix}"),
            F.least(y1 + F.lit(expand), F.lit(n - 1).cast("long")).alias(f"_y1_{suffix}"),
        )
        return boxed.select(
            "*",
            F.explode(F.sequence(F.col(f"_y0_{suffix}"), F.col(f"_y1_{suffix}"))).alias("_cy"),
        ).select(
            "*",
            F.explode(F.sequence(F.col(f"_x0_{suffix}"), F.col(f"_x1_{suffix}"))).alias("_cx"),
        )

    lt = prep(left, left_id, "a", 1)
    rt = prep(right, right_id, "b", 0)
    j = lt.join(rt, ["_cy", "_cx"])
    responsible = (F.col("_cx") == F.greatest("_x0_a", "_x0_b")) & (
        F.col("_cy") == F.greatest("_y0_a", "_y0_b")
    )
    rsnap = F.lit(int(math.ceil(radius * SEG_SNAP_SCALE))).cast("long")
    bbox_near = (
        (F.array_min("xs_a") <= F.array_max("xs_b") + rsnap)
        & (F.array_min("xs_b") <= F.array_max("xs_a") + rsnap)
        & (F.array_min("ys_a") <= F.array_max("ys_b") + rsnap)
        & (F.array_min("ys_b") <= F.array_max("ys_a") + rsnap)
    )
    cand = j.where(responsible & bbox_near).select(
        "id_a", "xs_a", "ys_a", "id_b", "xs_b", "ys_b"
    )
    return cand, r2


def _frechet2_diag(d2):
    """Discrete-Frechet squared distance of one candidate pair from its
    exact int64 (na x nb) d2 matrix — the coupled-walk DP

        dp[i,j] = max(d2[i,j], min(dp[i-1,j], dp[i,j-1], dp[i-1,j-1]))

    vectorized over ANTI-DIAGONALS (entries of one diagonal depend only
    on the two previous diagonals, never on each other — the standard
    DTW/Frechet parallelization), so the kernel is ~(na+nb) numpy ops
    instead of na*nb Python ops. All values exact int64."""
    import numpy as np

    na, nb = d2.shape
    big = np.iinfo(np.int64).max
    prev2 = None  # diagonal s-2, aligned to its own i-offset
    prev = None   # diagonal s-1
    o_prev2 = o_prev = 0
    for s in range(na + nb - 1):
        i0 = max(0, s - nb + 1)
        i1 = min(na - 1, s)
        idx = np.arange(i0, i1 + 1)
        vals = d2[idx, s - idx]
        if s == 0:
            cur = vals.copy()
        else:

            def pull(diag, off, want_i):
                # value at absolute row want_i of a stored diagonal
                out = np.full(len(idx), big, dtype=np.int64)
                if diag is None:
                    return out
                pos = want_i - off
                ok = (pos >= 0) & (pos < len(diag)) & (want_i >= 0)
                out[ok] = diag[pos[ok]]
                return out

            up = pull(prev, o_prev, idx - 1)        # dp[i-1, j]
            lf = pull(prev, o_prev, idx)            # dp[i, j-1]
            dg = pull(prev2, o_prev2, idx - 1)      # dp[i-1, j-1]
            # (i-1,j) invalid when i==0; (i,j-1) invalid when j==0 i.e.
            # i==s; both encoded by the range checks above except the
            # boundary rows of THIS diagonal, which pull() handles via
            # absolute-row bounds. j-1 < 0 happens only for i == s,
            # where prev holds no row i (its i1 == s-1) -> stays big.
            best = np.minimum(np.minimum(up, lf), dg)
            # the very first cell of a boundary walk: dp[0, j] depends
            # only on dp[0, j-1]; dp[i, 0] only on dp[i-1, 0]; the pull
            # defaults make the missing arms +inf, which is correct.
            cur = np.maximum(vals, best)
        prev2, o_prev2 = prev, o_prev
        prev, o_prev = cur, i0
    # the final diagonal (s = na+nb-2) holds exactly dp[na-1, nb-1]
    return int(cur[0])


def frechet_py(pa, pb):
    """Scalar pure-Python discrete-Frechet DP over snapped int coords
    (test + gate oracle reference — independent of the numpy kernel).
    ``pa``/``pb`` are lists of (x, y) int tuples."""
    na, nb = len(pa), len(pb)
    dp = [[0] * nb for _ in range(na)]
    for i in range(na):
        for j in range(nb):
            dx = pa[i][0] - pb[j][0]
            dy = pa[i][1] - pb[j][1]
            d2 = dx * dx + dy * dy
            if i == 0 and j == 0:
                reach = d2
            elif i == 0:
                reach = max(d2, dp[0][j - 1])
            elif j == 0:
                reach = max(d2, dp[i - 1][0])
            else:
                reach = max(d2, min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]))
            dp[i][j] = reach
    return dp[na - 1][nb - 1]


def frechet_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    level: int,
    left_id: str = "track_id",
    right_id: str = "track_id",
) -> DataFrame:
    """Trajectory-similarity join on DISCRETE FRECHET distance: all
    (id_a, id_b, f2) pairs with coupled-walk distance <= ``radius``
    (euclid2_deg; ``f2`` is the squared distance on the snapped
    micro-degree integer grid).

    Frechet is the ORDER-AWARE track metric Hausdorff is not: two
    vehicles driving the same road in OPPOSITE directions are near-zero
    Hausdorff but large Frechet, so this is the right join for
    direction-sensitive trace dedup / co-movement mining. (Reversing a
    track changes its Frechet neighbors — that is the semantics, not a
    bug. The coupling itself is symmetric in the pair.)

    Plan: the exact candidate stage is SHARED with hausdorff_join
    (asymmetric-expansion cell cover + responsibility-cell dedup +
    snapped-bbox prefilter — sound because Frechet >= Hausdorff, so
    every Frechet-near pair is Hausdorff-near), then ONE Arrow-batched
    mapInPandas refine runs the anti-diagonal-vectorized DP per
    candidate pair. All distances exact int64 ⇒ ``f2`` is
    gate-hashable; the driver oracle (q_frechet) replays a brute-force
    all-pairs SCALAR DP in pure Python — independent plumbing and an
    independent kernel formulation of the same spec.

    Cost: O(na*nb) per surviving candidate pair (inherent to exact
    Frechet) but only ~(na+nb) numpy ops; candidates are bounded by
    the cell cover exactly as in hausdorff_join.

    Self-join callers filter ``id_a < id_b`` themselves.
    """
    cand, r2 = _track_candidates(left, right, radius, level, left_id, right_id)

    import numpy as np
    import pandas as pd

    def refine(it):
        for pdf in it:
            ids_a, ids_b, f2s = [], [], []
            for id_a, xa, ya, id_b, xb, yb in zip(
                pdf["id_a"], pdf["xs_a"], pdf["ys_a"],
                pdf["id_b"], pdf["xs_b"], pdf["ys_b"],
            ):
                dx = np.asarray(xa, dtype=np.int64)[:, None] - np.asarray(xb, dtype=np.int64)[None, :]
                dy = np.asarray(ya, dtype=np.int64)[:, None] - np.asarray(yb, dtype=np.int64)[None, :]
                d2 = dx * dx + dy * dy
                # cheap exact lower bound first: Hausdorff <= Frechet,
                # so a pair failing Hausdorff needs no DP at all
                h2 = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
                if h2 > r2:
                    continue
                f2 = _frechet2_diag(d2)
                if f2 <= r2:
                    ids_a.append(id_a)
                    ids_b.append(id_b)
                    f2s.append(f2)
            yield pd.DataFrame({"id_a": ids_a, "id_b": ids_b, "f2": f2s})

    out_schema = (
        f"id_a {cand.schema['id_a'].dataType.simpleString()}, "
        f"id_b {cand.schema['id_b'].dataType.simpleString()}, f2 bigint"
    )
    return cand.mapInPandas(refine, schema=out_schema)


def idw_interpolate(
    points: DataFrame,
    stations: DataFrame,
    radius: float,
    value_col: str = "v",
    metric: str = "euclid2_deg",
    level: int | None = None,
    point_id: str = "doc_id",
    station_id: str = "station_id",
) -> DataFrame:
    """Inverse-distance-weighted spatial interpolation: every point
    gets the IDW (power 2) average of station values within ``radius``.

        idw = sum(w_i * v_i) / sum(w_i),   w_i = r^2 / d2_i

    Exactness posture: each weight is quantized to an int64
    ``round((r2 / d2) * 1e6)`` — division and multiplication are
    exactly rounded IEEE ops, so both engines compute identical bits
    BEFORE the round and the sums are exact integers (order-free). A
    point exactly on a station (d2 = 0) takes the MINIMUM coincident
    station value (the deterministic exact-hit convention) instead of
    dividing by zero. Overflow bound: ANSI mode THROWS (loudly) if
    sum(w*v) exceeds int64 — at the 1e6 weight scale that needs
    ~1e12-weight-sum x values, i.e. stations ~1e-6*r2 squared-degrees
    from a point with large values; quantize values or shrink the
    scale for such corpora.

    Returns (point_id, n_stations, idw_value:double) for points with
    >= 1 station in range (no-neighbor points are absent, like any
    inner spatial join).

    Plan: the cell-window distance_join (one keyed shuffle) + one
    per-point hash aggregate.
    """
    r2 = float(radius) * float(radius)
    pairs = distance_join(
        points,
        stations,
        radius,
        metric=metric,
        level=level,
        left_id=point_id,
        right_id=station_id,
    )
    sv = stations.select(
        F.col(station_id).alias("id_b"), F.col(value_col).alias("_v")
    )
    j = pairs.join(sv, "id_b")
    w_q = F.round(F.lit(r2) / F.col("dist") * F.lit(1000000.0)).cast("bigint")
    hit = F.col("dist") == 0.0
    agg = j.groupBy("id_a").agg(
        F.count(F.lit(1)).alias("n_stations"),
        F.sum(F.when(hit, 1).otherwise(0)).alias("_nhit"),
        F.min(F.when(hit, F.col("_v"))).alias("_vhit"),
        F.sum(F.when(~hit, w_q * F.col("_v")).otherwise(F.lit(0))).alias("_num"),
        F.sum(F.when(~hit, w_q).otherwise(F.lit(0))).alias("_den"),
    )
    idw = F.when(F.col("_nhit") > 0, F.col("_vhit").cast("double")).otherwise(
        F.col("_num").cast("double") / F.col("_den").cast("double")
    )
    return agg.select(
        F.col("id_a").alias(point_id), "n_stations", idw.alias("idw_value")
    )


def voronoi_assign(
    points: DataFrame,
    sites: DataFrame,
    point_id: str = "doc_id",
    site_id: str = "station_id",
    point_lat: str = "lat",
    point_lon: str = "lon",
    site_lat: str = "s_lat",
    site_lon: str = "s_lon",
    method: str = "broadcast",
    level: int = 6,
) -> DataFrame:
    """Nearest-site assignment: label every point with the site whose
    cell it falls in under the sites' Voronoi diagram — catchment
    areas, facility assignment, zonal stats keyed by nearest station.

    Metric is exact planar squared degrees ``(dlat^2 + dlon^2)`` —
    explicit multiplies, the engine-portable d2 every spatial gate in
    this repo hashes. Ties (equidistant sites) break to the MIN site
    id, deterministically.

    Returns ``(point_id, site_id, d2)`` — one row per input point.

    Two physical paths, same output:
      - ``broadcast`` (default): sites broadcast, points map-side
        crossJoin + one partial-aggregated min(struct(d2, site)) per
        point — ZERO point-side shuffle beyond the agg's partial/final
        exchange; right for the overwhelmingly common 10^2..10^5-site
        dimension against 10^12 points.
      - ``two_round``: the exact k=1 kNN plan (knn.knn_two_round) for
        site tables too big to broadcast — ~5 shuffles, no driver
        pacing, never capped on round B, so it is exact too.
    """
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(point_lat).alias("_plat"),
        F.col(point_lon).alias("_plon"),
    )
    if method == "two_round":
        from .knn import knn_two_round

        out = knn_two_round(
            points.sparkSession,
            points.select(F.col(point_id).alias("doc_id"),
                          F.col(point_lat).alias("lat"),
                          F.col(point_lon).alias("lon")),
            sites.select(F.col(site_id).alias("doc_id"),
                         F.col(site_lat).alias("lat"),
                         F.col(site_lon).alias("lon")),
            k=1,
            level=level,
            metric="euclid2_deg",
            exclude_self=False,
        )
        return out.select(
            F.col("query_id").alias("point_id"),
            F.col("neighbor_id").alias("site_id"),
            F.col("dist").alias("d2"),
        )
    if method != "broadcast":
        raise ValueError(f"unknown method {method!r}")
    st = sites.select(
        F.col(site_id).alias("_sid"),
        F.col(site_lat).alias("_slat"),
        F.col(site_lon).alias("_slon"),
    )
    dla = F.col("_plat") - F.col("_slat")
    dlo = F.col("_plon") - F.col("_slon")
    d2 = dla * dla + dlo * dlo
    best = (
        pts.crossJoin(F.broadcast(st))
        .select("point_id", F.struct(d2.alias("d2"), F.col("_sid").alias("sid")).alias("_c"))
        .groupBy("point_id")
        .agg(F.min("_c").alias("_b"))
    )
    return best.select(
        "point_id",
        F.col("_b.sid").alias("site_id"),
        F.col("_b.d2").alias("d2"),
    )


def lcss_py(a: list, b: list, r2: int) -> int:
    """Scalar LCSS DP replay (oracle kernel, independent of the numpy
    rolling-row kernel): longest common subsequence length where
    points match when snapped d2 <= r2."""
    n, m = len(a), len(b)
    prev = [0] * (m + 1)
    for i in range(1, n + 1):
        cur = [0] * (m + 1)
        ax, ay = a[i - 1]
        for j in range(1, m + 1):
            bx, by = b[j - 1]
            dx, dy = ax - bx, ay - by
            if dx * dx + dy * dy <= r2:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = prev[j] if prev[j] >= cur[j - 1] else cur[j - 1]
        prev = cur
    return prev[m]


def lcss_join(
    left: DataFrame,
    right: DataFrame,
    radius: float,
    level: int,
    min_sim_ppm: int = 1,
    left_id: str = "track_id",
    right_id: str = "track_id",
) -> DataFrame:
    """Trajectory-similarity join on LCSS (Vlachos et al. 2002) —
    the NOISE-TOLERANT member of the track-metric family (r4):
    Hausdorff/Frechet are sup metrics a single GPS glitch dominates;
    LCSS counts how much of two tracks aligns within ``radius`` and
    simply skips outlier fixes, so it is the right join for noisy
    co-movement mining. Returns (id_a, id_b, lcss, n_a, n_b, sim_ppm)
    for pairs with sim_ppm >= ``min_sim_ppm``, where
    ``sim_ppm = 10^6 * lcss DIV min(n_a, n_b)`` — exact integers
    end-to-end (snapped micro-degree grid, d2 <= r2 matching), so
    every output bit is engine-reproducible.

    Plan: candidates SHARED with hausdorff/frechet via
    ``_track_candidates`` — sound because sim_ppm >= 1 requires at
    least ONE matched point pair (d2 <= r2), which forces the
    expanded snapped bboxes to overlap a common cell; then ONE
    Arrow-batched mapInPandas DP refine (rolling-row numpy kernel,
    O(na*nb) per candidate — inherent to exact LCSS).

    Self-join callers filter ``id_a < id_b`` themselves.
    """
    if not 1 <= int(min_sim_ppm) <= 1_000_000:
        raise ValueError(
            f"min_sim_ppm must be in [1, 1e6], got {min_sim_ppm} "
            "(0 would emit non-co-located pairs the candidate stage "
            "soundly prunes)"
        )
    cand, r2 = _track_candidates(left, right, radius, level, left_id, right_id)

    import numpy as np
    import pandas as pd

    min_ppm = int(min_sim_ppm)

    def refine(it):
        for pdf in it:
            ids_a, ids_b, ls, nas, nbs, ppms = [], [], [], [], [], []
            for id_a, xa, ya, id_b, xb, yb in zip(
                pdf["id_a"], pdf["xs_a"], pdf["ys_a"],
                pdf["id_b"], pdf["xs_b"], pdf["ys_b"],
            ):
                axs = np.asarray(xa, dtype=np.int64)
                ays = np.asarray(ya, dtype=np.int64)
                bxs = np.asarray(xb, dtype=np.int64)
                bys = np.asarray(yb, dtype=np.int64)
                dx = axs[:, None] - bxs[None, :]
                dy = ays[:, None] - bys[None, :]
                match = (dx * dx + dy * dy) <= r2
                if not match.any():
                    continue
                n, m = len(axs), len(bxs)
                prev = np.zeros(m + 1, dtype=np.int64)
                for i in range(n):
                    diag = prev[:-1] + match[i]
                    # running combine: cur[j] = max(diag[j-1], prev[j],
                    # cur[j-1]) — the cur[j-1] dependency is a prefix
                    # max after the elementwise part
                    cur = np.maximum(diag, prev[1:])
                    np.maximum.accumulate(cur, out=cur)
                    prev = np.concatenate(([0], cur))
                lcss = int(prev[m])
                ppm = (1_000_000 * lcss) // min(n, m)
                if ppm >= min_ppm:
                    ids_a.append(id_a)
                    ids_b.append(id_b)
                    ls.append(lcss)
                    nas.append(n)
                    nbs.append(m)
                    ppms.append(ppm)
            yield pd.DataFrame(
                {"id_a": ids_a, "id_b": ids_b, "lcss": ls,
                 "n_a": nas, "n_b": nbs, "sim_ppm": ppms}
            )

    out_schema = (
        f"id_a {cand.schema['id_a'].dataType.simpleString()}, "
        f"id_b {cand.schema['id_b'].dataType.simpleString()}, "
        "lcss bigint, n_a int, n_b int, sim_ppm bigint"
    )
    return cand.mapInPandas(refine, schema=out_schema)
