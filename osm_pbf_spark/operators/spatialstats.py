"""Spatial statistics (SURVEY.md §2.3 companion, r3).

``morans_i`` computes global Moran's I — THE spatial-autocorrelation
statistic (Moran 1950; +1 clustered, ~-1/(n-1) random, -1 dispersed) —
over a grid-cell value table with binary queen (8-neighbor) weights:

    I = (n / W) * sum_ij w_ij (x_i - mean)(x_j - mean)
               / sum_i (x_i - mean)^2

Exactness posture: multiply every deviation through by n —
``d_i = n*x_i - S`` is an exact integer — so both quadratic forms are
exact int64 sums (order-free) and the final statistic is ONE division
of two exact products:  I = (n * sum_pairs d_a*d_b) / (W * sum d^2).
No floats anywhere until that division, so any engine reproduces the
bits. Overflow: ANSI mode THROWS loudly; stay exact by keeping
``n_cells * max|x|`` under ~2^31 (then d^2 sums stay < 2^63 for any
W <= 8n). Rescale or bucket x for corpora beyond that.

Plan: the neighbor quadratic form is the SAME 3x3 cell equi-join as
grid DBSCAN (one native Generate replicating the probe side 8x, one
keyed shuffle), plus two tiny aggregates riding a 1-row cross join —
no all-pairs, no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grid_cell_counts", "morans_i", "getis_ord_gi", "zonal_stats", "ripley_k"]


def grid_cell_counts(
    points: DataFrame,
    cell_deg: float,
    x_col: str = "lat",
    y_col: str = "lon",
) -> DataFrame:
    """Bucket points into cell_deg-sized grid cells: (cx, cy, x=count)."""
    return (
        points.select(
            F.floor(F.col(x_col) / F.lit(float(cell_deg))).alias("cx"),
            F.floor(F.col(y_col) / F.lit(float(cell_deg))).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("x"))
    )


def morans_i(cells: DataFrame, x_col: str = "x") -> DataFrame:
    """Global Moran's I of ``cells`` (cx, cy, x:integer) under queen
    adjacency. Returns ONE row (n_cells, w_pairs, moran_i:double)."""
    tot = cells.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.col(x_col)).alias("_s")
    )
    dev = cells.crossJoin(F.broadcast(tot)).select(
        "cx",
        "cy",
        (F.col("_n") * F.col(x_col) - F.col("_s")).cast("bigint").alias("d"),
    )
    offs = F.array(*[F.lit(i) for i in range(9) if i != 4])  # skip (0,0)
    probe = dev.select(
        F.col("d").alias("da"),
        F.explode(
            F.transform(
                offs,
                lambda i: F.struct(
                    (F.col("cx") + (i % 3) - 1).alias("cx"),
                    (F.col("cy") + (i / 3).cast("int") - 1).alias("cy"),
                ),
            )
        ).alias("nb"),
    ).select("da", F.col("nb.cx").alias("cx"), F.col("nb.cy").alias("cy"))
    pairs = probe.join(dev.withColumnRenamed("d", "db"), ["cx", "cy"])
    quad = pairs.agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.col("da") * F.col("db")).alias("_num"),
    )
    den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("_ss"))
    return (
        tot.crossJoin(quad)
        .crossJoin(den)
        .select(
            F.col("_n").alias("n_cells"),
            "w_pairs",
            (
                (F.col("_n") * F.col("_num")).cast("double")
                / (F.col("w_pairs") * F.col("_ss")).cast("double")
            ).alias("moran_i"),
        )
    )


def getis_ord_gi(cells: DataFrame, x_col: str = "x") -> DataFrame:
    """Getis–Ord Gi* hot-spot z-scores (Getis & Ord 1992/1995) per grid
    cell under binary queen weights INCLUDING self (the * variant):

        Gi* = (T_i - xbar*W_i) / (s * sqrt((n*W_i - W_i^2)/(n-1)))

    where T_i = sum of x over the existing cells in i's 3x3 window and
    W_i counts them. |z| >~ 2 marks hot (or cold) spots.

    Exactness posture (same discipline as morans_i): multiply the
    numerator through by n — ``n*T_i - S*W_i`` is an exact int64 — and
    factor the denominator as sqrt(n*S2 - S^2) * sqrt((n*W_i - W_i^2)
    / (n-1)): every remaining op (int->double cast, one division, two
    sqrts, one multiply, one divide) is a correctly-rounded IEEE op in
    a FIXED order, so Spark and DuckDB produce identical bits and the
    statistic is gate-hashable. Overflow THROWS under ANSI; keep
    n_cells * max|x| under ~2^31 (rescale/bucket beyond).

    Plan: the scatter form of the 3x3 window (each cell contributes its
    x to its 9 neighbor slots via ONE native Generate — 9x |occupied
    cells|, not 9x |points|), one keyed aggregate, an inner join back
    to existing cells, and a broadcast 1-row totals cross join. Pure
    codegen, two narrow shuffles, no Python.
    """
    tot = cells.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(x_col)).alias("_s"),
        F.sum(F.col(x_col) * F.col(x_col)).alias("_s2"),
    )
    offs = F.array(*[F.lit(i) for i in range(9)])  # (0,0) INCLUDED: Gi*
    scat = cells.select(
        F.col(x_col).alias("xb"),
        F.explode(
            F.transform(
                offs,
                lambda i: F.struct(
                    (F.col("cx") + (i % 3) - 1).alias("cx"),
                    (F.col("cy") + (i / 3).cast("int") - 1).alias("cy"),
                ),
            )
        ).alias("nb"),
    ).select("xb", F.col("nb.cx").alias("cx"), F.col("nb.cy").alias("cy"))
    win = scat.groupBy("cx", "cy").agg(
        F.count(F.lit(1)).alias("wi"), F.sum("xb").alias("ti")
    )
    j = cells.join(win, ["cx", "cy"]).crossJoin(F.broadcast(tot))
    num = (F.col("_n") * F.col("ti") - F.col("_s") * F.col("wi")).cast("bigint")
    a = (F.col("_n") * F.col("_s2") - F.col("_s") * F.col("_s")).cast("bigint")
    b = (F.col("_n") * F.col("wi") - F.col("wi") * F.col("wi")).cast("bigint")
    c = (F.col("_n") - F.lit(1)).cast("bigint")
    z = num.cast("double") / (
        F.sqrt(a.cast("double")) * F.sqrt(b.cast("double") / c.cast("double"))
    )
    return j.select(
        "cx", "cy", F.col(x_col).alias("x"), "wi", z.alias("gi_z")
    )


def zonal_stats(
    points: DataFrame,
    zones: DataFrame,
    level: int,
    value_col: str = "v",
    lat_col: str = "lat",
    lon_col: str = "lon",
    zone_id_col: str = "zone_id",
    bounds_cols: tuple[str, str, str, str] = (
        "lat_min", "lat_max", "lon_min", "lon_max"
    ),
    max_zone_cells: int = 4096,
) -> DataFrame:
    """Zonal statistics over rectangular zones — the raster-analysis
    staple (mean/min/max/sum of a value surface per zone), expressed
    as the engine's standard two-stage spatial join: cover each zone's
    bbox with grid cells at ``level`` (a bounded 2-D Generate), equi-
    join points on their cell id, refine with exact inclusive BETWEEN
    compares, aggregate per zone. Every point lands in exactly ONE
    cell, so a point matches an overlapping zone exactly once — no
    dedup stage needed.

    Exactness contract: ``value_col`` must be integral (bigint) so the
    per-zone sum is order-free exact; ``mean_v`` is the single final
    IEEE division. Zones with zero points are kept (n_pts = 0,
    NULL min/max/mean) via a left join from the zone table.

    Scale: the cover explode is bounded by ``max_zone_cells`` per zone
    (guard lives in a WHERE — Catalyst prunes unused projected
    columns); the points side shuffles once on the cell key with
    map-side partial aggregation unavailable only for min/max of the
    refine join — AQE broadcasts the (small) exploded zone side when
    it fits. A point inside k overlapping zones contributes k rows —
    inherent to the semantics, not a plan defect.
    """
    from ..functions.cells import MAX_LEVEL, _quant_col

    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}], got {level}")
    la0, la1, lo0, lo1 = bounds_cols
    z = zones.select(
        F.col(zone_id_col).alias("_zid"),
        F.col(la0).alias("_la0"), F.col(la1).alias("_la1"),
        F.col(lo0).alias("_lo0"), F.col(lo1).alias("_lo1"),
        _quant_col(F.col(lo0), 180.0, 360.0, level).alias("_x0"),
        _quant_col(F.col(lo1), 180.0, 360.0, level).alias("_x1"),
        _quant_col(F.col(la0), 90.0, 180.0, level).alias("_y0"),
        _quant_col(F.col(la1), 90.0, 180.0, level).alias("_y1"),
    )
    fanout = (F.col("_x1") - F.col("_x0") + 1) * (F.col("_y1") - F.col("_y0") + 1)
    z = z.where(
        F.when(fanout <= F.lit(int(max_zone_cells)), F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("zonal_stats: zone "),
                    F.col("_zid").cast("string"),
                    F.lit(f" covers > {max_zone_cells} cells at level "
                          f"{level}; raise level or split the zone"),
                )
            )
        )
    )
    cover = (
        z.withColumn("_cx", F.explode(F.sequence(F.col("_x0"), F.col("_x1"))))
        .withColumn("_cy", F.explode(F.sequence(F.col("_y0"), F.col("_y1"))))
        .drop("_x0", "_x1", "_y0", "_y1")
    )
    p = points.select(
        F.col(value_col).cast("bigint").alias("_v"),
        F.col(lat_col).alias("_plat"),
        F.col(lon_col).alias("_plon"),
        _quant_col(F.col(lon_col), 180.0, 360.0, level).alias("_cx"),
        _quant_col(F.col(lat_col), 90.0, 180.0, level).alias("_cy"),
    )
    hits = (
        p.join(cover, ["_cx", "_cy"])
        .where(
            (F.col("_plat") >= F.col("_la0")) & (F.col("_plat") <= F.col("_la1"))
            & (F.col("_plon") >= F.col("_lo0")) & (F.col("_plon") <= F.col("_lo1"))
        )
        .groupBy("_zid")
        .agg(
            F.count(F.lit(1)).alias("n_pts"),
            F.sum("_v").alias("sum_v"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        )
    )
    return (
        zones.select(F.col(zone_id_col).alias("_zid"))
        .join(hits, "_zid", "left")
        .select(
            F.col("_zid").alias(zone_id_col),
            F.coalesce(F.col("n_pts"), F.lit(0).cast("bigint")).alias("n_pts"),
            F.coalesce(F.col("sum_v"), F.lit(0).cast("bigint")).alias("sum_v"),
            "min_v",
            "max_v",
            (F.col("sum_v").cast("double") / F.col("n_pts").cast("double"))
            .alias("mean_v"),
        )
    )


def ripley_k(
    pts: DataFrame,
    radii: list[float],
    area: float,
    metric: str = "euclid2_deg",
    level: int | None = None,
    id_col: str = "doc_id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Ripley's K point-pattern statistic at each radius — the
    clustered-vs-random-vs-dispersed probe ACROSS scales (Moran's I
    answers it for one neighborhood; K sweeps the neighborhood size):
    K(r) = area * E[pairs within r] / (n*(n-1)/2 pairs), compared
    against the pi*r^2 of complete spatial randomness.

    Naive (no edge-correction) estimator, documented:

        K_hat(r) = area * 2 * n_pairs(r) / (n * (n - 1))

    ``n_pairs(r)`` (exact int64: distance predicates compare the same
    fixed-IEEE d2 both engines compute) counts unordered pairs with
    distance <= r — radii in squared-degree metric are degrees, in
    haversine meters. ``k_hat`` is one fixed mul/div chain on exact
    ints, gate-hashable; dyadic radii keep the thresholds
    engine-exact.

    Plan: ONE 3x3-cell cover self-join at the level covering
    max(radii) (the distance_join kernel — never all-pairs), then a
    single aggregate computes every radius bucket in one pass
    (per-radius conditional sums, map-side combinable) and a stack
    unpivots to one row per radius. At 100 TB the join output is the
    r_max neighborhood pair count — pick radii, and therefore r_max,
    for the density you mean to probe.
    """
    if not radii:
        raise ValueError("radii must be non-empty")
    rs = sorted(float(r) for r in radii)
    if rs[0] <= 0:
        raise ValueError(f"radii must be positive, got {rs[0]}")
    from .distance import distance_join

    pairs = distance_join(
        pts,
        pts,
        radius=rs[-1],
        metric=metric,
        level=level,
        left_id=id_col,
        right_id=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
    ).where(F.col("id_a") < F.col("id_b"))
    thr = [r if metric == "haversine" else r * r for r in rs]
    counted = pairs.agg(
        *[
            F.sum((F.col("dist") <= F.lit(float(t))).cast("bigint")).alias(f"_c{i}")
            for i, t in enumerate(thr)
        ]
    )
    n_tot = pts.agg(F.count(F.lit(1)).alias("n"))
    j = counted.crossJoin(F.broadcast(n_tot))
    stack = ", ".join(
        f"CAST('{r!r}' AS DOUBLE), coalesce(_c{i}, 0L)" for i, r in enumerate(rs)
    )
    out = j.select(
        "n", F.expr(f"stack({len(rs)}, {stack}) AS (r, n_pairs)")
    )
    k_hat = (
        F.col("n_pairs").cast("double")
        * F.lit(2.0)
        * F.lit(float(area))
        / (F.col("n") * (F.col("n") - F.lit(1))).cast("double")
    )
    return out.select(
        "r",
        "n_pairs",
        "n",
        F.when(F.col("n") > 1, k_hat).alias("k_hat"),
    )


def local_morans_i(cells: DataFrame, x_col: str = "x") -> DataFrame:
    """LOCAL Moran's I (r5; Anselin 1995 LISA) — the per-cell
    decomposition of :func:`morans_i`: WHERE is the clustering, not
    just whether it exists. Queen adjacency, binary weights (the
    global form's convention):

        I_i = n * D_i * sum(D_nb) / sum(D^2)

    with D = n*x - sum(x) (the global form's integer deviation scale —
    every numerator term is exact int64; ONE final division). The
    quadrant label classifies the cluster type: HH/LL = hot/cold core,
    HL/LH = spatial outlier, NA for zero deviations or no neighbors.

    Plan: the morans_i scatter (8-offset Generate + one equi-join) +
    one per-cell aggregate. Returns
    (cx, cy, n_nb, li_num, local_i, quadrant).
    """
    tot = cells.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.col(x_col)).alias("_s")
    )
    dev = cells.crossJoin(F.broadcast(tot)).select(
        "cx",
        "cy",
        F.col("_n"),
        (F.col("_n") * F.col(x_col) - F.col("_s")).cast("bigint").alias("d"),
    )
    offs = F.array(*[F.lit(i) for i in range(9) if i != 4])
    probe = dev.select(
        F.col("cx").alias("ox"),
        F.col("cy").alias("oy"),
        F.explode(
            F.transform(
                offs,
                lambda i: F.struct(
                    (F.col("cx") + (i % 3) - 1).alias("cx"),
                    (F.col("cy") + (i / 3).cast("int") - 1).alias("cy"),
                ),
            )
        ).alias("nb"),
    ).select("ox", "oy", F.col("nb.cx").alias("cx"), F.col("nb.cy").alias("cy"))
    nbsum = (
        probe.join(dev.select("cx", "cy", F.col("d").alias("db")), ["cx", "cy"])
        .groupBy(F.col("ox").alias("cx"), F.col("oy").alias("cy"))
        .agg(F.count(F.lit(1)).alias("n_nb"), F.sum("db").alias("_nbs"))
    )
    ss = dev.agg(F.sum(F.col("d") * F.col("d")).alias("_ss"))
    j = dev.join(nbsum, ["cx", "cy"], "left").crossJoin(F.broadcast(ss))
    num = F.col("d") * F.coalesce(F.col("_nbs"), F.lit(0))
    quad = (
        F.when(F.col("_nbs").isNull() | (F.col("d") == 0) | (F.col("_nbs") == 0),
               F.lit(None).cast("string"))
        .when((F.col("d") > 0) & (F.col("_nbs") > 0), F.lit("HH"))
        .when((F.col("d") < 0) & (F.col("_nbs") < 0), F.lit("LL"))
        .when((F.col("d") > 0) & (F.col("_nbs") < 0), F.lit("HL"))
        .otherwise(F.lit("LH"))
    )
    return j.select(
        "cx",
        "cy",
        F.coalesce(F.col("n_nb"), F.lit(0)).cast("long").alias("n_nb"),
        num.alias("li_num"),
        F.when(
            F.col("_ss") > 0,
            (F.col("_n") * num).cast("double") / F.col("_ss").cast("double"),
        ).alias("local_i"),
        quad.alias("quadrant"),
    )
