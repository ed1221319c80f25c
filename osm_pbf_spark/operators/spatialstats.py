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

__all__ = ["grid_cell_counts", "morans_i", "getis_ord_gi"]


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
