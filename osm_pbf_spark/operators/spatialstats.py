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

__all__ = ["grid_cell_counts", "morans_i"]


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
