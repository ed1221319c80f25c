"""Spatial layout: Sort-Tile-Recursive (STR) partitioning.

The reference engine bulk-loads an in-process r-tree before answering
spatial queries; this module is the distributed replacement for that
BULK-LOAD step (Leutenegger et al. 1997, "STR: A Simple and Efficient
Algorithm for R-Tree Packing"). ``str_partition`` assigns every point
a tile id such that (a) tiles are axis-aligned rank rectangles — the
exact leaf layout an STR-packed r-tree would produce — and (b) tile
populations are balanced to within one row, which is what makes the
assignment useful as a WRITE LAYOUT at 100 TB: partition/bucket the
table by ``part_id`` and every spatial query that covers a region
touches O(region / tile) files of near-identical size, with no skew
no matter how dense the urban extents are (rank space is uniform by
construction — the dense city simply spans more tiles).

Ranks are EXACT and engine-reproducible (ties broken by the unique
``id_col``), computed with the distributed two-pass prefix-sum
discipline of ``packing._with_global_offsets`` — never a global
single-partition window:

1. bucket rows into ``n_ranges`` value ranges (a pure expression on
   the value, so bucketing is deterministic and order-compatible with
   the sort key);
2. one tiny count aggregate -> driver exclusive prefix (n_ranges or
   n_x*n_ranges integers of driver state) -> broadcast back;
3. row_number WITHIN each range partition + the range's base offset.

The x pass ranks globally; slab = rank_x * n_x DIV n. The y pass
ranks within each slab (range buckets keyed by (slab, y-range));
tile = rank_y_in_slab * n_y DIV m_slab. Both divisions are integer —
two engines can't disagree by one row — so the DuckDB gate replays
the whole operator with two plain ranking windows (an independent
formulation of the same spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["str_partition"]


def _range_id(col: F.Column, lo: float, hi: float, n_ranges: int) -> F.Column:
    """Deterministic value-range bucket in [0, n_ranges). Any monotone
    bucketing yields the same final ranks; float rounding here only
    moves range BOUNDARIES, never reorders values."""
    if hi <= lo:
        return F.lit(0)
    span = (hi - lo) / n_ranges
    return F.least(
        F.greatest(F.floor((col - F.lit(lo)) / F.lit(span)), F.lit(0)),
        F.lit(n_ranges - 1),
    ).cast("int")


def str_partition(
    df: DataFrame,
    n_x: int,
    n_y: int,
    x_col: str = "lon",
    y_col: str = "lat",
    id_col: str = "doc_id",
    n_ranges: int = 64,
) -> DataFrame:
    """Assign each point an STR tile: ``n_x`` rank slabs along x, each
    cut into ``n_y`` rank tiles along y (``n_x * n_y`` parts total,
    populations balanced to within one row).

    Requires ``id_col`` unique (the deterministic tie-break; duplicate
    ids would make ranks ambiguous) and ``x_col``/``y_col`` non-NULL
    (a NULL coordinate has no rank; such rows would silently fall out
    of the range-bucket map). Returns the input columns plus
    ``str_slab``, ``str_tile``, ``part_id = str_slab * n_y + str_tile``.

    Scale: two key shuffles (the range-partition windows), driver
    state = n_ranges + n_x * n_ranges counters; raise ``n_ranges`` so
    each window partition (~n / n_ranges rows) fits an executor.
    """
    if n_x < 1 or n_y < 1:
        raise ValueError(f"n_x/n_y must be >= 1, got {n_x}/{n_y}")
    if n_ranges < 1:
        raise ValueError(f"n_ranges must be >= 1, got {n_ranges}")
    spark = df.sparkSession

    stats = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).first()
    if stats[0] is None:
        return df.select(
            "*",
            F.lit(None).cast("int").alias("str_slab"),
            F.lit(None).cast("int").alias("str_tile"),
            F.lit(None).cast("int").alias("part_id"),
        ).where(F.lit(False))
    xlo, xhi, ylo, yhi = (float(v) for v in stats)

    # ---- pass 1: exact global rank along (x, id) -> slab ----
    t = df.withColumn("_xrid", _range_id(F.col(x_col), xlo, xhi, n_ranges))
    xcounts = {int(r): int(c) for r, c in t.groupBy("_xrid").count().collect()}
    n = sum(xcounts.values())
    xbase, acc = {}, 0
    for rid in sorted(xcounts):
        xbase[rid] = acc
        acc += xcounts[rid]
    xbase_expr = F.element_at(
        F.create_map(*[F.lit(v) for kv in xbase.items() for v in kv]),
        F.col("_xrid"),
    )
    wx = Window.partitionBy("_xrid").orderBy(x_col, id_col)
    t = t.withColumn(
        "_rank_x",
        (xbase_expr + F.row_number().over(wx) - 1).cast("bigint"),
    ).withColumn(
        "str_slab", F.expr(f"CAST((_rank_x * {int(n_x)}) DIV {int(n)} AS INT)")
    )
    # the pass-2 count aggregate AND the final output both consume the
    # pass-1 window sort; a lazy localCheckpoint materializes it once
    # (same pattern as text.bpe_train's per-round plans)
    t = t.localCheckpoint(eager=False)

    # ---- pass 2: exact rank along (y, id) within each slab -> tile ----
    t = t.withColumn("_yrid", _range_id(F.col(y_col), ylo, yhi, n_ranges))
    ycounts = t.groupBy("str_slab", "_yrid").count().collect()
    per_slab: dict[int, dict[int, int]] = {}
    for row in ycounts:
        per_slab.setdefault(int(row[0]), {})[int(row[1])] = int(row[2])
    rows = []
    for slab in sorted(per_slab):
        acc, m = 0, sum(per_slab[slab].values())
        for rid in sorted(per_slab[slab]):
            rows.append((slab, rid, acc, m))
            acc += per_slab[slab][rid]
    bases = spark.createDataFrame(
        rows, "str_slab int, _yrid int, _ybase bigint, _m bigint"
    )
    wy = Window.partitionBy("str_slab", "_yrid").orderBy(y_col, id_col)
    t = (
        t.join(F.broadcast(bases), ["str_slab", "_yrid"])
        .withColumn(
            "_rank_y",
            (F.col("_ybase") + F.row_number().over(wy) - 1).cast("bigint"),
        )
        .withColumn(
            "str_tile", F.expr(f"CAST((_rank_y * {int(n_y)}) DIV _m AS INT)")
        )
    )
    return t.select(
        *df.columns,
        "str_slab",
        "str_tile",
        (F.col("str_slab") * F.lit(int(n_y)) + F.col("str_tile"))
        .cast("int")
        .alias("part_id"),
    )
