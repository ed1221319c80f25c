"""Cardinality sketches (SURVEY.md §2.6 companion, r3).

``kmv_distinct`` estimates per-group distinct counts with the
K-Minimum-Values sketch (Bar-Yossef et al. 2002 / the theta-sketch
family): hash every value to a uniform point in [0, 1), keep the k
smallest DISTINCT hashes per group; if the k-th smallest is h_k the
unbiased estimate is (k-1) / h_k. Relative error ~ 1/sqrt(k-2).

Unlike ``count_distinct`` (exact, but its distinct shuffle carries
every distinct value) or ``approx_count_distinct`` (HLL — fast but
not independently replayable), KMV here is built for the gate: the
hash is the project-standard deterministic 40-bit md5 prefix
(operators/checksum.py), so DuckDB replays the whole estimator
bit-for-bit and the driver can verify a sketch an independent engine
computed.

Plan shape: one partial-aggregatable distinct on (group, hash) —
map-side combine collapses duplicates before the shuffle — then a
per-group rank window that keeps only k rows per group, then a tiny
final aggregate. The window sort is spillable and sorts only the
DISTINCT hashes of each group; for groups whose distinct count is so
large that even that sort hurts, pre-filter ``hash < t * 2^40`` with
any t safely above k / D_lower — the k minima survive any such cut.

Returns (group..., n_rows, kmv_k, kmv_estimate:double) where
``kmv_estimate`` is EXACT distinct count when a group has fewer than
k distinct hashes (the sketch degenerates to the exact set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_distinct"]

_HASH_SPACE = 1 << 40


def _hash40(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 10), 16, 10).cast(
        "bigint"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """KMV distinct-count estimate of ``value_col`` per group."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    g = [F.col(c) for c in group_cols]
    h = df.select(*g, _hash40(F.col(value_col)).alias("_h"))
    counts = h.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    dh = h.distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = dh.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    sk = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("kmv_k"),
        F.max("_h").alias("_hk"),
    )
    # n_kept < k -> we saw every distinct hash: exact. Otherwise
    # (k-1) * 2^40 / h_k, one exact-integer division to double.
    est = F.when(F.col("kmv_k") < k, F.col("kmv_k").cast("double")).otherwise(
        F.lit(float((k - 1) * _HASH_SPACE)) / F.col("_hk").cast("double")
    )
    return counts.join(sk, group_cols).select(
        *group_cols, "n_rows", "kmv_k", est.alias("kmv_estimate")
    )
