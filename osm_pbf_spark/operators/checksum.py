"""Order-independent table fingerprints (SURVEY.md §2.6 companion).

``table_fingerprint(df, group_cols, value_cols)`` reduces a table (or
each group) to a tiny, deterministic, ORDER-INDEPENDENT digest:

    n_rows     exact row count
    hash_sum   int64 sum of per-row 40-bit md5 prefixes — EXACT (never
               wraps) for up to 2^23 ≈ 8.4M rows per group; Spark 4
               runs ANSI mode where a bigint-sum wrap THROWS rather
               than wrapping, so the width is chosen to stay exact.
               Beyond that row count per group rely on
               (n_rows, hash_xor) — xor never overflows at any scale —
               or fingerprint with more groups.
    hash_xor   bit_xor of the same per-row values (never overflows)

Both aggregates are commutative + associative, so Spark computes them
with map-side partial aggregation — one narrow shuffle of one row per
group per map task, regardless of table size. This is the cheap way to
verify a 100-TB copy/migration (or a resumed ingest, sink/iceberg_like)
without sorting or collecting anything: fingerprints match ⟺ the
multisets of canonical row strings match (md5-collision caveat).

The per-row value is ``conv(substr(md5(canon), 1, 10), 16, 10)`` where
``canon`` joins the chosen columns with a 0x1f unit separator and a
NULL sentinel — all ANSI-expressible, so DuckDB replays it exactly.

Cross-ENGINE fingerprint comparison is only meaningful for value
columns whose string cast is format-stable: integers, strings,
booleans. DOUBLE→string differs between engines (Java shortest-repr
uses E-notation where DuckDB does not) — round/quantize doubles to
integers first, or compare Spark-vs-Spark only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_fingerprint", "profile_table", "SEP", "NULL_SENTINEL"]

SEP = "\x1f"
NULL_SENTINEL = "\x00null\x00"


def _canon(value_cols: list[str]) -> F.Column:
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL)) for c in value_cols
    ]
    return F.concat_ws(SEP, *parts)


def table_fingerprint(
    df: DataFrame,
    group_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Digest ``df`` into (group_cols..., n_rows, hash_sum, hash_xor).

    With ``group_cols=None`` the whole table digests to one row (a
    literal group key keeps the plan a plain hash aggregate).
    ``value_cols`` defaults to every non-group column, in schema order
    (column ORDER is part of the fingerprint; row order is not).
    """
    group_cols = list(group_cols or [])
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in group_cols]
    rowhash = F.conv(F.substring(F.md5(_canon(value_cols)), 1, 10), 16, 10).cast(
        "bigint"
    )
    h = df.select(*group_cols, rowhash.alias("_h"))
    keys = group_cols if group_cols else [F.lit(0).alias("_all")]
    out = h.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_h").alias("hash_sum"),
        F.expr("bit_xor(_h)").alias("hash_xor"),
    )
    return out.drop("_all") if not group_cols else out


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format per-column data-quality profile of numeric columns.

    One row per profiled column: (col_name, n_rows, n_null, n_distinct,
    min_val:double, max_val:double). The verification/exploration
    primitive you run before trusting a 100-TB table: all six metrics
    compute in ONE scan — a single global hash aggregate whose distinct
    counts Spark plans with an Expand (one pass, map-side partial
    aggregation per column), then a constant-size explode to long form.
    No shuffle carries data rows; the exchange moves one partial-agg
    row per task.

    min/max are cast to double AFTER aggregating (exact for integer
    columns up to 2^53 and a bit-identity for double columns — the
    values are selected, never arithmetically combined, so the DuckDB
    gate oracle matches them exactly; see q_profile).
    """
    if not cols:
        raise ValueError("profile_table needs at least one column")
    structs = []
    for c in cols:
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col(c).isNull().cast("bigint")).alias("n_null"),
                F.count_distinct(F.col(c)).alias("n_distinct"),
                F.min(F.col(c)).cast("double").alias("min_val"),
                F.max(F.col(c)).cast("double").alias("max_val"),
            ).alias(f"_p_{c}")
        )
    one = df.agg(*structs)
    return one.select(
        F.explode(F.array(*[F.col(f"_p_{c}") for c in cols])).alias("p")
    ).select("p.*")


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two keyed tables — the drill-down companion
    to ``table_fingerprint``: the fingerprint says WHETHER a 100-TB
    copy/migration drifted, this says WHICH rows. Returns one row per
    differing key with ``diff_status`` in {'added', 'removed',
    'changed'} ('added' = present only on the RIGHT/new side);
    identical rows produce nothing, so the output is |drift|-sized,
    not table-sized.

    ``compare_cols`` (default: all shared non-key columns) are
    compared NULL-SAFELY (NULL == NULL is unchanged — eqNullSafe, the
    SCD2 IS DISTINCT FROM convention); keys must be unique per side
    (a duplicate key makes 'changed' ill-defined — enforce upstream
    with check_constraints' unique rule).

    Plan: ONE full-outer sort-merge join on the key columns (both
    sides shuffle-partitioned the same way) + a native projection;
    no Python, output pruned to drift rows before anything moves
    further.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    l = left.select(
        *[F.col(c).alias(c) for c in key_cols],
        *[F.col(c).alias(f"_l_{c}") for c in compare_cols],
        F.lit(True).alias("_l_present"),
    )
    r = right.select(
        *[F.col(c).alias(c) for c in key_cols],
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
        F.lit(True).alias("_r_present"),
    )
    j = l.join(r, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
    status = (
        F.when(F.col("_l_present").isNull(), F.lit("added"))
        .when(F.col("_r_present").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        j.withColumn("diff_status", status)
        .where(F.col("diff_status").isNotNull())
        .select(*key_cols, "diff_status")
    )
