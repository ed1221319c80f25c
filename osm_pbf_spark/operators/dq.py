"""Data-quality constraint checking (SURVEY.md §2.6 companion, r3).

``check_constraints(df, ...)`` evaluates a declarative rule set and
returns ONE row per rule: (rule:string, n_violations:bigint) — the
pre-flight expectation suite you run before trusting or publishing a
100-TB table (the Deequ/Great-Expectations shape, re-expressed as
plain aggregates the DuckDB gate replays verbatim).

Rule kinds and their plans:

- row-level rules (``not_null``, ``range``, ``in_set``) fold into ONE
  shared scan: a single hash aggregate of CASE-sums, map-side partial,
  no shuffle of data rows;
- ``unique`` (multi-column key) is one groupBy counting keys seen more
  than once (violations = extra copies), map-side combinable;
- ``ref`` (referential integrity) is one left-anti join against the
  referenced key set (broadcast when small).

Everything is native Catalyst expressions — no Python, no collect.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints"]


def check_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    ranges: list[tuple[str, float, float]] | None = None,
    in_set: list[tuple[str, list]] | None = None,
    unique: list[list[str]] | None = None,
    refs: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Evaluate constraints on ``df``; one (rule, n_violations) row each.

    ``ranges``: (col, lo, hi) inclusive. ``in_set``: (col, allowed).
    ``refs``: (col, parent_df, parent_col) — child keys (non-null) that
    do not exist in the parent. Rule names are deterministic
    ``kind:detail`` strings.
    """
    parts: list[DataFrame] = []
    rowrules: list[tuple[str, F.Column]] = []
    for c in not_null or []:
        rowrules.append((f"not_null:{c}", F.col(c).isNull()))
    for c, lo, hi in ranges or []:
        rowrules.append(
            (f"range:{c}", ~F.col(c).between(F.lit(lo), F.lit(hi)))
        )
    for c, allowed in in_set or []:
        rowrules.append(
            (f"in_set:{c}", ~F.col(c).isin(list(allowed)))
        )
    if rowrules:
        aggs = [
            F.sum(cond.cast("bigint")).alias(f"_r{i}")
            for i, (_name, cond) in enumerate(rowrules)
        ]
        one = df.agg(*aggs)
        parts.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(name).alias("rule"),
                                F.coalesce(
                                    F.col(f"_r{i}"), F.lit(0).cast("bigint")
                                ).alias("n_violations"),
                            )
                            for i, (name, _cond) in enumerate(rowrules)
                        ]
                    )
                ).alias("r")
            ).select("r.*")
        )
    for cols in unique or []:
        name = "unique:" + ",".join(cols)
        dup = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .agg(
                F.coalesce(F.sum(F.col("_n") - 1), F.lit(0).cast("bigint")).alias(
                    "n_violations"
                )
            )
            .select(F.lit(name).alias("rule"), "n_violations")
        )
        parts.append(dup)
    for c, parent, pc in refs or []:
        name = f"ref:{c}"
        orphans = (
            df.select(F.col(c)).where(F.col(c).isNotNull())
            .join(parent.select(F.col(pc).alias(c)).distinct(), c, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(name).alias("rule"), "n_violations")
        )
        parts.append(orphans)
    if not parts:
        raise ValueError("no constraints given")
    return reduce(lambda a, b: a.unionByName(b), parts)
