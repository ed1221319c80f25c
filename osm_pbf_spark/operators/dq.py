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


def benford_probs_micro() -> list[int]:
    """Benford leading-digit probabilities log10(1 + 1/d), d = 1..9,
    quantized HALF-UP to micro units — INT literals shared by the
    operator and the gate oracle (the fs_weights convention)."""
    import math

    return [
        int(math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5))
        for d in range(1, 10)
    ]


def benford_deviation(
    df: DataFrame,
    val_col: str,
) -> DataFrame:
    """Benford's-law conformance of a POSITIVE INTEGER column — the
    classic forensic DQ probe (fabricated or truncated numeric fields
    break the log-uniform leading-digit law that organic magnitudes
    follow).

    Spec: leading digit = first character of the decimal string (the
    column must be a positive integral value — guarded in a WHERE;
    string extraction avoids the log10 ulp trap at exact powers of
    ten). Expected micro-probabilities are the INT literals of
    :func:`benford_probs_micro`. Output is ONE row:

        (n, n1..n9, chi2)

    where n_d are exact int64 counts and chi2 is the Pearson statistic
    sum_d (n_d*10^6 - n*e_d)^2 / (n*e_d*10^6) evaluated as NINE fixed-
    order terms on exact integer numerators — a deterministic IEEE
    chain, gate-hashable (a windowed float sum over digit rows would
    be partition-order-dependent; the pivot to one row pins the
    order).

    Plan: one map-side CASE projection + one 9-bounded hash aggregate
    pivoted into a single row — one tiny shuffle, pure codegen.
    """
    xc = F.col(val_col).cast("bigint")
    df = df.where(
        F.when(xc > 0, F.lit(True)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"benford_deviation: {val_col} must be > 0, got "),
                    F.col(val_col).cast("string"),
                )
            )
        )
    )
    digit = F.substring(xc.cast("string"), 1, 1).cast("int")
    agg = df.select(digit.alias("_d")).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("_d") == d).cast("bigint")).alias(f"n{d}")
            for d in range(1, 10)
        ],
    )
    probs = benford_probs_micro()
    terms = []
    for d in range(1, 10):
        e = F.lit(probs[d - 1])
        dev = (F.col(f"n{d}") * F.lit(1_000_000) - F.col("n") * e).cast("bigint")
        # square in DOUBLE: dev itself is exact int64 (n up to ~9e12),
        # but dev^2 would overflow bigint under ANSI at n ~ 3e3 already
        dd = dev.cast("double")
        terms.append(
            (dd * dd) / (F.col("n") * e * F.lit(1_000_000)).cast("double")
        )
    chi2 = terms[0]
    for t in terms[1:]:
        chi2 = chi2 + t
    return agg.select(
        "n",
        *[f"n{d}" for d in range(1, 10)],
        F.when(F.col("n") > 0, chi2).alias("chi2"),
    )


def k_anonymity(
    df: DataFrame,
    qi_cols: list[str],
    k: int,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set — the
    standard re-identification check before releasing or training on
    user-adjacent tables: every combination of ``qi_cols`` values
    shared by FEWER than k rows is a violating equivalence class
    (those rows are re-identifiable to within < k candidates).

    Returns the violating classes ``(qi..., n)`` — empty means the
    table IS k-anonymous at this k; the rows themselves are the
    suppression/generalization candidates a privacy pass feeds on.
    NULL is a value like any other (a NULL-ZIP group of 2 is just as
    identifying), which is exactly what groupBy gives.

    Plan: ONE hash aggregate on the quasi-identifier key + the
    count filter — map-side combinable, one narrow shuffle; at 100 TB
    this is the exact_dedup scale class.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return (
        df.groupBy(*qi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < k)
    )


def l_diversity(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """l-diversity audit — :func:`k_anonymity`'s stronger sibling: an
    equivalence class can be large yet still leak if every member
    shares the SAME sensitive value (homogeneity attack). Flags
    quasi-identifier classes whose sensitive attribute takes FEWER
    than ``l`` distinct values.

    Returns violating classes ``(qi..., n, n_distinct)``.

    Plan: ONE hash aggregate with a count-distinct (Spark expands it
    to a two-phase exact distinct agg — still map-side partial on the
    (qi, sensitive) key), one narrow shuffle.
    """
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(sensitive_col).alias("n_distinct"),
        )
        .where(F.col("n_distinct") < l)
    )


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """REFERENTIAL-INTEGRITY audit (r5) — the foreign-key half of the
    DQ family (check_constraints covers row-local predicates; this is
    the cross-table invariant): count child rows and distinct child
    keys whose key has no parent, NULL keys reported separately (a
    NULL FK is a different defect than a dangling one).

    All exact counts; one left-anti join against the DISTINCT parent
    keys (broadcastable when the parent is a dimension) + two
    aggregates. Returns 1 row:
    (n_child_rows, n_null_keys, n_orphan_rows, n_orphan_keys).
    """
    c = child.select(F.col(child_key).alias("_k"))
    p = parent.select(F.col(parent_key).alias("_k")).distinct()
    nn = c.where(F.col("_k").isNull())
    orphans = c.where(F.col("_k").isNotNull()).join(p, "_k", "left_anti")
    totals = c.groupBy().agg(F.count(F.lit(1)).alias("n_child_rows"))
    nulls = nn.groupBy().agg(F.count(F.lit(1)).alias("n_null_keys"))
    orp = orphans.groupBy().agg(
        F.count(F.lit(1)).alias("n_orphan_rows"),
        F.countDistinct("_k").alias("n_orphan_keys"),
    )
    return totals.crossJoin(nulls).crossJoin(orp)
