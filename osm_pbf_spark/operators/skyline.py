"""Skyline / Pareto-frontier operator (SURVEY.md §2.4, r3).

``skyline(df, cols)`` returns the rows not dominated on the chosen
columns: row q dominates row p iff q >= p on EVERY column and q > p on
at least one (all columns maximized; negate a column to minimize it).
This is the classic skyline operator (Börzsönyi, Kossmann, Stocker,
ICDE 2001) — "best tradeoff" queries like cheapest-vs-closest hotels,
or highest-quality-vs-shortest training documents.

Distributed shape (the standard two-phase skyline):

  1. LOCAL phase — rows are grouped by a deterministic value-hash salt
     (content-derived, so the result cannot depend on physical
     partitioning) and each group's local skyline is computed in one
     Arrow-batched ``applyInPandas`` kernel. A global skyline point is
     by definition dominated by nothing, so it survives its local
     group: phase 1 loses no answers, and on realistic (correlated or
     independent) value distributions it discards almost everything —
     the expected skyline of n uniform points in d dims is
     O(ln^(d-1) n / (d-1)!).
  2. GLOBAL phase — the surviving candidates (union of local skylines)
     gather into ONE group and the same kernel runs once more. The
     single-group stage is the documented scale bound: it holds
     |union of local skylines| rows, which is small for real data but
     can approach n for pathological anti-correlated inputs — the
     kernel raises loudly at ``max_candidates`` instead of silently
     OOMing.

Kernel: sort candidates descending-lexicographically, then each point
is compared (vectorized numpy) only against already-kept points — a
point can only be dominated by a lex-earlier one. O(n * |skyline|)
comparisons, no quadratic blowup when the skyline is small.

Determinism: the skyline is a well-defined SET (duplicate rows tie —
neither strictly dominates — so all copies survive), independent of
partition count, salt count, and visit order; the DuckDB gate oracle
is a brute-force NOT EXISTS anti-dominance join (q_skyline).

Exactness: comparison columns are compared as float64 — exact for
integers up to 2^53 and for raw double columns (no arithmetic is done
on the values, only ordering).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skyline"]


def _skyline_mask(a: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the non-dominated rows of ``a`` (maximize all)."""
    n, d = a.shape
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    # descending lex order: only earlier rows can dominate a given row
    order = np.lexsort(tuple(-a[:, i] for i in reversed(range(d))))
    kept: list[np.ndarray] = []
    kmat = np.empty((0, d), dtype=a.dtype)
    stale = True
    for idx in order:
        p = a[idx]
        if kept:
            if stale:
                kmat = np.asarray(kept)
                stale = False
            dom = (kmat >= p).all(axis=1) & (kmat > p).any(axis=1)
            if dom.any():
                continue
        keep[idx] = True
        kept.append(p)
        stale = True
    return keep


def skyline(
    df: DataFrame,
    cols: list[str],
    n_salts: int = 64,
    max_candidates: int = 5_000_000,
) -> DataFrame:
    """Rows of ``df`` on the Pareto frontier maximizing every ``cols``.

    To minimize a column, pass a negated projection of it instead.
    """
    if not cols:
        raise ValueError("skyline needs at least one comparison column")
    out_schema = df.schema
    colset = list(cols)

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        a = pdf[colset].to_numpy(dtype=np.float64)
        return pdf.loc[_skyline_mask(a), [f.name for f in out_schema.fields]]

    def _final(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > max_candidates:
            raise ValueError(
                f"skyline global phase got {len(pdf)} candidates "
                f"(> max_candidates={max_candidates}); the input is "
                "pathologically anti-correlated — raise max_candidates "
                "or pre-aggregate"
            )
        return _local(pdf)

    # content-derived salt: result provably independent of physical layout
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    local = (
        df.withColumn("_salt", salt)
        .groupBy("_salt")
        .applyInPandas(
            lambda key, pdf: _local(pdf), schema=out_schema
        )
    )
    return (
        local.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(lambda key, pdf: _final(pdf), schema=out_schema)
    )
