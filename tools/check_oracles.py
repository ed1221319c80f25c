"""Local mirror of the driver's correctness gate.

Runs every ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row count, schema (column names), and an order-insensitive
value compare — through TWO fetch paths, so passing here should imply
passing under the driver regardless of which path it uses:

1. **exact path** — Spark ``collect()`` vs DuckDB ``fetchall()``;
   full-precision ``repr`` compare of every value (bit-exact floats).
2. **pandas path** — Spark ``toPandas()`` vs DuckDB ``.df()``; this is
   the coercion surface the driver exercises (r3 lesson: DuckDB
   HUGEINT/DECIMAL columns silently become float64 under ``.df()`` and
   the value hash breaks even when ``fetchall`` matches).

Additionally every oracle's output schema is DESCRIBE-audited: any
HUGEINT / UHUGEINT / DECIMAL output column is a hard FAIL even when
values match, because those types are exactly the ones the pandas
fetch coerces (CAST the column to BIGINT / DOUBLE in the oracle).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

BANNED_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def canon_value(v):
    import datetime

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact bits must match
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(out)


def pandas_tuples(df) -> list[tuple]:
    """Canonical tuples from a pandas frame, mirroring driver coercion.

    numpy scalars come back as numpy types; go through ``.item()`` so a
    numpy.float64 canonicalizes identically to a Python float.  NaT and
    None stay NULL; numpy.nan stays NaN (a float NaN is a *value* here,
    distinguishable from NULL only on the exact path — the pandas path
    deliberately inherits the driver's NULL→NaN blindness for floats).
    """
    import pandas as pd

    out = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or v is pd.NaT:
                vals.append(None)
            elif hasattr(v, "item") and not isinstance(v, (bytes, str)):
                try:
                    vals.append(v.item())
                except (ValueError, AttributeError):
                    vals.append(v)
            else:
                vals.append(v)
        out.append(tuple(vals))
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from osm_pbf_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    rows_only = []
    n_checked = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_checked += 1
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            s_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            continue
        if name not in oracles:
            rows_only.append(name)
            print(f"ROWS-ONLY  {name}: {len(s_rows)} rows (no oracle)")
            continue
        try:
            desc = con.execute(f"DESCRIBE ({oracles[name]})").fetchall()
            banned = [
                (c, t) for c, t, *_ in desc
                if any(b in t.upper() for b in BANNED_TYPES)
            ]
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            d_pdf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            continue
        problems = []
        if banned:
            problems.append(
                "oracle emits driver-coerced type(s): "
                + ", ".join(f"{c}:{t}" for c, t in banned)
                + " — CAST to BIGINT/DOUBLE in the oracle SQL"
            )
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            a = canon_rows(s_cols, s_rows)
            b = canon_rows(d_cols, d_rows)
            if a != b:
                diff_i = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y) if len(a) == len(b) else -1
                problems.append(
                    f"values differ (first diff row {diff_i}):\n  spark : {a[diff_i] if diff_i>=0 else a[:2]}\n  duckdb: {b[diff_i] if diff_i>=0 else b[:2]}"
                )
            # pandas path — the driver's coercion surface
            ap = canon_rows(list(s_pdf.columns), pandas_tuples(s_pdf))
            bp = canon_rows(list(d_pdf.columns), pandas_tuples(d_pdf))
            if ap != bp:
                diff_i = next(
                    (i for i, (x, y) in enumerate(zip(ap, bp)) if x != y), -1
                ) if len(ap) == len(bp) else -1
                problems.append(
                    f"PANDAS-PATH values differ (first diff row {diff_i}):\n  spark : {ap[diff_i] if diff_i>=0 else ap[:2]}\n  duckdb: {bp[diff_i] if diff_i>=0 else bp[:2]}"
                )
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            print(f"OK    {name}: {len(s_rows)} rows")

    n_verified = n_checked - len(failures) - len(rows_only)
    print(
        f"\n{n_verified}/{n_checked} queries ORACLE-VERIFIED"
        f" ({len(rows_only)} rows-only, {len(failures)} failing)"
    )
    if rows_only:
        print("rows-only (no oracle — NOT value-verified): " + ", ".join(rows_only))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
