"""Testdata parquet readers + deterministic derived spatial columns.

The driver's tables (TESTDATA.md) carry no coordinates, so spatial
queries derive them ARITHMETICALLY from keys — the same exact integer/
double expressions are used in the DuckDB oracles, so both engines see
bit-identical points:

    lat = -60.0 + ((key * 7919)   % 120000) / 1000.0   in [-60, 60)
    lon = -150.0 + ((key * 104729) % 300000) / 1000.0  in [-150, 150)

(7919 and 104729 are primes; the lattice has 0.001-degree pitch, so
fixture polygons with vertices on 4+ decimal offsets never touch a
point exactly — boundary conventions cannot diverge.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def derived_lat(key_col: str) -> F.Column:
    return F.lit(-60.0) + F.pmod(F.col(key_col) * F.lit(7919), F.lit(120000)) / F.lit(1000.0)


def derived_lon(key_col: str) -> F.Column:
    return F.lit(-150.0) + F.pmod(F.col(key_col) * F.lit(104729), F.lit(300000)) / F.lit(1000.0)


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One point per customer: (doc_id:int64, lat, lon)."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("doc_id"),
        derived_lat("c_custkey").alias("lat"),
        derived_lon("c_custkey").alias("lon"),
    )


def supplier_stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A small 'stations' dimension derived from supplier keys."""
    return load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("station_id"),
        derived_lat("s_suppkey").alias("s_lat"),
        derived_lon("s_suppkey").alias("s_lon"),
    )


# The same derivations as SQL text fragments (ANSI; DuckDB-compatible).
SQL_POINTS = (
    "SELECT c_custkey AS doc_id, "
    "-60.0 + ((c_custkey * 7919) % 120000) / 1000.0 AS lat, "
    "-150.0 + ((c_custkey * 104729) % 300000) / 1000.0 AS lon "
    "FROM customer"
)
SQL_STATIONS = (
    "SELECT s_suppkey AS station_id, "
    "-60.0 + ((s_suppkey * 7919) % 120000) / 1000.0 AS s_lat, "
    "-150.0 + ((s_suppkey * 104729) % 300000) / 1000.0 AS s_lon "
    "FROM supplier"
)
