"""Bench harness — prints ONE JSON line with per-query wall times.

Headline queries cover the engine's whole surface: PBF ingest
(decode -> render -> cell -> Iceberg-shaped sink), the two-stage PIP
join over a skewed corpus (one hot cell holds 50% of docs), tile
assignment + rollup, kNN, relational aggregates/joins on the driver
testdata, and MinHash dedup.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_N_NODES (default 2_000_000 * sf -> 200k at sf0.1),
     BENCH_REPS (default 3) — each timed leg is best-of-N (the host
     shows intermittent co-tenant contention bursts),
     BENCH_SCALING=1 to also run the N-vs-4N-parallelism study
     (local[8] vs local[32]) and include `scaling` in the output.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
from pyspark.sql import functions as F

from osm_pbf_spark.operators.dedup import minhash_lsh_pairs
from osm_pbf_spark.operators.knn import knn_join
from osm_pbf_spark.operators.spatial_join import Polygon, pip_join
from osm_pbf_spark.operators.tiling import assign_point_tiles, tile_pyramid_rollup
from osm_pbf_spark.plans.ingest import ingest_pbf, read_documents
from osm_pbf_spark.session import get_spark
from osm_pbf_spark.sources.tables import load
from tests.gen_documents import HOT_LAT, HOT_LON, corpus_path, synth_pbf

BENCH_POLYGONS = [
    # city extent covering the hot cluster (the skew case)
    Polygon("hot_city", [np.array([
        [HOT_LAT - 0.15, HOT_LON - 0.15], [HOT_LAT - 0.15, HOT_LON + 0.15],
        [HOT_LAT + 0.15, HOT_LON + 0.15], [HOT_LAT + 0.15, HOT_LON - 0.15],
    ])]),
    Polygon("band", [np.array([[-10.0, -60.0], [-10.0, 60.0], [10.0, 60.0], [10.0, -60.0]])]),
    Polygon("tri", [np.array([[30.0, -120.0], [60.0, -90.0], [20.0, -60.0]])]),
]


def run_bench(master: str, sf_dir: str, n_nodes: int, table_root: str):
    spark = get_spark("bench", master=master)
    times: dict[str, float] = {}
    all_rep_times: dict[str, list[float]] = {}
    # best-of-N per leg (default 3): this sandbox host shows
    # intermittent multi-x contention bursts (co-tenant steal/memory
    # bandwidth — measured 170 s vs 22 s for the identical binary an
    # hour apart, with the bandwidth-bound kNN/minhash legs degrading
    # 5-10x while pure-codegen legs stay flat). Best-of-N reports the
    # engine, not the neighbor; `setup` re-creates per-rep preconditions
    # untimed (e.g. q_ingest must start from an empty table or the
    # resume path would skip all work on rep 2).
    reps = max(int(os.environ.get("BENCH_REPS", "3")), 1)

    def timed(name, fn, setup=None):
        rep_times = []
        for _ in range(reps):
            if setup is not None:
                setup()
            t0 = time.monotonic()
            fn()
            rep_times.append(round(time.monotonic() - t0, 3))
        times[name] = min(rep_times)
        # every rep, so a reader can separate host-contention spread
        # from a code regression without leaving the JSON
        all_rep_times[name] = rep_times

    pbf = synth_pbf(corpus_path(n_nodes), n_nodes)
    if os.path.exists(table_root):
        shutil.rmtree(table_root)

    # warm the Python workers (pandas/numpy import in each of N workers)
    # so query timings measure the engine, not interpreter cold start
    from pyspark.sql import types as T

    _warm = F.pandas_udf(lambda x: x, T.LongType())
    spark.range(0, 10_000, 1, int(spark.sparkContext.defaultParallelism)).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    # ...and the broadcast + mapInPandas machinery: the FIRST such call
    # in a session pays ~3-5 s of one-time TorrentBroadcast/Arrow/
    # codegen setup (measured: identical pip_join calls run 3.5-5.7 s
    # cold, 1.3 s warm on a 1000-point probe) that would otherwise land
    # in whichever query runs first rather than measuring the engine
    _wpts = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.rand(1) * 100 - 50).alias("lat"),
        (F.rand(2) * 300 - 150).alias("lon"),
    )
    pip_join(spark, _wpts, BENCH_POLYGONS, level="auto").count()
    # ...and the kNN brute plan shape (mapInPandas + ranking window):
    # its first execution pays ~1.5 s of one-time codegen/serializer
    # setup (measured 3.1 s cold vs 1.4 s warm at the 2000x200k bench
    # shape) that is session machinery, not the operator
    knn_join(
        spark, _wpts.limit(50), _wpts, k=3, level="auto",
        query_id="doc_id", cand_id="doc_id",
    ).count()

    timed("q_ingest", lambda: ingest_pbf(
        spark, pbf, table_root, cell_level=12, blobs_per_split=1_000_000,
    ), setup=lambda: shutil.rmtree(table_root, ignore_errors=True))
    docs = read_documents(spark, table_root).select("doc_id", "lat", "lon").cache()
    n_docs = docs.count()
    times["_n_docs"] = n_docs

    timed("q_pip_join", lambda: pip_join(spark, docs, BENCH_POLYGONS, level="auto").count())
    timed("q_tile_rollup", lambda: tile_pyramid_rollup(
        assign_point_tiles(docs, zoom=12, scheme="linear"), zoom=12, min_zoom=6
    ).count())
    queries = docs.limit(2000)
    timed("q_knn", lambda: knn_join(
        spark, queries, docs, k=5, level="auto", query_id="doc_id", cand_id="doc_id"
    ).count())

    li = load(spark, sf_dir, "lineitem")
    timed("q01_pricing", lambda: (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity"), F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
             F.count(F.lit(1)))
        .collect()
    ))
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    timed("q03_join_agg", lambda: (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_nationkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        .collect()
    ))
    d = load(spark, sf_dir, "documents")
    timed("q_minhash_dedup", lambda: minhash_lsh_pairs(
        d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 10_000_000)), threshold=0.5
    ).count())

    docs.unpersist()
    spark.stop()
    return times, all_rep_times


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_nodes = int(os.environ.get("BENCH_N_NODES", str(int(2_000_000 * sf))))

    times, rep_times = run_bench(
        f"local[{cpus}]", sf_dir, n_nodes, "/tmp/osm_pbf_spark_bench/table"
    )
    n_docs = times.pop("_n_docs")
    out = {
        "metric": "headline_total_sec",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "rep_times": rep_times,
        "sf": sf,
        "n_docs": int(n_docs),
        "ingest_docs_per_sec": round(n_docs / times["q_ingest"], 1),
    }

    if os.environ.get("BENCH_SCALING") == "1":
        out["scaling"] = scaling_study()

    print(json.dumps(out))


def scaling_pipeline(master: str, n_nodes: int, table_root: str) -> dict:
    """One leg of the N-vs-4N study: the headline spatial-join + tiling
    pipeline (ingest -> committed-table read -> PIP join -> pyramid
    rollup) PLUS way-geometry assembly — the pipeline's largest shuffle
    (posexplode refs + sort-merge join on node id + re-assembly), so
    the scaling claim covers a shuffle-heavy stage, not only the
    shuffle-free ingest. Input is the MIXED corpus: n_nodes nodes (50%
    in the hot city cluster) + n_nodes/10 ways of ~10 refs each.
    kNN is excluded: it is a latency-bound *lookup* operator, not part
    of the throughput metric surface (BASELINE.json:2).

    Returns {"wall": total_sec, "stages": {name: sec}}.
    """
    from osm_pbf_spark.sources import pbf_source as src
    from tests.gen_documents import synth_pbf_mixed

    spark = get_spark("scaling", master=master)
    par = int(spark.sparkContext.defaultParallelism)
    _warm = F.pandas_udf(lambda x: x, "long")
    spark.range(0, 10_000, 1, par).select(F.sum(_warm(F.col("id")))).collect()
    # warm the broadcast + mapInPandas machinery too (see run_bench):
    # its one-time setup would otherwise land in the short pip_join
    # stage of whichever leg runs, not measure the pipeline
    _wpts = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.rand(1) * 100 - 50).alias("lat"),
        (F.rand(2) * 300 - 150).alias("lon"),
    )
    pip_join(spark, _wpts, BENCH_POLYGONS, level="auto").count()
    n_ways = n_nodes // 10
    pbf = synth_pbf_mixed(
        os.path.join("/tmp/osm_pbf_spark_bench", f"corpus_mixed_{n_nodes}.osm.pbf"),
        n_nodes, n_ways, hot_fraction=0.5,
    )
    if os.path.exists(table_root):
        shutil.rmtree(table_root)
    stages: dict[str, float] = {}
    t_start = time.monotonic()

    def timed(name, fn):
        t0 = time.monotonic()
        fn()
        stages[name] = round(time.monotonic() - t0, 3)

    timed("ingest", lambda: ingest_pbf(
        spark, pbf, table_root, cell_level=12, blobs_per_split=1_000_000
    ))
    # cache the SLIM projection (3 cols, ~3% of table bytes): the
    # join + tiling stages iterate over it, and caching the projection
    # rather than the spans table is exactly what a cluster run would
    # do (the spans stay on disk; count() below materializes it)
    docs = read_documents(spark, table_root).select("doc_id", "lat", "lon").cache()

    def _read():
        n = docs.count()
        assert n == n_nodes + n_ways, (n, n_nodes, n_ways)

    timed("read", _read)
    # way-docs carry NaN lat/lon (no point geometry) — the spatial
    # stages run on the point docs
    pts = docs.filter(~F.isnan("lat"))
    timed("pip_join", lambda: pip_join(spark, pts, BENCH_POLYGONS, level="auto").count())
    timed("tiles", lambda: tile_pyramid_rollup(
        assign_point_tiles(pts, zoom=10, scheme="linear"), zoom=10, min_zoom=4
    ).count())

    def _assembly():
        entities, _ = src.read_pbf(spark, pbf)
        geoms = src.assemble_way_geometries(src.ways(entities), src.nodes(entities))
        n_closed = geoms.filter("is_closed").count()
        assert n_closed >= n_ways // 5, (n_closed, n_ways)

    timed("assembly", _assembly)
    wall = time.monotonic() - t_start
    docs.unpersist()
    spark.stop()
    return {"wall": round(wall, 3), "stages": stages}


def scaling_study() -> dict:
    """Same input, two parallelism levels (the sandbox stand-in for N vs
    4N executors — driver instruction), repeated; best rep per leg to
    suppress single-machine variance (disk flush, cpufreq)."""
    n_nodes = int(os.environ.get("BENCH_SCALING_N_NODES", "100000000"))
    reps = int(os.environ.get("BENCH_SCALING_REPS", "2"))
    n_small = int(os.environ.get("BENCH_SCALING_N", "4"))
    # N=4 vs 4N=16 cores (not 8 vs 32): local[32] saturates every core
    # with task threads, leaving none for the JVM's own service threads
    # (shuffle, GC, netty, parquet writers) — measured anti-scaling that
    # a real multi-executor cluster does not have. Using half the
    # machine at both levels keeps the 4x ratio AND headroom at both.
    # INTERLEAVE the legs: this sandbox is a VM with visible steal
    # time, so throughput drifts with host load. Adjacent legs see
    # similar windows; best-of-reps drops throttled ones.
    legs: dict[int, float] = {}
    stages: dict[int, dict] = {}
    all_reps: list[dict] = []
    for _ in range(reps):
        for cores in (n_small, 4 * n_small):
            root = f"/tmp/osm_pbf_spark_bench/scal{cores}"
            r = scaling_pipeline(f"local[{cores}]", n_nodes, root)
            all_reps.append({"cores": cores, **r})
            if r["wall"] < legs.get(cores, float("inf")):
                legs[cores] = r["wall"]
                stages[cores] = r["stages"]
    n_docs = n_nodes + n_nodes // 10  # nodes + way-docs in the table
    thr_n = n_docs / legs[n_small]
    thr_4n = n_docs / legs[4 * n_small]
    return {
        "pipeline": "ingest+read+pip_join+tile_rollup(z10->4)+way_assembly",
        "corpus": f"mixed {n_nodes} nodes (50% hot) + {n_nodes // 10} ways",
        "n_docs": n_docs,
        "reps_per_leg": reps,
        "cores_n": n_small,
        "cores_4n": 4 * n_small,
        "sec_n": round(legs[n_small], 3),
        "sec_4n": round(legs[4 * n_small], 3),
        "stages_n": stages[n_small],
        "stages_4n": stages[4 * n_small],
        "docs_per_sec_n": round(thr_n, 1),
        "docs_per_sec_4n": round(thr_4n, 1),
        "efficiency_n_to_4n": round((thr_4n / thr_n) / 4.0, 3),
        # every rep's per-stage walls, so sub-surface efficiencies (the
        # BASELINE criterion is ingest+read+pip+tiles) can take their
        # own best rep per leg instead of inheriting the best-TOTAL rep
        "all_reps": all_reps,
    }


if __name__ == "__main__":
    main()
