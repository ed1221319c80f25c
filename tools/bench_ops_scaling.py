"""Two-parallelism scaling study for the r3 operator families
(distance_join, bbox_join, connected_components, grid_smooth, plus the
late-r3 batch: skyline, count_min, debounce, kcore, getis_ord).

The sandbox has no multi-executor cluster, so the north rule's
N -> 4N executor criterion is evidenced the same way as bench.py's
pipeline study: the SAME job at local[N] and local[4N] on the SAME
deterministic input, reporting throughput at both plus scaling
efficiency t_N / (4 * t_4N). Legs are interleaved and best-of-REPS to
defuse host-contention bursts (BENCH/BASELINE.md §2).

Writes one JSON line; save output under BENCH/.

Usage: python tools/bench_ops_scaling.py [n_points] [reps] [leg ...]
(naming legs runs only those — for extending an existing study file)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CORES_LO, CORES_HI = 8, 32


def _session(cores: int):
    from osm_pbf_spark.session import get_spark

    spark = get_spark(app_name=f"opsscale{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _points(spark, n: int):
    """Deterministic synthetic points: hot-spot skew (25% of points in a
    0.5-degree blob) + uniform remainder — the shape that punishes a
    join that cannot split a hot cell."""
    from pyspark.sql import functions as F

    df = spark.range(n).select(
        F.col("id"),
        F.when(
            F.col("id") % 4 == 0,
            F.lit(40.0) + (F.col("id") % 5000).cast("double") / F.lit(10000.0),
        )
        .otherwise(F.lit(-60.0) + F.pmod(F.col("id") * F.lit(7919), F.lit(120000)).cast("double") / F.lit(1000.0))
        .alias("lat"),
        F.when(
            F.col("id") % 4 == 0,
            F.lit(-74.0) + F.pmod(F.col("id"), F.lit(5000)).cast("double") / F.lit(10000.0),
        )
        .otherwise(F.lit(-150.0) + F.pmod(F.col("id") * F.lit(104729), F.lit(300000)).cast("double") / F.lit(1000.0))
        .alias("lon"),
    )
    return df


def leg_distance_join(spark, n: int) -> int:
    from osm_pbf_spark.operators.distance import distance_join

    pts = _points(spark, n)
    out = distance_join(pts, pts, 0.005, metric="euclid2_deg")
    return out.where(out.id_a < out.id_b).count()


def leg_bbox_join(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.bbox import bbox_join

    pts = _points(spark, n // 10)  # boxes are heavier per row
    boxes = pts.select(
        F.col("id"),
        F.col("lat").alias("lat_min"),
        (F.col("lat") + F.lit(0.046875)).alias("lat_max"),
        F.col("lon").alias("lon_min"),
        (F.col("lon") + F.lit(0.046875)).alias("lon_max"),
    )
    out = bbox_join(boxes, boxes, level=11)
    return out.where(F.col("id_a") < F.col("id_b")).count()


def leg_connected_components(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import connected_components

    m = n * 4  # per-round work must dominate the fixed round overhead
    edges = spark.range(m).select(
        F.pmod(F.col("id") * F.lit(7919), F.lit(m)).alias("src"),
        F.pmod(F.col("id") * F.lit(104729) + F.lit(13), F.lit(m)).alias("dst"),
    )
    return connected_components(edges, rounds=5).select(F.max("component")).collect()[0][0]


def leg_grid_smooth(spark, n: int) -> int:
    from osm_pbf_spark.operators.tiling import grid_smooth

    return grid_smooth(_points(spark, n * 30), level=11).count()


def leg_skyline(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.skyline import skyline

    pts = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id") * F.lit(7919), F.lit(1_000_000)).alias("x"),
        F.pmod(F.col("id") * F.lit(104729), F.lit(1_000_000)).alias("y"),
    )
    return skyline(pts, ["x", "y"], n_salts=256).count()


def leg_count_min(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import count_min

    df = spark.range(n * 3).select(
        F.pmod(F.col("id") * F.lit(7919), F.lit(100_000)).alias("v")
    )
    return count_min(df, "v", depth=4, width=1024).count()


def leg_debounce(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.temporal import debounce

    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.pmod(F.col("id"), F.lit(n // 300)).alias("user_id"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.pmod(F.col("id") * F.lit(37), F.lit(5_000))
        ).alias("ts"),
    )
    return debounce(ev, gap_s=50.0).count()


def leg_kcore(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import kcore

    # hash-derived endpoints: a LINEAR congruential pair would collapse
    # to N distinct edges (everything mod N ignores i div N) — xxhash64
    # gives an ER-like graph with avg degree ~16, whose 8-core is large
    m = n * 2
    nodes = m // 8
    edges = spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(nodes)).alias("src"),
        F.pmod(F.xxhash64(F.col("id") + F.lit(m)), F.lit(nodes)).alias("dst"),
    )
    return kcore(edges, k=8, rounds=4).count()


def leg_bloom_reduce(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import bloom_semi_reduce

    probe = spark.range(n).select(F.col("id").alias("k"))
    build = spark.range(0, n, 1000).select(F.col("id").alias("bk"))
    return bloom_semi_reduce(probe, build, "k", "bk", n_words=4096, depth=3).count()


def leg_pq_scan(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.ann import pq_encode, pq_topk, pq_train

    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.pmod(F.col("id") * F.lit(7919 + 13 * d), F.lit(1000)).cast(
                    "double"
                )
                / F.lit(250.0)
                for d in range(16)
            ]
        ).alias("embedding"),
    )
    book = pq_train(emb, m=4, n_codes=16, train_sample=2048)
    codes = pq_encode(emb, book)
    out = pq_topk(emb.filter(F.col("vec_id") < 32), codes, book, k=5)
    return out.count()


def leg_hist_quantiles(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import binned_quantiles

    df = spark.range(n).select(
        F.lit("g").alias("g"),
        F.pmod(F.col("id") * F.lit(7919), F.lit(1_000_000)).alias("v"),
    )
    return binned_quantiles(df, "v", ["g"], 0, 1_000_000, 256).count()


def leg_getis_ord(spark, n: int) -> int:
    from osm_pbf_spark.operators.spatialstats import getis_ord_gi, grid_cell_counts

    cells = grid_cell_counts(_points(spark, n * 10), 0.05)
    return getis_ord_gi(cells).count()


def leg_seg_intersect(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.segjoin import segment_intersect_join

    # NOT _points: its 0.5-degree hot blob makes short segments
    # mutually all-intersecting (quadratic OUTPUT — the leg would
    # measure row materialization, not the join).  Same skew idea at
    # output-friendly density: 25% of segments in a 5-degree band.
    # constant DENSITY (~20k segs per square degree in the hot band, a
    # fixed 5-deg lat span, lon span grows with n) so intersecting
    # pairs stay O(n) — otherwise throughput-at-two-sizes measures
    # quadratic output growth, not the operator
    # xxhash64-derived coordinates: linear-congruential lattices put
    # points on a wrapping 1-D line whose pair counts explode once the
    # wrap spacing dips under the segment length (same lesson as the
    # kcore scaling graphs)
    lon_span_u = max(10_000, (n // 4) // 10)  # units of 1e-4 deg
    hot = F.col("id") % 4 == 0
    h1 = F.xxhash64(F.col("id"), F.lit(1))
    h2 = F.xxhash64(F.col("id"), F.lit(2))
    hlat = F.lit(40.0) + F.pmod(h1, F.lit(50000)).cast("double") / F.lit(10000.0)
    hlon = F.lit(-74.0) + F.pmod(h2, F.lit(lon_span_u)).cast("double") / F.lit(10000.0)
    ulat = F.lit(-60.0) + F.pmod(h1, F.lit(120000)).cast("double") / F.lit(1000.0)
    ulon = F.lit(-150.0) + F.pmod(h2, F.lit(300000)).cast("double") / F.lit(1000.0)
    pts = spark.range(n).select(
        "id",
        F.when(hot, hlat).otherwise(ulat).alias("lat"),
        F.when(hot, hlon).otherwise(ulon).alias("lon"),
    )
    segs = pts.select(
        F.col("id").alias("seg_id"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
        (F.col("lat") + (F.pmod(F.col("id") * F.lit(31), F.lit(100)).cast("double") - F.lit(50.0)) / F.lit(10000.0)).alias("blat"),
        (F.col("lon") + (F.pmod(F.col("id") * F.lit(37), F.lit(100)).cast("double") - F.lit(50.0)) / F.lit(10000.0)).alias("blon"),
    )
    out = segment_intersect_join(segs, segs, level=13)
    return out.where(F.col("id_a") < F.col("id_b")).count()


def leg_str_partition(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.layout import str_partition

    pts = _points(spark, n)
    out = str_partition(pts, 16, 16, id_col="id")
    # deterministic checksum of the full assignment
    return int(
        out.agg(
            F.sum(F.col("part_id").cast("bigint") * (F.col("id") % 997))
        ).first()[0]
        % (1 << 31)
    )


def leg_points_along(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.measures import points_along_lines

    verts = _points(spark, n).select(
        (F.col("id") / 100).cast("long").alias("line_id"),
        (F.col("id") % 100).alias("seq"),
        "lat",
        "lon",
    )
    # ~1e8-unit segments -> spacing 2e8 keeps output O(n)
    out = points_along_lines(verts, 200_000_000)
    return out.count()


def leg_map_match(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.matching import map_match

    # street grid: 200 rows x 50 columns of horizontal edges over a
    # 2 x 0.5 degree city; tracks of 50 points walk their home street
    # with jitter straying toward neighbors (real HMM work per step)
    cols_n = 50
    segs = spark.range(200 * cols_n).select(
        F.col("id").alias("seg_id"),
        (F.lit(40.0) + F.expr(f"id DIV {cols_n}").cast("double") * F.lit(0.002)).alias("alat"),
        (F.lit(-74.0) + (F.col("id") % cols_n).cast("double") * F.lit(0.01)).alias("alon"),
        (F.lit(40.0) + F.expr(f"id DIV {cols_n}").cast("double") * F.lit(0.002)).alias("blat"),
        (F.lit(-74.0) + (F.col("id") % cols_n + 1).cast("double") * F.lit(0.01)).alias("blon"),
    )
    k = F.col("id")
    pts = spark.range(n).select(
        F.expr("id DIV 50").alias("track_id"),
        (k % 50).alias("seq"),
        (
            F.lit(40.0)
            + (F.expr("id DIV 50") % 200).cast("double") * F.lit(0.002)
            + ((k * 13) % 25 - 12).cast("double") / F.lit(10000.0)
        ).alias("lat"),
        (F.lit(-74.0) + ((k * 37) % (cols_n * 100)).cast("double") / F.lit(10000.0)).alias("lon"),
    )
    out = map_match(pts, segs, radius=0.004, switch_penalty=3000)
    return out.count()


def leg_hex_kring(spark, n: int) -> int:
    from osm_pbf_spark.functions.hexgrid import hex_kring_counts

    pts = _points(spark, n)
    out = hex_kring_counts(pts, size=0.03125)
    return out.count()


def leg_frequent_items(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.sketch import frequent_items

    # zipf-ish: 60% of rows in 200 hot items, tail unique
    items = spark.range(n).select(
        F.when(F.col("id") % 5 < 3, F.col("id") % 200)
        .otherwise(F.col("id"))
        .cast("string")
        .alias("item")
    )
    out = frequent_items(items, "item", k=1024, min_count=max(2, n // 2000))
    return out.count()


def leg_basins(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import terminal_labels

    # deterministic functional forest: xxhash-derived parents strictly
    # decrease, so paths terminate at node 0 (self-loop)
    ptr = spark.range(n).select(
        F.col("id").alias("node"),
        F.when(F.col("id") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.pmod(F.xxhash64(F.col("id")), F.col("id")).cast("bigint")
        )
        .alias("next"),
    )
    # random parent < id halves the magnitude per hop in expectation:
    # depth ~ log2(n); rounds=6 covers 2^6 = 64 jumped steps
    out = terminal_labels(ptr, rounds=6)
    return out.where(F.col("root") == 0).count()


def leg_random_walks(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import random_walks

    # xxhash-derived endpoints (a linear-congruential pair collapses to
    # N distinct edges — recorded lesson); ~10 edges/node
    m = max(1000, n // 10)
    edges = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(m)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(m)).alias("dst"),
    )
    return random_walks(edges, n_steps=4, walks_per_node=1).count()


def leg_stream_window(spark, n: int) -> int:
    import os as _os

    from pyspark.sql import functions as F

    from osm_pbf_spark.streaming import (
        run_available_now,
        stream_parquet,
        windowed_counts,
    )

    # input parquet cached by size on /tmp: the first (cores, rep) call
    # pays the write, best-of-REPS drops it — the timed region is the
    # stream drain (scan + micro-batch partial agg + state merge)
    path = f"/tmp/scaling_stream_{n}.parquet"
    if not _os.path.exists(path):
        spark.range(n).select(
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=(F.col("id") % 864000).cast("double"))
            ).alias("ts"),
            (F.col("id") % 37).cast("string").alias("key"),
            (F.pmod(F.xxhash64(F.col("id")), F.lit(100000)).cast("double") / F.lit(100.0)).alias("value"),
        ).repartition(64).write.mode("overwrite").parquet(path)
    sdf = stream_parquet(spark, path)
    out = run_available_now(
        windowed_counts(sdf, "ts", ["key"], "15 minutes", val_col="value")
    )
    return out.count()


def leg_kde(spark, n: int) -> int:
    from osm_pbf_spark.operators.tiling import kde_grid

    return kde_grid(_points(spark, n), level=13, k=5).count()


def _leg_docs(spark, n: int, dup_groups: bool):
    """Deterministic synthetic corpus: 40-token docs; with dup_groups
    every 4 consecutive ids share one text (cross-doc repetition)."""
    from pyspark.sql import functions as F

    base = (F.col("id") - F.pmod(F.col("id"), F.lit(4))) if dup_groups else F.col("id")
    tok = lambda j: F.concat(  # noqa: E731
        F.lit("t"), F.pmod(base * F.lit(31) + j * F.lit(11), F.lit(2000))
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(40)), tok), " "
        ).alias("text"),
    )


def leg_ngram_spans(spark, n: int) -> int:
    from osm_pbf_spark.operators.dedup import repeated_ngram_spans

    return repeated_ngram_spans(_leg_docs(spark, n, True), k=8).count()


def leg_rake(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import rake_keywords

    docs = _leg_docs(spark, n, False).select(
        "doc_id",
        F.regexp_replace("text", "t7([0-9]) ", "the ").alias("text"),
    )
    return rake_keywords(docs, top_k=3).count()


def leg_acf(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.temporal import acf

    series = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(1024)).alias("key"),
        F.col("id").alias("seq"),
        F.pmod(F.col("id") * F.lit(37), F.lit(101)).cast("double").alias("val"),
    )
    return acf(series, max_lag=5).count()


def leg_rank_metrics(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.evals import rank_metrics

    df = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(4096)).alias("q"),
        F.col("id").alias("item"),
        F.pmod(F.col("id") * F.lit(37), F.lit(100001)).alias("score"),
        F.when(F.pmod(F.col("id"), F.lit(7)) == 0, F.lit(2))
        .when(F.pmod(F.col("id"), F.lit(3)) == 0, F.lit(1))
        .otherwise(F.lit(0))
        .alias("rel"),
    )
    out = rank_metrics(df, "q", "item", "rel", "score", k=10)
    # count() alone lets Catalyst prune the window columns (measured
    # 1.2B rows in 2.6 s = spark.range + distinct); summing dcg/idcg
    # forces BOTH ranking windows
    row = out.agg(
        F.sum("dcg_u").alias("a"), F.sum("idcg_u").alias("b")
    ).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_span_corrupt(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import span_corruption

    docs = _leg_docs(spark, n, False).select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    )
    out = span_corruption(docs, "doc_id", "toks", seed=3, noise_ppm=200_000)
    return out.select(F.sum("n_masked")).collect()[0][0] or 0


def leg_c4(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import lang_id, quality_score

    docs = _leg_docs(spark, n, True)  # dup groups -> dedup binds
    scored = docs.select(
        "doc_id",
        "text",
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lp"),
    )
    filt = scored.where(F.col("q") >= 0.2)
    keeper = filt.groupBy(F.md5("text").alias("fp")).agg(
        F.min("doc_id").alias("keep")
    )
    kept = (
        filt.withColumn("fp", F.md5("text"))
        .join(keeper, "fp")
        .where(F.col("doc_id") == F.col("keep"))
    )
    return kept.count()


def leg_hits(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import hits_scores

    m = max(n // 8, 64)
    edges = spark.range(n).select(
        F.pmod(F.col("id"), F.lit(m)).alias("src"),
        F.pmod(
            F.xxhash64(F.col("id") * F.lit(2654435761)), F.lit(m)
        ).alias("dst"),
    )
    return hits_scores(edges, iterations=3).count()



def leg_kmeans(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.ann import kmeans_fit

    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda j: (
                F.pmod(F.col("id"), F.lit(8)).cast("double") * F.lit(10.0)
                + F.pmod(F.col("id") * F.lit(7) + j * F.lit(13), F.lit(97)).cast("double")
                / F.lit(100.0)
            ),
        ).alias("embedding"),
    )
    out = kmeans_fit(df, n_clusters=8, n_iters=3)
    row = out.agg(
        F.sum(F.pmod(F.col("d2"), F.lit(1_000_003))).alias("a"),
        F.sum("cluster").alias("b"),
    ).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_winnow(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import winnow_fingerprints

    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda i: F.concat(
                    F.lit("w"),
                    F.pmod(F.col("id") * F.lit(7) + i * F.lit(13), F.lit(997)).cast("string"),
                ),
            ),
        ).alias("text"),
    )
    out = winnow_fingerprints(df, k=4, window=3)
    # modulo before the sum: 2^40 hashes x 10^8 fingerprints overflows
    row = out.agg(
        F.sum(F.pmod(F.col("fp_hash"), F.lit(1_000_003))).alias("a")
    ).collect()[0]
    return int(row.a or 0)


def leg_cidr(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.text import cidr_join

    k = F.col("id")
    ips = spark.range(n).select(
        F.col("id").alias("rid"),
        F.concat_ws(
            ".",
            (k % 200 + 10).cast("string"),
            ((k * 7) % 256).cast("string"),
            ((k * 13) % 256).cast("string"),
            (k % 251).cast("string"),
        ).alias("ip"),
    )
    m = F.col("id")
    nets = spark.range(50_000).select(
        F.concat_ws(
            ".",
            (m % 200 + 10).cast("string"),
            ((m * 37) % 256).cast("string"),
            F.lit("0"),
            F.lit("0"),
        ).alias("base"),
        (F.lit(10) + m % 14).cast("int").alias("masklen"),
    )
    out = cidr_join(ips, nets)
    row = out.agg(
        F.count("net_base").alias("a"), F.sum("net_masklen").alias("b")
    ).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_nearest_event(spark, n: int) -> int:
    import datetime as dt

    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.temporal import nearest_event_join

    t0 = F.lit(dt.datetime(2024, 1, 1))
    base = spark.range(n).select(
        F.col("id"),
        F.pmod(F.col("id"), F.lit(10_000)).alias("key"),
        (t0 + F.make_interval(secs=F.pmod(F.col("id") * F.lit(37), F.lit(10_000_000)).cast("double"))).alias("ts"),
    )
    left = base.where(F.col("id") % 3 != 0).select("id", "key", "ts")
    right = base.where(F.col("id") % 3 == 0).select(
        "key", "ts", (F.col("id") % 100).cast("double").alias("val")
    )
    out = nearest_event_join(left, right, on="key")
    # modulo before the sum: epoch-micros * 24M rows overflows int64
    row = out.agg(
        F.sum(F.pmod(F.col("nearest_ts_us_r"), F.lit(1_000_003))).alias("a")
    ).collect()[0]
    return int(row.a or 0)


def leg_matching(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import maximal_matching

    nn = max(1000, n // 10)
    df = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(nn)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(nn)).alias("dst"),
    )
    out = maximal_matching(df)
    row = out.agg(F.count(F.lit(1)).alias("a"), F.sum("u").alias("b")).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_mis(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.graph import luby_mis

    nn = max(1000, n // 10)
    df = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(nn)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(nn)).alias("dst"),
    )
    out = luby_mis(df)
    row = out.agg(F.count(F.lit(1)).alias("a"), F.sum("node").alias("b")).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_flow_acc(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.tiling import flow_accumulation, flow_direction

    side = max(64, int(n ** 0.5))
    grid = spark.range(side * side).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("bigint").alias("y"),
        # 32-wide drainage basins (z ramps with x mod 32): wave count
        # is bounded by the basin width (~32 + ripple), not the grid
        # side — the leg measures the per-wave shuffles, not 10^3
        # driver round-trips of a continental river
        (
            F.pmod(F.col("id"), F.lit(32)) * 100
            + F.pmod(F.xxhash64(F.col("id")), F.lit(37))
        ).alias("z"),
    )
    out = flow_accumulation(flow_direction(grid))
    row = out.agg(F.sum("acc").alias("a"), F.max("acc").alias("b")).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_centroid(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.measures import ring_centroid

    # n/64-ring table of 64-vertex polygons (pure codegen folds)
    rings = spark.range(max(1, n // 64)).select(
        F.col("id").cast("string").alias("poly_id"),
        F.lit(0).cast("int").alias("ring_idx"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.struct(
                (
                    (F.pmod(F.col("id"), F.lit(1700)) - 850).cast("double")
                    / F.lit(10.0)
                    + F.sin(i.cast("double") / F.lit(10.186)) / F.lit(100.0)
                ).alias("lat"),
                (
                    (F.pmod(F.col("id") * 7, F.lit(3500)) - 1750).cast("double")
                    / F.lit(10.0)
                    + F.cos(i.cast("double") / F.lit(10.186)) / F.lit(100.0)
                ).alias("lon"),
            ),
        ).alias("pts"),
    )
    out = ring_centroid(rings)
    row = out.agg(
        F.sum("area2_q").alias("a"),
        F.sum(F.floor(F.col("c_lat") * 1000)).alias("b"),
    ).collect()[0]
    return int(row.a or 0) + int(row.b or 0)


def leg_bh_fdr(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.stats import bh_fdr

    df = spark.range(n).select(
        F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_001)).alias("p_ppm")
    )
    (r,) = bh_fdr(df, alpha_num=5, alpha_den=100).collect()
    return int(r.m) + int(r.n_discoveries) + int(r.p_cutoff_ppm or 0)


def leg_densify(spark, n: int) -> int:
    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.measures import densify_route

    legs = spark.range(n).select(
        F.col("id").alias("leg"),
        (F.pmod(F.col("id"), F.lit(160)) - 80).cast("double").alias("lat1"),
        (F.pmod(F.col("id") * 7, F.lit(360)) - 180).cast("double").alias("lon1"),
        (F.pmod(F.col("id") * 11, F.lit(160)) - 80).cast("double").alias("lat2"),
        (F.pmod(F.col("id") * 13, F.lit(360)) - 180).cast("double").alias("lon2"),
    )
    out = densify_route(legs, n_points=4)
    row = out.agg(
        F.sum(F.pmod(F.col("lat_e7"), F.lit(1_000_003))).alias("a")
    ).collect()[0]
    return int(row.a or 0)


LEGS = {
    "distance_join": leg_distance_join,
    "bbox_join": leg_bbox_join,
    "connected_components": leg_connected_components,
    "grid_smooth": leg_grid_smooth,
    "skyline": leg_skyline,
    "count_min": leg_count_min,
    "debounce": leg_debounce,
    "kcore": leg_kcore,
    "getis_ord": leg_getis_ord,
    "map_match": leg_map_match,
    "str_partition": leg_str_partition,
    "points_along": leg_points_along,
    "bloom_reduce": leg_bloom_reduce,
    "pq_scan": leg_pq_scan,
    "hist_quantiles": leg_hist_quantiles,
    "seg_intersect": leg_seg_intersect,
    "hex_kring": leg_hex_kring,
    "frequent_items": leg_frequent_items,
    "basins": leg_basins,
    "random_walks": leg_random_walks,
    "stream_window": leg_stream_window,
    "kde": leg_kde,
    "ngram_spans": leg_ngram_spans,
    "rake": leg_rake,
    "acf": leg_acf,
    "rank_metrics": leg_rank_metrics,
    "span_corrupt": leg_span_corrupt,
    "hits": leg_hits,
    "c4": leg_c4,
    "kmeans": leg_kmeans,
    "winnow": leg_winnow,
    "cidr": leg_cidr,
    "nearest_event": leg_nearest_event,
    "matching": leg_matching,
    "mis": leg_mis,
    "flow_acc": leg_flow_acc,
    "centroid": leg_centroid,
    "bh_fdr": leg_bh_fdr,
    "densify": leg_densify,
}

# per-leg size multiplier on N_POINTS: every timed region must DWARF
# the fixed costs (scan gen, codegen, Python-worker spinup) or the
# efficiency number measures overhead, not the operator
LEG_SCALE = {
    "distance_join": 0.7,
    "bbox_join": 1.0,
    "connected_components": 0.7,
    "grid_smooth": 12.0,
    "skyline": 10.0,
    "count_min": 10.0,
    "debounce": 6.0,
    "kcore": 4.0,
    "getis_ord": 12.0,
    "bloom_reduce": 20.0,
    "pq_scan": 1.0,
    # 60M rows finished in ~0.6 s (overhead-dominated measurement);
    # the histogram needs ~600M rows before the agg dwarfs fixed costs
    "hist_quantiles": 200.0,
    "seg_intersect": 0.7,
    # 12M rows ran in ~9 s with ~no core sensitivity (driver actions +
    # checkpoint write dominate); the window sorts need ~60M rows
    "str_partition": 20.0,
    # 12M verts finished in ~1.5 s (overhead-dominated); the window +
    # Generate need ~120M before the operator dwarfs fixed costs
    "points_along": 40.0,
    # ~50 candidate segs x 50-point Viterbi per track: heavy per-row
    # work, 900k points is already ~1 min at 8 cores
    "map_match": 0.3,
    "hex_kring": 12.0,
    "kmeans": 2.0,
    "winnow": 0.5,
    "cidr": 6.0,
    "nearest_event": 8.0,
    "matching": 2.0,
    # MIS rounds: same per-round shuffle class as matching
    "mis": 2.0,
    # wave count follows the drainage depth (side cells); n is the
    # GRID CELL count (side = sqrt(n))
    "flow_acc": 0.15,
    # pure codegen array folds: n / 64 rings of 64 vertices
    "centroid": 8.0,
    # distinct-p agg + 1024-bucket two-pass prefix
    "bh_fdr": 20.0,
    # map-only Generate + trig chain, 4 points per leg
    "densify": 2.0,
    "frequent_items": 10.0,
    # 6 pointer-doubling joins: rows x rounds shuffle volume
    "basins": 3.0,
    # adjacency agg + 4 frontier joins: edges x rounds shuffle volume.
    # 6M edges measured ANTI-scaling (eff 0.138 — 600k-row frontier
    # shuffles are pure scheduling overhead at 32 cores); the joins
    # need ~60M edges / 6M nodes before the operator dominates
    "random_walks": 20.0,
    # stream drain: scan + micro-batch partial agg + state-store
    # merge. 60M rows drained in ~3 s (micro-batch setup is a ~1-2 s
    # fixed cost); needs ~600M rows to dwarf it
    "stream_window": 200.0,
    # two 1-D scatter passes over occupied cells; level-11/36M-point
    # first sizing measured 3 s walls BOTH sides (pure overhead) —
    # level 13 k=5 makes the scatter the cost
    "kde": 40.0,
    # 33 8-token windows/doc -> a ~33n-row fp window + islands window;
    # 3M docs measured 112 s@8 (bandwidth-bound) — 0.9M keeps the legs
    # in budget at the same plan shape
    "ngram_spans": 0.3,
    # islands window + corpus vocab agg + term join + phrase agg
    "rake": 0.5,
    # one keyed window sort + 5-lag explode + partial agg; 30M rows
    # measured 2 s@32 (overhead) -> 300M
    "acf": 100.0,
    # two window sorts over the query key + rollup
    "rank_metrics": 20.0,
    # posexplode -> per-doc window -> regroup: ~40 rows/doc
    "span_corrupt": 0.7,
    # 3 rounds x 2 (join + agg + norm) passes over the edge set
    "hits": 10.0,
    # quality/lang codegen scan + one md5-keyed dedup shuffle
    "c4": 4.0,
}


def main() -> None:
    only = set(sys.argv[3:])
    legs = {k: v for k, v in LEGS.items() if not only or k in only}
    walls: dict[str, dict[int, list[float]]] = {k: {CORES_LO: [], CORES_HI: []} for k in legs}
    checks: dict[str, set] = {k: set() for k in legs}
    # ONE FRESH SESSION PER (leg, cores, rep): running legs back-to-back
    # in a shared JVM lets an earlier leg's heap/GC state bleed into the
    # next measurement (observed: skyline 3x slower after the 3.8G-pair
    # distance leg). Startup is untimed.
    for name, fn in legs.items():
        n = int(N_POINTS * LEG_SCALE[name])
        for rep in range(REPS):
            for cores in (CORES_LO, CORES_HI):
                spark = _session(cores)
                try:
                    fn(spark, max(50_000, n // 20))  # warm plan/codegen
                    t = time.time()
                    res = fn(spark, n)
                    walls[name][cores].append(time.time() - t)
                    checks[name].add(res)
                finally:
                    spark.stop()
        done = {c: [round(x, 3) for x in walls[name][c]] for c in walls[name]}
        print(f"LEG {name} {json.dumps(done)}", file=sys.stderr, flush=True)
    report = {"n_points": N_POINTS, "reps": REPS, "cores": [CORES_LO, CORES_HI], "legs": {}}
    for name in legs:
        n = int(N_POINTS * LEG_SCALE[name])
        t_lo = min(walls[name][CORES_LO])
        t_hi = min(walls[name][CORES_HI])
        report["legs"][name] = {
            "n_input": n,
            "wall_lo": round(t_lo, 3),
            "wall_hi": round(t_hi, 3),
            "throughput_lo": round(n / t_lo, 1),
            "throughput_hi": round(n / t_hi, 1),
            "efficiency": round(t_lo / (4.0 * t_hi), 3),
            "deterministic": len(checks[name]) == 1,
            "result": sorted(checks[name])[0],
            "all_reps": {str(c): [round(x, 3) for x in walls[name][c]] for c in walls[name]},
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
