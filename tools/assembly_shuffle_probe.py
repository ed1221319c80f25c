"""Measure the way-assembly regroup's shuffle volume: the engine's
repartition-on-way_id-BEFORE-aggregate plan vs a direct groupBy whose
map-side partial collect_list runs over ref-scattered vertices
(sources/pbf_source.assemble_way_geometries, late round 3).

Runs both variants in one session over the mixed bench corpus and sums
shuffle write/read bytes of the stages each job ran (Spark REST API).

BOTH variants pin the ref-join to shuffle_hash (same as the engine):
decode-derived frames carry no size statistics, so an unhinted join
gets mis-planned as a broadcast of the whole node table — zero join
shuffle and a way-contiguous probe order that makes the direct
groupBy's partial lists complete (that accident is what the retracted
r3 "-28% packed arrays" measurement was unknowingly comparing
against). Holding the join fixed isolates the regroup strategy. (The
broadcast plan is also a driver OOM at planet scale — see
assemble_way_geometries' docstring.)

PROBE_SHUFFLE_COMPRESS=0 measures RAW bytes (the synthetic corpus's
clustered coords lz4-compress ~5x; real planet coords do not).

Usage: python tools/assembly_shuffle_probe.py [n_nodes] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from osm_pbf_spark.session import get_spark
from osm_pbf_spark.sources import pbf_source as src
from tests.gen_documents import synth_pbf_mixed


def assemble_old(ways_df, nodes_df):
    """The round-2 regroup: direct groupBy — partial collect_list over
    ref-scattered join output, fragmented array rows through the
    exchange."""
    exploded = ways_df.select(
        F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref")
    )
    joined = exploded.join(
        nodes_df.select(F.col("id").alias("ref"), "lat", "lon").hint("shuffle_hash"),
        on="ref", how="inner",
    )
    geom = joined.groupBy("way_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "lat", "lon"))).alias("_pts")
    )
    return geom.select(
        "way_id",
        F.transform(
            "_pts", lambda p: F.struct(p["lat"].alias("lat"), p["lon"].alias("lon"))
        ).alias("points"),
        (
            (F.element_at("_pts", 1)["lat"] == F.element_at("_pts", -1)["lat"])
            & (F.element_at("_pts", 1)["lon"] == F.element_at("_pts", -1)["lon"])
        ).alias("is_closed"),
    )


def assemble_repart_unpacked(ways_df, nodes_df):
    """The round-3 engine plan (pre-r4): repartition-on-way_id before
    the aggregate, but the regroup exchange carries UNPACKED
    (way_id, pos, lat, lon) rows — 5 UnsafeRow words vs the r4
    engine's 4 (way_id/pos packed back into _wp through the
    exchange)."""
    wp = F.shiftleft(F.col("way_id"), 24).bitwiseOR(F.col("pos").cast("long"))
    exploded = ways_df.select(
        F.col("id").alias("way_id"), F.posexplode("refs").alias("pos", "ref")
    ).select(wp.alias("_wp"), "ref")
    joined = exploded.join(
        nodes_df.select(F.col("id").alias("ref"), "lat", "lon").hint("shuffle_hash"),
        on="ref", how="inner",
    ).select(
        F.shiftrightunsigned("_wp", 24).alias("way_id"),
        F.col("_wp").bitwiseAND(F.lit((1 << 24) - 1)).cast("int").alias("pos"),
        "lat",
        "lon",
    )
    geom = (
        joined.repartition(F.col("way_id"))
        .groupBy("way_id")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "lat", "lon"))).alias("_p"))
    )
    return geom.select(
        "way_id",
        F.transform(
            "_p", lambda p: F.struct(p["lat"].alias("lat"), p["lon"].alias("lon"))
        ).alias("points"),
        (
            (F.element_at("_p", 1)["lat"] == F.element_at("_p", -1)["lat"])
            & (F.element_at("_p", 1)["lon"] == F.element_at("_p", -1)["lon"])
        ).alias("is_closed"),
    )


def stage_metrics(ui: str) -> dict[int, tuple[int, int]]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    return {
        s["stageId"]: (s["shuffleWriteBytes"], s["shuffleReadBytes"]) for s in stages
    }


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    conf = {"spark.ui.enabled": "true"}
    if os.environ.get("PROBE_SHUFFLE_COMPRESS", "1") == "0":
        # RAW shuffle bytes: the synthetic corpus's clustered coords
        # lz4-compress ~5x (real planet coords do not), which can mask
        # a 2x raw-width difference entirely — measure both modes
        conf["spark.shuffle.compress"] = "false"
        conf["spark.shuffle.spill.compress"] = "false"
    spark = get_spark("shuffle-probe", master=f"local[{cores}]", extra_conf=conf)
    ui = spark.sparkContext.uiWebUrl
    pbf = synth_pbf_mixed(
        os.path.join("/tmp/osm_pbf_spark_bench", f"corpus_mixed_{n_nodes}.osm.pbf"),
        n_nodes, n_nodes // 10, hot_fraction=0.5,
    )

    out = {}
    variants = [
        ("engine_wp_carry", src.assemble_way_geometries),
        ("repart_unpacked", assemble_repart_unpacked),
        ("direct_groupby", assemble_old),
    ]
    # interleave 2 reps per variant, keep the best (VM steal + cold file
    # cache would otherwise bias whichever runs first)
    for rep in range(2):
        for name, fn in variants if rep % 2 == 0 else variants[::-1]:
            entities, _ = src.read_pbf(spark, pbf)
            before = stage_metrics(ui)
            t0 = time.monotonic()
            n = fn(src.ways(entities), src.nodes(entities)).filter("is_closed").count()
            wall = time.monotonic() - t0
            after = stage_metrics(ui)
            new_stages = {k: v for k, v in after.items() if k not in before}
            res = {
                "closed_ways": n,
                "wall_s": round(wall, 2),
                "shuffle_write_mb": round(sum(v[0] for v in new_stages.values()) / 1e6, 1),
                "shuffle_read_mb": round(sum(v[1] for v in new_stages.values()) / 1e6, 1),
            }
            print(name, res, flush=True)
            if name not in out or res["wall_s"] < out[name]["wall_s"]:
                out[name] = res
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
