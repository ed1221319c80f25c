"""spark-submit entry point for CONTINUOUS ingestion (the streaming
twin of jobs/ingest_job.py).

Tails a parquet prefix (an object-store landing zone on a cluster) and
lands every micro-batch in the Iceberg-shaped sink as an atomic,
idempotent, batch-id-named split commit — exactly-once end-to-end (see
osm_pbf_spark/streaming/ops.py::stream_ingest). Example:

    python tools/package_pyfiles.py              # -> dist/osm_pbf_spark.zip
    /opt/spark/bin/spark-submit \
        --master local[8] \
        --py-files dist/osm_pbf_spark.zip \
        jobs/stream_ingest_job.py --src <dir-or-glob> --table <dir> \
            --checkpoint <dir> [--follow]

Default is a drain (trigger availableNow: process everything present,
commit, exit — the backfill / cron-restart posture; Spark's checkpoint
makes successive runs pick up only new files). ``--follow`` keeps the
query running with a processing-time trigger for a long-lived tailer.
Prints one JSON summary line on exit (drain mode).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help="parquet dir/glob to tail")
    p.add_argument("--table", required=True, help="sink table root")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--stats-col", default=None, help="manifest min/max column")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--follow", action="store_true", help="run continuously")
    p.add_argument("--trigger-seconds", type=int, default=30)
    args = p.parse_args()

    # Imports resolve from the --py-files zip (or a dev checkout).
    from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink
    from osm_pbf_spark.streaming import stream_ingest, stream_parquet

    spark = SparkSession.builder.appName("osm-pbf-stream-ingest").getOrCreate()
    t0 = time.monotonic()
    sink = IcebergLikeSink(args.table, stats_col=args.stats_col)
    sdf = stream_parquet(
        spark, args.src, max_files_per_trigger=args.max_files_per_trigger
    )
    if args.follow:
        q = (
            sdf.writeStream.foreachBatch(
                lambda bdf, bid: sink.write_split(
                    bdf, f"stream-{bid:08d}", lineage={"stream_batch": int(bid)}
                )
            )
            .option("checkpointLocation", args.checkpoint)
            .trigger(processingTime=f"{args.trigger_seconds} seconds")
            .start()
        )
        q.awaitTermination()  # runs until externally stopped
    else:
        q = stream_ingest(sdf, sink, args.checkpoint)
        q.awaitTermination()
        n_rows = sink.read(spark).count()
        print(
            json.dumps(
                {
                    "job": "stream_ingest",
                    "splits_committed": len(sink.completed_splits()),
                    "table_rows": int(n_rows),
                    "wall_sec": round(time.monotonic() - t0, 3),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
