"""spark-submit entry point for the corpus near-dup dedup pipeline.

The training-data-production twin of jobs/ingest_job.py: read a
documents table, find near-duplicate clusters (MinHash-LSH pairs ->
connected components), keep one canonical survivor per cluster, and
write the deduplicated corpus — the pipeline every web-scale training
set runs before tokenization. Same launch posture:

    python tools/package_pyfiles.py                  # -> dist/osm_pbf_spark.zip
    /opt/spark/bin/spark-submit \
        --master local[8] \
        --py-files dist/osm_pbf_spark.zip \
        jobs/dedup_job.py --docs <parquet-dir-or-file> --out <dir> \
        [--threshold 0.8] [--shingle-k 5]

Prints one JSON summary line (n_docs, n_pairs, n_groups, n_survivors,
docs_per_sec). Survivors parquet carries (doc_id, group_id,
group_size) joined back to the full document row; replayable (every
stage is deterministic — md5 signatures, min-id groups)."""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--docs", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--shingle-k", type=int, default=5)
    args = p.parse_args()

    from pyspark.sql import functions as F

    from osm_pbf_spark.operators.dedup import minhash_lsh_pairs
    from osm_pbf_spark.operators.graph import dedup_canonical, near_dup_groups

    spark = SparkSession.builder.appName("osm-pbf-dedup").getOrCreate()
    t0 = time.monotonic()
    docs = spark.read.parquet(args.docs)
    n_docs = docs.count()
    pairs = minhash_lsh_pairs(
        docs, threshold=args.threshold, shingle_k=args.shingle_k
    )
    n_pairs = pairs.count()
    groups = near_dup_groups(docs, pairs)
    canon = dedup_canonical(groups)
    survivors = docs.join(canon, "doc_id").select(
        docs["*"], F.col("group_id"), F.col("group_size")
    )
    survivors.write.mode("overwrite").parquet(args.out)
    back = spark.read.parquet(args.out)
    n_surv = back.count()
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "job": "dedup",
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "n_groups": n_surv,
                "n_survivors": n_surv,
                "n_removed": n_docs - n_surv,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
