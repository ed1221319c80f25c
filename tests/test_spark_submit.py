"""Launch-posture test (BASELINE.json:14): the packaged engine must run
end-to-end via ``spark-submit --py-files`` — the exact invocation a real
cluster would use — not only via in-process SparkSession.

Runs jobs/ingest_job.py against a small synthetic PBF on local[4] from a
scratch cwd (so imports can only resolve from the zip) and asserts the
job's JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on box")
def test_spark_submit_pyfiles(tmp_path):
    sys.path.insert(0, REPO)
    from tests.gen_documents import synth_pbf
    from tools.package_pyfiles import build

    pbf = synth_pbf(str(tmp_path / "mini.pbf"), n_nodes=2_000, nodes_per_blob=500)
    zip_path = build(str(tmp_path / "osm_pbf_spark.zip"))
    table = str(tmp_path / "table")

    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files only
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "ingest_job.py"),
            "--pbf", pbf,
            "--table", table,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = next(
        json.loads(line) for line in proc.stdout.splitlines()
        if line.startswith('{"job": "ingest"')
    )
    assert summary["n_docs"] == 2_000
    assert 0 < summary["pip_rows"] <= 2_000
    assert summary["pyramid_rows"] > 0
    # the sink committed a snapshot + per-split manifests
    assert os.path.exists(os.path.join(table, "_manifests"))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on box")
def test_spark_submit_export_job(tmp_path):
    sys.path.insert(0, REPO)
    from tests.gen_documents import synth_pbf
    from tools.package_pyfiles import build

    pbf = synth_pbf(str(tmp_path / "mini.pbf"), n_nodes=2_000, nodes_per_blob=500)
    zip_path = build(str(tmp_path / "osm_pbf_spark.zip"))
    out = str(tmp_path / "extract")

    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "export_job.py"),
            "--pbf", pbf,
            "--out", out,
            "--bbox=-45,-120,45,120",
            "--n-files", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = next(
        json.loads(line) for line in proc.stdout.splitlines()
        if line.startswith('{"job": "export"')
    )
    # the bbox clips some but not all nodes
    assert 0 < summary["n_nodes"] < 2_000
    assert summary["n_files"] >= 1
    files = sorted(os.listdir(out))
    assert all(f.endswith(".osm.pbf") for f in files)

    # the exported extract reads back with exactly the clipped count
    from osm_pbf_spark.session import get_spark
    from osm_pbf_spark.sources import pbf_source as src

    spark = get_spark(master="local[4]")
    ents, hdr = src.read_pbf(spark, [os.path.join(out, f) for f in files])
    assert ents.where("kind = 'node'").count() == summary["n_nodes"]
    # decode multiplies nano-degrees by the inexact double 1e-9 -> the
    # header bbox round-trips to within 1 ulp, not bit-exactly
    for k, v in {"left": -120.0, "right": 120.0,
                 "top": 45.0, "bottom": -45.0}.items():
        assert abs(hdr["bbox"][k] - v) < 1e-9, (k, hdr["bbox"][k])


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on box")
def test_spark_submit_stream_ingest_job(tmp_path):
    """Drain-mode streaming ingestion via spark-submit --py-files: two
    runs against the same checkpoint; the second must pick up ONLY the
    file added in between (exactly-once across restarts)."""
    sys.path.insert(0, REPO)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tools.package_pyfiles import build

    zip_path = build(str(tmp_path / "osm_pbf_spark.zip"))
    src = tmp_path / "landing"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def land(name, lo, hi, mtime):
        f = str(src / name)
        pq.write_table(
            pa.table({"doc_id": list(range(lo, hi)), "v": [i % 9 for i in range(lo, hi)]}),
            f,
        )
        os.utime(f, (mtime, mtime))

    def run():
        env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
        env.pop("PYTHONPATH", None)
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "stream_ingest_job.py"),
                "--src", str(src),
                "--table", table,
                "--checkpoint", ckpt,
                "--stats-col", "doc_id",
            ],
            capture_output=True, text=True, timeout=420, cwd=str(tmp_path), env=env,
        )
        assert proc.returncode == 0, proc.stderr[-4000:]
        return next(
            json.loads(line) for line in proc.stdout.splitlines()
            if line.startswith('{"job": "stream_ingest"')
        )

    land("a.parquet", 0, 500, 1_700_000_000)
    s1 = run()
    assert s1["table_rows"] == 500 and s1["splits_committed"] == 1

    land("b.parquet", 500, 800, 1_700_000_100)
    s2 = run()
    assert s2["table_rows"] == 800 and s2["splits_committed"] == 2


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on box")
def test_spark_submit_dedup_job(tmp_path):
    """The corpus-dedup job end-to-end from the packaged zip: planted
    near-dup copies collapse to their canonical survivors."""
    sys.path.insert(0, REPO)
    from tools.package_pyfiles import build

    spark_local = None
    # build a corpus with planted dups using a short-lived local session
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark_local = SparkSession.builder.master("local[2]").getOrCreate()
    rows = []
    for i in range(120):
        # distinct token streams per doc (a rotated shared vocabulary
        # would make every doc's SHINGLE SET identical)
        txt = " ".join(f"w{(i * 97 + j * 13) % 9973}" for j in range(40))
        rows.append((i, txt))
        if i < 20:
            rows.append((1000 + i, txt))  # exact copy
    docs = str(tmp_path / "docs")
    spark_local.createDataFrame(rows, "doc_id long, text string").write.parquet(docs)

    zip_path = build(str(tmp_path / "osm_pbf_spark.zip"))
    out = str(tmp_path / "deduped")
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable, PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "dedup_job.py"),
            "--docs", docs,
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = next(
        json.loads(line) for line in proc.stdout.splitlines()
        if line.startswith('{"job": "dedup"')
    )
    assert summary["n_docs"] == 140
    assert summary["n_survivors"] == 120          # 20 copies removed
    assert summary["n_removed"] == 20
    surv = spark_local.read.parquet(out)
    assert surv.count() == 120
    # every planted copy's canonical is the ORIGINAL (min id)
    assert surv.where(F.col("doc_id") >= 1000).count() == 0
