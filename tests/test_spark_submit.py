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
