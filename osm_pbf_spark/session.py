"""SparkSession factory with the configs that matter for this engine.

Tuned for the scale posture in SURVEY.md §4: AQE on (runtime re-plan +
skew-join backstop), Arrow everywhere (vectorized UDF path), shuffle
partitions sized to cores. On a real cluster these scale with
executors; in this sandbox we run local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """min(32g, ~half of detected RAM): single-JVM local mode sizes the
    driver heap like an executor fleet (32 concurrent tasks of sort/join
    buffers), but on smaller or cgroup-limited hosts (CI containers) a
    fixed 32g heap would exceed the memory limit and die at the first
    large allocation instead of degrading. SPARK_DRIVER_MEMORY overrides."""
    limits = []
    try:
        limits.append(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError, AttributeError):
        pass
    for p in ("/sys/fs/cgroup/memory.max", "/sys/fs/cgroup/memory/memory.limit_in_bytes"):
        try:
            with open(p) as f:
                v = f.read().strip()
            if v.isdigit():
                limits.append(int(v))
        except OSError:
            pass
    if not limits:
        return "8g"
    half_gib = max(int(min(limits) / (1 << 30) // 2), 1)
    return f"{min(half_gib, 32)}g"


def get_spark(
    app_name: str = "osm-pbf-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    # one BLAS thread per Python worker: parallelism comes from Spark
    # tasks; N workers x N-thread OpenBLAS pools thrash the box (the
    # kNN matmul measured 5x slower without this). Set before the JVM
    # spawns so daemon-forked workers inherit it.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # heuristics: shuffle partitions ~ cores for local mode; on a big
    # cluster you'd use 2-3x total executor cores.
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(int(n), 1)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # single-JVM local mode: the driver IS the executor, so size its
        # heap like an executor fleet — but never past what the host
        # (or its cgroup) actually has
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_mem()),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
