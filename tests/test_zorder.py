"""Z-order layout keys (functions/zorder.py) and the zorder compaction
rewrite (sink.compact(zorder=...))."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osm_pbf_spark.functions.zorder import zorder_key_col, zorder_sorted
from osm_pbf_spark.sink.iceberg_like import IcebergLikeSink


def _z_py(vals: list[float], los: list[float], his: list[float], bits: int) -> int:
    """Scalar replay: same quantize op order, plain-int interleave."""
    k = len(vals)
    out = 0
    for i, (v, lo, hi) in enumerate(zip(vals, los, his)):
        if hi == lo:
            q = 0
        else:
            q = int(math.floor((v - lo) / (hi - lo) * float(1 << bits)))
            q = min(max(q, 0), (1 << bits) - 1)
        for b in range(bits):
            out |= ((q >> b) & 1) << (b * k + i)
    return out


@pytest.mark.parametrize("bits,k", [(16, 2), (8, 3), (31, 2), (10, 1)])
def test_zorder_key_matches_scalar_replay(spark, bits, k):
    rows = [
        tuple(float(((i * p) % 97) - 48) for p in (7, 13, 29)[:k])
        for i in range(200)
    ]
    # include exact range endpoints and out-of-range values
    rows += [tuple([-50.0] * k), tuple([50.0] * k), tuple([999.0] * k)]
    cols = [f"c{i}" for i in range(k)]
    df = spark.createDataFrame(rows, ", ".join(f"{c} double" for c in cols))
    los, his = [-50.0] * k, [50.0] * k
    key = zorder_key_col([F.col(c) for c in cols], los, his, bits=bits)
    got = df.select(*cols, key.alias("z")).collect()
    for r in got:
        want = _z_py([r[c] for c in cols], los, his, bits)
        assert r.z == want, (tuple(r), want)


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError):
        zorder_key_col([F.lit(1.0)], [0.0], [1.0, 2.0])
    with pytest.raises(ValueError):
        zorder_key_col([F.lit(1.0)] * 4, [0.0] * 4, [1.0] * 4, bits=16)


def test_zorder_sorted_clusters_both_columns(spark):
    # two independent uniform columns: a z-sort must cluster both
    df = spark.range(4096).select(
        ((F.col("id") * 7919) % 64).alias("a"),
        ((F.col("id") * 104729) % 64).alias("b"),
    )
    z = zorder_sorted(df, ["a", "b"], bits=6).withColumn(
        "part", F.floor(F.monotonically_increasing_id() / 256)
    )
    # crude clustering metric: mean per-chunk extent of each column
    ext = z.groupBy("part").agg(
        (F.max("a") - F.min("a")).alias("ea"), (F.max("b") - F.min("b")).alias("eb")
    )
    row = ext.agg(F.avg("ea"), F.avg("eb")).collect()[0]
    # a random/linear layout gives extent ~63 on at least one column;
    # z-order keeps BOTH well below
    assert row[0] < 40 and row[1] < 40, tuple(row)


def _docs2(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 7919) % 1000).alias("cell"),
        ((F.col("id") * 104729) % 1000).alias("aux"),
    )


def _file_stat_extent(sink, col) -> float:
    """Mean per-file (max-min) of ``col`` across live data files."""
    import pyarrow.parquet as pq

    exts = []
    for f in sink.committed_files():
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        exts.append(hi - lo)
    return sum(exts) / len(exts)


def test_compact_zorder_lossless_and_clusters_secondary(spark, tmp_path):
    def rows(sink):
        return sorted(tuple(r) for r in sink.read(spark).collect())

    # linear compaction baseline
    lin = IcebergLikeSink(str(tmp_path / "lin"), stats_col="cell",
                          target_file_bytes=64 * 1024)
    # small target => enough output files that the z-curve's top bits
    # split BOTH dimensions (2 files would split only the top column)
    zo = IcebergLikeSink(str(tmp_path / "zo"), stats_col="cell",
                         target_file_bytes=16 * 1024)
    for s in (lin, zo):
        for i in range(4):
            s.write_split(_docs2(spark, i * 4000, (i + 1) * 4000).coalesce(2), f"{i:04d}")
        s.commit_snapshot()
    before = rows(lin)
    assert lin.compact(spark) is not None
    m = zo.compact(spark, zorder=["cell", "aux"])
    assert m is not None and m["lineage"]["zorder"] == ["cell", "aux"]
    lin.commit_snapshot()
    zo.commit_snapshot()
    # lossless either way
    assert rows(lin) == before and rows(zo) == before
    # the zorder rewrite pins its file count from input bytes (AQE must
    # not coalesce it away) — multiple files, deterministically
    assert len(zo.committed_files()) > 1
    if len(lin.committed_files()) > 1:
        # the z-order rewrite must cluster the SECONDARY column far
        # better than the linear stats_col sort
        assert _file_stat_extent(zo, "aux") < 0.8 * _file_stat_extent(lin, "aux")
    # and still cluster cell usefully vs the full 0..999 extent
    assert _file_stat_extent(zo, "cell") < 600


def test_multicolumn_manifest_stats_pruning(spark, tmp_path):
    sink = IcebergLikeSink(
        str(tmp_path / "mz"), stats_col=None, stats_cols=["cell", "aux"],
        target_file_bytes=48 * 1024,
    )
    for i in range(4):
        sink.write_split(_docs2(spark, i * 4000, (i + 1) * 4000).coalesce(2), f"{i:04d}")
    sink.commit_snapshot()
    assert sink.compact(spark, zorder=["cell", "aux"]) is not None
    sink.commit_snapshot()

    n_all = len(sink.committed_files())
    assert n_all >= 3
    ranges = {"cell": (0, 199), "aux": (700, 999)}
    kept = sink.committed_files(stats_ranges=ranges)
    assert 0 < len(kept) < n_all  # multi-dim pruning actually skips files

    # pruned read is a correct superset: exact predicate gives the truth
    got = sorted(
        r.doc_id
        for r in sink.read(spark, stats_ranges=ranges)
        .filter("cell BETWEEN 0 AND 199 AND aux BETWEEN 700 AND 999")
        .collect()
    )
    want = sorted(
        i for i in range(16000)
        if 0 <= (i * 7919) % 1000 <= 199 and 700 <= (i * 104729) % 1000 <= 999
    )
    assert got == want

    # a range on an UNRECORDED column keeps every file (conservative)
    assert len(sink.committed_files(stats_ranges={"doc_id": (0, 1)})) == n_all
