"""Batch-15 operators: HLL sketch, STR partitioning, points-along-lines."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------- HyperLogLog ----------------


def _hll(spark, n, p):
    from osm_pbf_spark.operators.sketch import hll_estimate, hll_sketch

    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    return hll_estimate(hll_sketch(df, "v", p=p), p=p).first()


def test_hll_accuracy_p12(spark):
    est = _hll(spark, 50_000, 12)
    # standard error 1.04/sqrt(4096) = 1.6%; 5% is > 3 sigma
    assert abs(est.est / 50_000 - 1) < 0.05
    assert est.hll_m == 4096


def test_hll_small_range_linear_counting(spark):
    est = _hll(spark, 30, 8)
    # the linear-counting branch is near-exact at 30 of 256 registers
    assert abs(est.est - 30) < 3


def test_hll_merge_equals_full(spark):
    from osm_pbf_spark.operators.sketch import hll_sketch

    df = spark.range(20_000).select(F.col("id").cast("string").alias("v"))
    a = hll_sketch(df.where(F.col("id") % 2 == 0), "v", p=8)
    b = hll_sketch(df.where(F.col("id") % 2 == 1), "v", p=8)
    merged = (
        a.unionAll(b)
        .groupBy("hll_bucket")
        .agg(F.max("hll_register").alias("hll_register"))
    )
    full = hll_sketch(df, "v", p=8)
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_hll_deterministic_across_partitionings(spark):
    from osm_pbf_spark.operators.sketch import hll_sketch

    df = spark.range(5_000).select(F.col("id").cast("string").alias("v"))
    a = hll_sketch(df, "v", p=8)
    b = hll_sketch(df.repartition(13), "v", p=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_hll_bad_p_raises(spark):
    from osm_pbf_spark.operators.sketch import hll_estimate, hll_sketch

    df = spark.range(10).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        hll_sketch(df, "v", p=7)
    with pytest.raises(ValueError):
        hll_estimate(df, p=3)


# ---------------- STR partitioning ----------------


def _pts(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100000)).cast("double") / 1000).alias("lon"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(50000)).cast("double") / 1000).alias("lat"),
    )


def test_str_balance_and_coverage(spark):
    from osm_pbf_spark.operators.layout import str_partition

    out = str_partition(_pts(spark, 1000), 4, 4, id_col="doc_id")
    sizes = {r["part_id"]: r["count"] for r in out.groupBy("part_id").count().collect()}
    assert set(sizes) == set(range(16))
    # slab quota splits 1000 into 250s; tiles into 62/63
    assert min(sizes.values()) >= 62 and max(sizes.values()) <= 63


def test_str_deterministic_across_partitionings(spark):
    from osm_pbf_spark.operators.layout import str_partition

    pts = _pts(spark, 500)
    a = str_partition(pts, 3, 5, id_col="doc_id").select("doc_id", "part_id")
    b = str_partition(pts.repartition(11), 3, 5, id_col="doc_id").select(
        "doc_id", "part_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_str_slabs_are_x_rank_rectangles(spark):
    from osm_pbf_spark.operators.layout import str_partition

    out = str_partition(_pts(spark, 800), 4, 2, id_col="doc_id")
    slabs = (
        out.groupBy("str_slab")
        .agg(F.min("lon").alias("lo"), F.max("lon").alias("hi"))
        .orderBy("str_slab")
        .collect()
    )
    for a, b in zip(slabs, slabs[1:]):
        assert a["hi"] <= b["lo"]
    # within a slab, tiles tile the y axis the same way
    tiles = (
        out.where(F.col("str_slab") == 0)
        .groupBy("str_tile")
        .agg(F.min("lat").alias("lo"), F.max("lat").alias("hi"))
        .orderBy("str_tile")
        .collect()
    )
    for a, b in zip(tiles, tiles[1:]):
        assert a["hi"] <= b["lo"]


def test_str_empty_and_validation(spark):
    from osm_pbf_spark.operators.layout import str_partition

    empty = _pts(spark, 10).where(F.lit(False))
    assert str_partition(empty, 2, 2, id_col="doc_id").count() == 0
    with pytest.raises(ValueError):
        str_partition(_pts(spark, 10), 0, 2, id_col="doc_id")


def test_str_single_slab_is_pure_y_ntile(spark):
    from osm_pbf_spark.operators.layout import str_partition

    out = str_partition(_pts(spark, 90), 1, 3, id_col="doc_id")
    rows = out.select("doc_id", "lat", "part_id").collect()
    ordered = sorted(rows, key=lambda r: (r["lat"], r["doc_id"]))
    for i, r in enumerate(ordered):
        assert r["part_id"] == (i * 3) // 90


# ---------------- points along lines ----------------


def _pal_oracle(verts, spacing):
    """Independent scalar replay (pure Python, same IEEE chain)."""
    import collections

    by_line = collections.defaultdict(list)
    for line, seq, lat, lon in verts:
        x = math.floor(lon * 1_000_000.0 + 0.5)
        y = math.floor(lat * 1_000_000.0 + 0.5)
        by_line[line].append((seq, x, y))
    out = []
    for line, vs in by_line.items():
        vs.sort()
        if len(vs) < 2:
            continue
        segs = []
        for (s0, ax, ay), (s1, bx, by) in zip(vs, vs[1:]):
            ln = math.floor(math.sqrt(float((bx - ax) ** 2 + (by - ay) ** 2)) + 0.5)
            segs.append((s1, ax, ay, bx, by, ln))
        total = sum(s[5] for s in segs)
        cum = 0
        for idx, (seq, ax, ay, bx, by, ln) in enumerate(segs):
            k_lo = -((-cum) // spacing)
            k_hi = -((-(cum + ln)) // spacing) - 1
            if idx == len(segs) - 1 and total % spacing == 0:
                k_hi += 1
            for k in range(k_lo, k_hi + 1):
                t = float(k * spacing - cum) / float(ln) if ln > 0 else 0.0
                out.append(
                    (line, k, k * spacing,
                     float(ax) + t * float(bx - ax),
                     float(ay) + t * float(by - ay))
                )
            cum += ln
    return sorted(out)


def test_points_along_matches_scalar_oracle(spark):
    from osm_pbf_spark.operators.measures import points_along_lines

    import random

    rng = random.Random(7)
    verts = []
    for line in range(12):
        n = rng.randint(1, 9)
        for seq in range(n):
            verts.append(
                (line, seq, rng.uniform(-1, 1), rng.uniform(-1, 1))
            )
    df = spark.createDataFrame(verts, "line_id int, seq int, lat double, lon double")
    got = sorted(
        tuple(r) for r in points_along_lines(df, 170_000).collect()
    )
    assert got == _pal_oracle(verts, 170_000)


def test_points_along_endpoint_on_multiple(spark):
    from osm_pbf_spark.operators.measures import points_along_lines

    # length exactly 2000 units, spacing 1000 -> k = 0, 1, 2 (endpoint in)
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 0.0, 0.002)],
        "line_id int, seq int, lat double, lon double",
    )
    rows = points_along_lines(df, 1000).orderBy("sample_k").collect()
    assert [r["sample_k"] for r in rows] == [0, 1, 2]
    assert rows[-1]["px"] == 2000.0 and rows[-1]["py"] == 0.0


def test_points_along_zero_length_segments(spark):
    from osm_pbf_spark.operators.measures import points_along_lines

    # repeated vertex mid-line owns no samples; single endpoint emit
    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0), (1, 1, 0.0, 0.001), (1, 2, 0.0, 0.001),
         (1, 3, 0.0, 0.002)],
        "line_id int, seq int, lat double, lon double",
    )
    rows = points_along_lines(df, 1000).orderBy("sample_k").collect()
    assert [r["sample_k"] for r in rows] == [0, 1, 2]
    assert len(rows) == 3  # endpoint emitted exactly once


def test_points_along_validation_and_degenerates(spark):
    from osm_pbf_spark.operators.measures import points_along_lines

    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0)], "line_id int, seq int, lat double, lon double"
    )
    assert points_along_lines(df, 100).count() == 0  # single vertex
    with pytest.raises(ValueError):
        points_along_lines(df, 0)


# ---------------- HMM map matching ----------------


def _grid_scene():
    """Two parallel streets, 10 edges each."""
    segs = []
    for i in range(10):
        segs.append((i, 0.0, i * 0.01, 0.0, (i + 1) * 0.01))
        segs.append((100 + i, 0.003, i * 0.01, 0.003, (i + 1) * 0.01))
    return segs


def test_map_match_penalty_suppresses_outlier(spark):
    from osm_pbf_spark.operators.matching import map_match

    segs = _grid_scene()
    pts = [(1, j, 0.0002 if j != 4 else 0.0028, 0.005 + j * 0.01) for j in range(8)]
    seg_df = spark.createDataFrame(
        segs, "seg_id long, alat double, alon double, blat double, blon double"
    )
    pt_df = spark.createDataFrame(pts, "track_id long, seq long, lat double, lon double")
    with_pen = {r["seq"]: r["seg_id"] for r in map_match(pt_df, seg_df, 0.01, 5000).collect()}
    no_pen = {r["seq"]: r["seg_id"] for r in map_match(pt_df, seg_df, 0.01, 0).collect()}
    assert no_pen[4] >= 100   # per-point nearest jumps to street B
    assert with_pen[4] < 100  # HMM keeps the route on street A


def test_map_match_matches_python_replay(spark):
    import random

    from osm_pbf_spark.operators.matching import map_match, map_match_py

    rng = random.Random(11)
    segs = _grid_scene()
    pts = []
    for tid in range(6):
        base = rng.choice([0.0, 0.003])
        for j in range(rng.randint(2, 10)):
            pts.append(
                (tid, j, base + rng.uniform(-0.002, 0.002), rng.uniform(0.0, 0.1))
            )
    seg_df = spark.createDataFrame(
        segs, "seg_id long, alat double, alon double, blat double, blon double"
    )
    pt_df = spark.createDataFrame(pts, "track_id long, seq long, lat double, lon double")
    got = sorted(tuple(r) for r in map_match(pt_df, seg_df, 0.004, 3000).collect())
    assert got == map_match_py(pts, segs, 0.004, 3000)
    # determinism across partitionings
    got2 = sorted(
        tuple(r)
        for r in map_match(pt_df.repartition(7), seg_df, 0.004, 3000).collect()
    )
    assert got2 == got


def test_map_match_gap_bridging(spark):
    from osm_pbf_spark.operators.matching import map_match

    segs = _grid_scene()
    # middle point is far from every segment -> absent from output,
    # DP bridges seq 0 -> 2
    pts = [(1, 0, 0.0001, 0.005), (1, 1, 5.0, 5.0), (1, 2, 0.0001, 0.015)]
    seg_df = spark.createDataFrame(
        segs, "seg_id long, alat double, alon double, blat double, blon double"
    )
    pt_df = spark.createDataFrame(pts, "track_id long, seq long, lat double, lon double")
    rows = map_match(pt_df, seg_df, 0.004, 1000).orderBy("seq").collect()
    assert [r["seq"] for r in rows] == [0, 2]
    assert all(r["seg_id"] < 100 for r in rows)


def test_map_match_validation(spark):
    from osm_pbf_spark.operators.matching import map_match

    df = spark.createDataFrame(
        [(1, 0, 0.0, 0.0)], "track_id long, seq long, lat double, lon double"
    )
    segs = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0, 0.001)],
        "seg_id long, alat double, alon double, blat double, blon double",
    )
    with pytest.raises(ValueError):
        map_match(df, segs, 0.004, -1)


# ---------------- marching-squares contours ----------------


def test_contour_single_cell_diamond(spark):
    from osm_pbf_spark.operators.tiling import contour_segments

    g = spark.createDataFrame([(5, 5, 3)], "x int, y int, n int")
    rows = sorted(tuple(r) for r in contour_segments(g, 1).collect())
    assert rows == [
        (4, 4, 4, 9, 10, 10, 9),
        (4, 5, 2, 9, 10, 10, 11),
        (5, 4, 8, 10, 9, 11, 10),
        (5, 5, 1, 10, 11, 11, 10),
    ]


def test_contour_blob_ring_and_interior_silence(spark):
    from osm_pbf_spark.operators.tiling import contour_segments

    g = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 1), (0, 1, 1), (1, 1, 1)], "x int, y int, n int"
    )
    rows = contour_segments(g, 1).collect()
    assert len(rows) == 8  # ring; the case-15 interior block is silent
    from collections import Counter

    deg = Counter()
    for r in rows:
        deg[(r["x0"], r["y0"])] += 1
        deg[(r["x1"], r["y1"])] += 1
    assert all(v == 2 for v in deg.values())  # closed contour


def test_contour_closed_on_random_grid(spark):
    import random

    from osm_pbf_spark.operators.tiling import contour_segments

    rng = random.Random(3)
    cells = [(x, y, rng.randint(0, 3)) for x in range(12) for y in range(12)]
    g = spark.createDataFrame(cells, "x int, y int, n int")
    rows = contour_segments(g, 2).collect()
    from collections import Counter

    deg = Counter()
    for r in rows:
        deg[(r["x0"], r["y0"])] += 1
        deg[(r["x1"], r["y1"])] += 1
    # marching squares always produces closed curves (saddles resolved
    # consistently): every vertex has even degree
    assert rows and all(v % 2 == 0 for v in deg.values())


def test_contour_saddle_two_segments(spark):
    from osm_pbf_spark.operators.tiling import contour_segments

    # diagonal corners above -> block (0,0) is case 5 -> two segments
    g = spark.createDataFrame([(0, 0, 9), (1, 1, 9)], "x int, y int, n int")
    rows = contour_segments(g, 1).collect()
    by_case = {}
    for r in rows:
        by_case.setdefault(r["ms_case"], []).append(r)
    assert len(by_case[5]) == 2
    assert len(by_case[10]) == 0 if 10 in by_case else True


def test_contour_threshold_pushdown(spark):
    from osm_pbf_spark.operators.tiling import contour_segments

    g = spark.createDataFrame([(0, 0, 1), (5, 5, 9)], "x int, y int, n int")
    rows = contour_segments(g, 5).collect()
    assert {(r["bx"], r["by"]) for r in rows} == {(4, 4), (4, 5), (5, 4), (5, 5)}


# ---------------- adaptive quadtree cells ----------------


def test_adaptive_cells_invariants(spark):
    from osm_pbf_spark.operators.tiling import adaptive_cells

    # dense blob spread over ~2 deg + sparse far-away points
    rows = [(i, 10.0 + (i % 32) * 0.06, 20.0 + (i // 32) * 0.06) for i in range(256)]
    rows += [(1000 + i, -40.0 + i * 7.0, -120.0 + i * 9.0) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    out = adaptive_cells(df, k=10, min_level=2, max_level=12)
    assert out.count() == 264  # every point assigned exactly once
    per_cell = out.groupBy("level", "cx", "cy").count().collect()
    # leaf invariant: every assigned cell holds <= k points unless
    # it is capped at max_level
    assert all(r["count"] <= 10 or r["level"] == 12 for r in per_cell)
    # parent-was-split invariant: a leaf above min_level has an
    # ancestor population > k at the parent level
    parents = {}
    counts = {}
    for r in out.collect():
        counts.setdefault((r["level"], r["cx"], r["cy"]), 0)
        counts[(r["level"], r["cx"], r["cy"])] += 1
    from collections import defaultdict

    finest = defaultdict(int)
    for r in out.collect():
        finest[(r["lat"], r["lon"])] += 0  # noop, keep rows
    # recompute parent populations from raw points
    def quant(v, lo, span, level):
        import math

        n = float(1 << level)
        return min(max(int(math.floor((v + lo) / span * n)), 0), (1 << level) - 1)

    for (level, cx, cy), c in counts.items():
        if level == 2:
            continue
        pl = level - 1
        pop = 0
        for i, lat, lon in rows:
            if (
                quant(lon, 180.0, 360.0, pl) == cx // 2
                and quant(lat, 90.0, 180.0, pl) == cy // 2
            ):
                pop += 1
        assert pop > 10, (level, cx, cy)


def test_adaptive_cells_deterministic_and_validation(spark):
    import pytest as _pytest

    from osm_pbf_spark.operators.tiling import adaptive_cells

    rows = [(i, float(i % 17) * 1.3 - 10, float(i % 23) * 2.1 - 20) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lat double, lon double")
    a = adaptive_cells(df, 5, 2, 9).select("doc_id", "level", "cx", "cy")
    b = adaptive_cells(df.repartition(7), 5, 2, 9).select("doc_id", "level", "cx", "cy")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with _pytest.raises(ValueError):
        adaptive_cells(df, 0, 2, 9)
    with _pytest.raises(ValueError):
        adaptive_cells(df, 5, 9, 2)


# ---------------- cross-corpus LSH join ----------------


def test_minhash_join_agrees_with_self_join_cross_pairs(spark):
    from osm_pbf_spark.operators.dedup import minhash_lsh_join, minhash_lsh_pairs

    base = [
        (i, f"the quick brown fox jumps over the lazy dog variant {i % 7} "
            f"with some shared boilerplate text that repeats everywhere")
        for i in range(40)
    ]
    corpus = spark.createDataFrame(base, "doc_id long, text string")
    new = spark.createDataFrame(
        [(i + 1000, t) for i, t in base[20:]] + [(2000, "completely different content")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["new_id"], r["corpus_id"], r["jaccard"])
        for r in minhash_lsh_join(new, corpus, 0.5, max_bucket=None).collect()
    )
    # reference: the self-join over the union, restricted to cross pairs
    union = corpus.unionByName(new)
    ref = sorted(
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), r["jaccard"])
        for r in minhash_lsh_pairs(union, 0.5, max_bucket=None).collect()
        if (r["id_a"] >= 1000) != (r["id_b"] >= 1000)
    )
    assert got == ref
    assert any(j == 1.0 for _, _, j in got)  # exact cross-dups found
    assert all(nid != 2000 for nid, _, _ in got)  # unrelated doc absent


def test_minhash_join_expands_exact_copies(spark):
    from osm_pbf_spark.operators.dedup import minhash_lsh_join

    text = "a perfectly ordinary document about map tiles and spark shuffles"
    corpus = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, text), (11, text)], "doc_id long, text string"
    )
    rows = sorted(
        (r["new_id"], r["corpus_id"]) for r in minhash_lsh_join(new, corpus).collect()
    )
    assert rows == [(10, 1), (10, 2), (11, 1), (11, 2)]


# ---------------- stay points ----------------


def test_stay_points_home_excursion_home(spark):
    from osm_pbf_spark.operators.matching import stay_points

    rows = []
    ts = 0
    # dwell at home (5 points, 40 min), excursion (3 spread points),
    # dwell at work (4 points, 30 min)
    for i in range(5):
        rows.append((1, i, ts, 40.0 + i * 1e-6, -74.0))
        ts += 10 * 60_000_000
    for i in range(3):
        rows.append((1, 5 + i, ts, 40.1 + i * 0.05, -74.2 - i * 0.05))
        ts += 10 * 60_000_000
    for i in range(4):
        rows.append((1, 8 + i, ts, 40.5, -74.5 + i * 1e-6))
        ts += 10 * 60_000_000
    df = spark.createDataFrame(
        rows, "track_id long, seq long, ts_us long, lat double, lon double"
    )
    out = stay_points(df, 0.001, 20 * 60_000_000, track_col="track_id").orderBy(
        "start_seq"
    ).collect()
    assert [(r["start_seq"], r["end_seq"], r["n_pts"]) for r in out] == [
        (0, 4, 5),
        (8, 11, 4),
    ]


def test_stay_points_matches_python_replay(spark):
    import random

    from osm_pbf_spark.operators.matching import stay_points, stay_points_py

    rng = random.Random(23)
    pts = []
    for tid in range(8):
        ts = 0
        lat, lon = rng.uniform(-50, 50), rng.uniform(-100, 100)
        for seq in range(rng.randint(3, 25)):
            if rng.random() < 0.3:  # jump
                lat += rng.uniform(-0.05, 0.05)
                lon += rng.uniform(-0.05, 0.05)
            else:  # jitter in place
                lat += rng.uniform(-2e-6, 2e-6)
                lon += rng.uniform(-2e-6, 2e-6)
            ts += rng.randint(1, 30) * 60_000_000
            pts.append((tid, seq, ts, lat, lon))
    df = spark.createDataFrame(
        pts, "track_id long, seq long, ts_us long, lat double, lon double"
    )
    got = sorted(tuple(r) for r in stay_points(df, 0.0005, 30 * 60_000_000).collect())
    assert got == stay_points_py(pts, 0.0005, 30 * 60_000_000)
    got2 = sorted(
        tuple(r)
        for r in stay_points(df.repartition(5), 0.0005, 30 * 60_000_000).collect()
    )
    assert got2 == got


def test_stay_points_duration_gate_and_validation(spark):
    from osm_pbf_spark.operators.matching import stay_points

    # two co-located points but only 5 minutes apart -> no stay point
    df = spark.createDataFrame(
        [(1, 0, 0, 10.0, 10.0), (1, 1, 5 * 60_000_000, 10.0, 10.0)],
        "track_id long, seq long, ts_us long, lat double, lon double",
    )
    assert stay_points(df, 0.001, 20 * 60_000_000).count() == 0
    with pytest.raises(ValueError):
        stay_points(df, 0.001, -1)


# ---------------- PCA reduce ----------------


def test_pca_train_deterministic_and_orthogonal(spark, sf_dir):
    import numpy as np

    from osm_pbf_spark.operators.ann import pca_train

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p1 = pca_train(e, dim=64, out_dim=6)
    p2 = pca_train(e.repartition(9), dim=64, out_dim=6)
    assert (p1 == p2).all()
    # quantized eigvecs stay near-orthonormal at the 2^20 scale
    f = p1.astype(np.float64) / float(1 << 20)
    gram = f @ f.T
    assert np.allclose(gram, np.eye(6), atol=1e-3)


def test_pca_variance_concentrates_and_encode_replays(spark, sf_dir):
    import math

    import numpy as np

    from osm_pbf_spark.operators.ann import pca_encode, pca_train

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    proj = pca_train(e, dim=64, out_dim=5)
    enc = pca_encode(e, proj).orderBy("vec_id")
    rows = enc.collect()
    mat = np.array([r["pvec"] for r in rows], dtype=np.float64)
    var = mat.var(axis=0)
    assert var[0] >= var[-1]
    # pure-Python replay of one row
    first = e.orderBy("vec_id").first()
    q = [math.floor(float(x) * 256.0 + 0.5) for x in first["embedding"]]
    want = [sum(q[d] * int(proj[j, d]) for d in range(64)) for j in range(5)]
    assert list(rows[0]["pvec"]) == want


def test_pca_validation(spark):
    from osm_pbf_spark.operators.ann import pca_train

    one = spark.createDataFrame(
        [(1, [0.0] * 4)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pca_train(one, dim=4, out_dim=5)
    with pytest.raises(ValueError):
        pca_train(one, dim=4, out_dim=2)  # n < 2


# ---------------- raster morphology ----------------


def test_dilate_erode_basic_shapes(spark):
    from osm_pbf_spark.operators.tiling import grid_dilate, grid_erode

    # a single cell dilated by 1 -> the 5-cell von Neumann cross
    g = spark.createDataFrame([(0, 0)], "x int, y int")
    d = sorted((r["x"], r["y"]) for r in grid_dilate(g, 1).collect())
    assert d == [(-1, 0), (0, -1), (0, 0), (0, 1), (1, 0)]
    # eroding the cross by 1 recovers exactly the center
    cross = spark.createDataFrame(d, "x int, y int")
    e = [(r["x"], r["y"]) for r in grid_erode(cross, 1).collect()]
    assert e == [(0, 0)]


def test_closing_fills_small_holes(spark):
    from osm_pbf_spark.operators.tiling import grid_dilate, grid_erode

    # a 5x5 block with its center missing: closing by 1 restores it
    cells = [(x, y) for x in range(5) for y in range(5) if (x, y) != (2, 2)]
    g = spark.createDataFrame(cells, "x int, y int")
    closed = {(r["x"], r["y"]) for r in grid_erode(grid_dilate(g, 1), 1).collect()}
    assert (2, 2) in closed
    assert set(cells) <= closed


def test_erosion_antiextensive_dilation_extensive(spark):
    import random

    from osm_pbf_spark.operators.tiling import grid_dilate, grid_erode

    rng = random.Random(5)
    cells = list({(rng.randint(0, 15), rng.randint(0, 15)) for _ in range(80)})
    g = spark.createDataFrame(cells, "x int, y int")
    orig = set(cells)
    dil = {(r["x"], r["y"]) for r in grid_dilate(g, 2).collect()}
    ero = {(r["x"], r["y"]) for r in grid_erode(g, 2).collect()}
    assert orig <= dil
    assert ero <= orig
    with pytest.raises(ValueError):
        grid_dilate(g, -1)


# ---------------- OD matrix (labeled sssp) ----------------


def test_sssp_matrix_per_origin_vs_scalar_dijkstra(spark):
    import heapq
    import random

    from osm_pbf_spark.operators.graph import sssp_matrix

    rng = random.Random(17)
    edges = [
        (rng.randint(0, 29), rng.randint(0, 29), rng.randint(1, 9))
        for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    srcs = spark.createDataFrame([(0,), (5,)], "node long")
    got = sorted(
        (r["origin"], r["node"], r["dist"])
        for r in sssp_matrix(df, srcs, max_rounds=30).collect()
    )

    adj = {}
    for a, b, w in edges:
        if a != b:
            adj.setdefault(a, {})[b] = min(adj.get(a, {}).get(b, w), w)
            adj.setdefault(b, {})[a] = min(adj.get(b, {}).get(a, w), w)
    want = []
    for origin in (0, 5):
        dist = {origin: 0}
        pq = [(0, origin)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, 1 << 60):
                continue
            for v, w in adj.get(u, {}).items():
                if d + w < dist.get(v, 1 << 60):
                    dist[v] = d + w
                    heapq.heappush(pq, (d + w, v))
        want += [(origin, n, d) for n, d in dist.items()]
    assert got == sorted(want)  # 30 rounds >= diameter here -> exact


def test_sssp_matrix_origins_independent(spark):
    from osm_pbf_spark.operators.graph import sssp, sssp_matrix

    edges = spark.createDataFrame(
        [(0, 1, 2), (1, 2, 2), (2, 3, 2), (3, 4, 2)], "src long, dst long, w long"
    )
    srcs = spark.createDataFrame([(0,), (4,)], "node long")
    mat = {
        (r["origin"], r["node"]): r["dist"]
        for r in sssp_matrix(edges, srcs, max_rounds=8).collect()
    }
    # each origin's column equals its own single-source run
    for origin in (0, 4):
        one = spark.createDataFrame([(origin,)], "node long")
        solo = {
            r["node"]: r["dist"] for r in sssp(edges, one, max_rounds=8).collect()
        }
        assert {n: d for (o, n), d in mat.items() if o == origin} == solo


def test_hll_ignores_nulls(spark):
    from osm_pbf_spark.operators.sketch import hll_estimate, hll_sketch

    df = spark.createDataFrame(
        [(str(i),) for i in range(100)] + [(None,)] * 50, "v string"
    )
    sk = hll_sketch(df, "v", p=8)
    assert sk.where(F.col("hll_bucket").isNull()).count() == 0
    est = hll_estimate(sk, p=8).first()
    assert abs(est.est - 100) < 10  # linear-counting regime, near-exact


# ---------------- span validation ----------------


def _mk_docs(spark, spans_rows):
    return spark.createDataFrame(
        spans_rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )


def test_validate_spans_accepts_valid_and_flags_corrupt(spark):
    from osm_pbf_spark.operators.docrender import validate_spans

    good = [
        ("d1", [("text", "node 1", "", 0), ("geom", "", "geom:p", 7)]),
        ("d2", [("text", "ab", "", 0), ("tag-key", "k", "", 3),
                ("media", "", "m:1", 5), ("text", "x", "", 5)]),
    ]
    bad_offset = [("d3", [("text", "ab", "", 0), ("text", "cd", "", 4)])]  # want 3
    bad_width = [("d4", [("text", "ab", "m:2", 0)])]  # text AND media_ref
    out = {
        r["doc_id"]: (r["offsets_ok"], r["width_ok"], r["n_text"], r["text_chars"])
        for r in validate_spans(
            _mk_docs(spark, good + bad_offset + bad_width)
        ).collect()
    }
    assert out["d1"] == (True, True, 1, 6)
    assert out["d2"] == (True, True, 3, 4)
    assert out["d3"][0] is False
    assert out["d4"][1] is True or out["d4"][1] is False  # defined either way
    assert out["d4"][1] is False


def test_validate_spans_is_pure_codegen(spark):
    from osm_pbf_spark.operators.docrender import validate_spans

    df = _mk_docs(spark, [("d", [("text", "a", "", 0)])])
    plan = validate_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "InPandas" not in plan and "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan  # map-only scan


# ---------------- token-budget sampling ----------------


def test_token_budget_prefix_property(spark, sf_dir):
    from osm_pbf_spark.operators.packing import token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_budget_sample(docs, 3000).collect()
    total = sum(r["doc_tokens"] for r in out)
    assert total >= 3000  # boundary doc included
    assert max(r["cum_before"] for r in out) < 3000
    # exactly the hash-order prefix: kept cum_before values tile
    # [0, total) with no gaps
    ordered = sorted(out, key=lambda r: r["cum_before"])
    acc = 0
    for r in ordered:
        assert r["cum_before"] == acc
        acc += r["doc_tokens"]
    # stable under appends: adding docs only perturbs at their hash
    # positions -> old members with cum_before below every new hash
    # stay members (weak but cheap invariant: determinism + budget 0)
    assert token_budget_sample(docs, 0).count() == 0


def test_token_budget_grouped_fills_each_group(spark, sf_dir):
    from pyspark.sql import functions as _F

    from osm_pbf_spark.operators.packing import token_budget_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = token_budget_sample(docs, 800, group_col="lang")
    agg = {
        r["lang"]: (r["tot"], r["mx"])
        for r in out.groupBy("lang")
        .agg(
            _F.sum("doc_tokens").alias("tot"), _F.max("cum_before").alias("mx")
        )
        .collect()
    }
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(agg) == langs
    for tot, mx in agg.values():
        assert mx < 800
    with pytest.raises(ValueError):
        token_budget_sample(docs, -1)


def test_hll_grouped_matches_per_group_global(spark):
    from osm_pbf_spark.operators.sketch import hll_estimate, hll_sketch

    df = spark.createDataFrame(
        [(i % 3, str(i % 500)) for i in range(3000)], "g int, v string"
    )
    grouped = hll_estimate(
        hll_sketch(df, "v", p=8, group_cols=["g"]), p=8, group_cols=["g"]
    )
    got = {r["g"]: (r["hll_observed"], r["s_scaled"]) for r in grouped.collect()}
    for g in (0, 1, 2):
        solo = hll_estimate(
            hll_sketch(df.where(F.col("g") == g), "v", p=8), p=8
        ).first()
        assert got[g] == (solo["hll_observed"], solo["s_scaled"])


# ---------------- linear interpolation gap fill ----------------


def test_fill_interpolate_values_and_edges(spark):
    from osm_pbf_spark.operators.temporal import fill_interpolate

    rows = [
        (1, 0, None), (1, 1, 10), (1, 2, None), (1, 3, None), (1, 4, 40),
        (1, 5, None),
        (2, 0, 7),
    ]
    df = spark.createDataFrame(rows, "k int, t int, v long")
    out = {
        (r["k"], r["t"]): r["vi"]
        for r in fill_interpolate(df, "k", "t", "v", out_col="vi").collect()
    }
    assert out[(1, 0)] is None          # before first obs
    assert out[(1, 1)] == 10.0
    assert out[(1, 2)] == 20.0          # 10 + 30 * 1/3
    assert out[(1, 3)] == 30.0
    assert out[(1, 4)] == 40.0
    assert out[(1, 5)] is None          # after last obs
    assert out[(2, 0)] == 7.0


# ---------------- multi-file PBF scan ----------------


def test_read_pbf_multi_equals_union(spark, fixtures_dir):
    import os

    from pyspark.sql import functions as _F

    from osm_pbf_spark.sources import pbf_source as src

    p1 = os.path.join(fixtures_dir, "mixed.osm.pbf")
    p2 = os.path.join(fixtures_dir, "granularity.osm.pbf")

    def sig(df):
        return sorted(
            tuple(r)
            for r in df.groupBy("kind")
            .agg(_F.count("*").alias("n"), _F.sum("id").alias("s"))
            .collect()
        )

    both, hdr = src.read_pbf(spark, [p1, p2])
    a, h1 = src.read_pbf(spark, p1)
    b, h2 = src.read_pbf(spark, p2)
    assert sig(both) == sig(a.unionByName(b))
    # merged header: feature union, first-seen order
    for feat in h1["required_features"] + h2["required_features"]:
        assert feat in hdr["required_features"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        src.read_pbf(spark, [])
