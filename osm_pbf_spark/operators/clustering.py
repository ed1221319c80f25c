"""Density-based clustering (grid DBSCAN) — SURVEY.md §2.4b
P-family extension, r3.

``dbscan`` implements the classic DBSCAN semantics (Ester et al. 1996,
with the deterministic tie-breaks below) as a distributed grid join —
the standard MR-DBSCAN shape, no r-tree, no driver-side region query:

1.  Bucket every point into an eps-sized grid cell. Any two points
    within ``eps`` of each other are in the same or an adjacent cell,
    so the eps-neighborhood join becomes an EQUI-join: replicate each
    point to its 3x3 cell window on the probe side only (one native
    Generate, 9x one side — not 9x the shuffle), join on cell id,
    refine with the exact squared distance. Each candidate pair is
    produced exactly once because the build side keeps its unique
    home cell.
2.  Core points: |N_eps(p)| >= min_pts, counting p itself (the
    sklearn convention). One partial-aggregatable count.
3.  Cluster ids: connected components over the CORE-CORE eps graph
    (operators/graph.connected_components — large-star/small-star,
    O(log n) rounds). The cluster id is the MINIMUM core id in the
    component, so labels are deterministic and engine-independent.
4.  Border points (non-core within eps of >=1 core) join the
    MINIMUM cluster id among their core neighbors — classic DBSCAN
    leaves border assignment scan-order-dependent; taking min makes
    it a function of the input set. Everything else is noise
    (cluster = -1).

Scale posture: the only data-sized shuffles are the grid equi-join
(9x replication of one side; the half-window trick would cut it to
5x at the cost of a union — documented, not taken) and the degree
aggregate; the CC rounds run on the core subgraph only. Skewed cells
(a dense city) fan out through the same salted-join guidance as
spatial_join; at eps chosen so a cell holds ~O(10^3) points the
per-cell pair work is bounded.

Oracle strategy: DBSCAN with min-tie-breaks is SQL-expressible on
small inputs — the gate runs an independent DuckDB all-pairs +
recursive-CTE closure implementation (q_dbscan), not a replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dbscan", "cluster_hulls", "cluster_pair_metrics"]

_BIAS = 1 << 24  # grid coords valid in (-2^24, 2^24) — |x|/eps bound
_SHIFT = 26


def _cell(cx: F.Column, cy: F.Column) -> F.Column:
    """Pack two biased grid coordinates into one bigint key."""
    return ((cx + F.lit(_BIAS)).cast("bigint") * F.lit(1 << _SHIFT)) + (
        cy + F.lit(_BIAS)
    ).cast("bigint")


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    cc_rounds: int | None = None,
) -> DataFrame:
    """DBSCAN over 2-D points. Returns ``(id, cluster:bigint,
    is_core:boolean)`` for EVERY input point; noise has cluster -1.

    ``cc_rounds`` forwards to ``connected_components`` (pass k when
    the core-graph diameter is known to be < 2^k to skip fixpoint
    actions entirely).
    """
    if eps <= 0:
        raise ValueError(f"eps must be positive, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    from osm_pbf_spark.operators.graph import connected_components

    pts = points.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
        F.floor(F.col(x_col) / F.lit(float(eps))).alias("_cx"),
        F.floor(F.col(y_col) / F.lit(float(eps))).alias("_cy"),
    )
    # Build side: each point at its unique home cell.
    build = pts.select(
        _cell(F.col("_cx"), F.col("_cy")).alias("cell"),
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
    )
    # Probe side: each point replicated to its 3x3 window (native
    # Generate — stays in whole-stage codegen).
    offs = F.array(*[F.lit(i) for i in range(9)])
    probe = pts.select(
        "id",
        "x",
        "y",
        F.explode(
            F.transform(
                offs,
                lambda i: _cell(
                    F.col("_cx") + (i % 3) - 1, F.col("_cy") + (i / 3).cast("int") - 1
                ),
            )
        ).alias("cell"),
    )
    # explicit multiply (not **2 = Math.pow): IEEE multiplication is
    # exactly rounded, so the DuckDB oracle computes identical bits
    dx = F.col("x") - F.col("xb")
    dy = F.col("y") - F.col("yb")
    d2 = dx * dx + dy * dy
    nbr = (
        probe.join(build, "cell")
        .where(d2 <= F.lit(float(eps) * float(eps)))
        .select(F.col("id").alias("u"), F.col("id_b").alias("v"))
    )  # includes the self pair (u == v) via the home cell
    deg = nbr.groupBy("u").agg(F.count(F.lit(1)).alias("_n"))
    cores = deg.where(F.col("_n") >= min_pts).select(F.col("u").alias("id"))

    core_edges = (
        nbr.where(F.col("u") < F.col("v"))
        .join(cores.select(F.col("id").alias("u")), "u")
        .join(cores.select(F.col("id").alias("v")), "v")
        .select("u", "v")
    )
    comp = connected_components(core_edges, src="u", dst="v", rounds=cc_rounds)
    # Isolated cores (no core neighbor) are their own singleton cluster.
    core_cluster = (
        cores.join(comp, cores.id == comp.node, "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("cluster"))
    )
    # Border points: non-core with >=1 core neighbor -> min core cluster.
    border = (
        nbr.where(F.col("u") != F.col("v"))
        .join(cores.withColumnRenamed("id", "u"), "u", "left_anti")
        .join(core_cluster.withColumnRenamed("id", "v"), "v")
        .groupBy("u")
        .agg(F.min("cluster").alias("cluster"))
        .select(F.col("u").alias("id"), "cluster")
    )
    labeled = core_cluster.withColumn("is_core", F.lit(True)).unionByName(
        border.withColumn("is_core", F.lit(False))
    )
    return (
        pts.select("id")
        .join(labeled, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("cluster"), F.lit(-1).cast("bigint")).alias("cluster"),
            F.coalesce(F.col("is_core"), F.lit(False)).alias("is_core"),
        )
    )


def cluster_hulls(
    points: DataFrame,
    eps: float,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    scale: float = 1000.0,
    cc_rounds: int | None = None,
) -> DataFrame:
    """DBSCAN clusters rendered as CCW convex-hull polygons — the
    map-layer composition (cluster the points, draw each cluster's
    footprint) every density-analysis dashboard ships: dbscan ->
    drop noise -> per-cluster convex hull on the integer grid.

    Pure composition of two gate-verified operators (dbscan's exact-d2
    grid join; convex_hull's integer monotone chain) — semantics and
    determinism are inherited, and the composed pipeline is itself
    oracle-gated (q_cluster_hulls verifies BOTH stages independently:
    a brute-force Python DBSCAN replay + the Jarvis-march hull
    oracle).

    Returns ``(cluster, hull_pos, ix, iy)`` — CCW vertices per
    non-noise cluster, ``ix = floor(x*scale + 0.5)`` etc.

    Plan: the dbscan subplan (3x3 grid join + CC rounds) feeds one
    keyed join back onto the points and convex_hull's per-group
    applyInPandas; the labels join is the only added shuffle.
    """
    lab = dbscan(
        points, eps, min_pts, id_col=id_col, x_col=x_col, y_col=y_col,
        cc_rounds=cc_rounds,
    ).where(F.col("cluster") >= 0)
    from .hull import convex_hull

    pts = points.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(x_col).alias("_x"),
        F.col(y_col).alias("_y"),
    )
    j = pts.join(lab.select("id", "cluster"), "id")
    return convex_hull(
        j.select(F.col("cluster").alias("group_id"), "_x", "_y"),
        group_col="group_id",
        lat_col="_y",
        lon_col="_x",
        scale=scale,
    ).select(
        F.col("group_id").alias("cluster"), "hull_pos", "ix", "iy"
    )


def cluster_pair_metrics(
    df: DataFrame, pred_col: str, true_col: str
) -> DataFrame:
    """Pairwise clustering quality vs ground truth — the evaluation
    for ANY grouping operator (near_dup_groups, dbscan, label
    propagation, entity resolution): over all C(n,2) record pairs,

        precision = both / pred_pairs,  recall = both / true_pairs
        ARI = (both − E) / ((pred_pairs + true_pairs)/2 − E),
        E = pred_pairs · true_pairs / C(n, 2)

    where both/pred_pairs/true_pairs are Σ C(size, 2) over the
    contingency cells / predicted clusters / true classes — all EXACT
    int64 (C(x,2) = x·(x−1) DIV 2; bound: cluster sizes under ~4×10⁹).
    P/R/F1 are one division each; ARI is one fixed double chain on
    the exact counts (the moments_profile discipline — clearing ARI's
    denominators overflows int64).

    Plan: one (pred, true) cell aggregate + two margin aggregates —
    all map-side combinable; nothing scales beyond |clusters|.
    Returns one row (n, n_pred_clusters, n_true_classes, both_pairs,
    pred_pairs, true_pairs, precision, recall, f1, ari).
    """

    def c2(col):
        return F.expr(f"({col} * ({col} - 1)) DIV 2")

    cells = df.groupBy(
        F.col(pred_col).alias("_p"), F.col(true_col).alias("_t")
    ).agg(F.count(F.lit(1)).alias("_nij"))
    both = cells.agg(
        F.sum(c2("_nij")).alias("both_pairs"),
        F.sum("_nij").alias("n"),
        F.count_distinct(F.col("_p")).alias("n_pred_clusters"),
        F.count_distinct(F.col("_t")).alias("n_true_classes"),
    )
    pp = (
        cells.groupBy("_p")
        .agg(F.sum("_nij").alias("_ng"))
        .agg(F.sum(c2("_ng")).alias("pred_pairs"))
    )
    tp = (
        cells.groupBy("_t")
        .agg(F.sum("_nij").alias("_ne"))
        .agg(F.sum(c2("_ne")).alias("true_pairs"))
    )
    j = both.crossJoin(F.broadcast(pp)).crossJoin(F.broadcast(tp))
    bd = F.col("both_pairs").cast("double")
    pd_ = F.col("pred_pairs").cast("double")
    td = F.col("true_pairs").cast("double")
    cn = F.expr("(n * (n - 1)) DIV 2").cast("double")
    # n <= 1: C(n,2)=0 — the 0/0 division must not run at all (ANSI
    # raises DIVIDE_BY_ZERO; a bare NaN would leak through != 0.0
    # since Spark evaluates NaN != 0.0 as TRUE). The cn > 0 branch
    # makes expect/ari_den NULL there, and NULL-guarded ARI follows
    # the NULL-on-degenerate convention used everywhere else.
    expect = F.when(cn > 0, pd_ * td / cn)
    ari_den = (pd_ + td) / F.lit(2.0) - expect
    return j.select(
        "n",
        "n_pred_clusters",
        "n_true_classes",
        "both_pairs",
        "pred_pairs",
        "true_pairs",
        F.when(F.col("pred_pairs") > 0, bd / pd_).alias("precision"),
        F.when(F.col("true_pairs") > 0, bd / td).alias("recall"),
        F.when(
            F.col("pred_pairs") + F.col("true_pairs") > 0,
            (F.lit(2.0) * bd) / (pd_ + td),
        ).alias("f1"),
        F.when(
            ari_den.isNotNull() & (ari_den != 0.0),
            (bd - expect) / ari_den,
        ).alias("ari"),
    )
