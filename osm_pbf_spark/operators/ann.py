"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``      exact brute-force top-k per query, native exprs
                       (zip_with product + aggregate fold in codegen) —
                       the correctness baseline and DuckDB-oracle path.
- ``cosine_topk_lsh``  the scale path: random-hyperplane LSH buckets
                       (deterministic hash-derived hyperplanes, no RNG
                       state) -> candidates only within matching
                       buckets (+ multiprobe) -> exact rerank. Recall
                       <1.0 by design; tested against brute force.
- ``near_dup_cosine``  all pairs with cosine >= threshold (exact).

Dot products accumulate in float64 left-to-right — the same fold order
DuckDB's list comprehension uses, so results are bit-identical across
engines (verified empirically; float32 shortcuts like
duckdb list_dot_product are NOT used).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_f64(a: Column, b: Column) -> Column:
    """Sum_i (double)a_i * (double)b_i, sequential fold (exact order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2_f64(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, rank, cos).

    Brute force = crossJoin; Spark broadcasts the smaller (query) side
    so the candidate scan is shuffle-free. Tie-break (cos desc,
    neighbor_id asc).
    """
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = candidates.select(F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    pairs = c.crossJoin(F.broadcast(q))
    if exclude_self:
        pairs = pairs.filter(F.col("query_id") != F.col("neighbor_id"))
    cos = dot_f64(F.col("_qv"), F.col("_cv")) / F.sqrt(
        norm2_f64(F.col("_qv")) * norm2_f64(F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: unit normals derived
    from blake2b of (plane, coord) — stable across runs/machines."""
    raw = np.empty((n_planes, dim), dtype=np.float64)
    per_block = 8  # blake2b digest caps at 64 bytes = 8 uint64s
    n_blocks = (dim + per_block - 1) // per_block
    for p in range(n_planes):
        words = []
        for blk in range(n_blocks):
            h = hashlib.blake2b(
                p.to_bytes(4, "little") + blk.to_bytes(4, "little"), digest_size=64
            ).digest()
            words.append(np.frombuffer(h, dtype=np.uint64))
        u = np.concatenate(words)[:dim].astype(np.float64) / 2**64
        raw[p] = u * 2.0 - 1.0
    return raw


def lsh_bucket_udf(dim: int, n_planes: int = 12):
    planes = _hyperplanes(dim, n_planes)

    @F.pandas_udf(T.LongType())
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        return pd.Series((signs * weights).sum(axis=1).astype(np.int64))

    return _bucket


def cosine_topk_lsh(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    dim: int,
    n_planes: int = 10,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: hyperplane-LSH bucket equi-join ->
    exact rerank within buckets. At 10^12 scale this replaces the
    crossJoin with a shuffle on bucket id (multiprobe: each query also
    probes all 1-bit-flip neighbor buckets to recover boundary loss)."""
    bucket = lsh_bucket_udf(dim, n_planes)
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("bucket", bucket(F.col("_cv")))
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")).withColumn(
        "_b0", bucket(F.col("_qv"))
    )
    # multiprobe: own bucket + every 1-bit flip
    probes = F.array(*([F.col("_b0")] + [
        F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
    ]))
    qp = q.withColumn("bucket", F.explode(probes)).drop("_b0")
    pairs = qp.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = dot_f64(F.col("_qv"), F.col("_cv")) / F.sqrt(
        norm2_f64(F.col("_qv")) * norm2_f64(F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cos", cos)
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _kmeans_centroids(sample: np.ndarray, n_clusters: int, n_iters: int = 10) -> np.ndarray:
    """Deterministic spherical k-means for IVF coarse quantization.

    ``sample``: (n, d) float64, caller-provided in a DETERMINISTIC row
    order (id-sorted). Init = n_clusters evenly spaced rows of the
    sample (no RNG); fixed Lloyd iteration count; assignment by max
    dot against L2-normalized centroids (argmax -> first index on
    ties); empty clusters keep their previous centroid. All float64,
    fixed operation order -> bit-stable across runs and machines,
    which is what lets the DuckDB-side oracle replay the exact
    partition assignment."""
    n = len(sample)
    if n == 0:
        raise ValueError("empty sample for IVF training")
    k = min(n_clusters, n)
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    m = sample / np.where(norms == 0.0, 1.0, norms)
    cent = m[(np.arange(k, dtype=np.int64) * n) // k].copy()
    for _ in range(n_iters):
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                s = members.sum(axis=0)
                ln = np.linalg.norm(s)
                if ln > 0.0:
                    cent[c] = s / ln
    return cent


def ivf_probe_udf(centroids: np.ndarray, nprobe: int):
    """array<float> -> array<long> of the ``nprobe`` nearest coarse
    centroids (by cosine; stable sort so ties are deterministic)."""
    cent = centroids
    npb = min(nprobe, len(cent))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _probe(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        m = m / np.where(norms == 0.0, 1.0, norms)
        order = np.argsort(-(m @ cent.T), axis=1, kind="stable")[:, :npb]
        return pd.Series(list(order.astype(np.int64)))

    return _probe


def cosine_topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    n_clusters: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) coarse
    quantization — the k-means sibling of ``cosine_topk_lsh``.

    Train: spherical k-means on an id-sorted, size-capped sample
    collected to the driver (IVF training is sample-based BY DESIGN —
    at 10^12 rows you still train the coarse quantizer on a bounded
    sample; only the tiny (n_clusters x d) centroid matrix ships to
    executors). Assign: every candidate to its nearest centroid's
    inverted list (one vectorized pandas UDF — linear, no shuffle).
    Search: each query probes its ``nprobe`` nearest lists -> bucket
    equi-join (shuffle on list id, same slim shape as the LSH variant)
    -> exact float64 rerank. Recall < 1 by design (a true neighbor in
    an unprobed list is missed); precision of returned cosines exact.
    """
    samp = (
        candidates.select(F.col(cand_id).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_sample)
        .collect()
    )
    cent = _kmeans_centroids(
        np.asarray([r["_v"] for r in samp], dtype=np.float64), n_clusters
    )
    probe1 = ivf_probe_udf(cent, 1)
    proben = ivf_probe_udf(cent, nprobe)
    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    ).withColumn("bucket", F.element_at(probe1(F.col("_cv")), 1))
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("_qv")
    ).withColumn("bucket", F.explode(proben(F.col("_qv"))))
    pairs = q.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id"))
    cos = dot_f64(F.col("_qv"), F.col("_cv")) / F.sqrt(
        norm2_f64(F.col("_qv")) * norm2_f64(F.col("_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def near_dup_cosine_lsh(
    vectors: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    n_planes: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs via hyperplane-LSH buckets — the SCALE path
    (``near_dup_cosine`` below is the exact all-pairs verifier; its
    theta-join is O(n^2) by design and must not be the default at
    10^12 rows).

    Candidates: pairs sharing a bucket under own-bucket + all 1-bit
    flips multiprobe (shuffle on bucket id, linear in rows); verify:
    exact float64 cosine >= threshold. PRECISION is exact (every
    emitted pair's cosine is the true one); RECALL is < 1 by design —
    a pair is missed iff its signs differ in >= 2 hyperplanes, with
    probability (theta/pi)^2 per plane pair, vanishing as cos -> 1.
    """
    bucket = lsh_bucket_udf(dim, n_planes)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v")).withColumn(
        "_b0", bucket(F.col("_v"))
    )
    probes = F.array(*([F.col("_b0")] + [
        F.col("_b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)
    ]))
    probed = v.withColumn("bucket", F.explode(probes)).select("id", "_v", "bucket")
    exact = v.select("id", "_v", F.col("_b0").alias("bucket"))
    pairs = (
        probed.alias("a")
        .join(exact.alias("b").hint("shuffle_hash"),
              (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a._v").alias("_va"), F.col("b._v").alias("_vb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = dot_f64(F.col("_va"), F.col("_vb")) / F.sqrt(
        norm2_f64(F.col("_va")) * norm2_f64(F.col("_vb"))
    )
    return pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold).select(
        "id_a", "id_b", "cos"
    )


def near_dup_cosine(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs (a < b) with cosine >= threshold — the
    CORRECTNESS BASELINE / verifier for near_dup_cosine_lsh, which is
    the path to use at scale (this one is O(n^2) by construction)."""
    a = vectors.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = vectors.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = dot_f64(F.col("_va"), F.col("_vb")) / F.sqrt(
        norm2_f64(F.col("_va")) * norm2_f64(F.col("_vb"))
    )
    return pairs.withColumn("cos", cos).filter(F.col("cos") >= threshold).select(
        "id_a", "id_b", "cos"
    )


def kmeans_assign(
    vectors: DataFrame,
    n_clusters: int = 16,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding clustering: assign every vector to its nearest
    spherical-k-means centroid (the IVF coarse quantizer exposed as a
    first-class op — corpus bucketing / topic sharding in training
    pipelines).

    Train on a bounded id-sorted sample (deterministic, driver-side —
    the same sample-based design as cosine_topk_ivf; only the tiny
    (k x d) centroid matrix ships to executors), then one vectorized
    pandas UDF assigns: linear, shuffle-free, scales as a map stage.
    Returns (id_col, cluster long, cos double) where cos is the exact
    float64 cosine to the assigned centroid.
    """
    samp = (
        vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_sample)
        .collect()
    )
    cent = _kmeans_centroids(
        np.asarray([r["_v"] for r in samp], dtype=np.float64), n_clusters
    )

    @F.pandas_udf("cluster long, cos double")
    def _assign(vecs: pd.Series) -> pd.DataFrame:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        mn = m / np.where(norms == 0.0, 1.0, norms)
        sims = mn @ cent.T
        best = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {"cluster": best.astype(np.int64),
             "cos": sims[np.arange(len(best)), best]}
        )

    return vectors.withColumn("_a", _assign(F.col(vec_col))).select(
        F.col(id_col),
        F.col("_a.cluster").alias("cluster"),
        F.col("_a.cos").alias("cos"),
    )


def _rp_signs(dim: int, out_dim: int) -> np.ndarray:
    """Deterministic ±1 sign matrix (out_dim x dim) from blake2b bits —
    the sparse/sign random-projection family (Achlioptas 2003), chosen
    over Gaussian entries so the projection is EXACT integer math."""
    signs = np.empty((out_dim, dim), dtype=np.int64)
    blocks = (dim + 511) // 512
    for j in range(out_dim):
        bits = []
        for blk in range(blocks):
            h = hashlib.blake2b(
                b"rp" + j.to_bytes(4, "little") + blk.to_bytes(4, "little"),
                digest_size=64,
            ).digest()
            bits.append(np.unpackbits(np.frombuffer(h, dtype=np.uint8)))
        signs[j] = np.concatenate(bits)[:dim].astype(np.int64) * 2 - 1
    return signs


def rp_reduce(
    vectors: DataFrame,
    dim: int,
    out_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 256,
) -> DataFrame:
    """Random-projection dimensionality reduction + integer quantization
    for embedding compression: quantize each input coordinate to
    ``floor(v * scale + 0.5)`` (HALF-UP — banker's rounding differs
    between engines) and project through the deterministic ±1 sign
    matrix. Every op after the one float multiply-add is EXACT int64
    arithmetic — order-free, so numpy, pure Python, and any SQL engine
    produce identical bits (the oracle replays it with naive loops).

    By Johnson–Lindenstrauss, cosine/L2 geometry survives to ~1/sqrt(
    out_dim) distortion; the int64 output packs 16 dims in 128 bytes vs
    64 float32 dims at 256 — the cheap pre-filter representation for
    ANN shortlists. Overflow bound: |out_j| <= dim * scale * max|v|,
    comfortably inside int64 for any real embedding.

    Plan: one Arrow-batched pandas UDF (integer GEMM per batch), no
    shuffle. Returns (id_col, rvec: array<bigint>).
    """
    signs = _rp_signs(dim, out_dim)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _proj(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        q = np.floor(m * float(scale) + 0.5).astype(np.int64)
        out = q @ signs.T
        return pd.Series(list(out))

    return vectors.select(F.col(id_col), _proj(F.col(vec_col)).alias("rvec"))


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the compression member of the
# ANN family: LSH buckets (cosine_topk_lsh), IVF lists (cosine_topk_ivf),
# and PQ codes compress the VECTORS themselves so the scan reads m bytes
# per candidate instead of d floats.
# ---------------------------------------------------------------------------

_PQ_SCALE = float(1 << 20)  # dyadic: *SCALE is an exact float64 op


def _pq_d2q(sub: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Quantized squared-L2 distances between rows of ``sub`` (n, dsub)
    and rows of ``cent`` (k, dsub):

        d2q = Σ_d floor((x_d − c_d)² · 2^20 + 0.5)     (int64)

    Each per-dimension term is a fixed chain of correctly-rounded IEEE
    ops (subtract, square, exact dyadic scale, +0.5, floor), and the
    int64 sum is order-free — numpy here, pure-Python loops in the
    oracle, and any SQL engine agree on every bit."""
    diff = sub[:, None, :] - cent[None, :, :]
    return (
        np.floor(diff * diff * _PQ_SCALE + 0.5).astype(np.int64).sum(axis=-1)
    )


def pq_train(
    candidates: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 4096,
    n_iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train a product-quantization codebook: split the vector into
    ``m`` contiguous subspaces and run a deterministic plain-L2 Lloyd
    k-means (``n_codes`` centroids) per subspace on an id-sorted,
    size-capped sample — the same bounded-sample training posture as
    ``cosine_topk_ivf`` (at 10^12 rows the codebook still trains on a
    driver-bounded sample; only the (m, n_codes, d/m) matrix ships).

    Deterministic like ``_kmeans_centroids``: evenly spaced sample
    rows as init (no RNG), fixed iteration count, assignment by the
    quantized distance spec (_pq_d2q, ties -> lowest code), empty
    clusters keep their centroid. Returns (m, n_codes, d/m) float64.
    """
    samp = (
        candidates.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_sample)
        .collect()
    )
    if not samp:
        raise ValueError("empty sample for PQ training")
    return _pq_train_mat(
        np.asarray([r["_v"] for r in samp], dtype=np.float64), m, n_codes, n_iters
    )


def _pq_train_mat(
    mat: np.ndarray, m: int, n_codes: int, n_iters: int = 10
) -> np.ndarray:
    """Numpy core of :func:`pq_train` (callable without a SparkSession —
    the oracle builds the identical codebook from the same id-sorted
    sample)."""
    n, d = mat.shape
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    k = min(n_codes, n)
    book = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        cent = sub[(np.arange(k, dtype=np.int64) * n) // k].copy()
        for _ in range(n_iters):
            assign = np.argmin(_pq_d2q(sub, cent), axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        book[s] = cent
    return book


def pq_encode(
    vectors: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` small integer codes (nearest centroid
    per subspace under the _pq_d2q spec, ties -> lowest code): the
    compressed representation a PQ scan reads instead of the floats —
    m bytes/vector at n_codes<=256 vs 4·d, the ~64x bandwidth cut that
    makes exhaustive ANN scans feasible.

    One Arrow-batched pandas UDF, no shuffle. Returns
    (id_col, pq_codes: array<int>).
    """
    book = codebook
    m, _, dsub = book.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _enc(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        codes = np.empty((len(mat), m), dtype=np.int32)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            codes[:, s] = np.argmin(_pq_d2q(sub, book[s]), axis=1)
        return pd.Series(list(codes))

    return vectors.select(F.col(id_col), _enc(F.col(vec_col)).alias("pq_codes"))


def pq_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebook: np.ndarray,
    k: int,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    codes_col: str = "pq_codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: each query precomputes a
    (m × n_codes) lookup table of quantized subspace distances to every
    centroid; a candidate's approximate squared L2 is then m integer
    table lookups summed — NO float math in the scan, and the scan
    reads only the codes.

    Plan: queries (small by contract) carry their LUT through ONE
    Arrow-batched UDF, broadcast onto the codes table; the ADC sum is a
    native ordered ``aggregate`` fold over ``sequence(0, m-1)`` (pure
    codegen — int64 adds, order-fixed); the per-query top-k
    ``row_number`` filter benefits from Spark's WindowGroupLimit
    pushdown, so each task forwards only its local top-k to the single
    (query_id)-keyed shuffle. Compose with IVF buckets to cut the scan
    itself at 10^12 rows (IVF-PQ).

    Returns (query_id, neighbor_id, rank, adc_d2q:int64) — adc_d2q is
    the EXACT quantized spec distance (scale 2^20), deterministic and
    engine-replayable; ties rank by neighbor_id.
    """
    book = codebook
    m, n_codes, dsub = book.shape

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _lut(vecs: pd.Series) -> pd.Series:
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        out = np.empty((len(mat), m * n_codes), dtype=np.int64)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            out[:, s * n_codes : (s + 1) * n_codes] = _pq_d2q(sub, book[s])
        return pd.Series(list(out))

    q = queries.select(
        F.col(query_id).alias("query_id"), _lut(F.col(vec_col)).alias("_lut")
    )
    c = codes.select(F.col(cand_id).alias("neighbor_id"), F.col(codes_col))
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0L, (acc, i) -> "
        f"acc + element_at(_lut, i * {n_codes} + element_at({codes_col}, i + 1) + 1))"
    )
    pairs = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_d2q", adc)
        .select("query_id", "neighbor_id", "adc_d2q")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2q").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_d2q")
    )


def ivfpq_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    n_lists: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    train_sample: int = 4096,
    query_id: str = "vec_id",
    cand_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the composition that actually runs at 10^12 vectors —
    IVF lists bound WHICH candidates each query scans, PQ codes bound
    WHAT the scan reads (m bytes vs d floats), residual encoding
    (Jégou 2011 §IV) keeps the codes tight around each list centroid.

    Everything after the one float subtract per dimension is the
    _pq_d2q quantized-int64 spec, so list assignment, probe order,
    codes, and ADC distances are all bit-replayable in pure Python
    (the q_ivfpq oracle) — ties break to the lowest list/code id.

    Train (driver, bounded sample, deterministic): coarse = plain-L2
    k-means on the full vector (``_pq_train_mat`` with m=1); PQ book =
    per-subspace k-means on the sample RESIDUALS v − coarse[assign(v)].
    Assign: candidates carry (ivf_list, pq_codes) from ONE vectorized
    UDF — no shuffle. Search: queries explode to their nprobe nearest
    lists with a PER-LIST residual LUT, equi-join on list id (the only
    data shuffle, same slim shape as cosine_topk_ivf), native ordered
    ``aggregate`` fold for ADC, WindowGroupLimit-pushed top-k.

    Returns (query_id, neighbor_id, rank, adc_d2q:int64); recall < 1
    by design (unprobed lists are unseen — raise nprobe/n_lists).
    """
    samp = (
        candidates.select(F.col(cand_id).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(train_sample)
        .collect()
    )
    if not samp:
        raise ValueError("empty sample for IVF-PQ training")
    mat = np.asarray([r["_v"] for r in samp], dtype=np.float64)
    coarse = _pq_train_mat(mat, 1, n_lists)[0]  # (n_lists, d) plain-L2 k-means
    assign = np.argmin(_pq_d2q(mat, coarse), axis=1)
    book = _pq_train_mat(mat - coarse[assign], m, n_codes)
    n_lists_eff = coarse.shape[0]
    dsub = book.shape[2]
    npb = min(nprobe, n_lists_eff)

    cand_t = T.StructType(
        [
            T.StructField("ivf_list", T.IntegerType()),
            T.StructField("pq_codes", T.ArrayType(T.IntegerType())),
        ]
    )

    @F.pandas_udf(cand_t)
    def _enc(vecs: pd.Series) -> pd.DataFrame:
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        lists = np.argmin(_pq_d2q(v, coarse), axis=1)
        res = v - coarse[lists]
        codes = np.empty((len(v), m), dtype=np.int32)
        for s in range(m):
            codes[:, s] = np.argmin(
                _pq_d2q(res[:, s * dsub : (s + 1) * dsub], book[s]), axis=1
            )
        return pd.DataFrame(
            {"ivf_list": lists.astype(np.int32), "pq_codes": list(codes)}
        )

    probe_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("ivf_list", T.IntegerType()),
                T.StructField("lut", T.ArrayType(T.LongType())),
            ]
        )
    )

    @F.pandas_udf(probe_t)
    def _probe(vecs: pd.Series) -> pd.Series:
        v = np.stack([np.asarray(x, dtype=np.float64) for x in vecs])
        d2 = _pq_d2q(v, coarse)
        order = np.lexsort(
            (np.broadcast_to(np.arange(n_lists_eff), d2.shape), d2), axis=1
        )[:, :npb]
        out = []
        for row, lists in zip(v, order):
            entries = []
            for li in lists:
                res = row - coarse[li]
                lut = np.empty(m * n_codes, dtype=np.int64)
                for s in range(m):
                    lut[s * n_codes : (s + 1) * n_codes] = _pq_d2q(
                        res[None, s * dsub : (s + 1) * dsub], book[s]
                    )[0]
                entries.append({"ivf_list": int(li), "lut": lut})
            out.append(entries)
        return pd.Series(out)

    c = candidates.select(
        F.col(cand_id).alias("neighbor_id"), _enc(F.col(vec_col)).alias("_e")
    ).select("neighbor_id", F.col("_e.ivf_list").alias("ivf_list"), F.col("_e.pq_codes").alias("pq_codes"))
    q = (
        queries.select(
            F.col(query_id).alias("query_id"), _probe(F.col(vec_col)).alias("_p")
        )
        .select("query_id", F.explode("_p").alias("_pe"))
        .select(
            "query_id",
            F.col("_pe.ivf_list").alias("ivf_list"),
            F.col("_pe.lut").alias("_lut"),
        )
    )
    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), 0L, (acc, i) -> "
        f"acc + element_at(_lut, i * {n_codes} + element_at(pq_codes, i + 1) + 1))"
    )
    pairs = (
        c.join(q, "ivf_list")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_d2q", adc)
        .select("query_id", "neighbor_id", "adc_d2q")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2q").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "adc_d2q")
    )


# ---------------------------------------------------------------------------
# PCA reduction — the data-dependent sibling of rp_reduce: learn the
# projection from the corpus covariance instead of a random sign matrix.
# ---------------------------------------------------------------------------

_PCA_PROJ_SCALE = float(1 << 20)  # dyadic quantization of the eigvecs


def pca_train(
    vectors: DataFrame,
    dim: int,
    out_dim: int = 16,
    scale: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "np.ndarray":
    """Learn an integer-quantized PCA projection from the corpus.

    The distributed part is EXACT and partition-invariant: vectors are
    quantized to ``floor(v*scale + 0.5)`` int64; each Arrow batch emits
    its partial Gram/sum/count as (i, j, v) rows (i=j=-1 for the count,
    j=-1 for per-dim sums, upper-triangle products else); ONE hash
    aggregate with keyspace bounded by dim*(dim+1)/2 + dim + 1 sums
    them — the sketch-family shuffle shape, map-side combined, so every
    task ships <= ~2k rows no matter how many vectors it scanned.
    Products are <= (scale*max|v|)^2 per row; int64-exact up to ~2^62 /
    that per corpus — at scale 256 and unit-norm embeddings that is
    >10^12 rows; shrink ``scale`` for bigger corpora.

    The driver step (numpy eigh of the dim x dim covariance assembled
    from the exact integers with Python-bigint numerators) picks the
    top ``out_dim`` eigenvectors, fixes each one's sign (largest-|c|
    component positive, lowest index on ties) and quantizes to int64 at
    2^20 — the returned matrix IS the exported state (the same hybrid
    convention as the PQ codebooks: encode/replay are bit-exact GIVEN
    the matrix; the float eigensolve itself is process-deterministic,
    not a cross-engine contract).

    Returns an int64 ndarray of shape (out_dim, dim).
    """
    if not 1 <= out_dim <= dim:
        raise ValueError(f"need 1 <= out_dim <= dim, got {out_dim}/{dim}")

    tri_i, tri_j = np.triu_indices(dim)

    def _partial(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            q = np.floor(m * float(scale) + 0.5).astype(np.int64)
            g = q.T @ q  # batch-local: |q|<=scale*max|v|, n_batch ~1e4 — exact
            s = q.sum(axis=0)
            rows = {"i": [-1], "j": [-1], "v": [len(pdf)]}
            rows["i"] += list(range(dim))
            rows["j"] += [-1] * dim
            rows["v"] += [int(x) for x in s]
            rows["i"] += [int(x) for x in tri_i]
            rows["j"] += [int(x) for x in tri_j]
            rows["v"] += [int(g[a, b]) for a, b in zip(tri_i, tri_j)]
            yield pd.DataFrame(rows)

    parts = (
        vectors.select(F.col(vec_col).alias("v"))
        .mapInPandas(_partial, "i int, j int, v long")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    n = 0
    s = np.zeros(dim, dtype=object)
    G = np.zeros((dim, dim), dtype=object)
    for r in parts:
        i, j, v = int(r["i"]), int(r["j"]), int(r["v"])
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            G[i, j] = v
            G[j, i] = v
    if n < 2:
        raise ValueError(f"pca_train needs >= 2 vectors, got {n}")
    # covariance with exact integer numerators: C_ij ∝ n*G_ij - s_i*s_j
    C = np.empty((dim, dim), dtype=np.float64)
    den = float(n) * float(n) * float(scale) * float(scale)
    for a in range(dim):
        for b in range(dim):
            C[a, b] = float(int(n) * int(G[a, b]) - int(s[a]) * int(s[b])) / den
    w, v = np.linalg.eigh(C)
    top = v[:, ::-1][:, :out_dim].T  # rows = components, descending eigenvalue
    proj = np.empty((out_dim, dim), dtype=np.int64)
    for r_i in range(out_dim):
        comp = top[r_i]
        pivot = int(np.argmax(np.abs(comp)))  # first max on ties
        if comp[pivot] < 0:
            comp = -comp
        proj[r_i] = np.floor(comp * _PCA_PROJ_SCALE + 0.5).astype(np.int64)
    return proj


def pca_encode(
    vectors: DataFrame,
    proj: "np.ndarray",
    scale: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project vectors through a :func:`pca_train` matrix — the exact
    mirror of rp_reduce's encode: quantize to int64, one integer GEMM
    per Arrow batch, no shuffle. Given the same matrix, numpy, pure
    Python and any engine agree on every output bit.

    Returns (id_col, pvec: array<bigint>).
    """
    mat = np.asarray(proj, dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _proj_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        q = np.floor(m * float(scale) + 0.5).astype(np.int64)
        out = q @ mat.T
        return pd.Series(list(out))

    return vectors.select(F.col(id_col), _proj_udf(F.col(vec_col)).alias("pvec"))


# ---------------- MMR diversified top-k ----------------


def _mmr_cos_q_py(a, na2: int, b, nb2: int) -> int:
    """Pure-Python replay of the quantized-cosine spec: micro-cosine
    units, ``floor(dot*1e6 / (sqrt(na2)*sqrt(nb2)) + 0.5)`` as ONE
    fixed IEEE chain (dot/na2/nb2 are exact int64); 0 when either
    vector is all-zero. floor(x+0.5) rounds half-up toward +inf —
    a deterministic spec choice shared with the numpy kernel."""
    import math

    if na2 == 0 or nb2 == 0:
        return 0
    dot = 0
    for x, y in zip(a, b):
        dot += x * y
    return math.floor(float(dot) * 1e6 / (math.sqrt(float(na2)) * math.sqrt(float(nb2))) + 0.5)


def mmr_topk_py(rows, k: int, lam_num: int, lam_den: int):
    """Pure-Python scalar replay of the ``mmr_topk`` spec for ONE query
    group — the independent oracle (brute loops, no numpy). ``rows`` is
    ``[(doc_id, rel, vec)]``; returns ``[(rank, doc_id, mmr_num)]``."""
    cands = sorted(rows, key=lambda r: r[0])
    n = len(cands)
    norms2 = [sum(int(x) * int(x) for x in v) for (_, _, v) in cands]
    pen = [0] * n
    picked = [False] * n
    out = []
    for rank in range(1, min(k, n) + 1):
        best_i, best_score = None, None
        for i in range(n):
            if picked[i]:
                continue
            score = lam_num * int(cands[i][1]) - (lam_den - lam_num) * pen[i]
            if best_score is None or score > best_score:
                best_i, best_score = i, score
        out.append((rank, cands[best_i][0], best_score))
        picked[best_i] = True
        sv, sn2 = cands[best_i][2], norms2[best_i]
        for i in range(n):
            if not picked[i]:
                c = _mmr_cos_q_py(cands[i][2], norms2[i], sv, sn2)
                if c > pen[i]:
                    pen[i] = c
    return out


def mmr_topk(
    cands: DataFrame,
    k: int,
    lam_num: int,
    lam_den: int,
    q_col: str = "q_id",
    id_col: str = "doc_id",
    rel_col: str = "rel",
    vec_col: str = "vec",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998) per query group — the retrieval/RAG reranking step
    that keeps a result page (or a training-example selection) from
    filling up with near-duplicates of the top hit.

    Greedy MMR under an ALL-INTEGER score spec (gate-hashable where
    float MMR's argmax ties are ulp-unstable):

        score(c) = lam_num * rel(c)
                   - (lam_den - lam_num) * max_{s in selected} cos_q(c, s)

    with ``cos_q`` the micro-cosine quantization (``_mmr_cos_q_py``;
    int64, 0 for zero vectors, penalty floor 0 so anti-similar vectors
    earn no bonus). ``rel`` is the caller's int64 relevance (quantized
    upstream — comparable to micro-cosine units times lam weights by
    the caller's choice of lam_num/lam_den). Rank-1 pick is the pure
    relevance argmax; every tie breaks to the smallest ``doc_id``
    (first argmax over the id-sorted group) => fully deterministic.

    Vectors are int64-quantized (rp_reduce / pq upstream); caller
    contract: dot products fit int64.

    Returns ``(q_id, rank:int, doc_id, mmr_num:bigint)`` — ``mmr_num``
    is the integer score at pick time (rank-1 rows carry
    ``lam_num*rel``).

    Plan shape (100-TB posture): ONE FlatMapGroupsInPandas keyed by
    q_col — the documented sequential-per-group case (the greedy pick
    depends on the kept set, like debounce/stay_points); parallelism is
    across queries (millions), per-group cost O(k * n * dim) vectorized
    in numpy. Candidate generation upstream (cosine_topk_lsh / pq_topk)
    bounds n per group.
    """
    out_schema = f"{q_col} long, rank int, {id_col} long, mmr_num long"
    lnum, lden = int(lam_num), int(lam_den)
    kk = int(k)

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        rel = pdf[rel_col].to_numpy(dtype=np.int64)
        V = np.asarray(pdf[vec_col].tolist(), dtype=np.int64)
        n = len(ids)
        norms2 = (V * V).sum(axis=1, dtype=np.int64)
        sq = np.sqrt(norms2.astype(np.float64))
        pen = np.zeros(n, dtype=np.int64)
        alive = np.ones(n, dtype=bool)
        ranks, out_ids, nums = [], [], []
        for r in range(1, min(kk, n) + 1):
            score = lnum * rel - (lden - lnum) * pen
            masked = np.where(alive, score, np.iinfo(np.int64).min)
            i = int(np.argmax(masked))  # first max = smallest doc_id
            ranks.append(r)
            out_ids.append(int(ids[i]))
            nums.append(int(score[i]))
            alive[i] = False
            if alive.any():
                dot = V @ V[i]
                den = sq * float(sq[i])
                with np.errstate(divide="ignore", invalid="ignore"):
                    c = np.floor(dot.astype(np.float64) * 1e6 / den + 0.5)
                c = np.where(
                    (norms2 == 0) | (norms2[i] == 0), 0.0, c
                ).astype(np.int64)
                pen = np.where(alive, np.maximum(pen, c), pen)
        return pd.DataFrame(
            {
                q_col: np.full(len(ranks), pdf[q_col].iloc[0], dtype=np.int64),
                "rank": np.array(ranks, dtype=np.int32),
                id_col: np.array(out_ids, dtype=np.int64),
                "mmr_num": np.array(nums, dtype=np.int64),
            }
        )

    return (
        cands.select(q_col, id_col, rel_col, vec_col)
        .groupBy(q_col)
        .applyInPandas(_mmr, out_schema)
    )


def rrf_fuse(
    ranklists: DataFrame,
    k: int = 60,
    system_col: str = "system",
    q_col: str = "q_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    top_k: int | None = None,
    scale_bits: int = 40,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard way
    to merge heterogeneous retrieval lists (BM25 lexical + ANN vector +
    anything else) into one ranking without score calibration:

        rrf(d) = sum over systems s retrieving d of 1 / (k + rank_s(d))

    INTEGER contribution spec (a float sum over systems/partitions is
    order-dependent; this is gate-hashable): each system contributes
    ``2^scale_bits DIV (k + rank)`` exactly, ranks are dense ranks by
    ``(score DESC, doc ASC)`` within (system, query) — fully
    deterministic under score ties — and ``rrf`` is ONE final division
    of the exact int64 sum by 2^scale_bits.

    Returns ``(q_id, doc_id, n_systems, rrf_q, rrf)`` plus ``fused_rank``
    when ``top_k`` is set (rows ranked > top_k dropped; ties broken by
    doc id ascending).

    Plan: one (system, q) window rank + one (q, doc) hash agg (+ one
    (q) window for top_k) — ranking windows partition by query, so a
    million queries parallelize; no collect, no Python.
    """
    w = Window.partitionBy(system_col, q_col).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    ranked = ranklists.select(
        F.col(q_col).alias("q_id"),
        F.col(doc_col).alias("doc_id"),
        F.dense_rank().over(w).cast("bigint").alias("rnk"),
    )
    # integer DIV (never a float division + floor: the double quotient
    # can land one ulp under the exact value and floor off by one)
    scored = ranked.select(
        "q_id",
        "doc_id",
        F.expr(f"{1 << int(scale_bits)}L DIV ({int(k)}L + rnk)").alias("c_q"),
    )
    out = scored.groupBy("q_id", "doc_id").agg(
        F.count(F.lit(1)).alias("n_systems"),
        F.sum("c_q").alias("rrf_q"),
    )
    out = out.select(
        "q_id",
        "doc_id",
        "n_systems",
        "rrf_q",
        (F.col("rrf_q").cast("double") / F.lit(float(1 << scale_bits))).alias("rrf"),
    )
    if top_k is not None:
        wq = Window.partitionBy("q_id").orderBy(
            F.col("rrf_q").desc(), F.col("doc_id").asc()
        )
        out = out.withColumn("fused_rank", F.row_number().over(wq)).where(
            F.col("fused_rank") <= int(top_k)
        )
    return out


KMEANS_Q_SCALE = float(1 << 20)


def kmeans_fit_py(vecs: list, k: int, n_iters: int) -> list:
    """Scalar replay of the distributed Lloyd spec (oracle kernel):
    ``vecs`` is an id-ORDERED list of quantized int tuples; init =
    first k rows; per iter: argmin exact int d2 (tie -> smallest
    cluster), centroid = per-dim floor-div of exact sums (empty
    cluster keeps its previous centroid). Returns final centroids."""
    cents = [list(v) for v in vecs[:k]]
    d = len(cents[0])
    for _ in range(n_iters):
        sums = [[0] * d for _ in range(k)]
        cnts = [0] * k
        for v in vecs:
            best, bd = 0, None
            for c in range(k):
                dd = 0
                cc = cents[c]
                for j in range(d):
                    t = v[j] - cc[j]
                    dd += t * t
                if bd is None or dd < bd:
                    best, bd = c, dd
            cnts[best] += 1
            sv = sums[best]
            for j in range(d):
                sv[j] += v[j]
        for c in range(k):
            if cnts[c] > 0:
                cents[c] = [sums[c][j] // cnts[c] for j in range(d)]
    return cents


def kmeans_fit(
    vectors: DataFrame,
    n_clusters: int = 8,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FULL distributed Lloyd k-means (r4) — the canonical iterative
    ML fit, training on the ENTIRE dataset (kmeans_assign's coarse
    quantizer trains on a bounded sample; this is the real fit for
    when cluster quality matters: corpus bucketing, IVF list training
    at 10^9+ vectors where a sample misses small modes).

    EXACT-INTEGER spec (engine == plain-Python replay, bit for bit):
    vectors quantize once to int64 (floor(x * 2^20 + 0.5)); distances
    are exact int64 squared-L2; argmin ties break to the SMALLEST
    cluster id; centroid update is per-dimension floor-division of
    exact int64 sums (empty clusters keep their previous centroid);
    init = the k vectors with the smallest ids. No float enters the
    loop, so partitioning/engine/iteration order cannot change a bit.

    Plan per iteration: ONE fused map-only Arrow stage — the (k x d)
    centroid array rides inside a mapInPandas kernel that assigns
    every vector AND accumulates per-cluster packed-array partial sums
    locally, emitting k rows per PARTITION (cluster, n, sums[d]); the
    driver reduces those tiny partials (k x d x n_partitions ints —
    the bounded-driver-state class, IVF/PQ codebooks) into the next
    round's centroids. No shuffle at all inside the loop: the r4
    formulation's posexplode to (cluster, dim) rows multiplied the
    aggregate input x d (measured 0.43-0.55 local efficiency); the
    packed partials carry the same exact int64 sums at 1/d the rows
    and zero Exchanges. A loud guard raises before a partition's
    partial sum could wrap int64. n_iters fixed: no convergence
    actions.

    Returns the final assignment ``(id_col, cluster, d2)``.
    """
    if n_clusters < 1 or n_iters < 1:
        raise ValueError("n_clusters and n_iters must be >= 1")
    qv = vectors.select(
        F.col(id_col).alias("_id"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(
                x.cast("double") * F.lit(KMEANS_Q_SCALE) + F.lit(0.5)
            ).cast("long"),
        ).alias("_q"),
    )
    init = qv.orderBy("_id").limit(n_clusters).collect()
    if len(init) < n_clusters:
        raise ValueError(
            f"need >= {n_clusters} vectors, got {len(init)}"
        )
    cents = np.asarray([r["_q"] for r in init], dtype=np.int64)

    def _argmin_int(m: np.ndarray, c_arr: np.ndarray):
        # exact int64 d2: ||v||^2 - 2 v.c + ||c||^2 risks nothing
        # here because python ints never overflow in the replay —
        # but numpy would, so compute per-centroid diffs directly.
        # argmin ties break to the SMALLEST cluster id (strict <)
        best = np.zeros(len(m), dtype=np.int64)
        bd = None
        for c in range(len(c_arr)):
            diff = m - c_arr[c][None, :]
            dd = np.einsum("ij,ij->i", diff, diff)
            if bd is None:
                bd = dd.copy()
            else:
                upd = dd < bd
                best[upd] = c
                bd[upd] = dd[upd]
        return best, bd

    def assign_with(c_arr: np.ndarray):
        dd = len(c_arr[0])

        @F.pandas_udf("cluster long, d2 long")
        def _assign(vecs: pd.Series) -> pd.DataFrame:
            # flat concatenate + reshape: one C-level pass, no
            # per-row python asarray loop (measured ~1.7x)
            m = np.concatenate(vecs.to_numpy()).astype(np.int64).reshape(len(vecs), dd)
            best, bd = _argmin_int(m, c_arr)
            return pd.DataFrame({"cluster": best, "d2": bd})

        return _assign

    d = len(cents[0])

    def partials_with(c_arr: np.ndarray):
        k = len(c_arr)

        def _partials(it):
            sums = np.zeros((k, d), dtype=np.int64)
            cnt = np.zeros(k, dtype=np.int64)
            seen = 0
            max_q = 1
            for pdf in it:
                if not len(pdf):
                    continue
                m = (
                    np.concatenate(pdf["_q"].to_numpy())
                    .astype(np.int64)
                    .reshape(len(pdf), d)
                )
                seen += len(m)
                max_q = max(max_q, int(np.abs(m).max()))
                if seen * max_q >= (1 << 62):
                    raise ValueError(
                        "kmeans_fit: per-partition partial sums would "
                        "overflow int64; rescale the quantization or "
                        "repartition finer"
                    )
                best, _ = _argmin_int(m, c_arr)
                np.add.at(sums, best, m)
                np.add.at(cnt, best, 1)
            if seen:
                yield pd.DataFrame(
                    {
                        "_c": np.arange(k, dtype=np.int64),
                        "_n": cnt,
                        "_s": [sums[c].tolist() for c in range(k)],
                    }
                )

        return _partials

    for _ in range(n_iters):
        per = qv.mapInPandas(
            partials_with(cents), "_c long, _n long, _s array<long>"
        ).collect()
        # reduce the partials in unbounded python ints (exactness)
        tot_s = [[0] * d for _ in range(n_clusters)]
        tot_n = [0] * n_clusters
        for r in per:
            c = int(r["_c"])
            tot_n[c] += int(r["_n"])
            row = r["_s"]
            tc = tot_s[c]
            for j in range(d):
                tc[j] += int(row[j])
        new = cents.copy()
        for c in range(n_clusters):
            if tot_n[c] > 0:
                new[c] = np.asarray(
                    [tot_s[c][j] // tot_n[c] for j in range(d)],
                    dtype=np.int64,
                )
        cents = new
    final = qv.withColumn("_a", assign_with(cents)(F.col("_q")))
    return final.select(
        F.col("_id").alias(id_col),
        F.col("_a.cluster").alias("cluster"),
        F.col("_a.d2").alias("d2"),
    )
