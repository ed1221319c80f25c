"""Deduplication operators for training-data pipelines.

Five families, each as a distributed DataFrame pipeline:

- exact:         hash-groupBy on content (or md5) — one shuffle.
- ngram-jaccard: explode distinct n-grams -> self-join on gram ->
                 exact Jaccard from intersection counts (fully
                 SQL-expressible -> DuckDB oracle).
- MinHash+LSH:   shingles -> numpy minhash signatures -> band buckets
                 -> bucket self-join -> exact-Jaccard verify. The
                 scale path: candidate generation is linear in docs,
                 never all-pairs.
- SimHash:       64-bit simhash -> 16-bit band buckets -> hamming
                 verify.
- embedding-cosine: see operators.ann (near_dup_cosine).

All hashing is deterministic (no process seeds): blake2b with fixed
per-permutation keys.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the minimum id per identical content. One shuffle on the
    content hash (group on md5, not the full text, to keep shuffle
    rows narrow at scale)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact character-n-gram Jaccard similarity join (a < b pairs).

    explode(distinct n-grams) -> self-join on gram -> |intersection|
    per pair -> Jaccard = inter / (|A| + |B| - inter). Native exprs
    end-to-end. The gram join is the shuffle; at planet scale you'd
    pre-filter with MinHash (below) — this exact variant doubles as
    its verifier.
    """
    grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(
                F.expr(f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 0)), "
                       f"i -> substring({text_col}, i, {n}))")
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    pairs = (
        grams.alias("g1")
        .join(grams.alias("g2"), (F.col("g1.gram") == F.col("g2.gram")) & (F.col("g1.id") < F.col("g2.id")))
        .groupBy(F.col("g1.id").alias("id_a"), F.col("g2.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_grams", "na"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_grams", "nb"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------- MinHash + LSH ----------------

_N_PERM = 64
_BANDS = 16  # 16 bands x 4 rows


_POLY_B = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-shingle 64-bit hashes — VECTORIZED polynomial hash
    (h = h*B + byte, uint64 wraparound), k passes over a (n_windows,)
    array instead of one blake2b call per shingle."""
    data = text.encode("utf-8")
    if len(data) < k:
        data = data + b"\x00" * (k - len(data))
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(b) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * _POLY_B + b[j : j + n]
    # final avalanche (splitmix64-style) to spread low-entropy inputs
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return np.unique(h)


# deterministic affine permutations h_i(x) = (a_i * x + b_i) mod 2^61-1
_MERSENNE = np.uint64((1 << 61) - 1)
_rng = np.random.default_rng(0x5EED)  # fixed seed: part of the operator spec
_PERM_A = _rng.integers(1, int(_MERSENNE), size=_N_PERM, dtype=np.uint64)
_PERM_B = _rng.integers(0, int(_MERSENNE), size=_N_PERM, dtype=np.uint64)


def _minhash_sig(hashes: np.ndarray) -> np.ndarray:
    """(n_shingles,) -> (_N_PERM,) signature."""
    if len(hashes) == 0:
        return np.full(_N_PERM, np.iinfo(np.int64).max, dtype=np.uint64)
    x = hashes[None, :] & _MERSENNE
    vals = (_PERM_A[:, None] * x + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup candidate pairs via MinHash banding, verified with the
    exact shingle Jaccard (estimated from full signatures would be
    approximate; verification here recomputes true shingle Jaccard).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _bands(text: pd.Series) -> pd.Series:
        out = []
        rows_per_band = _N_PERM // _BANDS
        for t in text:
            sig = _minhash_sig(_shingle_hashes(t or "", shingle_k))
            bands = []
            for b in range(_BANDS):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8, key=b.to_bytes(2, "little"))
                # (band_index << 56) | 56-bit hash -> distinct key space per band
                bands.append(
                    (b << 56) | (int.from_bytes(h.digest(), "little") & ((1 << 56) - 1))
                )
            out.append(bands)
        return pd.Series(out)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _shingles(text: pd.Series) -> pd.Series:
        return pd.Series(
            [np.sort(_shingle_hashes(t or "", shingle_k)).astype(np.int64).tolist() for t in text]
        )

    # slim (id, band) rows only through the self-join: pair dedup
    # shuffles ids instead of text pairs, and the texts join back only
    # for the exact-Jaccard verification of surviving pairs. Both join
    # sides are the identical subplan shuffled on band, so AQE's
    # ReuseExchange computes the signature pass once — no cache (at
    # 10^12 docs the banded table would not be cacheable anyway).
    base = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text"))
    slim = base.withColumn("band", F.explode(_bands(F.col("_text")))).select(
        "id", "band"
    )

    pair_ids = (
        slim.alias("a")
        .join(slim.alias("b"), (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        pair_ids.join(base.select(F.col("id").alias("id_a"), F.col("_text").alias("ta")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("_text").alias("tb")), "id_b")
    )

    @F.pandas_udf(T.DoubleType())
    def _true_jaccard(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            a = _shingle_hashes(x or "", shingle_k)
            b = _shingle_hashes(y or "", shingle_k)
            inter = np.intersect1d(a, b, assume_unique=True).size
            u = a.size + b.size - inter
            out[i] = (inter / u) if u else 1.0
        return pd.Series(out)

    return (
        cand.withColumn("jaccard", _true_jaccard(F.col("ta"), F.col("tb")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------- SimHash ----------------


def _simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    for tok in (text or "").split():
        h = int.from_bytes(hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Banding: any pair within hamming<=3 of 64 bits shares at least one
    of 4 16-bit quarters (pigeonhole) -> bucket join on quarters, then
    exact popcount verify.
    """

    @F.pandas_udf(T.LongType())
    def _sh(text: pd.Series) -> pd.Series:
        return pd.Series([np.int64(np.uint64(_simhash64(t))) for t in text], dtype=np.int64)

    sh = docs.select(F.col(id_col).alias("id"), _sh(F.col(text_col)).alias("sh"))
    quarters = sh.select(
        "id", "sh",
        F.explode(
            F.array(*[
                (F.lit(q) * F.lit(1 << 16)).cast("long")
                + F.shiftrightunsigned(F.col("sh"), 16 * q).bitwiseAND(F.lit(0xFFFF))
                for q in range(4)
            ])
        ).alias("bucket"),
    )
    cand = (
        quarters.alias("a")
        .join(quarters.alias("b"), (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sh").alias("sa"), F.col("b.sh").alias("sb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
