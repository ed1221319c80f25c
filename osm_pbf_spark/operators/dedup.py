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
from pyspark.sql import Column, DataFrame, Window
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
    """(n_shingles,) -> (_N_PERM,) signature.

    Deliberately per-document: a cross-document batched variant
    (concatenate shingle streams + segmented reduceat-min, the same
    restructure that bought _simhash64_batch 9.6x) was measured at
    PARITY here across chunk sizes 2^11-2^14 — the uint64 remainder in
    the affine permute dominates and is per-element either way, while
    simhash's win came from deduplicating per-token blake2b calls.
    Don't re-batch this without beating that baseline."""
    if len(hashes) == 0:
        return np.full(_N_PERM, np.iinfo(np.int64).max, dtype=np.uint64)
    x = hashes[None, :] & _MERSENNE
    vals = (_PERM_A[:, None] * x + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def _collapse_exact(docs: DataFrame, text_col: str, id_col: str):
    """Exact-duplicate pre-collapse shared by the LSH families.

    Returns (reps, members):
      reps:    one row per DISTINCT text — (id, _text), id = min member id;
      members: every doc — (_rep, id).

    Identical texts are the pathological LSH input (every band/bucket
    collides), and a re-crawl corpus or a 10^4-copy boilerplate blob
    would otherwise multiply the band self-join quadratically. One
    shuffle keyed on md5(text) collapses them; the LSH candidate
    machinery then runs on DISTINCT texts only, and within-/cross-group
    pairs are reconstructed by joins whose output is exactly the
    required pair set — so total work is linear in distinct docs plus
    OUTPUT size, never quadratic in copies.

    Plan shape: reps and members are consumed by SEVERAL downstream
    joins (signature pass, two text-fetch joins, four member joins in
    the pair expansion), and Spark re-executes everything ABOVE a
    reused exchange once per consumer. So:
      - reps is an AGGREGATE (min id, any text — all texts in a group
        are identical; max() only to make the choice deterministic,
        and max==min here): map-side partial agg shrinks its exchange
        to ~|distinct texts| rows, and each consumer re-runs only the
        cheap final agg — never a full-corpus sort. (The previous
        window-over-full-text form sorted every shuffled text once PER
        CONSUMER: ~10 full-width sorts in the minhash plan.)
      - members carries only (id, 32-char _fp) through its window —
        the text never enters that shuffle."""
    base = docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_text")
    ).withColumn("_fp", F.md5(F.coalesce(F.col("_text"), F.lit(""))))
    reps = (
        base.groupBy("_fp")
        .agg(F.min("id").alias("id"), F.max("_text").alias("_text"))
        .select("id", "_text")
    )
    w = Window.partitionBy("_fp")
    members = (
        base.select("id", "_fp")
        .withColumn("rep", F.min("id").over(w))
        .select("rep", "id")
    )
    return reps, members


def _expand_group_pairs(
    rep_pairs: DataFrame, members: DataFrame, metric_col: str, within_value
) -> DataFrame:
    """(rep_a, rep_b, metric) x group members -> all (id_a, id_b, metric)
    pairs, id_a < id_b: every within-group pair (identical texts) at the
    ``within_value`` of the metric plus every cross-group member combo at
    the rep pair's metric. Join output == emitted pairs — no overdraw."""
    wv = within_value if isinstance(within_value, Column) else F.lit(within_value)
    within = (
        members.alias("x")
        .join(members.alias("y"), (F.col("x.rep") == F.col("y.rep")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            wv.alias(metric_col),
        )
    )
    cross = (
        rep_pairs.join(
            members.alias("ma"), F.col("ma.rep") == F.col("rep_a")
        )
        .join(members.alias("mb"), F.col("mb.rep") == F.col("rep_b"))
        .select(
            F.least(F.col("ma.id"), F.col("mb.id")).alias("id_a"),
            F.greatest(F.col("ma.id"), F.col("mb.id")).alias("id_b"),
            F.col(metric_col),
        )
    )
    return within.unionByName(cross)


def _min_parallel(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's parallelism when the
    input arrives in fewer partitions (a single small parquet file
    would otherwise run the whole signature UDF pass 2-wide on a
    32-core box). No-op on well-partitioned (cluster-scale) inputs."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def _cap_hot_buckets(keyed: DataFrame, key: str, max_bucket: int | None) -> DataFrame:
    """Drop bucket keys whose member count exceeds ``max_bucket`` before
    the candidate self-join (a degenerate key — e.g. near-empty docs all
    sharing one band signature — otherwise goes quadratic). Implemented
    as a count window over the key: it rides the SAME shuffle the
    candidate join needs anyway, so the cap adds no extra pass over the
    signature UDF. Recall note: dropped buckets lose only pairs whose
    EVERY shared band is hot; use ``minhash_hot_buckets`` to observe
    what a cap would drop."""
    if max_bucket is None:
        return keyed
    w = Window.partitionBy(key)
    return (
        keyed.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_bucket_n") <= max_bucket)
        .drop("_bucket_n")
    )


def minhash_hot_buckets(
    docs: DataFrame,
    max_bucket: int,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Observability companion to ``minhash_lsh_pairs``: the band buckets
    (over DISTINCT texts) whose occupancy exceeds ``max_bucket``, with
    counts — the candidates a cap of that size would drop."""
    reps, _members = _collapse_exact(docs, text_col, id_col)
    slim = _min_parallel(reps).withColumn(
        "band", F.explode(_bands_udf(shingle_k)(F.col("_text")))
    )
    return (
        slim.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket)
    )


def _bands_udf(shingle_k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _bands(text: pd.Series) -> pd.Series:
        sigs = [_minhash_sig(_shingle_hashes(t or "", shingle_k)) for t in text]
        out = []
        rows_per_band = _N_PERM // _BANDS
        for sig in sigs:
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

    return _bands


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with the exact
    shingle Jaccard (estimated from full signatures would be
    approximate; verification here recomputes true shingle Jaccard).

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    Plan shape (audited with .explain — each property is deliberate):
      - exact-duplicate texts are collapsed FIRST (see _collapse_exact),
        so the signature UDF and the band join run over distinct texts
        and a copy-heavy corpus can never go quadratic;
      - the band self-join carries slim (id, band) rows and is pinned to
        a SHUFFLE join: both sides are the identical subplan shuffled on
        band, so ReuseExchange computes the signature pass ONCE (an AQE
        broadcast conversion would silently re-run it per side — and at
        10^12 docs the banded table is not broadcastable anyway);
      - buckets above ``max_bucket`` distinct texts are excluded
        (degenerate-signature skew guard; None disables);
      - the exact-Jaccard verify is ONE mapInPandas pass that filters
        inside Python (a withColumn+filter would evaluate the UDF twice)
        and memoizes shingle sets per distinct text within each batch.
    """
    reps, members = _collapse_exact(docs, text_col, id_col)
    base = _min_parallel(reps)
    slim = base.withColumn(
        "band", F.explode(_bands_udf(shingle_k)(F.col("_text")))
    ).select("id", "band")
    slim = _cap_hot_buckets(slim, "band", max_bucket)

    pair_ids = (
        slim.alias("a")
        .join(
            slim.alias("b").hint("shuffle_hash"),
            (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        pair_ids.join(base.select(F.col("id").alias("id_a"), F.col("_text").alias("ta")), "id_a")
        .join(base.select(F.col("id").alias("id_b"), F.col("_text").alias("tb")), "id_b")
        .select("id_a", "id_b", "ta", "tb")
    )

    id_type = dict(docs.dtypes)[id_col]

    def _verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cache: dict[str, np.ndarray] = {}

            def hashes(t: str) -> np.ndarray:
                h = cache.get(t)
                if h is None:
                    h = _shingle_hashes(t or "", shingle_k)
                    cache[t] = h
                return h

            jac = np.empty(len(pdf))
            for i, (x, y) in enumerate(zip(pdf["ta"], pdf["tb"])):
                a = hashes(x)
                b = hashes(y)
                inter = np.intersect1d(a, b, assume_unique=True).size
                u = a.size + b.size - inter
                jac[i] = (inter / u) if u else 1.0
            keep = jac >= threshold
            out = pdf.loc[keep, ["id_a", "id_b"]].copy()
            out["jaccard"] = jac[keep]
            yield out

    rep_pairs = cand.mapInPandas(
        _verify, f"id_a {id_type}, id_b {id_type}, jaccard double"
    ).select(F.col("id_a").alias("rep_a"), F.col("id_b").alias("rep_b"), "jaccard")
    return _expand_group_pairs(rep_pairs, members, "jaccard", 1.0)


# ---------------- SimHash ----------------


def _simhash64_batch(texts) -> np.ndarray:
    """64-bit SimHash over whitespace tokens, BATCHED (returns uint64).

    Bit-identical to the original scalar spec (token hash = 8-byte
    little-endian blake2b; bit i set iff more token hashes have bit i
    set than clear), but the per-token work is restructured for the
    Arrow batch: each DISTINCT token in the batch is hashed exactly
    once (the token vocabulary is tiny vs the corpus — natural-language
    Zipf reuse), the vocab's bit matrix is built in one vectorized
    shift, and the per-doc +-1 accumulation becomes a segmented bit-sum
    (``2*bitsum > n_tokens`` <=> the +-1 sum is positive). The expanded
    (tokens x 64) block is chunked to stay cache-resident.
    """
    docs_tokens = [(t or "").split() for t in texts]
    n_docs = len(docs_tokens)
    vocab: dict[str, int] = {}
    tok_ids: list[int] = []
    lens = np.empty(n_docs, dtype=np.int64)
    for i, toks in enumerate(docs_tokens):
        lens[i] = len(toks)
        for tok in toks:
            j = vocab.get(tok)
            if j is None:
                j = len(vocab)
                vocab[tok] = j
            tok_ids.append(j)
    out = np.zeros(n_docs, dtype=np.uint64)
    if not vocab:
        return out
    hs = np.empty(len(vocab), dtype=np.uint64)
    for tok, j in vocab.items():
        hs[j] = int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "little"
        )
    bits_vocab = (
        (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
    ).astype(np.int8)
    ids = np.asarray(tok_ids, dtype=np.int64)
    starts = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    nonempty = np.nonzero(lens > 0)[0]
    # chunk by TOKEN count, not doc count: the expanded (tokens x 64)
    # int8 block stays ~8 MB no matter how long individual documents
    # are (a fixed doc-count chunk is unbounded for long documents)
    chunk_tokens = 1 << 17
    ne_lens = lens[nonempty]
    cum = np.cumsum(ne_lens)
    s = 0
    while s < len(nonempty):
        base = cum[s - 1] if s else 0
        e = max(int(np.searchsorted(cum, base + chunk_tokens, side="right")), s + 1)
        d = nonempty[s:e]
        if len(d) == 1 and ne_lens[s] > chunk_tokens:
            # one mega-document: accumulate its bit-sums in token slices
            seg = ids[starts[d[0]] : starts[d[0] + 1]]
            bsum = np.zeros(64, dtype=np.int64)
            for t in range(0, len(seg), chunk_tokens):
                bsum += bits_vocab[seg[t : t + chunk_tokens]].sum(axis=0, dtype=np.int64)
            bit_set = (2 * bsum) > lens[d[0]]
            out[d[0]] = (bit_set.astype(np.uint64) * weights).sum()
        else:
            seg = ids[starts[d[0]] : starts[d[-1] + 1]]
            expanded = bits_vocab[seg]  # (tokens_in_chunk, 64)
            bounds = starts[d] - starts[d[0]]  # strictly increasing: no empty docs
            sums = np.add.reduceat(expanded, bounds, axis=0, dtype=np.int64)
            bit_set = (2 * sums) > lens[d, None]
            out[d] = (bit_set.astype(np.uint64) * weights[None, :]).sum(axis=1)
        s = e
    return out


def _simhash64(text: str) -> int:
    """Scalar wrapper (oracle/test surface) over the batched kernel."""
    return int(_simhash64_batch([text])[0])


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    scheme: str = "quarters",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Both schemes are EXACT-recall candidate generators for hamming<=3
    followed by a native popcount verify, so with ``max_bucket=None``
    (or any cap no bucket reaches) they produce IDENTICAL output —
    tests assert this. When the cap DOES engage the schemes may drop
    different pairs (quarters caps the one keyed table used on both
    join sides; halves32 caps only the exact side), and any engaged cap
    is a recall change the gate oracles do not model — the driver-gate
    corpora stay far below the default cap. They differ in
    bucket-occupancy scaling:

    - ``quarters``: any pair within hamming<=3 of 64 bits shares at
      least one of 4 16-bit quarters (pigeonhole). Cheap (4 key rows
      per doc) but the keyspace per band is 2^16 — at ~10^8+ distinct
      docs every bucket is hot and the join goes quadratic.
    - ``halves32``: split into two 32-bit halves; 3 errors across 2
      halves leave some half with <=1 error, so A and B collide on a
      half key after at most one 1-bit flip. Docs emit their 2 exact
      half keys plus all 33 one-bit variants per half; candidates =
      variants(join)exacts. 2^32 keyspace per half — the 10^12-doc
      path — at the cost of 68 key rows per doc. (Multi-index hamming
      search; requires max_hamming <= 3.)

    Exact-duplicate texts are pre-collapsed (see _collapse_exact) and
    buckets above ``max_bucket`` distinct texts are excluded.
    """
    if scheme == "halves32" and max_hamming > 3:
        raise ValueError("halves32 guarantees recall only for max_hamming <= 3")
    if scheme not in ("quarters", "halves32"):
        raise ValueError(f"unknown scheme {scheme!r}")

    @F.pandas_udf(T.LongType())
    def _sh(text: pd.Series) -> pd.Series:
        return pd.Series(_simhash64_batch(list(text)).view(np.int64))

    reps, members = _collapse_exact(docs, text_col, id_col)
    sh = _min_parallel(reps).select(F.col("id"), _sh(F.col("_text")).alias("sh"))

    if scheme == "quarters":
        keyed = sh.select(
            "id", "sh",
            F.explode(
                F.array(*[
                    (F.lit(q) * F.lit(1 << 16)).cast("long")
                    + F.shiftrightunsigned(F.col("sh"), 16 * q).bitwiseAND(F.lit(0xFFFF))
                    for q in range(4)
                ])
            ).alias("bucket"),
        )
        keyed = _cap_hot_buckets(keyed, "bucket", max_bucket)
        cand = (
            keyed.alias("a")
            .join(
                keyed.alias("b").hint("shuffle_hash"),
                (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.sh").alias("sa"), F.col("b.sh").alias("sb"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:  # halves32
        halves = [
            (F.lit(h) * F.lit(1 << 32)).cast("long")
            + F.shiftrightunsigned(F.col("sh"), 32 * h).bitwiseAND(F.lit(0xFFFFFFFF))
            for h in range(2)
        ]
        exact = sh.select(
            "id", "sh", F.explode(F.array(*halves)).alias("bucket")
        )
        # variants: the exact key plus every 1-bit flip of the 32 data
        # bits (the half tag in bits 32+ stays fixed)
        variant_arrays = [
            F.array(*([hk] + [hk.bitwiseXOR(F.lit(1 << b).cast("long")) for b in range(32)]))
            for hk in halves
        ]
        variants = sh.select(
            "id", "sh",
            F.explode(F.flatten(F.array(*variant_arrays))).alias("bucket"),
        )
        exact = _cap_hot_buckets(exact, "bucket", max_bucket)
        cand = (
            variants.alias("a")
            .join(
                exact.alias("b").hint("shuffle_hash"),
                (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
                F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
                F.least(F.col("a.sh"), F.col("b.sh")).alias("_s1"),
                F.greatest(F.col("a.sh"), F.col("b.sh")).alias("_s2"),
            )
            .withColumnRenamed("_s1", "sa")
            .withColumnRenamed("_s2", "sb")
            .dropDuplicates(["id_a", "id_b"])
        )
    rep_pairs = (
        cand.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select(F.col("id_a").alias("rep_a"), F.col("id_b").alias("rep_b"), "hamming")
    )
    return _expand_group_pairs(rep_pairs, members, "hamming", F.lit(0).cast("int"))


# ---------------- cross-corpus LSH join ----------------


def minhash_lsh_join(
    new_docs: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.5,
    shingle_k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Incremental near-dup lookup: which documents of ``new_docs``
    already exist (Jaccard >= threshold) in ``corpus`` — the PRODUCTION
    shape of MinHash dedup at 100 TB: a daily crawl batch is checked
    against the accumulated corpus without ever self-joining the
    corpus (minhash_lsh_pairs' within-corpus problem is assumed
    already solved; this operator answers the standing query that
    keeps it solved).

    Same deterministic banding spec as minhash_lsh_pairs (so a corpus
    side can be banded ONCE, persisted, and reused across batches);
    same exact-duplicate pre-collapse per side (a 10^4-copy boilerplate
    blob on either side collapses to one rep before the band join);
    same exact shingle-Jaccard verification (one mapInPandas pass,
    memoized per distinct text). Hot bands are capped on the CORPUS
    side (the side whose degenerate keys are corpus-sized); the new
    batch's bands are never dropped.

    Plan: band join is a shuffle-hash join building on the NEW side
    (the small side of the standing query — never a broadcast that
    would re-run the corpus signature pass). Returns
    (new_id, corpus_id, jaccard) over MEMBER ids (collapse expanded).
    """
    reps_n, mem_n = _collapse_exact(new_docs, text_col, id_col)
    reps_c, mem_c = _collapse_exact(corpus, text_col, id_col)
    base_n = _min_parallel(reps_n)
    base_c = _min_parallel(reps_c)
    bands = _bands_udf(shingle_k)
    slim_n = base_n.withColumn("band", F.explode(bands(F.col("_text")))).select(
        "id", "band"
    )
    slim_c = base_c.withColumn("band", F.explode(bands(F.col("_text")))).select(
        "id", "band"
    )
    slim_c = _cap_hot_buckets(slim_c, "band", max_bucket)

    rep_pairs = (
        slim_c.alias("c")
        .join(slim_n.alias("n").hint("shuffle_hash"), F.col("c.band") == F.col("n.band"))
        .select(F.col("n.id").alias("id_a"), F.col("c.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = (
        rep_pairs.join(
            base_n.select(F.col("id").alias("id_a"), F.col("_text").alias("ta")), "id_a"
        )
        .join(base_c.select(F.col("id").alias("id_b"), F.col("_text").alias("tb")), "id_b")
        .select("id_a", "id_b", "ta", "tb")
    )

    t_new = dict(new_docs.dtypes)[id_col]
    t_cor = dict(corpus.dtypes)[id_col]

    def _verify(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cache: dict[str, np.ndarray] = {}

            def hashes(t: str) -> np.ndarray:
                h = cache.get(t)
                if h is None:
                    h = _shingle_hashes(t or "", shingle_k)
                    cache[t] = h
                return h

            jac = np.empty(len(pdf))
            for i, (x, y) in enumerate(zip(pdf["ta"], pdf["tb"])):
                a = hashes(x)
                b = hashes(y)
                inter = np.intersect1d(a, b, assume_unique=True).size
                u = a.size + b.size - inter
                jac[i] = (inter / u) if u else 1.0
            keep = jac >= threshold
            out = pdf.loc[keep, ["id_a", "id_b"]].copy()
            out["jaccard"] = jac[keep]
            yield out

    verified = cand.mapInPandas(
        _verify, f"id_a {t_new}, id_b {t_cor}, jaccard double"
    )
    return (
        verified.join(mem_n.alias("mn"), F.col("mn.rep") == F.col("id_a"))
        .join(mem_c.alias("mc"), F.col("mc.rep") == F.col("id_b"))
        .select(
            F.col("mn.id").alias("new_id"),
            F.col("mc.id").alias("corpus_id"),
            "jaccard",
        )
    )


def set_similarity_join(
    docs: DataFrame,
    threshold: tuple[int, int] = (6, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token: int | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard self-join via PREFIX FILTERING (Chaudhuri
    et al. SSJoin / Bayardo All-Pairs / Vernica et al.'s MapReduce
    formulation — the standard exact set-similarity join at scale,
    complementing the approximate MinHash path): all (id_a < id_b)
    pairs whose whitespace-token sets have Jaccard >= num/den.

    ``threshold`` is an exact integer fraction ``(num, den)`` so the
    acceptance test ``den * inter >= num * union`` is pure int64 — no
    float threshold ambiguity between engines.

    Plan (no all-pairs anywhere):

      1. distinct (id, token) explode; per-token document frequency;
      2. per-doc token array sorted by GLOBAL rarity order (df, token)
         ascending — rare tokens first;
      3. each doc emits only its PREFIX: the first
         ``n - ceil(tau*n) + 1`` tokens. Prefix lemma: if
         J(A,B) >= tau, the first common token in rarity order sits
         within BOTH prefixes (all >= ceil(tau*max(|A|,|B|)) common
         tokens lie at-or-after it in each side's sorted array), so
         the prefix equi-join loses nothing;
      4. one token equi-join (id_a < id_b) + exact length prefilter
         ``den * min(na, nb) >= num * max(na, nb)`` (Jaccard is at
         most min/max of the set sizes) -> candidate pair dedup (one
         narrow groupBy — a pair can share several prefix tokens);
      5. verify: join the two sorted token arrays back by id, exact
         ``inter = size(array_intersect)`` native, keep by the integer
         cross-multiplication.

    Returns ``(id_a, id_b, n_inter, n_union)`` — all exact ints, fully
    gate-hashable; the driver oracle is a brute all-pairs SQL join
    (completely independent of prefix filtering).

    Scale posture: candidate volume is governed by df-rare prefix
    tokens (the reason for the rarity sort); a pathological token that
    is both frequent and prefix-resident (near-constant-length corpus
    of tiny docs) can be capped with ``max_token`` — same recall
    contract as the LSH caps (_cap_hot_buckets semantics, documented
    drop). Everything is native codegen; the only Python-free shuffles
    are the token df agg, the prefix join, the pair dedup, and two
    id-keyed array joins.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"threshold must be a fraction in (0, 1], got {num}/{den}")

    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    df_t = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    # per-doc array in (df, tok) rarity order; native sort on the
    # struct ordering, then strip to the token strings
    ordered = (
        toks.join(df_t, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
    )
    # prefix length: n - ceil(num*n/den) + 1, ceil via (num*n + den - 1) div den
    plen = F.col("n") - F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den)) + 1
    prefix = ordered.select(
        "id", "n", F.explode(F.slice("toks", 1, plen.cast("int"))).alias("tok")
    )
    prefix = _cap_hot_buckets(prefix, "tok", max_token)
    a = prefix.select(
        F.col("id").alias("id_a"), F.col("n").alias("na"), "tok"
    )
    b = prefix.select(
        F.col("id").alias("id_b"), F.col("n").alias("nb"), "tok"
    )
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.lit(den) * F.least("na", "nb")
                >= F.lit(num) * F.greatest("na", "nb")
            )
        )
        .groupBy("id_a", "id_b")
        .agg(F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    arrs = ordered.select("id", "toks")
    pairs = (
        cand.join(arrs.select(F.col("id").alias("id_a"), F.col("toks").alias("ta")), "id_a")
        .join(arrs.select(F.col("id").alias("id_b"), F.col("toks").alias("tb")), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("ta", "tb")).cast("bigint"))
        .withColumn("n_union", (F.col("na") + F.col("nb") - F.col("n_inter")).cast("bigint"))
    )
    return pairs.where(
        F.lit(den) * F.col("n_inter") >= F.lit(num) * F.col("n_union")
    ).select("id_a", "id_b", "n_inter", "n_union")


def repeated_ngram_spans(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact substring-level dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): find every k-token
    window whose exact text occurs MORE THAN ONCE in the corpus
    (within or across documents), keep the globally first occurrence,
    and return the NON-FIRST occurrences merged into maximal token
    spans — the table a pipeline feeds to span redaction
    (docrender.redact_spans) to cut boilerplate, licenses and repeated
    headers that document-level dedup never sees.

    Spec (deterministic, engine-replayable):
      - tokens = whitespace split; window i (0-based) covers tokens
        [i, i+k); its fingerprint is ``md5`` of the space-joined
        window text — exact equality, no hash-collision semantics to
        model (128-bit).
      - keeper per fingerprint = MIN (doc_id, pos) lexicographically;
        every other occurrence of a >1-occurrence fingerprint is
        duplicated.
      - duplicated windows merge per doc when they overlap or touch
        (next_pos <= prev_pos + k): output spans are maximal
        ``[start, end)`` token ranges.

    Returns ``(doc_id, start, end, n_windows)`` — ``end`` exclusive,
    ``n_windows`` = duplicated windows merged into the span.

    Plan: per-doc window fingerprints are ONE native
    transform/explode Generate (no Python, O(k) chars hashed per
    token); keeper + occurrence count ride ONE fp-partitioned window
    pair (row_number + count on the same sort — measured 1.5x faster
    than the agg + join-back formulation, which shuffled the windows
    table twice more); span merging is one per-doc sort window.
    Shuffle rows = windows (= tokens), slim (fp, doc, pos) — the
    100-TB cost is one tokens-sized shuffle + one doc-keyed shuffle
    of only the duplicated windows, the MinHash band scale class.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    nwin = F.size("_toks") - F.lit(k - 1)
    wins = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .where(nwin >= 1)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), nwin),
                    lambda i: F.struct(
                        (i - 1).cast("bigint").alias("pos"),
                        F.md5(
                            F.array_join(F.slice(F.col("_toks"), i, k), " ")
                        ).alias("fp"),
                    ),
                )
            ).alias("_w"),
        )
        .select("doc_id", F.col("_w.pos").alias("pos"), F.col("_w.fp").alias("fp"))
    )
    wf = Window.partitionBy("fp").orderBy("doc_id", "pos")
    dups = (
        wins.select(
            "doc_id",
            "pos",
            F.row_number().over(wf).alias("_rn"),
            F.count(F.lit(1)).over(
                Window.partitionBy("fp").rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ).alias("_n"),
        )
        .where((F.col("_n") > 1) & (F.col("_rn") > 1))
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = dups.select(
        "doc_id",
        "pos",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + F.lit(k)),
            1,
        )
        .otherwise(0)
        .alias("_new"),
    ).withColumn(
        "_island",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("doc_id", "_island").agg(
        F.min("pos").alias("start"),
        (F.max("pos") + F.lit(k)).alias("end"),
        F.count(F.lit(1)).alias("n_windows"),
    ).select("doc_id", "start", "end", "n_windows")


def containment_join(
    docs: DataFrame,
    threshold: tuple[int, int] = (8, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    max_token: int | None = None,
) -> DataFrame:
    """EXACT token-set CONTAINMENT self-join: all ORDERED pairs
    (id_a != id_b) with ``|A ∩ B| >= tau * |A|`` — the asymmetric
    sibling of :func:`set_similarity_join` and the right tool for
    quote/subset detection (a short doc whose tokens live inside a
    long one has tiny Jaccard but containment ~1 — symmetric measures
    never find it).

    ``threshold`` is the exact fraction (num, den); acceptance is the
    pure-int64 test ``den * inter >= num * na``.

    Plan (the SSJoin prefix discipline, asymmetric form):
      1-2. distinct (id, token) + global df; per-doc arrays in (df,
         token) rarity order — shared with the Jaccard join;
      3. the A side emits only its prefix of ``n - ceil(tau*n) + 1``
         rarest tokens (if |A∩B| >= ceil(tau*na), at least one common
         token sits in A's prefix — the one-sided prefix lemma: fewer
         than that many prefix tokens missing from B is impossible
         when the suffix alone is shorter than ceil(tau*na)); the B
         side must emit ALL its tokens (containment ignores |B|, so B
         gets no prefix) — the candidate cost is A-prefix x B-postings
         on shared tokens, capped by ``max_token`` on the B postings
         (documented recall contract, the LSH-cap semantics);
      4. token equi-join (id_a != id_b) + the necessary-size
         prefilter ``den * nb >= num * na`` (inter <= min(na, nb));
      5. verify with the exact native ``array_intersect`` on the two
         sorted arrays.

    Returns ``(id_a, id_b, n_inter, na, nb)`` — exact ints; id_a is
    the CONTAINED side.
    """
    num, den = threshold
    if not (0 < num <= den):
        raise ValueError(f"threshold must be a fraction in (0, 1], got {num}/{den}")
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .distinct()
    )
    df_t = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        toks.join(df_t, "tok")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks"),
        )
        .withColumn("n", F.size("toks"))
    )
    plen = (
        F.col("n")
        - F.floor((F.lit(num) * F.col("n") + F.lit(den - 1)) / F.lit(den))
        + 1
    )
    a = ordered.select(
        F.col("id").alias("id_a"),
        F.col("n").alias("na"),
        F.explode(F.slice("toks", 1, plen.cast("int"))).alias("tok"),
    )
    b = ordered.select(
        F.col("id").alias("id_b"),
        F.col("n").alias("nb"),
        F.explode("toks").alias("tok"),
    )
    b = _cap_hot_buckets(b, "tok", max_token)
    cand = (
        a.join(b, "tok")
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.lit(den) * F.col("nb") >= F.lit(num) * F.col("na"))
        )
        .groupBy("id_a", "id_b")
        .agg(F.first("na").alias("na"), F.first("nb").alias("nb"))
    )
    arrs = ordered.select("id", "toks")
    pairs = (
        cand.join(
            arrs.select(F.col("id").alias("id_a"), F.col("toks").alias("ta")),
            "id_a",
        )
        .join(
            arrs.select(F.col("id").alias("id_b"), F.col("toks").alias("tb")),
            "id_b",
        )
        .withColumn(
            "n_inter", F.size(F.array_intersect("ta", "tb")).cast("bigint")
        )
    )
    return pairs.where(
        F.lit(den) * F.col("n_inter") >= F.lit(num) * F.col("na")
    ).select(
        "id_a",
        "id_b",
        "n_inter",
        F.col("na").cast("bigint").alias("na"),
        F.col("nb").cast("bigint").alias("nb"),
    )


def group_minhash(
    docs: DataFrame,
    group_col: str,
    text_col: str = "text",
    shingle_k: int = 5,
) -> DataFrame:
    """MERGEABLE group-level MinHash sketch (r4): per group, the
    elementwise MIN of its documents' signatures — mathematically the
    signature of the UNION of the group's shingle sets, so pairwise
    group Jaccard ("how similar is domain A's content to domain B's",
    crawl-source overlap auditing) estimates from |sketch| ints per
    group with NO document rescans. Mergeable exactly like the KMV/HLL
    family: min() is associative/commutative, so shard sketches
    combine by another elementwise min.

    Spec: the same _N_PERM affine-permutation signatures as the LSH
    dedup family (one spec, shared constants); per-document signatures
    explode to (group, perm_idx, val) and ONE bounded hash aggregate
    (|groups| x _N_PERM keyspace — the sketch-family shuffle shape)
    takes the min; the sketch returns as a sorted-by-index array.

    Returns (group, sig array<bigint>, n_docs).
    """
    import pandas as pd

    sig_t = "array<bigint>"

    @F.pandas_udf(sig_t)
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            s = _minhash_sig(_shingle_hashes(t or "", shingle_k))
            out.append([int(x) for x in s.astype(np.int64)])
        return pd.Series(out)

    sigs = docs.select(
        F.col(group_col).alias("grp"), _sig(F.col(text_col)).alias("_sig")
    )
    exploded = sigs.select("grp", F.posexplode("_sig").alias("_i", "_v"))
    per = exploded.groupBy("grp", "_i").agg(F.min("_v").alias("_m"))
    counts = docs.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        per.groupBy("grp")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_i", "_m"))),
                lambda s: s["_m"],
            ).alias("sig")
        )
        .join(counts, "grp")
        .select(F.col("grp").alias(group_col), "sig", "n_docs")
    )


def group_minhash_similarity(sketches: DataFrame, group_col: str) -> DataFrame:
    """Pairwise estimated Jaccard between group sketches (r4): the
    fraction of agreeing signature components, exact integers
    (n_agree out of _N_PERM) plus one final division — compare
    crawl sources / domains / snapshots without touching documents.
    All pairs of the (small) sketch table: one self-join keyed
    nothing — |groups|^2/2 rows of array comparisons, the DIMENSION
    side (groups are few; the documents never rejoin).

    Returns (group_a, group_b, n_agree, n_perm, jaccard_est) with
    group_a < group_b.
    """
    a = sketches.select(
        F.col(group_col).alias("group_a"), F.col("sig").alias("_sa")
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"), F.col("sig").alias("_sb")
    )
    pairs = a.crossJoin(b).where(F.col("group_a") < F.col("group_b"))
    agree = F.size(
        F.filter(
            F.zip_with("_sa", "_sb", lambda x, y: x == y),
            lambda t: t,
        )
    )
    return pairs.select(
        "group_a",
        "group_b",
        agree.cast("bigint").alias("n_agree"),
        F.lit(_N_PERM).cast("int").alias("n_perm"),
        (agree.cast("double") / F.lit(float(_N_PERM))).alias("jaccard_est"),
    )
