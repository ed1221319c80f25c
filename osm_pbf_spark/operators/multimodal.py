"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels. The actual codec libraries are NOT installed
in this environment, so the decode step is gated behind an import-try
and falls back to a clearly-marked DETERMINISTIC FAKE (hash-derived
"pixels") — the Spark-side plumbing (schema, batch shape, partitioning,
UDF signatures) is real and tested; swap ``_decode_image_real`` in when
PIL/ffmpeg exist.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoder", T.StringType()),  # 'real' | 'fake'
    ]
)

_FEAT_DIM = 16


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode path — requires PIL, absent in this sandbox."""
    from PIL import Image  # noqa: F401  (import-try gate)
    import io

    img = Image.open(io.BytesIO(payload))
    return np.asarray(img, dtype=np.float64)


def _decode_fake(payload: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode: 8x8 'pixels' derived from blake2b of
    the payload. NOT a real decoder — a stand-in so the distributed
    plumbing is exercised end-to-end (see module docstring)."""
    h = hashlib.blake2b(payload or b"", digest_size=64).digest()
    return (np.frombuffer(h, dtype=np.uint8).astype(np.float64) / 255.0).reshape(8, 8)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    try:
        import PIL  # noqa: F401

        decode, decoder_name = _decode_image_real, "real"
    except ImportError:
        decode, decoder_name = _decode_fake, "fake"
    for pdf in batches:
        if not len(pdf):
            continue
        means, stds, feats = [], [], []
        for payload in pdf["payload"]:
            px = decode(bytes(payload) if payload is not None else b"")
            means.append(float(px.mean()))
            stds.append(float(px.std()))
            flat = px.ravel()
            # fixed-dim pooled feature: mean over equal chunks
            chunks = np.array_split(flat, _FEAT_DIM)
            feats.append(np.array([c.mean() for c in chunks], dtype=np.float32).tolist())
        yield pd.DataFrame(
            {
                "media_ref": pdf["media_ref"],
                "modality": pdf["modality"],
                "feat_mean": means,
                "feat_std": stds,
                "feature": feats,
                "decoder": decoder_name,
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-item feature rows (Arrow-batched kernels)."""
    return media.select("media_ref", "modality", "payload").mapInPandas(
        _extract_features, FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per (media, frame_ts).

    The decode itself is stubbed (no ffmpeg here); the row explosion,
    partitioning, and schema are the real distributed shape.
    """
    return media.filter(F.col("modality") == "video").select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media_table(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media rows for tests/benches (seed-free:
    payload = blake2b(i))."""
    rows = []
    for i in range(n):
        payload = hashlib.blake2b(i.to_bytes(4, "little"), digest_size=32).digest()
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (f"m{i}", modality, bytearray(payload), 8, 8, 4000 if modality == "video" else 0)
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("px", T.ArrayType(T.IntegerType())),
    ]
)


def media_pixels(media: DataFrame) -> DataFrame:
    """Decode payloads to a 64-value integer pixel vector (the decode
    boundary for perceptual hashing): real path resizes to 8x8
    grayscale when PIL exists; the deterministic fake emits the raw
    blake2b bytes (module docstring). One Arrow-batched stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401

            def decode(payload: bytes) -> np.ndarray:
                px = _decode_image_real(payload)
                if px.ndim == 3:
                    px = px.mean(axis=2)
                from PIL import Image

                im = Image.fromarray(px.astype(np.uint8)).resize((8, 8))
                return np.asarray(im, dtype=np.int64).ravel()
        except ImportError:

            def decode(payload: bytes) -> np.ndarray:
                h = hashlib.blake2b(payload or b"", digest_size=64).digest()
                return np.frombuffer(h, dtype=np.uint8).astype(np.int64)

        for pdf in batches:
            if not len(pdf):
                continue
            px = [
                decode(bytes(p) if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "px": px})

    return media.select("media_ref", "payload").mapInPandas(gen, PIXELS_SCHEMA)


def dhash64_col(px_col) -> F.Column:
    """NATIVE 64-bit difference hash (the classic dHash perceptual
    hash): bit i = 1 iff px[i] > px[(i+1) mod 64], OR-folded with
    shifts — one whole-stage-codegen projection, no Python. Near-
    duplicate images differ in few gradient signs, so hamming distance
    on this hash is the standard image-dedup metric."""
    out = F.lit(0).cast("long")
    for i in range(64):
        cond = (
            F.element_at(px_col, i + 1) > F.element_at(px_col, ((i + 1) % 64) + 1)
        ).cast("long")
        out = out.bitwiseOR(F.shiftleft(cond, i))
    return out


def near_dup_media_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_ref",
    hash_col: str = "phash",
) -> DataFrame:
    """All media pairs with dHash hamming distance <= max_hamming —
    perceptual near-duplicate detection (re-encodes, small edits).

    Candidate scheme: the 4x16-bit pigeonhole (exact recall for
    hamming <= 3: at least one quarter is untouched), one equi-join
    shuffle on the band key, native popcount verify
    ``bit_count(a XOR b)``. Same scale posture as dedup.simhash_pairs
    'quarters' — beyond ~10^8 distinct images switch to a 2^32-keyspace
    multi-index (halves32) exactly as documented there.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError("pigeonhole recall holds for max_hamming in [0, 3]")
    h = hashed.select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
    bands = h.select(
        "id",
        "h",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("h"), 16 * b).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for b in range(4)
                ]
            )
        ).alias("band", "key"),
    )
    a = bands.select(
        F.col("id").alias("id_a"), F.col("h").alias("ha"), "band", "key"
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("h").alias("hb"), "band", "key"
    )
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "hb")
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.where(ham <= max_hamming).select(
        "id_a", "id_b", ham.alias("hamming")
    )


def audio_frame_plan(
    clips: DataFrame,
    frame_ms: int = 400,
    hop_ms: int = 160,
    id_col: str = "media_ref",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Overlapping analysis-window PLAN (the STFT/spectrogram shape):
    one row per (clip, frame_idx) with [start_ms, end_ms) where frames
    start at hop multiples and n_frames = 1 + (dur - frame) div hop;
    clips shorter than one frame emit nothing. Like
    :func:`frame_sample_plan` the decode is stubbed — the row
    explosion (one native sequence Generate), schema, and partitioning
    are the real distributed shape the audio featurizer plugs into.
    """
    if frame_ms < 1 or hop_ms < 1:
        raise ValueError(f"frame_ms/hop_ms must be >= 1, got {frame_ms}/{hop_ms}")
    dur = F.col(duration_col)
    n = ((dur - F.lit(frame_ms)) / F.lit(hop_ms)).cast("long") + F.lit(1)
    out = (
        clips.where(dur >= frame_ms)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0).cast("long"), n - 1)).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            (F.col("frame_idx") * hop_ms).alias("start_ms"),
            (F.col("frame_idx") * hop_ms + frame_ms).alias("end_ms"),
        )
    )
    return out


def image_patch_plan(media: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch-token PLAN (P10/P10b's image sibling): one row
    per (image, patch) over the non-overlapping ``patch``x``patch``
    grid — the token layout a vision encoder consumes. Edge remainders
    are DROPPED (ViT requires divisible inputs; resize upstream), and
    images smaller than one patch emit no rows.

        patch_id  = row-major token index (py * n_cols + px)
        y0, x0    = the patch's top-left pixel offset

    Like frame_sample_plan / audio_frame_plan, the pixel decode is
    stubbed behind the media_pixels boundary; the row explosion is one
    native sequence-cross Generate — pure codegen, map-only, linear.
    """
    if patch < 1:
        raise ValueError(f"patch must be >= 1, got {patch}")
    img = media.filter(F.col("modality") == "image").select(
        "media_ref",
        F.expr(f"height div {int(patch)}").alias("_ny"),
        F.expr(f"width div {int(patch)}").alias("_nx"),
    )
    g = img.where((F.col("_ny") > 0) & (F.col("_nx") > 0)).select(
        "media_ref",
        "_nx",
        F.explode(F.sequence(F.lit(0), F.col("_ny") - 1)).alias("py"),
    )
    g = g.select(
        "media_ref",
        "py",
        "_nx",
        F.explode(F.sequence(F.lit(0), F.col("_nx") - 1)).alias("px"),
    )
    return g.select(
        "media_ref",
        (F.col("py") * F.col("_nx") + F.col("px")).alias("patch_id"),
        "py",
        "px",
        (F.col("py") * F.lit(int(patch))).alias("y0"),
        (F.col("px") * F.lit(int(patch))).alias("x0"),
    )


# magic-byte signatures (hex prefix -> type); longest match wins.
# Public file signatures: PNG/JPEG/GIF/PDF/ZIP/RIFF-WAV/RIFF-WEBP/
# MP4(ftyp at offset 4)/GZIP.
MEDIA_MAGIC: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "png"),
    ("FFD8FF", "jpeg"),
    ("474946383761", "gif"),
    ("474946383961", "gif"),
    ("25504446", "pdf"),
    ("504B0304", "zip"),
    ("1F8B", "gzip"),
]


def sniff_media_type(
    media: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """Magic-byte file-type detection over an opaque binary column —
    the triage every multimodal crawl runs before routing blobs to
    decoders (mislabeled extensions are the norm in web data; the
    bytes don't lie). Pure metadata-free sniffing: the hex prefix of
    the payload is matched against the public signature table
    (PNG/JPEG/GIF/PDF/ZIP/GZIP, plus the RIFF and ftyp CONTAINER
    forms, which need an inner tag at a fixed offset).

    Deterministic spec: longest-prefix match over MEDIA_MAGIC, then
    the two container rules — RIFF....WAVE -> wav, RIFF....WEBP ->
    webp, bytes 5-8 == 'ftyp' -> mp4 — else 'unknown'. NULL or empty
    payloads -> 'unknown'.

    Returns the input plus ``media_type:string``.

    Plan: ONE native projection (hex + substring + CASE chain),
    map-only, zero shuffle, whole-stage codegen — at 100 TB this runs
    at scan speed, reading only the first 16 bytes' worth of each
    blob column value.
    """
    hx = F.upper(F.hex(F.substring(F.col(payload_col), 1, 16)))
    expr = None
    for sig, name in MEDIA_MAGIC:
        cond = F.substring(hx, 1, len(sig)) == F.lit(sig)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    riff = F.substring(hx, 1, 8) == F.lit("52494646")
    expr = expr.when(riff & (F.substring(hx, 17, 8) == F.lit("57415645")), F.lit("wav"))
    expr = expr.when(riff & (F.substring(hx, 17, 8) == F.lit("57454250")), F.lit("webp"))
    expr = expr.when(F.substring(hx, 9, 8) == F.lit("66747970"), F.lit("mp4"))
    return media.withColumn(
        "media_type",
        F.when(F.col(payload_col).isNull(), F.lit("unknown")).otherwise(
            F.coalesce(expr, F.lit("unknown"))
        ),
    )
