"""Document render (SURVEY.md §2.2 D10): entity -> (doc_id, spans).

Renders decoded OSM entities into the interleaved text+media document
shape that is the engine's primary table (BASELINE.json:16):

    doc_id: string        = "<kind>/<id>"
    spans:  array<struct<kind, text, media_ref, offset:int32>>

Deterministic render spec (mirrored exactly by tests/oracle_render.py —
the per-row span-sequence-equality invariant surface):

  1. span ('text',      "<kind> <id>",  '',        0)
  2. per tag, in decoded (stringtable) order:
        ('tag-key',   k, '', off) then ('tag-value', v, '', off)
  3. geometry/media spans (text='', offset = current offset):
        node     -> ('geom',  '', "geom:point:<lat %.7f>,<lon %.7f>")
        way      -> ('geom',  '', "geom:way:<first_ref>..<last_ref>:<n>")
        relation -> one ('media', '', "member:<type>/<ref>:<role>") per member

``offset`` is the running character offset of the space-joined text
stream: each text-bearing span advances it by len(text)+1; media spans
advance 0.

Implementation: one mapInArrow kernel, flat-array construction — span
offsets, interleaved tag positions and segmented prefix sums are all
numpy; no per-row Python loops (BASELINE.json:16).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOC_ARROW_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("kind", pa.string()),
        ("lat", pa.float64()),
        ("lon", pa.float64()),
    ]
)

DOC_SPARK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType()),
                        T.StructField("text", T.StringType()),
                        T.StructField("media_ref", T.StringType()),
                        T.StructField("offset", T.IntegerType()),
                    ]
                )
            ),
        ),
        T.StructField("kind", T.StringType()),
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType()),
    ]
)


def _flat_strlen(arr: np.ndarray) -> np.ndarray:
    if len(arr) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.char.str_len(arr.astype(str)).astype(np.int64)


def _render_batch(batch: pa.RecordBatch) -> pa.RecordBatch:
    n = batch.num_rows
    kind = np.asarray(batch.column("kind").to_pylist(), dtype=object)
    ids = batch.column("id").to_numpy(zero_copy_only=False)
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)

    tags = batch.column("tags")
    if isinstance(tags, pa.ChunkedArray):
        tags = tags.combine_chunks()
    m_off = tags.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # MapArray .keys/.items are UNsliced child arrays; align them to the
    # logical offsets window explicitly
    lo, hi = int(m_off[0]), int(m_off[-1])
    tag_keys = np.asarray(tags.keys.slice(lo, hi - lo).to_pylist(), dtype=object)
    tag_vals = np.asarray(tags.items.slice(lo, hi - lo).to_pylist(), dtype=object)
    tc = np.diff(m_off)

    refs = batch.column("refs")
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    members = batch.column("members")
    if isinstance(members, pa.ChunkedArray):
        members = members.combine_chunks()

    is_node = kind == "node"
    is_way = kind == "way"
    is_rel = kind == "relation"

    # geometry span counts per doc
    mem_counts = np.zeros(n, dtype=np.int64)
    if is_rel.any():
        mlens = pc.list_value_length(members).to_numpy(zero_copy_only=False)
        mem_counts[is_rel] = np.nan_to_num(mlens[is_rel]).astype(np.int64)
    gc = np.where(is_node | is_way, 1, mem_counts)

    spans_per_doc = 1 + 2 * tc + gc
    span_offsets = np.concatenate([[0], np.cumsum(spans_per_doc)]).astype(np.int64)
    S = int(span_offsets[-1])

    out_kind = np.empty(S, dtype=object)
    out_text = np.empty(S, dtype=object)
    out_media = np.empty(S, dtype=object)
    out_text[:] = ""
    out_media[:] = ""

    # 1) header text spans
    hdr_pos = span_offsets[:-1]
    ids_str = ids.astype(np.int64).astype(str).astype(object)
    out_kind[hdr_pos] = "text"
    out_text[hdr_pos] = kind + np.full(n, " ", dtype=object) + ids_str

    # 2) tag spans, interleaved k/v — positions fully vectorized
    total_tags = int(tc.sum())
    if total_tags:
        doc_of_tag = np.repeat(np.arange(n), tc)
        # rank of each tag within its doc
        tag_rank = np.arange(total_tags) - np.repeat(np.cumsum(np.concatenate([[0], tc[:-1]])), tc)
        key_pos = span_offsets[doc_of_tag] + 1 + 2 * tag_rank
        val_pos = key_pos + 1
        out_kind[key_pos] = "tag-key"
        out_text[key_pos] = tag_keys
        out_kind[val_pos] = "tag-value"
        out_text[val_pos] = tag_vals

    # 3) geometry/media spans
    geom_base = span_offsets[:-1] + 1 + 2 * tc
    if is_node.any():
        pos = geom_base[is_node]
        out_kind[pos] = "geom"
        lat_s = np.char.mod("%.7f", lat[is_node]).astype(object)
        lon_s = np.char.mod("%.7f", lon[is_node]).astype(object)
        out_media[pos] = np.full(pos.shape, "geom:point:", dtype=object) + lat_s + "," + lon_s
    if is_way.any():
        pos = geom_base[is_way]
        out_kind[pos] = "geom"
        r_off = refs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        r_vals = refs.values.to_numpy(zero_copy_only=False).astype(np.int64)
        w_start = r_off[:-1][is_way]
        w_end = r_off[1:][is_way]
        f_s = r_vals[w_start].astype(str).astype(object)
        l_s = r_vals[w_end - 1].astype(str).astype(object)
        n_s = (w_end - w_start).astype(str).astype(object)
        out_media[pos] = (
            np.full(pos.shape, "geom:way:", dtype=object) + f_s + ".." + l_s + ":" + n_s
        )
    if is_rel.any() and mem_counts.sum():
        doc_of_mem = np.repeat(np.arange(n), mem_counts)
        mem_rank = np.arange(int(mem_counts.sum())) - np.repeat(
            np.cumsum(np.concatenate([[0], mem_counts[:-1]])), mem_counts
        )
        pos = geom_base[doc_of_mem] + mem_rank
        flat_members = members.flatten()
        roles = np.asarray(flat_members.field("role").to_pylist(), dtype=object)
        mrefs = flat_members.field("ref").to_numpy(zero_copy_only=False)
        mtypes = np.asarray(flat_members.field("type").to_pylist(), dtype=object)
        # flatten() of the full column includes members of non-relation
        # rows too (there are none — refs/members are null there), and
        # list offsets align with mem_counts by construction
        out_kind[pos] = "media"
        out_media[pos] = (
            np.full(pos.shape, "member:", dtype=object)
            + mtypes
            + "/"
            + mrefs.astype(np.int64).astype(str).astype(object)
            + ":"
            + roles
        )

    # offsets: segmented exclusive prefix sum of (len(text)+1 for
    # text-bearing spans, 0 for media spans)
    is_text_span = (out_kind == "text") | (out_kind == "tag-key") | (out_kind == "tag-value")
    advance = np.where(is_text_span, _flat_strlen(out_text) + 1, 0).astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(advance)])
    doc_of_span = np.repeat(np.arange(n), spans_per_doc)
    out_offset = (cum[:-1] - cum[span_offsets[:-1]][doc_of_span]).astype(np.int32)

    spans_struct = pa.StructArray.from_arrays(
        [
            pa.array(out_kind, type=pa.string()),
            pa.array(out_text, type=pa.string()),
            pa.array(out_media, type=pa.string()),
            pa.array(out_offset, type=pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(span_offsets, type=pa.int32()), spans_struct)
    doc_id = pa.array(kind + np.full(n, "/", dtype=object) + ids_str, type=pa.string())
    return pa.record_batch(
        [doc_id, spans, pa.array(kind, type=pa.string()),
         batch.column("lat"), batch.column("lon")],
        schema=DOC_ARROW_SCHEMA,
    )


def _render_iter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    for b in batches:
        if b.num_rows:
            yield _render_batch(b)


def render_documents(entities: DataFrame) -> DataFrame:
    """Entities (unified schema) -> interleaved-span documents."""
    cols = ["kind", "id", "lat", "lon", "tags", "refs", "members"]
    return entities.select(*cols).mapInArrow(_render_iter, DOC_SPARK_SCHEMA)


def chunk_spans(docs: DataFrame, max_chars: int) -> DataFrame:
    """Training-window chunking of interleaved documents: split each
    document's span sequence into chunks of at most ``max_chars`` text
    characters, NEVER splitting inside a span, media spans riding with
    the text position they interleave at.

    Chunk rule (deterministic, replayable in ANSI SQL): a span whose
    running text offset (the span struct's own ``offset`` field — the
    characters of the joined text stream BEFORE it) is in
    ``[i*max_chars, (i+1)*max_chars)`` belongs to chunk ``i``. Zero-width
    media spans land in the chunk of the text position they sit at.

    Returns one row per (doc_id, chunk_idx):
      (doc_id, chunk_idx, n_spans, n_text_spans, n_media, chars)
    where ``chars`` sums len(text) of the chunk's text-bearing spans.

    Plan: a native posexplode Generate + one hash aggregate on
    (doc_id, chunk) — no window, no Python; at 10^12 docs this is a
    map-side-combining aggregate whose key count ~= output rows.
    """
    if max_chars <= 0:
        raise ValueError("max_chars must be positive")
    s = docs.select("doc_id", F.posexplode("spans").alias("span_pos", "s")).select(
        "doc_id",
        # floor, not CAST(... AS BIGINT): Spark's cast truncates but
        # DuckDB's rounds — floor is the one spelling both agree on
        F.floor(F.col("s.offset") / F.lit(int(max_chars))).alias("chunk_idx"),
        F.col("s.kind").alias("kind"),
        F.length("s.text").alias("text_len"),
    )
    return s.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.when(F.col("text_len") > 0, 1).otherwise(0)).alias("n_text_spans"),
        F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).alias("n_media"),
        F.sum("text_len").alias("chars"),
    )


def redact_spans(docs: DataFrame, pattern: str, replacement: str) -> DataFrame:
    """PII-style redaction over interleaved span documents: apply
    ``regexp_replace(pattern -> replacement)`` to every span's text and
    RECOMPUTE the running offsets (exclusive prefix sum of
    ``len(text) + 1`` — the space-joined-stream convention), so media
    spans keep riding their interleave position while the text around
    them shrinks or grows. Media spans carry empty text and pass
    through untouched except for their recomputed offset.

    Keep ``pattern`` in the regex subset where Java regex and RE2 agree
    (char classes, +, *, alternation — no lookbehind) if the output
    must be engine-replayable.

    Plan: entirely per-row and native — one ``transform`` for the
    redaction and one ``aggregate`` fold to rebuild the span array with
    fresh offsets; no shuffle, no Python, whole-stage codegen. The fold
    concatenates one struct per step (O(n_spans^2) pointer copies per
    doc — fine for the 10-10^3-span documents this table holds; a doc
    with 10^5+ spans should go through the exploded/window path
    instead).
    """
    out_t = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    red = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s.kind.alias("kind"),
            F.regexp_replace(s.text, pattern, replacement).alias("text"),
            s.media_ref.alias("media_ref"),
        ),
    )
    rebuilt = F.aggregate(
        red,
        F.struct(
            F.expr(f"CAST(array() AS {out_t})").alias("arr"),
            F.lit(0).cast("int").alias("off"),
        ),
        lambda acc, s: F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        s.kind.alias("kind"),
                        s.text.alias("text"),
                        s.media_ref.alias("media_ref"),
                        acc["off"].alias("offset"),
                    )
                ),
            ).alias("arr"),
            (acc["off"] + F.length(s.text) + F.lit(1)).cast("int").alias("off"),
        ),
        lambda acc: acc["arr"],
    )
    other = [c for c in docs.columns if c not in ("doc_id", "spans")]
    return docs.select("doc_id", rebuilt.alias("spans"), *other)


def validate_spans(docs: DataFrame) -> DataFrame:
    """Per-document validation of the interleaved-span invariant — the
    north-star table's per-row contract (span-sequence equality: kind,
    text, media_ref, order) expressed as a first-class DQ operator,
    so a 100-TB table can be audited without rendering anything:

    - ``offsets_ok``: every span's ``offset`` equals the running
      length of the space-joined text stream before it (each
      text-bearing span contributes len(text)+1; zero-width spans
      contribute 0) — replayed with ONE native ``aggregate`` fold over
      the array, no explode, no shuffle;
    - ``width_ok``: a span carries text OR a media_ref, never both
      (media/geometry spans are zero-width by construction).

    Returns (doc_id, n_spans, n_text, text_chars, offsets_ok,
    width_ok); a clean table has bool_and(offsets_ok AND width_ok)
    TRUE. Pure codegen map stage — at 10^12 docs this is a scan.
    """
    spans = F.col("spans")
    zero = F.struct(
        F.lit(0).cast("int").alias("pos"), F.lit(True).alias("ok")
    )
    step = lambda acc, s: F.struct(  # noqa: E731
        (
            acc["pos"]
            + F.when(F.length(s["text"]) > 0, F.length(s["text"]) + 1).otherwise(
                F.lit(0)
            ).cast("int")
        ).cast("int").alias("pos"),
        (acc["ok"] & (s["offset"] == acc["pos"])).alias("ok"),
    )
    fold = F.aggregate(spans, zero, step)
    return docs.select(
        "doc_id",
        F.size(spans).cast("bigint").alias("n_spans"),
        F.size(F.filter(spans, lambda s: F.length(s["text"]) > 0))
        .cast("bigint")
        .alias("n_text"),
        F.aggregate(
            spans,
            F.lit(0).cast("bigint"),
            lambda acc, s: acc + F.length(s["text"]).cast("bigint"),
        ).alias("text_chars"),
        fold["ok"].alias("offsets_ok"),
        F.forall(
            spans,
            lambda s: (F.length(s["text"]) == 0) | (s["media_ref"] == F.lit("")),
        ).alias("width_ok"),
    )


def assemble_spans(
    pieces: DataFrame,
    doc_col: str = "doc_id",
    seq_col: str = "seq",
    kind_col: str = "kind",
    text_col: str = "text",
    media_col: str = "media_ref",
) -> DataFrame:
    """CONSTRUCT the interleaved-span table from flat pieces — the
    inverse of ``validate_spans`` and the input_hint schema's builder:
    per document, order pieces by ``seq`` and emit
    ``spans: array<struct<kind, text, media_ref, offset>>`` with the
    spec offsets (offset_k = running sum over PRIOR spans of
    len(text)+1 for text-bearing spans, 0 for zero-width ones), so
    ``validate_spans(assemble_spans(x))`` is all-green by
    construction (pinned by test).

    A piece carrying BOTH text and a media_ref violates the width
    invariant and raises loudly (guard in a WHERE); media/geometry
    pieces must have empty/NULL text. NULL text and NULL media_ref
    normalize to '' — the table convention (validate_spans' width
    check compares media_ref to '', never IS NULL).

    Plan: ONE window (the running offset) + ONE same-key aggregate —
    the groupBy reuses the window's hash partitioning, so the whole
    op is a single Exchange (plan-pinned); span order inside the
    array is restored with sort_array over (seq, span) structs, never
    by collect_list's arrival order.
    """
    from pyspark.sql import Window

    txt = F.coalesce(F.col(text_col), F.lit(""))
    med = F.col(media_col)
    guarded = pieces.where(
        F.when(
            ~((F.length(txt) > 0) & F.coalesce(F.length(med) > 0, F.lit(False))),
            F.lit(True),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("assemble_spans: piece with BOTH text and "
                          "media_ref (doc "),
                    F.col(doc_col).cast("string"),
                    F.lit(", seq "),
                    F.col(seq_col).cast("string"),
                    F.lit(")"),
                )
            )
        )
    )
    w = (
        Window.partitionBy(doc_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = F.when(F.length(txt) > 0, F.length(txt) + 1).otherwise(F.lit(0))
    rows = guarded.select(
        F.col(doc_col).alias("doc_id"),
        F.struct(
            F.col(seq_col).alias("seq"),
            F.struct(
                F.col(kind_col).alias("kind"),
                txt.alias("text"),
                F.coalesce(med, F.lit("")).alias("media_ref"),
                F.coalesce(F.sum(contrib).over(w), F.lit(0))
                .cast("int")
                .alias("offset"),
            ).alias("s"),
        ).alias("_ss"),
    )
    return rows.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list("_ss")), lambda x: x["s"]
        ).alias("spans")
    )
