"""Vector-tile payload encode (SURVEY.md §2.3 G-family, r3) — the last
stage of the tile pipeline: assign (G6) -> clip (G9) -> ENCODE.

``encode_tiles`` turns clipped per-tile segments into one binary
payload per tile, in a documented SUBSET of the Mapbox Vector Tile
idea (public spec): protobuf wire format, integer tile-local
coordinates, zigzag-delta command stream.

Payload layout (concatenation over features sorted by ascending id):

    feature := field 1 (varint)  feature id
               field 2 (bytes)   geometry
    geometry := varint(9)  zz(qx0) zz(qy0)      # MoveTo, count 1
                varint(10) zz(qx1-qx0) zz(qy1-qy0)  # LineTo, count 1

where ``q* = min(extent, floor(local * extent))`` quantizes the
tile-local [0,1] coordinate and ``zz`` is protobuf zigzag. Unlike full
MVT the cursor resets per feature and there are no layers/keys —
enough to round-trip geometry while keeping the byte stream
deterministic and replayable by the pure-Python oracle.

Plan shape: ONE groupBy(tile) shuffle of slim (id, 4 quantized ints)
rows, then an Arrow-batched ``applyInPandas`` that builds each tile's
byte stream (per-tile sequential encode is the documented UDF case —
same class as FFD bin packing). Quantization happens BEFORE the
shuffle in native expressions, so the shuffle carries ints, not
doubles, and the Python stage does no float math at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["encode_tiles"]

OUT_SCHEMA = T.StructType(
    [
        T.StructField("tile_z", T.IntegerType()),
        T.StructField("tile_x", T.LongType()),
        T.StructField("tile_y", T.LongType()),
        T.StructField("n_features", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _encode_group(pdf):
    import pandas as pd

    pdf = pdf.sort_values("id", kind="mergesort")
    payload = bytearray()
    for fid, x0, y0, x1, y1 in zip(
        pdf["id"], pdf["qx0"], pdf["qy0"], pdf["qx1"], pdf["qy1"]
    ):
        geom = (
            _varint(9)
            + _varint(_zz(int(x0)))
            + _varint(_zz(int(y0)))
            + _varint(10)
            + _varint(_zz(int(x1) - int(x0)))
            + _varint(_zz(int(y1) - int(y0)))
        )
        payload += b"\x08" + _varint(int(fid)) + b"\x12" + _varint(len(geom)) + geom
    return pd.DataFrame(
        {
            "tile_z": [int(pdf["tile_z"].iloc[0])],
            "tile_x": [int(pdf["tile_x"].iloc[0])],
            "tile_y": [int(pdf["tile_y"].iloc[0])],
            "n_features": [len(pdf)],
            "payload": [bytes(payload)],
        }
    )


def encode_tiles(
    clipped: DataFrame,
    extent: int = 4096,
    id_col: str = "event_id",
) -> DataFrame:
    """Clipped segments (``clip_lines_to_tiles`` output: tile_z/x/y +
    continuous tile-space cx0,cy0,cx1,cy1) -> one payload row per tile:
    ``(tile_z, tile_x, tile_y, n_features, payload)``.

    Feature ids must be unique per (segment, tile) — true by
    construction for supercover output. ``extent`` is the quantization
    grid (MVT convention: 4096).
    """
    if extent < 1:
        raise ValueError(f"extent must be >= 1, got {extent}")

    def _q(c, base):
        local = c - base.cast("double")
        return F.least(
            F.lit(extent).cast("long"),
            F.greatest(
                F.lit(0).cast("long"),
                F.floor(local * F.lit(float(extent))).cast("long"),
            ),
        )

    slim = clipped.select(
        F.col("tile_z"),
        F.col("tile_x"),
        F.col("tile_y"),
        F.col(id_col).alias("id"),
        _q(F.col("cx0"), F.col("tile_x")).alias("qx0"),
        _q(F.col("cy0"), F.col("tile_y")).alias("qy0"),
        _q(F.col("cx1"), F.col("tile_x")).alias("qx1"),
        _q(F.col("cy1"), F.col("tile_y")).alias("qy1"),
    )
    return slim.groupBy("tile_z", "tile_x", "tile_y").applyInPandas(
        _encode_group, OUT_SCHEMA
    )
