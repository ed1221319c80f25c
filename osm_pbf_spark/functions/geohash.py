"""Native geohash encode (public spec: Niemeyer geohash — base32 of
MSB-first interleaved lon/lat bisection bits, lon first).

Instead of the textbook per-bit bisection loop, quantize each axis
ONCE (floor scale — the bisection interval mids are exact dyadic
multiples of 360/2^d, so direct quantization produces the same bits,
with the usual 1-expression fp contract shared by engine and oracle)
and interleave with the same bit-spread used by the Morton cells.
Everything is native Spark expressions — whole-stage codegen, no
Python — and the pure-Python oracle replay mirrors the identical
IEEE expression order.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cells import _quant_col, _spread_col

__all__ = ["BASE32", "geohash_col", "geohash_py"]

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"
MAX_PRECISION = 12  # 60 bits — the longest geohash that fits an int64


def geohash_col(lat_col: Column, lon_col: Column, precision: int = 8) -> Column:
    """Geohash string of ``precision`` chars from lat/lon columns."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in [1, {MAX_PRECISION}], got {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    x = _quant_col(lon_col, 180.0, 360.0, nlon)
    y = _quant_col(lat_col, 90.0, 180.0, nlat)
    if nbits % 2 == 0:  # even total: lon bits land on odd LSB positions
        g = F.shiftleft(_spread_col(x), 1).bitwiseOR(_spread_col(y))
    else:  # odd total: lon bits land on even LSB positions
        g = _spread_col(x).bitwiseOR(F.shiftleft(_spread_col(y), 1))
    alphabet = F.array(*[F.lit(c) for c in BASE32])
    chars = [
        F.element_at(
            alphabet,
            (F.shiftrightunsigned(g, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31)) + F.lit(1)).cast(
                "int"
            ),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_py(lat: float, lon: float, precision: int = 8) -> str:
    """Pure-Python replay of ``geohash_col`` — the SAME quantize
    expression order, used by tests and the driver VALUES oracle."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in [1, {MAX_PRECISION}], got {precision}")
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2

    def quant(v: float, offset: float, extent: float, level: int) -> int:
        n = 1 << level
        q = math.floor((v + offset) / extent * float(n))
        return min(max(q, 0), n - 1)

    x = quant(lon, 180.0, 360.0, nlon)
    y = quant(lat, 90.0, 180.0, nlat)
    g = 0
    if nbits % 2 == 0:
        for i in range(nlon):
            g |= ((x >> i) & 1) << (2 * i + 1)
        for i in range(nlat):
            g |= ((y >> i) & 1) << (2 * i)
    else:
        for i in range(nlon):
            g |= ((x >> i) & 1) << (2 * i)
        for i in range(nlat):
            g |= ((y >> i) & 1) << (2 * i + 1)
    return "".join(BASE32[(g >> (5 * (precision - 1 - k))) & 31] for k in range(precision))
