"""Pure-Python scalar replay of the content-defined chunking spec
(osm_pbf_spark/operators/cdc.py docstring) — used as the independent
oracle for q_cdc_chunks and the pytest.

DIFFERENT FORMULATION on purpose: where the engine kernel computes the
window hash as a vectorized convolution (sum of shifted gear values),
this replay uses the O(1) rolling recurrence

    h' = ((h << 1) + gear[new] - (gear[oldest] << W)) mod 2^32

(shift everything up one, add the entering character, remove the
contribution of the character that just left the W-window — it sits at
shift W after the doubling). Equality of the two formulations IS the
check.
"""

from __future__ import annotations

import hashlib

_GEAR = [
    int.from_bytes(hashlib.blake2b(bytes([b]), digest_size=4).digest(), "big")
    for b in range(256)
]
_M32 = (1 << 32) - 1


def boundaries(
    text: str, window: int = 16, mask: int = 0x3F, min_len: int = 32, max_len: int = 512
) -> list[int]:
    """Chunk end positions (exclusive, 1-based == char counts)."""
    n = len(text)
    if n == 0:
        return []
    g = [_GEAR[ord(c) & 0xFF] for c in text]
    h = 0
    cands = []
    for i in range(n):
        h = ((h << 1) + g[i]) & _M32
        if i - window >= 0:
            h = (h - ((g[i - window] << window) & _M32)) & _M32
        if (h & mask) == 0:
            cands.append(i + 1)
    out = []
    s = 0
    while s < n:
        cut = None
        for c in cands:
            if s + min_len <= c <= s + max_len:
                cut = c
                break
        if cut is None:
            cut = min(s + max_len, n)
        out.append(cut)
        cands = [c for c in cands if c > cut]
        s = cut
    return out


def chunks(text: str, **kw) -> list[tuple[int, int, int]]:
    """(chunk_idx, c_start, c_len) rows."""
    out = []
    s = 0
    for i, e in enumerate(boundaries(text, **kw)):
        out.append((i, s, e - s))
        s = e
    return out
