"""Content-defined chunking (SURVEY.md §2.4b P-family extension, r3).

``cdc_chunks`` splits each document into variable-size chunks whose
boundaries depend only on a sliding window of LOCAL content (gear-hash
CDC, the public FastCDC/rolling-Rabin family): insert or delete a
paragraph and only the chunks overlapping the edit change, so
chunk-level exact dedup (md5 groupBy on chunk hashes) catches shared
PASSAGES between documents that whole-doc dedup misses — the standard
sub-document dedup primitive for training corpora.

Boundary spec (deterministic, engine-free):

- gear table: ``GEAR[b] = blake2b(bytes([b]), digest_size=4)`` as a
  uint32, for b in 0..255 — a fixed public derivation, no RNG.
- window hash after character i (1-based):
      h_i = sum_{j=0..W-1} GEAR[cp_{i-j} & 0xFF] << j   (mod 2^32)
  i.e. h_i depends ONLY on the trailing W characters — no reset state,
  which is what makes the kernel a pure sliding convolution
  (vectorizable) instead of a sequential recurrence.
- candidate boundaries: positions i with (h_i & mask) == 0.
- greedy selection from each chunk start s: the smallest candidate c
  with s+min_len <= c <= s+max_len; if none, cut at min(s+max_len, n).
  The final chunk may be shorter than min_len.

The Spark plan is ONE Arrow-batched mapInPandas stage (per-DOC numpy
kernel — the documented sequential-per-group UDF case, like FFD/
Douglas-Peucker) emitting (doc_id, chunk_idx, c_start, c_len); chunk
content hashes are then computed NATIVELY with substring+md5 so the
DuckDB gate can recompute them independently from the raw table
(q_cdc_chunks: boundaries come from a scalar pure-Python replay that
uses a ring buffer instead of the convolution — a different
formulation of the same spec).

At 10^12 docs this is a shuffle-free map stage; the downstream
chunk-dedup groupBy is one narrow md5-keyed shuffle (same shape as
exact_dedup).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cdc_chunks", "GEAR", "cdc_boundaries_np"]

GEAR = np.array(
    [
        int.from_bytes(hashlib.blake2b(bytes([b]), digest_size=4).digest(), "big")
        for b in range(256)
    ],
    dtype=np.uint64,
)


def _greedy(cands: np.ndarray, n: int, min_len: int, max_len: int) -> list[int]:
    """Boundary positions (exclusive ends) from sorted candidates."""
    out: list[int] = []
    s = 0
    k = 0
    while s < n:
        lo, hi = s + min_len, s + max_len
        while k < len(cands) and cands[k] < lo:
            k += 1
        if k < len(cands) and cands[k] <= hi:
            cut = int(cands[k])
            k += 1
        else:
            cut = min(hi, n)
        out.append(cut)
        s = cut
    return out


def cdc_boundaries_np(text: str, window: int, mask: int, min_len: int, max_len: int) -> list[int]:
    """Vectorized window-hash + greedy selection for one document."""
    n = len(text)
    if n == 0:
        return []
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    g = GEAR[cp & 0xFF]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(window):
        if j >= n:
            break
        h[j:] += g[: n - j] << np.uint64(j)
    h &= np.uint64(0xFFFFFFFF)
    cands = np.nonzero((h & np.uint64(mask)) == 0)[0] + 1  # boundary AFTER char i
    return _greedy(cands, n, min_len, max_len)


def cdc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 16,
    mask: int = 0x3F,
    min_len: int = 32,
    max_len: int = 512,
) -> DataFrame:
    """(doc_id, chunk_idx, c_start, c_len) per content-defined chunk.
    Empty/null documents produce no rows. ``c_start`` is 0-based in
    CHARACTERS (so ``substring(text, c_start + 1, c_len)`` slices the
    chunk in Spark and ``substr`` does in any ANSI engine)."""
    if not (1 <= window <= 64):
        raise ValueError(f"window must be in [1, 64], got {window}")
    if not (0 < min_len <= max_len):
        raise ValueError("need 0 < min_len <= max_len")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, lens = [], [], [], []
            for did, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None:
                    continue
                ends = cdc_boundaries_np(str(text), window, mask, min_len, max_len)
                s = 0
                for i, e in enumerate(ends):
                    ids.append(did)
                    idxs.append(i)
                    starts.append(s)
                    lens.append(e - s)
                    s = e
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int32"),
                    "c_start": pd.Series(starts, dtype="int32"),
                    "c_len": pd.Series(lens, dtype="int32"),
                }
            )

    out_schema = f"{id_col} long, chunk_idx int, c_start int, c_len int"
    return docs.select(id_col, text_col).mapInPandas(gen, out_schema)
