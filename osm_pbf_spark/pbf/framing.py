"""PBF file framing: the splittable blob scan (SURVEY.md §2.1 S1-S3).

The reference reads blobs sequentially with fread (single process).
Distributed replacement: a driver-side *light* scan reads only the
4-byte lengths + BlobHeaders and seeks past payloads — O(#blobs) tiny
reads — producing a blob manifest (seq, offset, size, type). Executors
then re-open the file and read only their assigned byte ranges. That
turns one unsplittable file into an arbitrarily parallel scan, which is
what lets the decode scale to a 1000-executor cluster.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

from .proto import fields

MAX_BLOBHEADER_SIZE = 64 * 1024
MAX_BLOB_SIZE = 32 * 1024 * 1024


@dataclass(frozen=True)
class BlobRef:
    seq: int
    blob_type: str  # "OSMHeader" | "OSMData"
    offset: int  # file offset of the Blob payload itself
    size: int  # Blob payload size (datasize)


def scan_blobs(path: str) -> list[BlobRef]:
    """Light scan: headers only, payloads skipped via seek."""
    refs: list[BlobRef] = []
    with open(path, "rb") as f:
        f.seek(0, 2)
        file_size = f.tell()
        f.seek(0)
        seq = 0
        while True:
            lenbuf = f.read(4)
            if not lenbuf:
                break
            if len(lenbuf) < 4:
                raise ValueError(f"truncated file: {len(lenbuf)}-byte length prefix at EOF")
            (hlen,) = struct.unpack(">i", lenbuf)
            if not 0 < hlen <= MAX_BLOBHEADER_SIZE:
                raise ValueError(f"BlobHeader length {hlen} out of range")
            hbuf = f.read(hlen)
            if len(hbuf) < hlen:
                raise ValueError("truncated BlobHeader at EOF")
            hf = fields(hbuf)
            blob_type = bytes(hf[1][0]).decode("utf-8")
            datasize = int(hf[3][0])
            if not 0 <= datasize <= MAX_BLOB_SIZE:
                raise ValueError(f"Blob datasize {datasize} out of range")
            if f.tell() + datasize > file_size:
                raise ValueError("truncated Blob payload at EOF")
            refs.append(BlobRef(seq, blob_type, f.tell(), datasize))
            f.seek(datasize, 1)
            seq += 1
    return refs


def read_blob_payload(path_or_file, ref_offset: int, ref_size: int) -> bytes:
    """Read + decompress one Blob given its manifest entry (S2/S3)."""
    if hasattr(path_or_file, "seek"):
        f = path_or_file
        f.seek(ref_offset)
        blob = f.read(ref_size)
    else:
        with open(path_or_file, "rb") as f:
            f.seek(ref_offset)
            blob = f.read(ref_size)
    bf = fields(blob)
    if 3 in bf:  # zlib_data (the common case)
        raw = zlib.decompress(bytes(bf[3][0]))
        if 2 in bf and len(raw) != int(bf[2][0]):
            raise ValueError("inflated size != raw_size")
    elif 1 in bf:  # raw passthrough
        raw = bytes(bf[1][0])
        if 2 in bf and len(raw) != int(bf[2][0]):
            raise ValueError("raw length != raw_size")
    elif 4 in bf:  # lzma_data (spec-optional, rare; stdlib decode)
        import lzma

        raw = lzma.decompress(bytes(bf[4][0]))
        if 2 in bf and len(raw) != int(bf[2][0]):
            raise ValueError("inflated size != raw_size")
    else:
        raise ValueError("Blob has no payload field")
    if len(raw) > MAX_BLOB_SIZE:
        raise ValueError("uncompressed blob exceeds 32 MiB limit")
    return raw
