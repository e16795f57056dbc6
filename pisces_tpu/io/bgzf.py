"""BGZF block codec, pure-Python fallback.

The reference routes every BAM/gz byte through a native zlib wrapper
(src/lib/Common.IO/FileCompression.cs:10-35, BgzfCommon.cs). Here the
fallback uses CPython's zlib (C speed); the C++ extension in
pisces_tpu/io/_native provides the production streaming codec.
"""
from __future__ import annotations

import struct
import zlib
from typing import Iterator, List, Tuple

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def iter_blocks(data: bytes, start: int = 0) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (file_offset, block_length, inflated_bytes) per BGZF block,
    optionally starting at a block boundary `start` (e.g. from a .bai
    virtual offset's coffset)."""
    off = start
    n = len(data)
    while off < n:
        if data[off:off + 2] != b"\x1f\x8b":
            raise ValueError(f"bad gzip magic at offset {off}")
        xlen = struct.unpack_from("<H", data, off + 10)[0]
        extra = data[off + 12: off + 12 + xlen]
        bsize = None
        p = 0
        while p + 4 <= len(extra):
            si1, si2, slen = extra[p], extra[p + 1], struct.unpack_from("<H", extra, p + 2)[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from("<H", extra, p + 4)[0] + 1
                break
            p += 4 + slen
        if bsize is None:
            raise ValueError(f"missing BGZF BC subfield at offset {off}")
        cdata_start = off + 12 + xlen
        cdata_len = bsize - xlen - 19
        inflated = zlib.decompress(data[cdata_start:cdata_start + cdata_len], -15)
        yield off, bsize, inflated
        off += bsize


def decompress(data: bytes) -> bytes:
    """Inflate an entire BGZF byte string."""
    return b"".join(chunk for _, _, chunk in iter_blocks(data))


def decompress_with_index(data: bytes):
    """Inflate and also return (file_offset, uncompressed_offset) per block,
    enabling virtual-offset (coffset<<16|uoffset) resolution for .bai jumps."""
    chunks: List[bytes] = []
    file_offsets: List[int] = []
    u_offsets: List[int] = []
    upos = 0
    for off, _, inflated in iter_blocks(data):
        file_offsets.append(off)
        u_offsets.append(upos)
        chunks.append(inflated)
        upos += len(inflated)
    return b"".join(chunks), file_offsets, u_offsets


class BgzfWriter:
    """Streaming BGZF deflater exposing virtual offsets
    ((block file offset << 16) | offset within block) so callers can build
    a .bai while writing (the BamWriter+BamIndex coupling of the
    reference's Alignment.IO)."""

    def __init__(self, fileobj, level: int = 6):
        self._f = fileobj
        self._level = level
        self._buf = bytearray()
        self._file_off = 0

    def tell_virtual(self) -> int:
        return (self._file_off << 16) | len(self._buf)

    def _flush_block(self, chunk: bytes) -> None:
        co = zlib.compressobj(self._level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 26
        block = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
                 + struct.pack("<H", 6) + b"BC"
                 + struct.pack("<HH", 2, bsize - 1)
                 + cdata
                 + struct.pack("<II", zlib.crc32(chunk), len(chunk)))
        self._f.write(block)
        self._file_off += len(block)

    def write(self, data: bytes) -> None:
        self._buf.extend(data)
        while len(self._buf) >= 0xFF00:
            self._flush_block(bytes(self._buf[:0xFF00]))
            del self._buf[:0xFF00]

    def close(self) -> None:
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf.clear()
        self._f.write(BGZF_EOF)
        self._file_off += len(BGZF_EOF)


def compress_with_offsets(data: bytes, level: int = 6):
    """compress() plus the file offset of each 0xFF00-chunk block, so callers
    can derive virtual offsets analytically (pure-Python fallback for the
    native bgzf_compress_parallel)."""
    import numpy as np
    out = []
    offsets = [0]
    for i in range(0, len(data), 0xFF00):
        chunk = data[i:i + 0xFF00]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 26
        block = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
                 + struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1)
                 + cdata
                 + struct.pack("<II", zlib.crc32(chunk), len(chunk)))
        out.append(block)
        offsets.append(offsets[-1] + len(block))
    out.append(BGZF_EOF)
    return b"".join(out), np.array(offsets, dtype=np.int64)


def compress(data: bytes, level: int = 6) -> bytes:
    """Deflate into BGZF blocks (<=64KB payload each) + EOF marker."""
    out = []
    for i in range(0, len(data), 0xFF00):
        chunk = data[i:i + 0xFF00]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        cdata = co.compress(chunk) + co.flush()
        bsize = len(cdata) + 25 + 1  # header(12)+extra(6)+cdata+crc(4)+isize(4) = len+26
        block = (b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
                 + struct.pack("<H", 6) + b"BC" + struct.pack("<HH", 2, bsize - 1)
                 + cdata
                 + struct.pack("<II", zlib.crc32(chunk), len(chunk)))
        out.append(block)
    out.append(BGZF_EOF)
    return b"".join(out)
