"""Gzip member metadata probe, from RFC 1952.

Crawl corpora arrive as ``.gz`` members (WARC segments, JSONL shards,
logs); triage wants the embedded filename / mtime / original size
WITHOUT inflating gigabytes. The RFC 1952 header is flag-gated fields
after a 10-byte fixed header; the trailer's ISIZE is the uncompressed
length mod 2³² — exactly the cheap signals a shard planner needs
(ISIZE sizes the inflate buffer and flags truncated members when the
actual inflate disagrees).

The DECOMPRESS path intentionally delegates to stdlib ``zlib`` (the
container engine's one vendored codec everywhere) — re-implementing
DEFLATE would add risk, not coverage; the from-spec surface here is
the header/trailer parse stdlib's ``gzip`` module hides.

Reference parity note: the reference reads zip archives only
(`/root/reference/src/main.rs` stage 2); gzip members belong to the
extension ingestion surface.
"""

from __future__ import annotations

import struct

_FTEXT = 1
_FHCRC = 2
_FEXTRA = 4
_FNAME = 8
_FCOMMENT = 16


def probe_gzip(payload: bytes) -> dict:
    """Header + trailer metadata of the FIRST gzip member: compression
    method, mtime, optional embedded filename/comment, header-CRC
    presence, and the trailer's ISIZE (uncompressed size mod 2³² —
    exact for members under 4 GiB). No decompression."""
    if len(payload) < 18 or payload[:2] != b"\x1f\x8b":
        raise ValueError("not a gzip payload")
    method = payload[2]
    if method != 8:
        raise ValueError(f"unknown gzip compression method {method}")
    flags = payload[3]
    (mtime,) = struct.unpack("<I", payload[4:8])
    pos = 10
    if flags & _FEXTRA:
        if pos + 2 > len(payload):
            raise ValueError("truncated gzip FEXTRA")
        (xlen,) = struct.unpack("<H", payload[pos : pos + 2])
        pos += 2 + xlen
    name = None
    if flags & _FNAME:
        end = payload.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated gzip FNAME")
        name = payload[pos:end].decode("latin-1")
        pos = end + 1
    comment = None
    if flags & _FCOMMENT:
        end = payload.find(b"\x00", pos)
        if end < 0:
            raise ValueError("unterminated gzip FCOMMENT")
        comment = payload[pos:end].decode("latin-1")
        pos = end + 1
    if flags & _FHCRC:
        pos += 2
    if pos > len(payload) - 8:
        raise ValueError("gzip header runs past the trailer")
    crc32, isize = struct.unpack("<II", payload[-8:])
    return {
        "kind": "gzip",
        "mtime": int(mtime),
        "name": name,
        "comment": comment,
        "isize": int(isize),
        "crc32": int(crc32),
        "compressed_len": len(payload),
    }
