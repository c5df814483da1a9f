"""ISO-BMFF (MP4/MOV) container probe — pure ``struct``, no codec.

Video corpus management needs the container METADATA long before (and
usually instead of) pixel decode: filter by duration, resolution,
codec, and track layout across 100 TB of clips, then send the
survivors to a real decoder elsewhere. That metadata lives in plain
box structures (ftyp/moov/mvhd/trak/tkhd/hdlr/stsd) that need no
codec library — only H.264/AAC PAYLOAD decode does, and that stays
behind ``operators/multimodal._decode_stub``.

:func:`probe_mp4` walks the box tree (32- and 64-bit sizes, nested
containers) and returns brand, movie duration (mvhd v0/v1), and
per-track handler / dimensions / sample-entry fourcc. Malformed boxes
raise ``ValueError`` — one poison row per payload under
``media_probe``'s distributed contract.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"box {btype!r} overruns its container")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]):
    """All (start, end) payload ranges reached by a box-type path."""
    ranges = [(start, end)]
    for name in path:
        nxt = []
        for s, e in ranges:
            for btype, bs, be in _boxes(data, s, e):
                if btype == name:
                    nxt.append((bs, be))
        ranges = nxt
    return ranges


def probe_mp4(payload: bytes) -> dict:
    """Parse container metadata from an ISO-BMFF payload."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF payload")
    brand = payload[8:12].decode("latin-1")

    out: dict = {"brand": brand, "duration_sec": None, "tracks": []}
    for s, e in _find(payload, 0, len(payload), [b"moov", b"mvhd"]):
        version = payload[s]
        if version == 1:
            timescale, duration = struct.unpack_from(">IQ", payload, s + 4 + 16)
        else:
            timescale, duration = struct.unpack_from(">II", payload, s + 4 + 8)
        if timescale:
            out["duration_sec"] = round(duration / timescale, 3)

    for ts, te in _find(payload, 0, len(payload), [b"moov", b"trak"]):
        track: dict = {
            "handler": None,
            "width": None,
            "height": None,
            "codec": None,
        }
        for s, e in _find(payload, ts, te, [b"tkhd"]):
            # width/height: 16.16 fixed point, the LAST 8 bytes
            w_fx, h_fx = struct.unpack_from(">II", payload, e - 8)
            track["width"] = w_fx >> 16
            track["height"] = h_fx >> 16
        for s, e in _find(payload, ts, te, [b"mdia", b"hdlr"]):
            track["handler"] = payload[s + 8 : s + 12].decode("latin-1")
        for s, e in _find(
            payload, ts, te, [b"mdia", b"minf", b"stbl", b"stsd"]
        ):
            (n_entries,) = struct.unpack_from(">I", payload, s + 4)
            if n_entries and s + 16 <= e:
                track["codec"] = payload[s + 12 : s + 16].decode("latin-1")
        out["tracks"].append(track)
    out["n_tracks"] = len(out["tracks"])
    return out


def build_minimal_mp4(
    *,
    brand: bytes = b"mp42",
    timescale: int = 1000,
    duration: int = 5000,
    tracks: list[dict] | None = None,
    version: int = 0,
) -> bytes:
    """Compose a minimal valid box tree for tests (the container twin
    of the JPEG/GIF encoders: no codec library exists here to write
    vectors, so the prober's tests build their own)."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    if version == 1:
        mvhd = box(
            b"mvhd",
            bytes([1, 0, 0, 0])
            + b"\x00" * 16
            + struct.pack(">IQ", timescale, duration)
            + b"\x00" * 80,
        )
    else:
        mvhd = box(
            b"mvhd",
            bytes(4) + b"\x00" * 8 + struct.pack(">II", timescale, duration) + b"\x00" * 80,
        )
    trak_boxes = b""
    for t in tracks or []:
        tkhd = box(
            b"tkhd",
            bytes(4)
            + b"\x00" * 72
            + struct.pack(">II", (t.get("width", 0)) << 16, (t.get("height", 0)) << 16),
        )
        hdlr = box(
            b"hdlr", bytes(4) + bytes(4) + t.get("handler", b"vide") + b"\x00" * 13
        )
        entry = struct.pack(">I", 16) + t.get("codec", b"avc1") + b"\x00" * 8
        stsd = box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        mdia = box(b"mdia", hdlr + minf)
        trak_boxes += box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak_boxes)
    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mdat = box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat
