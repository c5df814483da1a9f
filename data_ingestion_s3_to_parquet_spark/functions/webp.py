"""WebP container probe, from the public RIFF/WebP bitstream specs.

WebP is the dominant crawled-web image format after JPEG/PNG, so the
corpus-triage path (``operators.multimodal.media_probe``) must at
least read its geometry. A WebP file is a RIFF container whose first
chunk is one of:

- ``VP8 `` — lossy: dims live in the VP8 key-frame header (3-byte
  frame tag, 3-byte start code 0x9D 0x01 0x2A, then 14-bit
  width/height little-endian, Annex A of RFC 6386);
- ``VP8L`` — lossless: 1-byte signature 0x2F then 14-bit width-1 /
  height-1 packed little-endian (VP8L bitstream spec §3);
- ``VP8X`` — extended: flags + 24-bit canvas width-1 / height-1.

Pixel DECODE stays behind the codec seam (:func:`probe_webp` raises
``NotImplementedError`` only when asked for samples — VP8 is a full
video codec, the same honesty rule as H.264/AAC); geometry needs no
codec, exactly like the FLAC/Ogg/MP4 probes.

Reference parity note: the reference ingests CSV text only
(`/root/reference/src/main.rs`); image containers belong to the
mandated multimodal extension surface.
"""

from __future__ import annotations

import struct


def probe_webp(payload: bytes) -> dict:
    """Header-only geometry for VP8 / VP8L / VP8X WebP payloads."""
    # 20-byte minimum: RIFF header (12) + first chunk fourcc (4) +
    # chunk size (4) — a shorter payload with valid magic must raise
    # ValueError like every other malformed input, not struct.error.
    if (
        len(payload) < 20
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        raise ValueError("not a WebP payload")
    fourcc = payload[12:16]
    (size,) = struct.unpack("<I", payload[16:20])
    body = payload[20 : 20 + size]
    if fourcc == b"VP8 ":
        # key-frame: 3-byte frame tag (keyframe bit 0), start code,
        # then 16-bit LE fields whose low 14 bits are the dims
        if len(body) < 10:
            raise ValueError("truncated VP8 chunk")
        if body[0] & 0x01:
            raise ValueError("WebP VP8 chunk is not a key frame")
        if body[3:6] != b"\x9d\x01\x2a":
            raise ValueError("bad VP8 start code")
        w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
        h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
        kind = "vp8"
    elif fourcc == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = struct.unpack("<I", body[1:5])[0]
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        kind = "vp8l"
    elif fourcc == b"VP8X":
        if len(body) < 10:
            raise ValueError("truncated VP8X chunk")
        w = (body[4] | (body[5] << 8) | (body[6] << 16)) + 1
        h = (body[7] | (body[8] << 8) | (body[9] << 16)) + 1
        kind = "vp8x"
    else:
        raise ValueError(f"unknown WebP chunk {fourcc!r}")
    return {"kind": "webp", "codec": kind, "width": int(w), "height": int(h)}


def build_test_webp(
    *, width: int, height: int, flavor: str = "vp8l"
) -> bytes:
    """Minimal spec-valid WebP headers for tests (geometry only — the
    pixel payload is empty, which the probe never reads)."""
    if flavor == "vp8l":
        if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
            raise ValueError("VP8L dims must fit 14 bits")
        bits = (width - 1) | ((height - 1) << 14)
        body = bytes([0x2F]) + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    elif flavor == "vp8":
        if not (1 <= width < 1 << 14 and 1 <= height < 1 << 14):
            raise ValueError("VP8 dims must fit 14 bits")
        body = (
            b"\x00\x00\x00"  # frame tag: keyframe, version 0
            + b"\x9d\x01\x2a"
            + struct.pack("<H", width)
            + struct.pack("<H", height)
        )
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    elif flavor == "vp8x":
        if not (1 <= width <= 1 << 24 and 1 <= height <= 1 << 24):
            raise ValueError("VP8X dims must fit 24 bits")
        w1, h1 = width - 1, height - 1
        body = bytes(
            [0, 0, 0, 0,
             w1 & 0xFF, (w1 >> 8) & 0xFF, (w1 >> 16) & 0xFF,
             h1 & 0xFF, (h1 >> 8) & 0xFF, (h1 >> 16) & 0xFF]
        )
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    else:
        raise ValueError(f"unknown flavor {flavor}")
    riff_body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
