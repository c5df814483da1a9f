"""RIFF AVI container parsing + MJPEG frame extraction — pure
``struct``, no codec library.

Motion-JPEG AVI is the one VIDEO format this container can fully
decode: each '00dc' chunk in the 'movi' list is a standalone baseline
JPEG, and ``functions/jpeg.py`` already decodes those from spec. So
the video lane gets real pixels (``operators.multimodal.
media_sample_frames``) instead of the H.264 metadata-only stub —
keyframe extraction, frame dedup, and thumbnailing all run on actual
decoded frames for MJPEG corpora (security cameras, microscopy,
legacy captures — the places MJPEG still dominates).

Layout parsed (from the public RIFF/AVI 1.0 spec): even-padded
fourcc+size chunks; 'RIFF..AVI ' → LIST 'hdrl' (avih MainAVIHeader +
LIST 'strl' with strh/strf per stream) + LIST 'movi' ('00dc'/'00db'
frame chunks; '01wb'-style audio chunks are skipped); the optional
idx1 index is ignored (we stream the movi list directly).

:func:`probe_avi` reads headers only (dims, frame timing, count,
handler fourcc) — the media_probe cheap path. :func:`iter_avi_frames`
yields the raw per-frame JPEG bytes. :func:`build_mjpeg_avi` composes
spec-valid test vectors from encoded JPEG frames.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def _chunks(payload: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_size) for the chunk sequence in
    payload[start:end], honoring the RIFF even-byte padding rule."""
    pos = start
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def _require_avi(payload: bytes) -> int:
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    return min(8 + riff_size, len(payload))


def probe_avi(payload: bytes) -> dict:
    """Header-only AVI metadata: dims, µs/frame, declared frame count,
    stream count, and the video handler fourcc."""
    end = _require_avi(payload)
    out = {
        "width": None,
        "height": None,
        "us_per_frame": None,
        "n_frames": None,
        "n_streams": None,
        "video_handler": None,
    }
    for fourcc, dstart, dsize in _chunks(payload, 12, end):
        if fourcc != b"LIST" or payload[dstart : dstart + 4] != b"hdrl":
            continue
        for f2, s2, z2 in _chunks(payload, dstart + 4, dstart + dsize):
            if f2 == b"avih":
                (
                    uspf, _maxbps, _pad, _flags, total, _init, streams,
                    _buf, w, h,
                ) = struct.unpack_from("<10I", payload, s2)
                out.update(
                    width=w, height=h, us_per_frame=uspf,
                    n_frames=total, n_streams=streams,
                )
            elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                for f3, s3, z3 in _chunks(payload, s2 + 4, s2 + z2):
                    if f3 == b"strh" and payload[s3 : s3 + 4] == b"vids":
                        out["video_handler"] = (
                            payload[s3 + 4 : s3 + 8].decode("ascii", "replace")
                        )
    if out["width"] is None:
        raise ValueError("AVI without an avih header")
    return out


def iter_avi_frames(payload: bytes) -> Iterator[bytes]:
    """Yield the raw bytes of every video frame chunk ('00dc'/'00db',
    any stream number) in the 'movi' list, in file order."""
    end = _require_avi(payload)
    for fourcc, dstart, dsize in _chunks(payload, 12, end):
        if fourcc != b"LIST" or payload[dstart : dstart + 4] != b"movi":
            continue
        for f2, s2, z2 in _chunks(payload, dstart + 4, dstart + dsize):
            if f2[2:4] in (b"dc", b"db"):
                yield payload[s2 : s2 + z2]


def build_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Compose a minimal spec-valid MJPEG AVI from already-encoded
    JPEG frames — the test-vector builder (``encode_jpeg`` produces
    the frames; this wraps them in the container)."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    uspf = 1_000_000 // fps
    avih = struct.pack(
        "<10I4x4x4x4x",
        uspf, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0, width, height,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0,
                      len(jpeg_frames), 0, 10_000, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
