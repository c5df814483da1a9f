"""Minimal EBML walk for WebM/Matroska container probing, from the
public EBML (RFC 8794) and Matroska element specs.

WebM is the web's video container next to MP4; the triage path needs
duration and video geometry without any codec. EBML is a binary XML:
every element is (vint id, vint size, payload), so a probe is a
recursive walk of the handful of container elements that lead to:

- ``Segment → Info → TimestampScale / Duration`` (duration_sec),
- ``Segment → Tracks → TrackEntry → TrackType / CodecID /
  Video(PixelWidth, PixelHeight) / Audio(Channels)``.

Unknown-size elements (streamed Segments write size as all-ones) are
handled for the CONTAINER elements we descend into — children are
parsed until the buffer ends, exactly how streaming muxers emit them.

Decode stays behind the codec seam (VP8/VP9/AV1/Opus are codecs); the
probe is geometry-only like MP4/AVI/FLAC/Ogg.

Reference parity note: the reference ingests CSV text only
(`/root/reference/src/main.rs`); video containers belong to the
mandated multimodal extension surface.
"""

from __future__ import annotations

import struct

EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_TYPE = 0x83
CODEC_ID = 0x86
VIDEO = 0xE0
AUDIO = 0xE1
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
CHANNELS = 0x9F
DOCTYPE = 0x4282

_CONTAINERS = {SEGMENT, INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO}


def _read_vint(buf: bytes, pos: int, *, keep_marker: bool) -> tuple[int, int]:
    """(value, new_pos) of the EBML variable-length integer at pos.
    ``keep_marker`` keeps the length-marker bit (element IDs are
    compared marker-included by convention); sizes strip it."""
    if pos >= len(buf):
        raise ValueError("EBML vint past end of buffer")
    first = buf[pos]
    if first == 0:
        raise ValueError("invalid EBML vint (leading zero byte)")
    length = 8 - first.bit_length() + 1
    if pos + length > len(buf):
        raise ValueError("truncated EBML vint")
    val = first if keep_marker else first & (0xFF >> length)
    for i in range(1, length):
        val = (val << 8) | buf[pos + i]
    return val, pos + length


def _unknown_size(size: int, nbytes_hint: int) -> bool:
    # all data bits set = "unknown size" (streamed element)
    return size == (1 << (7 * nbytes_hint)) - 1 if nbytes_hint else False


def _iter_children(buf: bytes, start: int, end: int):
    pos = start
    while pos < end:
        id_start = pos
        eid, pos = _read_vint(buf, pos, keep_marker=True)
        size_start = pos
        size, pos = _read_vint(buf, pos, keep_marker=False)
        nbytes = pos - size_start
        if _unknown_size(size, nbytes):
            # unknown-size container: children run to the enclosing end
            yield eid, pos, end
            pos = end
        else:
            child_end = min(pos + size, end)
            yield eid, pos, child_end
            pos = child_end
        if pos <= id_start:
            raise ValueError("EBML walk made no progress")


def _uint(buf: bytes, start: int, end: int) -> int:
    v = 0
    for b in buf[start:end]:
        v = (v << 8) | b
    return v


def _float(buf: bytes, start: int, end: int) -> float:
    n = end - start
    if n == 4:
        return struct.unpack(">f", buf[start:end])[0]
    if n == 8:
        return struct.unpack(">d", buf[start:end])[0]
    raise ValueError(f"EBML float must be 4 or 8 bytes, got {n}")


def probe_webm(payload: bytes) -> dict:
    """Geometry/duration probe for WebM/Matroska payloads."""
    children = list(_iter_children(payload, 0, len(payload)))
    if not children or children[0][0] != EBML_HEADER:
        raise ValueError("not an EBML payload")
    doctype = "matroska"
    for eid, s, e in _iter_children(payload, *children[0][1:3]):
        if eid == DOCTYPE:
            doctype = payload[s:e].split(b"\x00")[0].decode("latin-1")
    seg = next(((s, e) for eid, s, e in children if eid == SEGMENT), None)
    if seg is None:
        raise ValueError("EBML without Segment")
    ts_scale = 1_000_000  # Matroska default: 1 ms per tick
    duration_ticks: float | None = None
    tracks: list[dict] = []
    for eid, s, e in _iter_children(payload, *seg):
        if eid == INFO:
            for ceid, cs, ce in _iter_children(payload, s, e):
                if ceid == TIMESTAMP_SCALE:
                    ts_scale = _uint(payload, cs, ce)
                elif ceid == DURATION:
                    duration_ticks = _float(payload, cs, ce)
        elif eid == TRACKS:
            for ceid, cs, ce in _iter_children(payload, s, e):
                if ceid != TRACK_ENTRY:
                    continue
                t: dict = {}
                for teid, ts_, te in _iter_children(payload, cs, ce):
                    if teid == TRACK_TYPE:
                        t["type"] = _uint(payload, ts_, te)
                    elif teid == CODEC_ID:
                        t["codec"] = (
                            payload[ts_:te].split(b"\x00")[0].decode("latin-1")
                        )
                    elif teid == VIDEO:
                        for veid, vs, ve in _iter_children(payload, ts_, te):
                            if veid == PIXEL_WIDTH:
                                t["width"] = _uint(payload, vs, ve)
                            elif veid == PIXEL_HEIGHT:
                                t["height"] = _uint(payload, vs, ve)
                    elif teid == AUDIO:
                        for aeid, as_, ae in _iter_children(payload, ts_, te):
                            if aeid == CHANNELS:
                                t["channels"] = _uint(payload, as_, ae)
                tracks.append(t)
    vid = next((t for t in tracks if t.get("type") == 1), None)
    aud = next((t for t in tracks if t.get("type") == 2), None)
    duration_sec = (
        round(duration_ticks * ts_scale / 1e9, 3)
        if duration_ticks is not None
        else None
    )
    return {
        "kind": "webm",
        "doctype": doctype,
        "duration_sec": duration_sec,
        "n_tracks": len(tracks),
        "video_codec": vid.get("codec") if vid else None,
        "audio_codec": aud.get("codec") if aud else None,
        "width": vid.get("width") if vid else None,
        "height": vid.get("height") if vid else None,
    }


def _elem(eid: int, payload: bytes) -> bytes:
    """Serialize one EBML element for the test builder (IDs are
    emitted marker-included, sizes as minimal 1/2/8-byte vints)."""
    if eid <= 0xFF:
        id_bytes = bytes([eid])
    elif eid <= 0xFFFF:
        id_bytes = struct.pack(">H", eid)
    elif eid <= 0xFFFFFF:
        id_bytes = eid.to_bytes(3, "big")
    else:
        id_bytes = struct.pack(">I", eid)
    n = len(payload)
    if n < 0x7F:
        size = bytes([0x80 | n])
    elif n < 0x3FFF:
        size = struct.pack(">H", 0x4000 | n)
    else:
        size = bytes([0x01]) + n.to_bytes(7, "big")
    return id_bytes + size + payload


def build_test_webm(
    *,
    width: int = 640,
    height: int = 360,
    duration_ms: float = 1234.0,
    video_codec: str = "V_VP9",
    audio_channels: int = 2,
) -> bytes:
    """Minimal spec-valid WebM for tests: EBML header + Segment
    containing Info (default 1 ms timestamp scale, float Duration)
    and two Tracks (video geometry, audio channels)."""
    header = _elem(
        EBML_HEADER, _elem(DOCTYPE, b"webm")
    )
    info = _elem(
        INFO,
        _elem(TIMESTAMP_SCALE, (1_000_000).to_bytes(3, "big"))
        + _elem(DURATION, struct.pack(">d", duration_ms)),
    )
    video_entry = _elem(
        TRACK_ENTRY,
        _elem(TRACK_TYPE, b"\x01")
        + _elem(CODEC_ID, video_codec.encode())
        + _elem(
            VIDEO,
            _elem(PIXEL_WIDTH, width.to_bytes(2, "big"))
            + _elem(PIXEL_HEIGHT, height.to_bytes(2, "big")),
        ),
    )
    audio_entry = _elem(
        TRACK_ENTRY,
        _elem(TRACK_TYPE, b"\x02")
        + _elem(CODEC_ID, b"A_OPUS")
        + _elem(AUDIO, _elem(CHANNELS, bytes([audio_channels]))),
    )
    tracks = _elem(TRACKS, video_entry + audio_entry)
    segment = _elem(SEGMENT, info + tracks)
    return header + segment
