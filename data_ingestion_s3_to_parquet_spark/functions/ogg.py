"""Ogg container probe — page walk + Opus/Vorbis identification
headers, pure ``struct``.

Metadata-only like ``flac.py``/``mp4.py``: podcast/voice corpora ship
Ogg Opus and Ogg Vorbis, and triage (codec, channels, rate, duration)
needs only page headers — the id packet sits on the first page, and
the stream duration is the LAST page's granule position (PCM sample
count: at the codec rate for Vorbis, always 48 kHz for Opus per RFC
7845 §4).

Page layout (from the public Ogg spec / RFC 3533): ``OggS`` capture,
version 0, 1-byte header-type flags, 64-bit LE granule position,
serial/sequence/CRC, a 1-byte segment count and the segment lacing
table whose sum is the page body length. :func:`build_ogg_opus` /
``build_ogg_vorbis`` compose minimal two-page test vectors (id page +
EOS page carrying the final granule).
"""

from __future__ import annotations

import struct


def _pages(payload: bytes):
    """Yield (header_type, granule, body_start, body_len) per page."""
    pos = 0
    while pos + 27 <= len(payload):
        if payload[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at {pos}")
        version = payload[pos + 4]
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        htype = payload[pos + 5]
        (granule,) = struct.unpack_from("<q", payload, pos + 6)
        nsegs = payload[pos + 26]
        table = payload[pos + 27 : pos + 27 + nsegs]
        if len(table) < nsegs:
            raise ValueError("truncated Ogg segment table")
        body_len = sum(table)
        body_start = pos + 27 + nsegs
        yield htype, granule, body_start, body_len
        pos = body_start + body_len


def probe_ogg(payload: bytes) -> dict:
    """Codec / channels / sample rate / duration of an Ogg stream
    from its first-page id header and last-page granule position."""
    first_body = None
    last_granule = None
    for htype, granule, start, blen in _pages(payload):
        if first_body is None:
            first_body = payload[start : start + blen]
        if granule >= 0:
            last_granule = granule
    if first_body is None:
        raise ValueError("Ogg payload with no pages")
    if first_body[:8] == b"OpusHead":
        channels = first_body[9]
        (rate,) = struct.unpack_from("<I", first_body, 12)
        # Opus granules are ALWAYS 48 kHz samples (RFC 7845 §4),
        # regardless of the original input rate in OpusHead
        dur = (
            round(last_granule / 48000, 3)
            if last_granule is not None
            else None
        )
        return {
            "codec": "opus",
            "n_channels": channels,
            "sample_rate": rate,
            "duration_sec": dur,
        }
    if first_body[:7] == b"\x01vorbis":
        channels = first_body[11]
        (rate,) = struct.unpack_from("<I", first_body, 12)
        if rate == 0:
            raise ValueError("vorbis id header with rate 0")
        dur = (
            round(last_granule / rate, 3)
            if last_granule is not None
            else None
        )
        return {
            "codec": "vorbis",
            "n_channels": channels,
            "sample_rate": rate,
            "duration_sec": dur,
        }
    raise NotImplementedError(
        "Ogg stream with an unrecognized id header (not Opus/Vorbis)"
    )


def _page(
    body: bytes, *, granule: int, htype: int, serial: int = 1, seq: int = 0
) -> bytes:
    if len(body) > 255 * 255:
        raise ValueError("test-vector page too large")
    nfull, rem = divmod(len(body), 255)
    table = bytes([255] * nfull + [rem])
    return (
        b"OggS"
        + bytes([0, htype])
        + struct.pack("<qIII", granule, serial, seq, 0)
        + bytes([len(table)])
        + table
        + body
    )


def build_ogg_opus(
    *, channels: int = 2, input_rate: int = 48000, n_samples_48k: int = 96000
) -> bytes:
    """Minimal two-page Ogg Opus test vector: BOS id page + EOS page
    whose granule is the 48 kHz sample count."""
    head = (
        b"OpusHead"
        + bytes([1, channels])
        + struct.pack("<H", 312)  # pre-skip
        + struct.pack("<I", input_rate)
        + struct.pack("<hB", 0, 0)  # output gain, mapping family
    )
    return _page(head, granule=0, htype=0x02) + _page(
        b"\x00", granule=n_samples_48k, htype=0x04, seq=1
    )


def build_ogg_vorbis(
    *, channels: int = 2, rate: int = 44100, n_samples: int = 44100
) -> bytes:
    """Minimal two-page Ogg Vorbis test vector."""
    head = (
        b"\x01vorbis"
        + struct.pack("<I", 0)  # version
        + bytes([channels])
        + struct.pack("<I", rate)
        + struct.pack("<iii", 0, 0, 0)  # bitrates
        + bytes([0xB8, 0x01])  # blocksizes + framing bit
    )
    return _page(head, granule=0, htype=0x02) + _page(
        b"\x00", granule=n_samples, htype=0x04, seq=1
    )
