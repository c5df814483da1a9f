"""FLAC container probe — STREAMINFO header parsing, pure bit math.

Metadata-only, like ``mp4.py``/``mp3.py``: a 100 TB audio corpus
filters on duration/rate/channels BEFORE any sample decode, and
FLAC's STREAMINFO block carries all of it in the first ~50 bytes.
(Audio frame decode would need the full codec — the honest-stub rule;
G.711/PCM WAV are the real-decode audio lanes.)

Layout (from the published FLAC format spec): ``fLaC`` magic, then
metadata blocks of 1-byte header (bit 7 = last-block flag, bits 0-6 =
type) + 24-bit big-endian length. Type 0 is STREAMINFO (34 bytes):
min/max blocksize (16+16 bits), min/max framesize (24+24), then a
packed 64-bit group — sample_rate (20 bits), channels−1 (3),
bits_per_sample−1 (5), total_samples (36) — then the 128-bit
unencoded-audio md5. :func:`build_flac_streaminfo` composes test
vectors.
"""

from __future__ import annotations

import struct


def probe_flac(payload: bytes) -> dict:
    """Sample rate / channels / bit depth / total samples / duration
    from a FLAC payload's STREAMINFO block (headers only)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload")
    pos = 4
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise ValueError("truncated STREAMINFO block")
            # skip blocksizes (4 bytes) + framesizes (6 bytes)
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                raise ValueError("STREAMINFO with sample_rate 0")
            return {
                "sample_rate": sample_rate,
                "n_channels": channels,
                "bits_per_sample": bits,
                "total_samples": total,
                "duration_sec": round(total / sample_rate, 3),
            }
        if last:
            break
        pos += 4 + length
    raise ValueError("FLAC without a STREAMINFO block")


def build_flac_streaminfo(
    *,
    sample_rate: int = 44100,
    channels: int = 2,
    bits: int = 16,
    total_samples: int = 44100,
) -> bytes:
    """Minimal spec-valid FLAC header (magic + one last-flagged
    STREAMINFO block, zeroed sizes/md5) — probe test vectors."""
    if not 1 <= channels <= 8 or not 4 <= bits <= 32:
        raise ValueError("channels in 1..8, bits in 4..32")
    if sample_rate >= 1 << 20 or total_samples >= 1 << 36:
        raise ValueError("sample_rate < 2^20, total_samples < 2^36")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total_samples
    )
    body = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00" * 6  # min/max framesize (unknown)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 (unset)
    )
    assert len(body) == 34
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body
