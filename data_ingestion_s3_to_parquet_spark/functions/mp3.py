"""MP3 / ID3v2 probe — pure byte math, no codec.

The audio twin of ``functions/mp4.py``: corpus-scale filters need
duration / bitrate / channel metadata, which live in frame HEADERS —
4 bytes each, a sync pattern plus index fields — not in the coded
audio. Decoding the payload would need a real codec (and stays behind
``_decode_stub``); walking headers needs only the two small standard
tables below (MPEG-1 Layer III bitrates and sample rates).

:func:`probe_mp3` skips an optional ID3v2 tag (syncsafe length),
walks every frame header (computing each frame's byte length from its
own bitrate/padding, so VBR files sum correctly rather than guessing
from the first frame), and returns duration, mean bitrate, sample
rate, channel mode, and the frame count. Malformed payloads raise.
"""

from __future__ import annotations

# MPEG-1 Layer III tables (the full header matrix supports more
# version/layer combos; scoping to the overwhelmingly common case
# keeps the tables small — anything else raises and costs one row)
_BITRATES_KBPS = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_SAMPLE_RATES = (44100, 48000, 32000)
_SAMPLES_PER_FRAME = 1152


def _id3v2_size(payload: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 if none)."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    b = payload[6:10]
    if any(x & 0x80 for x in b):  # syncsafe bytes must have bit 7 clear
        raise ValueError("invalid ID3v2 syncsafe size")
    return 10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3])


def probe_mp3(payload: bytes) -> dict:
    start = _id3v2_size(payload)
    pos = start
    n = len(payload)
    frames = 0
    total_kbps = 0
    sample_rate = None
    channels = None
    while pos + 4 <= n:
        h0, h1, h2, h3 = payload[pos : pos + 4]
        if h0 != 0xFF or (h1 & 0xE0) != 0xE0:
            if frames:  # trailing tag/garbage after valid frames
                break
            raise ValueError("no MP3 sync word where a frame should start")
        version = (h1 >> 3) & 0x3
        layer = (h1 >> 1) & 0x3
        if version != 0x3 or layer != 0x1:  # MPEG-1 Layer III only
            raise NotImplementedError(
                "only MPEG-1 Layer III headers supported"
            )
        br_idx = (h2 >> 4) & 0xF
        sr_idx = (h2 >> 2) & 0x3
        padding = (h2 >> 1) & 0x1
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("invalid MP3 bitrate/samplerate index")
        kbps = _BITRATES_KBPS[br_idx]
        sr = _SAMPLE_RATES[sr_idx]
        mode = (h3 >> 6) & 0x3
        sample_rate = sr
        channels = 1 if mode == 3 else 2
        frames += 1
        total_kbps += kbps
        pos += (_SAMPLES_PER_FRAME // 8 * kbps * 1000) // sr + padding
    if not frames or sample_rate is None:
        raise ValueError("no MP3 frames found")
    return {
        "sample_rate": sample_rate,
        "n_channels": channels,
        "n_frames": frames,
        "duration_sec": round(frames * _SAMPLES_PER_FRAME / sample_rate, 3),
        "mean_kbps": round(total_kbps / frames, 1),
    }


def build_mp3_frames(
    *, n_frames: int = 10, kbps_pattern: tuple[int, ...] = (128,), sr: int = 44100
) -> bytes:
    """Hand-compose valid MPEG-1 Layer III frame headers with zeroed
    audio data (test vectors, like ``build_minimal_mp4``). A
    multi-value ``kbps_pattern`` produces a VBR stream."""
    out = bytearray()
    sr_idx = _SAMPLE_RATES.index(sr)
    for i in range(n_frames):
        kbps = kbps_pattern[i % len(kbps_pattern)]
        br_idx = _BITRATES_KBPS.index(kbps)
        length = (_SAMPLES_PER_FRAME // 8 * kbps * 1000) // sr
        hdr = bytes(
            [
                0xFF,
                0xFB,  # MPEG-1 Layer III, no CRC
                (br_idx << 4) | (sr_idx << 2),  # no padding
                0xC0,  # mono
            ]
        )
        out += hdr + b"\x00" * (length - 4)
    return bytes(out)
