"""Sun AU (``.snd``/``.au``) audio container, from the public
NeXT/Sun SNDSoundStruct header spec.

AU is the simplest real audio container in circulation — a 24-byte
big-endian header (magic ``.snd``, data offset, data size, encoding,
sample rate, channels) followed by raw samples — and it is the native
wrapper of the SAME G.711 µ-law telephony payloads the WAV lane
decodes (encoding 1), so ``functions/g711.py``'s companding tables are
reused verbatim here. Encodings supported: 1 (8-bit µ-law), 2 (8-bit
linear PCM, signed), 3 (16-bit linear PCM, big-endian). Everything
else (A-law-in-AU = 27, float, ADPCM variants) raises at the codec
seam with its numeric encoding named.

- :func:`probe_au`    header-only geometry (no sample walk)
- :func:`au_samples`  (rate, channels, int64 linear samples) — the
  ``wav_samples``/``aiff_samples`` seam shape
- :func:`build_au`    deterministic AU bytes (test/fixture writer)

Reference parity note: the reference ingests CSV text only
(`/root/reference/src/main.rs`); audio containers belong to the
mandated multimodal extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

AU_MAGIC = b".snd"
AU_ENC_ULAW = 1
AU_ENC_PCM8 = 2
AU_ENC_PCM16 = 3
_ENC_NAMES = {AU_ENC_ULAW: "ulaw", AU_ENC_PCM8: "pcm8", AU_ENC_PCM16: "pcm16"}
_UNKNOWN_SIZE = 0xFFFFFFFF  # spec: data size may be "unknown"


def probe_au(payload: bytes) -> dict:
    """Geometry from the 24-byte header only (the FLAC/Ogg probe
    discipline); an 'unknown' data-size field falls back to the actual
    byte count past the offset."""
    if len(payload) < 24 or payload[:4] != AU_MAGIC:
        raise ValueError("not an AU payload")
    offset, size, enc, rate, n_ch = struct.unpack(">IIIII", payload[4:24])
    if offset < 24:
        raise ValueError(f"AU data offset {offset} inside the header")
    if rate <= 0 or n_ch <= 0:
        raise ValueError("non-positive AU rate or channel count")
    if size == _UNKNOWN_SIZE:
        size = max(len(payload) - offset, 0)
    size = min(size, max(len(payload) - offset, 0))
    bytes_per = 2 if enc == AU_ENC_PCM16 else 1
    frames = size // (bytes_per * n_ch)
    return {
        "kind": "au",
        "encoding": int(enc),
        "codec": _ENC_NAMES.get(enc, f"enc{enc}"),
        "sample_rate": int(rate),
        "n_channels": int(n_ch),
        "n_frames": int(frames),
        "duration_sec": round(frames / rate, 3),
        "data_offset": int(offset),
    }


def au_samples(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int64 linear samples) — µ-law expands
    through the shared G.711 tables; unsupported encodings raise at
    the codec seam."""
    meta = probe_au(payload)
    enc = meta["encoding"]
    if enc not in _ENC_NAMES:
        raise NotImplementedError(
            f"AU encoding {enc} needs a codec (same seam as H.264/AAC)"
        )
    n = meta["n_frames"] * meta["n_channels"]
    data = payload[meta["data_offset"] :]
    if enc == AU_ENC_ULAW:
        from .g711 import ulaw_decode

        arr = ulaw_decode(data[:n]).astype(np.int64)
    elif enc == AU_ENC_PCM8:
        arr = np.frombuffer(data, dtype=np.int8, count=n).astype(np.int64)
    else:
        arr = np.frombuffer(data, dtype=">i2", count=n).astype(np.int64)
    return meta["sample_rate"], meta["n_channels"], arr


def build_au(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    n_channels: int = 1,
    encoding: int = AU_ENC_PCM16,
) -> bytes:
    """Deterministic AU bytes: int16 samples for PCM16, int8 for PCM8,
    pre-companded uint8 codes for µ-law (interleaved when stereo)."""
    if encoding == AU_ENC_PCM16:
        arr = np.asarray(samples, dtype=np.int16)
        data = arr.astype(">i2").tobytes()
    elif encoding == AU_ENC_PCM8:
        arr = np.asarray(samples, dtype=np.int8)
        data = arr.tobytes()
    elif encoding == AU_ENC_ULAW:
        arr = np.asarray(samples, dtype=np.uint8)
        data = arr.tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    if arr.ndim != 1 or (n_channels and arr.size % n_channels):
        raise ValueError("samples must be 1-D and divisible by channels")
    header = AU_MAGIC + struct.pack(
        ">IIIII", 24, len(data), encoding, sample_rate, n_channels
    )
    return header + data
