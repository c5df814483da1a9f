"""G.711 µ-law / A-law companding — the telephony audio codec, from
the published ITU-T G.711 tables' defining formulas (no codec
library; the audio twin of ``tiff.py``/``avi.py``'s container work).

Telephony/call-center corpora ship WAV files with wFormatTag 6
(A-law) or 7 (µ-law); stdlib ``wave`` rejects both, so without this
module an entire corpus class would be ok=false rows. Decode is a
256-entry table lookup per sample (vectorized with numpy ``take``),
built at import from the spec's segment/mantissa expansion:

- µ-law: complement the byte; magnitude = ((mantissa·8 + 0x84) <<
  exponent) − 0x84 (the 33-offset trick in 14-bit space, scaled here
  to the conventional 16-bit alignment used by every G.711 codec).
- A-law: XOR 0x55 (even-bit inversion); segment 0 is linear
  (mantissa·16 + 8), higher segments prepend the implicit 1 bit.

The encoders exist to build test vectors and pin the round-trip
property (decode∘encode = identity on the quantization lattice;
|decode(encode(x)) − x| bounded by the segment's step size).
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84  # µ-law bias (33 << 2)


def _ulaw_decode_one(u: int) -> int:
    u = ~u & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    man = u & 0x0F
    mag = (((man << 3) + _BIAS) << exp) - _BIAS
    return -mag if sign else mag


def _alaw_decode_one(a: int) -> int:
    a ^= 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    man = a & 0x0F
    if exp == 0:
        mag = (man << 4) + 8
    else:
        mag = ((man << 4) + 0x108) << (exp - 1)
    return -mag if sign else mag


ULAW_TABLE = np.array(
    [_ulaw_decode_one(u) for u in range(256)], dtype=np.int16
)
ALAW_TABLE = np.array(
    [_alaw_decode_one(a) for a in range(256)], dtype=np.int16
)


def ulaw_decode(data: bytes) -> np.ndarray:
    """µ-law bytes → int16 linear PCM samples."""
    return ULAW_TABLE.take(np.frombuffer(data, dtype=np.uint8))


def alaw_decode(data: bytes) -> np.ndarray:
    """A-law bytes → int16 linear PCM samples."""
    return ALAW_TABLE.take(np.frombuffer(data, dtype=np.uint8))


def ulaw_encode(samples: np.ndarray) -> bytes:
    """int16 linear PCM → µ-law bytes (test-vector builder)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    # clip so mag + bias ≤ 0x7FFF: exponent ≤ 7 and the mantissa never
    # overflows its 4 bits (the standard 32635 µ-law clip)
    mag = np.minimum(np.abs(x), 32635) + _BIAS
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int32)
    exp = np.clip(exp, 0, 7)
    man = (mag >> (exp + 3)) & 0x0F
    return bytes((~(sign | (exp << 4) | man) & 0xFF).astype(np.uint8))


def alaw_encode(samples: np.ndarray) -> bytes:
    """int16 linear PCM → A-law bytes (test-vector builder)."""
    x = np.asarray(samples, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.abs(x), 0x7FFF)
    exp = np.where(
        mag < 0x100, 0, (np.floor(np.log2(np.maximum(mag, 1))) - 7).astype(np.int32)
    )
    exp = np.clip(exp, 0, 7)
    man = np.where(exp == 0, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    return bytes(((sign | (exp << 4) | man) ^ 0x55).astype(np.uint8))


# --- RIFF/WAVE with a G.711 format tag -------------------------------

WAVE_FORMAT_PCM = 1
WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def parse_wav_fmt(payload: bytes) -> dict:
    """(format_tag, n_channels, sample_rate, data bytes) from a RIFF
    WAVE payload — a minimal chunk walk used when stdlib ``wave``
    can't (it rejects non-PCM format tags)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE payload")
    pos, end = 12, min(8 + struct.unpack_from("<I", payload, 4)[0], len(payload))
    fmt = None
    data = None
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if fourcc == b"fmt ":
            tag, n_ch, rate = struct.unpack_from("<HHI", payload, pos + 8)
            fmt = {"format_tag": tag, "n_channels": n_ch, "sample_rate": rate}
            if size >= 16:  # full WAVEFORMAT: byte rate + block align
                block_align, bits = struct.unpack_from(
                    "<HH", payload, pos + 20
                )
                fmt["block_align"] = block_align
                fmt["bits_per_sample"] = bits
        elif fourcc == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAVE without fmt/data chunks")
    fmt["data"] = data
    return fmt


def build_g711_wav(
    samples: np.ndarray, *, law: str, sample_rate: int = 8000
) -> bytes:
    """Spec-valid single-channel G.711 WAV from int16 samples."""
    import struct

    enc = ulaw_encode(samples) if law == "ulaw" else alaw_encode(samples)
    tag = WAVE_FORMAT_MULAW if law == "ulaw" else WAVE_FORMAT_ALAW
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(enc)) + enc
        + (b"\x00" if len(enc) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
