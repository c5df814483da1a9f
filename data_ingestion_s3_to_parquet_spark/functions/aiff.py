"""AIFF (Audio Interchange File Format) parser/builder, from the
public EA-IFF-85 / Apple AIFF-1.3 specification.

AIFF is the big-endian sibling of RIFF/WAVE: an IFF ``FORM`` container
whose ``COMM`` chunk carries channels / frame count / bit depth and —
the format's one famous quirk — the sample rate as an 80-bit IEEE 754
extended-precision float. Python's stdlib dropped ``aifc`` in 3.13, so
the engine parses the container from spec like its other audio lanes
(WAV fmt / FLAC STREAMINFO / Ogg pages / MP3 frame headers):

- :func:`probe_aiff`    header/geometry-only (no sample scan)
- :func:`aiff_samples`  (rate, channels, int64 linear samples) for
  8/16-bit PCM ``AIFF`` forms — the decode seam shape shared with
  ``operators.multimodal.wav_samples``
- :func:`build_aiff`    deterministic AIFF bytes from int16 samples
  (the test/fixture writer)

``AIFC`` (compressed AIFF) payloads raise ``NotImplementedError`` at
the codec seam — the container parses, the codecs (sowt/ima4/ulaw…)
are the same honest stubs as H.264/AAC.

Reference parity note: the reference ingests CSV text only
(`/root/reference/src/main.rs`); audio containers belong to the
mandated multimodal extension surface.
"""

from __future__ import annotations

import struct

import numpy as np


def _decode_extended80(b: bytes) -> float:
    """80-bit IEEE 754 extended float → Python float (the COMM sample
    rate field): 1 sign bit, 15 exponent bits (bias 16383), 64-bit
    mantissa with EXPLICIT integer bit."""
    if len(b) != 10:
        raise ValueError("extended float must be 10 bytes")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _encode_extended80(x: float) -> bytes:
    if x <= 0 or x != x or x in (float("inf"),):
        raise ValueError("sample rate must be a positive finite number")
    exp = 16383 + 63
    mant = x
    while mant < 2**63:
        mant *= 2.0
        exp -= 1
    while mant >= 2**64:
        mant /= 2.0
        exp += 1
    return struct.pack(">HQ", exp, int(mant))


def _iter_chunks(payload: bytes):
    """Yield (chunk_id, data) for each top-level IFF chunk; chunks are
    word-aligned (odd sizes carry one pad byte)."""
    if len(payload) < 12 or payload[:4] != b"FORM":
        raise ValueError("not an IFF FORM payload")
    (form_size,) = struct.unpack(">I", payload[4:8])
    end = min(len(payload), 8 + form_size)
    pos = 12
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        yield cid, data
        pos += 8 + size + (size & 1)


def probe_aiff(payload: bytes) -> dict:
    """Geometry from the COMM chunk only — no sample-data walk (the
    FLAC/Ogg probe discipline). Works for both AIFF and AIFC forms."""
    form = payload[8:12]
    if payload[:4] != b"FORM" or form not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFC payload")
    for cid, data in _iter_chunks(payload):
        if cid == b"COMM":
            if len(data) < 18:
                raise ValueError("short COMM chunk")
            n_ch, n_frames, bits = struct.unpack(">HIH", data[:8])
            rate = _decode_extended80(data[8:18])
            if rate <= 0:
                raise ValueError("non-positive AIFF sample rate")
            codec = "pcm"
            if form == b"AIFC":
                if len(data) < 22:
                    raise ValueError("AIFC COMM without compression type")
                codec = data[18:22].decode("latin-1").strip().lower()
            return {
                "kind": "aiff",
                "form": form.decode("ascii"),
                "n_channels": int(n_ch),
                "n_frames": int(n_frames),
                "bits": int(bits),
                "sample_rate": rate,
                "codec": codec,
                "duration_sec": round(n_frames / rate, 3),
            }
    raise ValueError("AIFF without COMM chunk")


def aiff_samples(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, n_channels, int64 linear samples) of an 8/16-bit
    PCM AIFF — the same seam shape as ``wav_samples``. AIFC
    compression types hit the codec seam and raise."""
    meta = probe_aiff(payload)
    if meta["form"] == "AIFC" and meta["codec"] not in ("none",):
        raise NotImplementedError(
            f"AIFC compression '{meta['codec']}' needs a codec "
            "(same seam as H.264/AAC)"
        )
    bits = meta["bits"]
    if bits not in (8, 16):
        raise NotImplementedError(f"{bits}-bit AIFF PCM not supported")
    for cid, data in _iter_chunks(payload):
        if cid == b"SSND":
            if len(data) < 8:
                raise ValueError("short SSND chunk")
            offset, _block = struct.unpack(">II", data[:8])
            pcm = data[8 + offset :]
            n = meta["n_frames"] * meta["n_channels"]
            if bits == 16:
                if len(pcm) < 2 * n:
                    raise ValueError("SSND shorter than COMM frame count")
                arr = np.frombuffer(pcm, dtype=">i2", count=n).astype(
                    np.int64
                )
            else:  # AIFF 8-bit PCM is SIGNED (unlike WAV's unsigned)
                if len(pcm) < n:
                    raise ValueError("SSND shorter than COMM frame count")
                arr = np.frombuffer(pcm, dtype=np.int8, count=n).astype(
                    np.int64
                )
            return int(round(meta["sample_rate"])), meta["n_channels"], arr
    raise ValueError("AIFF without SSND chunk")


def build_aiff(
    samples: np.ndarray, *, sample_rate: int, n_channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM AIFF bytes from an int16 sample vector
    (interleaved when ``n_channels`` > 1)."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim != 1 or arr.size % n_channels:
        raise ValueError("samples must be 1-D and divisible by channels")
    n_frames = arr.size // n_channels
    comm = struct.pack(">HIH", n_channels, n_frames, 16) + _encode_extended80(
        float(sample_rate)
    )
    pcm = arr.astype(">i2").tobytes()
    ssnd = struct.pack(">II", 0, 0) + pcm
    out = bytearray()
    for cid, data in ((b"COMM", comm), (b"SSND", ssnd)):
        out += cid + struct.pack(">I", len(data)) + data
        if len(data) & 1:
            out += b"\x00"
    return b"FORM" + struct.pack(">I", 4 + len(out)) + b"AIFF" + bytes(out)
