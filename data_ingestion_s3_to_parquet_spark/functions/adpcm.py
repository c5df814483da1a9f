"""IMA/DVI ADPCM (WAVE format tag 0x0011) — the 4-bit adaptive
delta codec of voice-memo / game-audio WAV corpora, from the IMA
"Recommended Practices for Enhancing Digital Audio Compatibility"
(1992) reference algorithm; no codec library (the adaptive sibling of
``g711.py``'s fixed companding tables).

Stdlib ``wave`` rejects format tag 17, so without this module IMA
ADPCM WAVs — 4× smaller than PCM and extremely common in embedded /
telephony capture — would be ok=false poison rows in the media lanes.

Block layout (mono): each ``block_align``-byte block opens with a
4-byte header — initial predictor (int16 LE, emitted verbatim as the
block's first sample), initial step-table index (uint8), reserved —
followed by ``block_align − 4`` bytes of two 4-bit codes each, LOW
nibble first. Samples per full block = ``(block_align − 4) · 2 + 1``.
Stereo (r8 second wave, the formerly documented seam): TWO 4-byte
channel headers, then alternating 4-byte nibble groups — 4 bytes
(8 samples) left, 4 bytes right — so per-channel samples per full
block = ``(block_align − 8) + 1``.

Decode per nibble (the IMA reference expansion, exact integers):

    step  = STEP_TABLE[index]
    diff  = step>>3  (+ step>>2 if bit0) (+ step>>1 if bit1)
            (+ step if bit2), negated if bit3
    pred  = clamp(pred + diff, int16);  index = clamp(index + IDX[code], 0..88)

The encoder exists to build test vectors and pin the tracking
property (prediction error bounded by the current step size); it
reconstructs state with the decoder's own expansion so encoder and
decoder can never drift.
"""

from __future__ import annotations

import struct

import numpy as np

WAVE_FORMAT_IMA_ADPCM = 0x0011

# fmt: off
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
# fmt: on
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _expand(pred: int, index: int, code: int) -> tuple[int, int]:
    """One IMA expansion step: (pred, index, 4-bit code) → next
    (pred, index). Shared by decoder AND encoder state tracking."""
    step = STEP_TABLE[index]
    diff = step >> 3
    if code & 1:
        diff += step >> 2
    if code & 2:
        diff += step >> 1
    if code & 4:
        diff += step
    if code & 8:
        diff = -diff
    pred = max(-32768, min(32767, pred + diff))
    index = max(0, min(88, index + INDEX_TABLE[code & 7]))
    return pred, index


def adpcm_decode(data: bytes, block_align: int) -> np.ndarray:
    """IMA ADPCM data bytes (mono) → int16 linear PCM samples.

    Trailing partial blocks decode as far as their bytes reach (a
    truncated capture loses tail samples, not the file); a trailing
    fragment shorter than the 4-byte header is ignored.
    """
    if block_align < 5:
        raise ValueError(f"block_align {block_align} too small for IMA ADPCM")
    out: list[int] = []
    for base in range(0, len(data), block_align):
        block = data[base : base + block_align]
        if len(block) < 4:
            break
        pred = struct.unpack_from("<h", block, 0)[0]
        index = block[2]
        if index > 88:
            raise ValueError(f"step index {index} out of range")
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                pred, index = _expand(pred, index, code)
                out.append(pred)
    return np.asarray(out, dtype=np.int16)


def samples_per_block(block_align: int) -> int:
    return (block_align - 4) * 2 + 1


def adpcm_decode_stereo(data: bytes, block_align: int) -> np.ndarray:
    """Stereo IMA ADPCM data bytes → INTERLEAVED int16 PCM (L R L R…),
    per the IMA-1992 / Microsoft multi-channel block layout: two
    4-byte channel headers, then alternating 4-byte nibble groups —
    4 bytes (8 samples) left, 4 bytes right — to the end of the
    block. Trailing partial GROUPS are ignored (a torn group cannot
    interleave), mirroring mono's truncated-capture tolerance.
    """
    if block_align < 16 or (block_align - 8) % 8:
        raise ValueError(
            f"block_align {block_align} invalid for stereo IMA ADPCM "
            "(need 8 + 8k)"
        )
    left: list[int] = []
    right: list[int] = []
    for base in range(0, len(data), block_align):
        block = data[base : base + block_align]
        if len(block) < 8:
            break
        pred_l = struct.unpack_from("<h", block, 0)[0]
        idx_l = block[2]
        pred_r = struct.unpack_from("<h", block, 4)[0]
        idx_r = block[6]
        if idx_l > 88 or idx_r > 88:
            raise ValueError("step index out of range")
        left.append(pred_l)
        right.append(pred_r)
        for g in range(8, len(block) - 7, 8):
            for byte in block[g : g + 4]:
                for code in (byte & 0x0F, byte >> 4):
                    pred_l, idx_l = _expand(pred_l, idx_l, code)
                    left.append(pred_l)
            for byte in block[g + 4 : g + 8]:
                for code in (byte & 0x0F, byte >> 4):
                    pred_r, idx_r = _expand(pred_r, idx_r, code)
                    right.append(pred_r)
    out = np.empty(2 * len(left), dtype=np.int16)
    out[0::2] = left
    out[1::2] = right
    return out


def stereo_samples_per_block(block_align: int) -> int:
    """Per-CHANNEL sample count of a full stereo block: the header
    frame plus one sample per data nibble per channel."""
    return (block_align - 8) + 1


def adpcm_encode_stereo(samples: np.ndarray, block_align: int = 256) -> bytes:
    """Interleaved int16 stereo PCM → IMA ADPCM bytes (test-vector
    builder; same whole-blocks-only contract as the mono encoder)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.size % 2:
        raise ValueError("interleaved stereo needs an even sample count")
    if block_align < 16 or (block_align - 8) % 8:
        raise ValueError(
            f"block_align {block_align} invalid for stereo IMA ADPCM"
        )
    spb = stereo_samples_per_block(block_align)
    frames = x.size // 2
    if frames == 0 or frames % spb:
        raise ValueError(
            f"frame count {frames} must be a multiple of {spb}"
        )
    chans = (x[0::2], x[1::2])
    idx = [0, 0]
    out = bytearray()
    for base in range(0, frames, spb):
        preds = [int(chans[0][base]), int(chans[1][base])]
        for c in (0, 1):
            out += struct.pack("<hBB", preds[c], idx[c], 0)
        nibbles: tuple[list[int], list[int]] = ([], [])
        for c in (0, 1):
            pred = preds[c]
            index = idx[c]
            for s in chans[c][base + 1 : base + spb]:
                step = STEP_TABLE[index]
                diff = int(s) - pred
                code = 0
                if diff < 0:
                    code = 8
                    diff = -diff
                if diff >= step:
                    code |= 4
                    diff -= step
                if diff >= step >> 1:
                    code |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    code |= 1
                pred, index = _expand(pred, index, code)
                nibbles[c].append(code)
            preds[c] = pred
            idx[c] = index
        for g in range(0, len(nibbles[0]), 8):
            for c in (0, 1):
                grp = nibbles[c][g : g + 8]
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    out.append(lo | (hi << 4))
    return bytes(out)


def adpcm_encode(
    samples: np.ndarray, block_align: int = 256
) -> bytes:
    """int16 linear PCM (mono) → IMA ADPCM bytes (test-vector
    builder). The sample count must fill whole blocks exactly
    (``k · samples_per_block``) — padding policy is a corpus decision,
    not a codec one, so the builder refuses rather than guessing."""
    x = np.asarray(samples, dtype=np.int64)
    spb = samples_per_block(block_align)
    if x.size == 0 or x.size % spb:
        raise ValueError(f"sample count {x.size} must be a multiple of {spb}")
    index = 0
    out = bytearray()
    for base in range(0, x.size, spb):
        pred = int(x[base])
        out += struct.pack("<hBB", pred, index, 0)
        nibbles: list[int] = []
        for s in x[base + 1 : base + spb]:
            step = STEP_TABLE[index]
            diff = int(s) - pred
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            pred, index = _expand(pred, index, code)
            nibbles.append(code)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)


def build_adpcm_wav(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    block_align: int = 256,
    n_channels: int = 1,
) -> bytes:
    """Spec-valid IMA ADPCM WAV from int16 samples (fmt chunk with the
    cbSize=2 wSamplesPerBlock extension, per the Microsoft
    WAVEFORMAT_IMA_ADPCM registration). Mono, or stereo from
    interleaved samples (r8 second wave — the documented seam)."""
    if n_channels == 1:
        enc = adpcm_encode(samples, block_align)
        spb = samples_per_block(block_align)
    elif n_channels == 2:
        enc = adpcm_encode_stereo(samples, block_align)
        spb = stereo_samples_per_block(block_align)
    else:
        raise ValueError("n_channels must be 1 or 2")
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH",
        WAVE_FORMAT_IMA_ADPCM,
        n_channels,
        sample_rate,
        byte_rate,
        block_align,
        4,  # bits per (encoded) sample
        2,  # cbSize
        spb,
    )
    n = int(np.asarray(samples).size) // n_channels
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        # 'fact' (dwSampleLength) is REQUIRED for non-PCM format tags
        # (RIFF WAVE spec) — the engine's own decoders derive counts
        # from block geometry, but third-party validators reject
        # compressed WAVs without it
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(enc)) + enc
        + (b"\x00" if len(enc) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def adpcm_n_samples(
    data_len: int, block_align: int, n_channels: int = 1
) -> int:
    """Per-channel FRAME count of an IMA ADPCM data chunk without
    decoding it (the probe-side twin of the decoders' loop bounds —
    mono bytes-to-samples, or the stereo group geometry)."""
    full, rem = divmod(data_len, block_align)
    if n_channels == 1:
        n = full * samples_per_block(block_align)
        if rem >= 4:
            n += (rem - 4) * 2 + 1
        return n
    if n_channels == 2:
        n = full * stereo_samples_per_block(block_align)
        if rem >= 8:
            n += ((rem - 8) // 8) * 8 + 1
        return n
    raise ValueError("n_channels must be 1 or 2")
