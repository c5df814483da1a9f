"""QOI ("Quite OK Image") codec, from the public one-page spec.

QOI (Dominic Szablewski, 2021 — qoiformat.org/qoi-specification.pdf) is
the lossless byte-oriented image format built around four ideas: a
64-slot running index keyed by a tiny pixel hash, 2-bit channel diffs,
a luma-relative diff, and run-length packing — no entropy coder, no
DEFLATE, single-pass O(n) both directions. That simplicity is why it
shows up in asset pipelines; for this engine it is the third lossless
image WRITE path (next to BMP and PNG) and another real decode lane
for the media operators.

Both directions here are from-spec implementations (no codec library):

- :func:`decode_qoi`  payload → ((h, w, channels) uint8, colorspace)
- :func:`build_qoi`   pixels → deterministic QOI bytes (greedy
  encoder: RUN > INDEX > DIFF > LUMA > RGB/RGBA, exactly the spec's
  reference-encoder preference order, so identical pixels re-encode
  to identical bytes and dedup exactly — the ``build_png`` rule)
- :func:`probe_qoi`   header-only geometry (no pixel walk)

Losslessness is pinned by round-trip fuzz tests; container invariance
(a QOI and a BMP of the same pixels dHash identically) rides the
``functions.phash.pixels_of`` dispatch.

Reference parity note: the reference ingests CSV text only
(`/root/reference/src/main.rs`); image payloads belong to the mandated
multimodal extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

QOI_MAGIC = b"qoif"
_OP_INDEX = 0x00
_OP_DIFF = 0x40
_OP_LUMA = 0x80
_OP_RUN = 0xC0
_OP_RGB = 0xFE
_OP_RGBA = 0xFF
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def probe_qoi(payload: bytes) -> dict:
    """Header-only geometry: width/height/channels/colorspace from the
    14-byte header — no pixel walk (the FLAC/Ogg probe discipline)."""
    if payload[:4] != QOI_MAGIC or len(payload) < 14:
        raise ValueError("not a QOI payload")
    w, h = struct.unpack(">II", payload[4:12])
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(
            f"invalid QOI header (channels={channels}, "
            f"colorspace={colorspace})"
        )
    return {
        "kind": "qoi",
        "width": int(w),
        "height": int(h),
        "channels": int(channels),
        "colorspace": int(colorspace),
    }


def decode_qoi(payload: bytes) -> tuple[np.ndarray, int]:
    """((h, w, channels) uint8 pixels, colorspace) of a QOI payload.

    Strict: trailing-marker and exact-pixel-count violations raise
    (truncated/corrupt payloads surface as typed poison rows, never as
    silently short images).
    """
    meta = probe_qoi(payload)
    w, h, channels = meta["width"], meta["height"], meta["channels"]
    n_px = w * h
    # Allocation guard from the spec itself: RUN packs at most 62
    # pixels per stream byte, so any header claiming more pixels than
    # 62 × (stream bytes) is corrupt — reject BEFORE the h×w buffer
    # allocation a hostile header could otherwise size at 2³²×2³².
    stream_bytes = max(len(payload) - 14 - 8, 0)
    if n_px > 62 * stream_bytes:
        raise ValueError(
            f"QOI header claims {n_px} pixels but the byte stream can "
            f"encode at most {62 * stream_bytes}"
        )
    out = np.empty((n_px, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    end = len(payload) - 8
    if payload[end:] != _END:
        raise ValueError("missing QOI end marker")
    i = 0
    data = payload
    while i < n_px:
        if pos >= end:
            raise ValueError("QOI byte stream ends before pixel count")
        b1 = data[pos]
        pos += 1
        if b1 == _OP_RGB:
            # operand-length check BEFORE reading: a torn final op at
            # pos=end-1 would otherwise read its bytes out of the
            # 8-byte end marker and silently complete with garbage
            if pos + 3 > end:
                raise ValueError("QOI OP_RGB operands overrun byte stream")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif b1 == _OP_RGBA:
            if pos + 4 > end:
                raise ValueError("QOI OP_RGBA operands overrun byte stream")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = b1 & 0xC0
            if tag == _OP_INDEX:
                r, g, b, a = index[b1 & 0x3F]
                out[i] = (r, g, b, a)
                index[_hash(r, g, b, a)] = (r, g, b, a)
                i += 1
                continue
            if tag == _OP_DIFF:
                r = (r + ((b1 >> 4) & 0x03) - 2) & 0xFF
                g = (g + ((b1 >> 2) & 0x03) - 2) & 0xFF
                b = (b + (b1 & 0x03) - 2) & 0xFF
            elif tag == _OP_LUMA:
                if pos + 1 > end:
                    raise ValueError(
                        "QOI OP_LUMA operand overruns byte stream"
                    )
                b2 = data[pos]
                pos += 1
                dg = (b1 & 0x3F) - 32
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0x0F) - 8) & 0xFF
            else:  # _OP_RUN
                run = (b1 & 0x3F) + 1
                if i + run > n_px:
                    raise ValueError("QOI run overflows pixel count")
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
        out[i] = (r, g, b, a)
        index[_hash(r, g, b, a)] = (r, g, b, a)
        i += 1
    if data[pos:end]:
        raise ValueError("trailing QOI bytes after final pixel")
    px = out.reshape(h, w, 4)
    if channels == 3:
        px = np.ascontiguousarray(px[:, :, :3])
    return px, meta["colorspace"]


def qoi_pixels(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 view for the image lanes (alpha dropped,
    matching the PNG rule in ``functions.phash.pixels_of``)."""
    px, _ = decode_qoi(payload)
    if px.shape[2] == 4:
        px = np.ascontiguousarray(px[:, :, :3])
    return px


def build_qoi(px: np.ndarray, *, colorspace: int = 0) -> bytes:
    """Deterministic QOI bytes of an (h, w, 3|4) uint8 array — the
    spec's greedy reference preference order (RUN, then INDEX, then
    DIFF, then LUMA, then RGB/RGBA), so equal pixels always produce
    equal bytes."""
    if px.ndim != 3 or px.shape[2] not in (3, 4) or px.dtype != np.uint8:
        raise ValueError("expected (h, w, 3|4) uint8 pixels")
    if colorspace not in (0, 1):
        raise ValueError("colorspace must be 0 (sRGB) or 1 (linear)")
    h, w, channels = px.shape
    out = bytearray()
    out += QOI_MAGIC
    out += struct.pack(">II", w, h)
    out.append(channels)
    out.append(colorspace)

    flat = px.reshape(-1, channels)
    if channels == 3:
        flat = np.concatenate(
            [flat, np.full((flat.shape[0], 1), 255, dtype=np.uint8)], axis=1
        )
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b, a in map(tuple, flat.tolist()):
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(_OP_RUN | (run - 1))
                run = 0
            continue
        if run:
            out.append(_OP_RUN | (run - 1))
            run = 0
        hx = _hash(r, g, b, a)
        if index[hx] == (r, g, b, a):
            out.append(_OP_INDEX | hx)
        else:
            index[hx] = (r, g, b, a)
            if a == pa:
                dr = (r - pr + 128) % 256 - 128
                dg = (g - pg + 128) % 256 - 128
                db = (b - pb + 128) % 256 - 128
                dr_dg = dr - dg
                db_dg = db - dg
                if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                    out.append(
                        _OP_DIFF | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2)
                    )
                elif (
                    -32 <= dg <= 31 and -8 <= dr_dg <= 7 and -8 <= db_dg <= 7
                ):
                    out.append(_OP_LUMA | (dg + 32))
                    out.append(((dr_dg + 8) << 4) | (db_dg + 8))
                else:
                    out.append(_OP_RGB)
                    out += bytes((r, g, b))
            else:
                out.append(_OP_RGBA)
                out += bytes((r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(_OP_RUN | (run - 1))
    out += _END
    return bytes(out)
