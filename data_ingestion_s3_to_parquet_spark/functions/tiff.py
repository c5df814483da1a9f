"""Baseline TIFF decode/encode — pure ``struct`` + numpy, no codec
library (the scanned-document / scientific-imaging half of the image
corpus story; reference scope: /root/reference has no media handling
at all — this is Layer-B extension surface like ``jpeg.py``/``gif.py``).

Implemented from the published TIFF 6.0 layout: II/MM byte-order
marker, magic 42, 12-byte IFD entries of (tag, type, count,
value-or-offset), strip-organized sample data. Coverage is the
baseline bilevel/grayscale/RGB profile every writer can produce:

- 8 bits per sample, 1 (grayscale) or 3 (RGB) samples per pixel,
  chunky planar config;
- PhotometricInterpretation 0 (WhiteIsZero, inverted on decode),
  1 (BlackIsZero), 2 (RGB);
- Compression 1 (none) and 32773 (PackBits — the spec's byte-run RLE,
  decoded here from its definition);
- any strip layout (StripOffsets / StripByteCounts / RowsPerStrip),
  both byte orders.

Everything else (LZW, JPEG-in-TIFF, tiles, planar=2, 16-bit) raises
``NotImplementedError`` with the offending tag value — the honest-seam
rule, same as ``jpeg.py``'s exotic-JPEG rejections.

:func:`probe_tiff` returns header-only metadata (dims, compression,
photometric, strip count) without touching strip data — the cheap
corpus-filter path ``media_probe`` uses. :func:`encode_tiff` builds
spec-valid test vectors (uncompressed or PackBits, either byte order)
so decode is pinned by lossless round-trips, like ``gif.py``.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}

TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SPP = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279
TAG_PLANAR = 284
TAG_PREDICTOR = 317

COMPRESSION_NONE = 1
COMPRESSION_PACKBITS = 32773


def _header(payload: bytes) -> tuple[str, int]:
    if payload[:2] == b"II":
        end = "<"
    elif payload[:2] == b"MM":
        end = ">"
    else:
        raise ValueError("not a TIFF payload (no II/MM byte-order marker)")
    magic, ifd0 = struct.unpack_from(end + "HI", payload, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    return end, ifd0


def _read_ifd_values(payload: bytes, off: int, end: str) -> dict[int, tuple]:
    """tag → tuple of decoded integer values for one IFD (BYTE / SHORT
    / LONG entries; RATIONAL returns (num, den) pairs)."""
    if off + 2 > len(payload):
        raise ValueError("IFD offset out of bounds")
    (n,) = struct.unpack_from(end + "H", payload, off)
    out: dict[int, tuple] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack_from(end + "HHI", payload, e)
        if typ not in _TYPE_SIZE:
            continue  # unknown type: skip entry, per spec readers must
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            base = e + 8
        else:
            (base,) = struct.unpack_from(end + "I", payload, e + 8)
        if typ == 5:  # RATIONAL
            out[tag] = tuple(
                struct.unpack_from(end + "II", payload, base + 8 * j)
                for j in range(cnt)
            )
        elif typ == 2:  # ASCII
            out[tag] = (payload[base : base + cnt].split(b"\x00")[0],)
        else:
            fmt = _TYPE_FMT[typ]
            out[tag] = struct.unpack_from(end + fmt * cnt, payload, base)
    return out


def unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (Apple RLE, TIFF spec §9) decode: control byte n in
    [0, 127] copies n+1 literals, n in [-127, -1] repeats the next
    byte 1-n times, -128 is a no-op. Stops at ``expected`` bytes."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n == 128:  # no-op
            continue
        else:  # replicate next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
    if len(out) < expected:
        raise ValueError(
            f"PackBits strip underflow: {len(out)} < {expected} bytes"
        )
    return bytes(out[:expected])


def packbits(data: bytes) -> bytes:
    """PackBits encode (for :func:`encode_tiff` test vectors): greedy
    runs — ≥ 2 equal bytes become a replicate run, else literals."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit = i
        while (
            i < n
            and i - lit < 128
            and not (i + 1 < n and data[i + 1] == data[i])
        ):
            i += 1
        out += bytes([i - lit - 1]) + data[lit:i]
    return bytes(out)


def probe_tiff(payload: bytes) -> dict:
    """Header-only TIFF metadata: dims, samples/pixel, compression,
    photometric, strip count — no strip data is read."""
    end, ifd0 = _header(payload)
    t = _read_ifd_values(payload, ifd0, end)
    if TAG_WIDTH not in t or TAG_HEIGHT not in t:
        raise ValueError("TIFF IFD0 missing ImageWidth/ImageLength")
    return {
        "width": int(t[TAG_WIDTH][0]),
        "height": int(t[TAG_HEIGHT][0]),
        "samples_per_pixel": int(t.get(TAG_SPP, (1,))[0]),
        "bits_per_sample": tuple(int(b) for b in t.get(TAG_BITS, (1,))),
        "compression": int(t.get(TAG_COMPRESSION, (1,))[0]),
        "photometric": int(t.get(TAG_PHOTOMETRIC, (1,))[0]),
        "n_strips": len(t.get(TAG_STRIP_OFFSETS, ())),
        "byte_order": "little" if end == "<" else "big",
    }


def decode_tiff(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB uint8 pixels of a baseline TIFF (module
    docstring for the supported profile)."""
    end, ifd0 = _header(payload)
    t = _read_ifd_values(payload, ifd0, end)
    w = int(t[TAG_WIDTH][0])
    h = int(t[TAG_HEIGHT][0])
    spp = int(t.get(TAG_SPP, (1,))[0])
    bits = t.get(TAG_BITS, (8,) * spp)
    comp = int(t.get(TAG_COMPRESSION, (1,))[0])
    photo = int(t.get(TAG_PHOTOMETRIC, (1,))[0])
    planar = int(t.get(TAG_PLANAR, (1,))[0])
    predictor = int(t.get(TAG_PREDICTOR, (1,))[0])
    if any(int(b) != 8 for b in bits):
        raise NotImplementedError(f"only 8 bits/sample (BitsPerSample={bits})")
    if spp not in (1, 3):
        raise NotImplementedError(f"only 1 or 3 samples/pixel (SPP={spp})")
    if comp not in (COMPRESSION_NONE, COMPRESSION_PACKBITS):
        raise NotImplementedError(f"unsupported Compression={comp}")
    if photo not in (0, 1, 2):
        raise NotImplementedError(f"unsupported Photometric={photo}")
    if planar != 1:
        raise NotImplementedError(f"only chunky planar config (={planar})")
    if predictor != 1:
        raise NotImplementedError(f"only Predictor=1 (={predictor})")
    if TAG_STRIP_OFFSETS not in t:
        raise ValueError("TIFF without StripOffsets")
    offsets = t[TAG_STRIP_OFFSETS]
    counts = t.get(TAG_STRIP_COUNTS, ())
    rows_per_strip = int(t.get(TAG_ROWS_PER_STRIP, (h,))[0])
    row_bytes = w * spp
    raw = bytearray()
    for i, off in enumerate(offsets):
        rows = min(rows_per_strip, h - i * rows_per_strip)
        if rows <= 0:
            break
        expected = rows * row_bytes
        if i < len(counts):
            strip = payload[off : off + int(counts[i])]
        else:  # counts omitted: only valid uncompressed
            strip = payload[off : off + expected]
        if comp == COMPRESSION_PACKBITS:
            raw += unpackbits(strip, expected)
        else:
            if len(strip) < expected:
                raise ValueError(
                    f"strip {i} truncated: {len(strip)} < {expected}"
                )
            raw += strip[:expected]
    if len(raw) != h * row_bytes:
        raise ValueError(
            f"sample data {len(raw)} bytes != {h}x{row_bytes} expected"
        )
    px = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if photo == 0:  # WhiteIsZero: invert to the usual scale
        px = 255 - px
    if spp == 1:
        px = np.repeat(px, 3, axis=2)
    return np.ascontiguousarray(px)


def encode_tiff(
    img: np.ndarray,
    *,
    compression: int = COMPRESSION_NONE,
    byte_order: str = "<",
    rows_per_strip: int | None = None,
    photometric: int | None = None,
) -> bytes:
    """Spec-valid baseline TIFF bytes for an (h, w, 3) RGB or (h, w)
    grayscale uint8 array — the test-vector builder
    (:func:`decode_tiff`'s round-trip twin)."""
    end = byte_order
    if end not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3):
        raise ValueError(f"1 or 3 channels required (got {spp})")
    photo = photometric if photometric is not None else (2 if spp == 3 else 1)
    rps = rows_per_strip or max(1, h // 2)  # ≥2 strips exercises the loop
    data = img.tobytes()
    row_bytes = w * spp
    strips = []
    for r0 in range(0, h, rps):
        rows = min(rps, h - r0)
        strip = data[r0 * row_bytes : (r0 + rows) * row_bytes]
        strips.append(
            packbits(strip) if compression == COMPRESSION_PACKBITS else strip
        )

    entries = []  # (tag, type, values)
    entries.append((TAG_WIDTH, 3, (w,)))
    entries.append((TAG_HEIGHT, 3, (h,)))
    entries.append((TAG_BITS, 3, (8,) * spp))
    entries.append((TAG_COMPRESSION, 3, (compression,)))
    entries.append((TAG_PHOTOMETRIC, 3, (photo,)))
    entries.append((TAG_SPP, 3, (spp,)))
    entries.append((TAG_ROWS_PER_STRIP, 3, (rps,)))
    entries.append((TAG_STRIP_COUNTS, 4, tuple(len(s) for s in strips)))
    entries.append((TAG_STRIP_OFFSETS, 4, (0,) * len(strips)))  # patched
    entries.sort()

    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    data_off = ifd_off + ifd_size
    body = bytearray()

    def pack(fmt, *v):
        return struct.pack(end + fmt, *v)

    # first pass: out-of-line value data (except strips)
    value_bytes: dict[int, bytes] = {}
    for tag, typ, values in entries:
        fmt = _TYPE_FMT[typ]
        value_bytes[tag] = b"".join(pack(fmt, v) for v in values)
    # lay out oversize entry values, then strips
    placed: dict[int, int] = {}
    for tag, typ, values in entries:
        vb = value_bytes[tag]
        if len(vb) > 4:
            placed[tag] = data_off + len(body)
            body += vb
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_off + len(body))
        body += s
    # rebuild the strip-offsets entry with real positions
    value_bytes[TAG_STRIP_OFFSETS] = b"".join(
        pack("I", o) for o in strip_offsets
    )
    if len(value_bytes[TAG_STRIP_OFFSETS]) > 4:
        # overwrite the placeholder bytes in the body
        pos = placed[TAG_STRIP_OFFSETS] - data_off
        body[pos : pos + len(value_bytes[TAG_STRIP_OFFSETS])] = value_bytes[
            TAG_STRIP_OFFSETS
        ]

    ifd = pack("H", len(entries))
    for tag, typ, values in entries:
        vb = value_bytes[tag]
        if len(vb) <= 4:
            val = vb + b"\x00" * (4 - len(vb))
        else:
            val = pack("I", placed[tag])
        ifd += pack("HHI", tag, typ, len(values)) + val
    ifd += pack("I", 0)
    bom = b"II" if end == "<" else b"MM"
    return bom + pack("HI", 42, ifd_off) + ifd + bytes(body)
