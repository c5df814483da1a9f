"""GIF87a/89a codec — pure stdlib + numpy, no codec library (the
same from-spec discipline as ``functions/jpeg.py`` and the PNG
decoder). GIF matters here as the one ANIMATION container decodable
without external codecs: it gives the media pipeline a real
multi-frame decode path (frame sampling, per-frame features), and it
is LOSSLESS, so round-trip tests assert exact pixel equality instead
of error bounds.

Decoder scope: 87a and 89a, global/local color tables, interlaced
images, variable-width LZW (LSB-first bit packing, clear/end codes,
4096-entry dictionary), multi-frame animations with graphic-control
extensions (frame delays, disposal methods 0/1 "leave" and 2
"restore background", transparency). Malformed streams raise —
``media_decode``'s per-row ok/err contract absorbs them.

Encoder scope (for test vectors): multi-frame 89a with one global
color table, transparency-free, disposal "leave", and the classic
literal-code LZW stream — every pixel emitted as its own literal code
with a clear code whenever the dictionary would otherwise grow the
code width (valid LZW, no compression). Correctness needs a
well-formed stream, not a small one.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# decoder


class _LSBReader:
    """LSB-first bit reader over concatenated LZW sub-block data."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read(self, nbits: int) -> int:
        while self._n < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated LZW stream")
            self._acc |= self.data[self.pos] << self._n
            self._n += 8
            self.pos += 1
        v = self._acc & ((1 << nbits) - 1)
        self._acc >>= nbits
        self._n -= nbits
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    br = _LSBReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    def reset():
        return {i: (i,) for i in range(clear)}, min_code_size + 1

    table, width = reset()
    prev: tuple[int, ...] | None = None
    next_code = end + 1
    while n_out < n_pixels:
        code = br.read(width)
        if code == clear:
            table, width = reset()
            next_code = end + 1
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError("invalid LZW code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = entry[:take]
        n_out += take
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_pixels:
        raise ValueError("LZW stream ended before the frame was full")
    return out


def _deinterlace(idx: np.ndarray, h: int, w: int) -> np.ndarray:
    img = idx.reshape(h, w)
    out = np.empty_like(img)
    rows = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    for src, dst in enumerate(rows):
        out[dst] = img[src]
    return out


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF to ``{"width", "height", "frames": [(h, w, 3)
    uint8 ...], "delays_cs": [...]}`` — frames fully composited per
    the disposal method."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay = 0

    def subblocks(p: int) -> tuple[bytes, int]:
        chunks = []
        while True:
            if p >= len(payload):
                raise ValueError("truncated GIF sub-blocks")
            n = payload[p]
            p += 1
            if n == 0:
                break
            chunks.append(payload[p : p + n])
            p += n
        return b"".join(chunks), p

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = subblocks(pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags, delay = data[0], struct.unpack_from("<H", data, 1)[0]
                disposal = (flags >> 2) & 0x7
                transparent = data[3] if flags & 1 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            ct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame without a color table")
        min_code = payload[pos]
        pos += 1
        data, pos = subblocks(pos)
        idx = _lzw_decode(min_code, data, fw * fh)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fh, fw)
        else:
            idx = idx.reshape(fh, fw)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF pixel index outside color table")

        before = canvas.copy() if disposal == 3 else None
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:  # restore to background color
            bgc = ct[bg] if bg < len(ct) else 0
            canvas[fy : fy + fh, fx : fx + fw] = bgc
        elif disposal == 3 and before is not None:  # restore to previous
            canvas = before
        transparent, disposal, delay = None, 0, 0

    if not frames:
        raise ValueError("GIF contains no image data")
    return {"width": w, "height": h, "frames": frames, "delays_cs": delays}


# ---------------------------------------------------------------------------
# encoder (test vectors)


class _LSBWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, nbits: int) -> None:
        self._acc |= code << self._n
        self._n += nbits
        while self._n >= 8:
            self.bytes.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.bytes.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.bytes)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real GIF LZW: emit-then-add, width grows when the newly
    assigned code reaches 2^width (the decoder's mirror rule fires one
    received-code later, which is exactly its one-add lag), clear +
    reset when the 12-bit dictionary fills."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LSBWriter()

    def fresh():
        return {(i,): i for i in range(clear)}, min_code_size + 1, end + 1

    table, width, next_code = fresh()
    bw.write(clear, width)
    prefix: tuple[int, ...] = ()
    for v in map(int, indices.reshape(-1)):
        cand = prefix + (v,)
        if cand in table:
            prefix = cand
            continue
        bw.write(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:  # dictionary full: clear and start over
            bw.write(clear, width)
            table, width, next_code = fresh()
        prefix = (v,)
    if prefix:
        bw.write(table[prefix], width)
    bw.write(end, width)
    return bw.flush()


def _lzw_encode_literals(min_code_size: int, indices: np.ndarray) -> bytes:
    """Valid no-compression LZW: every pixel as a literal code, with a
    clear code re-emitted before the decoder's table would widen the
    code. Width stays at min_code_size+1 throughout."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    # decoder's next_code starts at end+1 and grows by 1 per literal
    # after the first; re-clear while it still fits in `width` bits
    budget = (1 << width) - end - 2
    bw = _LSBWriter()
    bw.write(clear, width)
    since_clear = 0
    for v in indices.reshape(-1):
        if since_clear >= max(1, budget):
            bw.write(clear, width)
            since_clear = 0
        bw.write(int(v), width)
        since_clear += 1
    bw.write(end, width)
    return bw.flush()


def encode_gif(
    frames: list[np.ndarray],
    *,
    delays_cs: list[int] | None = None,
    lzw: str = "real",
) -> bytes:
    """Encode RGB uint8 frames (all same shape, ≤ 256 distinct colors
    across the animation) as an 89a GIF with one global color table.
    ``lzw="real"`` compresses (exercises the decoder's dictionary
    growth, width changes, and KwKwK path); ``"literal"`` emits the
    no-compression literal/clear stream (exercises repeated clears)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    stack = np.stack([np.asarray(f, dtype=np.uint8) for f in frames])
    if stack.shape[1:] != (h, w, 3):
        raise ValueError("frames must share one (h, w, 3) shape")
    colors, inverse = np.unique(
        stack.reshape(-1, 3), axis=0, return_inverse=True
    )
    if len(colors) > 256:
        raise ValueError("more than 256 distinct colors")
    idx = inverse.reshape(len(frames), h, w).astype(np.uint8)
    # color table size: power of two ≥ max(2, n_colors)
    bits = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_ct = 1 << bits
    table = np.zeros((n_ct, 3), dtype=np.uint8)
    table[: len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x7), 0, 0)
    out += table.tobytes()
    delays = delays_cs or [0] * len(frames)
    min_code = max(2, bits)
    for f, d in zip(idx, delays):
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack("<H", d) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([min_code])
        enc = _lzw_encode if lzw == "real" else _lzw_encode_literals
        stream = enc(min_code, f)
        for i in range(0, len(stream), 255):
            chunk = stream[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def probe_gif(payload: bytes) -> dict:
    """Metadata-only GIF probe: dimensions, frame count, and total
    animation duration from the block structure — sub-blocks are
    SKIPPED by their length prefixes, no LZW decode (the cheap
    corpus-filter path; :func:`decode_gif` is the pixel path)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    total_cs = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                (delay,) = struct.unpack_from("<H", payload, pos + 2)
                total_cs += delay
            while payload[pos]:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            n_frames += 1
            lpacked = payload[pos + 9]
            pos += 10
            if lpacked & 0x80:  # local color table
                pos += 3 * (2 << (lpacked & 0x07))
            pos += 1  # LZW min code size
            while payload[pos]:  # skip data sub-blocks
                pos += 1 + payload[pos]
            pos += 1
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
    if not n_frames:
        raise ValueError("GIF has no image frames")
    return {
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "duration_sec": round(total_cs / 100.0, 3),
    }
