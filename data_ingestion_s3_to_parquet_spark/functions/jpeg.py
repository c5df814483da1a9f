"""Baseline JPEG codec — pure stdlib ``struct`` + numpy, no codec
library (the container has no PIL/libjpeg; reference parity for the
`_decode_stub` seam, same discipline as the PNG decoder's five-filter
spec implementation in ``operators/multimodal.py``).

Scope (decoder): baseline sequential DCT (SOF0), 8-bit, grayscale or
YCbCr with arbitrary sampling factors (4:4:4 and 4:2:0 are the tested
paths), interleaved single-scan, 8/16-bit DQT, restart markers, byte
stuffing. Progressive (SOF2), arithmetic coding, and 12-bit raise
``NotImplementedError`` — a poison or exotic payload costs one corpus
row (``media_decode``'s ok/err contract), never a stage.

Scope (encoder): SOF0, quality-scaled quantization (tables travel in
DQT, so decoders never need to know the formula), 4:4:4 or 4:2:0
chroma subsampling, and per-image canonical Huffman tables emitted in
DHT. The encoder assigns all used symbols codes of ONE length L with
2^L strictly greater than the symbol count — deliberately suboptimal
compression, but trivially valid (canonical, ≤ 16 bits, and the
all-ones code is never assigned, which also keeps 0xFF bytes rarer in
the scan). Correctness needs the TABLES to be well-formed, not
optimal; any spec-following decoder reads them from the DHT segment.

Error-prone spec constants are avoided rather than transcribed: the
zigzag order is GENERATED from the anti-diagonal walk (and pinned by a
test against the spec's first/last entries), Huffman tables are
computed per image, and quantization tables are read from the
bitstream on decode.
"""

from __future__ import annotations

import struct

import numpy as np


def zigzag_order() -> list[tuple[int, int]]:
    """The JPEG zigzag sequence as (row, col) pairs, generated from the
    anti-diagonal walk: odd diagonals are traversed row-ascending,
    even diagonals row-descending."""
    out = []
    for d in range(15):
        rows = range(0, d + 1) if d % 2 else range(d, -1, -1)
        for r in rows:
            c = d - r
            if r < 8 and c < 8:
                out.append((r, c))
    return out


_ZZ = zigzag_order()
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ], dtype=np.int64)


def _idct_basis() -> np.ndarray:
    # A[u, x] = a(u) cos((2x+1) u pi / 16); IDCT(F) = A.T @ F @ A
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = np.full((8, 1), np.sqrt(2.0 / 8.0))
    a[0, 0] = np.sqrt(1.0 / 8.0)
    return a * np.cos((2 * x + 1) * u * np.pi / 16.0)


_A = _idct_basis()


def idct2(blocks: np.ndarray) -> np.ndarray:
    """Inverse 8x8 DCT-II over a batch of blocks (..., 8, 8)."""
    return _A.T @ blocks @ _A


def dct2(blocks: np.ndarray) -> np.ndarray:
    """Forward 8x8 DCT-II over a batch of blocks (..., 8, 8)."""
    return _A @ blocks @ _A.T


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def restart(self, i: int) -> None:
        """Byte-align with 1-padding and emit RSTn — raw, unstuffed."""
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (i & 7)])

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over the entropy-coded segment, un-stuffing
    0xFF00 and surfacing RSTn / end-of-scan markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("read past marker in entropy segment")
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy segment")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = d[self.pos] if self.pos < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:  # a real marker terminates the bit stream
                self.pos += 1
                self.marker = nxt
                raise _MarkerHit(nxt)
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._n = 0
        self._acc = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ---------------------------------------------------------------------------
# huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (bits per length 1..16, symbols) → {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # {(length, code): symbol}
        self.table: dict[tuple[int, int], int] = {}
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            self.table[(length, code)] = sym

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy segment")


def _flat_huffman(symbols: list[int]) -> tuple[list[int], list[int]]:
    """All used symbols at one code length L with 2^L > len(symbols):
    canonical, ≤ 16 bits (JPEG symbol alphabets are ≤ 256), and the
    all-ones code is never assigned."""
    syms = sorted(set(symbols))
    n = max(1, len(syms))
    length = max(2, n.bit_length() + (0 if n & (n - 1) and (1 << n.bit_length()) > n else 1))
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    return bits, syms


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# encoder


def _quant_table(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Quality-scaled quantization tables. The shape follows the
    classic 1+(1+u+v)·scale example table; the exact values are
    irrelevant to interoperability because they are WRITTEN to DQT."""
    quality = min(max(int(quality), 1), 100)
    scale = max(1.0, 50.0 / quality)
    u = np.arange(8).reshape(8, 1)
    v = np.arange(8).reshape(1, 8)
    lum = np.clip(np.round(1 + (1 + u + v) * scale), 1, 255).astype(np.int64)
    chroma = np.clip(lum * 2, 1, 255).astype(np.int64)
    return lum, chroma


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Pad a 2-D plane to 8-multiples (edge replicate) and return the
    (n_by, n_bx, 8, 8) block view."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    by, bx = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(by, 8, bx, 8).swapaxes(1, 2), by, bx


def _encode_component_coefs(plane: np.ndarray, q: np.ndarray):
    blocks, by, bx = _blocks_of(plane.astype(np.float64) - 128.0)
    coefs = np.round(dct2(blocks) / q).astype(np.int64)
    return coefs, by, bx


def _rle_block(zz: np.ndarray, prev_dc: int):
    """One block's zigzag coefficients → (dc_symbol, dc_bits),
    [(ac_symbol, ac_bits)…], new_dc."""
    dc = int(zz[0])
    diff = dc - prev_dc
    t = _category(diff)
    dc_bits = (diff if diff >= 0 else diff + (1 << t) - 1, t)
    acs = []
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, (0, 0)))  # ZRL
            run -= 16
        s = _category(v)
        acs.append(((run << 4) | s, (v if v >= 0 else v + (1 << s) - 1, s)))
        run = 0
    if last_nz < 63:
        acs.append((0x00, (0, 0)))  # EOB
    return (t, dc_bits), acs, dc


def encode_jpeg(
    img: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "444",
    restart_every: int = 0,
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline JFIF JPEG. ``subsampling``: "444" or "420" (RGB only);
    ``restart_every`` emits a DRI segment and RSTn markers every that
    many MCUs (0 = none) — the error-resilience feature real encoders
    use so a corrupt byte costs one restart interval, not the image."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    lum_q, chroma_q = _quant_table(quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            ph, pw = -h % 2, -w % 2
            cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "444":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        planes = [y, cb, cr]
        qsel = [0, 1, 1]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qtables = [lum_q] + ([chroma_q] if not gray else [])

    # per-component quantized coefficient grids, sized to whole MCUs
    comp_coefs = []
    for plane, (sh, sv), qs in zip(planes, samp, qsel):
        ch = -(-h * sv // vmax)  # component pixel dims
        cw = -(-w * sh // hmax)
        pl = plane[:ch, :cw] if plane.shape == (h, w) else plane
        # pad the component plane so its block grid covers whole MCUs
        mby = -(-h // (8 * vmax)) * sv
        mbx = -(-w // (8 * hmax)) * sh
        pl = np.pad(
            pl,
            ((0, mby * 8 - pl.shape[0]), (0, mbx * 8 - pl.shape[1])),
            mode="edge",
        )
        coefs, by, bx = _encode_component_coefs(pl, qtables[qs])
        comp_coefs.append((coefs, by, bx))

    # entropy pass 1: collect symbols; pass 2: write bits
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (sh, sv) in enumerate(samp):
                    for byy in range(sv):
                        for bxx in range(sh):
                            yield ci, my * sv + byy, mx * sh + bxx

    n_comp = len(planes)
    blocks_per_mcu = sum(sh * sv for sh, sv in samp)
    dc_syms: list[list[int]] = [[] for _ in range(2)]
    ac_syms: list[list[int]] = [[] for _ in range(2)]
    pred = [0] * n_comp
    encoded: list = []
    rst_cnt = 0
    for bi, (ci, brow, bcol) in enumerate(mcu_blocks()):
        if (
            restart_every
            and bi
            and bi % (blocks_per_mcu * restart_every) == 0
        ):
            encoded.append(("RST", rst_cnt))
            rst_cnt += 1
            pred = [0] * n_comp  # DC predictors reset at every RSTn
        coefs = comp_coefs[ci][0]
        zz = coefs[brow, bcol].reshape(64)[_ZZ_FLAT]
        (t, dc_bits), acs, pred[ci] = _rle_block(zz, pred[ci])
        tsel = 0 if ci == 0 else 1
        dc_syms[tsel].append(t)
        ac_syms[tsel].extend(s for s, _ in acs)
        encoded.append((tsel, (t, dc_bits), acs))

    n_tables = 1 if gray else 2
    dc_tabs = [_flat_huffman(dc_syms[i] or [0]) for i in range(n_tables)]
    ac_tabs = [_flat_huffman(ac_syms[i] or [0]) for i in range(n_tables)]
    dc_codes = [_canonical_codes(*t) for t in dc_tabs]
    ac_codes = [_canonical_codes(*t) for t in ac_tabs]

    bw = _BitWriter()
    for item in encoded:
        if item[0] == "RST":
            bw.restart(item[1])
            continue
        tsel, (t, (vbits, nb)), acs = item
        code, length = dc_codes[tsel][t]
        bw.write(code, length)
        bw.write(vbits, nb)
        for sym, (avbits, anb) in acs:
            code, length = ac_codes[tsel][sym]
            bw.write(code, length)
            bw.write(avbits, anb)
    scan = bw.flush()

    # ---- assemble the stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qtables):
        zzq = q.reshape(64)[_ZZ_FLAT]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(int(x) for x in zzq)
    if restart_every:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_every)
    # SOF0
    ncomp = len(planes)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        out += bytes([ci + 1, (sh << 4) | sv, qsel[ci]])
    # DHT
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits, vals) in enumerate(tabs):
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals))
            out += bytes([(cls << 4) | ti]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        tsel = 0 if ci == 0 else 1
        out += bytes([ci + 1, (tsel << 4) | tsel])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to a (h, w, 3) RGB uint8 array (grayscale
    replicates into all three channels)."""
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    sof = None
    restart = 0
    n = len(payload)

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected in JPEG stream")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2:
            raise ValueError("invalid JPEG segment length")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0xF
                sp += 1
                if pq == 0:
                    vals = np.frombuffer(seg, dtype=np.uint8, count=64, offset=sp).astype(np.int64)
                    sp += 64
                else:
                    vals = np.frombuffer(seg, dtype=">u2", count=64, offset=sp).astype(np.int64)
                    sp += 128
                t = np.zeros(64, dtype=np.int64)
                t[_ZZ_FLAT] = vals
                qt[tq] = t.reshape(8, 8)
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, hh, ww, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            sof = (hh, ww, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential JPEG supported (SOF marker 0x{marker:02x})"
            )
        elif marker == 0xC4:  # DHT (possibly several tables)
            sp = 0
            while sp < len(seg):
                cls, ti = seg[sp] >> 4, seg[sp] & 0xF
                bits = list(seg[sp + 1 : sp + 17])
                cnt = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + cnt])
                sp += 17 + cnt
                (huff_dc if cls == 0 else huff_ac)[ti] = _HuffDecoder(bits, vals)
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for ci in range(ns):
                cs, tsel = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_sel.append((cs, tsel >> 4, tsel & 0xF))
            return _decode_scan(
                payload, pos + seglen, sof, scan_sel, qt, huff_dc, huff_ac, restart
            )
        pos += seglen
    raise ValueError("JPEG stream ended before SOS")


def _decode_scan(data, pos, sof, scan_sel, qt, huff_dc, huff_ac, restart):
    h, w, comps = sof
    if len(scan_sel) != len(comps):
        raise NotImplementedError("non-interleaved multi-scan JPEG not supported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    by_comp = []
    order = []  # (comp_index, block_row, block_col) in scan order
    for idx, (cid, sh, sv, tq) in enumerate(comps):
        by, bx = mcuy * sv, mcux * sh
        by_comp.append(np.zeros((by, bx, 8, 8), dtype=np.float64))
    for my in range(mcuy):
        for mx in range(mcux):
            for idx, (cid, sh, sv, tq) in enumerate(comps):
                for byy in range(sv):
                    for bxx in range(sh):
                        order.append((idx, my * sv + byy, mx * sh + bxx))

    sel = {}
    for cs, td, ta in scan_sel:
        for idx, (cid, *_rest) in enumerate(comps):
            if cid == cs:
                sel[idx] = (huff_dc[td], huff_ac[ta])
    if len(sel) != len(comps):
        raise ValueError("scan component selector does not match SOF")

    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    blocks_per_mcu = sum(c[1] * c[2] for c in comps)
    mcu_done = 0
    i = 0
    zz = np.zeros(64, dtype=np.int64)
    try:
        while i < len(order):
            idx, brow, bcol = order[i]
            dc_t, ac_t = sel[idx]
            zz[:] = 0
            t = dc_t.decode(br)
            pred[idx] += _extend(br.receive(t), t)
            zz[0] = pred[idx]
            k = 1
            while k < 64:
                rs = ac_t.decode(br)
                r, s = rs >> 4, rs & 0xF
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC run past block end")
                zz[k] = _extend(br.receive(s), s)
                k += 1
            deq = np.zeros(64, dtype=np.int64)
            deq[_ZZ_FLAT] = zz * qt[comps[idx][3]].reshape(64)[_ZZ_FLAT]
            by_comp[idx][brow, bcol] = deq.reshape(8, 8)
            i += 1
            if i % blocks_per_mcu == 0:
                mcu_done += 1
                if restart and mcu_done % restart == 0 and i < len(order):
                    br.align()
                    # expect RSTn next in the byte stream
                    p = br.pos
                    if (
                        p + 1 < len(data)
                        and data[p] == 0xFF
                        and 0xD0 <= data[p + 1] <= 0xD7
                    ):
                        br.pos = p + 2
                    pred = [0] * len(comps)
    except _MarkerHit as m:
        if 0xD0 <= m.marker <= 0xD7:
            raise ValueError("unexpected restart marker") from m
        raise ValueError("entropy segment ended early") from m

    # IDCT all blocks per component, assemble planes, upsample, crop
    planes = []
    for idx, (cid, sh, sv, tq) in enumerate(comps):
        px = idct2(by_comp[idx]) + 128.0
        by, bx = px.shape[0], px.shape[1]
        plane = px.swapaxes(1, 2).reshape(by * 8, bx * 8)
        plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
