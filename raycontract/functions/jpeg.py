"""Pure-numpy baseline JPEG (JFIF) encoder + decoder.

Implemented from the public ITU-T T.81 specification (baseline sequential
DCT, 8-bit, Huffman): the north-star invariant "decoded-pixel allclose,
PSNR ≥ 40 dB for lossy formats" (BASELINE.json) needs a REAL lossy codec in
an environment with no Pillow/libjpeg — this module provides one. The
reference CLI never decodes pixels (it validates metadata/SQL only); the
pixel-level conformance stage is the Ray-native extension
(``stages/image.py``), and with this codec its lossy branch is reachable.

Scope (honest bounds):
- encode: 8-bit RGB, 4:2:0 or 4:4:4, Annex-K-style quantization scaled by
  libjpeg's quality curve, standard Huffman tables, interleaved single scan.
- decode: baseline sequential DCT (SOF0), Huffman tables read from the
  bitstream's own DHT segments (so round-trip correctness never depends on
  table constants), 8-bit, 1- or 3-component, optional restart markers.
  Progressive (SOF2) and arithmetic coding raise ``ImageDecodeError``.

Performance note: DCT/IDCT, quantization, color transforms and up/down-
sampling are vectorized over all blocks at once (einsum); the entropy
coder is a per-symbol Python loop — inherent to Huffman bit streams —
so this codec is for fixture synthesis and sampled conformance checks,
not the 1M-image bench hot path (which stays on the lossless codecs).
"""

from __future__ import annotations

import struct

import numpy as np

from raycontract.functions.codecs import ImageDecodeError

# ------------------------------------------------------------- constants

_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)

_QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# standard-style Huffman specs (BITS counts per code length 1..16, then the
# symbol values in canonical order). The DECODER always reads tables from
# the file's DHT segments, so round-trip fidelity does not depend on these.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))

_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _zigzag_order() -> np.ndarray:
    """Generate the 8×8 zigzag scan order algorithmically (diagonal walk)
    rather than as a constant — immune to transcription errors."""
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # moving up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # moving down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return np.array(order, dtype=np.int64)


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct8() -> np.ndarray:
    k = np.arange(8)[:, None]
    i = np.arange(8)[None, :]
    m = 0.5 * np.cos(np.pi * (2 * i + 1) * k / 16.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_C8 = _dct8()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 1..100 → table scale."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits, vals):
    """(value → (code, length)) per T.81 C.2 canonical assignment."""
    codes, code = {}, 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            idx += 1
            code += 1
        code <<= 1
    return codes


# --------------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ImageDecodeError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ImageDecodeError("truncated JPEG entropy stream")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ImageDecodeError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.acc = 0
        self.nbits = 0

    def skip_restart(self):
        # consume the FFDx marker that _fill flagged
        self.pos += 1
        self.align()


class _RestartMarker(Exception):
    def __init__(self, code):
        self.code = code


# -------------------------------------------------------------- encoder


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _blocks(plane: np.ndarray) -> np.ndarray:
    """(H/8 * W/8, 8, 8) raster-ordered blocks of a padded plane."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    f = np.einsum("ij,njk,lk->nil", _C8, blocks - 128.0, _C8)
    q = np.round(f / qtab.reshape(8, 8)).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZIGZAG]  # zigzagged coefficients


def _magnitude(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_scan(comp_blocks, dc_codes, ac_codes, mcu_layout) -> bytes:
    """comp_blocks: per component, (n_blocks, 64) zigzag coeffs in raster
    order; mcu_layout: per component, (blocks_per_mcu_row, blocks_per_mcu_col,
    blocks_per_row_total). Interleaved MCU order per T.81 A.2.3."""
    w = _BitWriter()
    n_mcus_x = mcu_layout[0][3]
    n_mcus_y = mcu_layout[0][4]
    pred = [0] * len(comp_blocks)
    for my in range(n_mcus_y):
        for mx in range(n_mcus_x):
            for ci, coeffs in enumerate(comp_blocks):
                hs, vs, bw, _, _ = mcu_layout[ci]
                for by in range(vs):
                    for bx in range(hs):
                        row = my * vs + by
                        col = mx * hs + bx
                        block = coeffs[row * bw + col]
                        dct, act = dc_codes[ci], ac_codes[ci]
                        # DC
                        diff = int(block[0]) - pred[ci]
                        pred[ci] = int(block[0])
                        size = _magnitude(diff)
                        code, length = dct[size]
                        w.write(code, length)
                        if size:
                            amp = diff if diff > 0 else diff + (1 << size) - 1
                            w.write(amp, size)
                        # AC
                        run = 0
                        for k in range(1, 64):
                            v = int(block[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                zc, zl = act[0xF0]  # ZRL
                                w.write(zc, zl)
                                run -= 16
                            size = _magnitude(v)
                            code, length = act[(run << 4) | size]
                            w.write(code, length)
                            amp = v if v > 0 else v + (1 << size) - 1
                            w.write(amp, size)
                            run = 0
                        if run:
                            ec, el = act[0x00]  # EOB
                            w.write(ec, el)
    w.flush()
    return bytes(w.buf)


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: bool = True) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as baseline JFIF. ``subsample``
    picks 4:2:0 (True) or 4:4:4 chroma."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ImageDecodeError("encode_jpeg expects (H, W, 3) RGB")
    h, w = img.shape[:2]
    ycc = _rgb_to_ycbcr(img)
    qlum = _scaled_quant(_QUANT_LUM, quality)
    qchrom = _scaled_quant(_QUANT_CHROM, quality)

    if subsample:
        ypad = _pad_edge(ycc[..., 0], 16, 16)
        cb = _pad_edge(ycc[..., 1], 16, 16)
        cr = _pad_edge(ycc[..., 2], 16, 16)
        # 2×2 box average
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        ypad = _pad_edge(ycc[..., 0], 8, 8)
        cb = _pad_edge(ycc[..., 1], 8, 8)
        cr = _pad_edge(ycc[..., 2], 8, 8)
        samp = [(1, 1), (1, 1), (1, 1)]

    planes = [ypad, cb, cr]
    qtabs = [qlum, qchrom, qchrom]
    coeffs, layout = [], []
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    n_mcus_x = (ypad.shape[1] + 8 * hmax - 1) // (8 * hmax)
    n_mcus_y = (ypad.shape[0] + 8 * vmax - 1) // (8 * vmax)
    for (hs, vs), plane, qt in zip(samp, planes, qtabs):
        coeffs.append(_fdct_quant(_blocks(plane), qt))
        layout.append((hs, vs, plane.shape[1] // 8, n_mcus_x, n_mcus_y))

    dc_specs = [(_DC_LUM_BITS, _DC_LUM_VALS), (_DC_CHROM_BITS, _DC_CHROM_VALS),
                (_DC_CHROM_BITS, _DC_CHROM_VALS)]
    ac_specs = [(_AC_LUM_BITS, _AC_LUM_VALS), (_AC_CHROM_BITS, _AC_CHROM_VALS),
                (_AC_CHROM_BITS, _AC_CHROM_VALS)]
    dc_codes = [_canonical_codes(*dc_specs[0]), _canonical_codes(*dc_specs[1]),
                _canonical_codes(*dc_specs[1])]
    ac_codes = [_canonical_codes(*ac_specs[0]), _canonical_codes(*ac_specs[1]),
                _canonical_codes(*ac_specs[1])]

    scan = _encode_scan(coeffs, dc_codes, ac_codes, layout)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq, qt in ((0, qlum), (1, qchrom)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) \
            + bytes(int(x) for x in qt[_ZIGZAG])  # DQT stores zigzag order
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, h, w, 3)
    for cid, (hs, vs), tq in zip((1, 2, 3), samp, (0, 1, 1)):
        out += bytes([cid, (hs << 4) | vs, tq])
    # DHT ×4
    for tc, th, (bits, vals) in ((0, 0, dc_specs[0]), (0, 1, dc_specs[1]),
                                 (1, 0, ac_specs[0]), (1, 1, ac_specs[1])):
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * 3, 3)
    for cid, tsel in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tsel])
    out += b"\x00\x3f\x00"  # Ss, Se, AhAl
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------------------- decoder


class _HuffTable:
    __slots__ = ("lut",)

    def __init__(self, bits, vals):
        self.lut = {}
        code, idx = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[idx]
                idx += 1
                code += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise ImageDecodeError("invalid Huffman code in JPEG scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to an (H, W, 3) uint8 RGB array (grayscale
    JPEGs are replicated to 3 channels)."""
    if not data.startswith(b"\xff\xd8"):
        raise ImageDecodeError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    while pos < len(data):
        if pos + 1 >= len(data):
            raise ImageDecodeError("truncated JPEG (mid-marker)")
        if data[pos] != 0xFF:
            raise ImageDecodeError("bad marker alignment")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ImageDecodeError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise ImageDecodeError("truncated JPEG (no segment length)")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if pos + seglen > len(data):
            raise ImageDecodeError("truncated JPEG segment")
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (may hold several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ImageDecodeError("16-bit quant tables unsupported")
                z = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = z  # stored zigzagged
                qtables[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1:i + 17])
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ImageDecodeError("truncated DHT segment")
                htables[(tc, th)] = _HuffTable(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = seg[0], struct.unpack(">H", seg[1:3])[0], \
                struct.unpack(">H", seg[3:5])[0], seg[5]
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageDecodeError(
                f"unsupported JPEG mode (marker 0xFF{marker:02X}); "
                "only baseline sequential (SOF0) is implemented")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS → entropy data follows
            ns = seg[0]
            scan_sel = {}
            for i in range(ns):
                cid, tsel = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_sel[cid] = (tsel >> 4, tsel & 0xF)
            pos += seglen
            return _decode_scan(data, pos, h, w, comps, qtables, htables,
                                scan_sel, restart_interval)
        pos += seglen
    raise ImageDecodeError("no SOS marker found")


def _decode_scan(data, pos, h, w, comps, qtables, htables, scan_sel,
                 restart_interval) -> np.ndarray:
    if comps is None:
        raise ImageDecodeError("SOS before SOF0")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    n_mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = n_mcus_x * c["h"]
        c["bh"] = n_mcus_y * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["dc"], c["ac"] = scan_sel[c["id"]]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(n_mcus_y):
        for mx in range(n_mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align()
                if (br.pos + 1 < len(data) and data[br.pos] == 0xFF
                        and 0xD0 <= data[br.pos + 1] <= 0xD7):
                    br.pos += 2
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dct = htables[(0, c["dc"])]
                    act = htables[(1, c["ac"])]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            row = my * c["v"] + by
                            col = mx * c["h"] + bx
                            blk = c["coef"][row * c["bw"] + col]
                            size = dct.decode(br)
                            diff = _extend(br.read_bits(size), size) if size \
                                else 0
                            pred[ci] += diff
                            blk[0] = pred[ci]
                            k = 1
                            while k < 64:
                                rs = act.decode(br)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0xF
                                if k > 63:
                                    raise ImageDecodeError(
                                        "AC coefficient index overflow")
                                blk[k] = _extend(br.read_bits(size), size)
                                k += 1
            except _RestartMarker:
                br.skip_restart()
                pred = [0] * len(comps)
            mcu_count += 1

    planes = []
    for c in comps:
        qt = qtables[c["tq"]].reshape(8, 8).astype(np.float64)
        zz = c["coef"][:, _UNZIGZAG].reshape(-1, 8, 8) * qt
        blocks = np.einsum("ji,njk,kl->nil", _C8, zz, _C8) + 128.0
        bh, bw = c["bh"], c["bw"]
        plane = (blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # upsample to full resolution (sample replication)
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.round(np.stack([r, g, b], axis=-1))
    return np.clip(rgb, 0, 255).astype(np.uint8)
