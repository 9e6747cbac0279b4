"""Vendored pure-numpy image codecs + perceptual hash + PSNR.

The sandbox has no Pillow/imageio (SURVEY.md §7), so the north-star's
pixel-level conformance check (decode bytes, verify w×h, PSNR≥40dB,
phash consistency — BASELINE.json north_star) runs on vendored codecs
implemented from the public format specifications:

- **PPM (P6)**: trivial binary RGB.
- **BMP**: 24-bit uncompressed BI_RGB, bottom-up rows, 4-byte row padding.
- **PNG**: zlib-deflated scanlines, color type 2 (truecolor 8-bit), filters
  0-4 implemented per the PNG spec (decode); encode uses filter 0.

- **JPEG (baseline)**: REAL pure-numpy encoder + decoder from the public
  ITU-T T.81 spec (``functions/jpeg.py``) — the lossy branch of the
  conformance stage (PSNR vs a lossless master ≥ 40 dB) is executable.

PNG/BMP/PPM are lossless (reference invariant = exact equality, PSNR = ∞);
JPEG exercises the real lossy PSNR path.

The perceptual hash is the standard DCT-based pHash: resize (area-average) to
32×32 grayscale → 2-D DCT-II → top-left 8×8 low-frequency block minus DC →
median threshold → 64-bit hash.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ImageDecodeError(ValueError):
    pass


# ----------------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ImageDecodeError("not a P6 PPM")
    # header: magic, width, height, maxval separated by whitespace
    parts = []
    i = 2
    while len(parts) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i : i + 1] == b"#":  # comment
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ImageDecodeError("truncated PPM header")
        parts.append(int(data[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ImageDecodeError(f"unsupported maxval {maxval}")
    need = w * h * 3
    raw = data[i : i + need]
    if len(raw) < need:
        raise ImageDecodeError("truncated PPM pixel data")
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).copy()


# ----------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    img_size = (row + pad) * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # BGR, bottom-up, padded rows
    bgr = img[::-1, :, ::-1].astype(np.uint8)
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr.reshape(h, row)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    return header + info + body


def decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != b"BM":
        raise ImageDecodeError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ImageDecodeError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ImageDecodeError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = (row + 3) & ~3
    need = stride * h
    raw = data[offset : offset + need]
    if len(raw) < need:
        raise ImageDecodeError("truncated BMP pixel data")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, :row].reshape(h, w, 3)
    arr = arr[:, :, ::-1]  # BGR → RGB
    if flip:
        arr = arr[::-1]
    return arr.copy()


# ----------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    # filter byte 0 per scanline
    rows = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 1:] = img.reshape(h, w * 3)
    idat = zlib.compress(rows.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ImageDecodeError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ImageDecodeError("truncated PNG chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 2 or comp != 0 or filt != 0 or interlace != 0:
                raise ImageDecodeError(f"unsupported PNG (depth={depth}, ctype={ctype})")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ImageDecodeError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ImageDecodeError(f"bad zlib stream: {e}")
    stride = 1 + w * 3
    if len(raw) < stride * h:
        raise ImageDecodeError("truncated PNG pixel data")
    raw = np.frombuffer(raw[: stride * h], dtype=np.uint8).reshape(h, stride)
    filters = raw[:, 0]
    out = np.zeros((h, w * 3), dtype=np.uint8)
    bpp = 3
    for y in range(h):  # per-scanline loop (h ≤ a few thousand); inner ops vectorized
        line = raw[y, 1:].astype(np.int32)
        f = filters[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * 3, dtype=np.int32)
        if f == 0:
            cur = line
        elif f == 1:  # Sub — sequential along the row
            cur = line.copy()
            for x in range(bpp, w * 3):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(w * 3):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(w * 3):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ImageDecodeError(f"unknown PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, 3).copy()


# ----------------------------------------------------------------- dispatch

def _encode_jpeg(img, quality: int = 90, subsample: bool = True):
    from raycontract.functions.jpeg import encode_jpeg as _enc

    return _enc(img, quality=quality, subsample=subsample)


def _decode_jpeg(data: bytes):
    from raycontract.functions.jpeg import decode_jpeg as _dec

    return _dec(data)


ENCODERS = {"png": encode_png, "bmp": encode_bmp, "ppm": encode_ppm,
            "jpeg": _encode_jpeg}
DECODERS = {"png": decode_png, "bmp": decode_bmp, "ppm": decode_ppm,
            "jpeg": _decode_jpeg}
LOSSLESS_FORMATS = frozenset({"png", "bmp", "ppm"})


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    try:
        return ENCODERS[fmt](img)
    except KeyError:
        raise ImageDecodeError(f"unknown format {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    try:
        dec = DECODERS[fmt]
    except KeyError:
        raise ImageDecodeError(f"unknown format {fmt!r}")
    return dec(data)


def sniff_format(data: bytes) -> str | None:
    if data.startswith(_PNG_SIG):
        return "png"
    if data.startswith(b"BM"):
        return "bmp"
    if data.startswith(b"P6"):
        return "ppm"
    if data.startswith(b"\xff\xd8"):
        return "jpeg"
    return None


# Baseline JPEG is REAL since round 4: pure-numpy encoder + decoder from the
# public T.81 spec (``functions/jpeg.py``) — the lossy PSNR branch of the
# image conformance stage is reachable. Kept as a named alias for callers.
def decode_jpeg(data: bytes) -> np.ndarray:
    return _decode_jpeg(data)


# ----------------------------------------------------------- phash and PSNR


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def _area_resize_gray(img: np.ndarray, size: int = 32) -> np.ndarray:
    """Area-average resample of an RGB image to size×size grayscale."""
    gray = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(size + 1) * h / size).astype(np.int64)
    xs = (np.arange(size + 1) * w / size).astype(np.int64)
    ys[-1], xs[-1] = h, w
    # integral image for O(1) box sums
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    sums = ii[y1[:, None], x1[None, :]] - ii[y0[:, None], x1[None, :]] \
        - ii[y1[:, None], x0[None, :]] + ii[y0[:, None], x0[None, :]]
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / areas


def phash64(img: np.ndarray) -> int:
    """DCT perceptual hash → signed int64 (fits the ``phash:int64`` column)."""
    return int(phash64_batch(_area_resize_gray(img, 32)[None, :, :])[0])


_PHASH_SHIFTS = np.uint64(1) << np.arange(62, -1, -1, dtype=np.uint64)


_DCT8 = None  # first 8 DCT basis rows, initialized lazily below


def phash64_batch(smalls: np.ndarray) -> np.ndarray:
    """Vectorized pHash over a stack of 32×32 grayscale images (N,32,32).

    Only the top-left 8×8 DCT block feeds the hash, so the transform is the
    PARTIAL matmul ``D8 @ img @ D8.T`` with the first 8 basis rows — ~100×
    fewer flops than the full 32×32 DCT and row-for-row the same sums
    (measured bit-identical on the 1M-image fixture). Returns int64 of
    length N.
    """
    global _DCT8
    if _DCT8 is None:
        _DCT8 = np.ascontiguousarray(_DCT32[:8])
    if smalls.shape[0] == 0:
        return np.empty(0, dtype=np.int64)
    d = _DCT8 @ smalls @ _DCT8.T  # (N,8,8)
    vals = d.reshape(smalls.shape[0], 64)[:, 1:]  # drop DC
    med = np.median(vals, axis=1, keepdims=True)
    bits = (vals > med).astype(np.uint64)
    return (bits * _PHASH_SHIFTS[None, :]).sum(axis=1).astype(np.int64)


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1"))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; ∞ for identical images."""
    if a.shape != b.shape:
        return 0.0
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
