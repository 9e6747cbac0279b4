import numpy as np
import pytest

from raycontract.functions.codecs import (
    ImageDecodeError,
    decode_image,
    decode_jpeg,
    encode_image,
    hamming64,
    phash64,
    psnr,
    sniff_format,
)


@pytest.mark.parametrize("fmt", ["png", "bmp", "ppm"])
@pytest.mark.parametrize("shape", [(8, 8), (33, 17), (64, 64), (31, 5)])
def test_roundtrip_lossless(fmt, shape):
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    data = encode_image(img, fmt)
    out = decode_image(data, fmt)
    assert np.array_equal(img, out)
    assert sniff_format(data) == fmt
    # per-row invariant (BASELINE.json): PSNR >= 40dB; lossless ⇒ ∞
    assert psnr(img, out) == float("inf")


def test_corrupt_and_wrong_format():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    data = encode_image(img, "png")
    with pytest.raises(ImageDecodeError):
        decode_image(data[: len(data) // 2], "png")
    with pytest.raises(ImageDecodeError):
        decode_image(data, "bmp")
    with pytest.raises(ImageDecodeError):
        decode_image(b"", "ppm")
    with pytest.raises(ImageDecodeError):
        decode_image(data, "gif")


def test_phash_properties():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    p = phash64(img)
    assert p == phash64(img.copy())  # deterministic
    near = img.copy()
    near[0, 0] = 0
    assert hamming64(p, phash64(near)) <= 6  # small perturbation → near hash
    other = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    assert hamming64(p, phash64(other)) >= 10  # unrelated → far


def test_psnr_values():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    b = a.copy()
    b[0, 0, 0] = 10
    assert 0 < psnr(a, b) < 100
    assert psnr(a, a) == float("inf")
    assert psnr(a, np.zeros((4, 4, 3), dtype=np.uint8)) == 0.0


def test_jpeg_real_decode_rejects_garbage():
    # baseline JPEG is REAL since round 4 (functions/jpeg.py): malformed
    # bytes raise the codec error, not NotImplementedError
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xff\xd8\xff")
