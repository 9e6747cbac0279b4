"""Vendored baseline JPEG codec (functions/jpeg.py, implemented from the
public ITU-T T.81 spec) + the now-real lossy PSNR branch of the image
conformance stage."""

import numpy as np
import pytest

from raycontract.functions.codecs import (ImageDecodeError, decode_image,
                                          encode_image, psnr, sniff_format)
from raycontract.functions.jpeg import decode_jpeg, encode_jpeg


def smooth_image(h=64, w=80, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f1, f2 = float(rng.uniform(12, 30)), float(rng.uniform(12, 30))
    img = np.stack([
        128 + 90 * np.sin(xx / f1) * np.cos(yy / f2),
        40 + xx * (180.0 / (w - 1)),
        220 - yy * (170.0 / (h - 1)),
    ], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("subsample", [True, False])
def test_roundtrip_psnr(subsample):
    img = smooth_image()
    dec = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample))
    assert dec.shape == img.shape
    assert psnr(img, dec) >= (40 if subsample else 45)


def test_quality_monotone():
    img = smooth_image(seed=3)
    ps = [psnr(img, decode_jpeg(encode_jpeg(img, q, subsample=False)))
          for q in (25, 50, 75, 95)]
    assert ps == sorted(ps)  # higher quality → higher fidelity
    sizes = [len(encode_jpeg(img, q)) for q in (25, 95)]
    assert sizes[0] < sizes[1]  # and bigger files


def test_flat_block_exact():
    flat = np.full((24, 40, 3), 77, np.uint8)
    dec = decode_jpeg(encode_jpeg(flat, 90))
    assert int(np.abs(dec.astype(int) - 77).max()) == 0


def test_odd_dimensions_pad_and_crop():
    img = smooth_image(41, 53, seed=7)
    dec = decode_jpeg(encode_jpeg(img, 90))
    assert dec.shape == (41, 53, 3)
    assert psnr(img, dec) >= 40


def test_marker_structure():
    data = encode_jpeg(smooth_image(16, 16), 90)
    assert data.startswith(b"\xff\xd8")          # SOI
    assert data.endswith(b"\xff\xd9")            # EOI
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data                    # DQT, SOF0, DHT, SOS
    assert sniff_format(data) == "jpeg"


def test_registry_dispatch():
    img = smooth_image(32, 32, seed=9)
    data = encode_image(img, "jpeg")
    assert psnr(img, decode_image(data, "jpeg")) >= 40


def test_truncated_raises():
    data = encode_jpeg(smooth_image(32, 32), 90)
    with pytest.raises(ImageDecodeError):
        decode_jpeg(data[: len(data) // 3])


def test_progressive_marker_rejected():
    data = bytearray(encode_jpeg(smooth_image(16, 16), 90))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # pretend SOF2 (progressive)
    with pytest.raises(ImageDecodeError, match="baseline"):
        decode_jpeg(bytes(data))


def test_conformance_master_psnr_counts(ray_session, tmp_path):
    import pyarrow.parquet as pq

    import ray.data as rd

    from raycontract.fixtures import make_jpeg_master_rows
    from raycontract.plans import ImageSpec
    from raycontract.stages.image import image_conformance_stats

    t = make_jpeg_master_rows(60)
    pq.write_table(t, tmp_path / "img.parquet")
    st = image_conformance_stats(
        rd.read_parquet(str(tmp_path / "img.parquet")),
        ImageSpec(check_key="k", master_column="master"),
        batch_size=16, concurrency=2)
    assert st["row_count"] == 60
    assert st["psnr_below"] == 4       # the q=8 rows, and ONLY those
    assert st["decode_error"] == 4     # truncated rows
    assert st["dim_mismatch"] == 4
    assert st["phash_mismatch"] == 0
