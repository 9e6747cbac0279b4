"""North-star image table e2e (FIXTURES.md F1/F2): injected violations →
exact per-check counts; referential integrity on image_id; per-row pixel
invariant (decode equality, lossless ⇒ PSNR=∞ ≥ 40dB)."""

import numpy as np
import pytest

from raycontract import DataContract, ResultEnum
from raycontract.fixtures import (
    IMAGES_CONTRACT_YAML,
    apply_violations,
    make_image_refs_table,
    make_images_table,
)

SPEC = dict(dup_id=2, null_id=3, bad_id_format=4, null_caption=5, bad_caption=6,
            wrong_dims=7, corrupt_bytes=8, bad_fmt=9, wrong_phash=10)


@pytest.fixture(scope="module")
def images():
    return make_images_table(250)


@pytest.fixture(scope="module")
def run(ray_session, images):
    bad, _ = apply_violations(images, SPEC)
    return DataContract(data_contract_str=IMAGES_CONTRACT_YAML).test(datasets={"images": bad})


def get(run, key):
    return [c for c in run.checks if c.key == key][0]


def test_injected_counts_exact(run):
    assert get(run, "images__image_id__field_required").diagnostics["missing_count"] == SPEC["null_id"]
    assert get(run, "images__image_id__field_unique").diagnostics["duplicate_rows"] == SPEC["dup_id"]
    assert get(run, "images__image_id__field_regex").diagnostics["invalid_count"] == SPEC["bad_id_format"]
    assert get(run, "images__caption__field_required").diagnostics["missing_count"] == SPEC["null_caption"]
    assert get(run, "images__caption__field_regex").diagnostics["invalid_count"] == SPEC["bad_caption"]
    assert get(run, "images__fmt__field_enum").diagnostics["invalid_count"] == SPEC["bad_fmt"]


def test_image_conformance_counts(run):
    c = get(run, "images__image_conformance")
    d = c.diagnostics
    assert c.result == ResultEnum.failed
    assert d["dim_mismatch"] == SPEC["wrong_dims"]
    assert d["decode_error"] == SPEC["corrupt_bytes"]
    assert d["fmt_mismatch"] == SPEC["bad_fmt"]
    assert d["phash_mismatch"] == SPEC["wrong_phash"]
    assert d["invalid_count"] == (SPEC["wrong_dims"] + SPEC["corrupt_bytes"]
                                  + SPEC["bad_fmt"] + SPEC["wrong_phash"])
    # samples carry image ids + reasons, never pixel payloads
    assert all(isinstance(s[0], (str, type(None))) for s in d["samples"])


def test_clean_table_all_passes(ray_session, images):
    run = DataContract(data_contract_str=IMAGES_CONTRACT_YAML).test(datasets={"images": images})
    assert run.result == ResultEnum.passed
    assert len(run.checks) == 28  # full inventory for this contract
    # bytes uniqueness ran on the phash-bucketed content-hash path
    u = [c for c in run.checks if c.key == "images__bytes__field_unique"][0]
    assert u.diagnostics["by_content_hash"] is True


def test_referential_image_refs(ray_session, images):
    refs = make_image_refs_table(images, n_refs=80, dangling=5)
    contract = IMAGES_CONTRACT_YAML + """
  image_refs:
    fields:
      ref_id: {type: string, required: true, unique: true}
      image_id: {type: string, references: images.image_id}
      tag: {type: string, enum: [train, eval, holdout]}
"""
    run = DataContract(data_contract_str=contract).test(
        datasets={"images": images, "image_refs": refs})
    c = [c for c in run.checks if c.key == "image_refs__image_id__field_references"][0]
    assert c.result == ResultEnum.failed
    assert c.diagnostics["invalid_count"] == 5
    assert c.diagnostics["violation_keys"] == 5


def test_per_row_pixel_invariant(images):
    """Decode every image and compare to the regenerated ground truth."""
    from raycontract.functions.codecs import decode_image, psnr
    from raycontract.fixtures import make_image_row

    rows = images.to_pylist()
    for i in (0, 17, 101, 249):
        r = rows[i]
        img = decode_image(r["bytes"], r["fmt"])
        assert img.shape == (r["h"], r["w"], 3)
        truth = make_image_row(i)
        truth_img = decode_image(truth["bytes"], truth["fmt"])
        assert np.array_equal(img, truth_img)
        assert psnr(img, truth_img) == float("inf")  # ≥ 40dB trivially


def test_phash_column_consistent(images):
    from raycontract.functions.codecs import decode_image, phash64

    rows = images.to_pylist()
    for i in (3, 50, 200):
        r = rows[i]
        assert phash64(decode_image(r["bytes"], r["fmt"])) == r["phash"]
