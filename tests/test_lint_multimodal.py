import pyarrow as pa
import pytest

from raycontract import DataContract, ResultEnum


def test_lint_clean_contract():
    c = """
id: ok
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    description: model desc
    fields:
      a: {type: string, description: field desc, pattern: "^x$"}
"""
    run = DataContract(data_contract_str=c).lint()
    assert run.result == ResultEnum.passed
    assert all(ch.result == ResultEnum.passed for ch in run.checks)


def test_lint_findings_are_warnings():
    c = """
id: bad
dataContractSpecification: 1.1.0
info: {title: test, version: 1.0.0}
models:
  m:
    fields:
      a: {type: string, pattern: "[unclosed", references: "nope.x",
          minLength: 5, maxLength: 2}
      b: {type: long, minLength: 3}
      c: {type: unknowntype}
"""
    run = DataContract(data_contract_str=c).lint()
    assert run.result == ResultEnum.warning
    by = {ch.key: ch for ch in run.checks}
    assert by["lint__field-pattern"].result == ResultEnum.warning
    assert by["lint__field-reference"].result == ResultEnum.warning
    assert by["lint__valid-constraints"].result == ResultEnum.warning
    assert by["lint__known-types"].result == ResultEnum.warning
    assert by["lint__syntax"].result == ResultEnum.passed


def test_multimodal_stubs(ray_session):
    import ray.data as rd

    from raycontract.pipelines.multimodal import AudioFeatures, VideoFrameSampler

    batch = pa.table({"audio_id": pa.array(["a1"]),
                      "bytes": pa.array([b"\x00\x01" * 100], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        AudioFeatures()(batch)
    out = AudioFeatures(deterministic_fake=True)(batch)
    assert out.column_names == ["audio_id", "duration_s", "rms"]

    vbatch = pa.table({"video_id": pa.array(["v1"]),
                       "bytes": pa.array([b"\x00" * 4096], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        VideoFrameSampler()(vbatch)
    frames = VideoFrameSampler(deterministic_fake=True)(vbatch)
    assert frames.column_names == ["video_id", "frame_idx", "frame_bytes"]


def test_image_features_pipeline(ray_session):
    import ray.data as rd

    from raycontract.fixtures import make_images_table
    from raycontract.pipelines.multimodal import image_features

    t = make_images_table(32)
    feats = image_features(rd.from_arrow(t)).take_all()
    assert len(feats) == 32
    by_id = {r["image_id"]: r for r in feats}
    rows = t.to_pylist()
    assert all(r["decoded_ok"] for r in feats)
    # recomputed phash matches the stored column (consistency invariant)
    assert by_id[rows[0]["image_id"]]["phash_calc"] == rows[0]["phash"]
