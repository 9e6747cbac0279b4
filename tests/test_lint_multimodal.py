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
    """r2: WAV audio is REAL; r4: y4m video is REAL (tests below).
    Compressed codecs remain honest NotImplementedError stubs."""
    from raycontract.pipelines.multimodal import AudioFeatures, VideoFrameSampler

    # non-WAV payload under the (default) wav codec: decode fails SOFTLY
    batch = pa.table({"audio_id": pa.array(["a1"]),
                      "bytes": pa.array([b"\x00\x01" * 100], type=pa.binary())})
    out = AudioFeatures()(batch)
    assert out["decoded_ok"][0].as_py() is False
    assert "rms" in out.column_names and "zcr" in out.column_names

    # compressed/unknown video bytes: hard NotImplementedError without fake
    vbatch = pa.table({"video_id": pa.array(["v1"]),
                       "bytes": pa.array([b"\x00" * 4096], type=pa.binary())})
    with pytest.raises(NotImplementedError):
        VideoFrameSampler()(vbatch)
    frames = VideoFrameSampler(deterministic_fake=True)(vbatch)
    assert frames["decoded_ok"].to_pylist() == [False]
    assert set(frames.column_names) >= {"video_id", "frame_idx", "frame_bytes"}


# ---------------------------------------------------- real y4m video (r4)


def _synthetic_clip(n=64, h=24, w=32, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    # moving-gradient frames: deterministic, content differs per frame
    base = np.add.outer(np.arange(h), np.arange(w)) % 256
    return ((base[None] + np.arange(n)[:, None, None] * 3
             + rng.integers(0, 2, (n, 1, 1))) % 256).astype(np.uint8)


def test_y4m_mono_roundtrip_bit_exact():
    import numpy as np

    from raycontract.functions.video import decode_y4m, encode_y4m

    frames = _synthetic_clip()
    blob = encode_y4m(frames, fps=(25, 1))
    got, fps, cs = decode_y4m(blob)
    assert cs == "mono" and fps == (25, 1)
    assert np.array_equal(got, frames)


def test_y4m_rgb_444_and_420():
    import numpy as np

    from raycontract.functions.video import (decode_y4m, encode_y4m,
                                             rgb_to_yuv, yuv_to_rgb)

    rng = np.random.default_rng(3)
    # 2×2-constant blocks: chroma is smooth at the 420 grid, so subsampling
    # loss stays at rounding level (random per-pixel chroma would not)
    rgb = np.repeat(np.repeat(
        rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8), 2, 1), 2, 2)
    # C444 preserves full-resolution chroma: YUV round-trips exactly
    got, _, cs = decode_y4m(encode_y4m(rgb, chroma="444"))
    assert cs == "444"
    assert np.array_equal(got, np.stack([rgb_to_yuv(f) for f in rgb]))
    # C420 subsamples chroma but keeps luma bit-exact
    got420, _, cs420 = decode_y4m(encode_y4m(rgb, chroma="420"))
    assert cs420 == "420"
    assert np.array_equal(got420[..., 0],
                          np.stack([rgb_to_yuv(f)[..., 0] for f in rgb]))
    # and the RGB reconstruction stays close (chroma box-filter loss only)
    back = yuv_to_rgb(got420[0])
    assert float(np.mean(np.abs(back.astype(int) - rgb[0].astype(int)))) < 16


def test_y4m_truncated_and_corrupt():
    from raycontract.functions.video import (VideoDecodeError, decode_y4m,
                                             encode_y4m)

    blob = encode_y4m(_synthetic_clip(4))
    with pytest.raises(VideoDecodeError):
        decode_y4m(blob[: len(blob) - 10])
    with pytest.raises(VideoDecodeError):
        decode_y4m(b"RIFF" + blob[4:])


def test_video_frame_sampler_real_y4m(ray_session):
    import numpy as np
    import ray.data as rd

    from raycontract.functions.video import encode_y4m
    from raycontract.pipelines.multimodal import (VideoFrameSampler,
                                                  video_frame_features)

    clip = _synthetic_clip(n=61)
    blob = encode_y4m(clip)
    batch = pa.table({
        "video_id": pa.array(["v1", "v2"]),
        "bytes": pa.array([blob, b"\xde\xad"], type=pa.binary()),
        "codec": pa.array(["y4m", "y4m"]),
    })
    out = VideoFrameSampler(every_n=30)(batch)
    rows = out.to_pylist()
    v1 = [r for r in rows if r["video_id"] == "v1"]
    v2 = [r for r in rows if r["video_id"] == "v2"]
    # 61 frames sampled every 30 → indices 0, 30, 60
    assert [r["frame_idx"] for r in v1] == [0, 30, 60]
    assert all(r["decoded_ok"] for r in v1)
    assert v1[0]["w"] == 32 and v1[0]["h"] == 24
    assert v1[0]["mean_luma"] == pytest.approx(float(clip[0].mean()))
    # frame_bytes is the raw luma plane
    got = np.frombuffer(v1[1]["frame_bytes"], np.uint8).reshape(24, 32)
    assert np.array_equal(got, clip[30])
    # distinct frames hash differently; phash is deterministic int64
    assert v1[0]["frame_phash"] != v1[2]["frame_phash"]
    # corrupt payload under a real codec: soft-fail row, pipeline continues
    assert v2 == [{"video_id": "v2", "frame_idx": 0, "w": 0, "h": 0,
                   "mean_luma": 0.0, "frame_phash": 0,
                   "frame_bytes": b"\xde\xad", "decoded_ok": False}]

    # Dataset pipeline shape: codec sniffed from magic when codec col absent
    ds = rd.from_arrow(pa.table({
        "video_id": pa.array(["a"]),
        "bytes": pa.array([blob], type=pa.binary()),
    }))
    feats = video_frame_features(ds, codec_col=None, every_n=20).take_all()
    assert [r["frame_idx"] for r in feats] == [0, 20, 40, 60]


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


# ---------------------------------------------------- real WAV audio (r2)


def test_wav_roundtrip_and_features(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.multimodal import (AudioFeatures, audio_features,
                                                  decode_wav, encode_wav)

    sr = 16000
    t = np.arange(sr) / sr  # 1 second
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    blob = encode_wav(x, sr)
    y, sr2 = decode_wav(blob)
    assert sr2 == sr and len(y) == sr
    assert np.allclose(y, x, atol=1e-3)  # 16-bit quantization tolerance

    silence = encode_wav(np.zeros(sr // 2), sr)
    tbl = pa.table({"audio_id": pa.array([1, 2, 3], type=pa.int64()),
                    "bytes": pa.array([blob, silence, b"garbage"], type=pa.binary()),
                    "codec": pa.array(["wav", "wav", "wav"])})
    out = {r["audio_id"]: r for r in audio_features(rd.from_arrow(tbl)).take_all()}
    tone = out[1]
    assert abs(tone["duration_s"] - 1.0) < 1e-3
    assert abs(tone["rms"] - 0.5 / np.sqrt(2)) < 1e-2  # sine RMS = A/sqrt(2)
    assert abs(tone["peak"] - 0.5) < 1e-2
    # 440 Hz sine crosses zero 880x/s → zcr ≈ 880/16000
    assert abs(tone["zcr"] - 880.0 / sr) < 0.005
    assert tone["silence_ratio"] < 0.05 and tone["decoded_ok"]
    sil = out[2]
    assert sil["silence_ratio"] > 0.99 and sil["rms"] < 1e-6
    assert not out[3]["decoded_ok"]


def test_audio_compressed_codec_still_raises():
    import pyarrow as pa
    import pytest as _pytest

    from raycontract.pipelines.multimodal import AudioFeatures

    batch = pa.table({"audio_id": pa.array([1], type=pa.int64()),
                      "bytes": pa.array([b"\xff\xfb"], type=pa.binary()),
                      "codec": pa.array(["mp3"])})
    with _pytest.raises(NotImplementedError, match="mp3"):
        AudioFeatures()(batch)


def test_audio_features_sample_query(ray_session):
    from raycontract.entry_queries import audio_features_sample

    rows = audio_features_sample("/root/testdata/sf0.001").take_all()
    assert len(rows) == 200
    ok = [r for r in rows if r["decoded_ok"]]
    bad = [r for r in rows if not r["decoded_ok"]]
    assert len(bad) == 4  # planted corrupt payloads
    assert all(r["duration_ms"] >= 350 for r in ok)  # ≥0.25s tone + 0.1s silence
