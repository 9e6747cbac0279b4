"""Regression tests for the round-5 ADVICE fixes: NULL handling in
oov_rate / mixture_sample / ordered_string_agg, odd-dimension chroma in
encode_y4m, and the hash_partition_codes null-key docstring contract."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_with_null(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["the quick fox", None, "the the the", "lazy dog"]),
    }))


def test_oov_rate_skips_null_text(ray_session):
    from raycontract.pipelines.textpipe import oov_rate

    out = oov_rate(_docs_with_null(ray_session), "text", "doc_id",
                   vocab_k=2).to_pandas().sort_values("doc_id")
    # NULL text row (doc 2) is skipped, like the SQL oracle's IS NOT NULL
    assert list(out["doc_id"]) == [1, 3, 4]
    assert (out["n_tokens"] >= 1).all()
    # vocab_k=2 -> vocab is the 2 most frequent words ("the" x4, then one
    # tie-broken word); every other token counts as OOV
    assert (out["n_oov"] <= out["n_tokens"]).all()


def test_mixture_sample_null_group_gets_default_weight(ray_session):
    import ray.data as rd

    from raycontract.pipelines.sampling import mixture_sample

    n = 200
    groups = ["a" if i % 3 == 0 else None for i in range(n)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "lang": pa.array(groups, pa.string()),
    }))
    # group 'a' dropped entirely; null groups keep default=1.0 -> all kept
    out = mixture_sample(ds, "lang", "doc_id", {"a": 0.0},
                         default=1.0).to_pandas()
    assert len(out) == sum(g is None for g in groups)
    assert out["lang"].isna().all()
    # and default=0.0 drops the null-group rows too
    out0 = mixture_sample(ds, "lang", "doc_id", {"a": 1.0},
                          default=0.0).to_pandas()
    assert len(out0) == sum(g == "a" for g in groups)


def test_ordered_string_agg_skips_null_values(ray_session):
    import ray.data as rd

    from raycontract.pipelines.window import ordered_string_agg

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([10, 20, 30, 10, 20], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": pa.array(["a", None, "b", None, None]),
    }))
    out = ordered_string_agg(ds, "user_id", "ts", "event_id",
                             "event_type").to_pandas()
    by_user = dict(zip(out["user_id"], out["journey"]))
    # SQL string_agg skips nulls: user 1 -> 'a>b' (NOT NULL)
    assert by_user[1] == "a>b"
    # all-null key omitted (documented divergence from SQL's NULL row)
    assert 2 not in by_user


@pytest.mark.parametrize("chroma", ["420", "420jpeg", "422"])
def test_encode_y4m_odd_dims_roundtrip(chroma):
    from raycontract.functions.video import decode_y4m, encode_y4m

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(2, 5, 7, 3), dtype=np.uint8)
    data = encode_y4m(frames, fps=(30, 1), chroma=chroma)
    dec, fps, cs = decode_y4m(data)
    assert dec.shape == (2, 5, 7, 3)
    assert fps == (30, 1)
    # luma is exact through the YUV transform within rounding
    from raycontract.functions.video import rgb_to_yuv

    y_src = np.stack([rgb_to_yuv(f)[..., 0] for f in frames])
    assert np.max(np.abs(dec[..., 0].astype(int) - y_src.astype(int))) <= 1


def test_hash_partition_codes_null_colocation():
    from raycontract.pipelines.partition import hash_partition_codes

    ints = pa.array([0, None, 7, None], pa.int64())
    codes = hash_partition_codes(ints, 16)
    # nulls co-locate with key 0 (documented), wherever that lands
    assert codes[1] == codes[0] == codes[3]
    strs = pa.array(["", None, "x"], pa.string())
    sc = hash_partition_codes(strs, 16)
    assert sc[1] == sc[0]
