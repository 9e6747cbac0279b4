import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.pipelines.textpipe import fingerprints, lang_id, quality_scores, text_stats
from raycontract.plans import DriftSpec
from raycontract.stages.drift import drift_stats, load_profile, profile_dataset, save_profile


@pytest.fixture(scope="module")
def docs(ray_session):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array(["the cat and the dog", "le chat et le chien est dans la maison",
                          "der hund und die katze ist hier", "one two three"]),
    }))


def test_text_stats(docs, duck):
    rows = {r["doc_id"]: r for r in text_stats(docs).take_all()}
    assert rows[0]["n_tokens"] == 5
    assert rows[0]["n_chars_calc"] == len("the cat and the dog")
    assert rows[3]["n_tokens"] == 3


def test_lang_id(docs):
    preds = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).take_all()}
    assert preds[0] == "en" and preds[1] == "fr" and preds[2] == "de"


def test_lang_id_zh(ray_session):
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], type=pa.int64()),
                                 "text": pa.array(["这是一个测试文档"])}))
    assert lang_id(ds).take_all()[0]["pred_lang"] == "zh"


def test_quality_scores(docs):
    rows = {r["doc_id"]: r for r in quality_scores(docs).take_all()}
    assert 0 <= rows[0]["quality_score"] <= 1
    assert rows[0]["stop_ratio"] == pytest.approx(3 / 5)  # the, and, the


def test_fingerprints_deterministic(docs):
    a = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).take_all()}
    b = {r["doc_id"]: r["fingerprint"] for r in fingerprints(docs).take_all()}
    assert a == b
    assert len(set(a.values())) == 4  # distinct docs → distinct fingerprints


# ------------------------------------------------------------------- drift


def _num_ds(vals):
    return rd.from_arrow(pa.table({"x": pa.array(vals, type=pa.float64())}))


def test_profile_save_load_roundtrip(ray_session):
    rng = np.random.default_rng(0)
    ds = _num_ds(rng.normal(0, 1, 5000))
    prof = profile_dataset(ds, ["x"])
    assert prof["x"]["count"] == 5000
    assert abs(prof["x"]["approx_distinct"] - 5000) / 5000 < 0.1
    path = os.path.join(tempfile.mkdtemp(), "p.parquet")
    save_profile(prof, path)
    loaded = load_profile(path)
    assert loaded["x"]["count"] == 5000
    assert isinstance(loaded["x"]["tdigest"], bytes)


def test_drift_numeric_pass_and_fail(ray_session):
    rng = np.random.default_rng(1)
    base = _num_ds(rng.normal(0, 1, 8000))
    path = os.path.join(tempfile.mkdtemp(), "base.parquet")
    save_profile(profile_dataset(base, ["x"]), path)
    spec = DriftSpec("k", "x", path, max_ks=0.1)

    same = _num_ds(rng.normal(0, 1, 8000))
    st = drift_stats(same, spec)
    assert st["metric"] == "ks" and st["passed"], st

    shifted = _num_ds(rng.normal(1.5, 1, 8000))
    st2 = drift_stats(shifted, spec)
    assert not st2["passed"] and st2["distance"] > 0.3


def test_drift_categorical(ray_session):
    def cat_ds(weights):
        rng = np.random.default_rng(2)
        vals = rng.choice(["a", "b", "c"], p=weights, size=5000)
        return rd.from_arrow(pa.table({"c": pa.array(vals)}))

    path = os.path.join(tempfile.mkdtemp(), "base.parquet")
    save_profile(profile_dataset(cat_ds([0.5, 0.3, 0.2]), ["c"]), path)
    spec = DriftSpec("k", "c", path, max_l1=0.1)
    assert drift_stats(cat_ds([0.5, 0.3, 0.2]), spec)["passed"]
    st = drift_stats(cat_ds([0.1, 0.2, 0.7]), spec)
    assert st["metric"] == "l1" and not st["passed"]


def test_drift_via_contract(ray_session):
    """distribution_drift as a first-class contract check (model.config.drift)."""
    from raycontract import DataContract, ResultEnum

    rng = np.random.default_rng(3)
    base = rd.from_arrow(pa.table({"v": pa.array(rng.normal(0, 1, 4000))}))
    path = os.path.join(tempfile.mkdtemp(), "baseline.parquet")
    save_profile(profile_dataset(base, ["v"]), path)
    contract = f"""
id: driftc
dataContractSpecification: 1.1.0
info: {{title: test, version: 1.0.0}}
models:
  m:
    config:
      drift: {{baseline: "{path}", columns: [v], maxKs: 0.1}}
    fields:
      v: {{type: double}}
"""
    cur = pa.table({"v": pa.array(rng.normal(2.0, 1, 4000))})
    run = DataContract(data_contract_str=contract).test(datasets={"m": cur})
    c = [c for c in run.checks if c.type == "distribution_drift"][0]
    assert c.result == ResultEnum.failed
    assert c.diagnostics["distance"] > 0.3


def test_drift_by_batch_actor_pool(ray_session):
    """Per-batch streaming drift via the DriftComparator actor pool."""
    import pyarrow as pa

    from raycontract.stages.drift import drift_by_batch

    rng = np.random.default_rng(21)
    base = _num_ds(rng.normal(0, 1, 6000))
    path = os.path.join(tempfile.mkdtemp(), "b.parquet")
    save_profile(profile_dataset(base, ["x"]), path)
    spec = DriftSpec("k", "x", path, max_ks=0.15)

    # first half clean, second half shifted → per-batch stream localizes it
    vals = np.concatenate([rng.normal(0, 1, 8192), rng.normal(2.5, 1, 8192)])
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)}))
    rows = drift_by_batch(ds, spec, batch_size=8192).take_all()
    assert len(rows) == 2
    assert sum(r["rows"] for r in rows) == 16384
    dists = sorted(r["distance"] for r in rows)
    assert dists[0] < 0.15          # clean batch passes
    assert dists[1] > 0.5           # shifted batch flagged
    assert [r["passed"] for r in sorted(rows, key=lambda r: r["distance"])] == [True, False]


# ------------------------------------------------- r2: BPE-ish tokenizer


def test_bpe_token_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import bpe_token_counts

    tbl = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                    "text": pa.array(["Hello world, it's 2024!", "", None])})
    out = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe_token_counts(rd.from_arrow(tbl)).take_all()}
    # "Hello"," world",","," it","'s"," 2024","!" → 7 pieces
    assert out[1] == 7
    assert out[2] == 0 and out[3] == 0


def test_repetition_scores(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import repetition_scores

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "menu\nmenu\nmenu\ncontent here",      # 3/4 duplicate lines
            "unique one\nunique two\nunique three",
            "spam spam spam spam spam spam",        # one dominating 3-gram
        ]),
    }))
    out = {r["doc_id"]: r for r in repetition_scores(docs).take_all()}
    assert out[1]["dup_line_frac"] == 0.75
    assert out[1]["dup_line_char_frac"] > 0.4
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["top_ngram_char_frac"] > 0.5
    assert out[2]["top_ngram_char_frac"] == 0.0


def test_chunk_documents_overlap_and_tail(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import chunk_documents

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j",   # 10 words -> starts 0,3,6,9 (stride 3)
            "x y",                    # 2 words -> one short chunk
            "w",                      # 1 word
        ]),
    }))
    rows = chunk_documents(docs, chunk_words=5, overlap=2).take_all()
    by = {}
    for r in rows:
        by.setdefault(r["doc_id"], []).append(r)
    for v in by.values():
        v.sort(key=lambda r: r["chunk_id"])
    c1 = by[1]
    assert [r["chunk_text"] for r in c1] == [
        "a b c d e", "d e f g h", "g h i j", "j"]
    assert [r["n_tokens"] for r in c1] == [5, 5, 4, 1]
    assert [r["chunk_id"] for r in c1] == [0, 1, 2, 3]
    assert [r["chunk_text"] for r in by[2]] == ["x y"]
    assert [r["chunk_text"] for r in by[3]] == ["w"]


def test_chunk_documents_rejects_bad_overlap(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raycontract.pipelines.textpipe import chunk_documents

    docs = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b"]}))
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_words=4, overlap=4)


def test_vocab_topk_order_and_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import vocab_topk

    docs = rd.from_arrow(pa.table({
        "text": pa.array(["b a b c", "a b z z", "c a"]),
    }))
    rows = vocab_topk(docs, k=3).take_all()
    # a:3 b:3 c:2 z:2 -> count desc, word asc
    assert [(r["word"], r["cnt"]) for r in rows] == [("a", 3), ("b", 3), ("c", 2)]


def test_pack_sequences_greedy_rule(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import pack_sequences

    # single partition so the greedy order is just id order
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "a b c",          # 3 tokens -> bin 0 (fill 3)
            "d e f g",        # 4 -> bin 0 full at 7? capacity 8: fill 7
            "h i",            # 2 -> 7+2>8 -> bin 1 (fill 2)
            " ".join(["x"] * 9),  # 9 > capacity -> 2+9>8 -> bin 2 alone
            "y",              # fill 9 > 0, 9+1>8 -> bin 3
        ]),
    }))
    rows = sorted(pack_sequences(docs, capacity=8, num_partitions=1).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["bin"] for r in rows] == [0, 0, 1, 2, 3]
    assert [r["n_tokens"] for r in rows] == [3, 4, 2, 9, 1]
    assert all(r["part"] == 0 for r in rows)


def test_pack_sequences_partition_isolation(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.partition import hash_partition_codes
    from raycontract.pipelines.textpipe import pack_sequences

    ids = pa.array(list(range(40)), type=pa.int64())
    docs = rd.from_arrow(pa.table({
        "doc_id": ids, "text": pa.array(["w w w"] * 40)}))
    rows = pack_sequences(docs, capacity=7, num_partitions=4).take_all()
    codes = hash_partition_codes(ids, 4)
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == 40
    # every doc lands in its knuth partition; bins pack 2 docs (3+3<=7<3*3)
    for i in range(40):
        assert by_id[i]["part"] == int(codes[i])
    for part in range(4):
        members = sorted(r["doc_id"] for r in rows if r["part"] == part)
        bins = [by_id[m]["bin"] for m in members]
        # consecutive members pair up: bin index = position // 2
        assert bins == [pos // 2 for pos in range(len(members))]


def test_tfidf_topk_rank_and_df(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import tfidf_topk

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([
            "b b b a a c",   # tf: b=3 a=2 c=1
            "a c c",          # tf: c=2 a=1
        ]),
    }))
    rows = sorted(tfidf_topk(docs, k=2).take_all(),
                  key=lambda r: (r["doc_id"], -r["tf"], r["term"]))
    assert [(r["doc_id"], r["term"], r["tf"], r["df"]) for r in rows] == [
        (1, "b", 3, 1),   # b appears only in doc 1 -> df 1
        (1, "a", 2, 2),   # a in both docs -> df 2
        (2, "c", 2, 2),
        (2, "a", 1, 2),
    ]


def test_tfidf_topk_tie_breaks_term_asc(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.textpipe import tfidf_topk

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["z y x w"]),  # all tf=1 -> k=2 keeps w, x
    }))
    rows = sorted(tfidf_topk(docs, k=2).take_all(), key=lambda r: r["term"])
    assert [r["term"] for r in rows] == ["w", "x"]
