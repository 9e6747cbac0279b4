"""ngram_contamination (round-5): planted-leak counts must be exact, and
the hash-set membership must survive hashes >= 2^63 (the int64/uint64 sort
bug class)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raycontract.pipelines.curation import _word_gram_hashes, ngram_contamination


def _make_mask():
    # defined as a nested function so cloudpickle ships it BY VALUE (the
    # test module itself is not importable from Ray workers)
    def eval_mask(batch: pa.Table) -> pa.Array:
        return pa.array(np.asarray(
            pc.cast(batch["doc_id"].combine_chunks(), pa.int64())) % 20 == 0)
    return eval_mask


def test_planted_leak_counts_exact(ray_session):
    eval_mask = _make_mask()
    eval_text = " ".join(f"e{i}" for i in range(30))
    leak = " ".join(eval_text.split()[5:13])  # 8 eval words = ONE eval gram
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),  # 0 is eval (0%20==0)
        "text": pa.array([
            eval_text,
            leak + " " + " ".join(f"t{i}" for i in range(10)),  # 1 leaked gram
            eval_text,                                          # full copy
            " ".join(f"u{i}" for i in range(12)),               # clean
        ]),
    })
    out = {r["doc_id"]: r for r in ngram_contamination(
        rd.from_arrow(docs), eval_mask, n=8).take_all()}
    assert 0 not in out                      # eval rows excluded
    # 8 leaked + 10 clean words = 18 words -> 11 grams, exactly one of
    # which (the leak span itself) appears in the eval set
    assert out[1]["n_grams"] == 11 and out[1]["n_contaminated"] == 1
    assert out[2]["n_contaminated"] == out[2]["n_grams"] == 23  # full copy
    assert out[3]["n_contaminated"] == 0 and out[3]["n_grams"] == 5


def test_short_and_null_docs_dropped(ray_session):
    eval_mask = _make_mask()
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["only seven words in this tiny doc", None,
                          " ".join(f"w{i}" for i in range(8))]),
    })
    out = ngram_contamination(rd.from_arrow(docs), eval_mask, n=8).to_pandas()
    assert list(out["doc_id"]) == [3]
    assert list(out["n_grams"]) == [1]


def test_high_bit_hashes_still_match():
    # membership must treat hashes as uint64: sets from identical text must
    # intersect fully even when individual hashes exceed 2^63
    text = " ".join(f"tok{i}" for i in range(200))
    f1, _ = _word_gram_hashes(pa.array([text]), 8)
    assert (f1 >= np.uint64(1) << np.uint64(63)).any()  # high-bit hashes occur
    grams = np.unique(f1)
    pos = np.searchsorted(grams, f1)
    assert (grams[pos] == f1).all()


def test_bucketed_path_matches_broadcast(ray_session):
    """The bucketed semi-join scale path must produce IDENTICAL output to
    the broadcast path on the same input."""
    import pyarrow.parquet as pq

    import ray.data as rd

    eval_mask = _make_mask()
    rng = np.random.RandomState(9)
    texts = []
    base_words = [f"w{i}" for i in range(50)]
    for i in range(200):
        words = [base_words[rng.randint(0, 50)] for _ in range(25)]
        texts.append(" ".join(words))
    # plant real leaks: training docs 7 and 51 copy eval docs verbatim
    texts[7] = texts[0]      # doc 0 is eval (0 % 20 == 0)
    texts[51] = texts[40]    # doc 40 is eval
    docs = pa.table({"doc_id": pa.array(np.arange(200), pa.int64()),
                     "text": pa.array(texts)})
    ds = rd.from_arrow(docs).repartition(8)
    from raycontract.pipelines.curation import ngram_contamination

    bc = ngram_contamination(ds, eval_mask, n=8,
                             mode="broadcast").to_pandas()
    bk = ngram_contamination(ds, eval_mask, n=8,
                             mode="bucketed").to_pandas()
    import pandas as pd

    c = sorted(bc.columns)
    pd.testing.assert_frame_equal(
        bc[c].sort_values(c).reset_index(drop=True),
        bk[c].sort_values(c).reset_index(drop=True))
    assert bc.n_contaminated.sum() > 0  # shared vocab -> real hits
