"""word_diversity / bigram_topk / json_field_sum edge cases the sf-fixture
parity tests can't isolate: batch row-boundary masking, repeated words,
single-word docs, negative JSON ints."""

import pyarrow as pa

import ray.data as rd

from raycontract.pipelines.relational import json_field_sum
from raycontract.pipelines.textpipe import bigram_topk, word_diversity


def test_word_diversity_repeats_and_single(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b a b a", "x", "p q r"]})
    out = word_diversity(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert (out.loc[1].n_words, out.loc[1].n_unique_words) == (5, 2)
    assert (out.loc[2].n_words, out.loc[2].n_unique_words) == (1, 1)
    assert (out.loc[3].n_words, out.loc[3].n_unique_words) == (3, 3)


def test_bigram_no_cross_document_pairs(ray_session):
    # "b c" would only exist across the doc boundary — must NOT be counted
    t = pa.table({"text": ["a b", "c d", "a b"]})
    out = bigram_topk(rd.from_arrow(t), k=10).to_pandas()
    got = dict(zip(out.bigram, out.cnt))
    assert got == {"a b": 2, "c d": 1}


def test_bigram_single_word_docs_produce_nothing(ray_session):
    t = pa.table({"text": ["solo", "a b a"]})
    out = bigram_topk(rd.from_arrow(t), k=10).to_pandas()
    got = dict(zip(out.bigram, out.cnt))
    assert got == {"a b": 1, "b a": 1}


def test_json_field_sum_negative_ints(ray_session):
    t = pa.table({"g": ["x", "x", "y"],
                  "j": ['{"k": -5}', '{"k": 7}', '{"k": 0}']})
    out = json_field_sum(rd.from_arrow(t), "j", "k", "g").to_pandas()
    got = {r.g: (r.sum_k, r.n) for r in out.itertuples()}
    assert got == {"x": (2, 2), "y": (0, 1)}
