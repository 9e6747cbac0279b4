"""_batch_shingle_hashes (round-5 batched MinHash shingle gather) must be
value-identical, row for row, to the per-document _shingle_hashes kernel —
including nulls, empties, short docs, non-ASCII, and sliced arrays."""

import numpy as np
import pyarrow as pa
import pytest

from raycontract.pipelines.dedup import (
    MinHasher,
    _batch_shingle_hashes,
    _shingle_hashes,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    None,
    "",
    "ab",          # shorter than k
    "abcd",        # exactly k-1 for k=5
    "abcde",       # exactly k
    "naïve café – déjà vu ☃",  # multi-byte utf-8
    "x" * 3000,
    "the quick brown fox jumps over the lazy dog",  # duplicate content
]


@pytest.mark.parametrize("k", [3, 5, 8])
def test_batch_matches_per_doc(k):
    flat, counts = _batch_shingle_hashes(pa.array(DOCS, pa.string()), k)
    bounds = np.r_[0, np.cumsum(counts)]
    for i, doc in enumerate(DOCS):
        expect = _shingle_hashes(doc, k)
        got = flat[bounds[i]:bounds[i + 1]]
        assert got.size == expect.size, (i, doc)
        assert np.array_equal(got, expect), (i, doc)


def test_batch_matches_on_sliced_and_chunked_arrays():
    arr = pa.array(DOCS, pa.string()).slice(2, 6)
    flat, counts = _batch_shingle_hashes(arr, 5)
    bounds = np.r_[0, np.cumsum(counts)]
    for i, doc in enumerate(DOCS[2:8]):
        assert np.array_equal(flat[bounds[i]:bounds[i + 1]],
                              _shingle_hashes(doc, 5))
    ch = pa.chunked_array([pa.array(DOCS[:4], pa.string()),
                           pa.array(DOCS[4:], pa.string())])
    flat2, counts2 = _batch_shingle_hashes(ch, 5)
    ref_flat, ref_counts = _batch_shingle_hashes(pa.array(DOCS, pa.string()), 5)
    assert np.array_equal(flat2, ref_flat)
    assert np.array_equal(counts2, ref_counts)


def test_signatures_unchanged_vs_list_path():
    mh = MinHasher("text", "doc_id", num_perm=32, k=5)
    sig_arrow = mh._batch_signatures(pa.array(DOCS, pa.string()))
    sig_list = mh._batch_signatures(DOCS)
    assert np.array_equal(sig_arrow, sig_list)
    # duplicate contents get identical signatures; distinct ones don't
    assert np.array_equal(sig_arrow[0], sig_arrow[8])
    assert not np.array_equal(sig_arrow[0], sig_arrow[7])
    # null rows keep the sentinel max signature; empty strings hash their
    # zero padding (matching the per-doc kernel) so they pair together
    assert (sig_arrow[1] == np.iinfo(np.uint64).max).all()
    assert not (sig_arrow[2] == np.iinfo(np.uint64).max).all()
