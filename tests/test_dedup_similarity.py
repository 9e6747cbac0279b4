import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.pipelines.dedup import (
    embedding_neardup_pairs,
    exact_dedup_dataset,
    exact_dedup_keep_first,
    minhash_lsh_pairs,
    ngram_jaccard_pairs_within_groups,
    simhash_pairs,
)
from raycontract.pipelines.similarity import knn_brute_force, lsh_knn

BASE = ("the quick brown fox jumps over the lazy dog and runs far away into the woods "
        "while the hunter watches carefully from a distance waiting for the right moment")


@pytest.fixture(scope="module")
def docs(ray_session):
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        if i < 3:  # exact duplicates of doc 0
            texts.append(BASE)
        elif i == 3:  # near-duplicate: one word changed
            texts.append(BASE.replace("lazy", "sleepy"))
        else:
            rng = np.random.default_rng(i)
            words = [f"tok{rng.integers(0, 5000)}" for _ in range(30)]
            texts.append(" ".join(words))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                   "text": pa.array(texts),
                                   "grp": pa.array(["g"] * 40)}))


def test_exact_dedup_keep_first(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup_keep_first(docs, ["text"], "doc_id").take_all())
    assert 0 in kept and 1 not in kept and 2 not in kept
    assert len(kept) == 38  # 40 - 2 exact dup copies


def test_exact_dedup_dataset(docs):
    dd = exact_dedup_dataset(docs, ["text"])
    assert dd.count() == 38
    assert set(dd.schema().names) == {"doc_id", "text", "grp"}


def test_exact_dedup_dataset_min_id_deterministic(docs):
    dd = exact_dedup_dataset(docs, ["text"], id_col="doc_id")
    kept = sorted(r["doc_id"] for r in dd.take_all())
    # min-id row kept per content: doc 0 survives, its copies 1/2 do not
    assert kept[:2] == [0, 3] and len(kept) == 38
    from raycontract.pipelines.dedup import exact_dedup_keep_first

    ids = sorted(r["doc_id"]
                 for r in exact_dedup_keep_first(docs, ["text"], "doc_id").take_all())
    assert kept == ids


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
             for r in minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5).take_all()}
    # exact dups pairwise + the near-dup against each copy
    assert (0, 1) in pairs and (0, 2) in pairs and (1, 2) in pairs
    assert pairs[(0, 1)] == 1.0
    assert any((a, b) in pairs for a, b in [(0, 3), (1, 3), (2, 3)])
    # unrelated docs don't pair
    assert all(a <= 3 and b <= 3 for a, b in pairs)


def test_simhash_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in
             simhash_pairs(docs, "text", "doc_id", max_hamming=3).take_all()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0
    assert (0, 3) in pairs  # one-word change → tiny hamming distance
    assert all(a <= 3 and b <= 3 for a, b in pairs)


def test_ngram_jaccard_within_groups(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs_within_groups(docs, "text", "doc_id", "grp",
                                               threshold=0.8).take_all()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 3) in pairs and pairs[(0, 3)] > 0.8


@pytest.fixture(scope="module")
def vectors(ray_session):
    rng = np.random.default_rng(3)
    E = rng.standard_normal((200, 16))
    E[5] = E[0] * 2.0       # same direction as 0 → cosine 1
    E[6] = E[0] + 0.05 * rng.standard_normal(16)  # near
    return E, rd.from_arrow(pa.table({
        "vec_id": pa.array(range(200), type=pa.int64()),
        "embedding": pa.array([list(map(float, row)) for row in E],
                              type=pa.list_(pa.float32())),
    }))


def test_knn_brute_force_matches_numpy(vectors):
    E, ds = vectors
    Ef = E.astype(np.float32).astype(np.float64)  # match list<float> storage
    En = Ef / np.linalg.norm(Ef, axis=1, keepdims=True)
    res = knn_brute_force(ds, [0], Ef[:1], k=5).take_all()
    got = [r["vec_id"] for r in sorted(res, key=lambda r: r["rank"])]
    sims = En @ En[0]
    expect = sorted(range(200), key=lambda i: (-sims[i], i))[:5]
    assert got == expect
    assert got[0] == 0 and set(got[:3]) >= {0, 5}


def test_knn_ranks_are_dense(vectors):
    _, ds = vectors
    E, _ds = vectors
    res = knn_brute_force(ds, [0, 1], E[:2], k=4).take_all()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert sorted(by_q[0]) == [1, 2, 3, 4] and sorted(by_q[1]) == [1, 2, 3, 4]


def test_lsh_knn_finds_identical_vector(vectors):
    E, ds = vectors
    res = lsh_knn(ds, [0], E[:1], k=5, bits=6, num_tables=6).take_all()
    got = [r["vec_id"] for r in sorted(res, key=lambda r: r["rank"])]
    assert got and got[0] in (0, 5)  # cosine-identical pair hashes together


def test_embedding_neardup_pairs(vectors):
    E, ds = vectors
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.95).take_all()}
    assert (0, 5) in pairs


def test_connected_components(ray_session):
    import ray.data as rd

    from raycontract.pipelines.dedup import connected_components

    # chain 0-1-2-3-4 (diameter 4 → needs multiple propagation rounds),
    # pair (10,11), singleton pair (20,21)
    pairs = pa.table({
        "id_a": pa.array([0, 1, 2, 3, 10, 20], type=pa.int64()),
        "id_b": pa.array([1, 2, 3, 4, 11, 21], type=pa.int64()),
    })
    out = {r["node"]: r["component"]
           for r in connected_components(rd.from_arrow(pairs)).take_all()}
    assert {out[i] for i in range(5)} == {0}
    assert out[10] == out[11] == 10
    assert out[20] == out[21] == 20


def test_connected_components_via_minhash(docs):
    from raycontract.pipelines.dedup import connected_components, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    comp = {r["node"]: r["component"] for r in connected_components(pairs).take_all()}
    # docs 0,1,2 (exact dups) and 3 (near-dup) all collapse into one cluster
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp.get(3, 0) == 0


# --------------------------------------------------- r2: composed dedup


def test_hash_hamming_pairs_precomputed(ray_session):
    """Banding over precomputed 64-bit hashes (image phash use case)."""
    from raycontract.pipelines.dedup import hash_hamming_pairs

    base = 0b1011001110001111000011110000111100001111000011110000111100001111
    hashes = [base, base ^ 0b1, base ^ 0b111, base ^ (0b11111 << 20), 0]
    t = pa.table({"pid": pa.array(list(range(5)), type=pa.int64()),
                  "h": pa.array([x - (1 << 64) if x >= (1 << 63) else x
                                 for x in hashes], type=pa.int64())})
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in hash_hamming_pairs(rd.from_arrow(t), "h", "pid",
                                         max_hamming=3).take_all()}
    assert pairs[(0, 1)] == 1 and pairs[(0, 2)] == 3 and (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)  # ham 5 / huge excluded


def test_neardup_keep_first_composition(ray_session):
    """pairs → connected components → keep-first drops exactly the non-min
    members of every cluster."""
    from raycontract.pipelines.dedup import neardup_keep_first

    corpus = rd.from_arrow(pa.table({"id": pa.array(list(range(10)), type=pa.int64())}))
    pairs = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 7], type=pa.int64()),
        "id_b": pa.array([2, 3, 8], type=pa.int64()),
    }))
    kept = sorted(r["id"] for r in neardup_keep_first(corpus, pairs, "id").take_all())
    assert kept == [0, 1, 4, 5, 6, 7, 9]  # dropped 2,3 (cluster of 1) and 8


def test_phash_neardup_images_query(ray_session):
    from raycontract.entry_queries import phash_neardup_images

    t = phash_neardup_images("/root/testdata/sf0.001")
    rows = t.to_pylist()
    assert len(rows) == 30  # exactly the planted bit-flip variants
    assert all(r["hamming"] <= 3 for r in rows)
    # round-4 hard signal: in-query brute-force verification passed
    assert all(r["recall_pct"] == 100 for r in rows)


def test_chunk_dedup_counts_planted_spans(ray_session):
    """Cross-document span dedup: doc 20 repeats doc 10's text verbatim, so
    ALL of doc 20's chunks are removed; a doc repeating its own span loses
    the second occurrence."""
    from raycontract.pipelines.dedup import chunk_dedup_counts

    span = " ".join(f"w{i}" for i in range(8))
    texts = {
        10: span + " " + " ".join(f"a{i}" for i in range(8)),
        20: span + " " + " ".join(f"a{i}" for i in range(8)),  # exact copy
        30: span + " " + span,       # self-repeat: 2nd chunk == 1st chunk
        40: " ".join(f"b{i}" for i in range(20)),  # unique
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)]),
    }))
    out = {r["doc_id"]: r for r in chunk_dedup_counts(
        ds, chunk_words=8, overlap=0).take_all()}
    # doc 10 wins every shared chunk (lowest doc_id)
    assert out[10]["n_removed"] == 0 and out[10]["n_kept"] == out[10]["n_chunks"]
    # doc 20 is a verbatim copy -> every chunk removed
    assert out[20]["n_kept"] == 0 and out[20]["n_removed"] == out[20]["n_chunks"]
    # doc 30: chunk 1 is the globally-seen span (lost to doc 10), chunk 2 a
    # repeat of it too -> both removed; only its tail chunk survives
    assert out[30]["n_removed"] >= 2
    # unique doc keeps everything
    assert out[40]["n_removed"] == 0
