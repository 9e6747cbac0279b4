"""Round-2 regression tests: ADVICE r1 bug fixes + scale-safety rewrites."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd


# ---------------------------------------------------------------- check keys


def test_exclusive_bounds_do_not_collide(ray_session):
    """ADVICE r1 (high): exclusiveMinimum + exclusiveMaximum both compile to a
    field_not_equal spec; with a shared check key the second overwrote the
    first and a row EQUAL to exclusiveMinimum false-PASSed."""
    from raycontract import DataContract

    contract = """
dataContractSpecification: 1.1.0
id: excl
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      v: {type: int, exclusiveMinimum: 0, exclusiveMaximum: 10}
"""
    t = pa.table({"v": pa.array([0, 5, 9], type=pa.int64())})  # 0 violates exclMin
    run = DataContract(data_contract_str=contract).test(datasets={"m": t})
    ne = [c for c in run.checks if c.type == "field_not_equal"]
    assert len(ne) == 2
    assert len({c.key for c in ne}) == 2, "not_equal keys must be distinct"
    results = sorted(c.result.value for c in ne)
    assert results == ["failed", "passed"], results
    # the minimum/maximum pair keys are distinct too and both evaluated
    mins = [c for c in run.checks if c.type == "field_minimum"]
    assert all(c.result.value == "passed" for c in mins)


def test_exclusive_max_violation_detected(ray_session):
    from raycontract import DataContract

    contract = """
dataContractSpecification: 1.1.0
id: excl2
info: {title: t, version: 1.0.0}
models:
  m:
    fields:
      v: {type: int, exclusiveMinimum: 0, exclusiveMaximum: 10}
"""
    t = pa.table({"v": pa.array([1, 10], type=pa.int64())})  # 10 violates exclMax
    run = DataContract(data_contract_str=contract).test(datasets={"m": t})
    ne = sorted((c for c in run.checks if c.type == "field_not_equal"), key=lambda c: c.key)
    assert [c.result.value for c in ne] == ["passed", "failed"]


# ---------------------------------------------------------------- max_samples


def test_merge_partials_respects_max_samples():
    from raycontract.stages.stats import merge_partials
    import pickle

    def part(n):
        return pickle.dumps({
            "row_count": n, "columns": {},
            "checks": {"k": {"invalid": n, "samples": [(i, "x") for i in range(n)]}},
        })

    merged = merge_partials([part(30), part(30)], max_samples=50)
    assert merged["checks"]["k"]["invalid"] == 60
    assert len(merged["checks"]["k"]["samples"]) == 50
    merged_small = merge_partials([part(30), part(30)], max_samples=5)
    assert len(merged_small["checks"]["k"]["samples"]) == 5


# --------------------------------------------------------------------- delta


def test_delta_reader_skips_tombstoned_files(ray_session, tmp_path):
    """A Delta dir keeps compacted/removed parquet files on disk; the reader
    must resolve the active snapshot from _delta_log, not glob the dir."""
    from raycontract.contract import Server
    from raycontract.sources.readers import read_model

    d = tmp_path / "tbl"
    log = d / "_delta_log"
    log.mkdir(parents=True)
    pq.write_table(pa.table({"x": pa.array([1, 2], type=pa.int64())}), d / "part-0.parquet")
    pq.write_table(pa.table({"x": pa.array([3, 4], type=pa.int64())}), d / "part-1.parquet")
    pq.write_table(pa.table({"x": pa.array([5, 6], type=pa.int64())}), d / "part-2.parquet")
    # commit 0: add part-0 and part-1; commit 1: remove part-1, add part-2
    with open(log / f"{0:020d}.json", "w") as f:
        f.write(json.dumps({"add": {"path": "part-0.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "part-1.parquet"}}) + "\n")
    with open(log / f"{1:020d}.json", "w") as f:
        f.write(json.dumps({"remove": {"path": "part-1.parquet"}}) + "\n")
        f.write(json.dumps({"add": {"path": "part-2.parquet"}}) + "\n")

    srv = Server(type="local", format="delta", path=str(d))
    ds = read_model(srv, "m")
    vals = sorted(r["x"] for r in ds.take_all())
    assert vals == [1, 2, 5, 6]  # part-1 tombstoned, not double-counted


def test_delta_reader_without_log_falls_back(ray_session, tmp_path):
    from raycontract.contract import Server
    from raycontract.sources.readers import read_model

    d = tmp_path / "plain"
    d.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], type=pa.int64())}), d / "a.parquet")
    srv = Server(type="local", format="delta", path=str(d))
    assert read_model(srv, "m").count() == 1


# ---------------------------------------------------- oversized-bucket paths


def test_minhash_oversized_bucket_hub_pairing(ray_session):
    """Buckets beyond the pairwise cap degrade to hub pairing instead of
    silently dropping all pairs (ADVICE r1 low / no-silent-caps)."""
    from raycontract.pipelines.dedup import minhash_lsh_pairs

    n = 2100  # > the 2000 full-pairwise cap
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "text": pa.array(["identical text for every document"] * n),
    }))
    pairs = minhash_lsh_pairs(ds, "text", "doc_id", threshold=0.5,
                              driver_fold_limit=0)  # force the distributed path
    rows = pairs.take_all()
    # hub star: every doc connected to doc 0
    assert len(rows) == n - 1
    assert all(r["id_a"] == 0 and r["est_jaccard"] == 1.0 for r in rows)


def test_simhash_batch_kernel_matches_single_doc():
    from raycontract.pipelines.dedup import SimHasher

    sh = SimHasher("text", "doc_id")
    texts = ["the quick brown fox", "", None, "the quick brown fox jumps",
             "completely different words entirely"]
    batch = sh._batch_simhash(texts)
    for i, t in enumerate(texts):
        assert int(batch[i]) == sh.simhash(t)
    # identical docs → identical hash; near docs → close; empty/None → 0
    assert batch[1] == 0 and batch[2] == 0
    ham = bin(int(batch[0]) ^ int(batch[3])).count("1")
    assert ham <= 16


# --------------------------------------------------------- embedding neardup


@pytest.fixture(scope="module")
def clustered_embeddings(ray_session):
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((20, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, ids = [], []
    for c in range(20):
        for j in range(25):
            v = centers[c] + 0.03 * rng.standard_normal(32)
            rows.append((v / np.linalg.norm(v)).astype(np.float64))
            ids.append(c * 1000 + j)
    E = np.stack(rows)
    t = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(E.ravel(), type=pa.float64()), 32),
    })
    return rd.from_arrow(t).repartition(6), ids, E


def test_embedding_neardup_exact_no_driver_collection(clustered_embeddings):
    """Block-pair rewrite: same exact pairs as a brute-force reference."""
    from raycontract.pipelines.dedup import embedding_neardup_pairs

    ds, ids, E = clustered_embeddings
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.9).take_all()}
    S = E @ E.T
    ia, ib = np.nonzero(np.triu(S >= 0.9, k=1))
    want = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ia, ib)
            if ids[a] != ids[b]}
    assert got == want and len(want) > 100


def test_embedding_neardup_lsh_recall(clustered_embeddings):
    from raycontract.pipelines.dedup import embedding_neardup_pairs_lsh

    ds, ids, E = clustered_embeddings
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs_lsh(ds, "embedding", "vec_id", threshold=0.9,
                                       bits=6, num_tables=8).take_all()}
    S = E @ E.T
    ia, ib = np.nonzero(np.triu(S >= 0.9, k=1))
    want = {(min(ids[a], ids[b]), max(ids[a], ids[b])) for a, b in zip(ia, ib)
            if ids[a] != ids[b]}
    assert got <= want  # no false positives (exact verify within buckets)
    assert len(got) / len(want) >= 0.9  # recall of the bucketed path


# ------------------------------------------------------ connected components


def test_connected_components_driver_and_distributed_agree(ray_session):
    from raycontract.pipelines.dedup import connected_components

    pairs = pa.table({
        "id_a": pa.array([1, 2, 10, 11, 20], type=pa.int64()),
        "id_b": pa.array([2, 3, 11, 12, 21], type=pa.int64()),
    })
    ds = rd.from_arrow(pairs)
    drv = {r["node"]: r["component"] for r in
           connected_components(ds, driver_edge_limit=10**6).take_all()}
    dist = {r["node"]: r["component"] for r in
            connected_components(ds, driver_edge_limit=0).take_all()}
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert drv == want
    assert dist == want


def test_connected_components_chain_diameter(ray_session):
    """A long chain exercises multi-round convergence on both paths."""
    from raycontract.pipelines.dedup import connected_components

    n = 30
    pairs = pa.table({"id_a": pa.array(list(range(n - 1)), type=pa.int64()),
                      "id_b": pa.array(list(range(1, n)), type=pa.int64())})
    for limit in (10**6, 0):
        labels = {r["node"]: r["component"] for r in
                  connected_components(rd.from_arrow(pairs),
                                       driver_edge_limit=limit).take_all()}
        assert set(labels.values()) == {0}
        assert len(labels) == n


# ------------------------------------------------------------- LSH ANN index


def test_lsh_knn_index_recall_and_partial_scan(clustered_embeddings):
    """VERDICT r1 #7: recall ≥ 0.9 vs brute force AND the query path reads
    less than the full (corpus × tables) bucket space."""
    from raycontract.pipelines.similarity import build_lsh_index, query_lsh_index

    ds, ids, E = clustered_embeddings
    qids = ids[:5]
    Q = E[:5]
    index = build_lsh_index(ds, "embedding", "vec_id", bits=6, num_tables=4)
    result, stats = query_lsh_index(index, qids, Q, k=10, probe_hamming=1)

    S = Q @ E.T
    got_sets, want_sets = [], []
    res = result.to_pydict()
    for qi, qid in enumerate(qids):
        got = {res["vec_id"][i] for i in range(len(res["query_id"]))
               if res["query_id"][i] == qid}
        order = np.argsort(-S[qi], kind="stable")[:10]
        want = {ids[i] for i in order}
        got_sets.append(got)
        want_sets.append(want)
    recall = sum(len(g & w) for g, w in zip(got_sets, want_sets)) / sum(
        len(w) for w in want_sets)
    assert recall >= 0.9, (recall, stats)
    # the index replaces the full scan: strictly fewer rows scored than a
    # full per-table scan would touch
    assert stats["rows_scored"] < stats["corpus_rows"] * index.num_blocks
    assert stats["rows_scored"] < stats["corpus_rows"] * 4  # < full 4-table scan
    assert stats["blocks_fetched"] <= stats["blocks_total"]


# ------------------------------------------------------- bucket modulo (low)


def test_distributed_dup_fold_non_power_of_two_buckets(ray_session):
    """ADVICE r1 (low): num_buckets is rounded up to a power of two so the
    key & (B-1) bucketing populates every bucket."""
    from raycontract.plans import ModelPlan
    from raycontract.stages.fused import run_fused_pass
    from raycontract.plans import UniqueSpec

    n = 5000
    t = pa.table({"k": pa.array([i // 2 for i in range(n)], type=pa.int64())})
    ds = rd.from_arrow(t).repartition(4)
    plan = ModelPlan(model_name="m", pk_column=None)
    stats, img, dups = run_fused_pass(
        ds, plan, None, [UniqueSpec("m__k__field_unique", "k")],
        driver_fold_limit=10,  # force the distributed fold
    )
    d = dups["k"]
    assert d["distinct_count"] == n // 2
    assert d["duplicate_values"] == n // 2
    assert d["duplicate_rows"] == n // 2


# --------------------------------------------------------------- IVF ANN


def test_ivf_knn_recall_and_partial_scan(clustered_embeddings):
    """IVF coarse-quantizer path: high recall on clustered data, probing
    only nprobe centroid lists (scan stats prove the partial read)."""
    from raycontract.pipelines.similarity import build_ivf_index, query_ivf_index

    ds, ids, E = clustered_embeddings
    qids, Q = ids[:5], E[:5]
    index = build_ivf_index(ds, "embedding", "vec_id", k=20)
    result, stats = query_ivf_index(index, qids, Q, k=10, nprobe=4)

    S = Q @ E.T
    res = result.to_pydict()
    hits = total = 0
    for qi, qid in enumerate(qids):
        got = {res["vec_id"][i] for i in range(len(res["query_id"]))
               if res["query_id"][i] == qid}
        want = {ids[i] for i in np.argsort(-S[qi], kind="stable")[:10]}
        hits += len(got & want)
        total += len(want)
    assert hits / total >= 0.9, (hits / total, stats)
    # nprobe=4 of 20 centroids → well under the full corpus scanned
    assert stats["rows_scored"] < stats["corpus_rows"]
    assert stats["blocks_fetched"] <= stats["blocks_total"]


def test_ivf_knn_smoke(clustered_embeddings):
    from raycontract.pipelines.similarity import ivf_knn

    ds, ids, E = clustered_embeddings
    res = ivf_knn(ds, ids[:2], E[:2], k=5, n_centroids=10, nprobe=3)
    rows = res.take_all()
    assert len(rows) == 10
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # rank 1 must be the query vector itself (it is in the corpus)
    for qid, rs in by_q.items():
        top = min(rs, key=lambda r: r["rank"])
        assert top["vec_id"] == qid and top["score"] > 0.999
