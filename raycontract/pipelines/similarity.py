"""Similarity search over an embedding column (``list<float>``).

- ``knn_brute_force``: exact top-k cosine — per-batch float64 matmul against
  a broadcast query matrix (``ray.put`` once, fetched in each actor's
  ``__init__``), per-batch top-k, then a tiny global top-k reduce per query.
  The scan is embarrassingly parallel; only Q×k candidate rows per batch
  leave the workers.
- ``lsh_knn``: the scale path — random-hyperplane signatures bucket the
  corpus (one ``groupby``), queries search only matching buckets, exact
  rerank inside. Recall < 1 by construction (documented); multi-probe via
  ``num_tables`` independent tables.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class _BruteScorer:
    def __init__(self, qref, emb_col: str, id_col: str, k: int):
        self.qids, self.Q = ray.get(qref)  # fetched once per actor
        self.emb_col, self.id_col, self.k = emb_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        tid = batch[self.id_col].type
        if not ids:
            return pa.table({"query_id": pa.array([], type=pa.int64()),
                             self.id_col: pa.array([], type=tid),
                             "score": pa.array([], type=pa.float64())})
        E = np.array([np.asarray(v, dtype=np.float64) for v in batch[self.emb_col].to_pylist()])
        S = self.Q @ _normalize(E).T  # (num_queries, batch)
        k = min(self.k, S.shape[1])
        top = np.argpartition(-S, kth=k - 1, axis=1)[:, :k]
        qcol, icol, scol = [], [], []
        for qi in range(S.shape[0]):
            for c in top[qi]:
                qcol.append(self.qids[qi])
                icol.append(ids[c])
                scol.append(float(S[qi, c]))
        return pa.table({"query_id": pa.array(qcol, type=pa.int64()),
                         self.id_col: pa.array(icol, type=tid),
                         "score": pa.array(scol, type=pa.float64())})


def knn_brute_force(ds, query_ids: list[int], query_matrix: np.ndarray,
                    emb_col: str = "embedding", id_col: str = "vec_id", k: int = 10):
    """Exact cosine top-k for each query; returns (query_id, rank, id, score),
    rank 1-based, ties broken by id ascending (deterministic)."""
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qref = ray.put((list(query_ids), Q))
    cands = ds.select_columns([id_col, emb_col]).map_batches(
        _BruteScorer, fn_constructor_args=(qref, emb_col, id_col, k),
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def final_topk(group: pa.Table) -> pa.Table:
        scores = np.asarray(group["score"])
        ids = group[id_col].to_pylist()
        qid = group["query_id"][0].as_py()
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), type=pa.int64()),
            id_col: pa.array([ids[i] for i in order], type=group[id_col].type),
            "score": pa.array([float(scores[i]) for i in order], type=pa.float64()),
        })

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


# ----------------------------------------------------------------- LSH ANN


def _hyperplanes(dim: int, bits: int, table: int) -> np.ndarray:
    rng = np.random.default_rng(5150 + table)
    return rng.standard_normal((bits, dim))


def _bucket_of(M: np.ndarray, H: np.ndarray) -> np.ndarray:
    bits = (M @ H.T) > 0
    out = np.zeros(M.shape[0], dtype=np.int64)
    for b in range(H.shape[0]):
        out |= bits[:, b].astype(np.int64) << b
    return out


def lsh_knn(ds, query_ids: list[int], query_matrix: np.ndarray,
            emb_col: str = "embedding", id_col: str = "vec_id", k: int = 10,
            bits: int = 8, num_tables: int = 4):
    """Approximate top-k: random-hyperplane LSH buckets (num_tables
    independent tables), exact cosine rerank within matched buckets.

    At 10^12 scale the bucket groupby replaces the full matmul: each query
    touches ~corpus/2^bits × num_tables vectors. Recall is approximate.
    """
    dim = np.asarray(query_matrix).shape[1]
    Q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    planes = [_hyperplanes(dim, bits, t) for t in range(num_tables)]
    qbuckets = [_bucket_of(Q, H) for H in planes]  # (num_tables, nq)
    wanted = [{int(b) for b in qb} for qb in qbuckets]
    qref = ray.put((list(query_ids), Q, planes, wanted))

    class BucketScorer:
        def __init__(self, qref, emb_col, id_col, k):
            self.qids, self.Q, self.planes, self.wanted = ray.get(qref)
            self.qb = [_bucket_of(self.Q, H) for H in self.planes]
            self.emb_col, self.id_col, self.k = emb_col, id_col, k

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch[self.id_col].to_pylist()
            tid = batch[self.id_col].type
            empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                              self.id_col: pa.array([], type=tid),
                              "score": pa.array([], type=pa.float64())})
            if not ids:
                return empty
            E = _normalize(np.array([np.asarray(v, dtype=np.float64)
                                     for v in batch[self.emb_col].to_pylist()]))
            # candidate mask: row matches any query bucket in any table
            cand = np.zeros(len(ids), dtype=bool)
            buckets = []
            for t, H in enumerate(self.planes):
                b = _bucket_of(E, H)
                buckets.append(b)
                cand |= np.isin(b, list(self.wanted[t]))
            idx = np.flatnonzero(cand)
            if idx.size == 0:
                return empty
            S = self.Q @ E[idx].T
            qcol, icol, scol = [], [], []
            for qi in range(S.shape[0]):
                # only candidates sharing a bucket with THIS query
                mask = np.zeros(idx.size, dtype=bool)
                for t in range(len(self.planes)):
                    mask |= buckets[t][idx] == self.qb[t][qi]
                sub = np.flatnonzero(mask)
                if sub.size == 0:
                    continue
                kk = min(self.k, sub.size)
                top = sub[np.argpartition(-S[qi, sub], kth=kk - 1)[:kk]]
                for c in top:
                    qcol.append(self.qids[qi])
                    icol.append(ids[idx[c]])
                    scol.append(float(S[qi, c]))
            return pa.table({"query_id": pa.array(qcol, type=pa.int64()),
                             self.id_col: pa.array(icol, type=tid),
                             "score": pa.array(scol, type=pa.float64())})

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        BucketScorer, fn_constructor_args=(qref, emb_col, id_col, k),
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def final_topk(group: pa.Table) -> pa.Table:
        scores = np.asarray(group["score"])
        ids = group[id_col].to_pylist()
        qid = group["query_id"][0].as_py()
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "rank": pa.array(list(range(1, len(order) + 1)), type=pa.int64()),
            id_col: pa.array([ids[i] for i in order], type=group[id_col].type),
            "score": pa.array([float(scores[i]) for i in order], type=pa.float64()),
        })

    return cands.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
