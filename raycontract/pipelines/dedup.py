"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's check set (its uniqueness check is the exact-dedup
primitive, ``engines/data_contract_checks.py:195-223``), these are the
standard web-scale dedup family, each built shuffle-light:

- **exact**: 64-bit content hash per row inside ``map_batches`` (vectorized,
  polars xxhash), then ``groupby(hash).min(id)`` — the shuffle moves (hash,
  id) pairs, never documents. Collision odds at 2^-64 per pair are documented
  (SURVEY-scale tables should bump to 128-bit by hashing twice with two
  seeds).
- **MinHash + LSH**: shingle → minhash signature per doc (one vectorized
  numpy pass per batch) → explode to (band, band_hash, doc_id) rows →
  ``groupby(band, band_hash)`` → candidate pairs → verified by signature
  Jaccard. Shuffle volume = bands × docs small ints.
- **SimHash**: 64-bit weighted token hash; banding on 4×16-bit chunks finds
  candidates within Hamming ≤ 3; verify exact Hamming.
- **n-gram Jaccard**: exact pairwise Jaccard within explicit groups
  (``group_col``) — assumes each group fits one worker (documented); use
  MinHash-LSH when no natural grouping exists.
- **embedding cosine**: near-dup pairs via blocked matmul against a
  broadcast normalized matrix (see similarity.py for the ANN variants).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Min, Sum

from raycontract.functions.hashing import hash64, splitmix64


# ------------------------------------------------------------------- exact


def add_content_hash(ds, columns: list[str], out_col: str = "_h"):
    """Append a 64-bit combined content hash of ``columns`` (vectorized)."""

    def fn(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for i, c in enumerate(columns):
            h ^= splitmix64(hash64(batch[c], seed=i + 1))
        # int64 view: Ray's sort/groupby boundaries round-trip keys through
        # Python ints → C long; uint64 > 2^63-1 would overflow
        return batch.append_column(out_col, pa.array(h.view(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


def exact_dedup_keep_first(ds, columns: list[str], id_col: str):
    """IDs kept after exact dedup on ``columns``: the min ``id_col`` per
    distinct content. Returns a Dataset with one ``{id_col}`` column."""
    hashed = add_content_hash(ds.select_columns(columns + [id_col]), columns)
    kept = hashed.select_columns(["_h", id_col]).groupby("_h").aggregate(
        Min(id_col, alias_name=id_col)
    )
    return kept.select_columns([id_col])


def exact_dedup_dataset(ds, columns: list[str]):
    """Full deduplicated dataset (first row per distinct content).

    ``map_groups`` keeps one row per hash group; rows (not just ids) shuffle
    here, so prefer :func:`exact_dedup_keep_first` + a semi-join-by-id when
    rows are wide.
    """
    import pandas as pd

    hashed = add_content_hash(ds, columns)

    def head1(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return hashed.groupby("_h").map_groups(head1, batch_format="pandas").drop_columns(["_h"])


def duplicate_groups(ds, key_expr_cols: list[str], id_col: str):
    """(key_hash, n_rows, first_id) for groups with >1 row — the 'find the
    duplicates' report used by the oracle-checked prefix-dedup query."""
    hashed = add_content_hash(ds.select_columns(key_expr_cols + [id_col]), key_expr_cols)
    agg = hashed.groupby("_h").aggregate(
        Count(alias_name="n_rows"), Min(id_col, alias_name="first_id")
    )
    return agg.filter(expr="n_rows > 1")


# ------------------------------------------------------------- MinHash LSH


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Character k-shingle hashes (uint64) of one document."""
    if text is None:
        return np.empty(0, dtype=np.uint64)
    b = text.encode("utf-8", "ignore")
    n = len(b)
    if n < k:
        arr = np.frombuffer(b + b"\x00" * (8 - n), dtype=np.uint64)[:1]
        return splitmix64(arr.astype(np.uint64))
    a = np.frombuffer(b, dtype=np.uint8)
    # rolling polynomial hash over k bytes, vectorized via stride trick
    win = np.lib.stride_tricks.sliding_window_view(a, k).astype(np.uint64)
    mult = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    return splitmix64((win * mult[None, :]).sum(axis=1, dtype=np.uint64))


class MinHasher:
    """Actor-pool stage: text → minhash signature (num_perm uint64 mins)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 64, k: int = 5):
        self.text_col, self.id_col = text_col, id_col
        self.k = k
        rng = np.random.default_rng(1234)
        self.seeds = rng.integers(1, 2**63, num_perm, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if sh.size == 0:
            return np.full(len(self.seeds), np.iinfo(np.uint64).max, dtype=np.uint64)
        # (n_shingles, num_perm) mix; min over shingles per permutation
        m = splitmix64((sh[:, None] ^ self.seeds[None, :]).ravel()).reshape(sh.size, -1)
        return m.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        texts = batch[self.text_col].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else \
            np.empty((0, len(self.seeds)), dtype=np.uint64)
        return pa.table({
            self.id_col: ids,
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.ravel(), type=pa.uint64()), len(self.seeds)),
        })


def minhash_lsh_pairs(
    ds,
    text_col: str,
    id_col: str,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    k: int = 5,
    driver_fold_limit: int = 200_000,
):
    """Candidate near-dup pairs with signature-estimated Jaccard ≥ threshold.

    Returns a Dataset of (id_a, id_b, est_jaccard), id_a < id_b.

    Signatures are always computed distributed (the expensive part: shingling
    + num_perm minhashes per doc). The LSH banding/bucketing itself is pure
    integer work on (docs × num_perm) uint64s: below ``driver_fold_limit``
    docs it runs vectorized on the driver (two Ray groupby rounds cost more
    than the banding math by orders of magnitude); above, the distributed
    band-groupby path runs.
    """
    rows_per_band = num_perm // bands
    # instance → elastic tasks: warm-worker reuse beats actor-pool cold start
    # (the hasher's state is just seed arrays)
    sigs = ds.select_columns([text_col, id_col]).map_batches(
        MinHasher(text_col, id_col, num_perm, k), batch_format="pyarrow",
    )
    try:
        n_docs = ds.count()
    except Exception:
        n_docs = None
    if n_docs is not None and n_docs <= driver_fold_limit:
        return _lsh_pairs_driver(sigs, id_col, num_perm, bands, rows_per_band, threshold)

    def explode_bands(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "bhash": pa.array([], type=pa.int64()),
                             id_col: pa.array([], type=batch[id_col].type),
                             "sig": batch["sig"]})
        sig = np.asarray(batch["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        out_band, out_bh, out_id, out_sig = [], [], [], []
        ids = batch[id_col].to_pylist()
        for b in range(bands):
            chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
            bh = np.zeros(n, dtype=np.uint64)
            for j in range(rows_per_band):
                bh = splitmix64(bh ^ chunk[:, j])
            out_band.append(np.full(n, b, dtype=np.int32))
            out_bh.append(bh)
            out_id.extend(ids)
            out_sig.append(sig)
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "bhash": pa.array(np.concatenate(out_bh).view(np.int64)),
            id_col: pa.array(out_id, type=batch[id_col].type),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(np.concatenate(out_sig).ravel(), type=pa.uint64()), num_perm),
        })

    exploded = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def pairs_in_bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        tid = group[id_col].type
        empty = pa.table({"id_a": pa.array([], type=tid), "id_b": pa.array([], type=tid),
                          "est_jaccard": pa.array([], type=pa.float64())})
        if n < 2:
            return empty
        ids = group[id_col].to_pylist()
        sig = np.asarray(group["sig"].combine_chunks().flatten()).reshape(n, num_perm)
        # bucket sizes are tiny under honest hashing; guard pathological skew
        if n > 2000:
            n = 2000
            ids, sig = ids[:n], sig[:n]
        a_idx, b_idx = np.triu_indices(n, k=1)
        est = (sig[a_idx] == sig[b_idx]).mean(axis=1)
        keep = est >= threshold
        ia, ib = a_idx[keep], b_idx[keep]
        id_a = [min(ids[x], ids[y]) for x, y in zip(ia, ib)]
        id_b = [max(ids[x], ids[y]) for x, y in zip(ia, ib)]
        return pa.table({"id_a": pa.array(id_a, type=tid), "id_b": pa.array(id_b, type=tid),
                         "est_jaccard": pa.array(est[keep], type=pa.float64())})

    pairs = exploded.groupby(["band", "bhash"]).map_groups(pairs_in_bucket, batch_format="pyarrow")
    # same pair can surface from multiple bands → dedup on (id_a, id_b)
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("est_jaccard", alias_name="est_jaccard"))


def _lsh_pairs_driver(sigs, id_col: str, num_perm: int, bands: int,
                      rows_per_band: int, threshold: float):
    """Driver-side LSH banding over collected signatures (small-corpus path)."""
    import ray.data as rd

    tables = [pa.table(t) for t in ray.get(sigs.to_arrow_refs()) if t.num_rows]
    empty_t = pa.table({"id_a": pa.array([], type=pa.int64()),
                        "id_b": pa.array([], type=pa.int64()),
                        "est_jaccard": pa.array([], type=pa.float64())})
    if not tables:
        return rd.from_arrow(empty_t)
    t = pa.concat_tables(tables)
    ids = t[id_col].to_pylist()
    n = len(ids)
    sig = np.asarray(t["sig"].combine_chunks().flatten()).reshape(n, num_perm)
    cand: set[tuple[int, int]] = set()
    for b in range(bands):
        chunk = sig[:, b * rows_per_band : (b + 1) * rows_per_band]
        bh = np.zeros(n, dtype=np.uint64)
        for j in range(rows_per_band):
            bh = splitmix64(bh ^ chunk[:, j])
        order = np.argsort(bh, kind="stable")
        sb = bh[order]
        start = 0
        for i in range(1, n + 1):
            if i == n or sb[i] != sb[start]:
                if i - start > 1:
                    grp = order[start:i]
                    for x in range(len(grp)):
                        for y in range(x + 1, len(grp)):
                            cand.add((int(grp[x]), int(grp[y])) if grp[x] < grp[y]
                                     else (int(grp[y]), int(grp[x])))
                start = i
    id_a, id_b, est = [], [], []
    for x, y in cand:
        e = float((sig[x] == sig[y]).mean())
        if e >= threshold:
            a, b_ = ids[x], ids[y]
            id_a.append(min(a, b_))
            id_b.append(max(a, b_))
            est.append(e)
    tid = t[id_col].type
    return rd.from_arrow(pa.table({"id_a": pa.array(id_a, type=tid),
                                   "id_b": pa.array(id_b, type=tid),
                                   "est_jaccard": pa.array(est, type=pa.float64())}))


# ----------------------------------------------------------------- SimHash


class SimHasher:
    """text → 64-bit simhash over word-token hashes."""

    def __init__(self, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    def simhash(self, text: str) -> int:
        if not text:
            return 0
        toks = text.lower().split()
        if not toks:
            return 0
        import polars as pl

        h = pl.Series(toks).hash(seed=9).to_numpy().astype(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if votes[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out.astype(np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array([self.simhash(t) for t in texts], type=pa.int64()),
        })


def simhash_pairs(ds, text_col: str, id_col: str, max_hamming: int = 3):
    """Near-dup pairs with simhash Hamming distance ≤ max_hamming.

    Banding: 4 × 16-bit chunks — any pair within Hamming ≤ 3 shares at least
    one exact chunk (pigeonhole), so grouping by (chunk_idx, chunk_value)
    finds all candidates; each bucket verifies exact Hamming.
    """
    sh = ds.select_columns([text_col, id_col]).map_batches(
        SimHasher(text_col, id_col), batch_format="pyarrow",
    )

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        hs = np.asarray(batch["simhash"]).astype(np.int64).view(np.uint64)
        ids = batch[id_col].to_pylist()
        chunks, vals, out_ids, out_h = [], [], [], []
        for c in range(4):
            chunks.append(np.full(n, c, dtype=np.int32))
            vals.append(((hs >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64))
            out_ids.extend(ids)
            out_h.append(hs.view(np.int64))
        return pa.table({
            "chunk": pa.array(np.concatenate(chunks) if n else np.array([], dtype=np.int32)),
            "cval": pa.array(np.concatenate(vals) if n else np.array([], dtype=np.int64)),
            id_col: pa.array(out_ids, type=batch[id_col].type),
            "simhash": pa.array(np.concatenate(out_h) if n else np.array([], dtype=np.int64)),
        })

    exploded = sh.map_batches(explode, batch_format="pyarrow")

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        tid = group[id_col].type
        empty = pa.table({"id_a": pa.array([], type=tid), "id_b": pa.array([], type=tid),
                          "hamming": pa.array([], type=pa.int64())})
        if n < 2 or n > 4000:
            return empty
        ids = group[id_col].to_pylist()
        hs = np.asarray(group["simhash"]).astype(np.int64).view(np.uint64)
        a_idx, b_idx = np.triu_indices(n, k=1)
        x = hs[a_idx] ^ hs[b_idx]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        ia, ib = a_idx[keep], b_idx[keep]
        return pa.table({
            "id_a": pa.array([min(ids[x_], ids[y_]) for x_, y_ in zip(ia, ib)], type=tid),
            "id_b": pa.array([max(ids[x_], ids[y_]) for x_, y_ in zip(ia, ib)], type=tid),
            "hamming": pa.array(ham[keep], type=pa.int64()),
        })

    pairs = exploded.groupby(["chunk", "cval"]).map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ---------------------------------------------------------- n-gram Jaccard


def ngram_jaccard_pairs_within_groups(ds, text_col: str, id_col: str, group_col: str,
                                      n: int = 3, threshold: float = 0.5):
    """Exact char-n-gram Jaccard over all pairs WITHIN each ``group_col``
    group (partitioning assumption: one group fits one worker — use
    minhash_lsh_pairs for ungrouped corpora)."""

    def pairwise(group: pa.Table) -> pa.Table:
        ids = group[id_col].to_pylist()
        texts = group[text_col].to_pylist()
        tid = group[id_col].type
        sets = [set() if t is None else
                {t[i : i + n] for i in range(max(len(t) - n + 1, 1))} for t in texts]
        id_a, id_b, jac = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j]) or 1
                v = inter / union
                if v >= threshold:
                    id_a.append(min(ids[i], ids[j]))
                    id_b.append(max(ids[i], ids[j]))
                    jac.append(v)
        return pa.table({"id_a": pa.array(id_a, type=tid), "id_b": pa.array(id_b, type=tid),
                         "jaccard": pa.array(jac, type=pa.float64())})

    return ds.select_columns([group_col, text_col, id_col]).groupby(group_col).map_groups(
        pairwise, batch_format="pyarrow"
    )


# ------------------------------------------------- duplicate-group closure


def connected_components(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                         max_rounds: int = 20):
    """Group near-dup pairs into clusters: iterated min-label propagation.

    Each round broadcasts the current node→label map (``ray.put`` once) and a
    distributed pass over the edges emits (node, min-neighbor-label) rows,
    reduced per node; stops when no label changes. Rounds needed = cluster
    diameter (near-dup clusters are shallow, typically 2-4).

    The broadcast label map covers only nodes that appear in DUP PAIRS —
    orders of magnitude smaller than the corpus for any honest near-dup graph
    (documented partitioning assumption; a bucketed join replaces the
    broadcast if candidates ever rival the corpus). Returns a Dataset of
    (node, component), component = min node id in the cluster.
    """
    edges = pairs_ds.select_columns([id_a, id_b]).materialize()

    def seed(t: pa.Table) -> pa.Table:
        a, b = t[id_a].to_pylist(), t[id_b].to_pylist()
        lo = [min(x, y) for x, y in zip(a, b)]
        return pa.table({"node": pa.array(a + b, type=t[id_a].type),
                         "label": pa.array(lo + lo, type=t[id_a].type)})

    labels = edges.map_batches(seed, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label")).materialize()

    for _ in range(max_rounds):
        label_map = {r["node"]: r["label"] for r in labels.take_all()}
        ref = ray.put(label_map)

        def propagate(t: pa.Table, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            a, b = t[id_a].to_pylist(), t[id_b].to_pylist()
            lo = [min(m[x], m[y]) for x, y in zip(a, b)]
            return pa.table({"node": pa.array(a + b, type=t[id_a].type),
                             "label": pa.array(lo + lo, type=t[id_a].type)})

        labels = edges.map_batches(propagate, batch_format="pyarrow") \
            .groupby("node").aggregate(Min("label", alias_name="label")).materialize()
        new_map = {r["node"]: r["label"] for r in labels.take_all()}
        if all(label_map.get(k) == v for k, v in new_map.items()):
            break
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow")


# ------------------------------------------------------- embedding cosine


def embedding_neardup_pairs(ds, emb_col: str, id_col: str, threshold: float = 0.9):
    """Near-dup pairs by cosine ≥ threshold via blocked matmul against the
    broadcast normalized matrix (``ray.put`` once). Suits corpora whose
    embedding matrix fits worker memory; beyond that, LSH-bucket first
    (similarity.lsh_buckets) and run this per bucket."""
    rows = ds.select_columns([id_col, emb_col]).take_all()
    ids = [r[id_col] for r in rows]
    E = np.array([np.asarray(r[emb_col], dtype=np.float64) for r in rows])
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, En))

    class Block:
        def __init__(self, ref, threshold):
            self.ids, self.En = ray.get(ref)
            self.id_to_pos = {v: i for i, v in enumerate(self.ids)}
            self.threshold = threshold

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch[id_col].to_pylist()
            B = np.array([np.asarray(v, dtype=np.float64) for v in batch[emb_col].to_pylist()])
            tid = batch[id_col].type
            if B.size == 0:
                return pa.table({"id_a": pa.array([], type=tid), "id_b": pa.array([], type=tid),
                                 "cosine": pa.array([], type=pa.float64())})
            Bn = B / np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-12)
            S = Bn @ self.En.T
            id_a, id_b, cos = [], [], []
            for r, bid in enumerate(bids):
                cand = np.flatnonzero(S[r] >= self.threshold)
                for c in cand:
                    oid = self.ids[c]
                    if bid < oid:  # emit each unordered pair once, skip self
                        id_a.append(bid)
                        id_b.append(oid)
                        cos.append(float(S[r, c]))
            return pa.table({"id_a": pa.array(id_a, type=tid), "id_b": pa.array(id_b, type=tid),
                             "cosine": pa.array(cos, type=pa.float64())})

    return ds.select_columns([id_col, emb_col]).map_batches(
        Block, fn_constructor_args=(ref, threshold), batch_format="pyarrow",
        concurrency=(1, 8),
    )
