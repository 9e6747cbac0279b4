"""SemDeDup-style semantic dedup (cluster → exact within-cluster near-dup →
keep min-id): provable subset-precision, full recall on well-separated
clusters, determinism."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raycontract.pipelines.dedup import (embedding_neardup_pairs,
                                         neardup_keep_first,
                                         semantic_dedup_keep_first)


def clustered_fixture(n_per=40, dim=16, seed=5):
    """Two tight, well-separated clusters with planted intra-cluster
    near-dups (tiny perturbations of a base vector)."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(2):
        base = np.zeros(dim)
        base[c * 2] = 1.0
        for i in range(n_per):
            if i % 4 == 3:
                v = rows[-1][1] + rng.normal(0, 0.001, dim)  # near-dup of prev
            else:
                v = base + rng.normal(0, 0.05, dim)
            rows.append((c * n_per + i, v / np.linalg.norm(v)))
    ids = pa.array([r[0] for r in rows], pa.int64())
    emb = pa.array([r[1].astype(np.float32).tolist() for r in rows],
                   pa.list_(pa.float32()))
    return pa.table({"vec_id": ids, "embedding": emb})


def _drops(t: pa.Table) -> set:
    return set(t.filter(pc.invert(t["keep"]))["vec_id"].to_pylist())


def test_semantic_dedup_full_recall_on_separated_clusters(ray_session):
    t = clustered_fixture()
    ds = rd.from_arrow(t)
    sem = semantic_dedup_keep_first(ds, threshold=0.999, k=2, train_rows=100)
    out = pa.concat_tables(
        [pa.table(b) for b in sem.iter_batches(batch_size=1 << 20,
                                               batch_format="pyarrow")],
        promote_options="default")
    drops_sem = _drops(out)

    pairs = embedding_neardup_pairs(ds, "embedding", "vec_id", threshold=0.999)
    kept = set()
    for b in neardup_keep_first(ds, pairs, "vec_id").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        kept.update(b["vec_id"].to_pylist())
    drops_exact = set(t["vec_id"].to_pylist()) - kept

    assert drops_sem  # the planted near-dups were found
    assert drops_sem <= drops_exact          # precision: provable subset
    assert drops_sem == drops_exact          # clusters separated ⇒ recall 1.0


def test_semantic_dedup_deterministic(ray_session):
    t = clustered_fixture(seed=11)
    outs = []
    for _ in range(2):
        sem = semantic_dedup_keep_first(rd.from_arrow(t), threshold=0.99,
                                        k=4, train_rows=100)
        o = pa.concat_tables(
            [pa.table(b) for b in sem.iter_batches(batch_size=1 << 20,
                                                   batch_format="pyarrow")],
            promote_options="default")
        outs.append(sorted(_drops(o)))
    assert outs[0] == outs[1]
