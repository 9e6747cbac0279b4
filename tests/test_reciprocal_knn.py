"""Reciprocal (mutual) top-k cosine pairs: symmetric by construction, exact
on planted geometry, and guarded above the broadcast limit."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.pipelines.similarity import reciprocal_knn_pairs


def _planted(n_clusters=6, per=5, dim=16, seed=3):
    """list<float> arrow table (the parquet-native embedding layout)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 10
    rows = []
    for c in range(n_clusters):
        for j in range(per):
            rows.append(centers[c] + rng.standard_normal(dim) * 0.01)
    ids = np.arange(len(rows), dtype=np.int64)
    return pa.table({"vec_id": pa.array(ids),
                     "embedding": pa.array([r.tolist() for r in rows],
                                           type=pa.list_(pa.float32()))})


def test_reciprocal_pairs_recover_planted_clusters(ray_session):
    df = _planted()
    got = reciprocal_knn_pairs(rd.from_arrow(df).repartition(4),
                               k=4).to_pandas()
    # with per=5 tight clusters and k=4, mutual pairs = all within-cluster
    # pairs: C(5,2) * 6 = 60
    assert len(got) == 60
    cluster = lambda i: i // 5
    assert all(cluster(a) == cluster(b)
               for a, b in zip(got["id_a"], got["id_b"]))
    assert (got["id_a"] < got["id_b"]).all()
    # symmetric-by-construction: no duplicate unordered pair
    assert got.drop_duplicates().shape[0] == len(got)


def test_reciprocal_pairs_broadcast_guard(ray_session):
    df = _planted()
    with pytest.raises(ValueError, match="max_broadcast"):
        reciprocal_knn_pairs(rd.from_arrow(df), k=2, max_broadcast=10)
