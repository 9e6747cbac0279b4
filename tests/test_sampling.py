"""Deterministic sampling operators (pipelines/sampling.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd
from raycontract.pipelines.sampling import (bottomk_sample, hash_sql_expr,
                                            hash_u32, sample_fraction,
                                            stratified_sample)


def _ds(n=1000):
    return rd.from_arrow(pa.table({
        "id": np.arange(n),
        "g": np.array([f"g{i % 7}" for i in range(n)]),
    }))


def test_hash_matches_sql_expr_int_and_string():
    import duckdb

    t = pa.table({"i": np.arange(200), "s": [f"doc-{i}" for i in range(200)]})
    con = duckdb.connect()
    con.register("t", t)
    for col, string_id in (("i", False), ("s", True)):
        for salt in (0, 9):
            got = hash_u32(t[col], salt)
            exp = np.array([r[0] for r in con.execute(
                f"SELECT {hash_sql_expr(col, salt, string_id=string_id)} "
                f"FROM t ORDER BY i").fetchall()], dtype=np.uint64)
            assert (got == exp).all(), (col, salt)


def test_sample_fraction_deterministic(ray_session):
    a = sorted(r["id"] for r in sample_fraction(_ds(), "id", 0.2, salt=5).take_all())
    b = sorted(r["id"] for r in sample_fraction(_ds(), "id", 0.2, salt=5).take_all())
    assert a == b
    assert 0.1 < len(a) / 1000 < 0.3
    c = sorted(r["id"] for r in sample_fraction(_ds(), "id", 0.2, salt=6).take_all())
    assert a != c  # salt changes the sample


def test_sample_fraction_bounds(ray_session):
    assert sample_fraction(_ds(100), "id", 0.0).count() == 0
    assert sample_fraction(_ds(100), "id", 1.0).count() == 100
    with pytest.raises(ValueError):
        sample_fraction(_ds(10), "id", 1.5)


def test_bottomk_exact_n_and_block_invariant(ray_session):
    out = bottomk_sample(_ds(), "id", 25, salt=2).take_all()
    assert len(out) == 25
    # same result regardless of block layout
    repart = rd.from_arrow(pa.table({
        "id": np.arange(1000), "g": ["x"] * 1000})).repartition(13)
    out2 = bottomk_sample(repart, "id", 25, salt=2).take_all()
    assert sorted(r["id"] for r in out) == sorted(r["id"] for r in out2)
    # equals the brute-force definition
    h = hash_u32(pa.array(np.arange(1000)), 2)
    exp = set(np.lexsort((np.arange(1000), h))[:25].tolist())
    assert {r["id"] for r in out} == exp


def test_bottomk_n_larger_than_table(ray_session):
    assert bottomk_sample(_ds(10), "id", 50).count() == 10


def test_stratified_quota_per_group(ray_session):
    out = stratified_sample(_ds(), "g", "id", 3, salt=4).take_all()
    from collections import Counter

    per = Counter(r["g"] for r in out)
    assert set(per) == {f"g{i}" for i in range(7)}
    assert all(v == 3 for v in per.values())
    # per-group winners = brute force
    h = hash_u32(pa.array(np.arange(1000)), 4)
    for gi in range(7):
        ids = np.arange(gi, 1000, 7)
        exp = set(ids[np.lexsort((ids, h[ids]))[:3]].tolist())
        assert {r["id"] for r in out if r["g"] == f"g{gi}"} == exp


def test_stratified_small_groups_kept_whole(ray_session):
    ds = rd.from_arrow(pa.table({"id": [1, 2, 3], "g": ["a", "a", "b"]}))
    out = stratified_sample(ds, "g", "id", 5).take_all()
    assert len(out) == 3


class TestTopkPerGroup:
    def test_matches_window_rank(self, ray_session):
        import duckdb

        from raycontract.pipelines.relational import topk_per_group

        rng = np.random.default_rng(13)
        t = pa.table({"id": np.arange(500),
                      "g": rng.integers(0, 8, 500),
                      "v": rng.integers(0, 40, 500).astype(float)})  # ties
        out = topk_per_group(rd.from_arrow(t), "g", "v", 4, id_col="id").take_all()
        con = duckdb.connect()
        con.register("t", t)
        exp = con.execute("""
            SELECT id FROM (SELECT id, ROW_NUMBER() OVER
              (PARTITION BY g ORDER BY v DESC, id) rn FROM t) WHERE rn <= 4
        """).fetchall()
        assert sorted(r["id"] for r in out) == sorted(r[0] for r in exp)

    def test_ascending_and_block_invariance(self, ray_session):
        from raycontract.pipelines.relational import topk_per_group

        t = pa.table({"id": np.arange(100), "g": ["a"] * 100,
                      "v": np.arange(100)[::-1].astype(float)})
        out = topk_per_group(rd.from_arrow(t).repartition(7), "g", "v", 5,
                             id_col="id", descending=False).take_all()
        assert sorted(r["id"] for r in out) == [95, 96, 97, 98, 99]

    def test_requires_id(self, ray_session):
        from raycontract.pipelines.relational import topk_per_group

        with pytest.raises(ValueError, match="id_col"):
            topk_per_group(rd.from_items([{"g": 1, "v": 1.0}]), "g", "v", 1)


def test_mixture_sample_weights(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raycontract.pipelines.sampling import hash_u32, mixture_sample

    n = 4000
    ds = rd.from_arrow(pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "grp": pa.array(["a" if i % 2 else "b" for i in range(n)]),
    }))
    out = mixture_sample(ds, "grp", "id", {"a": 1.0, "b": 0.0}, salt=3).take_all()
    # weight 1.0 keeps every 'a' row, weight 0.0 drops every 'b' row
    assert len(out) == n // 2 and all(r["grp"] == "a" for r in out)

    kept = mixture_sample(ds, "grp", "id", {"a": 0.5}, default=0.25, salt=3).take_all()
    thr_a, thr_d = int(0.5 * 2**32), int(0.25 * 2**32)
    h = hash_u32(pa.array(np.arange(n, dtype=np.int64)), 3)
    expect = sum(1 for i in range(n)
                 if h[i] < (thr_a if i % 2 else thr_d))
    assert len(kept) == expect


def test_mixture_sample_rejects_bad_weight(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from raycontract.pipelines.sampling import mixture_sample

    ds = rd.from_arrow(pa.table({"id": [1], "grp": ["a"]}))
    with pytest.raises(ValueError):
        mixture_sample(ds, "grp", "id", {"a": 1.5})
