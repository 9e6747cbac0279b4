import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.stages.referential import referential_stats
from raycontract.stages.uniqueness import (
    approx_distinct_count,
    duplicate_stats,
    exact_distinct_count,
)


@pytest.fixture()
def child(ray_session):
    return rd.from_arrow(pa.table({
        "fk": pa.array([1, 2, 2, 3, None, 99, 98], type=pa.int64()),
    }))


@pytest.fixture()
def parent(ray_session):
    return rd.from_arrow(pa.table({"pk": pa.array([1, 2, 3, 4], type=pa.int64())}))


def test_duplicate_stats_semantics(ray_session):
    ds = rd.from_arrow(pa.table({"c": pa.array(["a", "a", "a", "b", "b", "c", None])}))
    st = duplicate_stats(ds, "c")
    # soda-ish convention: NULLs excluded; 2 values occur >1× ('a'×3,'b'×2)
    assert st["duplicate_values"] == 2
    assert st["duplicate_rows"] == 3  # excess rows: 2 extra 'a' + 1 extra 'b'
    assert st["distinct_count"] == 3
    assert set(st["samples"]) <= {"a", "b"}


def test_duplicate_stats_content_hash_path(ray_session):
    ds = rd.from_arrow(pa.table({"b": pa.array([b"x" * 100, b"x" * 100, b"y"], type=pa.binary())}))
    st = duplicate_stats(ds, "b", by_content_hash=True)
    assert st["duplicate_values"] == 1 and st["duplicate_rows"] == 1
    assert st["by_content_hash"] is True


def test_exact_and_approx_distinct(ray_session):
    ds = rd.from_arrow(pa.table({"c": pa.array(list(range(1000)) + list(range(500)))}))
    assert exact_distinct_count(ds, "c") == 1000
    est = approx_distinct_count(ds, "c")
    assert abs(est - 1000) / 1000 < 0.1


def test_referential_broadcast(child, parent):
    st = referential_stats(child, "fk", parent, "pk")
    assert st["strategy"] == "broadcast"
    assert st["violation_rows"] == 2  # 99, 98 dangle; NULL is not a violation
    assert st["violation_keys"] == 2
    assert set(st["samples"]) == {98, 99}


def test_referential_bucketed_matches_broadcast(child, parent):
    st = referential_stats(child, "fk", parent, "pk", broadcast_limit=0, num_buckets=4)
    assert st["strategy"] == "bucketed"
    assert st["violation_rows"] == 2
    assert st["violation_keys"] == 2
    assert set(st["samples"]) == {98, 99}


def test_referential_empty_parent(ray_session, child):
    empty_parent = rd.from_arrow(pa.table({"pk": pa.array([], type=pa.int64())}))
    st = referential_stats(child, "fk", empty_parent, "pk")
    assert st["violation_rows"] == 6  # all non-null FKs dangle


def test_approx_heavy_hitters_pipeline(ray_session):
    import pyarrow as pa

    import ray.data as rd

    from raycontract.pipelines.relational import approx_heavy_hitters

    vals = ["hot"] * 500 + ["warm"] * 200 + [f"v{i}" for i in range(2000)]
    ds = rd.from_arrow(pa.table({"c": pa.array(vals)})).repartition(8)
    top = approx_heavy_hitters(ds, "c", k=2)
    assert top[0] == ("hot", 500)  # verified pass → EXACT counts
    assert top[1] == ("warm", 200)
