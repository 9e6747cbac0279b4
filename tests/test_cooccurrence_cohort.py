"""Edge cases for the round-5 analytics operators: item-pair co-occurrence
(bitmask kernel) and cohort retention (run-local distinct days)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def test_cooccurrence_pairs_edges(ray_session):
    from raycontract.pipelines.relational import cooccurrence_pairs

    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 4, 4], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "a", "b", "a", None, "b"]),
    })
    out = {(r["item_a"], r["item_b"]): r["n_keys"]
           for r in cooccurrence_pairs(rd.from_arrow(t), "user_id",
                                       "event_type").take_all()}
    # user 1 contributes (a,b)(a,c)(b,c); user 2 adds (a,b); users 3/4
    # have <2 distinct non-null items -> no pairs; nulls ignored
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_duplicate_rows_count_once(ray_session):
    from raycontract.pipelines.relational import cooccurrence_pairs

    t = pa.table({
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["a", "a", "a", "b", "b", "b"]),
    })
    out = cooccurrence_pairs(rd.from_arrow(t), "user_id",
                             "event_type").take_all()
    assert len(out) == 1 and out[0]["n_keys"] == 1  # DISTINCT semantics


def test_cooccurrence_vocab_bound_raises(ray_session):
    from raycontract.pipelines.relational import cooccurrence_pairs

    t = pa.table({
        "user_id": pa.array([1] * 70, pa.int64()),
        "event_type": pa.array([f"t{i}" for i in range(70)]),
    })
    with pytest.raises(Exception, match="max_items"):
        cooccurrence_pairs(rd.from_arrow(t), "user_id", "event_type",
                           num_partitions=1).take_all()


def test_cohort_retention_distinct_days(ray_session):
    from raycontract.pipelines.window import cohort_retention

    DAY = 86_400_000_000
    # user 1: 3 events on day 10 (counts once), one on day 12
    # user 2: first seen day 11, returns day 11 (same day) only
    ts = pa.array([10 * DAY + 5, 10 * DAY + 99, 10 * DAY, 12 * DAY + 1,
                   11 * DAY, 11 * DAY + 7], pa.timestamp("us"))
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": ts,
    })
    out = {(r["cohort_day"], r["day_offset"]): r["n_keys"]
           for r in cohort_retention(rd.from_arrow(t), "user_id", "ts",
                                     "event_id").take_all()}
    assert out == {(10, 0): 1, (10, 2): 1, (11, 0): 1}


def test_cooccurrence_null_keys_dropped(ray_session):
    from raycontract.pipelines.relational import cooccurrence_pairs

    # null keys never equi-join in SQL: their items must NOT leak into any
    # real key's bitmask (review r5 finding: -1 codes wrapped to the last key)
    t = pa.table({
        "user_id": pa.array([1, 1, 2, None, None, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "a", "b", "c"]),
    })
    out = {(r["item_a"], r["item_b"]): r["n_keys"]
           for r in cooccurrence_pairs(rd.from_arrow(t), "user_id",
                                       "event_type").take_all()}
    assert out == {("a", "b"): 1}
    # all-null partition must not crash
    t2 = pa.table({"user_id": pa.array([None, None], pa.int64()),
                   "event_type": pa.array(["a", "b"])})
    assert cooccurrence_pairs(rd.from_arrow(t2), "user_id", "event_type",
                              num_partitions=1).count() == 0
