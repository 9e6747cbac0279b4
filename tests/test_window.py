"""Window-function kernels (pipelines/window.py): running totals, trailing
RANGE frames and funnels — edge cases the sf-fixture parity test can't hit
(timestamp ties/peers, single-row keys, strict-after funnel ordering), all
checked against DuckDB's window engine on the same table."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.pipelines.window import funnel, rolling_time_window, running_total


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture()
def ties_table():
    # user 1: tied timestamps (peers!), user 2: single row, user 3: values
    # spanning the window edge exactly (boundary is INCLUSIVE per SQL RANGE)
    ts = pa.array(
        [1_000_000, 1_000_000, 1_000_000, 3_600_000_000 + 1_000_000,
         5_000_000,
         0, 3_600_000_000, 7_200_000_000],
        pa.timestamp("us"))
    return pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 3, 3, 3], pa.int64()),
        "value": pa.array([1.5, 2.25, -3.0, 10.0, 7.0, 1.0, 2.0, 4.0]),
        "ts": ts,
    })


def test_running_total_ties_match_duckdb(ray_session, ties_table):
    out = running_total(rd.from_arrow(ties_table), "user_id", "ts",
                        "event_id", "value").to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               SUM(CAST(ROUND(value*1000000) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS running_micros
        FROM ties_table""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)


def test_rolling_range_frame_peers_match_duckdb(ray_session, ties_table):
    out = rolling_time_window(rd.from_arrow(ties_table), "user_id", "ts",
                              "event_id", "value", window_s=3600).to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
               SUM(micros) OVER w AS sum_window_micros
        FROM (SELECT event_id, user_id, ts,
                     CAST(ROUND(value*1000000) AS BIGINT) AS micros
              FROM ties_table)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)
    # peers: user 1's three tied rows must each see all three (RANGE, not ROWS)
    u1 = out[(out.user_id == 1) & (out.event_id <= 3)]
    assert set(u1.n_window) == {3}


def test_rolling_many_keys_vectorized(ray_session):
    # 5k keys × ~20 rows: exercises the chunked offset-searchsorted path
    rng = np.random.default_rng(7)
    n = 100_000
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 5000, n).astype(np.int64)),
        "value": pa.array(rng.normal(10, 3, n)),
        "ts": pa.array(rng.integers(0, 86_400_000_000, n).astype("int64"),
                       pa.timestamp("us")),
    })
    out = rolling_time_window(rd.from_arrow(t), "user_id", "ts", "event_id",
                              "value", window_s=3600).to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
               SUM(micros) OVER w AS sum_window_micros
        FROM (SELECT event_id, user_id, ts,
                     CAST(ROUND(value*1000000) AS BIGINT) AS micros FROM t)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                     AND CURRENT ROW)""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)


def test_funnel_strictly_after(ray_session):
    # user 1 completes all 3; user 2's purchase is BEFORE its click (only 2
    # steps); user 3's click ties its view timestamp exactly (strict > ⇒
    # click does not count)
    t = pa.table({
        "event_id": pa.array(list(range(1, 10)), pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 3], pa.int64()),
        "event_type": pa.array(["view", "click", "purchase",
                                "view", "purchase", "click",
                                "view", "click", "purchase"]),
        "ts": pa.array([10, 20, 30, 10, 15, 20, 10, 10, 30],
                       pa.timestamp("us")),
    })
    out = funnel(rd.from_arrow(t), "user_id", "ts", "event_type",
                 ["view", "click", "purchase"]).to_pandas()
    got = dict(zip(out.step, out.n_keys))
    assert got == {1: 3, 2: 2, 3: 1}


def test_time_since_last_match_resets_per_key(ray_session):
    from raycontract.pipelines.window import time_since_last_match

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
        "event_type": ["error", "view", "error", "view", "error", "view"],
        "ts": pa.array([10, 25, 40, 100, 110, 150], pa.timestamp("us")),
    })
    out = time_since_last_match(rd.from_arrow(t), "user_id", "ts",
                                "event_id", "event_type",
                                "error").to_pandas().set_index("event_id")
    assert out.loc[1].since_micros == 0        # inclusive of current row
    assert out.loc[2].since_micros == 15
    assert out.loc[3].since_micros == 0        # new error resets
    assert pd.isna(out.loc[4].since_micros)    # user 2: before first error
    assert out.loc[6].since_micros == 40       # no cross-user carry (u1@40)


def test_segmented_maximum_accumulate_chunked():
    from raycontract.pipelines.window import _segmented_maximum_accumulate

    NEG = np.iinfo(np.int64).min
    rng = np.random.default_rng(2)
    lengths = rng.integers(1, 6, 300)
    starts = np.r_[0, np.cumsum(lengths)[:-1]]
    n = int(lengths.sum())
    vals = np.where(rng.random(n) < 0.4,
                    rng.integers(0, 10**15, n), NEG).astype(np.int64)
    # huge span forces multi-chunk processing
    got = _segmented_maximum_accumulate(vals, starts, lengths)
    ref = np.empty(n, dtype=np.int64)
    for s, ln in zip(starts, lengths):
        np.maximum.accumulate(vals[s:s + ln], out=ref[s:s + ln])
    assert (got == ref).all()


def test_group_rank_ties_and_ntile_match_duckdb(ray_session):
    from raycontract.pipelines.window import group_rank

    # user 1: tied values (RANK shares, ROW_NUMBER doesn't), 6 rows with
    # NTILE(4) -> bucket sizes 2,2,1,1; user 2: single row
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 1, 2], pa.int64()),
        "value": pa.array([5.0, 5.0, 1.0, 9.0, 1.0, 7.0, 3.0]),
    })
    out = group_rank(rd.from_arrow(t), "user_id", "value", "event_id",
                     buckets=4).to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS row_num,
               CAST(RANK() OVER wt AS BIGINT) AS rnk,
               CAST(PERCENT_RANK() OVER wt AS DOUBLE) AS pct_rank,
               CAST(NTILE(4) OVER w AS BIGINT) AS bucket
        FROM t
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
               wt AS (PARTITION BY user_id ORDER BY value)""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)
    u1 = out[out.user_id == 1].set_index("event_id")
    assert u1.loc[3].rnk == u1.loc[5].rnk == 1      # tied minimum shares rank
    assert {u1.loc[3].row_num, u1.loc[5].row_num} == {1, 2}
    assert out[out.user_id == 2].pct_rank.iloc[0] == 0.0  # single row


def test_throttle_first_in_window_boundaries(ray_session):
    from raycontract.pipelines.window import throttle_first_in_window

    S = 1_000_000  # 1s in us
    # key A: second event exactly AT the window edge (strict > -> dropped),
    # third 1us past it (kept); key B: single event
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array(["A", "A", "A", "B"]),
        "ts": pa.array([0, 10 * S, 20 * S + 1, 5], pa.timestamp("us")),
    })
    out = {r["event_id"]: r["kept"] for r in throttle_first_in_window(
        rd.from_arrow(t), "k", "ts", "event_id", window_s=10).take_all()}
    assert out == {1: True, 2: False, 3: True, 4: True}


def test_merge_intervals_gaps_and_islands(ray_session):
    from raycontract.pipelines.window import merge_intervals

    # key A: [0,10] [5,8] (contained) [10,20] (touching -> merges)
    #        [21,30] (strictly after 20 -> new episode)
    # key B: single interval
    t = pa.table({
        "k": pa.array(["A", "A", "A", "A", "B"]),
        "s": pa.array([0, 5, 10, 21, 100], pa.int64()),
        "e": pa.array([10, 8, 20, 30, 110], pa.int64()),
        "rid": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = sorted((r["k"], r["episode_start"], r["episode_end"], r["n_rows"])
                 for r in merge_intervals(rd.from_arrow(t), "k", "s", "e",
                                          "rid").take_all())
    assert out == [("A", 0, 20, 3), ("A", 21, 30, 1), ("B", 100, 110, 1)]


def test_merge_intervals_running_max_not_prev_end(ray_session):
    from raycontract.pipelines.window import merge_intervals

    # [0,100] [10,20] [30,40]: naive prev-END comparison would split at 30
    # (30 > 20) — the running MAX end (100) must keep them in one episode
    t = pa.table({
        "k": pa.array(["A", "A", "A"]),
        "s": pa.array([0, 10, 30], pa.int64()),
        "e": pa.array([100, 20, 40], pa.int64()),
        "rid": pa.array([1, 2, 3], pa.int64()),
    })
    out = merge_intervals(rd.from_arrow(t), "k", "s", "e", "rid").take_all()
    assert len(out) == 1 and out[0]["episode_end"] == 100 and out[0]["n_rows"] == 3


def test_group_rank_int64_above_2_53_and_nulls(ray_session):
    from raycontract.pipelines.window import group_rank

    big = 1 << 53
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "v": pa.array([big, big + 1, None, None], pa.int64()),
    })
    out = group_rank(rd.from_arrow(t), "user_id", "v",
                     "event_id").to_pandas().set_index("event_id")
    # adjacent int64 values above 2^53 must NOT collapse into a tie
    assert out.loc[1].rnk == 1 and out.loc[2].rnk == 2
    # NULLs sort last and are ONE peer group (SQL ASC NULLS LAST)
    assert out.loc[3].rnk == out.loc[4].rnk == 3
    assert {out.loc[3].row_num, out.loc[4].row_num} == {3, 4}


def test_throttle_events_null_vs_empty_event_type(ray_session, duck, sf_dir):
    """NULL and '' event_type are DISTINCT throttle partitions (review r5)."""
    import duckdb as _dd

    import raycontract.entry_queries as q

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7], pa.int64()),
        "event_type": pa.array(["", None, "", None]),
        "ts": pa.array([0, 100_000_000, 200_000_000, 300_000_000],
                       pa.timestamp("us")),
        "value": pa.array([0.0] * 4),
        "props": pa.array(["{}"] * 4),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = q.throttle_events(d).to_pandas().set_index("event_id")
        con = _dd.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'events.parquet')}')")
        oracle = con.sql(q.throttle_events_sql()).df().set_index("event_id")
        assert dict(out.kept) == dict(oracle.kept) == {
            1: True, 2: True, 3: False, 4: False}
