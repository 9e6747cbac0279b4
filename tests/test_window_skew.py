"""Skewed-key property test for the round-4b window/profile partition
kernels (VERDICT r4 #8): sf0.1-scale events with ONE user owning 20% of all
rows, so the hot key's partition is far larger than any input block or
batch. Every operator must still match DuckDB's window engine exactly —
this locks the run-boundary kernels' behavior when one key dominates a
partition (the skew case 100-TB inputs always have)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

HOT_USER = 7
N = 100_000  # sf0.1 events-table scale
N_HOT = N // 5  # 20% of all events on one key


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.fixture(scope="module")
def skewed(ray_session):
    rng = np.random.default_rng(42)
    users = rng.integers(100, 5100, N).astype(np.int64)
    users[rng.permutation(N)[:N_HOT]] = HOT_USER
    t = pa.table({
        "event_id": pa.array(np.arange(N, dtype=np.int64)),
        "user_id": pa.array(users),
        "event_type": pa.array(
            np.array(["view", "click", "purchase", "error"])[
                rng.integers(0, 4, N)]),
        "value": pa.array(rng.normal(10, 3, N)),
        "ts": pa.array(rng.integers(0, 86_400_000_000, N).astype("int64"),
                       pa.timestamp("us")),
    })
    # many small input blocks: the hot key's rows span far more than one
    # block/batch before the partition exchange co-locates them
    ds = rd.from_arrow(t).repartition(64).materialize()
    assert (users == HOT_USER).sum() == N_HOT
    return ds, t


def test_running_total_skewed(ray_session, skewed):
    from raycontract.pipelines.window import running_total

    ds, t = skewed
    out = running_total(ds, "user_id", "ts", "event_id", "value").to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               SUM(CAST(ROUND(value*1000000) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS running_micros
        FROM t""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)


def test_rolling_range_frame_skewed(ray_session, skewed):
    from raycontract.pipelines.window import rolling_time_window

    ds, t = skewed
    out = rolling_time_window(ds, "user_id", "ts", "event_id", "value",
                              window_s=3600).to_pandas()
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
    # the hot key really is one giant run inside its partition
    assert (out.user_id == HOT_USER).sum() == N_HOT


def test_funnel_skewed(ray_session, skewed):
    from raycontract.pipelines.window import funnel

    ds, t = skewed
    out = funnel(ds, "user_id", "ts", "event_type",
                 ["view", "click", "purchase"]).to_pandas()
    oracle = duckdb.sql("""
        WITH v AS (SELECT user_id, MIN(ts) ts FROM t
                   WHERE event_type='view' GROUP BY user_id),
        c AS (SELECT t.user_id, MIN(t.ts) ts FROM t JOIN v USING (user_id)
              WHERE t.event_type='click' AND t.ts > v.ts GROUP BY t.user_id),
        p AS (SELECT t.user_id, MIN(t.ts) ts FROM t JOIN c USING (user_id)
              WHERE t.event_type='purchase' AND t.ts > c.ts GROUP BY t.user_id)
        SELECT 1 step, COUNT(*) n FROM v
        UNION ALL SELECT 2, COUNT(*) FROM c
        UNION ALL SELECT 3, COUNT(*) FROM p""").df()
    got = (out.groupby("step").n_keys.sum().to_dict())
    want = dict(zip(oracle.step, oracle.n))
    assert got == want


def test_ordered_string_agg_skewed(ray_session, skewed):
    from raycontract.pipelines.window import ordered_string_agg

    ds, t = skewed
    out = ordered_string_agg(ds, "user_id", "ts", "event_id",
                             "event_type").to_pandas()
    oracle = duckdb.sql("""
        SELECT user_id, string_agg(event_type, '>' ORDER BY ts, event_id)
               AS journey
        FROM t GROUP BY user_id""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)
    hot = out[out.user_id == HOT_USER].journey.iloc[0]
    assert hot.count(">") == N_HOT - 1  # 20k-element journey, one key


def test_time_since_last_match_skewed(ray_session, skewed):
    from raycontract.pipelines.window import time_since_last_match

    ds, t = skewed
    out = time_since_last_match(ds, "user_id", "ts", "event_id",
                                "event_type", "error").to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               CAST(epoch_us(ts) AS BIGINT) -
               MAX(CASE WHEN event_type='error'
                        THEN CAST(epoch_us(ts) AS BIGINT) END) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS since_micros
        FROM t""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)
