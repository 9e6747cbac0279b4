"""Seeded randomized equivalence: the session-3 operators vs DuckDB on
random tables WITH nulls and ties — inputs the curated fixtures don't
reach. Deterministic seeds (no flakiness); each case builds a fresh table,
runs the engine distributed (multi-block) and the oracle SQL over the same
rows, and compares values exactly."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _events(seed: int, n: int = 400) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(1_700_000_000_000_000,
                              1_700_000_000_000_000 + 30 * 86_400_000_000,
                              n))
    ts_mask = rng.random(n) < 0.03
    user = rng.integers(0, 12, n)
    user_mask = rng.random(n) < 0.05
    val = np.round(rng.normal(50, 20, n), 2)
    val_mask = rng.random(n) < 0.05
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array([None if m else int(t) for m, t in zip(ts_mask, ts)],
                       pa.timestamp("us")),
        "user_id": pa.array([None if m else int(u)
                             for m, u in zip(user_mask, user)], pa.int64()),
        "value": pa.array([None if m else float(v)
                           for m, v in zip(val_mask, val)], pa.float64()),
    })


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_latest_snapshot_random(ray_session, seed):
    from raycontract.pipelines.cdc import latest_snapshot

    t = _events(seed)
    got = latest_snapshot(rd.from_arrow(t).repartition(5),
                          "user_id", "ts", "event_id").to_pandas()
    con = duckdb.connect()
    con.register("e", t)
    exp = con.sql("""
        SELECT event_id, ts, user_id, value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) rn
          FROM e) WHERE rn = 1""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_control_chart_random(ray_session, seed):
    from raycontract.pipelines.dataprofile import control_chart

    t = _events(seed)
    got = control_chart(rd.from_arrow(t).repartition(4), "ts",
                        bucket_s=86400, window=7, z=3).to_pandas()
    con = duckdb.connect()
    con.register("e", t)
    exp = con.sql("""
        WITH d AS (SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT)
                     AS bucket_us, CAST(count(*) AS BIGINT) AS n
                   FROM e WHERE ts IS NOT NULL GROUP BY 1),
        w AS (SELECT bucket_us, n,
                CAST(count(n) OVER win AS BIGINT) w,
                CAST(coalesce(sum(n) OVER win, 0) AS BIGINT) s,
                CAST(coalesce(sum(n*n) OVER win, 0) AS BIGINT) ss
              FROM d WINDOW win AS (ORDER BY bucket_us
                   ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        SELECT bucket_us, n AS n_rows, w AS n_window,
               CAST(CASE WHEN w >= 3
                      AND (w*n - s)*(w*n - s) > 9*(w*ss - s*s)
                    THEN 1 ELSE 0 END AS BIGINT) AS flagged FROM w""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [6, 7, 8])
def test_tukey_and_mad_random(ray_session, seed):
    from raycontract.pipelines.groupstats import (mad_outlier_counts,
                                                  tukey_outlier_counts)

    t = _events(seed, n=300)
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("e", t)

    got = tukey_outlier_counts(ds, "user_id", "value").to_pandas()
    exp = con.sql("""
        WITH c AS (SELECT user_id AS g, CAST(round(value*100) AS BIGINT) v
                   FROM e WHERE value IS NOT NULL),
        q AS (SELECT g, CAST(quantile_disc(v, 0.25) AS BIGINT) q1,
                     CAST(quantile_disc(v, 0.75) AS BIGINT) q3
              FROM c GROUP BY g)
        SELECT q.g AS user_id, q.q1 AS q1_cents, q.q3 AS q3_cents,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (
                 WHERE 2*c.v < 2*q.q1 - 3*(q.q3-q.q1)
                    OR 2*c.v > 2*q.q3 + 3*(q.q3-q.q1)) AS BIGINT)
                 AS n_outliers
        FROM c JOIN q ON c.g IS NOT DISTINCT FROM q.g GROUP BY q.g, q.q1, q.q3""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = mad_outlier_counts(ds, "user_id", "value", k=3).to_pandas()
    exp = con.sql("""
        WITH c AS (SELECT user_id AS g, CAST(round(value*100) AS BIGINT) v
                   FROM e WHERE value IS NOT NULL),
        m AS (SELECT g, CAST(quantile_disc(v, 0.5) AS BIGINT) med
              FROM c GROUP BY g),
        d AS (SELECT c.g, c.v, m.med, abs(c.v - m.med) AS dev
              FROM c JOIN m ON c.g IS NOT DISTINCT FROM m.g),
        md AS (SELECT g, CAST(quantile_disc(dev, 0.5) AS BIGINT) mad
               FROM d GROUP BY g)
        SELECT d.g AS user_id, d.med AS median_cents, md.mad AS mad_cents,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE d.dev > 3*md.mad) AS BIGINT)
                 AS n_outliers
        FROM d JOIN md ON d.g IS NOT DISTINCT FROM md.g GROUP BY d.g, d.med, md.mad""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [9, 10, 11])
def test_grouped_topk_random(ray_session, seed):
    from raycontract.pipelines.relational import grouped_topk_values

    rng = np.random.default_rng(seed)
    n = 500
    g = rng.integers(0, 15, n)
    gm = rng.random(n) < 0.05
    v = rng.integers(0, 6, n)
    vm = rng.random(n) < 0.05
    t = pa.table({
        "g": pa.array([None if m else int(x) for m, x in zip(gm, g)],
                      pa.int64()),
        "v": pa.array([None if m else f"v{int(x)}"
                       for m, x in zip(vm, v)]),
    })
    got = grouped_topk_values(rd.from_arrow(t).repartition(4),
                              "g", "v", k=2).to_pandas()
    con = duckdb.connect()
    con.register("e", t)
    exp = con.sql("""
        SELECT g, v, n, rank FROM (
          SELECT g, v, n, CAST(row_number() OVER (PARTITION BY g
                 ORDER BY n DESC, v) AS BIGINT) AS rank
          FROM (SELECT g, v, CAST(count(*) AS BIGINT) n FROM e
                WHERE v IS NOT NULL GROUP BY 1, 2))
        WHERE rank <= 2""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [12, 13])
def test_snapshot_diff_random(ray_session, seed):
    from raycontract.pipelines.cdc import snapshot_diff_counts

    rng = np.random.default_rng(seed)
    n = 300
    a = pa.table({
        "k": pa.array(np.arange(n, dtype=np.int64)),
        "s": pa.array([None if rng.random() < 0.1 else f"s{rng.integers(5)}"
                       for _ in range(n)]),
        "x": pa.array(np.round(rng.normal(0, 9, n), 3), pa.float64()),
    })
    # B: drop ~10%, mutate ~15%, add 30 new keys
    keep = rng.random(n) >= 0.1
    mut = rng.random(n) < 0.15
    xs = np.asarray(a["x"])
    x2 = np.where(mut, np.round(xs + 1.5, 3), xs)
    b = pa.table({
        "k": pa.array(np.concatenate([np.arange(n)[keep],
                                      np.arange(n, n + 30)]).astype(np.int64)),
        "s": pa.array([v for v, kp in zip(a["s"].to_pylist(), keep) if kp]
                      + ["new"] * 30),
        "x": pa.array(np.concatenate([x2[keep], np.zeros(30)]),
                      pa.float64()),
    })
    got = snapshot_diff_counts(rd.from_arrow(a).repartition(3),
                               rd.from_arrow(b).repartition(4),
                               "k", ["s", "x"]).to_pandas().iloc[0]
    con = duckdb.connect()
    con.register("ta", a)
    con.register("tb", b)
    exp = con.sql("""
        WITH j AS (SELECT ta.k AS ka, tb.k AS kb,
                     (coalesce(CAST(ta.s AS VARCHAR), chr(1)) =
                      coalesce(CAST(tb.s AS VARCHAR), chr(1))
                      AND ta.x = tb.x) AS same
                   FROM ta FULL JOIN tb ON ta.k = tb.k)
        SELECT CAST((SELECT count(*) FROM ta) AS BIGINT) n_a,
               CAST((SELECT count(*) FROM tb) AS BIGINT) n_b,
               CAST(count(*) FILTER (WHERE ka IS NULL) AS BIGINT) n_added,
               CAST(count(*) FILTER (WHERE kb IS NULL) AS BIGINT) n_removed,
               CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL AND NOT same) AS BIGINT) n_changed,
               CAST(count(*) FILTER (WHERE ka IS NOT NULL
                    AND kb IS NOT NULL AND same) AS BIGINT) n_unchanged
        FROM j""").df().iloc[0]
    for c in ["n_a", "n_b", "n_added", "n_removed", "n_changed",
              "n_unchanged"]:
        assert got[c] == exp[c], (c, got[c], exp[c])


@pytest.mark.parametrize("seed", [14, 15, 16])
def test_trend_slope_random(ray_session, seed):
    from raycontract.pipelines.dataprofile import trend_slope_by_group

    rng = np.random.default_rng(seed)
    n = 400
    ts = rng.integers(1_700_000_000_000_000,
                      1_700_000_000_000_000 + 20 * 86_400_000_000, n)
    g = rng.integers(0, 6, n)
    t = pa.table({
        "g": pa.array([None if rng.random() < 0.05 else f"g{int(x)}"
                       for x in g]),
        "ts": pa.array([None if rng.random() < 0.03 else int(x)
                        for x in ts], pa.timestamp("us")),
        "v": pa.array([None if rng.random() < 0.05
                       else float(np.round(rng.normal(10, 4), 2))
                       for _ in range(n)], pa.float64()),
    })
    got = trend_slope_by_group(rd.from_arrow(t).repartition(4),
                               "g", "ts", "v").to_pandas()
    con = duckdb.connect()
    con.register("e", t)
    exp = con.sql("""
        WITH c AS (SELECT g, epoch_us(ts) // 1000000
                     - (SELECT epoch_us(min(ts)) // 1000000 FROM e
                        WHERE g IS NOT NULL AND ts IS NOT NULL
                          AND v IS NOT NULL) AS x,
                     CAST(round(v * 100) AS BIGINT) AS y
                   FROM e WHERE g IS NOT NULL AND ts IS NOT NULL
                     AND v IS NOT NULL),
        m AS (SELECT g, CAST(count(*) AS DOUBLE) n,
                     CAST(sum(x) AS DOUBLE) sx, CAST(sum(y) AS DOUBLE) sy,
                     CAST(sum(x*x) AS DOUBLE) sxx,
                     CAST(sum(x*y) AS DOUBLE) sxy
              FROM c GROUP BY g)
        SELECT g, CAST(n AS BIGINT) AS n_rows,
               CAST(round(CASE WHEN n*sxx - sx*sx > 0
                    THEN (n*sxy - sx*sy) / (n*sxx - sx*sx) * 86400.0 * 1e6
                    ELSE 0.0 END) AS BIGINT) AS slope_day_micro
        FROM m""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [17, 18])
def test_entropy_ks_fd_random(ray_session, seed):
    from raycontract.pipelines.dataprofile import (entropy_by_group,
                                                   fd_violations,
                                                   ks_by_group)

    rng = np.random.default_rng(seed)
    n = 600
    t = pa.table({
        "g": pa.array([None if rng.random() < 0.05 else f"s{rng.integers(8)}"
                       for _ in range(n)]),
        "v": pa.array([None if rng.random() < 0.05
                       else int(rng.integers(0, 40))
                       for _ in range(n)], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(5)
    con = duckdb.connect()
    con.register("e", t)

    got = entropy_by_group(ds, "g", "v").to_pandas()
    exp = con.sql("""
        WITH c AS (SELECT g, CAST(v AS VARCHAR) AS v,
                          CAST(count(*) AS BIGINT) AS n
                   FROM e WHERE g IS NOT NULL AND v IS NOT NULL
                   GROUP BY 1, 2),
        m AS (SELECT g, CAST(sum(n) AS BIGINT) AS n_rows,
                     CAST(count(*) AS BIGINT) AS n_distinct,
                     sum(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE))) AS s
              FROM c GROUP BY g)
        SELECT g, n_rows, n_distinct,
               CAST(round((ln(CAST(n_rows AS DOUBLE))
                           - s / CAST(n_rows AS DOUBLE)) * 1e6) AS BIGINT)
                 AS entropy_micro
        FROM m""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = ks_by_group(ds, "g", "v").to_pandas()
    exp = con.sql("""
        WITH c AS (SELECT g, v FROM e
                   WHERE g IS NOT NULL AND v IS NOT NULL),
        vals AS (SELECT DISTINCT v FROM c),
        grp AS (SELECT g, CAST(count(*) AS BIGINT) AS ng FROM c GROUP BY g),
        gv AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY v),
        gcum AS (SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum
                 FROM gv),
        gc AS (SELECT g, v, CAST(count(*) AS BIGINT) AS n
               FROM c GROUP BY g, v),
        dense AS (SELECT grp.g, vals.v, grp.ng, coalesce(gc.n, 0) AS n
                  FROM grp CROSS JOIN vals
                  LEFT JOIN gc ON gc.g = grp.g AND gc.v = vals.v),
        dcum AS (SELECT g, v, ng,
                   CAST(sum(n) OVER (PARTITION BY g ORDER BY v) AS BIGINT)
                     AS cumg FROM dense)
        SELECT d.g, CAST(d.ng AS BIGINT) AS n_rows,
               CAST(round(max(abs(CAST(d.cumg AS DOUBLE)
                      / CAST(d.ng AS DOUBLE)
                      - CAST(gcum.cum AS DOUBLE)
                        / CAST((SELECT count(*) FROM c) AS DOUBLE)))
                      * 1e6) AS BIGINT) AS ks_micro
        FROM dcum d JOIN gcum USING (v) GROUP BY d.g, d.ng""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = fd_violations(ds, "g", "v").to_pandas()
    exp = con.sql("""
        SELECT g, CAST(count(DISTINCT v) AS BIGINT) AS n_distinct_dep
        FROM e GROUP BY g HAVING count(DISTINCT v) > 1""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [19, 20])
def test_orphan_rate_random(ray_session, seed):
    from raycontract.pipelines.dataprofile import orphan_rate_daily

    t = _events(seed)
    ref = pa.table({"rk": pa.array(
        list(np.random.default_rng(seed + 100).integers(0, 8, 30)),
        pa.int64())})
    got = orphan_rate_daily(rd.from_arrow(t).repartition(4),
                            rd.from_arrow(ref).repartition(2),
                            "user_id", "rk", "ts").to_pandas()
    con = duckdb.connect()
    con.register("e", t)
    con.register("r", ref)
    exp = con.sql("""
        SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS bucket_us,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE NOT EXISTS
                 (SELECT 1 FROM r WHERE r.rk = e.user_id)) AS BIGINT)
                 AS n_orphan
        FROM e WHERE ts IS NOT NULL GROUP BY 1""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def _events_dense(seed: int, n: int = 500) -> pa.Table:
    """Events with non-null ts/ids but null users, values and types —
    the window family's ordering columns are total, payloads nullable."""
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    # coarse ts grid → plenty of exact ts TIES (RANGE-frame peers)
    ts = base + rng.integers(0, 2000, n) * 1_000_000
    types = ["view", "click", "purchase", "error", None]
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "user_id": pa.array([None if rng.random() < 0.05
                             else int(rng.integers(0, 10))
                             for _ in range(n)], pa.int64()),
        "event_type": pa.array([types[rng.integers(0, 5)]
                                for _ in range(n)]),
        "value": pa.array(np.round(rng.normal(5, 2, n), 3), pa.float64()),
    })


@pytest.mark.parametrize("seed", [21, 22])
def test_window_family_random(ray_session, seed):
    from raycontract.pipelines.window import (ordered_string_agg,
                                              rolling_time_window,
                                              running_total,
                                              throttle_first_in_window)

    t = _events_dense(seed)
    ds = rd.from_arrow(t).repartition(5)
    con = duckdb.connect()
    con.register("e", t)

    got = running_total(ds, "user_id", "ts", "event_id",
                        "value").to_pandas()
    exp = con.sql("""
        SELECT event_id, user_id,
               CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_micros
        FROM e""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = rolling_time_window(ds, "user_id", "ts", "event_id", "value",
                              window_s=600).to_pandas()
    exp = con.sql("""
        SELECT event_id, user_id,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_window,
               CAST(SUM(micros) OVER w AS BIGINT) AS sum_window_micros
        FROM (SELECT event_id, user_id, ts,
                     CAST(ROUND(value * 1000000) AS BIGINT) AS micros
              FROM e)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 600 SECONDS PRECEDING
             AND CURRENT ROW)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = ordered_string_agg(ds, "user_id", "ts", "event_id",
                             "event_type").to_pandas()
    exp = con.sql("""
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
        FROM e GROUP BY user_id""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = throttle_first_in_window(ds, "user_id", "ts", "event_id",
                                   window_s=300).to_pandas()
    exp = con.sql("""
        SELECT event_id, user_id,
               (d IS NULL OR d > INTERVAL 300 SECONDS) AS kept
        FROM (SELECT event_id, user_id,
                     ts - LAG(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS d
              FROM e)""").df()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [23, 24])
def test_asof_join_random(ray_session, seed):
    """Random nulls + duplicate (key, ts) right rows: engine tie-break =
    max of the first right col, mirrored in the oracle's pre-aggregation
    (DuckDB ASOF leaves ties unspecified, so the oracle collapses them)."""
    from raycontract.pipelines.joins import asof_join

    rng = np.random.default_rng(seed)
    nl, nr = 300, 120
    base = 1_700_000_000_000_000
    left = pa.table({
        "lid": pa.array(np.arange(nl, dtype=np.int64)),
        "k": pa.array([None if rng.random() < 0.05
                       else int(rng.integers(0, 8)) for _ in range(nl)],
                      pa.int64()),
        "lts": pa.array([None if rng.random() < 0.03
                         else base + int(rng.integers(0, 500)) * 1_000_000
                         for _ in range(nl)], pa.timestamp("us")),
    })
    # coarse right ts grid → duplicate (k, ts) pairs exercise the tie-break
    right = pa.table({
        "rid": pa.array(np.arange(nr, dtype=np.int64) + 1000),
        "k": pa.array([int(rng.integers(0, 8)) for _ in range(nr)],
                      pa.int64()),
        "rts": pa.array([base + int(rng.integers(0, 50)) * 10_000_000
                         for _ in range(nr)], pa.timestamp("us")),
    })
    got = asof_join(rd.from_arrow(left).repartition(4),
                    rd.from_arrow(right).repartition(3),
                    "k", "lts", "rts", ["rid"]).to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r0", right)
    # NOTE: DuckDB's ASOF JOIN *matches* a NULL left timestamp to the
    # key's latest right row (a nulls-last sort quirk of its merge
    # implementation, diverging from its own comparison semantics where
    # NULL >= x is NULL). The engine follows the documented SQL-comparison
    # contract — NULL ts matches nothing — so the oracle filters them.
    exp = con.sql("""
        WITH r AS (SELECT k, rts, max(rid) AS rid FROM r0 GROUP BY 1, 2)
        SELECT l.lid, l.k, l.lts, r.rid
        FROM (SELECT * FROM l WHERE lts IS NOT NULL) l
        ASOF JOIN r ON l.k = r.k AND l.lts >= r.rts""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [25, 26])
def test_sessionize_lag_rank_random(ray_session, seed):
    from raycontract.pipelines.joins import lag_delta
    from raycontract.pipelines.relational import sessionize_events
    from raycontract.pipelines.window import group_rank

    t = _events_dense(seed)  # ts ties + null users/types, non-null ids
    ds = rd.from_arrow(t).repartition(5)
    con = duckdb.connect()
    con.register("e", t)

    got = lag_delta(ds.select_columns(["event_id", "ts", "user_id"]),
                    "user_id", "ts", "event_id").to_pandas()
    got = got[["event_id", "user_id", "delta"]].dropna(subset=["delta"])
    got["delta"] = got["delta"].astype("int64")
    exp = con.sql("""
        SELECT event_id, user_id, delta FROM (
          SELECT event_id, user_id,
                 CAST(epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
                   AS delta
          FROM e) t WHERE delta IS NOT NULL""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = group_rank(ds.select_columns(["event_id", "user_id", "value"]),
                     "user_id", "value", "event_id", buckets=4).to_pandas()
    exp = con.sql("""
        SELECT event_id, user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS row_num,
               CAST(RANK() OVER wt AS BIGINT) AS rnk,
               CAST(PERCENT_RANK() OVER wt AS DOUBLE) AS pct_rank,
               CAST(NTILE(4) OVER w AS BIGINT) AS bucket
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
               wt AS (PARTITION BY user_id ORDER BY value)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = sessionize_events(
        ds.select_columns(["user_id", "ts"]), gap_minutes=5).to_pandas()
    got["start_us"] = got.pop("session_start").astype(
        "datetime64[us]").astype("int64")
    got["end_us"] = got.pop("session_end").astype(
        "datetime64[us]").astype("int64")
    exp = con.sql("""
        WITH x AS (SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
                          THEN 1 ELSE 0 END AS new_s
                   FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        y AS (SELECT user_id, ts, SUM(new_s) OVER
                (PARTITION BY user_id ORDER BY ts) AS session_id FROM x)
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
               CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
        FROM y GROUP BY user_id, session_id""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [27, 28])
def test_funnel_timesince_cohort_random(ray_session, seed):
    from raycontract.pipelines.window import (cohort_retention, funnel,
                                              time_since_last_match)

    t = _events_dense(seed)
    ds = rd.from_arrow(t).repartition(5)
    con = duckdb.connect()
    con.register("e", t)

    got = funnel(ds, "user_id", "ts", "event_type",
                 ["view", "click", "purchase"]).to_pandas()
    exp = con.sql("""
        WITH t1 AS (SELECT user_id, MIN(ts) AS ts1 FROM e
                    WHERE event_type = 'view' AND user_id IS NOT NULL
                    GROUP BY user_id),
        t2 AS (SELECT e2.user_id, MIN(e2.ts) AS ts2 FROM e e2
               JOIN t1 ON e2.user_id = t1.user_id
               WHERE e2.event_type = 'click' AND e2.ts > t1.ts1
               GROUP BY e2.user_id),
        t3 AS (SELECT e3.user_id, MIN(e3.ts) AS ts3 FROM e e3
               JOIN t2 ON e3.user_id = t2.user_id
               WHERE e3.event_type = 'purchase' AND e3.ts > t2.ts2
               GROUP BY e3.user_id)
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_keys FROM t1
          UNION ALL SELECT 2, 'click', COUNT(*) FROM t2
          UNION ALL SELECT 3, 'purchase', COUNT(*) FROM t3)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = time_since_last_match(ds, "user_id", "ts", "event_id",
                                "event_type", "error").to_pandas()
    got = got[["event_id", "user_id", "since_micros"]].dropna(
        subset=["since_micros"])
    got["since_micros"] = got["since_micros"].astype("int64")
    exp = con.sql("""
        SELECT event_id, user_id, since_micros FROM (
          SELECT event_id, user_id,
                 CAST(epoch_us(ts) - MAX(CASE WHEN event_type = 'error'
                        THEN epoch_us(ts) END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS since_micros
          FROM e) t WHERE since_micros IS NOT NULL""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = cohort_retention(ds, "user_id", "ts", "event_id").to_pandas()
    exp = con.sql("""
        WITH d AS (SELECT user_id,
                     CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT)
                       AS day FROM e WHERE user_id IS NOT NULL),
        f AS (SELECT user_id, MIN(day) AS cohort_day FROM d
              GROUP BY user_id),
        a AS (SELECT DISTINCT user_id, day FROM d)
        SELECT f.cohort_day, CAST(a.day - f.cohort_day AS BIGINT)
                 AS day_offset,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM a JOIN f USING (user_id) GROUP BY 1, 2""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


def _nasty_docs(seed: int) -> pa.Table:
    """Text with the shapes real corpora throw: empty strings, bare/double
    spaces, leading/trailing spaces, unicode (CJK/emoji/combining), nulls,
    and ordinary sentences."""
    rng = np.random.default_rng(seed)
    vocab = ["the", "cat", "sat", "on", "mat", "a", "dog", "ran", "héllo",
             "日本語", "🙂", "éclair"]
    special = ["", " ", "  ", "a  b", " lead", "trail ", "\tTAB\tsep",
               "日本語 テスト 🙂 🙂", None]
    texts = []
    for i in range(120):
        if i % 8 == 0:
            texts.append(special[(i // 8) % len(special)])
        else:
            k = int(rng.integers(1, 12))
            texts.append(" ".join(rng.choice(vocab, k)))
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


@pytest.mark.parametrize("seed", [29, 30])
def test_text_family_nasty_random(ray_session, seed):
    from raycontract.entry_queries import (bigram_topk_documents_sql,
                                           quality_counts_documents_sql,
                                           text_stats_documents_sql,
                                           word_diversity_documents_sql)
    from raycontract.pipelines.textpipe import (bigram_topk, quality_scores,
                                                text_stats, word_diversity)

    t = _nasty_docs(seed)
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("documents", t)

    got = word_diversity(ds).to_pandas()
    exp = con.sql(word_diversity_documents_sql()).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = bigram_topk(ds, k=50).to_pandas()
    exp = con.sql(bigram_topk_documents_sql().replace(
        "LIMIT 100", "LIMIT 50")).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = text_stats(ds).to_pandas()[["doc_id", "n_tokens", "n_chars_calc"]]
    exp = con.sql(text_stats_documents_sql()).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = quality_scores(ds).to_pandas()[
        ["doc_id", "n_chars_calc", "n_tokens", "n_ws_tokens",
         "n_stop_tokens"]]
    exp = con.sql(quality_counts_documents_sql()).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [31, 32])
def test_relational_aggregates_random(ray_session, seed):
    """ROLLUP / pivot / histogram / grouped mode / key overlap on random
    null-bearing inputs."""
    from raycontract.pipelines.relational import (distinct_key_overlap,
                                                  fixed_width_histogram,
                                                  grouped_mode, pivot_counts,
                                                  rollup_sum)

    rng = np.random.default_rng(seed)
    n = 400
    t = pa.table({
        "f": pa.array([None if rng.random() < 0.06 else
                       ["A", "N", "R"][rng.integers(0, 3)]
                       for _ in range(n)]),
        "s": pa.array([None if rng.random() < 0.06 else
                       ["O", "F", "P"][rng.integers(0, 3)]
                       for _ in range(n)]),
        "qty": pa.array([None if rng.random() < 0.05 else
                         float(np.round(rng.uniform(1, 50), 1))
                         for _ in range(n)], pa.float64()),
        "price": pa.array(np.round(rng.uniform(10, 900, n), 2),
                          pa.float64()),
        "k": pa.array([None if rng.random() < 0.05 else
                       int(rng.integers(0, 25)) for _ in range(n)],
                      pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("e", t)

    got = rollup_sum(ds, ["f", "s"],
                     {"sum_qty": ("qty", 1.0),
                      "sum_cents": ("price", 100.0)})
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = con.sql("""
        SELECT f, s,
               CAST(SUM(CAST(ROUND(qty) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(price * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM e GROUP BY ROLLUP(f, s)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = pivot_counts(ds, "f", "s", ["O", "F", "P"])
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = con.sql("""
        SELECT f AS row_key_placeholder,
               CAST(COUNT(*) FILTER (WHERE s = 'O') AS BIGINT) AS n_O,
               CAST(COUNT(*) FILTER (WHERE s = 'F') AS BIGINT) AS n_F,
               CAST(COUNT(*) FILTER (WHERE s = 'P') AS BIGINT) AS n_P,
               CAST(COUNT(*) AS BIGINT) AS n_total
        FROM e GROUP BY f""").df().rename(
        columns={"row_key_placeholder": "f"})
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = fixed_width_histogram(ds, "price", 100.0)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = con.sql("""
        SELECT CAST(FLOOR(price / 100.0) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e GROUP BY 1""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = grouped_mode(ds, "k", "s")
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = con.sql("""
        SELECT k, mode_value, n_mode FROM (
          SELECT k, s AS mode_value, CAST(COUNT(*) AS BIGINT) AS n_mode,
                 ROW_NUMBER() OVER (PARTITION BY k
                                    ORDER BY COUNT(*) DESC, s ASC) AS rn
          FROM e WHERE s IS NOT NULL GROUP BY k, s) t WHERE rn = 1""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = distinct_key_overlap(ds.select_columns(["k"]), "k",
                               ds.filter(lambda r: (r["k"] or 0) % 2 == 0)
                               .select_columns(["k"]), "k")
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = con.sql("""
        WITH l AS (SELECT DISTINCT k FROM e WHERE k IS NOT NULL),
        r AS (SELECT DISTINCT k FROM e
              WHERE k IS NOT NULL AND k % 2 = 0),
        j AS (SELECT COALESCE(l.k, r.k) AS k,
                     l.k IS NOT NULL AS in_l, r.k IS NOT NULL AS in_r
              FROM l FULL OUTER JOIN r ON l.k = r.k)
        SELECT CAST(COUNT(*) FILTER (in_l AND in_r) AS BIGINT) AS n_both,
               CAST(COUNT(*) FILTER (in_l AND NOT in_r) AS BIGINT)
                 AS n_left_only,
               CAST(COUNT(*) FILTER (in_r AND NOT in_l) AS BIGINT)
                 AS n_right_only
        FROM j""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [33, 34])
def test_dedup_family_random(ray_session, seed):
    """Exact/prefix dedup on random docs with planted duplicates, null and
    empty texts."""
    from raycontract.pipelines.dedup import (duplicate_groups,
                                             exact_dedup_keep_first)

    rng = np.random.default_rng(seed)
    base = [" ".join(rng.choice(["aa", "bb", "cc", "dd"], 6))
            for _ in range(60)]
    texts = []
    for i in range(200):
        r = rng.random()
        if r < 0.05:
            texts.append(None)
        elif r < 0.1:
            texts.append("")
        else:
            texts.append(base[rng.integers(0, len(base))])
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("documents", t)

    got = exact_dedup_keep_first(ds, ["text"], "doc_id").to_pandas()
    exp = con.sql("SELECT CAST(min(doc_id) AS BIGINT) AS doc_id "
                  "FROM documents GROUP BY text").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    def add_prefix(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc
        return pa.table({
            "doc_id": batch["doc_id"],
            "prefix": _pc.utf8_slice_codeunits(batch["text"], 0, 8),
        })

    got = duplicate_groups(ds.map_batches(add_prefix,
                                          batch_format="pyarrow"),
                           ["prefix"], "doc_id").select_columns(
        ["first_id", "n_rows"]).to_pandas()
    exp = con.sql("SELECT CAST(min(doc_id) AS BIGINT) AS first_id, "
                  "CAST(count(*) AS BIGINT) AS n_rows FROM documents "
                  "GROUP BY substr(text, 1, 8) HAVING count(*) > 1").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [35, 36])
def test_sampling_family_random(ray_session, seed):
    """Stratified + weighted deterministic sampling on random inputs with
    null groups/weights — the engine's salted-hash reproducibility vs the
    identical SQL expression."""
    from raycontract.pipelines.sampling import (hash_sql_expr,
                                                stratified_sample,
                                                weighted_sample)

    rng = np.random.default_rng(seed)
    n = 300
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([None if rng.random() < 0.06 else
                          ["en", "de", "fr", "ja"][rng.integers(0, 4)]
                          for _ in range(n)]),
        "n_chars": pa.array([None if rng.random() < 0.05 else
                             int(rng.integers(0, 3000))
                             for _ in range(n)], pa.int64()),
    })
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("documents", t)

    got = stratified_sample(ds.select_columns(["doc_id", "lang"]),
                            "lang", "doc_id", 5, salt=1).to_pandas()
    h = hash_sql_expr("doc_id", salt=1)
    exp = con.sql(f"""
        SELECT doc_id, lang FROM (
          SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY {h}, doc_id) AS rn
          FROM documents) t WHERE rn <= 5""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = weighted_sample(ds.select_columns(["doc_id", "n_chars"]),
                          "doc_id", "n_chars", scale=2000.0,
                          salt=7).to_pandas()
    h = hash_sql_expr("doc_id", salt=7)
    exp = con.sql(f"""
        SELECT doc_id, n_chars FROM documents
        WHERE {h} < CAST(ROUND(4294967296
              * LEAST(1.0, n_chars / 2000.0)) AS BIGINT)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [37, 38])
def test_vocab_oov_nasty_random(ray_session, seed):
    from raycontract.pipelines.textpipe import oov_rate, vocab_topk

    t = _nasty_docs(seed)
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("documents", t)

    got = vocab_topk(ds, k=20).to_pandas()
    exp = con.sql("""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS word
              FROM documents)
        GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 20""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    got = oov_rate(ds, vocab_k=6).to_pandas()
    exp = con.sql("""
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                     FROM documents),
        vocab AS (SELECT w AS word FROM tok GROUP BY w
                  ORDER BY CAST(COUNT(*) AS BIGINT) DESC, w ASC LIMIT 6)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) FILTER (w NOT IN (SELECT word FROM vocab))
                 AS BIGINT) AS n_oov
        FROM tok GROUP BY doc_id""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [39, 40])
def test_hash_split_and_mixture_random(ray_session, seed):
    from raycontract.pipelines.curation import hash_split
    from raycontract.pipelines.sampling import (mixture_sample,
                                                mixture_sample_sql_pred)

    rng = np.random.default_rng(seed)
    n = 400
    # sparse, non-contiguous ids (the hash must not depend on density)
    ids = np.unique(rng.integers(0, 10_000_000, n)).astype(np.int64)
    t = pa.table({
        "doc_id": pa.array(ids),
        "lang": pa.array([None if rng.random() < 0.08 else
                          ["en", "zh", "de", "xx"][rng.integers(0, 4)]
                          for _ in range(len(ids))]),
    })
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("documents", t)

    got = hash_split(ds.select_columns(["doc_id"]), "doc_id",
                     [0.8, 0.1, 0.1], ["train", "val", "test"]).to_pandas()
    b1, b2 = int(0.8 * (1 << 32)), int(0.9 * (1 << 32))
    exp = con.sql(f"""
        SELECT doc_id,
               CASE WHEN h < {b1} THEN 'train'
                    WHEN h < {b2} THEN 'val' ELSE 'test' END AS split
        FROM (SELECT doc_id,
                     (CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
                       AS h
              FROM documents)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    w = {"en": 0.5, "zh": 1.0}
    got = mixture_sample(ds, "lang", "doc_id", w, default=0.25,
                         salt=7).to_pandas()
    pred = mixture_sample_sql_pred("lang", "doc_id", w, default=0.25,
                                   salt=7)
    exp = con.sql(f"SELECT doc_id, lang FROM documents WHERE {pred}").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [41, 42])
def test_sliding_windows_and_centroids_random(ray_session, seed):
    from raycontract.pipelines.relational import sliding_window_agg
    from raycontract.pipelines.similarity import grouped_vector_sum

    t = _events(seed)  # null ts / null values included
    ds = rd.from_arrow(t).repartition(4)
    con = duckdb.connect()
    con.register("e", t)

    got = sliding_window_agg(ds.select_columns(["ts", "value"]),
                             window_s=3600, slide_s=1800).to_pandas()
    exp = con.sql("""
        SELECT CAST((epoch_us(ts) // 1800000000) * 1800000000
               - o.i * 1800000000 AS BIGINT) AS window_start_us,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(coalesce(sum(CAST(round(value*100) AS BIGINT)), 0)
                 AS BIGINT) AS sum_value_cents
        FROM e CROSS JOIN (SELECT range AS i FROM range(0,2)) o
        WHERE ts IS NOT NULL GROUP BY 1""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))

    rng = np.random.default_rng(seed + 50)
    dim, n = 16, 150
    emb = pa.table({
        "label": pa.array([None if rng.random() < 0.05 else
                           int(rng.integers(0, 5)) for _ in range(n)],
                          pa.int32()),
        "embedding": pa.array(
            [list(map(float, np.round(rng.normal(0, 1, dim), 4)))
             for _ in range(n)], pa.list_(pa.float32())),
    })
    got = grouped_vector_sum(rd.from_arrow(emb).repartition(3),
                             "embedding", "label", scale=1000)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    con2 = duckdb.connect()
    con2.register("embeddings", emb)
    exp = con2.sql(f"""
        SELECT label, CAST(i AS BIGINT) AS dim,
               CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000)
                 AS BIGINT)) AS BIGINT) AS sum_scaled,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings, generate_series(1, {dim}) t(i)
        GROUP BY label, i""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))


@pytest.mark.parametrize("seed", [43, 44])
def test_anti_join_random_nulls(ray_session, seed):
    """NOT-EXISTS anti-join with null keys on BOTH sides (the NOT-IN trap:
    null left keys are KEPT, null right keys match nothing) and the forced
    bucketed-exchange path ≡ the broadcast path."""
    from raycontract.pipelines.joins import anti_join

    rng = np.random.default_rng(seed)
    nl = 300
    left = pa.table({
        "k": pa.array([None if rng.random() < 0.07 else
                       int(rng.integers(0, 40)) for _ in range(nl)],
                      pa.int64()),
        "payload": pa.array(np.arange(nl, dtype=np.int64)),
    })
    right = pa.table({"rk": pa.array(
        [None if rng.random() < 0.1 else int(rng.integers(0, 25))
         for _ in range(120)], pa.int64())})
    lds = rd.from_arrow(left).repartition(4)
    rds = rd.from_arrow(right).repartition(3)
    got = anti_join(lds, "k", rds, "rk").to_pandas()
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    exp = con.sql("""
        SELECT k, payload FROM l
        WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.rk = l.k)""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
    # forced bucketed key-exchange path must agree exactly
    got2 = anti_join(lds, "k", rds, "rk", broadcast_limit=1).to_pandas()
    pd.testing.assert_frame_equal(_canon(got2), _canon(exp))


@pytest.mark.parametrize("seed", [45])
def test_heavy_hitters_random(ray_session, seed):
    from raycontract.pipelines.relational import heavy_hitters_users

    rng = np.random.default_rng(seed)
    n = 500
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(np.full(n, 1_700_000_000_000_000,
                               np.int64).astype("datetime64[us]")),
        "user_id": pa.array([None if rng.random() < 0.05 else
                             int(rng.integers(0, 30) ** 2 % 17)
                             for _ in range(n)], pa.int64()),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(np.ones(n), pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    got = heavy_hitters_users(rd.from_arrow(t).repartition(4),
                              k=5).to_pandas()
    con = duckdb.connect()
    con.register("e", t)
    exp = con.sql("""
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM e
        WHERE user_id IS NOT NULL GROUP BY user_id
        ORDER BY n_events DESC, user_id ASC LIMIT 5""").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(exp))
