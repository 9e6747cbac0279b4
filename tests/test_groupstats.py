"""Grouped order-statistics operators (pipelines/groupstats.py): first/last
by composite order, z-score outlier counts, exact per-group quantiles —
checked against DuckDB on synthetic frames with nulls, skew and the forced
multi-round integer-radix path."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.pipelines.groupstats import (
    first_last_by, grouped_quantiles, zscore_outlier_counts)


def _mk_events(n=5000, groups=7, seed=11, with_null_group=True):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, groups, n).astype("int64")
    # heavy skew: group 0 holds ~half the rows
    g[rng.random(n) < 0.5] = 0
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 10**7, n), unit="s")
    v = np.round(rng.normal(500.0, 120.0, n), 2)
    df = pd.DataFrame({"g": g, "ts": ts, "id": np.arange(n, dtype="int64"),
                       "v": v})
    if with_null_group:
        df.loc[df.index[:25], "g"] = pd.NA
        df["g"] = df["g"].astype("Int64")
    return df


@pytest.fixture(scope="module")
def frame():
    return _mk_events()


@pytest.fixture(scope="module")
def duck_t(frame):
    con = duckdb.connect()
    con.register("t", frame)
    return con


def test_first_last_by_matches_window_sql(ray_session, frame, duck_t):
    ds = rd.from_pandas(frame).repartition(8)
    got = first_last_by(ds, "g", "ts", "id", "v").to_pandas()
    want = duck_t.sql("""
WITH w AS (SELECT g,
    first_value(v) OVER (PARTITION BY g ORDER BY ts, id) f,
    last_value(v) OVER (PARTITION BY g ORDER BY ts, id
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) l
  FROM t)
SELECT g, CAST(round(min(f)*100) AS BIGINT) first_cents,
       CAST(round(min(l)*100) AS BIGINT) last_cents,
       CAST(count(*) AS BIGINT) n_rows
FROM w GROUP BY g""").df()
    a = got.sort_values("g", na_position="first").reset_index(drop=True)
    b = want.sort_values("g", na_position="first").reset_index(drop=True)
    a["g"] = a["g"].astype("Int64")
    b["g"] = b["g"].astype("Int64")
    pd.testing.assert_frame_equal(a, b)
    # the null-key group must be present
    assert a["g"].isna().sum() == 1


def test_zscore_outlier_counts_matches_sql(ray_session, frame, duck_t):
    got = zscore_outlier_counts(
        rd.from_pandas(frame).repartition(8), "g", "v", z=2.0).to_pandas()
    want = duck_t.sql("""
WITH c AS (SELECT g, CAST(round(v*100) AS BIGINT) vc FROM t
           WHERE v IS NOT NULL),
s AS (SELECT g, CAST(count(*) AS BIGINT) n, CAST(sum(vc) AS BIGINT) sv,
             CAST(sum(vc*vc) AS BIGINT) sq FROM c GROUP BY g)
SELECT c.g, min(s.n) AS n_rows,
  CAST(count(*) FILTER (WHERE
    abs(CAST(c.vc AS DOUBLE) - CAST(s.sv AS DOUBLE)/CAST(s.n AS DOUBLE)) >
    2.0*sqrt(greatest(CAST(s.sq AS DOUBLE)/CAST(s.n AS DOUBLE)
       - (CAST(s.sv AS DOUBLE)/CAST(s.n AS DOUBLE))
         * (CAST(s.sv AS DOUBLE)/CAST(s.n AS DOUBLE)), 0.0))) AS BIGINT)
    AS n_outliers
FROM c JOIN s ON c.g IS NOT DISTINCT FROM s.g GROUP BY c.g""").df()
    a = got.sort_values("g", na_position="first").reset_index(drop=True)
    b = want.sort_values("g", na_position="first").reset_index(drop=True)
    a["g"] = a["g"].astype("Int64")
    b["g"] = b["g"].astype("Int64")
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_outliers"] > 0).any()  # a 2-sigma cut must flag something


def test_zscore_null_values_excluded(ray_session):
    df = pd.DataFrame({"g": [1, 1, 1, 2], "v": [1.0, None, 3.0, 5.0]})
    got = zscore_outlier_counts(rd.from_pandas(df), "g", "v").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    assert got["n_rows"].tolist() == [2, 1]


@pytest.mark.parametrize("buckets,collect_limit", [(1024, 200_000), (8, 2)])
def test_grouped_quantiles_matches_quantile_disc(ray_session, frame, duck_t,
                                                 buckets, collect_limit):
    """buckets=8/collect_limit=2 forces several integer-radix rounds; the
    default config answers via the single shared gather."""
    got = grouped_quantiles(
        rd.from_pandas(frame).repartition(8), "g", "v", (0.25, 0.5, 0.75),
        buckets=buckets, collect_limit=collect_limit).to_pandas()
    parts = " UNION ALL ".join(
        f"SELECT g, {q} AS q, CAST(quantile_disc(vc, {q}) AS BIGINT) "
        f"AS value_cents FROM c GROUP BY g" for q in (0.25, 0.5, 0.75))
    want = duck_t.sql(
        "WITH c AS (SELECT g, CAST(round(v*100) AS BIGINT) vc FROM t "
        "WHERE v IS NOT NULL) " + parts).df()
    a = got.sort_values(["g", "q"], na_position="first").reset_index(drop=True)
    b = want.sort_values(["g", "q"], na_position="first").reset_index(drop=True)
    a["g"] = a["g"].astype("Int64")
    b["g"] = b["g"].astype("Int64")
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_grouped_quantiles_single_value_groups(ray_session):
    df = pd.DataFrame({"g": [1, 1, 2], "v": [7.0, 7.0, 9.0]})
    got = grouped_quantiles(rd.from_pandas(df), "g", "v", (0.5,)).to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    assert got["value_cents"].tolist() == [700, 900]


def test_grouped_quantiles_max_groups_guard(ray_session, frame):
    with pytest.raises(ValueError, match="max_groups"):
        grouped_quantiles(rd.from_pandas(frame), "id", "v", (0.5,),
                          max_groups=10)
