"""Distribution-profile operators (pipelines/dataprofile.py): PSI flags an
injected drift, Benford confirms a conforming synthetic and flags a uniform
one, Pearson recovers planted linear structure."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from raycontract.pipelines.dataprofile import (
    benford_profile, pearson_corr, psi_by_group)


def test_psi_flags_shifted_group(ray_session):
    rng = np.random.default_rng(7)
    stable = rng.normal(500, 60, 4000)
    shifted = rng.normal(900, 60, 4000)  # heavy drift
    tbl = pa.table({
        "src": pa.array(["a"] * 4000 + ["b"] * 4000),
        "v": pa.array(np.concatenate([stable, shifted])),
    })
    out = psi_by_group(rd.from_arrow(tbl).repartition(6), "src", "v",
                       bucket_width=50).to_pandas().set_index("src")
    # both groups drift from the pooled global, but symmetric halves give
    # comparable PSI; a shifted group must be far above the classic 0.2 bar
    assert out.loc["a", "psi_micro"] > 200_000
    assert out.loc["b", "psi_micro"] > 200_000
    assert out["n_rows"].tolist() == [4000, 4000]


def test_psi_near_zero_for_identical_groups(ray_session):
    rng = np.random.default_rng(8)
    v = rng.normal(500, 60, 8000)
    tbl = pa.table({"src": pa.array(["a", "b"] * 4000), "v": pa.array(v)})
    out = psi_by_group(rd.from_arrow(tbl).repartition(6), "src", "v",
                       bucket_width=50).to_pandas()
    assert (out["psi_micro"] < 20_000).all()  # PSI < 0.02: stable


def test_benford_conforming_vs_uniform(ray_session):
    rng = np.random.default_rng(9)
    # log-uniform across 4 decades IS Benford-distributed
    conforming = 10.0 ** rng.uniform(0, 4, 20000)
    uniform = rng.uniform(1000.0, 2000.0, 20000)  # leading digit 1 always
    c = benford_profile(rd.from_arrow(pa.table({"v": pa.array(conforming)})),
                        "v", scale=100.0).to_pandas()
    u = benford_profile(rd.from_arrow(pa.table({"v": pa.array(uniform)})),
                        "v", scale=100.0).to_pandas()
    assert c["digit"].tolist() == list(range(1, 10))
    assert int(c["n"].sum()) == 20000
    # chi2 (sum of per-digit contributions, df=8): conforming small,
    # degenerate huge
    assert c["chi2_micro"].sum() < 40 * 10**6
    assert u["chi2_micro"].sum() > 10**10
    # counts align with expectations on the conforming sample (±12%)
    assert np.allclose(c["n"], c["expected_micro"] / 1e6, rtol=0.12)


def test_pearson_recovers_planted_correlation(ray_session):
    rng = np.random.default_rng(10)
    x = rng.uniform(1, 50, 10000)
    y_pos = 3.0 * x + rng.normal(0, 1.0, 10000)
    out = pearson_corr(rd.from_arrow(pa.table(
        {"x": pa.array(x), "y": pa.array(y_pos)})).repartition(5),
        "x", "y").to_pandas()
    assert out["n_rows"][0] == 10000
    assert out["corr_micro"][0] > 990_000  # ~+1.0
    y_ind = rng.normal(0, 1.0, 10000) + 5.0
    out2 = pearson_corr(rd.from_arrow(pa.table(
        {"x": pa.array(x), "y": pa.array(y_ind)})), "x", "y").to_pandas()
    assert abs(out2["corr_micro"][0]) < 50_000  # ~0


def test_quality_trend_buckets_nulls_and_distincts(ray_session):
    import duckdb
    import pandas as pd
    from raycontract.pipelines.dataprofile import quality_trend

    rng = np.random.default_rng(12)
    n = 3000
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 10 * 86400, n), unit="s")
    val = rng.uniform(10, 90, n)
    df = pd.DataFrame({"ts": ts, "value": val,
                       "user_id": rng.integers(0, 40, n).astype("int64")})
    # day 2024-03-03 becomes ALL-null; sprinkle other nulls
    df.loc[df["ts"].dt.date == pd.Timestamp("2024-03-03").date(), "value"] = np.nan
    df.loc[df.index[:100], "value"] = np.nan
    got = quality_trend(rd.from_pandas(df).repartition(6), "ts", "value",
                        "user_id").to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    want = con.sql("""
SELECT CAST(epoch_us(date_trunc('day', ts)) AS BIGINT) AS bucket_us,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_ids,
       CAST(min(round(value*100)) AS BIGINT) AS min_cents,
       CAST(max(round(value*100)) AS BIGINT) AS max_cents
FROM events GROUP BY 1""").df()
    a = got.sort_values("bucket_us").reset_index(drop=True)
    b = want.sort_values("bucket_us").reset_index(drop=True)[a.columns]
    pd.testing.assert_frame_equal(a, b)
    # the all-null day must be present with null min/max
    allnull = a[a["n_rows"] == a["n_null"]]
    assert len(allnull) == 1
    assert allnull["min_cents"].isna().all()
