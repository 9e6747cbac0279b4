"""Driver-protocol parity: every oracle-paired queries() entry must match its
DuckDB oracle on row count, column names and values (order-insensitive) —
this mirrors exactly what the driver's CORRECTNESS gate does at sf0.01."""

import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as E


def to_df(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLED = sorted(E.oracle_sql().keys())
ROWS_ONLY = sorted(set(E.queries().keys()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(ray_session, duck, sf_dir, name):
    ray_df = canon(to_df(E.queries()[name](sf_dir)))
    oracle_df = canon(duck.sql(E.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(oracle_df.columns)
    assert len(ray_df) == len(oracle_df)
    # Dtype-strict (after the timestamp-unit canonicalization in canon):
    # the driver's value hash is dtype-sensitive, so an engine int64 vs
    # oracle float64 (e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64) must
    # fail HERE, not burn a driver round (VERDICT r4 #2).
    assert [str(t) for t in ray_df.dtypes] == [str(t) for t in oracle_df.dtypes], (
        f"dtype mismatch: engine {list(zip(ray_df.columns, ray_df.dtypes))} "
        f"vs oracle {list(zip(oracle_df.columns, oracle_df.dtypes))}"
    )
    pd.testing.assert_frame_equal(ray_df, oracle_df,
                                  check_exact=False, rtol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, sf_dir, name):
    df = to_df(E.queries()[name](sf_dir))
    assert len(df) >= 1
    assert len(df.columns) >= 1


def test_entry_smoke(ray_session):
    df = E.entry()
    assert len(df) >= 1
    assert set(df.columns) == {"check_key", "result", "invalid_count"}
