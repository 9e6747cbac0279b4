"""Regression tests for the round-4b code-review findings: SQL ROUND
half-away-from-zero parity on exact .5 products, NULL semantics in grouped
COUNT DISTINCT and word_diversity, raw (un-normalized) centroid sums at a
scale where normalization flips rounding, and anti_join empty-right typing."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from raycontract.pipelines.joins import anti_join
from raycontract.pipelines.relational import grouped_count_distinct
from raycontract.pipelines.textpipe import word_diversity
from raycontract.pipelines.window import running_total


def _canon(df):
    c = sorted(df.columns)
    return df[c].sort_values(c).reset_index(drop=True)


def test_running_total_exact_half_matches_sql_round(ray_session):
    # 2.5e-6 * 1e6 == 2.5 exactly in float64: SQL ROUND gives 3 (half away
    # from zero); pc.round's DEFAULT half-to-even would give 2
    t = pa.table({"event_id": pa.array([1, 2], pa.int64()),
                  "user_id": pa.array([1, 1], pa.int64()),
                  "value": pa.array([2.5e-6, -3.5e-6]),
                  "ts": pa.array([10, 20], pa.timestamp("us"))})
    out = running_total(rd.from_arrow(t), "user_id", "ts", "event_id",
                        "value").to_pandas()
    oracle = duckdb.sql("""
        SELECT event_id, user_id,
               SUM(CAST(ROUND(value*1000000) AS BIGINT)) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS running_micros
        FROM t""").df()
    pd.testing.assert_frame_equal(_canon(out), _canon(oracle),
                                  check_dtype=False)
    assert out.set_index("event_id").running_micros[1] == 3


def test_grouped_count_distinct_ignores_nulls(ray_session):
    t = pa.table({"g": ["x", "x", "y"],
                  "v": pa.array([1, None, None], pa.int64())})
    out = grouped_count_distinct(rd.from_arrow(t), "g", "v").to_pandas()
    got = dict(zip(out.g, out.n_distinct))
    assert got.get("x") == 1          # NULL not counted
    assert got.get("y", 0) == 0 or "y" not in got  # all-NULL group → 0 rows


def test_word_diversity_null_text_omitted(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["a b", None])})
    out = word_diversity(rd.from_arrow(t)).to_pandas()
    assert list(out.doc_id) == [1]    # oracle's unnest(NULL) emits no rows


def test_centroid_sums_match_oracle_at_sf01(ray_session):
    # sf0.1 is where L2-normalizing before ROUND flips 1/640 cells
    import __ray_entry__ as E

    df = E.queries()["label_centroids_embeddings"](
        "/root/testdata/sf0.1").to_pandas()
    con = duckdb.connect()
    con.sql("create view embeddings as select * from "
            "'/root/testdata/sf0.1/embeddings.parquet'")
    odf = con.sql(E.oracle_sql()["label_centroids_embeddings"]).df()
    pd.testing.assert_frame_equal(_canon(df), _canon(odf), check_dtype=False)


def test_anti_join_empty_right_side_types(ray_session):
    left = pa.table({"k": pa.array([1, 2], pa.int64()), "v": ["a", "b"]})
    right = pa.table({"rk": pa.array([], pa.int32())})  # EMPTY, other type
    out = anti_join(rd.from_arrow(left), "k",
                    rd.from_arrow(right), "rk").to_pandas()
    assert sorted(out.v) == ["a", "b"]  # nothing matches → all kept
