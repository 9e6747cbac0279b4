"""anti_join (NOT EXISTS semantics incl. null keys + bucketed key exchange)
and the rollup/pivot/histogram profiling aggregates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.pipelines.joins import anti_join
from raycontract.pipelines.relational import (fixed_width_histogram,
                                              pivot_counts, rollup_sum)


def test_anti_join_keeps_null_keys(ray_session):
    left = pa.table({"k": pa.array([1, 2, None, 4], pa.int64()),
                     "v": pa.array(["a", "b", "c", "d"])})
    right = pa.table({"k": pa.array([2, 5, None], pa.int64())})
    out = anti_join(rd.from_arrow(left), "k",
                    rd.from_arrow(right), "k").to_pandas()
    # 2 matches → dropped; null left key never matches → KEPT (NOT EXISTS)
    assert sorted(out.v) == ["a", "c", "d"]


def test_anti_join_bucketed_path_matches_broadcast(ray_session):
    rng = np.random.default_rng(3)
    left = pa.table({"k": pa.array(rng.integers(0, 3000, 5000), pa.int64()),
                     "row": pa.array(np.arange(5000, dtype=np.int64))})
    right = pa.table({"k": pa.array(rng.integers(0, 1500, 4000), pa.int64())})
    a = anti_join(rd.from_arrow(left), "k", rd.from_arrow(right),
                  "k").to_pandas()
    b = anti_join(rd.from_arrow(left), "k", rd.from_arrow(right), "k",
                  broadcast_limit=10, num_buckets=7).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(["k", "row"]).reset_index(drop=True),
        b.sort_values(["k", "row"]).reset_index(drop=True))


def test_rollup_levels(ray_session):
    t = pa.table({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                  "m": [1.0, 2.0, 4.0]})
    out = rollup_sum(rd.from_arrow(t), ["a", "b"],
                     {"sum_m": ("m", 100.0)}).to_pandas()
    assert len(out) == 3 + 2 + 1  # finest, per-a, grand total
    grand = out[out.a.isna() & out.b.isna()]
    assert grand.sum_m.iloc[0] == 700 and grand.n_rows.iloc[0] == 3
    per_x = out[(out.a == "x") & out.b.isna()]
    assert per_x.sum_m.iloc[0] == 300 and per_x.n_rows.iloc[0] == 2


def test_pivot_unlisted_values_in_total_only(ray_session):
    t = pa.table({"r": ["g1", "g1", "g2"], "c": ["A", "Z", "A"]})
    out = pivot_counts(rd.from_arrow(t), "r", "c", ["A", "B"]).to_pandas()
    g1 = out[out.r == "g1"].iloc[0]
    assert (g1.n_A, g1.n_B, g1.n_total) == (1, 0, 2)  # Z counts only in total


def test_histogram_negative_values_floor(ray_session):
    t = pa.table({"x": [-1.0, -0.5, 0.0, 0.5, 1.0, 2.5]})
    out = fixed_width_histogram(rd.from_arrow(t), "x", 1.0).to_pandas()
    got = dict(zip(out.bucket, out.n))
    assert got == {-1: 2, 0: 2, 1: 1, 2: 1}  # FLOOR, not truncation


def test_rollup_distributed_fallback_matches_driver(ray_session, monkeypatch):
    t = pa.table({"a": ["x", "x", "y", "y", "z"], "b": ["p", "q", "p", "p", "q"],
                  "m": [1.0, 2.0, 4.0, 8.0, 16.0]})
    ref = rollup_sum(rd.from_arrow(t), ["a", "b"],
                     {"sum_m": ("m", 100.0)}).to_pandas()
    monkeypatch.setattr(rd.Dataset, "count", lambda self: 3_000_000)
    out = rollup_sum(rd.from_arrow(t), ["a", "b"],
                     {"sum_m": ("m", 100.0)}).to_pandas()
    cols = sorted(ref.columns)
    pd.testing.assert_frame_equal(
        out[cols].sort_values(cols).reset_index(drop=True),
        ref[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)
