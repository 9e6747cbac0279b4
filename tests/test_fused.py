"""Fused-pass specifics: driver vs distributed duplicate folds agree; the
fused path detects cross-block duplicates."""

import pyarrow as pa
import pytest

import ray.data as rd

from raycontract.plans import ModelPlan, UniqueSpec
from raycontract.stages.fused import run_fused_pass


@pytest.fixture(scope="module")
def ds(ray_session):
    # duplicates spread across blocks
    vals = [f"v{i}" for i in range(5000)] + [f"v{i}" for i in range(100)]
    t = pa.table({"c": pa.array(vals), "d": pa.array(list(range(len(vals))), type=pa.int64())})
    return rd.from_arrow(t).repartition(8).materialize()


def _counts(d):
    return {k: (v["distinct_count"], v["duplicate_values"], v["duplicate_rows"])
            for k, v in d.items()}


def test_driver_and_distributed_folds_agree(ds):
    plan = ModelPlan(model_name="m")
    uniques = [UniqueSpec("k1", "c"), UniqueSpec("k2", "d")]
    _, _, d_driver = run_fused_pass(ds, plan, None, uniques)
    _, _, d_dist = run_fused_pass(ds, plan, None, uniques, driver_fold_limit=0)
    assert _counts(d_driver) == _counts(d_dist)
    assert d_driver["c"] == pytest.approx(d_driver["c"])
    assert d_driver["c"]["distinct_count"] == 5000
    assert d_driver["c"]["duplicate_values"] == 100
    assert d_driver["c"]["duplicate_rows"] == 100
    assert d_driver["d"]["duplicate_values"] == 0


def test_fused_stats_match_plain(ds):
    from raycontract.plans import ConstraintSpec

    plan = ModelPlan(model_name="m",
                     constraints=[ConstraintSpec("k", "min_length", "c", (3,))])
    stats, image_agg, _ = run_fused_pass(ds, plan, None, [])
    assert image_agg is None
    assert stats["row_count"] == 5100
    # len-2 values are "v0".."v9": once in the base range + once in dup rows
    assert stats["checks"]["k"]["invalid"] == 20
