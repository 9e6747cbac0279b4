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


def test_streaming_fold_compaction_invariant(ds, monkeypatch):
    """Aggressive incremental compaction (fold every block) must not change
    any result vs no compaction at all — merge_partials/_compact_image_parts
    accept their own output, so repeated folding is lossless."""
    from raycontract.plans import ConstraintSpec

    plan = ModelPlan(model_name="m",
                     constraints=[ConstraintSpec("k", "min_length", "c", (3,))])
    uniques = [UniqueSpec("k1", "c")]
    monkeypatch.setenv("RAYCONTRACT_COMPACT_EVERY", "1")
    s1, _, d1 = run_fused_pass(ds, plan, None, uniques)
    monkeypatch.setenv("RAYCONTRACT_COMPACT_EVERY", "0")
    s2, _, d2 = run_fused_pass(ds, plan, None, uniques)
    assert s1["row_count"] == s2["row_count"] == 5100
    assert s1["checks"]["k"]["invalid"] == s2["checks"]["k"]["invalid"]
    assert _counts(d1) == _counts(d2)


def test_dup_range_reduce_partitions_are_disjoint_and_exhaustive(ray_session):
    """Every int64 key lands in exactly one reduce range (boundary keys
    included), so per-range stats are additive."""
    import numpy as np
    import ray

    from raycontract.stages.fused import _launch_dup_reduce, _merge_dup_reduce

    rng = np.random.default_rng(7)
    keys = rng.integers(-(1 << 63), (1 << 63) - 1, size=4096, dtype=np.int64)
    keys = np.concatenate([keys, keys[:256],  # 256 duplicate values
                           np.array([-(1 << 63), (1 << 63) - 1, 0], dtype=np.int64)])
    t = pa.table({
        "kind": pa.array(["u:x"] * len(keys)),
        "key": pa.array(keys),
        "cnt": pa.array(np.ones(len(keys), dtype=np.int64)),
        "payload": pa.array([None] * len(keys), type=pa.binary()),
    })
    refs = [ray.put(t.slice(i, 1024)) for i in range(0, len(keys), 1024)]
    merged = _merge_dup_reduce(_launch_dup_reduce(refs, max_samples=5), 5)
    assert merged["x"]["distinct_count"] == 4096 + 3
    assert merged["x"]["duplicate_values"] == 256
    assert merged["x"]["duplicate_rows"] == 256
