"""Resume test (SURVEY.md §5 'ours' (5)): kill after k shards, re-run,
assert finished shards are NOT recomputed and the final verdicts are
identical to an uninterrupted run."""

import os
import tempfile

import pyarrow.parquet as pq
import pytest

from raycontract.fixtures import IMAGES_CONTRACT_YAML, apply_violations, make_images_table
from raycontract.state.lineage import ShardCheckpoint, validate_resumable


@pytest.fixture(scope="module")
def table_dir(ray_session):
    d = tempfile.mkdtemp()
    t = make_images_table(240)
    bad, _ = apply_violations(t, dict(dup_id=2, bad_caption=3, corrupt_bytes=4))
    # 6 fragment files — the Lance-fragment-shaped layout
    for i in range(6):
        pq.write_table(bad.slice(i * 40, 40), os.path.join(d, f"frag-{i:03d}.parquet"))
    return d


def checks_of(run):
    return {c.key: (c.result.value, (c.diagnostics or {}).get("invalid_count"),
                    (c.diagnostics or {}).get("duplicate_rows"))
            for c in run.checks if c.result is not None}


def test_crash_then_resume_identical(table_dir):
    results = tempfile.mkdtemp()

    # uninterrupted reference run (separate run id)
    ref_run, ref_m = validate_resumable(IMAGES_CONTRACT_YAML, table_dir, "images",
                                        results, "ref", num_shards=3)
    assert ref_m["computed"] == 3 and ref_m["resumed"] == 0

    # crash after 1 computed shard
    with pytest.raises(RuntimeError, match="simulated crash"):
        validate_resumable(IMAGES_CONTRACT_YAML, table_dir, "images",
                           results, "r1", num_shards=3, fail_after_shards=1)
    ckpt = ShardCheckpoint(results, "r1")
    assert len(ckpt.completed_shards()) == 1

    # resume: only the 2 unfinished shards recompute
    run2, m2 = validate_resumable(IMAGES_CONTRACT_YAML, table_dir, "images",
                                  results, "r1", num_shards=3)
    assert m2["computed"] == 2 and m2["resumed"] == 1

    assert checks_of(run2) == checks_of(ref_run)
    # violations survive the reduce across shard boundaries
    dup = [c for c in run2.checks if c.key == "images__image_id__field_unique"][0]
    assert dup.diagnostics["duplicate_rows"] == 2
    img = [c for c in run2.checks if c.key == "images__image_conformance"][0]
    assert img.diagnostics["decode_error"] == 4


def test_rerun_fully_cached(table_dir):
    results = tempfile.mkdtemp()
    _, m1 = validate_resumable(IMAGES_CONTRACT_YAML, table_dir, "images",
                               results, "rr", num_shards=3)
    run, m2 = validate_resumable(IMAGES_CONTRACT_YAML, table_dir, "images",
                                 results, "rr", num_shards=3)
    assert m2["computed"] == 0 and m2["resumed"] == 3
    assert m2["metrics"] and all("rows_per_sec" in v for v in m2["metrics"].values())
    assert any(c.result.value == "failed" for c in run.checks)


def test_cross_shard_duplicates_detected(ray_session):
    """A value appearing once per shard is only a duplicate globally."""
    import pyarrow as pa

    d = tempfile.mkdtemp()
    t = make_images_table(80)
    ids = t["image_id"].to_pylist()
    ids[70] = ids[10]  # duplicate lives in a DIFFERENT fragment than row 10
    t = t.set_column(0, "image_id", pa.array(ids))
    for i in range(4):
        pq.write_table(t.slice(i * 20, 20), os.path.join(d, f"f{i}.parquet"))
    run, _ = validate_resumable(IMAGES_CONTRACT_YAML, d, "images",
                                tempfile.mkdtemp(), "x", num_shards=4)
    dup = [c for c in run.checks if c.key == "images__image_id__field_unique"][0]
    assert dup.result.value == "failed"
    assert dup.diagnostics["duplicate_values"] == 1
    assert dup.diagnostics["duplicate_rows"] == 1


def test_per_shard_drift_localization(ray_session):
    """Drift in the resumable path: global verdict from merged sketches +
    per-shard distances localize WHICH shard's distribution moved."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from raycontract.stages.drift import profile_dataset, save_profile

    rng = np.random.default_rng(11)
    baseline_vals = rng.normal(0, 1, 8000)
    base_ds = rd.from_arrow(pa.table({"v": pa.array(baseline_vals)}))
    bpath = os.path.join(tempfile.mkdtemp(), "base.parquet")
    save_profile(profile_dataset(base_ds, ["v"]), bpath)

    # 4 fragments: fragment 2 is shifted, others match the baseline
    d = tempfile.mkdtemp()
    for i in range(4):
        vals = rng.normal(3.0 if i == 2 else 0.0, 1, 2000)
        pq.write_table(pa.table({"id": pa.array([f"r{i}-{j}" for j in range(2000)]),
                                 "v": pa.array(vals)}),
                       os.path.join(d, f"f{i}.parquet"))

    contract = f"""
id: drift-shards
dataContractSpecification: 1.1.0
info: {{title: test, version: 1.0.0}}
models:
  m:
    primaryKey: [id]
    config:
      drift: {{baseline: "{bpath}", columns: [v], maxKs: 0.1}}
    fields:
      id: {{type: string, required: true}}
      v: {{type: double}}
"""
    run, metrics = validate_resumable(contract, d, "m", tempfile.mkdtemp(), "dr",
                                      num_shards=4)
    c = [c for c in run.checks if c.type == "distribution_drift"][0]
    assert c.result.value == "failed"  # 1/4 of rows shifted by 3σ → global drift
    per_shard = metrics["drift_by_shard"]["v"]
    assert len(per_shard) == 4
    # shard 2 must stand out as the drifted one
    worst = max(per_shard, key=per_shard.get)
    assert worst == "00002", per_shard
    assert per_shard["00002"] > 0.5
    assert all(v < 0.1 for k, v in per_shard.items() if k != "00002"), per_shard
