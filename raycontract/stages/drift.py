"""Distribution-drift checks against a baseline profile (SURVEY §2a #18).

``profile_dataset`` computes a per-column profile in one streamed pass —
count / null_count / min / max plus mergeable sketches (HLL distinct,
t-digest for numeric, capped categorical counts) — one partial per block,
tree-merged; ``save_profile``/``load_profile`` persist it as Parquet.

``drift_stats`` compares the CURRENT data's sketches against the baseline:
numeric columns → Kolmogorov–Smirnov distance evaluated on the merged
t-digest CDFs (no bin-edge coordination needed between profile runs);
categorical columns → total-variation (½·L1) distance over value counts.

The baseline sketches are loaded ONCE per comparator (broadcast semantics):
the heavy work (sketching the current data) is the distributed part; the
compare itself is O(centroids).
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raycontract.plans import DriftSpec, ModelPlan
from raycontract.functions.sketches import (
    CategoricalCounts,
    TDigest,
    HyperLogLog,
    l1_distance,
)
from raycontract.stages.stats import run_stats_pass


def profile_dataset(ds, columns: Optional[list[str]] = None) -> dict[str, dict[str, Any]]:
    """One streamed pass → {column: {count,null_count,min,max,hll,tdigest,cat}}."""
    if columns:
        ds = ds.select_columns(columns)
    plan = ModelPlan(model_name="_profile")
    stats = run_stats_pass(ds, plan, profile=True)
    out: dict[str, dict[str, Any]] = {}
    for col, cs in stats["columns"].items():
        entry: dict[str, Any] = {
            "count": stats["row_count"],
            "null_count": cs["null_count"],
            "min": cs.get("min"),
            "max": cs.get("max"),
        }
        for k in ("hll", "tdigest", "cat"):
            if k in cs:
                entry[k] = cs[k]  # merged sketch object (see stats.merge_partials)
        if isinstance(entry.get("hll"), HyperLogLog):
            entry["approx_distinct"] = entry["hll"].estimate()
        out[col] = entry
    return out


def save_profile(profile: dict[str, dict[str, Any]], path: str) -> None:
    rows = {
        "column": [], "count": [], "null_count": [], "min": [], "max": [],
        "hll": [], "tdigest": [], "cat": [],
    }
    for col, e in profile.items():
        rows["column"].append(col)
        rows["count"].append(int(e.get("count", 0)))
        rows["null_count"].append(int(e.get("null_count", 0)))
        rows["min"].append(repr(e.get("min")))
        rows["max"].append(repr(e.get("max")))
        for k in ("hll", "tdigest", "cat"):
            v = e.get(k)
            if v is not None and not isinstance(v, (bytes, bytearray)):
                v = v.to_bytes()
            rows[k].append(v)
    table = pa.table({
        "column": pa.array(rows["column"]),
        "count": pa.array(rows["count"], type=pa.int64()),
        "null_count": pa.array(rows["null_count"], type=pa.int64()),
        "min": pa.array(rows["min"]),
        "max": pa.array(rows["max"]),
        "hll": pa.array(rows["hll"], type=pa.binary()),
        "tdigest": pa.array(rows["tdigest"], type=pa.binary()),
        "cat": pa.array(rows["cat"], type=pa.binary()),
    })
    pq.write_table(table, path)


def load_profile(path: str) -> dict[str, dict[str, Any]]:
    t = pq.read_table(path)
    out: dict[str, dict[str, Any]] = {}
    for row in t.to_pylist():
        out[row["column"]] = row
    return out


def tdigest_ks(a: TDigest, b: TDigest, grid: int = 256) -> float:
    """KS distance between two t-digest CDFs, evaluated on the union support."""
    a._compress()
    b._compress()
    if a.means.size == 0 or b.means.size == 0:
        return float("nan")
    lo = min(a.means.min(), b.means.min())
    hi = max(a.means.max(), b.means.max())
    if hi <= lo:
        return 0.0
    xs = np.linspace(lo, hi, grid)
    d = max(abs(a.cdf(x) - b.cdf(x)) for x in xs)
    return float(d)


def compare_profiles(base: dict[str, Any], current: dict[str, Any],
                     spec: DriftSpec) -> dict[str, Any]:
    """Compare one column's baseline vs current sketch entries."""

    def as_bytes(v):
        return v if isinstance(v, (bytes, bytearray, type(None))) else v.to_bytes()

    if base.get("tdigest") is not None and current.get("tdigest") is not None:
        btd = TDigest.from_bytes(as_bytes(base["tdigest"]))
        ctd = TDigest.from_bytes(as_bytes(current["tdigest"]))
        d = tdigest_ks(btd, ctd)
        return {"metric": "ks", "distance": d, "threshold": spec.max_ks,
                "passed": bool(d <= spec.max_ks), "baseline_n": base.get("count"),
                "current_n": current.get("count")}
    if base.get("cat") is not None and current.get("cat") is not None:
        bc = CategoricalCounts.from_bytes(as_bytes(base["cat"]))
        cc = CategoricalCounts.from_bytes(as_bytes(current["cat"]))
        d = l1_distance(bc, cc)
        return {"metric": "l1", "distance": d, "threshold": spec.max_l1,
                "passed": bool(d <= spec.max_l1), "baseline_n": base.get("count"),
                "current_n": current.get("count")}
    raise ValueError(
        f"no comparable sketches for column {spec.column} "
        "(numeric needs tdigest, categorical needs cat counts)"
    )


def drift_stats(ds, spec: DriftSpec) -> dict[str, Any]:
    """Sketch the current data for ``spec.column`` and compare to baseline."""
    baseline = load_profile(spec.baseline_path)
    if spec.column not in baseline:
        raise ValueError(f"column {spec.column} not in baseline profile {spec.baseline_path}")
    current = profile_dataset(ds, [spec.column])[spec.column]
    return compare_profiles(baseline[spec.column], current, spec)


class DriftComparator:
    """Actor-pool comparator holding the baseline sketches (the north-star's
    stateful-stage shape): the baseline profile is fetched from the object
    store ONCE per actor in ``__init__``; each batch is sketched and scored
    against it, emitting one (rows, distance, passed) row per batch — a
    streaming per-batch drift signal for monitoring/localization, finer
    grained than the per-shard view in state/lineage.py."""

    def __init__(self, baseline_ref, spec: DriftSpec):
        import ray as _ray

        self.base = _ray.get(baseline_ref)[spec.column]
        self.spec = spec

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from raycontract.functions.sketches import CategoricalCounts, TDigest

        col = batch[self.spec.column].drop_null()
        entry: dict[str, Any] = {"count": batch.num_rows}
        t = col.type
        if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t):
            td = TDigest()
            td.add(np.asarray(pc.cast(col, pa.float64())))
            entry["tdigest"] = td
        else:
            cat = CategoricalCounts()
            if len(col):
                vc = pc.value_counts(col)
                cat.add(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
            entry["cat"] = cat
        res = compare_profiles(self.base, entry, self.spec)
        return pa.table({
            "rows": pa.array([batch.num_rows], type=pa.int64()),
            "metric": pa.array([res["metric"]]),
            "distance": pa.array([float(res["distance"])], type=pa.float64()),
            "passed": pa.array([bool(res["passed"])], type=pa.bool_()),
        })


def drift_by_batch(ds, spec: DriftSpec, batch_size: int = 8192, concurrency=(1, 8)):
    """Per-batch drift stream via a DriftComparator actor pool; baseline
    broadcast with ``ray.put`` once. Returns a Dataset of
    (rows, metric, distance, passed) — one row per batch."""
    import ray as _ray

    baseline_ref = _ray.put(load_profile(spec.baseline_path))
    # max_restarts=0 (ray#53727): ObjectRef constructor arg, restart would fail.
    return ds.select_columns([spec.column]).map_batches(
        DriftComparator, fn_constructor_args=(baseline_ref, spec),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
        max_restarts=0,
    )
