"""Fused single-scan validation pass.

One ``map_batches`` execution over the model computes, per batch:

- the full counter-check stats partial (StatsKernel),
- the image-conformance partial (ImageConformance actor logic), and
- the per-column uniqueness partials (value→count, hashed to 64-bit keys),

emitting a small union table ``(kind, key, cnt, payload)``. The wide input
columns (image bytes!) are therefore read and decoded exactly ONCE instead of
once per check family. The fused output is tiny (stats payloads + one row per
distinct value per block), so it is materialized and the per-column
``groupby(key).sum(cnt)`` duplicate detection runs over the materialized
partials without rescanning the input.

Uniqueness inside the fused pass always groups on the 64-bit content hash
(the phash-bucketed exact-uniqueness convention, BASELINE.json north_star):
counts are exact up to 2^-64 collisions; duplicate samples are reported as
hashes (the standalone ``duplicate_stats`` keeps raw-value samples when
called directly).
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from raycontract.plans import ImageSpec, ModelPlan, UniqueSpec
from raycontract.stages.stats import StatsKernel, merge_partials

FUSED_SCHEMA = pa.schema([
    pa.field("kind", pa.string()),
    pa.field("key", pa.int64()),
    pa.field("cnt", pa.int64()),
    pa.field("payload", pa.binary()),
])


class FusedKernel:
    """Callable class → one actor pool doing all per-batch validation work."""

    def __init__(self, plan: ModelPlan, image_spec: Optional[ImageSpec],
                 unique_specs: list[UniqueSpec], max_samples: int = 20,
                 profile: bool = False):
        self.stats = StatsKernel(plan, max_samples=max_samples, profile=profile)
        self.image = None
        if image_spec is not None:
            from raycontract.stages.image import ImageConformance

            self.image = ImageConformance(image_spec, max_samples)
        self.uniques = unique_specs

    def __call__(self, batch: pa.Table) -> pa.Table:
        from raycontract.functions.hashing import hash64

        kinds: list[np.ndarray | list] = []
        keys: list[np.ndarray | list] = []
        cnts: list[np.ndarray | list] = []
        payloads: list[Optional[bytes]] = []

        combined: dict[str, Any] = {
            "stats": self.stats(batch)["payload"][0].as_py(),
        }
        if self.image is not None:
            combined["image"] = self.image(batch)["payload"][0].as_py()
        kinds.append(["p"])
        keys.append([0])
        cnts.append([0])
        payloads.append(pickle.dumps(combined))

        for u in self.uniques:
            col = batch[u.column].drop_null()
            if len(col) == 0:
                continue
            h = pa.array(hash64(col).view(np.int64))
            vc = pc.value_counts(h)
            n = len(vc)
            kinds.append([f"u:{u.column}"] * n)
            keys.append(vc.field("values").to_numpy(zero_copy_only=False))
            cnts.append(pc.cast(vc.field("counts"), pa.int64()).to_numpy(zero_copy_only=False))
            payloads.extend([None] * n)

        return pa.table({
            "kind": pa.array(np.concatenate([np.asarray(k, dtype=object) for k in kinds])),
            "key": pa.array(np.concatenate([np.asarray(k, dtype=np.int64) for k in keys])),
            "cnt": pa.array(np.concatenate([np.asarray(c, dtype=np.int64) for c in cnts])),
            "payload": pa.array(payloads, type=pa.binary()),
        })


def run_fused_pass(
    ds,
    plan: ModelPlan,
    image_spec: Optional[ImageSpec],
    unique_specs: list[UniqueSpec],
    max_samples: int = 20,
    batch_size: Optional[int] = None,
    concurrency=None,
) -> tuple[dict[str, Any], Optional[dict[str, Any]], dict[str, dict[str, Any]]]:
    """Returns (merged_stats, merged_image_or_None, {column: dup_stats}).

    dup_stats = {'distinct_count','duplicate_values','duplicate_rows','samples'}.
    """
    import ray

    if batch_size is None:
        batch_size = 512 if image_spec is not None else 8192

    if image_spec is None:
        # stats+uniqueness only: stateless enough for elastic tasks (no actor
        # pool startup cost — matters for many small models per contract)
        fused = ds.map_batches(
            FusedKernel(plan, None, unique_specs, max_samples),
            batch_format="pyarrow", batch_size=batch_size,
        )
    else:
        if concurrency is None:
            # decode is the CPU-heavy stage: fixed-size pool over most of the
            # cluster (autoscaling from 1 ramps too slowly for a batch job)
            cpus = int(ray.cluster_resources().get("CPU", 8))
            concurrency = max(2, cpus - 2)
        fused = ds.map_batches(
            FusedKernel,
            fn_constructor_args=(plan, image_spec, unique_specs, max_samples),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    if unique_specs:
        # tiny vs the input; pin it so the payload fold and the groupby don't
        # re-execute the scan
        fused = fused.materialize()

    stats: dict[str, Any] = {}
    image_agg_box: list = [None]
    dup_stats: dict[str, dict[str, Any]] = {}

    def fold_payloads():
        payload_rows = fused.filter(expr="kind == 'p'").select_columns(["payload"]).take_all()
        stats_parts, image_parts = [], []
        for r in payload_rows:
            d = pickle.loads(r["payload"])
            stats_parts.append(d["stats"])
            if "image" in d:
                image_parts.append(d["image"])
        stats.update(merge_partials(stats_parts))
        if image_parts:
            agg = {"row_count": 0, "invalid_count": 0, "samples": []}
            counters: dict[str, int] = {}
            for p in image_parts:
                p = pickle.loads(p) if isinstance(p, (bytes, bytearray)) else p
                agg["row_count"] += p["rows"]
                for k, v in p["counters"].items():
                    counters[k] = counters.get(k, 0) + v
                if len(agg["samples"]) < max_samples:
                    agg["samples"].extend(p["samples"][: max_samples - len(agg["samples"])])
            agg["invalid_count"] = sum(counters.values())
            agg.update(counters)
            image_agg_box[0] = agg

    def fold_uniques():
        if not unique_specs:
            return
        # ONE shuffle for all unique columns: group on (kind, key)
        part = fused.filter(expr="kind != 'p'").select_columns(["kind", "key", "cnt"])
        agg = part.groupby(["kind", "key"]).aggregate(Sum("cnt", alias_name="n"))

        def summarize(b: pa.Table) -> pa.Table:
            outs = []
            for kind in pc.unique(b["kind"]).to_pylist():
                sel = b.filter(pc.equal(b["kind"], kind))
                n = sel["n"]
                dup_mask = pc.greater(n, 1)
                excess = pc.sum(pc.filter(n, dup_mask))
                ndup = pc.sum(pc.cast(dup_mask, pa.int64()))
                samp = sel["key"].filter(dup_mask)[:max_samples].to_pylist()
                outs.append(pickle.dumps({
                    "kind": kind,
                    "distinct": sel.num_rows,
                    "dup_values": int(ndup.as_py() or 0),
                    "dup_rows": int(excess.as_py() or 0) - int(ndup.as_py() or 0),
                    "samples": samp,
                }))
            return pa.table({"payload": pa.array(outs, type=pa.binary())})

        rows = agg.map_batches(summarize, batch_format="pyarrow").take_all()
        for u in unique_specs:
            dup_stats[u.column] = {"distinct_count": 0, "duplicate_values": 0,
                                   "duplicate_rows": 0, "samples": [],
                                   "by_content_hash": True}
        for r in rows:
            p = pickle.loads(r["payload"])
            col = p["kind"][2:]  # strip "u:"
            out = dup_stats.get(col)
            if out is None:
                continue
            out["distinct_count"] += p["distinct"]
            out["duplicate_values"] += p["dup_values"]
            out["duplicate_rows"] += p["dup_rows"]
            if len(out["samples"]) < max_samples:
                out["samples"].extend(p["samples"][: max_samples - len(out["samples"])])

    # the two consumers read the SAME materialized partials; overlap their
    # fixed execution overheads
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(fold_payloads)
        f2 = pool.submit(fold_uniques)
        f1.result()
        f2.result()

    return stats, image_agg_box[0], dup_stats
