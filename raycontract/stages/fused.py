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


def _fold_image_parts(image_parts: list, max_samples: int):
    if not image_parts:
        return None
    image_agg = {"row_count": 0, "invalid_count": 0, "samples": []}
    counters: dict[str, int] = {}
    for p in image_parts:
        p = pickle.loads(p) if isinstance(p, (bytes, bytearray)) else p
        image_agg["row_count"] += p["rows"]
        for k, v in p["counters"].items():
            counters[k] = counters.get(k, 0) + v
        if len(image_agg["samples"]) < max_samples:
            image_agg["samples"].extend(p["samples"][: max_samples - len(image_agg["samples"])])
    image_agg["invalid_count"] = sum(counters.values())
    image_agg.update(counters)
    return image_agg


def _compact_image_parts(parts: list, max_samples: int) -> dict:
    """Fold image partials into ONE partial-SHAPED dict (re-mergeable by
    ``_fold_image_parts`` / this function, unlike _fold_image_parts' final
    output which flattens counters into the top level)."""
    acc: dict = {"rows": 0, "counters": {}, "samples": []}
    for p in parts:
        p = pickle.loads(p) if isinstance(p, (bytes, bytearray)) else p
        acc["rows"] += p["rows"]
        for k, v in p["counters"].items():
            acc["counters"][k] = acc["counters"].get(k, 0) + v
        if len(acc["samples"]) < max_samples:
            acc["samples"].extend(p["samples"][: max_samples - len(acc["samples"])])
    return acc


def _dup_range_reduce_task(block_refs, lo: int, hi: int, max_samples: int) -> dict:
    """One range of the distributed duplicate fold: scan every fused block,
    keep dup partial rows whose int64 content-hash key falls in [lo, hi], and
    group them. Ranges are disjoint, so every per-column stat (distinct
    count, duplicate values/rows, samples) is additive across tasks — the
    driver merge is O(ranges), never O(keys)."""
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()
    import ray

    parts = []
    for t in ray.get(list(block_refs)):
        t = pa.table(t)
        # an empty input dataset yields schema-less empty blocks
        if t.num_rows == 0 or "kind" not in t.schema.names:
            continue
        m = pc.and_(
            pc.not_equal(t["kind"], "p"),
            pc.and_(pc.greater_equal(t["key"], lo), pc.less_equal(t["key"], hi)),
        )
        s = t.filter(m).select(["kind", "key", "cnt"])
        if s.num_rows:
            parts.append(s)
    if not parts:
        return {}
    agg = pl.from_arrow(pa.concat_tables(parts)).group_by(["kind", "key"]).agg(
        pl.col("cnt").sum().alias("n"))
    out: dict[str, dict[str, Any]] = {}
    for (kind,), sub in agg.group_by(["kind"]):
        dups = sub.filter(pl.col("n") > 1)
        out[str(kind)[2:]] = {
            "distinct_count": sub.height,
            "duplicate_values": dups.height,
            "duplicate_rows": int(dups["n"].sum() or 0) - dups.height,
            "samples": dups["key"].head(max_samples).to_list(),
        }
    return out


def _dup_chunk_split_task(block_refs, nranges: int):
    """First wave of the overlapped duplicate shuffle, launched INSIDE the
    scan window over a CHUNK of fused blocks: concatenate the chunk's dup
    partial rows, pre-group by (kind, key) once (within-chunk repeats
    collapse), and slice into ``nranges`` disjoint key ranges. Unlike the
    former post-scan range reduce — where every range task re-read EVERY
    block (R× read amplification) — each block is deserialized exactly once,
    and the work overlaps the scan instead of forming a tail."""
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

    import ray

    empty = pa.table({"kind": pa.array([], pa.string()),
                      "key": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    parts = []
    for t in ray.get(list(block_refs)):
        t = pa.table(t)
        if t.num_rows == 0 or "kind" not in t.schema.names:
            continue
        s = t.filter(pc.not_equal(t["kind"], "p")).select(["kind", "key", "cnt"])
        if s.num_rows:
            parts.append(s)
    if not parts:
        return tuple([empty] * nranges)
    agg = pl.from_arrow(pa.concat_tables(parts)).group_by(["kind", "key"]).agg(
        pl.col("cnt").sum().alias("cnt")).to_arrow()
    agg = pa.table({"kind": pc.cast(agg["kind"], pa.string()),
                    "key": pc.cast(agg["key"], pa.int64()),
                    "cnt": pc.cast(agg["cnt"], pa.int64())})
    import numpy as np

    step = (1 << 64) // nranges
    rid = ((np.asarray(agg["key"], dtype=np.int64).astype(np.uint64)
            + np.uint64(1 << 63)) // np.uint64(step)).astype(np.int64)
    rid = np.minimum(rid, nranges - 1)
    return tuple(agg.filter(pa.array(rid == i)) for i in range(nranges))


def _dup_range_final_task(max_samples: int, *tables) -> dict:
    """Second wave: group ONE key range's pre-split slices (disjoint across
    tasks, so every stat is additive in the driver merge)."""
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

    parts = [pa.table(t) for t in tables if t.num_rows]
    if not parts:
        return {}
    agg = pl.from_arrow(pa.concat_tables(parts)).group_by(["kind", "key"]).agg(
        pl.col("cnt").sum().alias("n"))
    out: dict[str, dict[str, Any]] = {}
    for (kind,), sub in agg.group_by(["kind"]):
        dups = sub.filter(pl.col("n") > 1)
        out[str(kind)[2:]] = {
            "distinct_count": sub.height,
            "duplicate_values": dups.height,
            "duplicate_rows": int(dups["n"].sum() or 0) - dups.height,
            "samples": dups["key"].head(max_samples).to_list(),
        }
    return out


def _distributed_dup_reduce(block_refs: list, max_samples: int) -> dict:
    """Launch the per-range reduce tasks over the (already materialized, tiny)
    fused blocks and merge their disjoint results. Replaces the former
    driver-side polars group-by over ALL keys: the driver no longer touches a
    row of dup partials, so this tail stays O(ranges) at any key cardinality
    — the same shape that a multi-node run needs (each task reads the block
    set from the object store; dup partials are ~16 B/row, so the R× read
    amplification is bounded and local-node reads are zero-copy)."""
    futs = _launch_dup_reduce(block_refs, max_samples)
    return _merge_dup_reduce(futs, max_samples)


def _launch_dup_reduce(block_refs: list, max_samples: int) -> list:
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nranges = max(2, min(16, ncpu // 2))
    step = (1 << 64) // nranges
    reduce_remote = ray.remote(num_cpus=1)(_dup_range_reduce_task)
    futs = []
    for i in range(nranges):
        lo = -(1 << 63) + i * step
        hi = (1 << 63) - 1 if i == nranges - 1 else -(1 << 63) + (i + 1) * step - 1
        futs.append(reduce_remote.remote(block_refs, lo, hi, max_samples))
    return futs


def _merge_dup_reduce(futs: list, max_samples: int) -> dict:
    import ray

    merged: dict[str, dict[str, Any]] = {}
    for part in ray.get(futs):
        for col, d in part.items():
            m = merged.setdefault(col, {
                "distinct_count": 0, "duplicate_values": 0, "duplicate_rows": 0,
                "samples": [], "by_content_hash": True})
            m["distinct_count"] += d["distinct_count"]
            m["duplicate_values"] += d["duplicate_values"]
            m["duplicate_rows"] += d["duplicate_rows"]
            if len(m["samples"]) < max_samples:
                m["samples"].extend(d["samples"][: max_samples - len(m["samples"])])
    return merged


def _driver_fold_all(tables: list[pa.Table], unique_specs, max_samples: int):
    """Driver-side fold of the complete fused output (payloads + partials)."""
    stats_parts, image_parts = [], []
    for t in tables:
        for payload in t.filter(pc.equal(t["kind"], "p"))["payload"].to_pylist():
            d = pickle.loads(payload)
            stats_parts.append(d["stats"])
            if "image" in d:
                image_parts.append(d["image"])
    stats = merge_partials(stats_parts, max_samples=max_samples)
    image_agg = _fold_image_parts(image_parts, max_samples)

    merged = _polars_dup_fold(tables, max_samples) if unique_specs else {}
    dup_stats = {}
    for u in unique_specs:
        dup_stats[u.column] = merged.get(u.column, {
            "distinct_count": 0, "duplicate_values": 0, "duplicate_rows": 0,
            "samples": [], "by_content_hash": True})
    return stats, image_agg, dup_stats


def _polars_dup_fold(tables: list[pa.Table], max_samples: int) -> dict[str, dict[str, Any]]:
    """Fold (kind,key,cnt) partial tables into per-column duplicate stats."""
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

    if not tables:
        return {}
    df = pl.from_arrow(pa.concat_tables([t.select(["kind", "key", "cnt"]) for t in tables]))
    df = df.filter(pl.col("kind") != "p")
    if df.height == 0:
        return {}
    agg = df.group_by(["kind", "key"]).agg(pl.col("cnt").sum().alias("n"))
    out: dict[str, dict[str, Any]] = {}
    for (kind,), sub in agg.group_by(["kind"]):
        dups = sub.filter(pl.col("n") > 1)
        col = str(kind)[2:]
        out[col] = {
            "distinct_count": sub.height,
            "duplicate_values": dups.height,
            "duplicate_rows": int(dups["n"].sum() or 0) - dups.height,
            "samples": dups["key"].head(max_samples).to_list(),
            "by_content_hash": True,
        }
    return out


def _merge_dup_folds(parts: list[dict], max_samples: int) -> dict[str, dict[str, Any]]:
    out: dict[str, dict[str, Any]] = {}
    for p in parts:
        for col, d in p.items():
            m = out.setdefault(col, {"distinct_count": 0, "duplicate_values": 0,
                                     "duplicate_rows": 0, "samples": [],
                                     "by_content_hash": True})
            m["distinct_count"] += d["distinct_count"]
            m["duplicate_values"] += d["duplicate_values"]
            m["duplicate_rows"] += d["duplicate_rows"]
            if len(m["samples"]) < max_samples:
                m["samples"].extend(d["samples"][: max_samples - len(m["samples"])])
    return out


def _distributed_dup_fold(fused, max_samples: int, num_buckets: int = 16) -> dict:
    """Manual hash shuffle: one split task per materialized block → one
    reduce task per key-hash bucket (polars groupby inside). Raw Ray tasks
    are justified here: the reduce is all-to-all on tiny rows, where the
    Dataset groupby's sort machinery costs 10-100× the data (measured in
    BASELINE.md); keys are uniform 64-bit hashes so buckets are balanced."""
    import ray as _ray

    # bucketing masks with (B-1): only balanced when B is a power of two
    num_buckets = 1 << (num_buckets - 1).bit_length()

    @_ray.remote(num_returns=num_buckets)
    def split(tbl: pa.Table, B: int):
        import numpy as np
        from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

        t = tbl.filter(pc.invert(pc.equal(tbl["kind"], "p"))).select(["kind", "key", "cnt"])
        if t.num_rows == 0:
            empty = t
            return tuple(empty for _ in range(B)) if B > 1 else empty
        pre = pl.from_arrow(t).group_by(["kind", "key"]).agg(pl.col("cnt").sum().alias("cnt"))
        keys = pre["key"].to_numpy().view(np.uint64)
        bucket = (keys & np.uint64(B - 1)).astype(np.int64)
        pre = pre.with_columns(pl.Series("_b", bucket))
        outs = tuple(pre.filter(pl.col("_b") == i).drop("_b").to_arrow() for i in range(B))
        return outs if B > 1 else outs[0]

    @_ray.remote
    def reduce(max_samples: int, *tables):
        return _polars_dup_fold([pa.table(t) for t in tables if t.num_rows], max_samples)

    block_refs = fused.to_arrow_refs()
    per_bucket: list[list] = [[] for _ in range(num_buckets)]
    for r in block_refs:
        outs = split.options(num_returns=num_buckets).remote(r, num_buckets)
        if num_buckets == 1:
            outs = [outs]
        for b, o in enumerate(outs):
            per_bucket[b].append(o)
    results = _ray.get([reduce.remote(max_samples, *refs) for refs in per_bucket])
    return _merge_dup_folds(results, max_samples)


def _premerge_payload_rows(t: pa.Table, max_samples: int) -> pa.Table:
    """Fold a task's per-slice 'p' (stats/image payload) rows into ONE row
    worker-side. The driver's streaming consume loop unpickles+merges every
    payload row serially inside the scan window; pre-merging moves that work
    to the (parallel) tasks — 8 slices/fragment became 8 driver payloads per
    block before this, now exactly 1. merge_partials/_compact_image_parts are
    associative, so the final counts are unchanged."""
    is_p = pc.equal(t["kind"], "p")
    n_p = pc.sum(pc.cast(is_p, pa.int64())).as_py() or 0
    if n_p <= 1:
        return t
    from raycontract.stages.stats import merge_partials

    stats_parts, image_parts = [], []
    for payload in t.filter(is_p)["payload"].to_pylist():
        d = pickle.loads(payload)
        stats_parts.append(d["stats"])
        if "image" in d:
            image_parts.append(d["image"])
    combined: dict[str, Any] = {
        "stats": merge_partials(stats_parts, max_samples=max_samples)}
    if image_parts:
        combined["image"] = _compact_image_parts(image_parts, max_samples)
    merged_row = pa.table({
        "kind": pa.array(["p"]), "key": pa.array([0], type=pa.int64()),
        "cnt": pa.array([0], type=pa.int64()),
        "payload": pa.array([pickle.dumps(combined)], type=pa.binary()),
    })
    return pa.concat_tables([merged_row.cast(t.schema), t.filter(pc.invert(is_p))])


class FileFusedKernel:
    """Read-fused variant: each task reads ONE parquet fragment from storage
    and runs the FusedKernel over bounded slices of it — the wide input
    columns (image bytes) never make an object-store round trip between a
    read operator and a map operator (measured: Ray does not fuse
    ReadParquet with MapBatches here, and the extra hop costs ~25% of the
    input path at 32 CPUs). This is still a Dataset pipeline: a tiny paths
    dataset → map_batches; per-fragment tasks are the unit of retry/resume,
    matching the lineage sharding."""

    def __init__(self, plan: ModelPlan, image_spec, unique_specs, max_samples: int,
                 columns: Optional[list[str]], slice_rows: int, profile: bool = False):
        self.inner = FusedKernel(plan, image_spec, unique_specs, max_samples,
                                 profile=profile)
        self.columns = columns
        self.slice_rows = slice_rows
        self.max_samples = max_samples

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for path in batch["path"].to_pylist():
            t = pq.read_table(path, columns=self.columns)
            for off in range(0, t.num_rows, self.slice_rows):
                outs.append(self.inner(t.slice(off, self.slice_rows)))
        if not outs:
            return pa.table(
                {"kind": pa.array([], type=pa.string()), "key": pa.array([], type=pa.int64()),
                 "cnt": pa.array([], type=pa.int64()), "payload": pa.array([], type=pa.binary())})
        return _premerge_payload_rows(pa.concat_tables(outs), self.max_samples)


def run_fused_pass(
    ds,
    plan: ModelPlan,
    image_spec: Optional[ImageSpec],
    unique_specs: list[UniqueSpec],
    max_samples: int = 20,
    batch_size: Optional[int] = None,
    concurrency=None,
    driver_fold_limit: int = 4_000_000,
    input_rows: Optional[int] = None,
    file_paths: Optional[list[str]] = None,
    columns: Optional[list[str]] = None,
) -> tuple[dict[str, Any], Optional[dict[str, Any]], dict[str, dict[str, Any]]]:
    """Returns (merged_stats, merged_image_or_None, {column: dup_stats}).

    dup_stats = {'distinct_count','duplicate_values','duplicate_rows','samples'}.
    ``file_paths``: opt-in read-fused scan (one task reads+validates one
    parquet fragment) — engine passes it for local parquet sources with
    enough fragments to keep every CPU busy.
    """
    import ray

    if batch_size is None:
        # wide binary rows (images ~KBs each) want bounded batches; 1024 rows
        # ≈ a few MB per batch at thumbnail-image sizes — raise/lower via the
        # batch_size arg for much larger payloads
        batch_size = 1024 if image_spec is not None else 8192

    if file_paths:
        import os as _os

        import ray.data as rd

        # RAYCONTRACT_TASK_CPUS < 1 oversubscribes the scan so decode compute
        # hides parquet-read stalls: +10-18%% at 32 CPUs (min 9.4s vs 11.5s,
        # the repo's fastest 1M run). Default stays 1.0: in sandbox local
        # mode Ray's num_cpus is only a scheduling token, so a num_cpus=8
        # session with 0.75-CPU tasks runs ~10.6 tasks on ~10.6 PHYSICAL
        # cores — free capacity a real 8-core node would not have, which
        # corrupts the N-vs-4N scaling proxy (BASELINE.md round-4).
        task_cpus = float(_os.environ.get("RAYCONTRACT_TASK_CPUS", "1"))
        fused = rd.from_items(
            [{"path": p} for p in file_paths], override_num_blocks=len(file_paths)
        ).map_batches(
            FileFusedKernel(plan, image_spec, unique_specs, max_samples,
                            columns, batch_size),
            batch_format="pyarrow", batch_size=1, num_cpus=task_cpus,
        )
    elif concurrency is None:
        # Elastic tasks by default: Ray reuses warm worker processes across
        # executions (actors cold-start a fresh process per pool) and the
        # scheduler shares CPUs naturally with the read stage — measured
        # faster than every fixed pool size tried (BASELINE.md). The kernel's
        # per-task rebuild cost is trivial (plan objects + codec dispatch).
        # Pass concurrency=N to opt into an actor pool for genuinely heavy
        # per-worker state (model weights, big baselines).
        fused = ds.map_batches(
            FusedKernel(plan, image_spec, unique_specs, max_samples),
            batch_format="pyarrow", batch_size=batch_size,
        )
    else:
        fused = ds.map_batches(
            FusedKernel,
            fn_constructor_args=(plan, image_spec, unique_specs, max_samples),
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    import os
    import time

    timing = os.environ.get("RAYCONTRACT_TIMING")
    t0 = time.time()

    # Fast path: when the fused partials certainly fit the driver (bounded by
    # input_rows × unique columns), ONE STREAMING execution folds them on the
    # driver AS BLOCKS ARRIVE (iter_batches) — the unpickle/accumulate work
    # overlaps the scan instead of forming a post-scan tail, and there are no
    # materialize/coalesce/filter executions. The distributed path below
    # handles true scale. Callers pass input_rows from the UNPROJECTED base
    # read ONLY when counting is metadata-cheap (parquet / in-memory).
    # (measured: an iter_batches streaming fold throttles the scan through
    # driver-side consumption and LOSES ~2x; the post-scan driver fold is only
    # ~1.3s/1M rows, so one-shot refs + fold is the faster shape)
    if input_rows is not None and input_rows * max(1, len(unique_specs)) <= driver_fold_limit:
        if os.environ.get("RAYCONTRACT_ONESHOT_FOLD"):
            # A/B escape hatch: the pre-r3 one-shot shape (full scan, then
            # fold every block on the driver) for interleaved benchmarking.
            tables = [pa.table(t) for t in ray.get(fused.to_arrow_refs()) if t.num_rows]
            if timing:
                print(f"[fused] single-execution scan→driver: {time.time()-t0:.1f}s", flush=True)
            out = _driver_fold_all(tables, unique_specs, max_samples)
            try:
                out[0]["_ray_stats"] = fused.stats()[:4000]
            except Exception:
                pass
            return out
        # STREAMING driver fold (VERDICT r2 next-step #4): consume block REFS
        # as the streaming executor finishes them (iter_internal_ref_bundles
        # yields refs, not data — unlike the rejected iter_batches fold it
        # applies no consumer backpressure to the scan, since each fused
        # block is tiny) and do the per-block splitting/unpickling inside the
        # scan window. Only the final merge_partials + one polars groupby
        # remain as a post-scan tail.
        stats_parts: list = []
        image_parts: list = []
        dup_block_refs: list = []
        # Incremental compaction: while the loop below is blocked in ray.get
        # the driver is idle, so folding the accumulated payload partials
        # INSIDE the scan window (in O(threshold) slices) removes them from
        # the post-scan tail. merge_partials/_compact_image_parts accept
        # their own output, so repeated folding is lossless. Duplicate
        # partials never touch the driver: chunks of block refs feed split
        # tasks (first shuffle wave) DURING the scan; only the per-range
        # final groupby runs after it.
        compact_every = int(os.environ.get("RAYCONTRACT_COMPACT_EVERY", "64"))
        dup_amplified = bool(os.environ.get("RAYCONTRACT_DUP_AMPLIFIED"))
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nranges = max(2, min(16, ncpu // 2))
        dup_chunk = int(os.environ.get("RAYCONTRACT_DUP_CHUNK", "64"))
        split_remote = ray.remote(num_cpus=1)(_dup_chunk_split_task)
        range_slices: list[list] = [[] for _ in range(nranges)]
        pending_dup_refs: list = []

        def _flush_dup_chunk():
            if not pending_dup_refs:
                return
            outs = split_remote.options(num_returns=nranges).remote(
                list(pending_dup_refs), nranges)
            if nranges == 1:
                outs = [outs]
            for i, o in enumerate(outs):
                range_slices[i].append(o)
            pending_dup_refs.clear()

        def _consume_block(t: pa.Table):
            if t.num_rows == 0:
                return
            for payload in t.filter(pc.equal(t["kind"], "p"))["payload"].to_pylist():
                d = pickle.loads(payload)
                stats_parts.append(d["stats"])
                if "image" in d:
                    image_parts.append(d["image"])
            if compact_every and len(stats_parts) >= compact_every:
                stats_parts[:] = [merge_partials(stats_parts, max_samples=max_samples)]
                if len(image_parts) > 1:
                    image_parts[:] = [_compact_image_parts(image_parts, max_samples)]

        for bundle in fused.iter_internal_ref_bundles():
            refs = list(bundle.block_refs)
            if unique_specs:
                if dup_amplified:
                    dup_block_refs.extend(refs)
                else:
                    pending_dup_refs.extend(refs)
                    if len(pending_dup_refs) >= dup_chunk:
                        _flush_dup_chunk()
            for block in ray.get(refs):
                _consume_block(pa.table(block))
        if timing:
            print(f"[fused] streaming scan+fold: {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
        # launch the reduce tasks first so they run while the driver folds
        # its own (already-compacted) payload partials
        if unique_specs and not dup_amplified:
            _flush_dup_chunk()
            final_remote = ray.remote(num_cpus=1)(_dup_range_final_task)
            dup_futs = [final_remote.remote(max_samples, *range_slices[i])
                        for i in range(nranges)]
        elif unique_specs:
            # A/B escape hatch: the pre-r4 post-scan range reduce (every
            # range task re-reads every block)
            dup_futs = _launch_dup_reduce(dup_block_refs, max_samples)
        else:
            dup_futs = []
        stats = merge_partials(stats_parts, max_samples=max_samples)
        image_agg = _fold_image_parts(image_parts, max_samples)
        merged = _merge_dup_reduce(dup_futs, max_samples) if unique_specs else {}
        dup_stats = {}
        for u in unique_specs:
            dup_stats[u.column] = merged.get(u.column, {
                "distinct_count": 0, "duplicate_values": 0, "duplicate_rows": 0,
                "samples": [], "by_content_hash": True})
        if timing:
            print(f"[fused] merge tail: {time.time()-t0:.1f}s", flush=True)
        try:
            # surface the Ray execution profile (per-operator wall/cpu/rows)
            # for observability — consumers read it from stats['_ray_stats']
            stats["_ray_stats"] = fused.stats()[:4000]
        except Exception:
            pass
        return stats, image_agg, dup_stats

    if unique_specs:
        # The fused output is tiny relative to the input but inherits the
        # input's block count — coalesce it so the downstream consumers
        # (payload fold, duplicate groupby) run a handful of tasks instead of
        # one per input block, then pin it so they don't re-execute the scan.
        nparts = max(8, int(ray.cluster_resources().get("CPU", 8)) // 2)
        # materialize FIRST (scan runs once at full parallelism), then
        # coalesce the already-tiny result — repartition inside the scan
        # pipeline would throttle the scan itself
        fused = fused.materialize()
        if timing:
            print(f"[fused] scan+materialize: {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()
        fused = fused.repartition(nparts).materialize()
        if timing:
            print(f"[fused] coalesce({nparts}): {time.time()-t0:.1f}s", flush=True)
            t0 = time.time()

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
        stats.update(merge_partials(stats_parts, max_samples=max_samples))
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
        # Ray's sort-based groupby costs seconds of fixed overhead per million
        # tiny rows — far more than the data itself. The duplicate reduce is a
        # pure (kind,key)→sum(cnt) over pre-deduped-per-block partials, so:
        #  - small partial sets fold on the driver with one polars groupby;
        #  - beyond the cutover, a manual hash shuffle (one Ray split task per
        #    block → B bucket-reduce tasks, polars inside) keeps it fully
        #    distributed with exactly 2 task waves.
        n_partials = fused.count() - 0  # materialized → O(1)
        if n_partials <= driver_fold_limit:
            tables = [t for t in ray.get(fused.to_arrow_refs()) if t.num_rows]
            merged = _polars_dup_fold(tables, max_samples)
        else:
            merged = _distributed_dup_fold(fused, max_samples, num_buckets=nparts)
        for u in unique_specs:
            dup_stats[u.column] = merged.get(u.column, {
                "distinct_count": 0, "duplicate_values": 0, "duplicate_rows": 0,
                "samples": [], "by_content_hash": True})

    # the two consumers read the SAME materialized partials; overlap their
    # fixed execution overheads
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(fold_payloads)
        f2 = pool.submit(fold_uniques)
        f1.result()
        f2.result()
    if timing:
        print(f"[fused] consumers: {time.time()-t0:.1f}s", flush=True)

    return stats, image_agg_box[0], dup_stats
