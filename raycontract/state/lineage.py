"""Per-partition lineage checkpointing + resumable validation runs.

The reference has no checkpointing (single-process soda scan). For the
10^12-row target the north rule requires: "resumable from checkpoint with
per-partition lineage + metrics" — a killed job must not recompute validated
partitions.

Design (SURVEY.md §4 'checkpoint / resume'):

- the input table is a directory of Parquet fragments (the Lance-fragment
  stand-in); fragments are grouped deterministically into SHARDS (unit of
  checkpointing — each shard still fans out into many Ray blocks, so
  parallelism within a shard is preserved);
- each shard runs the fused validation pass and atomically writes
  ``RESULTS/run=<id>/shard=<key>/{partial.pkl,_SUCCESS}`` (write to a temp
  name, ``os.replace``) plus per-shard metrics (rows, seconds, rows/s);
- on resume, shards with ``_SUCCESS`` are loaded from disk instead of
  recomputed — the final reduce folds disk partials + fresh partials into
  one Run verdict, identical to an uninterrupted run.
"""

from __future__ import annotations

import json
import os
import pickle
import time
from typing import Any, Optional

import ray.data as rd


def shard_files(files: list[str], num_shards: int) -> list[list[str]]:
    """Deterministic contiguous grouping of sorted fragment files."""
    files = sorted(files)
    num_shards = max(1, min(num_shards, len(files)))
    out: list[list[str]] = [[] for _ in range(num_shards)]
    for i, f in enumerate(files):
        out[i % num_shards].append(f)
    return out


def list_fragments(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return [os.path.join(path, f) for f in sorted(os.listdir(path))
            if f.endswith(".parquet")]


class ShardCheckpoint:
    def __init__(self, results_dir: str, run_id: str):
        self.dir = os.path.join(results_dir, f"run={run_id}")
        os.makedirs(self.dir, exist_ok=True)

    def shard_dir(self, key: str) -> str:
        return os.path.join(self.dir, f"shard={key}")

    def is_done(self, key: str) -> bool:
        return os.path.exists(os.path.join(self.shard_dir(key), "_SUCCESS"))

    def load(self, key: str) -> dict[str, Any]:
        with open(os.path.join(self.shard_dir(key), "partial.pkl"), "rb") as fh:
            return pickle.load(fh)

    def save(self, key: str, partial: dict[str, Any], metrics: dict[str, Any]) -> None:
        d = self.shard_dir(key)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".partial.tmp")
        with open(tmp, "wb") as fh:
            pickle.dump(partial, fh)
        os.replace(tmp, os.path.join(d, "partial.pkl"))  # atomic publish
        with open(os.path.join(d, "metrics.json"), "w") as fh:
            json.dump(metrics, fh)
        with open(os.path.join(d, "_SUCCESS"), "w") as fh:
            fh.write("")

    def completed_shards(self) -> list[str]:
        if not os.path.isdir(self.dir):
            return []
        return sorted(d.split("=", 1)[1] for d in os.listdir(self.dir)
                      if d.startswith("shard=") and self.is_done(d.split("=", 1)[1]))

    def metrics(self) -> dict[str, Any]:
        out = {}
        for key in self.completed_shards():
            p = os.path.join(self.shard_dir(key), "metrics.json")
            if os.path.exists(p):
                with open(p) as fh:
                    out[key] = json.load(fh)
        return out


def validate_resumable(
    contract,
    table_path: str,
    model_name: str,
    results_dir: str,
    run_id: str,
    num_shards: int = 8,
    max_samples: int = 20,
    fail_after_shards: Optional[int] = None,  # test hook: simulate a crash
    shard_parallelism: int = 2,
):
    """Shard-checkpointed validation of ONE model's fused pass.

    Returns (Run, metrics) — the Run's counter/uniqueness/image verdicts are
    reduced over all shards (disk-loaded for finished ones). Referential /
    drift checks re-run normally via validate() semantics and are out of the
    shard loop (they are cross-table).

    NOTE on uniqueness across shards: per-shard duplicate detection is NOT
    enough (a value can appear once in two shards). The fused pass therefore
    checkpoints the per-shard (key,count) partials, and the cross-shard
    duplicate reduce happens at the end over all shards' partials — exact,
    and still shuffle-light because partials are distinct-per-shard.
    """
    from raycontract.compile import compile_contract
    from raycontract.engine import _as_contract
    from raycontract.plans import ModelPlan
    from raycontract.result import ResultEnum, Run
    from raycontract.stages.fused import FusedKernel
    from raycontract.stages.stats import merge_partials

    dc = _as_contract(contract, None)
    plan = compile_contract(dc.spec, dc.get_server())
    mp = plan.models[model_name]
    ckpt = ShardCheckpoint(results_dir, run_id)

    shards = shard_files(list_fragments(table_path), num_shards)
    pruned = ModelPlan(model_name=model_name, pk_column=mp.pk_column,
                       constraints=mp.constraints, agg_thresholds=mp.agg_thresholds)

    scan_cols = pruned.scan_columns()
    for u in mp.uniques:
        if u.column not in scan_cols:
            scan_cols.append(u.column)
    if mp.image is not None:
        for c in (mp.image.bytes_column, mp.image.width_column, mp.image.height_column,
                  mp.image.fmt_column, mp.image.phash_column, mp.image.id_column):
            if c and c not in scan_cols:
                scan_cols.append(c)
    for d in mp.drifts:
        if d.column not in scan_cols:
            scan_cols.append(d.column)

    def run_shard(files: list[str]) -> dict[str, Any]:
        from raycontract.stages.fused import FileFusedKernel

        t0 = time.time()
        # read-fused: each task reads its own fragment (no object-store hop
        # for the wide columns — same win as the engine's fused scan); shards
        # run concurrently so per-shard task count < cpus is fine
        fused = rd.from_items([{"path": p} for p in files],
                              override_num_blocks=len(files)).map_batches(
            FileFusedKernel(pruned, mp.image, mp.uniques, max_samples,
                            scan_cols or None, 512 if mp.image else 8192,
                            profile=bool(mp.drifts)),
            batch_format="pyarrow", batch_size=1,
        )
        rows = fused.take_all()
        partial = _fold_shard(rows, mp, max_samples)
        partial["_seconds"] = time.time() - t0
        return partial

    # shards checkpoint independently; a small thread pool overlaps their
    # fixed per-execution overheads while each shard still fans out across
    # the cluster (the crash-test hook forces the deterministic serial path)
    pending = [(idx, files) for idx, files in enumerate(shards)
               if not ckpt.is_done(f"{idx:05d}")]
    results: dict[int, dict[str, Any]] = {}
    computed = 0
    if fail_after_shards is not None or shard_parallelism <= 1:
        for idx, files in pending:
            if fail_after_shards is not None and computed >= fail_after_shards:
                raise RuntimeError(f"simulated crash after {computed} computed shards")
            results[idx] = run_shard(files)
            _save_shard(ckpt, idx, results[idx], len(shards[idx]))
            computed += 1
    elif pending:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(shard_parallelism, len(pending))) as pool:
            futs = {pool.submit(run_shard, files): idx for idx, files in pending}
            for fut, idx in futs.items():
                results[idx] = fut.result()
                _save_shard(ckpt, idx, results[idx], len(shards[idx]))
                computed += 1

    shard_partials = []
    for idx in range(len(shards)):
        if idx in results:
            shard_partials.append(results[idx])
        else:
            shard_partials.append(ckpt.load(f"{idx:05d}"))

    # ---- final reduce over all shards ----
    merged_stats = merge_partials([b for p in shard_partials for b in p["stats_blobs"]])
    image_agg = _merge_image([p.get("image") for p in shard_partials], max_samples)
    dup_stats = _merge_uniques([p["uniq"] for p in shard_partials], mp, max_samples)

    # ---- drift: global verdict from merged sketches + per-shard distances
    # (drift LOCALIZATION: which shard's distribution moved) ----
    drift_results: dict[str, dict] = {}
    drift_by_shard: dict[str, dict[str, float]] = {}
    if mp.drifts:
        from raycontract.stages.drift import compare_profiles, load_profile

        for d in mp.drifts:
            baseline = load_profile(d.baseline_path)
            if d.column not in baseline:
                continue
            cur = _profile_entry(merged_stats, d.column)
            res = compare_profiles(baseline[d.column], cur, d)
            per_shard = {}
            for idx, p in enumerate(shard_partials):
                entry = _profile_entry(p["stats"], d.column)
                try:
                    per_shard[f"{idx:05d}"] = round(
                        compare_profiles(baseline[d.column], entry, d)["distance"], 4)
                except Exception:
                    pass
            res["per_shard_distance"] = per_shard
            drift_results[d.check_key] = res
            drift_by_shard[d.column] = per_shard

    run = Run.create_run()
    run.dataContractId = dc.spec.id
    _assemble(run, plan, mp, merged_stats, image_agg, dup_stats, max_samples,
              drift_results)
    run.finish()
    return run, {"shards": len(shards), "computed": computed,
                 "resumed": len(shards) - computed, "metrics": ckpt.metrics(),
                 "drift_by_shard": drift_by_shard}


def _profile_entry(stats: dict, column: str) -> dict:
    cs = stats["columns"].get(column, {})
    return {"count": stats.get("row_count"), "null_count": cs.get("null_count"),
            "min": cs.get("min"), "max": cs.get("max"),
            "tdigest": cs.get("tdigest"), "cat": cs.get("cat")}


def _save_shard(ckpt: "ShardCheckpoint", idx: int, partial: dict[str, Any],
                n_files: int) -> None:
    secs = partial.pop("_seconds", 0.0)
    ckpt.save(f"{idx:05d}", partial, {
        "rows": partial["stats"]["row_count"], "seconds": round(secs, 3),
        "rows_per_sec": round(partial["stats"]["row_count"] / max(secs, 1e-9), 1),
        "files": n_files,
    })


def _fold_shard(rows, mp, max_samples) -> dict[str, Any]:
    """Fold one shard's fused output rows into a checkpointable partial."""
    stats_blobs, image_blobs = [], []
    uniq: dict[str, dict[int, int]] = {u.column: {} for u in mp.uniques}
    for r in rows:
        if r["kind"] == "p":
            d = pickle.loads(r["payload"])
            stats_blobs.append(d["stats"])
            if "image" in d:
                image_blobs.append(d["image"])
        else:
            col = r["kind"][2:]
            m = uniq[col]
            m[r["key"]] = m.get(r["key"], 0) + r["cnt"]
    from raycontract.stages.stats import merge_partials

    stats = merge_partials(stats_blobs)
    return {
        "stats_blobs": [pickle.dumps(stats)],  # pre-reduced per shard
        "stats": stats,
        "image": _merge_image([_image_from_blobs(image_blobs, max_samples)], max_samples)
        if image_blobs else None,
        "uniq": uniq,
    }


def _image_from_blobs(blobs, max_samples):
    agg = {"row_count": 0, "invalid_count": 0, "samples": []}
    counters: dict[str, int] = {}
    for p in blobs:
        p = pickle.loads(p) if isinstance(p, (bytes, bytearray)) else p
        agg["row_count"] += p["rows"]
        for k, v in p["counters"].items():
            counters[k] = counters.get(k, 0) + v
        if len(agg["samples"]) < max_samples:
            agg["samples"].extend(p["samples"][: max_samples - len(agg["samples"])])
    agg["invalid_count"] = sum(counters.values())
    agg.update(counters)
    return agg


def _merge_image(parts, max_samples):
    parts = [p for p in parts if p]
    if not parts:
        return None
    agg = {"row_count": 0, "invalid_count": 0, "samples": []}
    extra: dict[str, int] = {}
    for p in parts:
        agg["row_count"] += p["row_count"]
        agg["invalid_count"] += p["invalid_count"]
        for k, v in p.items():
            if k not in ("row_count", "invalid_count", "samples"):
                extra[k] = extra.get(k, 0) + v
        if len(agg["samples"]) < max_samples:
            agg["samples"].extend(p["samples"][: max_samples - len(agg["samples"])])
    agg.update(extra)
    return agg


def _merge_uniques(parts: list[dict[str, dict[int, int]]], mp, max_samples):
    out = {}
    for u in mp.uniques:
        counts: dict[int, int] = {}
        for p in parts:
            for k, c in p.get(u.column, {}).items():
                counts[k] = counts.get(k, 0) + c
        dups = {k: c for k, c in counts.items() if c > 1}
        out[u.column] = {
            "distinct_count": len(counts),
            "duplicate_values": len(dups),
            "duplicate_rows": sum(dups.values()) - len(dups),
            "samples": list(dups.keys())[:max_samples],
            "by_content_hash": True,
        }
    return out


def _assemble(run, plan, mp, stats, image_agg, dup_stats, max_samples,
              drift_results=None):
    """Verdicts from reduced partials (same folds as engine._model_thunks)."""
    from raycontract.engine import _set_result
    from raycontract.result import ResultEnum

    by_key: dict[str, list] = {}
    for c in plan.checks:
        if c.model == mp.model_name:
            by_key.setdefault(c.key, []).append(c)
            run.checks.append(c)

    for spec in mp.constraints:
        entry = stats["checks"].get(spec.check_key, {"invalid": 0, "samples": []})
        inv = entry["invalid"]
        _set_result(by_key.get(spec.check_key, []), inv == 0,
                    f"invalid_count is {inv}, expected 0",
                    {"invalid_count": inv, "missing_count": inv,
                     "row_count": stats["row_count"], "samples": entry["samples"]})
    for u in mp.uniques:
        d = dup_stats[u.column]
        dup = d["duplicate_values"]
        _set_result(by_key.get(u.check_key, []), dup == 0,
                    f"duplicate_count is {dup}, expected 0", d)
    if mp.image is not None and image_agg is not None:
        _set_result(by_key.get(mp.image.check_key, []), image_agg["invalid_count"] == 0,
                    f"{image_agg['invalid_count']} images fail conformance", image_agg)
    for key, res in (drift_results or {}).items():
        _set_result(by_key.get(key, []), res["passed"],
                    f"{res['metric']} distance {res['distance']:.4f} exceeds "
                    f"threshold {res['threshold']}", res)
    for c in run.checks:
        if c.result is None:
            c.result = ResultEnum.unknown
