"""Validation engine: execute a compiled plan against Ray Datasets.

≅ the reference's ``DataContract.test()`` lifecycle (``data_contract.py:
140-186`` → ``engines/data_contract_test.py`` → soda scan): resolve →
compile → execute → verdict. Execution here is Ray-Data-native
(SURVEY.md §3a "Ours"):

  read_parquet(columns=pruned) → map_batches(StatsKernel) single pass for all
  counter checks → [two-stage groupby for uniqueness; broadcast/bucketed anti
  join for referential; actor-pool decode for image conformance; sketch
  profile + compare for drift] → driver-side fold into Run/Check verdicts.

The verdict-assembly fold mirrors ``check_soda_execute.py:139-215`` (scan
results joined back to checks by key, outcome mapped, failure reason from
diagnostics) and ``model/run.py:65-75`` (run verdict precedence).
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Any, Optional

import ray.data as rd

from raycontract.contract import DataContract, DataContractSpecification
from raycontract.compile import compile_contract, evaluate_threshold
from raycontract.plans import ModelPlan, ValidationPlan
from raycontract.result import Check, ResultEnum, Run, new_check_id
from raycontract.sources.readers import read_model
from raycontract.stages.stats import run_stats_pass  # noqa: F401 (public engine API)
from raycontract.types import arrow_type_matches

_AGG_RE = re.compile(
    r"^\s*select\s+(count|sum|min|max|avg)\s*\(\s*(\*|[\w\.]+)\s*\)\s+from\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
# distributed fast path #2: <agg>(<arbitrary scalar expr>) [WHERE <pred>] —
# the expr/pred are evaluated per batch by DuckDB inside map_batches
# (vectorized), partials merged on the driver (sum/min/max; avg = sum+count)
_AGG_EXPR_RE = re.compile(
    r"^\s*select\s+(count|sum|min|max|avg)\s*\((.+?)\)\s+from\s+(\w+)"
    r"(?:\s+where\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
# distributed fast path #3: duplicate-shaped GROUP BY — count of groups
# matching a HAVING count(*) condition; per-batch partial groupby (DuckDB),
# merged (groupby keys, sum) on the driver, HAVING applied to merged counts
_GROUPED_COUNT_RE = re.compile(
    r"^\s*select\s+count\s*\(\s*\*\s*\)\s+from\s*\(\s*select\s+(.+?)\s+from\s+(\w+)"
    r"(?:\s+where\s+(.+?))?\s+group\s+by\s+(.+?)\s+having\s+count\s*\(\s*\*\s*\)\s*"
    r"(>=|<=|!=|=|>|<)\s*(\d+)\s*\)(?:\s+as\s+\w+|\s+\w+)?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_FORBIDDEN_SQL = re.compile(r"\b(join|union|over|distinct|group\s+by|order\s+by|limit)\b",
                            re.IGNORECASE)
_QUANTILE_RE = re.compile(
    r"^\s*select\s+(?:approx_)?(?:percentile|quantile)(?:_cont|_disc)?\s*"
    r"\(\s*(\w+)\s*,\s*([0-9.]+)\s*\)\s+from\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)


def validate(
    contract: "DataContract | DataContractSpecification | str",
    datasets: Optional[dict[str, Any]] = None,
    server: Optional[str] = None,
    now: Optional[datetime] = None,
    max_samples: int = 20,
    batch_size: Optional[int] = None,
    override_num_blocks: Optional[int] = None,
) -> Run:
    """Run all checks; returns a ``Run`` with per-check verdicts + diagnostics.

    ``datasets`` maps model name → ray Dataset / pandas DataFrame / pyarrow
    Table (≅ the reference's ``dataframe`` server type); otherwise data is
    read from the contract's server definition.
    """
    dc = _as_contract(contract, server)
    # structural schema gate ≅ reference resolve-time validation
    # (lint/resolve.py:283-305): malformed contract → failed run with the
    # reference's check shape, nothing executed
    from raycontract.schema_validate import ContractValidationError

    try:
        dc.validate_schema()
    except ContractValidationError as e:
        run = Run.create_run()
        run.dataContractId = dc.spec.id
        run.checks = [Check(id=new_check_id(), key="lint__schema", category="lint",
                            type="lint", name=e.name, engine="raycontract",
                            result=ResultEnum.failed, reason=e.reason)]
        run.finish()
        return run

    plan = compile_contract(dc.spec, dc.get_server())
    run = Run.create_run()
    run.dataContractId = dc.spec.id
    run.dataContractVersion = dc.spec.info.version
    now = now or datetime.now(timezone.utc)

    by_key: dict[str, list[Check]] = {}
    for c in plan.checks:
        by_key.setdefault(c.key, []).append(c)
    run.checks = plan.checks

    import threading

    model_datasets: dict[tuple, Any] = {}
    ds_lock = threading.Lock()

    def get_ds(model_name: str, columns: Optional[list[str]] = None):
        key = (model_name, tuple(columns) if columns else None)
        with ds_lock:  # thunks run concurrently; build each Dataset plan once
            if key in model_datasets:
                return model_datasets[key]
            if datasets and model_name in datasets:
                base_key = (model_name, None)
                if base_key not in model_datasets:
                    model_datasets[base_key] = _to_dataset(datasets[model_name])
                ds = model_datasets[base_key]
                ds = ds.select_columns(list(columns)) if columns else ds
            else:
                srv = dc.get_server()
                if srv is None:
                    raise ValueError(f"no server and no dataset for model {model_name}")
                # push the projection into the read (parquet column pruning);
                # a select_columns Project stage costs an extra per-batch copy
                ds = read_model(srv, model_name, dc.spec.models.get(model_name),
                                columns=list(columns) if columns else None,
                                override_num_blocks=override_num_blocks)
            model_datasets[key] = ds
            return ds

    # Collect independent execution units across ALL models and run them
    # concurrently: each unit is its own Ray Dataset execution, and the fixed
    # per-execution overhead (task submit, shuffle setup) otherwise serializes
    # — threads share the one Ray cluster, the streaming executors interleave.
    srv = dc.get_server()
    _PARQUET_FMTS = ("parquet", "lance", "delta")
    thunks: list[tuple[str, list[Check], Any]] = []
    for model_name, mp in plan.models.items():
        # count() is metadata-only for parquet reads and in-memory datasets;
        # for csv/json it would execute a FULL extra scan — skip it there and
        # let the fused pass take its conservative distributed path
        cheap_count = bool(datasets and model_name in datasets) or (
            srv is not None and (srv.format or "parquet") in _PARQUET_FMTS)
        fused_files = None
        if not (datasets and model_name in datasets):
            fused_files = _fused_read_files(srv, model_name)
        try:
            thunks.extend(_model_thunks(plan, mp, by_key, get_ds, now, max_samples,
                                        batch_size, cheap_count=cheap_count,
                                        fused_files=fused_files,
                                        run_metrics_box=run.metrics))
        except Exception as e:  # a broken model errors its checks, not the run
            for c in plan.checks:
                if c.model == model_name and c.result is None:
                    c.result = ResultEnum.error
                    c.reason = f"execution error: {e}"
            run.log_error(f"model {model_name}: {e}")

    if thunks:
        from concurrent.futures import ThreadPoolExecutor

        def guarded(label, checks, fn):
            import time as _time

            t0 = _time.time()
            try:
                fn()
                run.metrics[label] = {"seconds": round(_time.time() - t0, 3)}
            except Exception as e:
                run.metrics[label] = {"seconds": round(_time.time() - t0, 3),
                                      "error": str(e)}
                for c in checks:
                    if c.result is None:
                        c.result = ResultEnum.error
                        c.reason = f"execution error: {e}"
                run.log_error(f"{label}: {e}")

        max_workers = min(len(thunks), int(kwargs_max_workers()))
        with ThreadPoolExecutor(max_workers=max_workers) as pool:
            futures = [pool.submit(guarded, label, checks, fn) for label, checks, fn in thunks]
            for f in futures:
                f.result()

    for c in run.checks:
        if c.result is None:
            c.result = ResultEnum.unknown
    run.finish()
    return run


def _as_contract(contract, server) -> DataContract:
    if isinstance(contract, DataContract):
        return contract
    if isinstance(contract, DataContractSpecification):
        return DataContract(data_contract=contract, server=server)
    if isinstance(contract, str):
        if "\n" in contract:
            return DataContract(data_contract_str=contract, server=server)
        return DataContract(data_contract_file=contract, server=server)
    raise TypeError(type(contract))


def _to_dataset(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, rd.Dataset):
        return obj
    if isinstance(obj, pd.DataFrame):
        return rd.from_pandas(obj)
    if isinstance(obj, pa.Table):
        return rd.from_arrow(obj)
    raise TypeError(f"cannot make a Dataset from {type(obj)}")


def _set_result(checks: list[Check], passed: bool, reason: Optional[str], diagnostics: dict):
    for c in checks:
        c.result = ResultEnum.passed if passed else ResultEnum.failed
        c.reason = None if passed else reason
        c.diagnostics = diagnostics


def _set_error(checks: list[Check], reason: str):
    for c in checks:
        c.result = ResultEnum.error
        c.reason = reason


def kwargs_max_workers() -> int:
    import os

    return int(os.environ.get("RAYCONTRACT_CHECK_PARALLELISM", "6"))


def _fused_read_files(srv, model_name: str):
    """Fragment list for the read-fused scan — local parquet/lance sources
    whose fragment count keeps every CPU busy (one task per fragment) and
    whose fragments are individually small enough to read in one task."""
    import os

    import ray

    if srv is None or (srv.format or "parquet") not in ("parquet", "lance"):
        return None
    try:
        from raycontract.sources.readers import resolve_path

        p = resolve_path(srv, model_name)
    except Exception:
        return None
    if os.path.isdir(p):
        files = sorted(os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet"))
    elif os.path.isfile(p):
        files = [p]
    else:
        return None
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    if len(files) < ncpu:
        return None  # not enough fragments to keep the cluster busy per-task
    if any(os.path.getsize(f) > (1 << 30) for f in files):
        return None  # giant fragments: stay on the splitting read
    return files


def _model_thunks(plan: ValidationPlan, mp: ModelPlan, by_key, get_ds, now, max_samples,
                  batch_size, cheap_count: bool = True, fused_files=None,
                  run_metrics_box: Optional[dict] = None) -> list:
    """Run schema checks (metadata-only) synchronously, prune to present
    columns, and return one (label, checks, thunk) per independent Ray
    execution so validate() can run them concurrently."""
    import pyarrow as pa

    ds_full = get_ds(mp.model_name)
    schema = ds_full.schema()
    actual = {n: t for n, t in zip(schema.names, schema.types)}

    # --- schema checks: metadata only, no scan (SURVEY §2a #1-2) ---
    for sc in mp.schema_checks:
        checks = by_key.get(sc.check_key, [])
        checks = [c for c in checks if c.type in ("field_is_present", "field_type")]
        present = sc.column in actual
        if sc.kind == "present":
            _set_result(checks, present, f"column {sc.column} missing from physical schema",
                        {"present": present})
        elif sc.kind == "type":
            if not present:
                _set_error(checks, f"column {sc.column} missing from physical schema")
                continue
            act_t = actual[sc.column]
            exp_t = _parse_arrow_type(sc.expected_type)
            if isinstance(exp_t, _OpaqueType):
                ok = str(act_t) == exp_t.s  # nested types: strict repr equality
            else:
                ok = isinstance(act_t, pa.DataType) and arrow_type_matches(act_t, exp_t)
            _set_result(checks, ok,
                        f"column {sc.column} has type {act_t}, expected {sc.expected_type}",
                        {"actual_type": str(act_t), "expected_type": sc.expected_type})

    # prune constraint specs to present columns; missing column → error
    missing_constraints = [c for c in mp.constraints if c.column not in actual]
    for spec in missing_constraints:
        _set_error(by_key.get(spec.check_key, []), f"column {spec.column} not present")
    live_constraints = [c for c in mp.constraints if c.column in actual]
    # nested constraints also need the struct/list path to exist physically
    bad_paths = [c for c in live_constraints
                 if c.path and not _path_in_type(actual[c.column], c.path)]
    for spec in bad_paths:
        _set_error(by_key.get(spec.check_key, []),
                   f"nested path {spec.column}{''.join('.' + p for p in spec.path)} "
                   f"not present in physical type {actual[spec.column]}")
    live_constraints = [c for c in live_constraints if c not in bad_paths]
    # unknown kinds (unregistered plugins) error their check, not the pass
    _BUILTIN_KINDS = {"not_null", "min_length", "max_length", "minimum", "maximum",
                      "not_equal", "enum", "regex", "format"}
    from raycontract.plugins import get_check as _get_check

    unknown = [c for c in live_constraints
               if c.kind not in _BUILTIN_KINDS and _get_check(c.kind) is None]
    for spec in unknown:
        _set_error(by_key.get(spec.check_key, []),
                   f"no plugin registered for check kind {spec.kind!r}")
    live_constraints = [c for c in live_constraints if c not in unknown]
    live_aggs = []
    for a in mp.agg_thresholds:
        if a.column in actual:
            live_aggs.append(a)
        else:
            _set_error(by_key.get(a.check_key, []), f"column {a.column} not present")

    pruned = ModelPlan(
        model_name=mp.model_name, pk_column=mp.pk_column if mp.pk_column in actual else None,
        constraints=live_constraints, agg_thresholds=live_aggs,
    )
    scan_cols = pruned.scan_columns()
    live_uniques = []
    for u in mp.uniques:
        if u.column in actual:
            live_uniques.append(u)
        else:
            _set_error(by_key.get(u.check_key, []), f"column {u.column} not present")

    image_spec = None
    image_checks: list[Check] = []
    if mp.image is not None:
        image_checks = by_key.get(mp.image.check_key, [])
        needed = [c for c in (mp.image.bytes_column, mp.image.width_column,
                              mp.image.height_column, mp.image.fmt_column,
                              mp.image.phash_column, mp.image.id_column) if c]
        miss = [c for c in needed if c not in actual]
        if miss:
            _set_error(image_checks, f"image columns missing: {miss}")
        else:
            image_spec = mp.image
            scan_cols = scan_cols + [c for c in needed if c not in scan_cols]
    for u in live_uniques:
        if u.column not in scan_cols:
            scan_cols = scan_cols + [u.column]

    need_stats = bool(pruned.scan_columns()) or mp.row_count_threshold is not None or mp.qualities
    need_fused = need_stats or live_uniques or image_spec is not None

    thunks: list = []

    def fused_thunk():
        from raycontract.stages.fused import run_fused_pass

        try:
            # metadata-only on the bare (unprojected) read — lets the fused
            # pass pick its single-execution driver path safely. Gated on
            # cheap_count: for csv/json sources count() would be a full scan.
            input_rows = get_ds(mp.model_name).count() if cheap_count else None
        except Exception:
            input_rows = None
        ds = get_ds(mp.model_name, scan_cols or None)
        stats, image_agg, dups = run_fused_pass(
            ds, pruned, image_spec, live_uniques,
            max_samples=max_samples, batch_size=batch_size, input_rows=input_rows,
            file_paths=fused_files, columns=scan_cols or None)
        ray_stats = stats.pop("_ray_stats", None)
        if ray_stats and run_metrics_box is not None:
            run_metrics_box[f"{mp.model_name}:ray-stats"] = ray_stats

        # --- uniqueness verdicts (two-stage groupby over fused partials) ---
        for u in live_uniques:
            dstats = dups[u.column]
            dup = dstats["duplicate_values"]
            _set_result(by_key.get(u.check_key, []), dup == 0,
                        f"duplicate_count is {dup}, expected 0",
                        {"duplicate_values": dup, "duplicate_rows": dstats["duplicate_rows"],
                         "distinct_count": dstats["distinct_count"],
                         "invalid_count": dstats["duplicate_rows"],
                         "samples": dstats["samples"],
                         "by_content_hash": dstats["by_content_hash"]})

        # --- image conformance verdict (north-star extension) ---
        if image_spec is not None and image_agg is not None:
            bad = image_agg["invalid_count"]
            _set_result(image_checks, bad == 0,
                        f"{bad} images fail decode/dimension/phash/psnr conformance",
                        image_agg)

        # --- counter-check verdicts from the single pass ---
        for spec in live_constraints:
            entry = stats["checks"].get(spec.check_key, {"invalid": 0, "samples": []})
            inv = entry["invalid"]
            if spec.kind == "not_null":
                diag = {"missing_count": inv, "row_count": stats["row_count"],
                        "invalid_count": inv, "samples": entry["samples"]}
                reason = f"missing_count is {inv}, expected 0"
            else:
                diag = {"invalid_count": inv, "row_count": stats["row_count"],
                        "samples": entry["samples"]}
                reason = f"invalid_count is {inv}, expected 0"
            _set_result(by_key.get(spec.check_key, []), inv == 0, reason, diag)

        # --- freshness / retention (SURVEY §2a #13-14) ---
        for a in live_aggs:
            cstats = stats["columns"].get(a.column, {})
            bound = cstats.get("max" if a.kind == "freshness" else "min")
            checks = by_key.get(a.check_key, [])
            if bound is None:
                _set_error(checks, f"no values in {a.column} (empty dataset?)")
                continue
            age = _age_seconds(now, bound)
            ok = age < a.seconds
            word = "newest" if a.kind == "freshness" else "oldest"
            _set_result(checks, ok,
                        f"{word} {a.column} is {age:.0f}s old, allowed {a.seconds:.0f}s ({a.display})",
                        {"age_seconds": age, "threshold_seconds": a.seconds,
                         "boundary_value": str(bound)})

        # --- deprecated root quality: row_count <op> N (ref :716-738) ---
        if mp.row_count_threshold is not None:
            op, val = mp.row_count_threshold
            n = stats["row_count"]
            ok = evaluate_threshold(n, ("=" if op == "=" else op, val))
            for c in plan.checks:
                if c.key == "quality__sodacl" and c.model == mp.model_name and c.details != "unsupported":
                    c.result = ResultEnum.passed if ok else ResultEnum.failed
                    c.reason = None if ok else f"row_count is {n}, must be {op} {val}"
                    c.diagnostics = {"row_count": n}

        # --- quality SQL checks (SURVEY §2a #12): the aggregate fast path
        # reads the merged stats, so these run inside the stats thunk ---
        for q in mp.qualities:
            checks = by_key.get(q.check_key, [])
            try:
                value = _eval_quality(q.query, mp.model_name, stats, get_ds)
            except Exception as e:
                _set_error(checks, f"quality query failed: {e}")
                continue
            if value is None:
                _set_error(checks, "quality query returned no value")
                continue
            ok = evaluate_threshold(value, q.threshold)
            op, ref = q.threshold
            _set_result(checks, ok, f"value {value} violates threshold {op} {ref}",
                        {"value": value, "threshold": f"{op} {ref}"})

    if need_fused:
        fused_checks = [c for spec in live_constraints + live_aggs + mp.qualities + live_uniques
                        for c in by_key.get(spec.check_key, [])] + image_checks
        thunks.append((f"{mp.model_name}:fused-scan", fused_checks, fused_thunk))

    # --- referential integrity (SURVEY §2a #16) ---
    from raycontract.stages.referential import referential_stats

    for r in mp.referentials:
        checks = by_key.get(r.check_key, [])
        if r.column not in actual:
            _set_error(checks, f"column {r.column} not present")
            continue

        def ref_thunk(r=r, checks=checks):
            try:
                parent_ds = get_ds(r.parent_model, [r.parent_column])
            except Exception as e:
                _set_error(checks, f"cannot read parent model {r.parent_model}: {e}")
                return
            rstats = referential_stats(get_ds(mp.model_name, [r.column]), r.column,
                                       parent_ds, r.parent_column, max_samples=max_samples)
            bad = rstats["violation_rows"]
            _set_result(checks, bad == 0,
                        f"{bad} rows reference missing {r.parent_model}.{r.parent_column}",
                        {"invalid_count": bad, "violation_keys": rstats["violation_keys"],
                         "samples": rstats["samples"], "strategy": rstats["strategy"]})

        thunks.append((f"{mp.model_name}:references:{r.column}", checks, ref_thunk))

    # --- distribution drift vs baseline profile (north-star extension) ---
    if mp.drifts:
        from raycontract.stages.drift import drift_stats

        for d in mp.drifts:
            checks = by_key.get(d.check_key, [])
            if d.column not in actual:
                _set_error(checks, f"column {d.column} not present")
                continue

            def drift_thunk(d=d, checks=checks):
                try:
                    dstat = drift_stats(get_ds(mp.model_name, [d.column]), d)
                except Exception as e:
                    _set_error(checks, f"drift check failed: {e}")
                    return
                _set_result(checks, dstat["passed"],
                            f"{dstat['metric']} distance {dstat['distance']:.4f} exceeds "
                            f"threshold {dstat['threshold']}",
                            dstat)

            thunks.append((f"{mp.model_name}:drift:{d.column}", checks, drift_thunk))

    return thunks


def _path_in_type(t, path: tuple) -> bool:
    """Does the nested access path exist in the physical Arrow type?"""
    import pyarrow as pa

    for step in path:
        if step == "[]":
            if not (pa.types.is_list(t) or pa.types.is_large_list(t)
                    or pa.types.is_fixed_size_list(t)):
                return False
            t = t.value_type
        else:
            if not pa.types.is_struct(t):
                return False
            idx = t.get_field_index(step)
            if idx < 0:
                return False
            t = t.field(idx).type
    return True


def _age_seconds(now: datetime, bound) -> float:
    if isinstance(bound, datetime):
        b = bound
        if b.tzinfo is None:
            n = now.replace(tzinfo=None) if now.tzinfo else now
        else:
            n = now if now.tzinfo else now.replace(tzinfo=timezone.utc)
        return (n - b).total_seconds()
    raise ValueError(f"freshness/retention column has non-timestamp value {bound!r}")


def _parse_arrow_type(s: str):
    """Inverse of str(pa.DataType) for the types our mapping emits."""
    import pyarrow as pa

    simple = {
        "string": pa.string(), "large_string": pa.large_string(), "int8": pa.int8(),
        "int16": pa.int16(), "int32": pa.int32(), "int64": pa.int64(), "float": pa.float32(),
        "double": pa.float64(), "bool": pa.bool_(), "date32[day]": pa.date32(),
        "time64[us]": pa.time64("us"), "time32[ms]": pa.time32("ms"), "binary": pa.binary(),
        "large_binary": pa.large_binary(), "null": pa.null(),
    }
    if s in simple:
        return simple[s]
    m = re.match(r"^timestamp\[(\w+)(?:, tz=(.+))?\]$", s)
    if m:
        return pa.timestamp(m.group(1), tz=m.group(2))
    m = re.match(r"^decimal128\((\d+), (\d+)\)$", s)
    if m:
        return pa.decimal128(int(m.group(1)), int(m.group(2)))
    m = re.match(r"^list<(?:element|item): (.+)>$", s)
    if m:
        return pa.list_(_parse_arrow_type(m.group(1)))
    m = re.match(r"^map<(.+), (.+)>$", s)
    if m and "<" not in m.group(1):
        k = _parse_arrow_type(m.group(1))
        v = _parse_arrow_type(m.group(2))
        if not isinstance(k, _OpaqueType) and not isinstance(v, _OpaqueType):
            return pa.map_(k, v)
    m = re.match(r"^struct<(.+)>$", s)
    if m:
        fields = []
        depth = 0
        cur = ""
        parts = []
        for ch in m.group(1):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        parts.append(cur)
        ok = True
        for p in parts:
            name, _, typ = p.strip().partition(": ")
            t = _parse_arrow_type(typ)
            if isinstance(t, _OpaqueType):
                ok = False
                break
            fields.append(pa.field(name, t))
        if ok:
            return pa.struct(fields)
    # anything unparsed falls back to string equality at the caller
    return _OpaqueType(s)


class _OpaqueType:
    """Fallback for nested type reprs: compares by string form."""

    def __init__(self, s: str):
        self.s = s

    def equals(self, other) -> bool:  # duck-typed into arrow_type_matches
        return str(other) == self.s


def _eval_quality(query: str, model_name: str, stats, get_ds):
    """Aggregate fast paths from the single-pass stats (no extra scan); a
    targeted t-digest pass for quantiles; DuckDB over streamed batches as the
    general fallback (driver-local — documented as off the distributed fast
    path, SURVEY §2a #12)."""
    m = _AGG_RE.match(query)
    if m and m.group(3).lower() == model_name.lower() and stats is not None:
        fn, col = m.group(1).lower(), m.group(2)
        if fn == "count" and col == "*":
            return stats["row_count"]
        cs = stats["columns"].get(col)
        if cs is not None:
            if fn == "count":
                return stats["row_count"] - cs["null_count"]
            if fn == "min":
                return cs.get("min")
            if fn == "max":
                return cs.get("max")
            if fn in ("sum", "avg") and cs.get("sum") is not None:
                if fn == "sum":
                    return cs["sum"]
                nn = stats["row_count"] - cs["null_count"]
                return cs["sum"] / nn if nn else None
    m = _QUANTILE_RE.match(query)
    if m and m.group(3).lower() == model_name.lower():
        col, qv = m.group(1), float(m.group(2))
        return _tdigest_quantile(get_ds(model_name, [col]), col, qv)
    m = _GROUPED_COUNT_RE.match(query)
    if m and m.group(2).lower() == model_name.lower():
        keys = _resolve_positional_group_by(m.group(4), m.group(1))
        if keys is not None:
            return _grouped_count_fast_path(get_ds(model_name), model_name,
                                            keys=keys, select=m.group(1),
                                            where=m.group(3), op=m.group(5),
                                            n=int(m.group(6)))
        # unresolvable positional GROUP BY (e.g. positions over computed
        # select items) would group by literal constants in the per-batch
        # partial — a silently-wrong verdict; route to the exact fallback.
    m = _AGG_EXPR_RE.match(query)
    if (m and m.group(3).lower() == model_name.lower()
            and not _FORBIDDEN_SQL.search(m.group(2) or "")
            and not _FORBIDDEN_SQL.search(m.group(4) or "")):
        return _agg_expr_fast_path(get_ds(model_name), fn=m.group(1).lower(),
                                   expr=m.group(2), where=m.group(4))
    return _duckdb_fallback(query, model_name, get_ds)


def _resolve_positional_group_by(keys: str, select: str):
    """GROUP BY 1, 2 refers to select-list POSITIONS; the per-batch partial
    rebuilds the GROUP BY textually, where a bare integer is a constant —
    grouping every row into one bucket and silently flipping the HAVING
    verdict (ADVICE r2). Resolve positions against the select list when its
    items are plain column names; return None (→ exact fallback) otherwise.
    Non-positional key lists pass through unchanged."""
    parts = [k.strip() for k in keys.split(",")]
    if not any(re.fullmatch(r"\d+", p) for p in parts):
        return keys
    sel = [s.strip() for s in select.split(",")]
    resolved = []
    for p in parts:
        if re.fullmatch(r"\d+", p):
            i = int(p) - 1
            if not (0 <= i < len(sel)) or not re.fullmatch(r"[\w\.]+", sel[i]):
                return None
            resolved.append(sel[i])
        else:
            resolved.append(p)
    return ", ".join(resolved)


def _batch_duck(batch, sql: str):
    """Run one SQL statement over a single Arrow batch with a per-worker
    cached DuckDB connection (vectorized scalar-expression evaluation)."""
    import duckdb

    global _WORKER_DUCK
    try:
        con = _WORKER_DUCK
    except NameError:
        con = duckdb.connect()
        globals()["_WORKER_DUCK"] = con
    con.register("_rc_b", batch)
    try:
        return con.execute(sql).arrow()
    finally:
        con.unregister("_rc_b")


def _agg_expr_fast_path(ds, fn: str, expr: str, where):
    """Decomposable aggregate over an arbitrary scalar expression:
    per-batch DuckDB partial inside map_batches → tiny driver merge.
    avg decomposes into (sum, count)."""
    import pyarrow as pa

    cond = f" WHERE {where}" if where else ""
    if fn == "avg":
        inner = f"SELECT SUM({expr}) AS s, COUNT({expr}) AS c FROM _rc_b{cond}"
    elif fn == "count":
        inner = f"SELECT COUNT({expr}) AS v FROM _rc_b{cond}"
    else:
        inner = f"SELECT {fn.upper()}({expr}) AS v FROM _rc_b{cond}"

    def partial(batch: pa.Table) -> pa.Table:
        return _batch_duck(batch, inner)

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    if fn == "avg":
        s = sum(r["s"] for r in rows if r["s"] is not None)
        c = sum(r["c"] for r in rows)
        return s / c if c else None
    vals = [r["v"] for r in rows if r["v"] is not None]
    if fn in ("count", "sum"):
        return sum(vals) if (vals or fn == "count") else None
    if not vals:
        return None
    return min(vals) if fn == "min" else max(vals)


def _grouped_count_fast_path(ds, model_name: str, keys: str, select: str,
                             where, op: str, n: int):
    """Two-stage duplicate-shaped GROUP BY: per-batch partial counts per key
    (DuckDB in map_batches, shuffle-free), merged per key on the driver
    (bounded by the number of DISTINCT keys, not rows), HAVING applied to the
    merged counts."""
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()
    import pyarrow as pa

    cond = f" WHERE {where}" if where else ""
    inner = f"SELECT {keys}, COUNT(*) AS _n FROM _rc_b{cond} GROUP BY {keys}"

    def partial(batch: pa.Table) -> pa.Table:
        return _batch_duck(batch, inner)

    import ray

    parts = [pa.table(t) for t in
             ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
             if t.num_rows]
    if not parts:
        return 0
    df = pl.from_arrow(pa.concat_tables(parts))
    key_cols = [c for c in df.columns if c != "_n"]
    merged = df.group_by(key_cols).agg(pl.col("_n").sum())
    col = pl.col("_n")
    having = {">": col > n, ">=": col >= n, "<": col < n, "<=": col <= n,
              "=": col == n, "!=": col != n}[op]
    return merged.filter(having).height


def _tdigest_quantile(ds, column: str, q: float) -> float:
    import pickle

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def sketch(batch: pa.Table) -> pa.Table:
        from raycontract.functions.sketches import TDigest

        td = TDigest()
        td.add(np.asarray(pc.cast(batch[column].drop_null(), pa.float64())))
        return pa.table({"payload": pa.array([pickle.dumps(td.to_bytes())], type=pa.binary())})

    from raycontract.functions.sketches import TDigest

    rows = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    merged = None
    for r in rows:
        td = TDigest.from_bytes(pickle.loads(r["payload"]))
        merged = td if merged is None else merged.merge(td)
    return merged.quantile(q) if merged is not None else float("nan")


def _duckdb_fallback(query: str, model_name: str, get_ds):
    """Arbitrary-SQL quality checks: stream the model's batches into an
    in-memory DuckDB table on the driver and run the query. Correct but NOT
    distributed — the reference has the same shape (one DuckDB connection,
    ``duckdb_connection.py:17-20``). A loud warning is emitted so the cost is
    never silent, and ``RAYCONTRACT_FALLBACK_SAMPLE_ROWS`` caps the streamed
    rows (sampled mode: the check becomes approximate and says so). Simple
    aggregate / filtered-aggregate / duplicate-GROUP-BY shapes never reach
    here — they run on the distributed fast paths above."""
    import logging
    import os

    import duckdb
    import pyarrow as pa

    sample_rows = int(os.environ.get("RAYCONTRACT_FALLBACK_SAMPLE_ROWS", "0") or 0)
    logging.getLogger(__name__).warning(
        "quality SQL %r does not match any distributed fast path — streaming "
        "model %s into a DRIVER-LOCAL DuckDB table%s. This is a single-node "
        "scan; rewrite as <agg>(<expr>) [WHERE ...] or a duplicate-shaped "
        "GROUP BY to stay distributed.",
        query, model_name,
        f" (sampled: first {sample_rows} rows)" if sample_rows else "")

    ds = get_ds(model_name)
    if sample_rows:
        ds = ds.limit(sample_rows)
    con = duckdb.connect()
    first = True
    for batch in ds.iter_batches(batch_size=65536, batch_format="pyarrow"):
        con.register("_rc_batch", batch)
        if first:
            con.execute(f'CREATE TABLE "{model_name}" AS SELECT * FROM _rc_batch')
            first = False
        else:
            con.execute(f'INSERT INTO "{model_name}" SELECT * FROM _rc_batch')
        con.unregister("_rc_batch")
    if first:
        con.execute(f'CREATE TABLE "{model_name}" (dummy INTEGER)')
    row = con.execute(query).fetchone()
    con.close()
    return row[0] if row else None
