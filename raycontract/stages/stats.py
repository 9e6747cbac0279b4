"""Single-pass per-column stats kernel.

ONE ``map_batches`` pass over zero-copy Arrow batches evaluates ALL counter
checks for ALL columns simultaneously (null counts, length bounds, value
bounds, enum membership, regex/format matches — SURVEY.md §2a #3,5-11,17) and
emits a tiny mergeable partial per batch: counters + per-column min/max (+
optional sketches in profile mode) + capped violation-row samples.

This replaces the reference's per-check SQL metric queries
(``engines/data_contract_checks.py:164-447`` → soda/DuckDB): instead of one
scan per metric, every metric is computed in the same streamed scan, fully
vectorized with ``pyarrow.compute`` kernels.

Scale notes:
- the partial is O(columns + checks + samples), independent of batch size, so
  the reduce input for a 10^12-row table is ~num_blocks tiny rows;
- regexes use Arrow's RE2 (``match_substring_regex``) — same engine DuckDB
  uses, so oracle parity holds; exotic Python-`re`-only patterns are a
  documented divergence (SURVEY.md §7);
- violation samples are capped per check (default 20, cf. the reference's
  DATACONTRACT_MAX_ERRORS=500 row cap, ``check_jsonschema.py:51-84``) and
  carry the primary-key value, never wide payloads (no image bytes).
"""

from __future__ import annotations

import pickle
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raycontract.plans import ModelPlan

PAYLOAD_SCHEMA = pa.schema([pa.field("payload", pa.binary())])


def _is_orderable(t: pa.DataType) -> bool:
    return (
        pa.types.is_integer(t)
        or pa.types.is_floating(t)
        or pa.types.is_decimal(t)
        or pa.types.is_temporal(t)
        or pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_boolean(t)
    )


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)


class StatsKernel:
    """Callable class → Ray actor pool via ``map_batches(StatsKernel, ...)``.

    Setup (constraint grouping, sketch config) happens once per actor in
    ``__init__``; ``__call__`` does only vectorized per-batch work.
    """

    def __init__(
        self,
        plan: ModelPlan,
        max_samples: int = 20,
        profile: bool = False,
        hist_edges: Optional[dict[str, np.ndarray]] = None,
        hll_p: int = 12,
    ):
        self.plan = plan
        self.max_samples = max_samples
        self.profile = profile
        self.hist_edges = hist_edges or {}
        self.hll_p = hll_p
        self.pk = plan.pk_column
        # constraints grouped by column for locality
        self.by_column: dict[str, list] = {}
        for c in plan.constraints:
            self.by_column.setdefault(c.column, []).append(c)
        # custom kinds resolved at construction ON THE DRIVER and pickled with
        # the kernel, so the registry doesn't need to exist in workers
        from raycontract.plugins import get_check

        self.custom: dict[str, Any] = {}
        for c in plan.constraints:
            fn = get_check(c.kind)
            if fn is not None:
                self.custom[c.kind] = fn

    # -- nested access: resolve a (struct-child | list-flatten) path under a
    #    top-level column. Returns (values, parent_row_idx or None,
    #    immediate_parent_valid or None). parent_row_idx maps each value back
    #    to its top-level row (pk samples); immediate_parent_valid implements
    #    JSON-Schema `required` semantics — a child is only "missing" when its
    #    enclosing object EXISTS (ref check_jsonschema.py:87-111).
    @staticmethod
    def _resolve_path(col: pa.ChunkedArray, path: tuple):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        parent_idx: Optional[np.ndarray] = None
        parent_valid: Optional[np.ndarray] = None
        for step in path:
            if step == "[]":
                lengths = pc.list_value_length(arr).fill_null(0)
                lengths = np.asarray(lengths, dtype=np.int64)
                base = parent_idx if parent_idx is not None else np.arange(len(arr))
                parent_idx = np.repeat(base, lengths)
                arr = pc.list_flatten(arr)
                # each element's parent (the list entry) exists by construction
                parent_valid = None
            else:
                parent_valid = np.asarray(arr.is_valid())
                arr = pc.struct_field(arr, step)
        return arr, parent_idx, parent_valid

    # -- per-constraint invalid masks (NULLs are never invalid except not_null,
    #    matching soda-core's missing/invalid split, ref :164-192 vs :226-447)
    def _invalid_mask(self, kind: str, col: pa.ChunkedArray, args: tuple,
                      parent_valid: Optional[np.ndarray] = None):
        t = col.type
        if kind == "not_null":
            miss = pc.invert(col.is_valid())
            if parent_valid is not None:
                # nested required: only enforced where the enclosing struct exists
                miss = pc.and_(miss, pa.array(parent_valid))
            return miss
        if kind in ("min_length", "max_length"):
            if pa.types.is_binary(t) or pa.types.is_large_binary(t):
                lens = pc.binary_length(col)
            else:
                lens = pc.utf8_length(col)
            return pc.less(lens, args[0]) if kind == "min_length" else pc.greater(lens, args[0])
        if kind == "minimum":
            return pc.less(col, args[0])
        if kind == "maximum":
            return pc.greater(col, args[0])
        if kind == "not_equal":
            return pc.equal(col, args[0])
        if kind == "enum":
            value_set = pa.array(list(args[0]), type=t if not pa.types.is_null(t) else None)
            return pc.and_(pc.invert(pc.is_in(col, value_set=value_set)), col.is_valid())
        if kind in ("regex", "format"):
            return pc.invert(pc.match_substring_regex(col, args[0]))
        if kind in self.custom:  # plugin kinds (raycontract.plugins)
            return self.custom[kind](col, args)
        raise ValueError(f"unknown constraint kind {kind!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        partial: dict[str, Any] = {"row_count": batch.num_rows, "columns": {}, "checks": {}}
        pk_col = batch[self.pk] if (self.pk and self.pk in batch.column_names) else None

        for name in batch.column_names:
            col = batch[name]
            t = col.type
            cstats: dict[str, Any] = {"null_count": col.null_count}
            if _is_orderable(t) and batch.num_rows:
                mm = pc.min_max(col)
                cstats["min"] = mm["min"].as_py()
                cstats["max"] = mm["max"].as_py()
            if _is_numeric(t) and batch.num_rows:
                s = pc.sum(col)
                cstats["sum"] = s.as_py() if s.is_valid else 0
            if self.profile:
                self._profile_column(name, col, cstats)
            partial["columns"][name] = cstats

            resolved_cache: dict[tuple, tuple] = {}
            for spec in self.by_column.get(name, ()):
                if spec.path:
                    if spec.path not in resolved_cache:
                        resolved_cache[spec.path] = self._resolve_path(col, spec.path)
                    values, parent_idx, parent_valid = resolved_cache[spec.path]
                else:
                    values, parent_idx, parent_valid = col, None, None
                mask = self._invalid_mask(spec.kind, values, spec.args, parent_valid)
                inv = pc.sum(mask)
                inv = inv.as_py() if inv.is_valid else 0
                entry = {"invalid": int(inv or 0), "samples": []}
                if inv:
                    filled = mask.combine_chunks().fill_null(False) if isinstance(
                        mask, pa.ChunkedArray
                    ) else mask.fill_null(False)
                    idx = np.flatnonzero(np.asarray(filled))[: self.max_samples]
                    take = pa.array(idx, type=pa.int64())
                    vals = (values.take(take) if not isinstance(values, pa.ChunkedArray)
                            else values.take(take)).to_pylist()
                    if pk_col is not None:
                        rows = idx if parent_idx is None else parent_idx[idx]
                        pks = pk_col.take(pa.array(rows, type=pa.int64())).to_pylist()
                    else:
                        pks = [None] * len(idx)
                    entry["samples"] = [
                        (k, _sample_repr(v)) for k, v in zip(pks, vals)
                    ]
                partial["checks"][spec.check_key] = entry

        return pa.table({"payload": pa.array([pickle.dumps(partial)], type=pa.binary())})

    def _profile_column(self, name: str, col: pa.ChunkedArray, cstats: dict) -> None:
        from raycontract.functions.hashing import hash64
        from raycontract.functions.sketches import (
            CategoricalCounts,
            Histogram,
            HyperLogLog,
            TDigest,
        )

        t = col.type
        if pa.types.is_nested(t):
            return
        valid = col.drop_null()
        hll = HyperLogLog(self.hll_p)
        if len(valid):
            hll.add_hashed(hash64(valid))
        cstats["hll"] = hll.to_bytes()
        if _is_numeric(t):
            vals = np.asarray(pc.cast(valid, pa.float64()))
            td = TDigest()
            td.add(vals)
            cstats["tdigest"] = td.to_bytes()
            edges = self.hist_edges.get(name)
            if edges is not None:
                h = Histogram(edges)
                h.add(vals)
                cstats["hist"] = h.to_bytes()
        elif pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_boolean(t):
            cat = CategoricalCounts()
            if len(valid):
                vc = pc.value_counts(valid)
                cat.add(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
            cstats["cat"] = cat.to_bytes()


def _sample_repr(v: Any, max_len: int = 80) -> str:
    if isinstance(v, (bytes, bytearray)):
        return f"<{len(v)} bytes>"
    s = repr(v)
    return s if len(s) <= max_len else s[: max_len - 1] + "…"


def merge_partials(payloads: list[bytes], max_samples: int = 20) -> dict[str, Any]:
    """Driver-side fold of the per-batch partials (tiny; O(blocks)).

    ``max_samples`` caps merged violation samples per check — threaded from
    the CLI's ``--max-errors`` (≅ the reference's DATACONTRACT_MAX_ERRORS
    convention), not a hardcoded literal.

    Accepts raw pickled partials (bytes) OR already-merged dicts (its own
    output), so callers can fold incrementally: the merged dict is itself a
    valid partial (sketch values may be live objects — handled below).
    """
    from raycontract.functions.sketches import (
        CategoricalCounts,
        Histogram,
        HyperLogLog,
        TDigest,
    )

    merged: dict[str, Any] = {"row_count": 0, "columns": {}, "checks": {}}
    sketches: dict[tuple, Any] = {}
    for raw in payloads:
        p = pickle.loads(raw) if isinstance(raw, (bytes, bytearray)) else raw
        merged["row_count"] += p["row_count"]
        for col, cs in p["columns"].items():
            m = merged["columns"].setdefault(
                col, {"null_count": 0, "min": None, "max": None, "sum": None}
            )
            m["null_count"] += cs.get("null_count", 0)
            if cs.get("min") is not None and (m["min"] is None or cs["min"] < m["min"]):
                m["min"] = cs["min"]
            if cs.get("max") is not None and (m["max"] is None or cs["max"] > m["max"]):
                m["max"] = cs["max"]
            if cs.get("sum") is not None:
                m["sum"] = cs["sum"] if m["sum"] is None else m["sum"] + cs["sum"]
            for skey, cls in (("hll", HyperLogLog), ("tdigest", TDigest), ("hist", Histogram),
                              ("cat", CategoricalCounts)):
                if skey in cs and cs[skey] is not None:
                    v = cs[skey]
                    # accepts raw bytes (worker partials) or already-merged
                    # sketch objects (re-merging shard-level partials)
                    sk = v if isinstance(v, cls) else cls.from_bytes(v)
                    k = (col, skey)
                    sketches[k] = sk if k not in sketches else sketches[k].merge(sk)
        for key, e in p["checks"].items():
            m = merged["checks"].setdefault(key, {"invalid": 0, "samples": []})
            m["invalid"] += e["invalid"]
            if len(m["samples"]) < max_samples:
                m["samples"].extend(e["samples"][: max_samples - len(m["samples"])])
    for (col, skey), sk in sketches.items():
        merged["columns"][col][skey] = sk
    return merged


def run_stats_pass(
    ds,
    plan: ModelPlan,
    max_samples: int = 20,
    profile: bool = False,
    hist_edges: Optional[dict[str, np.ndarray]] = None,
    batch_size: Optional[int] = None,
    concurrency: Optional[int] = None,
) -> dict[str, Any]:
    """Execute the stats pass on a Dataset and return the merged partial.

    The result dataset is ~1 row per input block (bytes each), so
    ``take_all`` here is a reduced aggregate, not a materialization of data.
    """
    kwargs: dict[str, Any] = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    if concurrency is not None:
        kwargs["concurrency"] = concurrency
    stats_ds = ds.map_batches(
        StatsKernel(plan, max_samples=max_samples, profile=profile, hist_edges=hist_edges),
        **kwargs,
    )
    rows = stats_ds.take_all()
    return merge_partials([r["payload"] for r in rows], max_samples=max_samples)
