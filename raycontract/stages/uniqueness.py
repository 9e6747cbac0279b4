"""Exact uniqueness / duplicate detection (SURVEY.md §2a #4).

Semantics ≅ the reference's ``duplicate_count(col) = 0`` check
(``engines/data_contract_checks.py:195-223``, soda-core convention: NULLs are
excluded; ``duplicate_values`` = number of distinct values occurring more than
once, ``duplicate_rows`` = excess rows).

Scale design — the shuffle moves (value, partial_count) pairs, NOT rows:
1. per-batch ``value_counts`` inside ``map_batches`` (vectorized Arrow kernel)
   → at most one row per distinct value per block;
2. ``groupby(value).sum(partial_count)`` — all-to-all, but shuffle volume is
   bounded by Σ per-block distinct values, so heavily-duplicated (skewed)
   columns shuffle a tiny fraction of the data;
3. filter ``count > 1`` → duplicate stats + capped sample values.

For binary / very wide values (image bytes), ``by_content_hash`` groups on a
64-bit content hash instead of the value itself (phash-bucketed exact
uniqueness per BASELINE.json north_star): the shuffle then moves 8-byte keys.
A hash collision could flag a false duplicate (2^-64·pairs probability); the
check records the convention in its diagnostics.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum


def _partial_counts_fn(column: str, by_content_hash: bool):
    if by_content_hash:
        def partial(batch: pa.Table) -> pa.Table:
            from raycontract.functions.hashing import hash64

            col = batch[column].drop_null()
            if len(col) == 0:
                return pa.table({"_k": pa.array([], type=pa.int64()),
                                 "_cnt": pa.array([], type=pa.int64())})
            # int64 view — Ray groupby boundaries don't survive uint64 > 2^63
            keys = pa.array(hash64(col).view(np.int64))
            vc = pc.value_counts(keys)
            return pa.table({"_k": vc.field("values"), "_cnt": vc.field("counts")})
        return partial

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column].drop_null()
        vc = pc.value_counts(col)
        return pa.table({"_k": vc.field("values"), "_cnt": vc.field("counts")})

    return partial


def duplicate_stats(
    ds,
    column: str,
    by_content_hash: bool = False,
    max_samples: int = 20,
    driver_fold_limit: int = 4_000_000,
) -> dict[str, Any]:
    """Returns {'duplicate_values', 'duplicate_rows', 'distinct_count', 'samples'}.

    Adaptive reduce (same rationale as stages/fused.py): per-block distinct
    partials below ``driver_fold_limit`` rows fold on the driver with one
    polars groupby (Ray's sort-based groupby costs seconds of fixed overhead
    per million tiny rows); larger inputs use the distributed groupby.
    """
    partials = ds.select_columns([column]).map_batches(
        _partial_counts_fn(column, by_content_hash), batch_format="pyarrow"
    )
    try:
        input_rows = ds.count()  # metadata-only for plain reads
    except Exception:
        input_rows = None
    if input_rows is not None and input_rows <= driver_fold_limit:
        return _driver_dup_fold(partials, max_samples, by_content_hash)
    agg = partials.groupby("_k").aggregate(Sum("_cnt", alias_name="cnt"))
    # Per-key totals: distinct count + duplicate stats in one tiny second pass.
    def summarize(batch: pa.Table) -> pa.Table:
        cnt = batch["cnt"]
        dup_mask = pc.greater(cnt, 1)
        dup_cnt = pc.sum(pc.filter(cnt, dup_mask))
        n_dup_vals = pc.sum(pc.cast(dup_mask, pa.int64()))
        sample_keys = batch["_k"].filter(dup_mask)[:max_samples].to_pylist()
        import pickle

        payload = pickle.dumps({
            "distinct": batch.num_rows,
            "dup_values": int(n_dup_vals.as_py() or 0),
            "dup_rows": int((dup_cnt.as_py() or 0)) - int(n_dup_vals.as_py() or 0),
            "samples": sample_keys,
        })
        return pa.table({"payload": pa.array([payload], type=pa.binary())})

    rows = agg.map_batches(summarize, batch_format="pyarrow").take_all()
    import pickle

    out = {"distinct_count": 0, "duplicate_values": 0, "duplicate_rows": 0, "samples": []}
    for r in rows:
        p = pickle.loads(r["payload"])
        out["distinct_count"] += p["distinct"]
        out["duplicate_values"] += p["dup_values"]
        out["duplicate_rows"] += p["dup_rows"]
        if len(out["samples"]) < max_samples:
            out["samples"].extend(p["samples"][: max_samples - len(out["samples"])])
    out["by_content_hash"] = by_content_hash
    return out


def _driver_dup_fold(partials, max_samples: int, by_content_hash: bool) -> dict[str, Any]:
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

    import ray

    tables = [pa.table(t) for t in ray.get(partials.to_arrow_refs()) if t.num_rows]
    if not tables:
        return {"distinct_count": 0, "duplicate_values": 0, "duplicate_rows": 0,
                "samples": [], "by_content_hash": by_content_hash}
    df = pl.from_arrow(pa.concat_tables(tables))
    agg = df.group_by("_k").agg(pl.col("_cnt").sum().alias("cnt"))
    dups = agg.filter(pl.col("cnt") > 1)
    return {
        "distinct_count": agg.height,
        "duplicate_values": dups.height,
        "duplicate_rows": int(dups["cnt"].sum() or 0) - dups.height,
        "samples": dups["_k"].head(max_samples).to_list(),
        "by_content_hash": by_content_hash,
    }


def exact_distinct_count(ds, column: str) -> int:
    """Exact distinct (NULLs excluded) via the same two-stage shuffle."""
    return duplicate_stats(ds, column)["distinct_count"]


def approx_distinct_count(ds, column: str, p: int = 12) -> float:
    """HLL approximate distinct — shuffle-free: one mergeable sketch per block,
    merged on the driver (SURVEY.md §2e 'Distinct counts: HLL')."""
    import pickle

    def sketch(batch: pa.Table) -> pa.Table:
        from raycontract.functions.hashing import hash64
        from raycontract.functions.sketches import HyperLogLog

        hll = HyperLogLog(p)
        col = batch[column].drop_null()
        if len(col):
            hll.add_hashed(hash64(col))
        return pa.table({"payload": pa.array([pickle.dumps(hll.to_bytes())], type=pa.binary())})

    from raycontract.functions.sketches import HyperLogLog

    rows = ds.select_columns([column]).map_batches(sketch, batch_format="pyarrow").take_all()
    merged: Optional[HyperLogLog] = None
    for r in rows:
        hll = HyperLogLog.from_bytes(pickle.loads(r["payload"]))
        merged = hll if merged is None else merged.merge(hll)
    return merged.estimate() if merged is not None else 0.0
