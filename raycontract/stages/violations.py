"""Full violation-row extraction (uncapped, streaming).

The validation pass keeps only capped per-check samples (the reference's
DATACONTRACT_MAX_ERRORS convention). When every violating row is needed —
quarantine lists, reprocessing queues — this dedicated pass re-evaluates the
constraint masks per batch and EMITS the violating rows as data:
``(check_key, pk, value)``, streamed straight to partitioned Parquet, never
materialized on the driver. Row payloads are never copied — only the pk and
a bounded value repr leave the scan (wide/binary values are summarized).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from raycontract.plans import ModelPlan
from raycontract.stages.stats import StatsKernel, _sample_repr


class ViolationExtractor(StatsKernel):
    """Reuses StatsKernel's vectorized invalid-mask evaluation (built-in +
    plugin kinds) but outputs one row per violation instead of counters."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        pk_col = batch[self.pk] if (self.pk and self.pk in batch.column_names) else None
        keys: list[str] = []
        pks: list[Optional[str]] = []
        values: list[Optional[str]] = []
        for name in batch.column_names:
            specs = self.by_column.get(name)
            if not specs:
                continue
            col = batch[name]
            resolved: dict[tuple, tuple] = {}
            for spec in specs:
                if spec.path:  # nested constraint: struct child / list items
                    if spec.path not in resolved:
                        resolved[spec.path] = self._resolve_path(col, spec.path)
                    vcol, parent_idx, parent_valid = resolved[spec.path]
                else:
                    vcol, parent_idx, parent_valid = col, None, None
                mask = self._invalid_mask(spec.kind, vcol, spec.args, parent_valid)
                filled = mask.combine_chunks().fill_null(False) if isinstance(
                    mask, pa.ChunkedArray) else mask.fill_null(False)
                idx = np.flatnonzero(np.asarray(filled))
                if idx.size == 0:
                    continue
                take = pa.array(idx, type=pa.int64())
                vals = vcol.take(take).to_pylist()
                rows = idx if parent_idx is None else parent_idx[idx]
                pkvals = (pk_col.take(pa.array(rows, type=pa.int64())).to_pylist()
                          if pk_col is not None else [None] * idx.size)
                keys.extend([spec.check_key] * idx.size)
                pks.extend(str(p) if p is not None else None for p in pkvals)
                values.extend(_sample_repr(v) for v in vals)
        return pa.table({
            "check_key": pa.array(keys, type=pa.string()),
            "pk": pa.array(pks, type=pa.string()),
            "value": pa.array(values, type=pa.string()),
        })


def extract_violations(ds, plan: ModelPlan, out_dir: Optional[str] = None,
                       batch_size: Optional[int] = None):
    """Streaming violation rows for all of ``plan.constraints``.

    Returns the (lazy) Dataset; when ``out_dir`` is given, writes partitioned
    Parquet there (the preferred sink at scale) and returns the row count.
    """
    cols = plan.scan_columns()
    kwargs = {"batch_format": "pyarrow"}
    if batch_size:
        kwargs["batch_size"] = batch_size
    out = ds.select_columns(cols or None).map_batches(
        ViolationExtractor(plan), **kwargs)
    if out_dir is not None:
        out.write_parquet(out_dir)
        import ray.data as rd

        return rd.read_parquet(out_dir).count()
    return out


class CleanFilter(StatsKernel):
    """Row filter: keep only rows that violate NO constraint — the
    training-data sink ('drop everything the contract flags'). A row with a
    nested list violation is dirty as a whole (element masks map back to
    their top-level row through the list offsets)."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        bad = np.zeros(batch.num_rows, dtype=bool)
        for name in batch.column_names:
            specs = self.by_column.get(name)
            if not specs:
                continue
            col = batch[name]
            resolved: dict[tuple, tuple] = {}
            for spec in specs:
                if spec.path:
                    if spec.path not in resolved:
                        resolved[spec.path] = self._resolve_path(col, spec.path)
                    vcol, parent_idx, parent_valid = resolved[spec.path]
                else:
                    vcol, parent_idx, parent_valid = col, None, None
                mask = self._invalid_mask(spec.kind, vcol, spec.args, parent_valid)
                filled = mask.combine_chunks().fill_null(False) if isinstance(
                    mask, pa.ChunkedArray) else mask.fill_null(False)
                idx = np.flatnonzero(np.asarray(filled))
                if idx.size == 0:
                    continue
                bad[idx if parent_idx is None else parent_idx[idx]] = True
        return batch.filter(pa.array(~bad))


def extract_clean(ds, plan: ModelPlan, out_dir: Optional[str] = None,
                  batch_size: Optional[int] = None,
                  partition_cols: Optional[list] = None):
    """Full rows passing EVERY constraint (inverse of
    :func:`extract_violations`) — streamed, never materialized; the natural
    'contract-validated training set' sink. Returns the lazy Dataset, or the
    kept-row count when ``out_dir`` is given. ``partition_cols`` writes
    hive-partitioned Parquet (one ``col=value/`` directory per key) so a
    resumed or downstream job can prune whole partitions at the read."""
    kwargs = {"batch_format": "pyarrow"}
    if batch_size:
        kwargs["batch_size"] = batch_size
    out = ds.map_batches(CleanFilter(plan), **kwargs)
    if out_dir is not None:
        import ray.data as rd

        if partition_cols:
            out.write_parquet(out_dir, partition_cols=list(partition_cols))
        else:
            out.write_parquet(out_dir)
        return rd.read_parquet(out_dir).count()
    return out
