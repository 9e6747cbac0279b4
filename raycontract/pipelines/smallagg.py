"""Adaptive grouped-sum reduce for PRE-AGGREGATED partials.

Every grouped-aggregate pipeline here pre-aggregates inside ``map_batches``
(one row per (key, block)), so the reduce input is bounded by
``groups × blocks`` — usually thousands of rows. Ray's sort-based
``groupby().aggregate()`` pays seconds of fixed shuffle machinery at that
size (measured 2.2-4.2 s per query at sf0.1; the same finding drove
``stages/fused.py``'s duplicate reduce and ``stages/uniqueness.py``'s driver
fold). This helper folds small partial sets with ONE polars group_by on the
driver and falls back to the distributed groupby — Ray's hierarchical
shuffle with spilling, the right machinery at 10^12-row scale where the
partial set itself is big — beyond ``driver_limit`` rows.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa


def groupby_agg(partials_ds, keys: Sequence[str],
                agg_spec: dict[str, str], driver_limit: int = 2_000_000):
    """``SELECT keys, op(c) AS c ... GROUP BY keys`` over a partials Dataset
    for ``agg_spec = {column: "sum"|"min"|"max"}`` — ONE adaptive fold for
    any mix of ops (so multi-stat profiles need no joins; polars group_by
    keys NULL group values like SQL).

    The partials are fetched block by block; if the cumulative row count
    exceeds ``driver_limit`` the already-fetched work is abandoned and the
    reduce runs as a distributed groupby over the SAME materialized blocks
    (no re-scan of the input).
    """
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    keys = list(keys)
    _RAY_OPS = {"sum": Sum, "min": Min, "max": Max}
    _PL_OPS = {"sum": lambda c: pl.col(c).sum(),
               "min": lambda c: pl.col(c).min(),
               "max": lambda c: pl.col(c).max()}
    for c, op in agg_spec.items():
        if op not in _RAY_OPS:
            raise ValueError(f"unsupported op {op!r} for column {c!r}")
    refs = partials_ds.to_arrow_refs()
    tables: list[pa.Table] = []
    total = 0
    for r in refs:
        t = pa.table(ray.get(r))
        if t.num_rows == 0:
            continue
        total += t.num_rows
        if total > driver_limit:
            return rd.from_arrow_refs(refs).groupby(keys).aggregate(
                *[_RAY_OPS[op](c, alias_name=c) for c, op in agg_spec.items()])
        tables.append(t)
    if not tables:
        return rd.from_arrow_refs(refs)  # empty, schema preserved
    merged = (pl.from_arrow(pa.concat_tables(tables, promote_options="default"))
              .group_by(keys)
              .agg([_PL_OPS[op](c).alias(c) for c, op in agg_spec.items()])
              .to_arrow())
    # polars -> arrow can widen string to large_string; restore input types
    schema = tables[0].schema
    out = pa.table({c: merged[c].cast(schema.field(c).type)
                    for c in keys + list(agg_spec)})
    return rd.from_arrow(out)


def groupby_sum(partials_ds, keys: Sequence[str], sum_cols: Sequence[str],
                driver_limit: int = 2_000_000):
    """``SELECT keys, sum(c) ... GROUP BY keys`` (see :func:`groupby_agg`)."""
    return groupby_agg(partials_ds, keys, {c: "sum" for c in sum_cols},
                       driver_limit)


def groupby_min(partials_ds, keys: Sequence[str], min_cols: Sequence[str],
                driver_limit: int = 2_000_000):
    """``SELECT keys, min(c) ... GROUP BY keys`` (see :func:`groupby_agg`)."""
    return groupby_agg(partials_ds, keys, {c: "min" for c in min_cols},
                       driver_limit)
