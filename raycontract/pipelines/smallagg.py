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


def groupby_sum(partials_ds, keys: Sequence[str], sum_cols: Sequence[str],
                driver_limit: int = 2_000_000):
    """``SELECT keys, sum(c) AS c ... GROUP BY keys`` over a partials
    Dataset. Returns a (small) Dataset with columns ``[*keys, *sum_cols]``.

    The partials are fetched block by block; if the cumulative row count
    exceeds ``driver_limit`` the already-fetched work is abandoned and the
    reduce runs as a distributed groupby over the SAME materialized blocks
    (no re-scan of the input).
    """
    import polars as pl

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    keys, sum_cols = list(keys), list(sum_cols)
    refs = partials_ds.to_arrow_refs()
    tables: list[pa.Table] = []
    total = 0
    for r in refs:
        t = pa.table(ray.get(r))
        if t.num_rows == 0:
            continue
        total += t.num_rows
        if total > driver_limit:
            agg = rd.from_arrow_refs(refs).groupby(keys).aggregate(
                *[Sum(c, alias_name=c) for c in sum_cols])
            return agg
        tables.append(t)
    if not tables:
        return rd.from_arrow_refs(refs)  # empty, schema preserved
    merged = (pl.from_arrow(pa.concat_tables(tables, promote_options="default"))
              .group_by(keys)
              .agg([pl.col(c).sum().alias(c) for c in sum_cols])
              .to_arrow())
    # polars → arrow can widen string to large_string; restore input types
    schema = tables[0].schema
    out = pa.table({c: merged[c].cast(schema.field(c).type)
                    for c in keys + sum_cols})
    return rd.from_arrow(out)


def groupby_min(partials_ds, keys: Sequence[str], min_cols: Sequence[str],
                driver_limit: int = 2_000_000):
    """``SELECT keys, min(c) ... GROUP BY keys`` with the same adaptive
    shape as :func:`groupby_sum`: driver polars fold below ``driver_limit``
    partial rows (Ray's sort-based groupby costs seconds of fixed machinery
    on tiny inputs), distributed groupby over the same materialized blocks
    beyond."""
    import polars as pl

    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    keys, min_cols = list(keys), list(min_cols)
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
                *[Min(c, alias_name=c) for c in min_cols])
        tables.append(t)
    if not tables:
        return rd.from_arrow_refs(refs)
    merged = (pl.from_arrow(pa.concat_tables(tables, promote_options="default"))
              .group_by(keys)
              .agg([pl.col(c).min().alias(c) for c in min_cols])
              .to_arrow())
    schema = tables[0].schema
    out = pa.table({c: merged[c].cast(schema.field(c).type)
                    for c in keys + min_cols})
    return rd.from_arrow(out)
