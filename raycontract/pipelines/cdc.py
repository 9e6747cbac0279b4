"""CDC-style snapshot compaction: keep the LATEST full row per key.

The lakehouse "upsert compaction" primitive (Delta/Hudi/Iceberg merge-on-read
readers do exactly this): given an append-only change stream, materialize the
current snapshot — for every key the one row with the greatest
``(ts, tiebreak)`` order. Differs from ``groupstats.first_last_by`` in that
it returns WHOLE ROWS (every column), not per-group aggregates, so the
result is a dataset you keep processing.

Scale shape (no row shuffle, two streaming passes):
 1. per-block arg-max per key — ONE lexsort + run-boundary mask (no
    per-key Python) — emitting ``(key, packed(ts, tiebreak))`` partials,
    bounded by keys × blocks; folded by the adaptive ``smallagg`` grouped
    max (polars on the driver when tiny, distributed groupby beyond 2M).
 2. the winning tiebreak ids (unique row ids by construction) are
    broadcast ONCE via ``ray.put`` as a sorted int64 array and a second
    vectorized pass keeps matching rows — rows never move between workers.
    Beyond ``max_broadcast`` winners the id set no longer fits one object;
    partition the input by key hash and run per-shard (the
    ``pipelines.partition`` exchange) — this function raises loudly there
    rather than silently degrading.

Reference semantics anchor: the reference validates "latest record wins"
datasets only after the warehouse compacted them (soda checks run on the
table — /root/reference/datacontract/engines/data_contract_test.py); here
compaction itself is a first-class streaming operator.

Oracle: ``QUALIFY row_number() OVER (PARTITION BY key ORDER BY ts DESC,
tiebreak DESC) = 1``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from raycontract.pipelines.groupstats import _pack_be, _ts_us, _unpack_be
from raycontract.pipelines.smallagg import groupby_agg


def latest_snapshot(ds, key_col: str, ts_col: str, tiebreak_col: str,
                    max_broadcast: int = 2_000_000):
    """Keep, for every ``key_col`` value (null keys form their own SQL-style
    partition), the single row with the greatest ``(ts_col, tiebreak_col)``
    — the current CDC snapshot. ``tiebreak_col`` must be a unique
    non-negative int64 row id (it both breaks ts ties and names the winning
    row); ``ts_col`` must be non-negative (epoch timestamps are), and null
    ts order below every real ts (DuckDB ``ORDER BY ts DESC`` NULLS-LAST
    semantics) via a 0 fill.

    Returns a Dataset with the input's full schema, one row per key.
    """
    def argmax_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"gn": pa.array([], pa.bool_()),
                             "g": pa.array([], pa.int64()),
                             "p": pa.array([], pa.binary())})
        gn = np.asarray(pc.is_null(batch[key_col]))
        g = np.asarray(pc.fill_null(pc.cast(batch[key_col], pa.int64()), 0))
        ts = np.asarray(pc.fill_null(pc.cast(batch[ts_col],
                                             pa.timestamp("us")), 0)
                        ).astype("datetime64[us]").view(np.int64)
        tb = np.asarray(pc.cast(batch[tiebreak_col], pa.int64()))
        order = np.lexsort((tb, ts, g, gn))
        gs, gns = g[order], gn[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], (gs[1:] != gs[:-1]) | (gns[1:] != gns[:-1]))))
        ends = np.concatenate((starts[1:], [len(gs)])) - 1
        last_i = order[ends]
        return pa.table({"gn": pa.array(gns[starts]),
                         "g": pa.array(gs[starts]),
                         "p": _pack_be(ts[last_i], tb[last_i])})

    partials = ds.select_columns([key_col, ts_col, tiebreak_col]).map_batches(
        argmax_partial, batch_format="pyarrow")
    tabs = [pa.table(t) for t in ray.get(
        groupby_agg(partials, ["gn", "g"], {"p": "max"}).to_arrow_refs())
        if t.num_rows]
    if not tabs:
        return ds.limit(0)
    folded = pa.concat_tables(tabs)
    if folded.num_rows > max_broadcast:
        raise ValueError(
            f"{folded.num_rows} keys exceed max_broadcast={max_broadcast}; "
            "hash-partition by key and run latest_snapshot per shard "
            "(pipelines.partition) at this cardinality")
    winners = np.sort(_unpack_be(folded["p"], 2)[1])
    win_ref = ray.put(winners)

    def keep(batch: pa.Table, _ref=win_ref) -> pa.Table:
        win = ray.get(_ref)
        if batch.num_rows == 0:
            return batch
        tb = np.asarray(pc.cast(batch[tiebreak_col], pa.int64()))
        pos = np.searchsorted(win, tb)
        pos_c = np.minimum(pos, len(win) - 1)
        return batch.filter(pa.array(win[pos_c] == tb))

    return ds.map_batches(keep, batch_format="pyarrow")
