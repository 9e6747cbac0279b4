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
    ts orders strictly below every real ts — including epoch 0 — (DuckDB
    ``ORDER BY ts DESC`` NULLS-LAST semantics) via a ts+1/null→0 packing.

    Returns a Dataset with the input's full schema, one row per key.
    """
    def argmax_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"gn": pa.array([], pa.bool_()),
                             "g": pa.array([], pa.int64()),
                             "p": pa.array([], pa.binary())})
        gn = np.asarray(pc.is_null(batch[key_col]))
        g = np.asarray(pc.fill_null(pc.cast(batch[key_col], pa.int64()), 0))
        # pack ts+1 (null → 0) so a null ts ranks BELOW a real ts of
        # exactly epoch 0 (DuckDB ORDER BY ts DESC nulls-last), never ties
        isn = np.asarray(pc.is_null(batch[ts_col]))
        ts = np.asarray(pc.fill_null(pc.cast(batch[ts_col],
                                             pa.timestamp("us")), 0)
                        ).astype("datetime64[us]").view(np.int64)
        ts = np.where(isn, np.int64(0), ts + 1)
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


def _row_hash_u32(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Per-row content hash, evaluated in EMBEDDED DuckDB with the exact
    expression :func:`row_hash_sql` emits — so a distributed diff agrees
    with its SQL oracle by construction (the ``functions/strhash.py``
    pattern). NULLs map to chr(1), fields join on chr(31)."""
    from raycontract.functions import strhash

    if strhash._duckdb is None:  # pragma: no cover - env without duckdb
        raise ImportError(
            "snapshot_diff_counts requires duckdb for oracle-identical row "
            "hashing (CAST(DOUBLE AS VARCHAR) formatting is not "
            "reproducible in pure Python)")
    _connection = strhash._connection
    tbl = batch.select(cols)  # noqa: F841 — duckdb reads it by name
    expr = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(1))" for c in cols)
    out = _connection().execute(
        f"SELECT md5_number_lower(concat_ws(chr(31), {expr})) % {1 << 32} "
        f"AS h FROM tbl").arrow()["h"]
    out = out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out
    return np.asarray(out.cast(pa.int64()))


def row_hash_sql(cols: list[str]) -> str:
    """The DuckDB expression reproducing :func:`_row_hash_u32`."""
    expr = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(1))" for c in cols)
    return f"(md5_number_lower(concat_ws(chr(31), {expr})) % {1 << 32})"


def snapshot_diff_counts(ds_a, ds_b, key_col: str, cols: list[str]):
    """Data-level diff between two snapshots of a keyed table — the CDC
    audit that complements the repo's SPEC diff (``breaking.py``): how many
    rows were added / removed / changed / unchanged between version A and
    version B. Keys must be unique per side (primary keys); "changed"
    compares the DuckDB-reproducible content hash of ``cols``.

    Scale shape: each side emits ONE slim ``(key, n_side, h_side)`` row per
    key per block (hashing runs vectorized in embedded DuckDB per batch);
    one adaptive grouped fold joins the sides by key (driver polars ≤2M
    keys, Ray's hierarchical shuffle beyond) and the classification is a
    per-block tally over the folded key table — the key set never
    materializes on the driver (one 7-int row per block + a tiny fold).

    Output: one row ``(n_a, n_b, n_added, n_removed, n_changed,
    n_unchanged)``.
    """
    def side(tag_a: bool):
        def partial(batch: pa.Table) -> pa.Table:
            k = np.asarray(pc.cast(batch[key_col], pa.int64()))
            h = _row_hash_u32(batch, cols)
            z = np.zeros(len(k), np.int64)
            one = np.ones(len(k), np.int64)
            return pa.table({"k": pa.array(k),
                             "na": pa.array(one if tag_a else z),
                             "nb": pa.array(z if tag_a else one),
                             "ha": pa.array(h if tag_a else z),
                             "hb": pa.array(z if tag_a else h)})
        return partial

    proj_cols = [key_col] + [c for c in cols if c != key_col]
    pa_ds = ds_a.select_columns(proj_cols).map_batches(
        side(True), batch_format="pyarrow")
    pb_ds = ds_b.select_columns(proj_cols).map_batches(
        side(False), batch_format="pyarrow")
    folded_ds = groupby_agg(pa_ds.union(pb_ds), ["k"],
                            {"na": "sum", "nb": "sum",
                             "ha": "max", "hb": "max"})

    def classify(batch: pa.Table) -> pa.Table:
        """Per-block class tallies over the folded key table — the key set
        itself never lands on the driver (only one 7-int row per block)."""
        na = np.asarray(batch["na"], np.int64)
        nb = np.asarray(batch["nb"], np.int64)
        ha = np.asarray(batch["ha"], np.int64)
        hb = np.asarray(batch["hb"], np.int64)
        if (na > 1).any() or (nb > 1).any():
            raise ValueError(
                f"{key_col} is not unique within a snapshot; "
                "snapshot_diff_counts requires per-side pk keys")
        both = (na > 0) & (nb > 0)
        return pa.table({
            "k": pa.array([1], pa.int64()),
            "n_a": pa.array([int(na.sum())], pa.int64()),
            "n_b": pa.array([int(nb.sum())], pa.int64()),
            "n_added": pa.array([int(((na == 0) & (nb > 0)).sum())],
                                pa.int64()),
            "n_removed": pa.array([int(((na > 0) & (nb == 0)).sum())],
                                  pa.int64()),
            "n_changed": pa.array([int((both & (ha != hb)).sum())],
                                  pa.int64()),
            "n_unchanged": pa.array([int((both & (ha == hb)).sum())],
                                    pa.int64()),
        })

    out_cols = ["n_a", "n_b", "n_added", "n_removed", "n_changed",
                "n_unchanged"]  # NOT `cols`: the side() closures capture it
    tabs = [pa.table(t) for t in ray.get(
        groupby_agg(folded_ds.map_batches(classify, batch_format="pyarrow"),
                    ["k"], {c: "sum" for c in out_cols}).to_arrow_refs())
        if t.num_rows]
    if not tabs:
        z = pa.array([0], pa.int64())
        return pa.table({c: z for c in out_cols})
    f = pa.concat_tables(tabs)
    return pa.table({c: f[c].cast(pa.int64()) for c in out_cols})
