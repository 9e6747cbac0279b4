"""Distributed join operators Ray Data does not ship: as-of join, range
(interval) join, and a broadcast hash join for star-schema lookups.

The reference executes no joins at all (referential integrity is a TODO,
``datacontract/engines/data_contract_checks.py:62``); these are the
training-data-pipeline extensions — event enrichment (as-of), band
classification (range), dimension attach (broadcast) — expressed
Ray-Data-first:

- **as-of**: one hash shuffle co-locates each key's rows from both sides
  (``groupby(key).map_groups``), then a vectorized sorted-merge
  (``np.searchsorted``) inside each group. Partitioning assumption: a single
  key's rows fit in one worker (the classic skew caveat — salt hot keys
  upstream if a key exceeds worker memory).
- **range**: the interval table is broadcast once (``ray.put``) and every
  batch classifies with one ``np.searchsorted`` — no shuffle at all. Bounded
  to sorted non-overlapping intervals (the classification use-case);
  overlapping intervals raise.
- **broadcast hash**: the small side is broadcast once and each batch joins
  zero-copy with ``pyarrow.Table.join`` — the scale shape for dimension
  tables (never re-shipped per batch, never an all-to-all shuffle).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def asof_join(left_ds, right_ds, on, left_ts: str, right_ts: str,
              right_cols: Sequence[str], direction: str = "backward",
              suffix: str = "_r", num_partitions: Optional[int] = None):
    """For every left row, attach the single right row with the same ``on``
    key and the greatest ``right_ts`` <= ``left_ts`` (``direction='backward'``;
    ``'forward'`` = smallest >=). Inner semantics: unmatched left rows drop
    (DuckDB ``ASOF JOIN`` equivalent). Ties on ``right_ts`` within a key are
    broken deterministically by the first ``right_cols`` entry (backward
    keeps its largest value, forward its smallest) where SQL leaves the
    winner unspecified. Right columns clashing with left names get
    ``suffix``. Rows with a NULL timestamp or NULL key match nothing (SQL
    comparison semantics) and are dropped before the shuffle.

    Scale shape (10^9 keys): both sides are HASH-PARTITIONED on the key
    (``pipelines/partition.py``) and merged once per PARTITION — one
    ``np.lexsort`` by (key, ts, side, tie) over the union, then a single
    segment-aware ``np.maximum.accumulate`` scan matches every left row in
    the partition to its as-of right row at once (no per-key Python call,
    no per-key ``searchsorted``). ``direction='forward'`` reuses the same
    scan on negated time + tie rank. Partitioning assumption: one partition
    fits a worker's heap — size ``num_partitions`` to volume.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    from raycontract.pipelines.partition import (default_num_partitions,
                                                 key_codes, partition_map)

    lkey, rkey = (on, on) if isinstance(on, str) else on
    left_cols = list(left_ds.schema().names)
    rcols = list(right_cols)
    out_names = {c: (c + suffix if c in left_cols else c) for c in rcols}
    P = num_partitions or default_num_partitions()

    # resolve column types once on the driver (schema-only, no scan)
    lschema, rschema = left_ds.schema(), right_ds.schema()
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in left_cols}
    rtypes = {c: rschema.types[rschema.names.index(c)] for c in rcols}

    def _tag(batch: pa.Table, side: int) -> pa.Table:
        key_c, ts_c = (lkey, left_ts) if side == 0 else (rkey, right_ts)
        batch = batch.filter(pc.and_(pc.is_valid(batch[key_c]),
                                     pc.is_valid(batch[ts_c])))
        n = batch.num_rows
        out = {"__key": batch[key_c],
               "__ts": pc.cast(batch[ts_c], pa.int64()),
               "__side": pa.array(np.full(n, side, dtype=np.int8))}
        for c in left_cols:
            out[f"__l_{c}"] = batch[c] if side == 0 else pa.nulls(n, ltypes[c])
        for c in rcols:
            out[f"__r_{c}"] = batch[c] if side == 1 else pa.nulls(n, rtypes[c])
        return pa.table(out)

    tagged = (left_ds.map_batches(lambda b: _tag(b, 0), batch_format="pyarrow")
              .union(right_ds.select_columns(list(dict.fromkeys([rkey, right_ts, *rcols])))
                     .map_batches(lambda b: _tag(b, 1), batch_format="pyarrow")))

    fwd = direction == "forward"

    def merge_partition(part: pa.Table) -> pa.Table:
        def emit(keep: pa.Table, matched: Optional[pa.Table]) -> pa.Table:
            out = {c: keep[f"__l_{c}"] for c in left_cols}
            for c in rcols:
                out[out_names[c]] = (matched[f"__r_{c}"] if matched is not None
                                     else pa.nulls(keep.num_rows, rtypes[c]))
            return pa.table(out)

        side = np.asarray(part["__side"], dtype=np.int8)
        is_right = side == 1
        if not is_right.any() or is_right.all():
            return emit(part.filter(pa.array(~is_right)).slice(0, 0), None)
        n = part.num_rows
        kc = key_codes(part["__key"])
        ts = np.asarray(part["__ts"], dtype=np.int64)
        # deterministic tie-break among equal (key, ts) right rows: value
        # rank of the first right column (null-safe for any type). backward
        # keeps the LARGEST value; forward (smallest >= and smallest tie) is
        # exactly the backward scan on negated (ts, tie).
        if rcols:
            tc = part[f"__r_{rcols[0]}"].combine_chunks()
            tie = np.asarray(pc.rank(tc, sort_keys="ascending",
                                     null_placement="at_start"),
                             dtype=np.int64)
        else:
            tie = np.zeros(n, dtype=np.int64)
        if fwd:
            ts = -ts
            tie = -tie
        # total order: key, ts, right-before-left at equal ts (a right row
        # at ts == lts is eligible), tie ascending (accumulate keeps LAST)
        side_order = np.where(is_right, 0, 1).astype(np.int8)
        order = np.lexsort((tie, side_order, ts, kc))
        kc_s = kc[order]
        right_s = is_right[order]
        # per-key segments; base offsets make cross-segment carryover read
        # as "no match": prev segment max == base - 1 → -1 after the shift
        seg = np.zeros(n, dtype=np.int64)
        seg[1:] = np.cumsum(kc_s[1:] != kc_s[:-1])
        base = seg * np.int64(n + 1)
        cand = np.where(right_s, np.arange(n, dtype=np.int64), np.int64(-1)) + base
        last_right = np.maximum.accumulate(cand) - base
        lpos = np.flatnonzero(~right_s)
        match = last_right[lpos]
        ok = match >= 0
        left_orig = order[lpos[ok]]
        right_orig = order[match[ok]]
        return emit(part.take(pa.array(left_orig)),
                    part.take(pa.array(right_orig)))

    return partition_map(tagged, "__key", merge_partition, P)


def range_join(ds, intervals: pa.Table, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               attach_cols: Optional[Sequence[str]] = None,
               closed: str = "left", how: str = "inner",
               concurrency=(1, 8)):
    """Classify every row by which interval ``[lo, hi)`` (``closed='left'``;
    ``'both'`` = ``[lo, hi]``) its ``value_col`` falls into. Intervals must be
    sorted and non-overlapping; the table is broadcast once via ``ray.put``
    and each batch classifies with one vectorized ``searchsorted`` — the
    10^12-row shape for band/bucket joins (no shuffle, no per-batch reship).
    ``how='left'`` keeps unmatched rows with nulls; ``'inner'`` drops them.
    """
    if closed not in ("left", "both"):
        raise ValueError("closed must be 'left' or 'both'")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    lo = np.asarray(intervals[lo_col], dtype=np.float64)
    hi = np.asarray(intervals[hi_col], dtype=np.float64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    if ((hi < lo).any()
            or (len(lo) > 1 and (lo[1:] < (hi[:-1] if closed == "left"
                                           else np.nextafter(hi[:-1], np.inf))).any())):
        raise ValueError("intervals must be sorted and non-overlapping")
    attach = list(attach_cols if attach_cols is not None
                  else [c for c in intervals.column_names if c not in (lo_col, hi_col)])
    ival = intervals.take(pa.array(order))
    ref = ray.put((lo, hi, {c: ival[c] for c in attach}))

    class RangeClassifier:
        def __init__(self, interval_ref, _closed=closed, _how=how):
            self.lo, self.hi, self.attach = ray.get(interval_ref)
            self.closed, self.how = _closed, _how

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = np.asarray(pc.cast(batch[value_col], pa.float64()))
            idx = np.searchsorted(self.lo, v, side="right") - 1
            valid = idx >= 0
            iv = np.where(valid, idx, 0)
            inside = (v <= self.hi[iv]) if self.closed == "both" else (v < self.hi[iv])
            hit = valid & inside & ~np.isnan(v)
            out = {c: batch[c] for c in batch.column_names}
            if self.how == "inner":
                t = pa.table(out).filter(pa.array(hit))
                take = pa.array(idx[hit])
                for c, col in self.attach.items():
                    t = t.append_column(c, col.take(take))
                return t
            take = pa.array(np.where(hit, idx, 0))
            mask = pa.array(~hit)
            t = pa.table(out)
            for c, col in self.attach.items():
                t = t.append_column(c, pc.if_else(mask, pa.nulls(
                    batch.num_rows, col.type), col.take(take)))
            return t

    # max_restarts=0 (ray#53727): ObjectRef constructor arg, restart would fail.
    return ds.map_batches(RangeClassifier, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=concurrency,
                          max_restarts=0)


def shuffle_hash_join(left_ds, right_ds, on, how: str = "inner",
                      num_partitions: Optional[int] = None,
                      right_suffix: str = "_r"):
    """Equi-join of two LARGE sides: both are hash-partitioned on the key and
    joined per partition (``ray.data.Dataset.join`` — a true all-to-all
    shuffle, the cost :func:`broadcast_hash_join` avoids when one side is a
    dimension table). ``num_partitions`` should scale with the cluster
    (default: 2 × CPUs). ``on`` is a column name or (left, right) pair."""
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    lkey, rkey = (on, on) if isinstance(on, str) else on
    if num_partitions is None:
        num_partitions = max(8, 2 * int(ray.cluster_resources().get("CPU", 8)))
    return left_ds.join(right_ds, join_type=how, num_partitions=num_partitions,
                        on=(lkey,), right_on=(rkey,) if rkey != lkey else None,
                        right_suffix=right_suffix)


def lag_delta(ds, key: str, ts: str, id_col: str, out_col: str = "delta",
              num_partitions: Optional[int] = None):
    """Per-key previous-row delta (SQL ``ts - LAG(ts) OVER (PARTITION BY key
    ORDER BY ts, id)``). First row of each key gets null; the deterministic
    (ts, id) ordering makes the result engine-reproducible under ties.

    Scale shape (10^9 keys): keys are HASH-PARTITIONED and the kernel runs
    once per PARTITION — one ``np.lexsort`` by (key, ts, id) plus a
    run-boundary diff handles every key in the partition at once (see
    ``pipelines/partition.py``; the old per-key ``map_groups`` paid a Python
    call per key). Partitioning assumption: one partition fits a worker."""
    from raycontract.pipelines.partition import key_codes, partition_map

    cols = list(ds.schema().names)

    def per_partition(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return part.append_column(out_col, pa.array([], pa.int64()))
        t = np.asarray(pc.cast(part[ts].combine_chunks(), pa.int64()))
        ids = np.asarray(part[id_col])
        kc = key_codes(part[key])
        order = np.lexsort((ids, t, kc))
        g = part.take(pa.array(order))
        tt, ks = t[order], kc[order]
        vals = np.zeros(n, dtype=np.int64)
        first = np.zeros(n, dtype=bool)
        first[0] = True
        if n > 1:
            vals[1:] = tt[1:] - tt[:-1]
            first[1:] = ks[1:] != ks[:-1]   # key boundary → no predecessor
        return g.append_column(out_col, pa.array(vals, mask=first))

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)


def broadcast_hash_join(ds, small: pa.Table, on, how: str = "inner",
                        suffix: str = "_r", concurrency=(1, 8)):
    """Equi-join against a broadcast dimension table: ``small`` is shipped to
    each actor ONCE via ``ray.put`` and every batch joins zero-copy with
    ``pyarrow.Table.join``. The right shape for star-schema lookups at scale;
    for two large sides use a key-partitioned groupby instead (see
    ``asof_join`` for the pattern). ``on`` is a column name or (left, right)
    pair; clashing non-key right columns get ``suffix``."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    lkey, rkey = (on, on) if isinstance(on, str) else on
    ref = ray.put(small)

    class Joiner:
        def __init__(self, small_ref, _how=how, _lk=lkey, _rk=rkey, _sx=suffix):
            self.small = ray.get(small_ref)
            self.how, self.lk, self.rk, self.sx = _how, _lk, _rk, _sx

        def __call__(self, batch: pa.Table) -> pa.Table:
            right = self.small
            rename = {c: c + self.sx for c in right.column_names
                      if c != self.rk and c in batch.column_names}
            if rename:
                right = right.rename_columns(
                    [rename.get(c, c) for c in right.column_names])
            joined = batch.join(right, keys=self.lk, right_keys=self.rk,
                                join_type="inner" if self.how == "inner"
                                else "left outer")
            return joined

    # max_restarts=0 (ray#53727): ObjectRef constructor arg, restart would fail.
    return ds.map_batches(Joiner, fn_constructor_args=(ref,),
                          batch_format="pyarrow", concurrency=concurrency,
                          max_restarts=0)


def anti_join(ds, key: str, right_ds, right_key: str,
              broadcast_limit: int = 2_000_000, num_buckets: int = 64):
    """Rows of ``ds`` whose ``key`` has NO match in ``right_ds.right_key``
    (SQL ``WHERE NOT EXISTS``). Null left keys never match, so they are kept
    — SQL NOT EXISTS semantics.

    Scale shape: the right side is first reduced to DISTINCT keys inside
    ``map_batches`` (partials bounded by keys × blocks).

    - distinct right keys ≤ ``broadcast_limit``: shipped ONCE via
      ``ray.put``; every left batch filters with vectorized
      ``pc.invert(pc.is_in(...))`` — zero shuffle, rows never move.
    - larger: the LEFT DISTINCT keys anti-join the right keys first over a
      bucketed (bucket, key) exchange — shuffle volume is keys only — and
      the surviving key set (bounded by the true anti-key count, usually
      tiny relative to the corpus) broadcast-filters the left rows. A left
      whose anti-key set itself exceeds the broadcast limit needs the full
      bucketed row exchange (``shuffle_hash_join`` with how='anti') —
      raised loudly rather than silently materializing.
    """
    from raycontract.functions.hashing import hash64

    def distinct_keys(col_name):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"k": pc.unique(
                pc.drop_null(batch[col_name].combine_chunks()))})
        return fn

    rkeys = right_ds.select_columns([right_key]).map_batches(
        distinct_keys(right_key), batch_format="pyarrow").materialize()

    def broadcast_filter(keys_arr: pa.Array):
        ref = ray.put(keys_arr)

        def keep(batch: pa.Table) -> pa.Table:
            present = ray.get(ref)
            mask = pc.invert(pc.is_in(batch[key], value_set=present))
            # is_in(null) is false ⇒ invert keeps nulls: NOT EXISTS semantics
            return batch.filter(mask)

        return ds.map_batches(keep, batch_format="pyarrow")

    rkey_type = dict(zip(right_ds.schema().names,
                         right_ds.schema().types))[right_key]

    def collect(small_ds, empty_type=rkey_type) -> pa.Array:
        chunks = [b["k"].combine_chunks()
                  for b in small_ds.iter_batches(batch_size=1 << 20,
                                                 batch_format="pyarrow")
                  if b.num_rows]
        if not chunks:
            return pa.array([], type=empty_type)
        u = pc.unique(pa.chunked_array(chunks))
        return u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u

    if rkeys.count() <= broadcast_limit:
        return broadcast_filter(collect(rkeys))

    # bucketed key-only anti: which LEFT keys survive?
    lkeys = ds.select_columns([key]).map_batches(
        distinct_keys(key), batch_format="pyarrow")

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch["k"].combine_chunks()
            b = (hash64(col) % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({"_b": pa.array(b), "k": col,
                             "_side": pa.array(
                                 np.full(len(col), side, dtype=np.int8))})
        return fn

    both = lkeys.map_batches(tag(0), batch_format="pyarrow").union(
        rkeys.map_batches(tag(1), batch_format="pyarrow"))

    def anti(group: pa.Table) -> pa.Table:
        side = group["_side"]
        present = pc.unique(group["k"].filter(pc.equal(side, 1)))
        left = pc.unique(group["k"].filter(pc.equal(side, 0)))
        return pa.table({"k": left.filter(
            pc.invert(pc.is_in(left, value_set=present)))})

    surviving = both.groupby("_b").map_groups(
        anti, batch_format="pyarrow").materialize()
    if surviving.count() <= broadcast_limit:
        lkey_type = dict(zip(ds.schema().names, ds.schema().types))[key]
        anti_keys = collect(surviving, empty_type=lkey_type)
        ref = ray.put(anti_keys)

        def keep_anti(batch: pa.Table) -> pa.Table:
            keys_ok = ray.get(ref)
            mask = pc.is_in(batch[key], value_set=keys_ok)
            mask = pc.or_kleene(mask, pc.is_null(batch[key]))
            return batch.filter(pc.fill_null(mask, False))

        return ds.map_batches(keep_anti, batch_format="pyarrow")

    # anti-key set itself too big to broadcast: full bucketed row exchange —
    # rows move exactly once, co-located with their bucket's anti-key slice
    row_cols = list(ds.schema().names)

    def tag_rows(batch: pa.Table) -> pa.Table:
        col = batch[key].combine_chunks()
        nulls = batch.filter(pc.is_null(col))
        nn = batch.filter(pc.is_valid(col))
        b = (hash64(nn[key].combine_chunks()) %
             np.uint64(num_buckets)).astype(np.int64)
        tagged = nn.append_column("_b", pa.array(b)).append_column(
            "_side", pa.array(np.zeros(nn.num_rows, dtype=np.int8)))
        # null keys never match: route to bucket 0 marked side=2 (always kept)
        nt = nulls.append_column(
            "_b", pa.array(np.zeros(nulls.num_rows, dtype=np.int64))
        ).append_column("_side",
                        pa.array(np.full(nulls.num_rows, 2, dtype=np.int8)))
        return pa.concat_tables([tagged, nt])

    def tag_keys(batch: pa.Table) -> pa.Table:
        col = batch["k"].combine_chunks()
        b = (hash64(col) % np.uint64(num_buckets)).astype(np.int64)
        t = pa.table({key: col, "_b": pa.array(b),
                      "_side": pa.array(np.ones(len(col), dtype=np.int8))})
        for c in row_cols:
            if c != key:
                t = t.append_column(c, pa.nulls(len(col), dict(
                    zip(ds.schema().names, ds.schema().types))[c]))
        return t.select(row_cols + ["_b", "_side"])

    rows_tagged = ds.map_batches(tag_rows, batch_format="pyarrow")
    keys_tagged = surviving.map_batches(tag_keys, batch_format="pyarrow")

    def keep_group(group: pa.Table) -> pa.Table:
        side = group["_side"]
        ok = pc.unique(pc.drop_null(group[key].filter(pc.equal(side, 1))))
        rows = group.filter(pc.not_equal(side, 1))
        mask = pc.or_kleene(pc.is_in(rows[key], value_set=ok),
                            pc.equal(rows["_side"], 2))
        return rows.filter(pc.fill_null(mask, False)).drop_columns(
            ["_b", "_side"])

    return rows_tagged.union(keys_tagged).groupby("_b").map_groups(
        keep_group, batch_format="pyarrow")
