"""Relational showcase pipelines (grouped aggregates, broadcast join, top-k,
windowed/time-bucketed aggregates) — the generic data-processing surface,
expressed with the scale patterns from SURVEY.md §4:

- grouped aggregates PRE-AGGREGATE inside ``map_batches`` (pyarrow
  ``Table.group_by`` per batch) before the global ``groupby`` — the shuffle
  moves one row per (key, block), not per input row;
- money/quantity sums use integer cents (`round(x*100) → int64`) so results
  are exact and order-independent — bit-identical to the DuckDB oracle
  regardless of summation order;
- small dimension tables broadcast via ``ray.put`` (no shuffle join).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Count, Max, Min, Sum


def _cents(col) -> pa.Array:
    # half_towards_infinity = SQL ROUND; pc.round defaults to half-to-even
    return pc.cast(pc.round(pc.multiply(col, 100.0),
                            round_mode="half_towards_infinity"), pa.int64())


def pricing_summary(lineitem_ds):
    """TPC-H Q1-shaped summary by (l_returnflag, l_linestatus): exact integer
    sums (cents / basis points) + row counts."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty_c": _cents(batch["l_quantity"]),
            "price_c": _cents(batch["l_extendedprice"]),
            "disc_bp": pc.cast(pc.round(pc.multiply(batch["l_discount"], 10000.0), round_mode="half_towards_infinity"), pa.int64()),
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("price_c", "sum"), ("disc_bp", "sum"), ("n", "sum")]
        ).rename_columns(["l_returnflag", "l_linestatus", "sum_qty_cents",
                          "sum_price_cents", "sum_disc_bp", "count_order"])

    from raycontract.pipelines.smallagg import groupby_sum

    partials = lineitem_ds.select_columns(
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"]
    ).map_batches(partial, batch_format="pyarrow")
    return groupby_sum(partials, ["l_returnflag", "l_linestatus"],
                       ["sum_qty_cents", "sum_price_cents", "sum_disc_bp",
                        "count_order"])


def top_customers_by_revenue(orders_ds, customer_ds, k: int = 10):
    """Grouped revenue sum (pre-aggregated) + driver-side top-k + dimension
    attach.

    customer is the small side: materialized ONCE as a zero-copy Arrow table
    (never Python row dicts) and joined with ``pyarrow.Table.join`` — the
    star-schema lookup shape (for a Dataset-scale probe side use
    :func:`raycontract.pipelines.joins.broadcast_hash_join`; here the probe
    is the k-row top list, so it finishes on the driver). Output:
    (c_custkey, c_name, revenue_cents) ordered by revenue desc, key asc
    (deterministic)."""
    cust_refs = customer_ds.select_columns(["c_custkey", "c_name"]).to_arrow_refs()
    cust = pa.concat_tables(ray.get(cust_refs))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_custkey": batch["o_custkey"],
            "rev_c": _cents(batch["o_totalprice"]),
        })
        return t.group_by(["o_custkey"]).aggregate([("rev_c", "sum")]).rename_columns(
            ["o_custkey", "revenue_cents"])

    from raycontract.pipelines.smallagg import groupby_sum

    partials = orders_ds.select_columns(["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow")
    agg = groupby_sum(partials, ["o_custkey"], ["revenue_cents"])
    # post-aggregate table is bounded by the customer-dimension size (the
    # same small-side assumption that lets ``cust`` broadcast), so the top-k
    # + dimension attach finish driver-side with zero-copy Arrow kernels —
    # no extra Ray executions for a k-row result. For a LARGE dimension use
    # joins.broadcast_hash_join over the Dataset instead (orders_with_nation
    # shows that pattern).
    import ray.data as rd

    t = pa.concat_tables([pa.table(x) for x in ray.get(agg.to_arrow_refs())],
                         promote_options="default")
    order = pc.sort_indices(t, sort_keys=[("revenue_cents", "descending"),
                                          ("o_custkey", "ascending")])
    top_t = t.take(order.slice(0, k))
    joined = top_t.join(cust, keys="o_custkey", right_keys="c_custkey")
    out = pa.table({"c_custkey": joined["o_custkey"],
                    "c_name": joined["c_name"],
                    "revenue_cents": joined["revenue_cents"]})
    # pa.Table.join does not guarantee row order — re-sort the k-row result
    out = out.take(pc.sort_indices(out, sort_keys=[
        ("revenue_cents", "descending"), ("c_custkey", "ascending")]))
    return rd.from_arrow(out)


def events_hourly(events_ds):
    """Time-bucketed aggregate: (event_type, hour, n_events, sum_value_cents).

    The tumbling-window shape from SURVEY §2e 'streaming-shaped workloads':
    event-time bucketing via vectorized floor_temporal, pre-aggregated per
    batch, merged in one small groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        t = pa.table({
            "event_type": batch["event_type"],
            "hour": hour,
            "value_c": _cents(batch["value"]),
            "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        return t.group_by(["event_type", "hour"]).aggregate(
            [("value_c", "sum"), ("n", "sum")]
        ).rename_columns(["event_type", "hour", "sum_value_cents", "n_events"])

    from raycontract.pipelines.smallagg import groupby_sum

    partials = events_ds.select_columns(["event_type", "ts", "value"]).map_batches(
        partial, batch_format="pyarrow")
    return groupby_sum(partials, ["event_type", "hour"],
                       ["sum_value_cents", "n_events"])


def sliding_window_agg(events_ds, window_s: int = 3600, slide_s: int = 1800,
                       ts_col: str = "ts", value_col: str = "value"):
    """SLIDING event-time windows (window ``window_s``, hop ``slide_s``,
    ``slide_s`` must divide ``window_s``): each event contributes to
    ``window_s/slide_s`` overlapping windows.

    Fan-out + pre-aggregation happen per batch with pure numpy (an event's
    k window-starts are ``floor(ts/slide)*slide - i*slide``), so the shuffle
    moves (window_start, partial-sum) rows — O(distinct windows) per batch —
    never k copies of the events. Returns (window_start_us:int64,
    n_events:int64, sum_value_cents:int64).
    """
    if window_s % slide_s:
        raise ValueError("slide_s must divide window_s")
    k = window_s // slide_s

    def partial(batch: pa.Table) -> pa.Table:
        # null ts rows have no window (an unfiltered NaT would coin a
        # garbage window start); null values sum as 0 (the oracle coalesces)
        batch = batch.filter(pc.is_valid(batch[ts_col]))
        n = batch.num_rows
        empty = pa.table({"window_start_us": pa.array([], type=pa.int64()),
                          "n_events": pa.array([], type=pa.int64()),
                          "sum_value_cents": pa.array([], type=pa.int64())})
        if n == 0:
            return empty
        ts_us = np.asarray(pc.cast(batch[ts_col].combine_chunks(),
                                   pa.timestamp("us")).cast(pa.int64()))
        # null values sum as 0 (SQL SUM ignores them; a bare cast of a
        # null round() would inject int64-min garbage)
        cents = np.asarray(pc.fill_null(_cents(batch[value_col]), 0))
        slide_us = np.int64(slide_s) * 1_000_000
        base = (ts_us // slide_us) * slide_us
        # (k, n) window starts per event → flatten, pre-aggregate per window
        starts = base[None, :] - (np.arange(k, dtype=np.int64)[:, None] * slide_us)
        flat = starts.ravel()
        vals = np.tile(cents, k)
        uniq, inv = np.unique(flat, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        cnts = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, vals)
        np.add.at(cnts, inv, 1)
        return pa.table({"window_start_us": pa.array(uniq),
                         "n_events": pa.array(cnts),
                         "sum_value_cents": pa.array(sums)})

    from raycontract.pipelines.smallagg import groupby_sum

    partials = events_ds.select_columns([ts_col, value_col]).map_batches(
        partial, batch_format="pyarrow")
    return groupby_sum(partials, ["window_start_us"],
                       ["n_events", "sum_value_cents"])


def sessionize_events(events_ds, gap_minutes: int = 30,
                      num_partitions: Optional[int] = None):
    """Session windows per user: consecutive events ≤ gap apart share a
    session (the classic streaming sessionization, SURVEY §2e 'streaming-
    shaped workloads').

    Scale shape (10^9 users): users are HASH-PARTITIONED (``__part =
    hash(user) % P``) and the kernel runs once per PARTITION, not per user —
    one ``np.lexsort`` by (user, ts) and a vectorized run-boundary pass
    sessionize every user in the partition at once (see
    ``pipelines/partition.py``). Partitioning assumption: one partition fits
    a worker's heap — size ``num_partitions`` to data volume.

    Output: (user_id, session_id starting at 1 per user, n_events,
    session_start, session_end)."""
    from raycontract.pipelines.partition import partition_map

    gap_us = np.int64(gap_minutes) * 60 * 1_000_000
    ts_type = None
    for name, typ in zip(events_ds.schema().names, events_ds.schema().types):
        if name == "ts":
            ts_type = typ

    def per_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({"user_id": pa.array([], part["user_id"].type),
                             "session_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "session_start": pa.array([], ts_type),
                             "session_end": pa.array([], ts_type)})
        ucol = part["user_id"].combine_chunks() if isinstance(
            part["user_id"], pa.ChunkedArray) else part["user_id"]
        # null users form ONE partition (SQL PARTITION BY semantics) — a
        # bare np.asarray would turn them into NaN floats where NaN != NaN
        # makes every null row its own session (caught by the randomized
        # equivalence suite)
        unull = np.asarray(pc.is_null(ucol))
        users = np.where(unull, np.int64(-(2 ** 62)),
                         np.asarray(pc.fill_null(pc.cast(ucol, pa.int64()),
                                                 0)))
        ts = np.asarray(pc.cast(part["ts"].combine_chunks(),
                                pa.timestamp("us")).cast(pa.int64()))
        order = np.lexsort((ts, users))
        u, t = users[order], ts[order]
        unull_o = unull[order]
        n = len(t)
        new_user = np.zeros(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        new_sess = new_user.copy()
        new_sess[1:] |= (t[1:] - t[:-1]) > gap_us
        # global session number (1-based) and per-user restart
        sess_cum = np.cumsum(new_sess)
        sess_start = np.flatnonzero(new_sess)            # first row per session
        sess_end = np.r_[sess_start[1:] - 1, n - 1]       # last row per session
        user_start = np.flatnonzero(new_user)
        # sessions opened before each user's first row
        sess_before = sess_cum[user_start] - 1
        runs = np.diff(np.r_[user_start, n])
        sess_before_row = np.repeat(sess_before, runs)
        session_id_row = sess_cum - sess_before_row       # restarts at 1 per user
        start_us = t[sess_start]
        end_us = t[sess_end]
        out_u = pc.if_else(
            pa.array(unull_o[sess_start]),
            pa.scalar(None, pa.int64()),
            pa.array(np.where(unull_o[sess_start], 0,
                              u[sess_start]))).cast(ucol.type)
        return pa.table({
            "user_id": out_u,
            "session_id": pa.array(session_id_row[sess_start]),
            "n_events": pa.array((sess_end - sess_start + 1).astype(np.int64)),
            "session_start": pc.cast(pa.array(start_us, pa.int64()).cast(
                pa.timestamp("us")), ts_type),
            "session_end": pc.cast(pa.array(end_us, pa.int64()).cast(
                pa.timestamp("us")), ts_type),
        })

    return partition_map(events_ds.select_columns(["user_id", "ts"]),
                         "user_id", per_partition, num_partitions)


def heavy_hitters_users(events_ds, k: int = 10):
    """Exact top-k users by event count: per-batch pre-aggregation → small
    groupby → sort + limit (deterministic tie-break on user_id)."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["user_id"].drop_null())
        return pa.table({"user_id": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from raycontract.pipelines.smallagg import groupby_sum

    partials = events_ds.select_columns(["user_id"]).map_batches(partial, batch_format="pyarrow")
    agg = groupby_sum(partials, ["user_id"], ["n"]).map_batches(
        lambda b: b.rename_columns(["user_id", "n_events"]),
        batch_format="pyarrow")
    return agg.sort(["n_events", "user_id"], descending=[True, False]).limit(k)


def approx_heavy_hitters(ds, column: str, k: int = 16, verify: bool = True):
    """Shuffle-free heavy hitters: one Misra-Gries sketch per block (map-only)
    merged on the driver — guaranteed to contain every value with frequency
    > n/k. With ``verify=True`` a second broadcast pass computes EXACT counts
    for the candidate set (still no shuffle). Returns [(value, count)] desc.
    """
    import pickle

    from raycontract.functions.sketches import MisraGries

    def sketch(batch: pa.Table) -> pa.Table:
        mg = MisraGries(k=4 * k)  # oversketch: tighter bounds, tiny memory
        vc = pc.value_counts(batch[column].drop_null())
        mg.add(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
        return pa.table({"payload": pa.array([pickle.dumps(mg.to_bytes())],
                                             type=pa.binary())})

    rows = ds.select_columns([column]).map_batches(sketch, batch_format="pyarrow").take_all()
    merged = None
    for r in rows:
        mg = MisraGries.from_bytes(pickle.loads(r["payload"]))
        merged = mg if merged is None else merged.merge(mg)
    if merged is None:
        return []
    cands = [v for v, _ in merged.candidates()[: 4 * k]]
    if not verify:
        return merged.candidates()[:k]

    cand_ref = ray.put(set(cands))

    def exact(batch: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        vc = pc.value_counts(batch[column].drop_null())
        vals = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_pylist()
        keep = [(v, c) for v, c in zip(vals, cnts) if v in want]
        return pa.table({column: pa.array([v for v, _ in keep]),
                         "_c": pa.array([c for _, c in keep], type=pa.int64())})

    totals: dict = {}
    for r in ds.select_columns([column]).map_batches(exact, batch_format="pyarrow").take_all():
        totals[r[column]] = totals.get(r[column], 0) + r["_c"]
    return sorted(totals.items(), key=lambda x: (-x[1], str(x[0])))[:k]


def duplicate_user_events(events_ds):
    """user_ids with more than one event + their counts (pre-aggregated)."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch["user_id"].drop_null())
        return pa.table({"user_id": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from raycontract.pipelines.smallagg import groupby_sum

    partials = events_ds.select_columns(["user_id"]).map_batches(partial, batch_format="pyarrow")
    agg = groupby_sum(partials, ["user_id"], ["n"]).map_batches(
        lambda b: b.rename_columns(["user_id", "n_events"]),
        batch_format="pyarrow")

    def keep_dups(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n_events"], 1))

    return agg.map_batches(keep_dups, batch_format="pyarrow")


def topk_per_group(ds, group_col: str, order_col: str, k: int,
                   id_col: Optional[str] = None, descending: bool = True):
    """Top-k rows per group by ``order_col`` (SQL ``ROW_NUMBER() OVER
    (PARTITION BY group ORDER BY v DESC, id) <= k``): each batch first
    surrenders only its own per-group top-k candidates, so the groupby
    shuffles at most k × groups × blocks rows — the full table never moves.
    Ties on ``order_col`` break by ascending ``id_col`` (required for a
    deterministic, engine-reproducible result)."""
    import pyarrow.compute as _pc

    if id_col is None:
        raise ValueError("id_col is required (deterministic tie-break)")

    def _bottomk(batch: pa.Table, per_group: bool) -> pa.Table:
        col = batch[order_col]
        if pa.types.is_integer(col.type):
            # exact integer ordering — a float64 cast collapses int64 keys
            # above 2^53. Descending uses ~v (= -v-1): order-reversing,
            # overflow-free even at INT64_MIN.
            v = np.asarray(_pc.cast(col, pa.int64()), dtype=np.int64)
            key = ~v if descending else v
        else:
            v = np.asarray(_pc.cast(col, pa.float64()))
            key = -v if descending else v
        ids = np.asarray(batch[id_col])
        if not per_group:
            keep = np.lexsort((ids, key))[:k]
            return batch.take(pa.array(np.sort(keep)))
        g = batch[group_col].combine_chunks()
        enc = _pc.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gc = np.asarray(enc.indices, dtype=np.int64)
        order = np.lexsort((ids, key, gc))
        gs = gc[order]
        run_start = np.r_[0, np.flatnonzero(np.diff(gs)) + 1]
        rank = np.arange(len(gs)) - np.repeat(
            run_start, np.diff(np.r_[run_start, len(gs)]))
        return batch.take(pa.array(np.sort(order[rank < k])))

    cand = ds.map_batches(lambda b: _bottomk(b, True), batch_format="pyarrow")
    return cand.groupby(group_col).map_groups(
        lambda g: _bottomk(g, False), batch_format="pyarrow")


def exact_quantiles(ds, column: str, qs=(0.25, 0.5, 0.75, 0.9, 0.99),
                    buckets: int = 4096, collect_limit: int = 1_000_000,
                    max_rounds: int = 8, cache: bool = True):
    """EXACT distributed quantiles by iterative radix-histogram selection —
    the complement of the t-digest sketch (``functions/sketches.py``): where
    the sketch trades exactness for one pass, this spends O(log_B(N/limit))
    narrow column scans and returns the precise order statistic.

    DuckDB-compatible semantics: quantile q = the value at 1-based rank
    ``ceil(q*N)`` over the non-null values ascending (``quantile_disc``).

    Scale shape (designed for 10^12 rows): every pass is a vectorized
    ``map_batches`` over the single projected column; each round narrows each
    quantile's value range to one histogram bucket (counts shuffled to the
    driver are ≤ buckets×blocks tiny ints); rows are only ever collected once
    a range holds ≤ ``collect_limit`` values — and every quantile that turns
    collectable in a round is gathered in ONE shared pass, not one scan each.
    Skewed/duplicate-heavy columns terminate via the equal-bounds fast path
    (a bucket that cannot subdivide is a run of one repeated value —
    answered directly, no collection). ``cache=True`` materializes the
    projected column in the object store so the follow-up passes skip the
    parquet decode — the multi-pass working set is exactly this column; at
    cluster scale let it spill rather than re-decoding the table per round.

    Returns a list of (q, value) in input order.
    """
    import math

    proj = ds.select_columns([column])
    if cache:
        proj = proj.materialize()

    def mmc(batch: pa.Table) -> pa.Table:
        v = batch[column].drop_null()
        if len(v) == 0:
            return pa.table({"mn": pa.array([None], type=pa.float64()),
                             "mx": pa.array([None], type=pa.float64()),
                             "n": pa.array([0], type=pa.int64())})
        return pa.table({"mn": pa.array([pc.min(v).as_py()], type=pa.float64()),
                         "mx": pa.array([pc.max(v).as_py()], type=pa.float64()),
                         "n": pa.array([len(v)], type=pa.int64())})

    parts = proj.map_batches(mmc, batch_format="pyarrow").take_all()
    total = sum(p["n"] for p in parts)
    if total == 0:
        return [(q, None) for q in qs]
    lo0 = min(p["mn"] for p in parts if p["mn"] is not None)
    hi0 = max(p["mx"] for p in parts if p["mx"] is not None)

    # state per quantile: (k_rem 0-based rank within [lo, hi], lo, hi,
    # right_closed, done_value)
    state = []
    for q in qs:
        k = max(0, math.ceil(q * total) - 1)  # DuckDB quantile_disc rank
        state.append({"k": k, "lo": lo0, "hi": hi0, "closed": True, "val": None})

    if total <= collect_limit:  # whole column fits one gather: no histograms
        _collect_ranks(proj, column, state)
        return [(q, s["val"]) for q, s in zip(qs, state)]

    for _ in range(max_rounds):
        active = [s for s in state if s["val"] is None]
        if not active:
            break
        # ranges that cannot subdivide are runs of a single repeated value
        for s in active:
            if s["lo"] == s["hi"]:
                s["val"] = s["lo"]
        active = [s for s in state if s["val"] is None]
        if not active:
            break
        ranges = [(s["lo"], s["hi"], s["closed"]) for s in active]

        def hist(batch: pa.Table, _ranges=tuple(ranges), _B=buckets) -> pa.Table:
            v = np.asarray(pc.cast(batch[column].drop_null(), pa.float64()))
            out_r, out_b, out_c = [], [], []
            for ri, (rlo, rhi, rclosed) in enumerate(_ranges):
                m = (v >= rlo) & ((v <= rhi) if rclosed else (v < rhi))
                if not m.any():
                    continue
                counts, _ = np.histogram(v[m], bins=_B, range=(rlo, rhi))
                nz = np.nonzero(counts)[0]
                out_r.extend([ri] * len(nz))
                out_b.extend(nz.tolist())
                out_c.extend(counts[nz].tolist())
            return pa.table({"r": pa.array(out_r, type=pa.int32()),
                             "b": pa.array(out_b, type=pa.int32()),
                             "c": pa.array(out_c, type=pa.int64())})

        from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

        hp = pa.concat_tables(
            [pa.table(t) for t in ray.get(
                proj.map_batches(hist, batch_format="pyarrow").to_arrow_refs())
             if t.num_rows])
        folded = (pl.from_arrow(hp).group_by(["r", "b"]).agg(pl.col("c").sum())
                  if hp.num_rows else None)
        for ri, s in enumerate(active):
            counts = np.zeros(buckets, dtype=np.int64)
            if folded is not None:
                sub = folded.filter(pl.col("r") == ri)
                counts[sub["b"].to_numpy()] = sub["c"].to_numpy()
            cum = np.cumsum(counts)
            idx = int(np.searchsorted(cum, s["k"] + 1))
            edges = np.linspace(s["lo"], s["hi"], buckets + 1)
            s["k"] -= int(cum[idx - 1]) if idx > 0 else 0
            new_lo, new_hi = float(edges[idx]), float(edges[idx + 1])
            s["closed"] = s["closed"] and (idx == buckets - 1)
            in_bucket = int(counts[idx])
            if new_lo == s["lo"] and new_hi == s["hi"]:
                # float underflow: range no longer subdivides
                s["val"] = new_lo if in_bucket else s["lo"]
                continue
            s["lo"], s["hi"] = new_lo, new_hi
            if in_bucket <= collect_limit:
                s["collect"] = True
        # one shared gather pass for every quantile that became collectable
        # this round (was: one full scan per quantile)
        pend = [s for s in state if s.get("collect")]
        if pend:
            _collect_ranks(proj, column, pend)
            for s in pend:
                s.pop("collect", None)
    rest = [s for s in state if s["val"] is None]
    if rest:  # max_rounds exhausted — collect what remains in one pass
        _collect_ranks(proj, column, rest)
    return [(q, s["val"]) for q, s in zip(qs, state)]


def _collect_ranks(proj, column: str, states: list) -> None:
    """Gather the values inside every narrowed range in ONE scan and pick
    each state's exact k-th smallest on the driver (fills ``s['val']``)."""
    ranges = tuple((s["lo"], s["hi"], s["closed"]) for s in states)

    def grab(batch: pa.Table, _ranges=ranges) -> pa.Table:
        v = np.asarray(pc.cast(batch[column].drop_null(), pa.float64()))
        out_r, out_v = [], []
        for ri, (rlo, rhi, rclosed) in enumerate(_ranges):
            m = (v >= rlo) & ((v <= rhi) if rclosed else (v < rhi))
            if m.any():
                sel = v[m]
                out_r.append(np.full(len(sel), ri, dtype=np.int32))
                out_v.append(sel)
        if not out_r:
            return pa.table({"r": pa.array([], type=pa.int32()),
                             "v": pa.array([], type=pa.float64())})
        return pa.table({"r": pa.array(np.concatenate(out_r)),
                         "v": pa.array(np.concatenate(out_v))})

    parts = [pa.table(t) for t in ray.get(
        proj.map_batches(grab, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    rs = (np.concatenate([np.asarray(t["r"]) for t in parts])
          if parts else np.empty(0, dtype=np.int32))
    vs = (np.concatenate([np.asarray(t["v"]) for t in parts])
          if parts else np.empty(0))
    for ri, s in enumerate(states):
        vals = vs[rs == ri]
        if vals.size == 0:
            s["val"] = None
            continue
        k = min(s["k"], vals.size - 1)
        s["val"] = float(np.partition(vals, k)[k])


def rollup_sum(ds, keys: Sequence[str], sums: dict[str, tuple[str, float]]):
    """``GROUP BY ROLLUP(keys)``: counts + exact integer sums at every
    prefix level (finest → grand total), rolled-up dimensions NULL.

    Scale shape: ONE pre-aggregated pass at the finest level (per-batch
    ``pyarrow`` group_by partials, reduce via ``smallagg.groupby_sum``);
    every coarser level is re-aggregated from the FINEST RESULT (bounded by
    its group count, not the input), so the input is scanned once. ``sums``
    maps output column → (source column, scale); values are rounded into
    integer units (cents/micros) BEFORE summation so distributed sums are
    bit-identical to the SQL oracle."""
    from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for out, (src, scale) in sums.items():
            cols[out] = pc.cast(pc.round(pc.multiply(
                pc.cast(batch[src], pa.float64()), float(scale)),
                round_mode="half_towards_infinity"), pa.int64())
        cols["n_rows"] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t = pa.table(cols)
        aggs = [(c, "sum") for c in (*sums, "n_rows")]
        g = t.group_by(keys).aggregate(aggs)
        return g.rename_columns(keys + [c for c in (*sums, "n_rows")])

    from raycontract.pipelines.smallagg import groupby_sum

    finest = groupby_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys, [*sums, "n_rows"])
    vals_cols = [*sums, "n_rows"]
    finest = finest.materialize()
    if finest.count() > 2_000_000:
        # finest level too big to fold on the driver: every coarser level is
        # its own distributed grouped sum over the SAME materialized finest
        # result (still never re-scans the input); levels stream to the
        # caller as a union Dataset
        import ray.data as rd

        levels_ds = [finest]
        schema = finest.schema()
        types = dict(zip(schema.names, schema.types))
        for i in range(len(keys), 0, -1):
            kcols = keys[: i - 1]
            lvl = (groupby_sum(finest, kcols, vals_cols) if kcols else None)
            if lvl is None:
                # grand total: per-batch 1-row sum partials, tiny driver fold
                def total_partial(batch: pa.Table) -> pa.Table:
                    return pa.table({c: pa.array(
                        [int(pc.sum(batch[c]).as_py() or 0)], pa.int64())
                        for c in vals_cols})

                t = pa.concat_tables([pa.table(b) for b in
                                      finest.map_batches(
                                          total_partial,
                                          batch_format="pyarrow")
                                      .iter_batches(batch_size=1 << 20,
                                                    batch_format="pyarrow")],
                                     promote_options="default")
                gt = pa.table({c: pa.array([int(pc.sum(t[c]).as_py() or 0)],
                                           pa.int64()) for c in vals_cols})
                lvl = rd.from_arrow(gt)

            def pad(batch: pa.Table, _have=tuple(kcols)) -> pa.Table:
                for k in keys:
                    if k not in _have:
                        batch = batch.append_column(
                            k, pa.nulls(batch.num_rows, types[k]))
                return batch.select(keys + vals_cols)

            levels_ds.append(lvl.map_batches(pad, batch_format="pyarrow"))
        out = levels_ds[0].map_batches(
            lambda b: b.select(keys + vals_cols), batch_format="pyarrow")
        for lv in levels_ds[1:]:
            out = out.union(lv)
        return out
    base = pl.from_arrow(pa.concat_tables(
        [pa.table(b) for b in finest.iter_batches(batch_size=1 << 20,
                                                  batch_format="pyarrow")],
        promote_options="default"))
    vals = vals_cols
    levels = [base]
    for i in range(len(keys), 0, -1):
        lvl = (base.group_by(keys[: i - 1]).agg([pl.col(c).sum() for c in vals])
               if i > 1 else
               base.select([pl.col(c).sum() for c in vals]))
        for k in keys[i - 1:]:
            lvl = lvl.with_columns(pl.lit(None, dtype=base[k].dtype).alias(k))
        levels.append(lvl.select(keys + vals))
    out = pl.concat([lv.select(keys + vals) for lv in levels]).to_arrow()
    schema = pa.schema([(k, pa.string() if pa.types.is_large_string(out[k].type)
                         or pa.types.is_string(out[k].type) else out[k].type)
                        for k in out.column_names])
    import ray.data as rd

    # same return type as the distributed branch
    return rd.from_arrow(out.cast(schema))


def pivot_counts(ds, row_key: str, col_key: str, values: Sequence[str]):
    """Pivot: one row per ``row_key``, one count column per listed
    ``col_key`` value plus ``n_total`` (SQL ``COUNT(*) FILTER (WHERE
    col_key = v)``). Per-batch partial crosstab (groups × blocks rows) →
    small grouped-sum reduce; unlisted values count only toward n_total."""
    values = list(values)

    def partial(batch: pa.Table) -> pa.Table:
        cols = {row_key: batch[row_key]}
        ck = batch[col_key]
        for v in values:
            cols[f"n_{v}"] = pc.cast(
                pc.fill_null(pc.equal(ck, v), False), pa.int64())
        cols["n_total"] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        t = pa.table(cols)
        cnt_cols = [f"n_{v}" for v in values] + ["n_total"]
        g = t.group_by([row_key]).aggregate([(c, "sum") for c in cnt_cols])
        return g.rename_columns([row_key] + cnt_cols)

    from raycontract.pipelines.smallagg import groupby_sum

    return groupby_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       [row_key], [f"n_{v}" for v in values] + ["n_total"])


def fixed_width_histogram(ds, column: str, width: float):
    """Fixed-width histogram: ``bucket = FLOOR(column / width)`` →
    count. The shuffle-free profiling primitive behind drift checks: each
    batch emits its (bucket, count) partial — bounded by buckets × blocks,
    not rows — and one small grouped sum folds them."""

    def partial(batch: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(
            pc.cast(batch[column], pa.float64()), float(width))), pa.int64())
        t = pa.table({"bucket": b,
                      "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))})
        g = t.group_by(["bucket"]).aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    from raycontract.pipelines.smallagg import groupby_sum

    return groupby_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       ["bucket"], ["n"])


def json_field_sum(ds, json_col: str, field: str, group_col: str):
    """Grouped integer aggregate over a JSON string column (semi-structured
    props parsing): per group, COUNT(*) and SUM of ``$.field``.

    Each batch is parsed + pre-aggregated by EMBEDDED DuckDB
    (``json_extract_string`` — vectorized C++ JSON, one cached
    ``threads=1`` connection per worker, same pattern as
    ``functions/strhash.py``), so the result is identical to the SQL oracle
    by construction and shuffle volume is groups × blocks."""
    from raycontract.functions.strhash import _connection

    if "'" in field or '"' in field:
        raise ValueError("field must be a plain JSON key")

    def partial(batch: pa.Table) -> pa.Table:
        tbl = pa.table({"g": batch[group_col], "j": batch[json_col]})  # noqa: F841
        out = _connection().execute(
            f"SELECT g, CAST(SUM(CAST(json_extract_string(j, '$.{field}')"
            f" AS BIGINT)) AS BIGINT)"
            f" AS s, CAST(COUNT(*) AS BIGINT) AS n FROM tbl GROUP BY g").arrow()
        return out.rename_columns(["g", f"sum_{field}", "n"])

    from raycontract.pipelines.smallagg import groupby_sum

    out = groupby_sum(ds.select_columns([group_col, json_col]).map_batches(
        partial, batch_format="pyarrow"), ["g"], [f"sum_{field}", "n"])

    def shaped(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([group_col, f"sum_{field}", "n"])

    return out.map_batches(shaped, batch_format="pyarrow")


def quantile_buckets(ds, column: str, id_col: str,
                     qs=(0.25, 0.5, 0.75), out_col: str = "bucket"):
    """Assign every row its quantile bucket (1-based: rows below the first
    boundary → 1, ≥ last boundary → len(qs)+1). Boundaries come from the
    EXACT distributed quantile machinery (:func:`exact_quantiles`,
    DuckDB ``quantile_disc`` semantics), then one zero-shuffle vectorized
    ``searchsorted`` pass assigns buckets — the composition used for
    stratifying a corpus by a score column before mixture sampling."""
    bounds = [v for _, v in exact_quantiles(ds, column, qs=qs)]
    b = np.asarray(bounds, dtype=np.float64)

    def assign(batch: pa.Table) -> pa.Table:
        v = np.asarray(pc.cast(batch[column].combine_chunks(), pa.float64()))
        buckets = 1 + np.searchsorted(b, v, side="right")
        return pa.table({id_col: batch[id_col],
                         out_col: pa.array(buckets.astype(np.int64))})

    return ds.select_columns([id_col, column]).map_batches(
        assign, batch_format="pyarrow")


def distinct_key_overlap(left_ds, left_key: str, right_ds, right_key: str):
    """Set-operation profile of two key columns: |L ∩ R|, |L \\ R|, |R \\ L|
    over DISTINCT non-null keys (the INTERSECT / EXCEPT triple as counts —
    the referential-drift profile between two tables).

    Scale shape: each side reduces to per-batch DISTINCT keys (partials
    bounded by keys × blocks), the tagged union groups by key summing
    presence bits (adaptive driver fold / distributed groupby via
    ``smallagg.groupby_sum``), and the 3 counts fold from the per-key
    presence pairs."""

    def distinct(col_name, bit):
        def fn(batch: pa.Table) -> pa.Table:
            u = pc.unique(pc.drop_null(batch[col_name].combine_chunks()))
            ones = np.ones(len(u), dtype=np.int64)
            return pa.table({"k": u, "in_l": pa.array(ones * (1 - bit)),
                             "in_r": pa.array(ones * bit)})
        return fn

    from raycontract.pipelines.smallagg import groupby_sum

    both = left_ds.select_columns([left_key]).map_batches(
        distinct(left_key, 0), batch_format="pyarrow").union(
        right_ds.select_columns([right_key]).map_batches(
            distinct(right_key, 1), batch_format="pyarrow"))
    per_key = groupby_sum(both, ["k"], ["in_l", "in_r"])

    def fold(batch: pa.Table) -> pa.Table:
        in_l = np.asarray(batch["in_l"]) > 0
        in_r = np.asarray(batch["in_r"]) > 0
        return pa.table({
            "n_both": pa.array([int((in_l & in_r).sum())], pa.int64()),
            "n_left_only": pa.array([int((in_l & ~in_r).sum())], pa.int64()),
            "n_right_only": pa.array([int((~in_l & in_r).sum())], pa.int64()),
        })

    parts = per_key.map_batches(fold, batch_format="pyarrow")
    t = pa.concat_tables([pa.table(b) for b in parts.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")],
        promote_options="default")
    return pa.table({c: pa.array([int(pc.sum(t[c]).as_py() or 0)], pa.int64())
                     for c in ("n_both", "n_left_only", "n_right_only")})


def grouped_count_distinct(ds, group_col: str, value_col: str):
    """Exact ``COUNT(DISTINCT value) GROUP BY group`` — the two-level
    combiner: each batch emits its DISTINCT (group, value) pairs (bounded by
    batch-distinct pairs, not rows), one grouped pass dedups pairs globally
    and counts per group. Shuffle volume is the distinct-pair set — the same
    shape DuckDB/BigQuery use for exact grouped distincts. For sketch-bound
    shuffles at extreme cardinality use the HLL path
    (``functions/sketches.py``) instead."""

    def pairs(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group_col], "v": batch[value_col]})
        t = t.filter(pc.is_valid(t["v"]))  # COUNT(DISTINCT v) ignores NULLs
        g = t.group_by(["g", "v"]).aggregate([])
        return g.rename_columns(["g", "v"])

    from raycontract.pipelines.smallagg import groupby_sum

    def tag_one(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))

    # dedup pairs globally, then count per group: both are grouped sums over
    # pre-aggregated partials (pair rows ≤ distinct pairs × blocks)
    deduped = groupby_sum(
        ds.select_columns([group_col, value_col]).map_batches(
            pairs, batch_format="pyarrow").map_batches(
            tag_one, batch_format="pyarrow"), ["g", "v"], ["n"])

    def count_rows(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch["g"],
                      "n_distinct": pa.array(
                          np.ones(batch.num_rows, dtype=np.int64))})
        out = t.group_by(["g"]).aggregate([("n_distinct", "sum")])
        return out.rename_columns(["g", "n_distinct"])

    out = groupby_sum(deduped.map_batches(count_rows, batch_format="pyarrow"),
                      ["g"], ["n_distinct"])

    def shaped(batch: pa.Table) -> pa.Table:
        return batch.rename_columns([group_col, "n_distinct"])

    return out.map_batches(shaped, batch_format="pyarrow")


def grouped_mode(ds, group_col: str, value_col: str):
    """Per-group MODE with a deterministic tie-break (count desc, value
    asc) — engines' native ``mode()`` is first-encountered and therefore
    irreproducible; this one is a pure function of the data.

    Scale shape: per-batch (group, value) pre-counts → one grouped sum
    (shuffle volume = distinct pairs, zipf-bounded) → per-batch top-1
    candidates per group over the AGGREGATED pairs → tiny final fold (the
    global winner is necessarily some batch's candidate). NULL values are
    ignored (SQL aggregate semantics)."""

    def pair_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group_col], "v": batch[value_col],
                      "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))})
        t = t.filter(pc.is_valid(t["v"]))
        g = t.group_by(["g", "v"]).aggregate([("n", "sum")])
        return g.rename_columns(["g", "v", "n"])

    from raycontract.pipelines.smallagg import groupby_sum

    pairs = groupby_sum(ds.select_columns([group_col, value_col]).map_batches(
        pair_counts, batch_format="pyarrow"), ["g", "v"], ["n"])

    def top1(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[
            ("g", "ascending"), ("n", "descending"), ("v", "ascending")])
        t = batch.take(order)
        gs = t["g"].combine_chunks()
        enc = pc.dictionary_encode(gs)
        codes = np.asarray((enc.combine_chunks() if isinstance(enc, pa.ChunkedArray)
                            else enc).indices, dtype=np.int64)
        first = np.r_[True, codes[1:] != codes[:-1]] if len(codes) else \
            np.array([], dtype=bool)
        return t.filter(pa.array(first))

    cands = pairs.map_batches(top1, batch_format="pyarrow")
    t = pa.concat_tables([pa.table(b) for b in cands.iter_batches(
        batch_size=1 << 20, batch_format="pyarrow")],
        promote_options="default")
    final = top1(t)

    def shaped(tt: pa.Table) -> pa.Table:
        return tt.rename_columns([group_col, "mode_value", "n_mode"])

    import ray.data as rd

    return rd.from_arrow(shaped(final))


def cooccurrence_pairs(ds, key: str, item_col: str, max_items: int = 64,
                       num_partitions=None):
    """Unordered item-pair co-occurrence by key — SQL::

        WITH kt AS (SELECT DISTINCT key, item FROM t)
        SELECT a.item, b.item, COUNT(*) FROM kt a JOIN kt b
        ON a.key = b.key AND a.item < b.item GROUP BY 1, 2

    (the "users who did A also did B" feature matrix). Scale shape: rows
    hash-partition by KEY once; inside each partition every key's item set
    becomes a BITMASK (global distinct items must fit ``max_items`` bits —
    raises loudly otherwise, since item vocabularies here are small: event
    types, labels, languages), and each pair count is one vectorized
    bit-test over the key-mask array — T²/2 numpy passes, no per-key
    Python. Per-partition (item_a, item_b, n) partials grouped-sum."""
    import numpy as np

    from raycontract.pipelines.partition import key_codes, partition_map
    from raycontract.pipelines.smallagg import groupby_sum

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({"item_a": pa.array([], pa.string()),
                          "item_b": pa.array([], pa.string()),
                          "n_keys": pa.array([], pa.int64())})
        # NULL keys never equi-join in the SQL twin — drop them (key_codes
        # yields -1 for nulls, which would wrap to the LAST key's bitmask)
        part = part.filter(pc.is_valid(part[key]))
        if part.num_rows == 0:
            return empty
        items = part[item_col].combine_chunks()
        enc = items.dictionary_encode()
        names = [v.as_py() for v in enc.dictionary]
        if len(names) > max_items:
            raise ValueError(
                f"{len(names)} distinct items exceed max_items={max_items}; "
                f"the bitmask kernel needs a bounded item vocabulary")
        order = np.argsort(np.array(names))  # pair output in string order
        codes = np.asarray(pc.fill_null(enc.indices, -1), dtype=np.int64)
        kc = key_codes(part[key])
        valid = codes >= 0
        masks = np.zeros(int(kc.max()) + 1, dtype=np.uint64)
        np.bitwise_or.at(masks, kc[valid],
                         np.uint64(1) << codes[valid].astype(np.uint64))
        out_a, out_b, out_n = [], [], []
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                a, b = order[i], order[j]
                both = np.uint64((1 << int(a)) | (1 << int(b)))
                n = int(np.count_nonzero((masks & both) == both))
                if n:
                    out_a.append(names[a])
                    out_b.append(names[b])
                    out_n.append(n)
        if not out_a:
            return empty
        return pa.table({"item_a": pa.array(out_a, pa.string()),
                         "item_b": pa.array(out_b, pa.string()),
                         "n_keys": pa.array(out_n, pa.int64())})

    partials = partition_map(ds.select_columns([key, item_col]), key,
                             per_partition, num_partitions)
    return groupby_sum(partials, ["item_a", "item_b"], ["n_keys"])


def grouped_approx_distinct(ds, group_col: str, value_col: str,
                            precision: int = 14):
    """Per-group HyperLogLog approximate-distinct — the SKETCH-bound
    counterpart of :func:`grouped_count_distinct` for extreme value
    cardinality: each batch emits one serialized HLL PER GROUP (shuffle
    volume = groups × blocks × 2^precision bytes, independent of distinct
    values), merged per group on the driver (group count is small by
    construction — use the exact pair path when groups are many and values
    few). NULL group values form their own group, like SQL GROUP BY (and
    like the exact twin). Returns an Arrow table
    (group, approx_distinct:int64) ordered by group (nulls last)."""
    from raycontract.functions.hashing import hash64
    from raycontract.functions.sketches import HyperLogLog

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group_col], "v": batch[value_col]})
        t = t.filter(pc.is_valid(t["v"]))  # COUNT(DISTINCT v) ignores NULLs
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], batch[group_col].type),
                             "payload": pa.array([], pa.binary())})
        h = hash64(t["v"], seed=7)
        enc = t["g"].combine_chunks().dictionary_encode()
        # null group values -> sentinel code len(dictionary): their own
        # group, per SQL GROUP BY (matching grouped_count_distinct)
        null_code = len(enc.dictionary)
        codes = np.asarray(pc.fill_null(enc.indices, null_code),
                           dtype=np.int64)
        gs, payloads = [], []
        for code in np.unique(codes):
            hll = HyperLogLog(precision)
            hll.add_hashed(h[codes == code])
            gs.append(None if code == null_code
                      else enc.dictionary[int(code)].as_py())
            # to_bytes() is already bytes: store raw, no pickle wrap
            payloads.append(hll.to_bytes())
        return pa.table({"g": pa.array(gs, batch[group_col].type),
                         "payload": pa.array(payloads, pa.binary())})

    merged: dict = {}
    rows = ds.select_columns([group_col, value_col]).map_batches(
        partial, batch_format="pyarrow")
    for b in rows.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for g, p in zip(b["g"].to_pylist(), b["payload"].to_pylist()):
            hll = HyperLogLog.from_bytes(p)
            merged[g] = hll if g not in merged else merged[g].merge(hll)
    gs = sorted(merged, key=lambda g: (g is None, g))
    return pa.table({group_col: pa.array(gs),
                     "approx_distinct": pa.array(
                         [int(round(merged[g].estimate())) for g in gs],
                         pa.int64())})


def grouped_profile(ds, group_col: str, value_col: str, text_col: str):
    """Per-group data-quality profile — the contract stats kernel's
    completeness/bounds surface sliced BY GROUP (per-source / per-partition
    profiling for drift triage): (group, n_rows, n_null_text, sum_value,
    min_value, max_value), all exact integers. Pre-aggregated per batch
    (one pyarrow group_by per block), merged by ONE adaptive mixed-op fold
    (:func:`~raycontract.pipelines.smallagg.groupby_agg` — sum/min/max
    together, so no post-fold joins and NULL group keys group like SQL).
    Shuffle volume is groups × blocks."""
    from raycontract.pipelines.smallagg import groupby_agg

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[value_col], pa.int64())
        t = pa.table({
            "g": batch[group_col],
            "n_rows": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            "n_null_text": pc.cast(pc.is_null(batch[text_col]), pa.int64()),
            "sum_value": v,
            "min_value": v,
            "max_value": v,
        })
        return t.group_by(["g"]).aggregate(
            [("n_rows", "sum"), ("n_null_text", "sum"), ("sum_value", "sum"),
             ("min_value", "min"), ("max_value", "max")]
        ).rename_columns(["g", "n_rows", "n_null_text", "sum_value",
                          "min_value", "max_value"])

    partials = ds.select_columns([group_col, value_col, text_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = groupby_agg(partials, ["g"],
                         {"n_rows": "sum", "n_null_text": "sum",
                          "sum_value": "sum", "min_value": "min",
                          "max_value": "max"})
    out = pa.concat_tables(
        [b for b in merged.iter_batches(batch_size=1 << 20,
                                        batch_format="pyarrow") if b.num_rows])
    out = out.rename_columns([group_col, "n_rows", "n_null_text", "sum_value",
                              "min_value", "max_value"])
    return out.take(pc.sort_indices(out, sort_keys=[(group_col, "ascending")]))


def grouped_topk_values(ds, group_col: str, value_col: str, k: int = 3,
                        driver_limit: int = 2_000_000):
    """Per group, the ``k`` MOST FREQUENT values with a deterministic
    tie-break (count desc, value asc) — grouped heavy hitters with exact
    counts (``grouped_mode`` is the k=1 special case).

    Scale shape: per-batch (group, value) pre-counts → one grouped-sum fold
    (shuffle volume = the distinct pair set, zipf-bounded). Ranking needs a
    group's pairs co-located: below ``driver_limit`` distinct pairs ONE
    driver lexsort + run-boundary rank mask answers every group at once;
    beyond, the AGGREGATED pair set (already ≪ rows) hash-partitions by
    group (``partition.partition_map``) and the same vectorized kernel runs
    per partition.

    Output: ``({group_col}, {value_col}, n, rank 1..k)`` — a pyarrow Table
    below ``driver_limit`` distinct pairs, a Dataset from the partitioned
    scale path (groups × k output rows can exceed the driver). NULL
    values are ignored (SQL aggregate semantics), NULL groups kept.
    """
    def pair_counts(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group_col], "v": batch[value_col],
                      "n": pa.array(np.ones(batch.num_rows, dtype=np.int64))})
        t = t.filter(pc.is_valid(t["v"]))
        out = t.group_by(["g", "v"]).aggregate([("n", "sum")])
        return out.rename_columns(["g", "v", "n"])

    from raycontract.pipelines.smallagg import groupby_sum

    pairs_ds = groupby_sum(
        ds.select_columns([group_col, value_col]).map_batches(
            pair_counts, batch_format="pyarrow"), ["g", "v"], ["n"],
        driver_limit=driver_limit)

    def topk_kernel(part: pa.Table) -> pa.Table:
        """Rank co-located (g, v, n) pairs: one lexsort + run-boundary
        cumcount; keep rank ≤ k."""
        if part.num_rows == 0:
            return pa.table({group_col: pa.array([], part.schema.field("g").type),
                             value_col: pa.array([], part.schema.field("v").type),
                             "n": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        gcol = part["g"].combine_chunks() if isinstance(
            part["g"], pa.ChunkedArray) else part["g"]
        vcol = part["v"].combine_chunks() if isinstance(
            part["v"], pa.ChunkedArray) else part["v"]
        n = np.asarray(part["n"], dtype=np.int64)
        # order: group, count desc, value asc — via sort_indices (handles
        # string/int groups and values uniformly, nulls-last groups kept)
        order = np.asarray(pc.sort_indices(
            pa.table({"g": gcol, "n": pa.array(-n), "v": vcol}),
            sort_keys=[("g", "ascending"), ("n", "ascending"),
                       ("v", "ascending")]))
        gs = gcol.take(pa.array(order))
        eq = pc.equal(gs.slice(1), gs.slice(0, len(gs) - 1))
        same = np.concatenate(([False],
                               np.asarray(pc.fill_null(eq, False))))
        # null groups: pc.equal yields null; both-null ⇒ same group
        if len(gs) > 1:
            nulls = np.asarray(pc.is_null(gs))
            same |= np.concatenate(([False], nulls[1:] & nulls[:-1]))
        starts = np.flatnonzero(~same)
        rank = np.arange(len(gs), dtype=np.int64) + 1
        rank -= np.repeat(starts + 1, np.diff(np.r_[starts, len(gs)])) - 1
        keep = rank <= k
        out = pa.table({group_col: gs.filter(pa.array(keep)),
                        value_col: vcol.take(pa.array(order)).filter(
                            pa.array(keep)),
                        "n": pa.array(n[order][keep]),
                        "rank": pa.array(rank[keep])})
        return out

    # smallagg's incremental-fetch pattern: pull pair blocks until the
    # driver limit trips, then fall back to the co-locating exchange over
    # the SAME materialized blocks (no re-scan)
    refs = pairs_ds.to_arrow_refs()
    tabs, total = [], 0
    for r in refs:
        t = pa.table(ray.get(r))
        if t.num_rows:
            tabs.append(t)
            total += t.num_rows
        if total > driver_limit:
            break
    if total == 0:
        from raycontract.pipelines.groupstats import _field_type

        z = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], _field_type(ds, group_col)),
                         value_col: pa.array([], _field_type(ds, value_col)),
                         "n": z, "rank": z})
    if total <= driver_limit:
        return topk_kernel(pa.concat_tables(tabs))
    from raycontract.pipelines.partition import partition_map

    import ray.data as rd

    # scale path returns the DATASET (groups × k rows can itself be huge —
    # write it out or keep processing; never force it through the driver)
    return partition_map(rd.from_arrow_refs(refs), "g", topk_kernel)


def join_skew_profile(ds_left, ds_right, left_key: str, right_key: str,
                      top: int = 10):
    """Join-explosion detector — profile a prospective equi-join BEFORE
    running it: per join key the left/right multiplicities and their
    product (the key's output-row contribution), returning the ``top``
    heaviest keys by product (ties → key asc) plus every key's totals
    folded into the summary columns. The planner's skew diagnostic as a
    first-class operator: one hot key (nl·nr in the billions) is the
    classic cause of a stuck distributed join.

    Scale shape: each side reduces to (key, count) partials per block —
    shuffle volume is distinct keys, never rows — one adaptive fold joins
    the sides, and the top-k product scan is vectorized over the folded
    key table. Null keys are excluded (equi-joins never match them).

    Output: ``(key, n_left, n_right, n_out)`` — the ``top`` keys by
    n_out. (The exact join cardinality is the sum of n_out over ALL keys;
    this profile intentionally returns only the heavy tail.)
    """
    from raycontract.pipelines.smallagg import groupby_sum

    def side_counts(key: str, tag: str):
        def partial(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.is_valid(batch[key]))
            u, c = np.unique(np.asarray(t[key].cast(pa.int64())),
                             return_counts=True)
            zero = np.zeros(len(u), np.int64)
            return pa.table({"k": pa.array(u),
                             "nl": pa.array(c.astype(np.int64)
                                            if tag == "l" else zero),
                             "nr": pa.array(c.astype(np.int64)
                                            if tag == "r" else zero)})
        return partial

    pl_ds = ds_left.select_columns([left_key]).map_batches(
        side_counts(left_key, "l"), batch_format="pyarrow")
    pr_ds = ds_right.select_columns([right_key]).map_batches(
        side_counts(right_key, "r"), batch_format="pyarrow")
    tabs = [pa.table(t) for t in ray.get(
        groupby_sum(pl_ds.union(pr_ds), ["k"], ["nl", "nr"]).to_arrow_refs())
        if t.num_rows]
    if not tabs:
        z = pa.array([], pa.int64())
        return pa.table({"key": z, "n_left": z, "n_right": z, "n_out": z})
    f = pa.concat_tables(tabs)
    k = np.asarray(f["k"], np.int64)
    nl = np.asarray(f["nl"], np.int64)
    nr = np.asarray(f["nr"], np.int64)
    # int64 wraparound guard: the one key this operator exists to catch
    # (billions × billions) must raise loudly like the BIGINT oracle, not
    # rank last with a garbage negative product
    if len(nl) and float(nl.max()) * float(nr.max()) >= 2.0 ** 62:
        raise ValueError(
            "join_skew_profile per-key product would overflow int64 "
            f"(max n_left={nl.max()}, max n_right={nr.max()}); widen to "
            "object/hugeint products at this multiplicity")
    prod = nl * nr
    # top-k by (product desc, key asc): lexsort on (-prod, k)… numpy lexsort
    # sorts by last key primary
    order = np.lexsort((k, -prod))[:top]
    return pa.table({"key": pa.array(k[order]),
                     "n_left": pa.array(nl[order]),
                     "n_right": pa.array(nr[order]),
                     "n_out": pa.array(prod[order])})
