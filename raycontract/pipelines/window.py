"""Per-key window functions: running totals, trailing time-range frames and
step funnels.

The reference validates SQL-defined quality metrics (reference
``datacontract/engines/soda/check_soda_execute.py`` runs user SQL through
DuckDB); windowed aggregates are the part of that SQL surface a streaming
engine must re-express natively. Scale shape shared by every operator here
(same as ``sessionize_events`` / ``lag_delta``): keys are HASH-PARTITIONED
(``pipelines/partition.py``), the kernel runs once per PARTITION — one
``np.lexsort`` plus vectorized run-boundary passes handle every key in the
partition at once; no per-key Python, no per-row Python. Partitioning
assumption: one partition fits a worker's heap — size ``num_partitions`` to
data volume, not key count.

Monetary/metric values are scaled to integer micros BEFORE summation so the
distributed result is bit-identical to the SQL oracle (float prefix sums
would drift by summation order).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raycontract.pipelines.partition import key_codes, partition_map


def _sorted_runs(part: pa.Table, key: str, ts: str, id_col: str):
    """lexsort the partition by (key, ts, id); return (sorted_table, ts_int64,
    run_starts, run_lengths) where runs are maximal equal-key spans."""
    t = np.asarray(pc.cast(part[ts].combine_chunks(), pa.int64()))
    ids = np.asarray(part[id_col])
    kc = key_codes(part[key])
    order = np.lexsort((ids, t, kc))
    g = part.take(pa.array(order))
    tt, ks = t[order], kc[order]
    n = len(tt)
    starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
    lengths = np.diff(np.r_[starts, n])
    return g, tt, starts, lengths


def _micros(col, scale: int = 1_000_000) -> np.ndarray:
    """ROUND(value * scale) as int64 — the exact integer domain the SQL
    oracle aggregates in (``CAST(ROUND(value*1e6) AS BIGINT)``).
    round_mode="half_towards_infinity" matches SQL ROUND — both pc.round's
    and np.rint's DEFAULTS are half-to-even and would diverge on exact .5."""
    v = pc.multiply(pc.cast(col.combine_chunks(), pa.float64()), float(scale))
    return np.asarray(pc.cast(pc.round(v, round_mode="half_towards_infinity"), pa.int64()))


def running_total(ds, key: str, ts: str, id_col: str, value_col: str,
                  out_col: str = "running_micros",
                  num_partitions: Optional[int] = None):
    """Per-key cumulative sum — SQL ``SUM(micros) OVER (PARTITION BY key
    ORDER BY ts, id ROWS UNBOUNDED PRECEDING)`` with ``micros =
    CAST(ROUND(value*1e6) AS BIGINT)``. The (ts, id) ordering is a total
    order, so the frame is deterministic under timestamp ties.

    Kernel: one global cumsum over the sorted partition, re-based at each
    key-run start (subtract the prefix before the run) — O(n) vectorized,
    zero per-key calls."""
    cols = [key, ts, id_col, value_col]

    def per_partition(part: pa.Table) -> pa.Table:
        base = part.select([id_col, key])
        if part.num_rows == 0:
            return base.append_column(out_col, pa.array([], pa.int64()))
        g, _tt, starts, lengths = _sorted_runs(part, key, ts, id_col)
        vals = _micros(g[value_col])
        cum = np.cumsum(vals)
        before = np.repeat(cum[starts] - vals[starts], lengths)
        return (g.select([id_col, key])
                .append_column(out_col, pa.array(cum - before)))

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)


def rolling_time_window(ds, key: str, ts: str, id_col: str, value_col: str,
                        window_s: int = 3600,
                        num_partitions: Optional[int] = None):
    """Trailing time-range frame per row — SQL ``... OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN INTERVAL window PRECEDING AND CURRENT ROW)``:
    for each event, the count and integer-micros sum of the key's events in
    ``[ts - window, ts]``. RANGE-frame peer semantics (all rows sharing the
    current timestamp are in-frame regardless of row order) are reproduced
    exactly: the frame bounds come from ``searchsorted(left)`` /
    ``searchsorted(right)`` on the run's sorted timestamps.

    Kernel: per key-run prefix sums + two vectorized searchsorteds — no
    per-key Python. Output: (id, key, n_window, sum_window_micros)."""
    cols = [key, ts, id_col, value_col]
    win_us = np.int64(window_s) * 1_000_000

    def per_partition(part: pa.Table) -> pa.Table:
        base = part.select([id_col, key])
        if part.num_rows == 0:
            return (base.append_column("n_window", pa.array([], pa.int64()))
                    .append_column("sum_window_micros", pa.array([], pa.int64())))
        g, tt, starts, lengths = _sorted_runs(part, key, ts, id_col)
        vals = _micros(g[value_col])
        n = len(tt)
        prefix = np.r_[np.int64(0), np.cumsum(vals)]
        run_of_row = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
        # Vectorized per-run searchsorted WITHOUT a per-key Python loop:
        # shift each run's timestamps by run_idx * OFFSET with OFFSET >
        # (ts span + window), making the concatenation globally sorted and
        # frame bounds run-local by construction. Runs are chunked so
        # run_idx * OFFSET stays within int64.
        shifted = tt - tt.min()   # tt is run-sorted, not globally sorted
        offset = np.int64(int(shifted.max()) + int(win_us) + 1)
        runs_per_chunk = max(1, (np.iinfo(np.int64).max // 2) // int(offset))
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for c0 in range(0, len(starts), runs_per_chunk):
            c1 = min(c0 + runs_per_chunk, len(starts))
            r0, r1 = starts[c0], starts[c1 - 1] + lengths[c1 - 1]
            adj = shifted[r0:r1] + (run_of_row[r0:r1] - c0) * offset
            lo[r0:r1] = r0 + np.searchsorted(adj, adj - win_us, side="left")
            hi[r0:r1] = r0 + np.searchsorted(adj, adj, side="right")
        return (g.select([id_col, key])
                .append_column("n_window", pa.array(hi - lo))
                .append_column("sum_window_micros",
                               pa.array(prefix[hi] - prefix[lo])))

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)


def funnel(ds, key: str, ts: str, step_col: str, steps: Sequence[str],
           num_partitions: Optional[int] = None):
    """Ordered-step funnel: how many keys reach step k, where reaching step k
    means an event of type ``steps[k]`` STRICTLY after the key's earliest
    completion of step k-1 (the classic product-analytics funnel; step 1 is
    the key's earliest ``steps[0]`` event).

    Kernel: per partition, one lexsort by (key, ts); each step is one masked
    ``np.minimum.reduceat`` per key-run (events of the step's type later
    than the key's step-(k-1) time), so cost is O(len(steps) · n) vectorized.
    The per-partition partials (keys reached per step) are integers; the
    driver folds len(steps) numbers per partition. Null keys are EXCLUDED
    (a funnel needs an identity; the SQL formulation is itself inconsistent
    there — GROUP BY keeps a NULL step-1 group that the step-2 join then
    drops). Output: (step:int64 1-based, event_type, n_keys:int64)."""
    steps = list(steps)

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.filter(pc.is_valid(part[key]))
        if part.num_rows == 0:
            return pa.table({"step": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "n_keys": pa.array([], pa.int64())})
        t = np.asarray(pc.cast(part[ts].combine_chunks(), pa.int64()))
        kc = key_codes(part[key])
        order = np.lexsort((t, kc))
        tt, ks = t[order], kc[order]
        sv = part[step_col].combine_chunks().take(pa.array(order))
        n = len(tt)
        starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        lengths = np.diff(np.r_[starts, n])
        run_of_row = np.repeat(np.arange(len(starts)), lengths)
        INF = np.iinfo(np.int64).max
        # int64 timestamps are exact in float64 (|ts_us| < 2^53)
        prev = np.full(len(starts), -np.inf)  # step-0 bound: no constraint
        counts = []
        for s in steps:
            mask = np.asarray(pc.fill_null(pc.equal(sv, s), False)).astype(bool)
            mask &= tt > prev[run_of_row]
            cand = np.where(mask, tt, INF)
            # reduceat needs non-empty slices; starts always < n here
            mins = np.minimum.reduceat(cand, starts)
            reached = mins != INF
            prev = np.where(reached, mins, np.inf)
            counts.append(int(reached.sum()))
        return pa.table({"step": pa.array(range(1, len(steps) + 1), pa.int64()),
                         "event_type": pa.array(steps),
                         "n_keys": pa.array(counts, pa.int64())})

    from raycontract.pipelines.smallagg import groupby_sum

    partials = partition_map(ds.select_columns([key, ts, step_col]), key,
                             per_partition, num_partitions)
    return groupby_sum(partials, ["step", "event_type"], ["n_keys"])


def ordered_string_agg(ds, key: str, ts: str, id_col: str, value_col: str,
                       sep: str = ">", out_col: str = "journey",
                       num_partitions: Optional[int] = None):
    """Per-key ordered string aggregation — SQL ``string_agg(value, sep
    ORDER BY ts, id) GROUP BY key`` (the "user journey" analytics shape).

    Kernel: one lexsort by (key, ts, id), then the per-key concat is ONE
    vectorized ``pc.binary_join`` over a ListArray built directly from the
    key-run offsets — no per-key Python, no string loops. Partitioning
    assumption as for every partition kernel: one partition fits a worker."""

    def per_partition(part: pa.Table) -> pa.Table:
        # SQL string_agg SKIPS null values; pc.binary_join over a list with
        # a null element yields null instead — drop null-value rows up
        # front. (A key whose values are ALL null is omitted, where SQL
        # would emit a NULL journey row for it.)
        part = part.filter(pc.is_valid(part[value_col]))
        if part.num_rows == 0:
            return pa.table({key: pa.array([], part[key].type),
                             out_col: pa.array([], pa.string())})
        t = np.asarray(pc.cast(part[ts].combine_chunks(), pa.int64()))
        ids = np.asarray(part[id_col])
        kc = key_codes(part[key])
        order = np.lexsort((ids, t, kc))
        vals = pc.cast(part[value_col].combine_chunks(), pa.string()).take(
            pa.array(order))
        ks = kc[order]
        n = len(ks)
        starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        offsets = pa.array(np.r_[starts, n].astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, vals.combine_chunks()
                                         if isinstance(vals, pa.ChunkedArray)
                                         else vals)
        keys_out = part[key].combine_chunks().take(
            pa.array(order[starts]))
        return pa.table({key: keys_out,
                         out_col: pc.binary_join(lists, sep)})

    return partition_map(ds.select_columns([key, ts, id_col, value_col]),
                         key, per_partition, num_partitions)


def time_since_last_match(ds, key: str, ts: str, id_col: str, match_col: str,
                          match_value: str, out_col: str = "since_micros",
                          num_partitions: Optional[int] = None):
    """Per-row time since the key's most recent event matching
    ``match_col == match_value``, inclusive of the current row — SQL::

        ts - MAX(CASE WHEN match THEN ts END) OVER
             (PARTITION BY key ORDER BY ts, id ROWS UNBOUNDED PRECEDING)

    (the classic "time since last error" feature). Rows before the key's
    first match get NULL. Kernel: one lexsort + one ``np.maximum.accumulate``
    over match-masked timestamps, re-based per key run — O(n) vectorized,
    exact integer microseconds."""
    cols = [key, ts, id_col, match_col]

    def per_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return (part.select([id_col, key])
                    .append_column(out_col, pa.array([], pa.int64())))
        g, tt, starts, lengths = _sorted_runs(part, key, ts, id_col)
        mv = pc.fill_null(pc.equal(g[match_col].combine_chunks(),
                                   match_value), False)
        mask = np.asarray(mv).astype(bool)
        NEG = np.iinfo(np.int64).min
        cand = np.where(mask, tt, NEG)
        last = _segmented_maximum_accumulate(cand, starts, lengths)
        since = tt - last
        null_mask = last == NEG
        return (g.select([id_col, key])
                .append_column(out_col, pa.array(since, mask=null_mask)))

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)


def _segmented_maximum_accumulate(vals: np.ndarray, starts: np.ndarray,
                                  lengths: np.ndarray) -> np.ndarray:
    """Per-segment prefix maximum, vectorized: global maximum.accumulate of
    ``vals`` re-based so no value carries across a segment boundary (the
    standard offset trick — add a per-segment monotone offset large enough
    to dominate, accumulate, subtract)."""
    n = len(vals)
    if n == 0:
        return vals.copy()
    NEG = np.iinfo(np.int64).min
    finite = vals[vals != NEG]
    if len(finite) == 0:
        return np.full(n, NEG, dtype=np.int64)
    vmin, vmax = int(finite.min()), int(finite.max())
    span = np.int64(vmax - vmin + 2)
    # map values into per-run bands: band = run_idx * SPAN + (vals - MIN) + 1
    # (band floor = "no match yet"); later runs always dominate earlier ones,
    # so ONE global accumulate gives every run's prefix max. Runs are chunked
    # so run_idx * SPAN stays within int64 (same trick as the rolling frame).
    out = np.empty(n, dtype=np.int64)
    run_of_row = np.repeat(np.arange(len(starts), dtype=np.int64), lengths)
    runs_per_chunk = max(1, (np.iinfo(np.int64).max // 2) // int(span))
    for c0 in range(0, len(starts), runs_per_chunk):
        c1 = min(c0 + runs_per_chunk, len(starts))
        r0, r1 = starts[c0], starts[c1 - 1] + lengths[c1 - 1]
        rr = run_of_row[r0:r1] - c0
        v = vals[r0:r1]
        banded = np.where(v == NEG, rr * span, rr * span + (v - vmin) + 1)
        acc = np.maximum.accumulate(banded)
        rel = acc - rr * span
        out[r0:r1] = np.where(rel <= 0, NEG, rel - 1 + vmin)
    return out


def group_rank(ds, key: str, order_col: str, id_col: str, buckets: int = 4,
               num_partitions: Optional[int] = None):
    """Per-key ranking window functions in one pass — SQL::

        ROW_NUMBER() OVER w, RANK() OVER w, PERCENT_RANK() OVER w,
        NTILE(buckets) OVER w
        WINDOW w AS (PARTITION BY key ORDER BY order_col, id)

    (id breaks order ties for ROW_NUMBER/NTILE determinism; RANK /
    PERCENT_RANK tie on order_col alone, per SQL). Kernel: one lexsort per
    PARTITION + run-boundary arithmetic — row_number is a re-based arange,
    rank is a segmented maximum-accumulate over tie-group starts, NTILE is
    exact SQL semantics (first n%k buckets one row larger). O(n) vectorized
    per partition, no per-key calls."""
    cols = [key, order_col, id_col]

    def per_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({
                id_col: pa.array([], part[id_col].type),
                key: pa.array([], part[key].type),
                "row_num": pa.array([], pa.int64()),
                "rnk": pa.array([], pa.int64()),
                "pct_rank": pa.array([], pa.float64()),
                "bucket": pa.array([], pa.int64())})
        col = part[order_col].combine_chunks()
        # Order in the column's OWN domain (a float64 cast would collapse
        # int64 values above 2^53 into false ties); NULLs sort last and are
        # one RANK peer group, per SQL ASC NULLS LAST.
        if pa.types.is_integer(col.type):
            vf = np.asarray(pc.cast(pc.fill_null(col, 0), pa.int64()))
        elif pa.types.is_floating(col.type):
            vf = np.asarray(pc.cast(pc.fill_null(col, 0.0), pa.float64()))
        else:
            raise ValueError(
                f"group_rank order column must be numeric, got {col.type}")
        nf = np.asarray(pc.is_null(col)).astype(np.int8)
        ids = np.asarray(part[id_col])
        kc = key_codes(part[key])
        order = np.lexsort((ids, vf, nf, kc))
        g = part.take(pa.array(order))
        vs, ns, ks = vf[order], nf[order], kc[order]
        n = len(vs)
        run_start = np.zeros(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = ks[1:] != ks[:-1]
        starts = np.flatnonzero(run_start)
        lengths = np.diff(np.r_[starts, n])
        pos = np.arange(n, dtype=np.int64) - np.repeat(starts, lengths)
        row_num = pos + 1
        # RANK: position of each tie-group's first row within its run, +1
        tie_start = run_start.copy()
        tie_start[1:] |= (vs[1:] != vs[:-1]) | (ns[1:] != ns[:-1])
        first_pos = np.where(tie_start, pos, np.int64(-1))
        rnk = _segmented_maximum_accumulate(
            first_pos, starts, lengths) + 1
        nn = np.repeat(lengths, lengths)
        pct = np.where(nn > 1, (rnk - 1) / np.maximum(nn - 1, 1), 0.0)
        # exact SQL NTILE: first (n % k) buckets get ceil(n/k) rows
        k = np.int64(buckets)
        small = nn // k
        n_big = nn % k
        cut = n_big * (small + 1)
        bucket = np.where(
            pos < cut,
            pos // np.maximum(small + 1, 1),
            n_big + np.where(small > 0, (pos - cut) // np.maximum(small, 1), 0),
        ) + 1
        return pa.table({id_col: g[id_col], key: g[key],
                         "row_num": pa.array(row_num),
                         "rnk": pa.array(rnk.astype(np.int64)),
                         "pct_rank": pa.array(pct.astype(np.float64)),
                         "bucket": pa.array(bucket.astype(np.int64))})

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)


def cohort_retention(ds, key: str, ts: str, id_col: str,
                     day_us: int = 86_400_000_000,
                     num_partitions: Optional[int] = None):
    """Cohort retention matrix — SQL::

        WITH f AS (SELECT key, MIN(day) AS cohort FROM t GROUP BY key),
             a AS (SELECT DISTINCT key, day FROM t)
        SELECT cohort, day - cohort AS day_offset, COUNT(*) AS n_keys
        FROM a JOIN f USING (key) GROUP BY 1, 2

    with ``day = FLOOR(epoch_us(ts) / 86400e6)`` as epoch days (BIGINT —
    keeps the oracle dtype-exact without DATE round-trips). Null keys are
    EXCLUDED (retention needs an identity; the SQL join drops them).
    Kernel: rows hash-partition by key; per partition one lexsort puts each
    key's days in order, so the cohort is the run's first day and DISTINCT
    days are run-local boundary changes — O(n) vectorized, partials
    grouped-sum."""
    cols = [key, ts, id_col]

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.filter(pc.is_valid(part[key]))
        if part.num_rows == 0:
            return pa.table({"cohort_day": pa.array([], pa.int64()),
                             "day_offset": pa.array([], pa.int64()),
                             "n_keys": pa.array([], pa.int64())})
        _g, tt, starts, lengths = _sorted_runs(part, key, ts, id_col)
        day = np.floor_divide(tt, np.int64(day_us))
        n = len(day)
        run_start = np.zeros(n, dtype=bool)
        run_start[starts] = True
        new_day = run_start.copy()
        new_day[1:] |= day[1:] != day[:-1]
        keep = np.flatnonzero(new_day)
        cohort = np.repeat(day[starts], lengths)[keep]
        return pa.table({"cohort_day": pa.array(cohort),
                         "day_offset": pa.array(day[keep] - cohort),
                         "n_keys": pa.array(np.ones(keep.size, np.int64))})

    from raycontract.pipelines.smallagg import groupby_sum

    partials = partition_map(ds.select_columns(cols), key, per_partition,
                             num_partitions)
    return groupby_sum(partials, ["cohort_day", "day_offset"], ["n_keys"])


def throttle_first_in_window(ds, key: str, ts: str, id_col: str,
                             window_s: int = 3600,
                             num_partitions: Optional[int] = None):
    """Streaming-style event throttle / dedup-within-time-window: keep a row
    iff the key had NO kept-or-dropped row in the preceding ``window_s``
    seconds — SQL::

        ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, id) IS NULL
        OR ... > window

    semantics on the RAW stream (each row suppresses only its immediate
    successor inside the window, the classic alert-throttle / retry-collapse
    shape). Composite throttle keys (user × event_type) are just a
    concatenated key column. Output: (id, key, kept:bool).

    Kernel: one lexsort per partition + a vectorized previous-row delta with
    run re-basing — O(n), no per-key Python."""
    cols = [key, ts, id_col]
    win_us = np.int64(window_s) * 1_000_000

    def per_partition(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pa.table({id_col: pa.array([], part[id_col].type),
                             key: pa.array([], part[key].type),
                             "kept": pa.array([], pa.bool_())})
        g, tt, starts, _lengths = _sorted_runs(part, key, ts, id_col)
        prev = np.empty_like(tt)
        prev[1:] = tt[:-1]
        prev[0] = np.iinfo(np.int64).min // 2
        delta = tt - prev
        kept = delta > win_us
        kept[starts] = True  # first row of every key-run is always kept
        return pa.table({id_col: g[id_col], key: g[key],
                         "kept": pa.array(kept)})

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)


def merge_intervals(ds, key: str, start_col: str, end_col: str, id_col: str,
                    num_partitions: Optional[int] = None):
    """Merge overlapping (or touching) intervals per key into episodes — the
    classic gaps-and-islands shape (user activity episodes, IP lease
    coalescing). A new episode starts where the interval's start is STRICTLY
    after the running max end of everything before it in (start, id) order.
    Output: (key, episode_start, episode_end, n_rows), int64 microseconds.

    Kernel: one lexsort per partition, a segmented maximum-accumulate of
    ends for the running max, and one ``reduceat`` per output column over
    episode boundaries — O(n) vectorized, no per-key Python. SQL twin: the
    ``SUM(CASE WHEN s > MAX(e) OVER (... 1 PRECEDING) ...) OVER`` island
    numbering."""
    cols = [key, start_col, end_col, id_col]

    def per_partition(part: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], part[key].type),
                          "episode_start": pa.array([], pa.int64()),
                          "episode_end": pa.array([], pa.int64()),
                          "n_rows": pa.array([], pa.int64())})
        if part.num_rows == 0:
            return empty
        s = np.asarray(pc.cast(part[start_col].combine_chunks(), pa.int64()))
        e = np.asarray(pc.cast(part[end_col].combine_chunks(), pa.int64()))
        ids = np.asarray(part[id_col])
        kc = key_codes(part[key])
        order = np.lexsort((ids, s, kc))
        ks, ss, es = kc[order], s[order], e[order]
        n = len(ss)
        starts = np.r_[0, np.flatnonzero(ks[1:] != ks[:-1]) + 1]
        lengths = np.diff(np.r_[starts, n])
        run_max_end = _segmented_maximum_accumulate(es, starts, lengths)
        new_ep = np.zeros(n, dtype=bool)
        new_ep[starts] = True
        new_ep[1:] |= (ss[1:] > run_max_end[:-1]) & (ks[1:] == ks[:-1])
        ep_starts = np.flatnonzero(new_ep)
        ep_bounds = np.r_[ep_starts, n]
        keys_sorted = part[key].combine_chunks().take(pa.array(order))
        return pa.table({
            key: keys_sorted.take(pa.array(ep_starts)),
            "episode_start": pa.array(ss[ep_starts]),
            "episode_end": pa.array(np.maximum.reduceat(es, ep_starts)),
            "n_rows": pa.array(np.diff(ep_bounds).astype(np.int64)),
        })

    return partition_map(ds.select_columns(cols), key, per_partition,
                         num_partitions)
