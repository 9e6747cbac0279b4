"""Grouped order-statistics and anomaly operators.

Three scale-shaped additions to the relational family:

- :func:`first_last_by` — per-group first/last value by a (ts, tiebreak)
  composite order (OHLC-style open/close), as per-block arg-min/arg-max
  partials packed into ORDER-PRESERVING big-endian byte keys so the reduce
  is a plain grouped min/max (one adaptive ``smallagg`` fold — no window
  shuffle, no per-key Python).
- :func:`zscore_outlier_counts` — per-group count of |v − mean| > z·σ
  events. Two passes: grouped integer moment partials (count/sum/sum-of-
  squares over integer cents — order-independent, so bit-identical to the
  SQL oracle), then the per-group thresholds are broadcast (``ray.put``
  once, numpy searchsorted lookup per batch) into a second vectorized
  counting pass. No shuffle beyond the two tiny partial folds.
- :func:`grouped_quantiles` — EXACT per-group quantiles by simultaneous
  per-group INTEGER radix selection over cents: one vectorized histogram
  pass per round covers EVERY group and quantile at once (rows are coded to
  their group's active [lo, hi] range with array lookups — no per-group
  batch scans), each round narrows a (group, q) range by the bucket factor,
  and because bounds/steps are integers the bucketing is exact (no float
  edge drift) and convergence is guaranteed in ≤ ceil(64/log2(B)) rounds.

Money/metric values are quantized to integer cents (round half away from
zero, the repo-wide convention from ``relational._cents``) before any
arithmetic so distributed results are bit-identical to DuckDB oracles.

Reference semantics anchor: these generalize the reference's quality-SQL
checks (datacontract engine `quality` blocks run aggregates per model —
/root/reference/datacontract/engines/ soda duck layer); here they are
re-expressed as Ray Data partial-aggregate pipelines.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from raycontract.pipelines.smallagg import groupby_agg, groupby_sum

_NULLG = np.int64(-(2 ** 62))  # sentinel composite code for a NULL group key


def _cents_np(col) -> np.ndarray:
    """int64 cents with SQL ROUND (half away from zero) semantics.
    Caller must have dropped/filled nulls."""
    a = pc.cast(pc.round(pc.multiply(pc.cast(col, pa.float64()), 100.0),
                         round_mode="half_towards_infinity"), pa.int64())
    return np.asarray(a)


def _ts_us(col) -> np.ndarray:
    return np.asarray(pc.cast(col, pa.timestamp("us"))).astype(
        "datetime64[us]").view(np.int64)


def _group_codes(col) -> np.ndarray:
    """int64 composite code per row: the key itself, with NULL keys mapped
    to a reserved sentinel so they group together (SQL GROUP BY keeps them)."""
    gn = np.asarray(pc.is_null(col))
    g = np.asarray(pc.fill_null(pc.cast(col, pa.int64()), 0))
    return np.where(gn, _NULLG, g)


def _field_type(ds, col: str) -> pa.DataType:
    """Arrow type of ``col`` from a Dataset schema, whether the blocks are
    Arrow (``base_schema`` is a pyarrow Schema) or pandas (types carry numpy
    / pandas extension dtypes — nullable ints map to their arrow ints)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.field(col).type
    t = dict(zip(sch.names, sch.types))[col]
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.int64()  # pandas nullable-integer extension dtypes


def _codes_to_arrow(codes: np.ndarray, gtype: pa.DataType):
    isnull = codes == _NULLG
    arr = pa.array(np.where(isnull, 0, codes))
    return pc.if_else(pa.array(isnull), pa.scalar(None, pa.int64()),
                      arr).cast(gtype)


# --------------------------------------------------------------- first/last


def _pack_be(*cols: np.ndarray) -> pa.Array:
    """Pack int64 columns into fixed-width big-endian byte keys whose
    LEXICOGRAPHIC order equals the tuple order of the inputs (inputs must be
    non-negative in every ORDERING position; trailing payload columns may be
    any int64 — they ride along without affecting comparisons unless the
    ordering prefix ties)."""
    n = len(cols[0])
    w = 8 * len(cols)
    buf = np.empty((n, w), dtype=np.uint8)
    for i, c in enumerate(cols):
        buf[:, 8 * i:8 * (i + 1)] = (
            c.astype(">i8").view(np.uint8).reshape(-1, 8))
    raw = buf.tobytes(order="C")
    return pa.array([raw[i * w:(i + 1) * w] for i in range(n)],
                    type=pa.binary())


def _unpack_be(col, ncols: int) -> list[np.ndarray]:
    joined = b"".join(col.to_pylist())
    flat = np.frombuffer(joined, dtype=np.uint8).reshape(-1, 8 * ncols)
    return [flat[:, 8 * i:8 * (i + 1)].copy().view(">i8").ravel().astype(np.int64)
            for i in range(ncols)]


def first_last_by(ds, group_col: str, ts_col: str, tiebreak_col: str,
                  value_col: str):
    """Per group: the value of the FIRST and LAST row under
    ``ORDER BY ts, tiebreak`` plus the row count — SQL
    ``first_value/last_value OVER (PARTITION BY g ORDER BY ts, tb)``.

    Scale shape: each block contributes ONE row per group present in it
    (arg-min and arg-max found with a single lexsort + run-boundary mask —
    no per-group Python), with the (ts, tiebreak, value-cents) triple packed
    into a 24-byte big-endian key so the cross-block reduce is a plain
    grouped binary min/max over ≤ groups × blocks rows (adaptive
    ``smallagg`` fold: polars on the driver when tiny, distributed groupby
    beyond 2M partials). ts and tiebreak must be non-negative (timestamps
    and surrogate keys are); null values quantize to 0 cents (gate queries
    use non-null money columns).

    Output columns: ``{group_col}, first_cents, last_cents, n_rows``
    (null group keys form their own group, SQL-style).
    """
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"gn": pa.array([], pa.bool_()),
                             "g": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.binary()),
                             "lp": pa.array([], pa.binary()),
                             "n": pa.array([], pa.int64())})
        gn = np.asarray(pc.is_null(batch[group_col]))
        g = np.asarray(pc.fill_null(pc.cast(batch[group_col], pa.int64()), 0))
        ts = _ts_us(batch[ts_col])
        tb = np.asarray(pc.cast(batch[tiebreak_col], pa.int64()))
        val = _cents_np(pc.fill_null(pc.cast(batch[value_col], pa.float64()), 0.0))
        order = np.lexsort((tb, ts, g, gn))
        gs, gns = g[order], gn[order]
        starts = np.flatnonzero(
            np.concatenate(([True], (gs[1:] != gs[:-1]) | (gns[1:] != gns[:-1]))))
        ends = np.concatenate((starts[1:], [len(gs)])) - 1
        first_i, last_i = order[starts], order[ends]
        return pa.table({
            "gn": pa.array(gns[starts]),
            "g": pa.array(gs[starts]),
            "fp": _pack_be(ts[first_i], tb[first_i], val[first_i]),
            "lp": _pack_be(ts[last_i], tb[last_i], val[last_i]),
            "n": pa.array((ends - starts + 1).astype(np.int64)),
        })

    gtype = _field_type(ds, group_col)
    partials = ds.select_columns(
        [group_col, ts_col, tiebreak_col, value_col]).map_batches(
        partial, batch_format="pyarrow")
    folded = groupby_agg(partials, ["gn", "g"],
                         {"fp": "min", "lp": "max", "n": "sum"})
    out = pa.concat_tables(
        [pa.table(t) for t in ray.get(folded.to_arrow_refs()) if t.num_rows])
    if out.num_rows == 0:
        return pa.table({group_col: pa.array([], gtype),
                         "first_cents": pa.array([], pa.int64()),
                         "last_cents": pa.array([], pa.int64()),
                         "n_rows": pa.array([], pa.int64())})
    first_vals = _unpack_be(out["fp"], 3)[2]
    last_vals = _unpack_be(out["lp"], 3)[2]
    gn = np.asarray(out["gn"])
    g = np.asarray(out["g"], dtype=np.int64)
    codes = np.where(gn, _NULLG, g)
    return pa.table({group_col: _codes_to_arrow(codes, gtype),
                     "first_cents": pa.array(first_vals),
                     "last_cents": pa.array(last_vals),
                     "n_rows": out["n"].cast(pa.int64())})


# ------------------------------------------------------------------ z-score


def zscore_outlier_counts(ds, group_col: str, value_col: str, z: float = 2.0,
                          max_broadcast: int = 5_000_000):
    """Per group: how many rows have |v − mean_g| > z·σ_g (population σ),
    with v in integer cents. Null values are excluded (SQL semantics).

    Two passes, no row shuffle:
      1. grouped integer moments (n, Σv, Σv²) as per-block partials +
         adaptive fold — INTEGER sums, so the moments are exact and
         order-independent (bit-identical to the SQL oracle; Σv² stays
         within int64 for |v| ≤ ~3e5 cents × ≤1e8 rows/group — raise the
         quantization unit or widen to per-block hugeint partials beyond);
      2. the per-group (mean, threshold) table is broadcast once via
         ``ray.put`` (raises if groups exceed ``max_broadcast`` — use a
         bucketed join at that cardinality) and a second vectorized pass
         counts exceedances per group.

    The threshold math replicates the oracle expression ORDER EXACTLY
    (mean = Σv/n in float64; var = Σv²/n − mean²; thr = z·sqrt(var)) so
    borderline comparisons agree bitwise with DuckDB.

    Output: ``{group_col}, n_rows, n_outliers``.
    """
    gtype = _field_type(ds, group_col)

    def moments(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sv": pa.array([], pa.int64()),
                             "sq": pa.array([], pa.int64())})
        v = _cents_np(t[value_col])
        comp = _group_codes(t[group_col])
        uniq, inv = np.unique(comp, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        sv = np.zeros(len(uniq), dtype=np.int64)
        sq = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sv, inv, v)
        np.add.at(sq, inv, v * v)
        return pa.table({"g": pa.array(uniq), "n": pa.array(n),
                         "sv": pa.array(sv), "sq": pa.array(sq)})

    proj = ds.select_columns([group_col, value_col])
    stats = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(proj.map_batches(moments, batch_format="pyarrow"),
                        ["g"], ["n", "sv", "sq"]).to_arrow_refs())
         if t.num_rows])
    if stats.num_rows == 0:
        return pa.table({group_col: pa.array([], gtype),
                         "n_rows": pa.array([], pa.int64()),
                         "n_outliers": pa.array([], pa.int64())})
    if stats.num_rows > max_broadcast:
        raise ValueError(
            f"{stats.num_rows} groups exceed max_broadcast={max_broadcast}; "
            "use a bucketed join for the second pass at this cardinality")
    n = np.asarray(stats["n"], dtype=np.float64)
    sv = np.asarray(stats["sv"], dtype=np.float64)
    sq = np.asarray(stats["sq"], dtype=np.float64)
    mean = sv / n
    thr = z * np.sqrt(np.maximum(sq / n - mean * mean, 0.0))
    codes = np.asarray(stats["g"], dtype=np.int64)
    order = np.argsort(codes, kind="stable")
    lut_ref = ray.put({"keys": codes[order], "mean": mean[order],
                       "thr": thr[order]})

    def count_out(batch: pa.Table, _ref=lut_ref) -> pa.Table:
        lut = ray.get(_ref)
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "n_outliers": pa.array([], pa.int64())})
        v = _cents_np(t[value_col]).astype(np.float64)
        comp = _group_codes(t[group_col])
        idx = np.searchsorted(lut["keys"], comp)
        out = np.abs(v - lut["mean"][idx]) > lut["thr"][idx]
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, out.astype(np.int64))
        return pa.table({"g": pa.array(uniq), "n_outliers": pa.array(cnt)})

    counts = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(proj.map_batches(count_out, batch_format="pyarrow"),
                        ["g"], ["n_outliers"]).to_arrow_refs())
         if t.num_rows])
    # align the tiny (groups-sized) stats and counts tables on the driver
    n_out = np.zeros(stats.num_rows, dtype=np.int64)
    if counts.num_rows:
        ccodes = np.asarray(counts["g"], dtype=np.int64)
        cvals = np.asarray(counts["n_outliers"], dtype=np.int64)
        corder = np.argsort(ccodes, kind="stable")
        ccodes, cvals = ccodes[corder], cvals[corder]
        pos = np.searchsorted(ccodes, codes)
        hit = pos < len(ccodes)
        pos = np.minimum(pos, len(ccodes) - 1)
        match = hit & (ccodes[pos] == codes)
        n_out[match] = cvals[pos[match]]
    return pa.table({group_col: _codes_to_arrow(codes, gtype),
                     "n_rows": stats["n"].cast(pa.int64()),
                     "n_outliers": pa.array(n_out)})


# ------------------------------------------------------- grouped quantiles


def grouped_quantiles(ds, group_col: str, value_col: str,
                      qs: Sequence[float] = (0.25, 0.5, 0.75),
                      buckets: int = 1024, collect_limit: int = 200_000,
                      max_groups: int = 100_000):
    """EXACT per-group quantiles (DuckDB ``quantile_disc`` semantics: the
    value at 1-based rank ``ceil(q*n_g)`` over the group's non-null values
    ascending, in integer cents) by simultaneous per-group INTEGER radix
    selection.

    Unlike a per-group loop, every histogram round is ONE vectorized pass
    over the column for ALL groups and ALL quantiles: rows are mapped to
    their group's active [lo, hi] integer range with array lookups
    (searchsorted on the sorted group keys), bucketed with integer
    ``(v - lo) // step`` arithmetic (exact — no float edge drift), and
    counted with a single bincount-style reduce over sparse
    (state, group*B + bucket) codes. Each round divides every active range
    by the bucket factor, so convergence takes ≤ ceil(64 / log2(buckets))
    rounds no matter the value distribution; any (group, q) whose active
    range holds ≤ ``collect_limit`` values is gathered in a shared pass and
    answered exactly with one ``np.partition``. Group-key cardinality must
    fit the driver (≤ ``max_groups``); beyond that, shard by group hash.

    Output rows: ``({group_col}, q double, value_cents int64)``.
    """
    gtype = _field_type(ds, group_col)
    proj = ds.select_columns([group_col, value_col]).materialize()

    def keyed(batch: pa.Table):
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return _group_codes(t[group_col]), _cents_np(t[value_col])

    def mmc(batch: pa.Table) -> pa.Table:
        comp, v = keyed(batch)
        if len(comp) == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        uniq, inv = np.unique(comp, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        mn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, inv, v)
        np.maximum.at(mx, inv, v)
        return pa.table({"g": pa.array(uniq), "n": pa.array(n),
                         "mn": pa.array(mn), "mx": pa.array(mx)})

    base = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_agg(proj.map_batches(mmc, batch_format="pyarrow"),
                        ["g"], {"n": "sum", "mn": "min", "mx": "max"}
                        ).to_arrow_refs())
         if t.num_rows])
    if base.num_rows == 0:
        return pa.table({group_col: pa.array([], gtype),
                         "q": pa.array([], pa.float64()),
                         "value_cents": pa.array([], pa.int64())})
    if base.num_rows > max_groups:
        raise ValueError(f"{base.num_rows} groups exceed max_groups={max_groups}")
    order = np.argsort(np.asarray(base["g"]), kind="stable")
    gkeys = np.asarray(base["g"])[order]
    gn_total = np.asarray(base["n"])[order]
    gmn = np.asarray(base["mn"])[order]
    gmx = np.asarray(base["mx"])[order]
    G, Q = len(gkeys), len(qs)

    # flat state arrays over (state=q index, group)
    k = np.empty((Q, G), dtype=np.int64)
    for si, q in enumerate(qs):
        k[si] = np.maximum(0, np.ceil(q * gn_total).astype(np.int64) - 1)
    lo = np.tile(gmn, (Q, 1))
    hi = np.tile(gmx, (Q, 1))
    done = np.zeros((Q, G), dtype=bool)
    val = np.zeros((Q, G), dtype=np.int64)
    # a group's range size; single-value ranges are already answered
    single = lo == hi
    val[single] = lo[single]
    done[single] = True

    def collect(pend: np.ndarray) -> None:
        """Shared gather for every pending (q, group) range; ranges that
        coincide across q-states are fetched once."""
        sis, gis = np.nonzero(pend)
        if len(sis) == 0:
            return
        # dedupe identical (group, lo, hi) ranges (common: several qs of a
        # group still share the full range)
        spec_map: dict[tuple[int, int, int], int] = {}
        spec_of = np.empty(len(sis), dtype=np.int64)
        spec_g, spec_lo, spec_hi = [], [], []
        for i, (si, gi) in enumerate(zip(sis, gis)):
            key = (int(gi), int(lo[si, gi]), int(hi[si, gi]))
            if key not in spec_map:
                spec_map[key] = len(spec_g)
                spec_g.append(int(gi))
                spec_lo.append(int(lo[si, gi]))
                spec_hi.append(int(hi[si, gi]))
            spec_of[i] = spec_map[key]
        sg = np.array(spec_g, dtype=np.int64)
        sl = np.array(spec_lo, dtype=np.int64)
        sh = np.array(spec_hi, dtype=np.int64)
        # per group: indices of its specs (usually 1)
        by_g: dict[int, np.ndarray] = {}
        for g in np.unique(sg):
            by_g[int(g)] = np.flatnonzero(sg == g)

        def grab(batch: pa.Table, _keys=gkeys, _by_g=by_g, _sl=sl,
                 _sh=sh) -> pa.Table:
            comp, v = keyed(batch)
            if len(comp) == 0:
                return pa.table({"s": pa.array([], pa.int32()),
                                 "v": pa.array([], pa.int64())})
            gi = np.searchsorted(_keys, comp)
            out_s, out_v = [], []
            for g, spec_ids in _by_g.items():
                gm = gi == g
                if not gm.any():
                    continue
                vg = v[gm]
                for sidx in spec_ids:
                    m = (vg >= _sl[sidx]) & (vg <= _sh[sidx])
                    if m.any():
                        out_s.append(np.full(int(m.sum()), sidx, dtype=np.int32))
                        out_v.append(vg[m])
            if not out_s:
                return pa.table({"s": pa.array([], pa.int32()),
                                 "v": pa.array([], pa.int64())})
            return pa.table({"s": pa.array(np.concatenate(out_s)),
                             "v": pa.array(np.concatenate(out_v))})

        parts = [pa.table(t) for t in ray.get(
            proj.map_batches(grab, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows]
        ss = (np.concatenate([np.asarray(t["s"]) for t in parts])
              if parts else np.empty(0, dtype=np.int32))
        vv = (np.concatenate([np.asarray(t["v"]) for t in parts])
              if parts else np.empty(0, dtype=np.int64))
        vorder = np.argsort(ss, kind="stable")
        ss, vv = ss[vorder], vv[vorder]
        bounds = np.searchsorted(ss, np.arange(len(sg) + 1))
        for i, (si, gi) in enumerate(zip(sis, gis)):
            sidx = spec_of[i]
            vals = vv[bounds[sidx]:bounds[sidx + 1]]
            if vals.size:
                kk = min(int(k[si, gi]), vals.size - 1)
                val[si, gi] = int(np.partition(vals, kk)[kk])
            else:  # empty range: degenerate, answer the lower bound
                val[si, gi] = int(lo[si, gi])
            done[si, gi] = True

    if int(gn_total.sum()) <= collect_limit:
        collect(~done)
    else:
        # integer radix: guaranteed ≤ ceil(64/log2(B)) rounds
        for _ in range(max(1, -(-64 // max(1, int(np.log2(buckets)))))):
            act = ~done
            if not act.any():
                break
            # per-state step lookup tables shipped into ONE histogram pass
            width = hi - lo  # ≥ 1 wherever active
            step = width // buckets + 1
            lo_t, step_t, act_t = lo.copy(), step.copy(), act.copy()

            def hist(batch: pa.Table, _keys=gkeys, _lo=lo_t, _st=step_t,
                     _act=act_t, _hi=hi.copy(), _B=buckets, _Q=Q) -> pa.Table:
                comp, v = keyed(batch)
                if len(comp) == 0:
                    return pa.table({"code": pa.array([], pa.int64()),
                                     "c": pa.array([], pa.int64())})
                gi = np.searchsorted(_keys, comp)
                out_code, out_cnt = [], []
                for si in range(_Q):
                    inr = _act[si, gi] & (v >= _lo[si, gi]) & (v <= _hi[si, gi])
                    if not inr.any():
                        continue
                    b = (v[inr] - _lo[si, gi[inr]]) // _st[si, gi[inr]]
                    code = (np.int64(si) * len(_keys) + gi[inr]) * _B + b
                    uniq, cnt = np.unique(code, return_counts=True)
                    out_code.append(uniq)
                    out_cnt.append(cnt.astype(np.int64))
                if not out_code:
                    return pa.table({"code": pa.array([], pa.int64()),
                                     "c": pa.array([], pa.int64())})
                return pa.table({"code": pa.array(np.concatenate(out_code)),
                                 "c": pa.array(np.concatenate(out_cnt))})

            folded = pa.concat_tables(
                [pa.table(t) for t in ray.get(
                    groupby_sum(proj.map_batches(hist, batch_format="pyarrow"),
                                ["code"], ["c"]).to_arrow_refs())
                 if t.num_rows])
            fcode = (np.asarray(folded["code"]) if folded.num_rows
                     else np.empty(0, dtype=np.int64))
            fc = (np.asarray(folded["c"]) if folded.num_rows
                  else np.empty(0, dtype=np.int64))
            forder = np.argsort(fcode, kind="stable")
            fcode, fc = fcode[forder], fc[forder]
            pend = np.zeros((Q, G), dtype=bool)
            for si in range(Q):
                for gi in np.flatnonzero(act[si]):
                    base_code = (np.int64(si) * G + gi) * buckets
                    a = np.searchsorted(fcode, base_code)
                    b = np.searchsorted(fcode, base_code + buckets)
                    bsel, cc = fcode[a:b] - base_code, fc[a:b]
                    cum = np.cumsum(cc)
                    pos = int(np.searchsorted(cum, k[si, gi] + 1))
                    if pos >= len(cc):  # should not happen; degenerate guard
                        val[si, gi] = int(lo[si, gi])
                        done[si, gi] = True
                        continue
                    idx = int(bsel[pos])
                    k[si, gi] -= int(cum[pos - 1]) if pos > 0 else 0
                    st = int(step[si, gi])
                    new_lo = int(lo[si, gi]) + idx * st
                    new_hi = min(int(hi[si, gi]), new_lo + st - 1)
                    lo[si, gi], hi[si, gi] = new_lo, new_hi
                    if new_lo == new_hi:
                        val[si, gi] = new_lo
                        done[si, gi] = True
                    elif int(cc[pos]) <= collect_limit:
                        pend[si, gi] = True
            if pend.any():
                collect(pend)
        if (~done).any():  # guaranteed-converged; guard anyway
            collect(~done)

    out_g = np.tile(gkeys, Q)
    out_q = np.repeat(np.asarray(qs, dtype=np.float64), G)
    return pa.table({group_col: _codes_to_arrow(out_g, gtype),
                     "q": pa.array(out_q),
                     "value_cents": pa.array(val.reshape(-1))})


# -------------------------------------------------------------- Tukey IQR


def tukey_outlier_counts(ds, group_col: str, value_col: str,
                         max_broadcast: int = 5_000_000):
    """Per group: Tukey's boxplot rule — how many rows fall outside
    ``[q1 − 1.5·IQR, q3 + 1.5·IQR]`` with q1/q3 the EXACT per-group
    quartiles (``quantile_disc`` semantics over integer cents, from
    :func:`grouped_quantiles`' simultaneous radix selection).

    The fence comparison is EXACT INTEGER arithmetic — the half-cent of
    1.5·IQR is removed by doubling both sides:
    ``v < q1 − 1.5·IQR  ⇔  2v < 2·q1 − 3·(q3 − q1)`` — so the distributed
    count is bit-identical to the SQL oracle (no float fences). The robust
    sibling of :func:`zscore_outlier_counts` (mean/σ chase the outliers
    they're meant to flag; quartile fences don't).

    Two passes: the quartile selection (narrow histogram rounds), then the
    per-group integer fences broadcast once (``ray.put`` + searchsorted
    lookup) into a vectorized counting pass. Null values excluded (SQL
    aggregate semantics).

    Output: ``({group_col}, q1_cents, q3_cents, n_rows, n_outliers)``.
    """
    gtype = _field_type(ds, group_col)
    proj = ds.select_columns([group_col, value_col])
    qt = grouped_quantiles(proj, group_col, value_col, qs=(0.25, 0.75))
    if qt.num_rows == 0:
        z0 = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], gtype), "q1_cents": z0,
                         "q3_cents": z0, "n_rows": z0, "n_outliers": z0})
    # long (group, q, value) → per-group (q1, q3) on the driver
    qv = np.asarray(qt["q"], dtype=np.float64)
    gcol = qt[group_col]
    gn = np.asarray(pc.is_null(gcol))
    g = np.where(gn, _NULLG,
                 np.asarray(pc.fill_null(pc.cast(gcol, pa.int64()), 0)))
    vals = np.asarray(qt["value_cents"], dtype=np.int64)
    m1, m3 = qv == 0.25, qv == 0.75
    g1 = g[m1]
    o1 = np.argsort(g1, kind="stable")
    gkeys, q1 = g1[o1], vals[m1][o1]
    g3 = g[m3]
    o3 = np.argsort(g3, kind="stable")
    q3 = vals[m3][o3]
    assert np.array_equal(gkeys, g3[o3])
    if len(gkeys) > max_broadcast:
        raise ValueError(
            f"{len(gkeys)} groups exceed max_broadcast={max_broadcast}; "
            "bucketed join needed for the counting pass at this cardinality")
    iqr3 = 3 * (q3 - q1)
    lut_ref = ray.put({"keys": gkeys, "lo2": 2 * q1 - iqr3,
                       "hi2": 2 * q3 + iqr3})

    def count_out(batch: pa.Table, _ref=lut_ref) -> pa.Table:
        lut = ray.get(_ref)
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            z0 = pa.array([], pa.int64())
            return pa.table({"g": z0, "n": z0, "n_out": z0})
        v2 = 2 * _cents_np(t[value_col])
        comp = _group_codes(t[group_col])
        idx = np.searchsorted(lut["keys"], comp)
        out = (v2 < lut["lo2"][idx]) | (v2 > lut["hi2"][idx])
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(cnt, inv, out.astype(np.int64))
        return pa.table({"g": pa.array(uniq),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "n_out": pa.array(cnt)})

    counts = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(proj.map_batches(count_out, batch_format="pyarrow"),
                        ["g"], ["n", "n_out"]).to_arrow_refs())
         if t.num_rows])
    cc = np.asarray(counts["g"], dtype=np.int64)
    co = np.argsort(cc, kind="stable")
    cc = cc[co]
    cn = np.asarray(counts["n"], dtype=np.int64)[co]
    cout = np.asarray(counts["n_out"], dtype=np.int64)[co]
    pos = np.searchsorted(cc, gkeys)
    assert np.array_equal(cc[pos], gkeys)
    return pa.table({group_col: _codes_to_arrow(gkeys, gtype),
                     "q1_cents": pa.array(q1), "q3_cents": pa.array(q3),
                     "n_rows": pa.array(cn[pos]),
                     "n_outliers": pa.array(cout[pos])})


# --------------------------------------------------------------------- MAD


def mad_outlier_counts(ds, group_col: str, value_col: str, k: int = 3,
                       max_broadcast: int = 5_000_000):
    """Per group: median / MAD (median absolute deviation) robust outlier
    counts — rows with ``|v − median_g| > k·MAD_g`` in EXACT integer cents
    (``quantile_disc`` medians; no float scale factor — the classic 1.4826
    consistency constant is deliberately folded into ``k`` so every
    comparison stays integer-exact and oracle-reproducible).

    Composition shape: one :func:`grouped_quantiles` radix selection for
    the medians, a broadcast map deriving ``|v − median_g|``, a SECOND
    radix selection over the DERIVED column for the MADs, then the usual
    broadcast counting pass. Each selection is O(rounds) narrow passes; no
    row shuffle anywhere.

    Output: ``({group_col}, median_cents, mad_cents, n_rows, n_outliers)``.
    """
    gtype = _field_type(ds, group_col)
    proj = ds.select_columns([group_col, value_col])
    med_t = grouped_quantiles(proj, group_col, value_col, qs=(0.5,))
    if med_t.num_rows == 0:
        z = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], gtype), "median_cents": z,
                         "mad_cents": z, "n_rows": z, "n_outliers": z})
    mg = med_t[group_col]
    mgn = np.asarray(pc.is_null(mg))
    gkeys = np.where(mgn, _NULLG,
                     np.asarray(pc.fill_null(pc.cast(mg, pa.int64()), 0)))
    meds = np.asarray(med_t["value_cents"], dtype=np.int64)
    order = np.argsort(gkeys, kind="stable")
    gkeys, meds = gkeys[order], meds[order]
    if len(gkeys) > max_broadcast:
        raise ValueError(f"{len(gkeys)} groups exceed {max_broadcast}")
    med_ref = ray.put({"keys": gkeys, "med": meds})

    def to_dev(batch: pa.Table, _ref=med_ref) -> pa.Table:
        lut = ray.get(_ref)
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.int64()),
                             value_col: pa.array([], pa.float64())})
        vc = _cents_np(t[value_col])
        comp = _group_codes(t[group_col])
        idx = np.searchsorted(lut["keys"], comp)
        dev = np.abs(vc - lut["med"][idx])
        # /100.0 so grouped_quantiles' cents quantization recovers the
        # integer deviation exactly (cents < 2^53)
        return pa.table({group_col: _codes_to_arrow(comp, pa.int64()),
                         value_col: pa.array(dev / 100.0)})

    derived = proj.map_batches(to_dev, batch_format="pyarrow")
    mad_t = grouped_quantiles(derived, group_col, value_col, qs=(0.5,))
    madg = mad_t[group_col]
    madgn = np.asarray(pc.is_null(madg))
    mk = np.where(madgn, _NULLG,
                  np.asarray(pc.fill_null(pc.cast(madg, pa.int64()), 0)))
    mads = np.asarray(mad_t["value_cents"], dtype=np.int64)
    mo = np.argsort(mk, kind="stable")
    mk, mads = mk[mo], mads[mo]
    assert np.array_equal(mk, gkeys)
    thr_ref = ray.put({"keys": gkeys, "med": meds, "thr": k * mads})

    def count_out(batch: pa.Table, _ref=thr_ref) -> pa.Table:
        lut = ray.get(_ref)
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"g": z, "n": z, "n_out": z})
        vc = _cents_np(t[value_col])
        comp = _group_codes(t[group_col])
        idx = np.searchsorted(lut["keys"], comp)
        out = np.abs(vc - lut["med"][idx]) > lut["thr"][idx]
        uniq, inv = np.unique(comp, return_inverse=True)
        cnt = np.zeros(len(uniq), np.int64)
        np.add.at(cnt, inv, out.astype(np.int64))
        return pa.table({"g": pa.array(uniq),
                         "n": pa.array(np.bincount(inv).astype(np.int64)),
                         "n_out": pa.array(cnt)})

    counts = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(proj.map_batches(count_out, batch_format="pyarrow"),
                        ["g"], ["n", "n_out"]).to_arrow_refs())
         if t.num_rows])
    cc = np.asarray(counts["g"], dtype=np.int64)
    co = np.argsort(cc, kind="stable")
    cc = cc[co]
    cn = np.asarray(counts["n"], dtype=np.int64)[co]
    cout = np.asarray(counts["n_out"], dtype=np.int64)[co]
    pos = np.searchsorted(cc, gkeys)
    assert np.array_equal(cc[pos], gkeys)
    return pa.table({group_col: _codes_to_arrow(gkeys, gtype),
                     "median_cents": pa.array(meds),
                     "mad_cents": pa.array(mads),
                     "n_rows": pa.array(cn[pos]),
                     "n_outliers": pa.array(cout[pos])})
