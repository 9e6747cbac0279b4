"""Distribution-profile validation operators (north-star "distribution
drift" family, SURVEY §2a #18): PSI drift, Benford first-digit conformance,
and Pearson correlation — each ONE vectorized pass producing integer partial
counts/moments (order-independent, exactly reproducible in SQL) plus a
derived float metric emitted in integer micro-units so a 1-ulp libm
difference between numpy and the oracle can never flip the value hash.

Scale shape: every operator is map_batches partials → one adaptive
``smallagg`` fold (≤ groups×blocks tiny rows) → driver math on the
groups-sized result. No row shuffle anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from raycontract.pipelines.groupstats import _ts_us
from raycontract.pipelines.smallagg import groupby_agg, groupby_sum


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """SQL ROUND (half away from zero) for float arrays → int64."""
    return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)


# ------------------------------------------------------------------- PSI


def psi_by_group(ds, group_col: str, value_col: str, bucket_width: int,
                 scale: float = 1.0):
    """Population Stability Index of each group's ``value_col`` distribution
    against the GLOBAL distribution, over fixed-width integer buckets
    (``bucket = floor(value*scale) // bucket_width``) with add-one
    smoothing: PSI_g = Σ_b (p_gb − p_b)·ln(p_gb/p_b), where
    p = (n_b + 1) / (N + B) over the union of observed buckets B.

    The distributed work is ONE pass of (group, bucket, count) partials +
    one tiny fold; the PSI itself is driver math over ≤ groups×buckets
    rows. Emitted as ``psi_micro`` (int64, PSI×1e6 rounded) so the oracle's
    ln() agrees despite last-bit libm differences.

    Output: ``({group_col}, n_rows, psi_micro)`` sorted by group.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_kleene(pc.is_valid(batch[value_col]),
                                       pc.is_valid(batch[group_col])))
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = np.floor(np.asarray(pc.cast(t[value_col], pa.float64())) * scale
                     ).astype(np.int64) // bucket_width
        g = np.asarray(t[group_col].cast(pa.string()))
        # stable composite codes via sorted uniques of the batch
        ug, gi = np.unique(g, return_inverse=True)
        ub, bi = np.unique(v, return_inverse=True)
        code = gi.astype(np.int64) * len(ub) + bi
        uc, cnt = np.unique(code, return_counts=True)
        return pa.table({"g": pa.array(ug[(uc // len(ub))]),
                         "b": pa.array(ub[(uc % len(ub))]),
                         "n": pa.array(cnt.astype(np.int64))})

    folded = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(ds.select_columns([group_col, value_col]).map_batches(
                partial, batch_format="pyarrow"), ["g", "b"], ["n"]
            ).to_arrow_refs())
         if t.num_rows])
    if folded.num_rows == 0:
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_rows": pa.array([], pa.int64()),
                         "psi_micro": pa.array([], pa.int64())})
    g = np.asarray(folded["g"])
    b = np.asarray(folded["b"], dtype=np.int64)
    n = np.asarray(folded["n"], dtype=np.int64)
    buckets_all = np.unique(b)
    B = len(buckets_all)
    bidx = np.searchsorted(buckets_all, b)
    glob = np.zeros(B, dtype=np.int64)
    np.add.at(glob, bidx, n)
    N = int(glob.sum())
    p_glob = (glob + 1.0) / (N + B)
    groups = np.unique(g)
    out_n, out_psi = [], []
    for gv in groups:
        m = g == gv
        cnts = np.zeros(B, dtype=np.int64)
        cnts[bidx[m]] = n[m]
        ng = int(cnts.sum())
        p_g = (cnts + 1.0) / (ng + B)
        psi = float(np.sum((p_g - p_glob) * np.log(p_g / p_glob)))
        out_n.append(ng)
        out_psi.append(psi)
    return pa.table({group_col: pa.array(groups.tolist(), type=pa.string()),
                     "n_rows": pa.array(out_n, type=pa.int64()),
                     "psi_micro": pa.array(
                         _round_half_away(np.asarray(out_psi) * 1e6))})


# ---------------------------------------------------------------- Benford


def benford_profile(ds, value_col: str, scale: float = 100.0):
    """First-significant-digit profile of ``round(value*scale)`` vs the
    Benford expectation — the classic fabricated-data screen. Counting is
    ONE pass of per-digit partials (leading digit extracted with ≤18
    vectorized integer divisions — string-free, exact, matching the SQL
    ``substr(CAST(v AS VARCHAR), 1, 1)`` semantics for positive ints);
    zero/negative values are excluded. The per-digit Benford expectation
    and the chi-square contribution are emitted in integer micro-units.

    Output: ``(digit 1-9, n, expected_micro, chi2_micro)``.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[value_col]))
        if t.num_rows == 0:
            return pa.table({"digit": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        v = _round_half_away(
            np.asarray(pc.cast(t[value_col], pa.float64())) * scale)
        v = v[v > 0]
        while (v >= 10).any():
            v = np.where(v >= 10, v // 10, v)
        cnt = np.bincount(v, minlength=10)[1:10]
        return pa.table({"digit": pa.array(np.arange(1, 10, dtype=np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    folded = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(ds.select_columns([value_col]).map_batches(
                partial, batch_format="pyarrow"), ["digit"], ["n"]
            ).to_arrow_refs())
         if t.num_rows])
    d = np.asarray(folded["digit"], dtype=np.int64)
    n = np.asarray(folded["n"], dtype=np.float64)
    order = np.argsort(d)
    d, n = d[order], n[order]
    N = n.sum()
    p = np.log10(1.0 + 1.0 / d.astype(np.float64))
    expected = N * p
    chi2 = np.where(expected > 0, (n - expected) ** 2 / expected, 0.0)
    return pa.table({"digit": pa.array(d),
                     "n": pa.array(n.astype(np.int64)),
                     "expected_micro": pa.array(_round_half_away(expected * 1e6)),
                     "chi2_micro": pa.array(_round_half_away(chi2 * 1e6))})


# ------------------------------------------------------------- correlation


def pearson_corr(ds, x_col: str, y_col: str, x_scale: float = 100.0,
                 y_scale: float = 100.0):
    """Pearson correlation of two columns via integer moment partials
    (n, Σx, Σy, Σx², Σy², Σxy over scaled ints — exact and
    order-independent; Σxy fits int64 for |x·y| ≤ ~9e18/rows, which holds
    for cents×centi-units at ≤1e8 rows per block-sum — beyond that, widen
    the partials). The correlation is computed from the folded moments in
    float64 with the same expression order as the SQL oracle and emitted as
    ``corr_micro`` (int64).

    Output: one row ``(n_rows, corr_micro)``.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_kleene(pc.is_valid(batch[x_col]),
                                       pc.is_valid(batch[y_col])))
        if t.num_rows == 0:
            z = pa.array([0], type=pa.int64())
            return pa.table({"k": pa.array([1], type=pa.int64()), "n": z,
                             "sx": z, "sy": z, "sxx": z, "syy": z, "sxy": z})
        x = _round_half_away(np.asarray(pc.cast(t[x_col], pa.float64())) * x_scale)
        y = _round_half_away(np.asarray(pc.cast(t[y_col], pa.float64())) * y_scale)
        return pa.table({"k": pa.array([1], type=pa.int64()),
                         "n": pa.array([len(x)], type=pa.int64()),
                         "sx": pa.array([int(x.sum())], type=pa.int64()),
                         "sy": pa.array([int(y.sum())], type=pa.int64()),
                         "sxx": pa.array([int((x * x).sum())], type=pa.int64()),
                         "syy": pa.array([int((y * y).sum())], type=pa.int64()),
                         "sxy": pa.array([int((x * y).sum())], type=pa.int64())})

    folded = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(ds.select_columns([x_col, y_col]).map_batches(
                partial, batch_format="pyarrow"), ["k"],
                ["n", "sx", "sy", "sxx", "syy", "sxy"]).to_arrow_refs())
         if t.num_rows])
    n = float(folded["n"][0].as_py())
    sx = float(folded["sx"][0].as_py())
    sy = float(folded["sy"][0].as_py())
    sxx = float(folded["sxx"][0].as_py())
    syy = float(folded["syy"][0].as_py())
    sxy = float(folded["sxy"][0].as_py())
    denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    corr = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    return pa.table({"n_rows": pa.array([int(n)], type=pa.int64()),
                     "corr_micro": pa.array(
                         _round_half_away(np.asarray([corr * 1e6])))})


# ----------------------------------------------------------- quality trend


def quality_trend(ds, ts_col: str, value_col: str, id_col: str,
                  bucket_s: int = 86400):
    """Time-bucketed data-quality monitor — the per-partition trend the
    north-star asks lineage/metrics for, as a query: per time bucket
    (default daily), row count, null-value count, exact distinct id count,
    and min/max value in cents.

    Two shuffle-light passes over the projected columns: (1) per-bucket
    moment partials (count/nulls/min/max — one row per bucket per block) +
    one adaptive fold; (2) the exact distinct via the two-level pair
    combiner (``relational.grouped_count_distinct`` — shuffle volume is the
    distinct-pair set). Driver aligns the two bucket-sized results.

    Output: ``(bucket_us, n_rows, n_null, n_distinct_ids,
    min_cents, max_cents)`` — min/max null for all-null buckets.
    """
    from raycontract.pipelines.relational import grouped_count_distinct

    bucket_us = np.int64(bucket_s) * 1_000_000

    def moments(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"bkt": z, "n": z, "n_null": z, "n_valid": z,
                             "mn": z, "mx": z})
        day = (_ts_us(batch[ts_col]) // bucket_us) * bucket_us
        nullm = np.asarray(pc.is_null(batch[value_col]))
        v = _round_half_away(np.asarray(
            pc.fill_null(pc.cast(batch[value_col], pa.float64()), 0.0)) * 100.0)
        uniq, inv = np.unique(day, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        n_null = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n_null, inv, nullm.astype(np.int64))
        mn = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        valid = ~nullm
        np.minimum.at(mn, inv[valid], v[valid])
        np.maximum.at(mx, inv[valid], v[valid])
        return pa.table({"bkt": pa.array(uniq), "n": pa.array(n),
                         "n_null": pa.array(n_null),
                         "n_valid": pa.array(n - n_null),
                         "mn": pa.array(mn), "mx": pa.array(mx)})

    proj = ds.select_columns([ts_col, value_col, id_col])
    folded = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_agg(
                proj.map_batches(moments, batch_format="pyarrow"), ["bkt"],
                {"n": "sum", "n_null": "sum", "n_valid": "sum",
                 "mn": "min", "mx": "max"}).to_arrow_refs())
         if t.num_rows])

    def bucketed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"bkt": pa.array([], pa.int64()),
                             "id": pa.array([], pa.int64())})
        day = (_ts_us(batch[ts_col]) // bucket_us) * bucket_us
        return pa.table({"bkt": pa.array(day),
                         "id": batch[id_col].cast(pa.int64())})

    dist = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            grouped_count_distinct(
                proj.map_batches(bucketed, batch_format="pyarrow"),
                "bkt", "id").to_arrow_refs())
         if t.num_rows])
    # align by bucket on the driver (both tables are bucket-sized)
    b = np.asarray(folded["bkt"], dtype=np.int64)
    order = np.argsort(b, kind="stable")
    b = b[order]
    n = np.asarray(folded["n"], dtype=np.int64)[order]
    n_null = np.asarray(folded["n_null"], dtype=np.int64)[order]
    n_valid = np.asarray(folded["n_valid"], dtype=np.int64)[order]
    mn = np.asarray(folded["mn"], dtype=np.int64)[order]
    mx = np.asarray(folded["mx"], dtype=np.int64)[order]
    db = np.asarray(dist["bkt"], dtype=np.int64)
    dn = np.asarray(dist["n_distinct"], dtype=np.int64)
    dorder = np.argsort(db, kind="stable")
    db, dn = db[dorder], dn[dorder]
    pos = np.searchsorted(db, b)
    nd = np.zeros(len(b), dtype=np.int64)
    hit = pos < len(db)
    safe = np.minimum(pos, max(len(db) - 1, 0))
    match = hit & (db[safe] == b) if len(db) else np.zeros(len(b), dtype=bool)
    nd[match] = dn[safe[match]]
    empty = n_valid == 0
    mn_col = pc.if_else(pa.array(empty), pa.scalar(None, pa.int64()),
                        pa.array(mn))
    mx_col = pc.if_else(pa.array(empty), pa.scalar(None, pa.int64()),
                        pa.array(mx))
    return pa.table({"bucket_us": pa.array(b), "n_rows": pa.array(n),
                     "n_null": pa.array(n_null),
                     "n_distinct_ids": pa.array(nd),
                     "min_cents": mn_col, "max_cents": mx_col})


# ---------------------------------------------------------- control chart


def control_chart(ds, ts_col: str, bucket_s: int = 86400, window: int = 7,
                  z: int = 3, min_window: int = 3):
    """Volume control chart — the classic ingestion monitor: per time bucket
    (default daily) the row count, plus a flag when the count deviates more
    than ``z``·σ from the TRAILING ``window`` buckets' mean (current bucket
    excluded, present buckets only — ROWS semantics over the bucket series).

    The comparison is EXACT INTEGER arithmetic — no sqrt, no division:
    ``|x − s/w| > z·sqrt((w·ss − s²)/w²)  ⇔  (w·x − s)² > z²·(w·ss − s²)``
    with x the bucket count, s/ss the trailing sum / sum-of-squares and w
    the trailing bucket count — so the distributed result is bit-identical
    to the SQL window oracle (squares are taken in Python ints driver-side;
    the bucket series is tiny, and daily counts beyond ~3·10⁸ would
    overflow BIGINT in the oracle, not here).

    Distributed work: ONE pass of per-block bucket-count partials + one
    adaptive fold; the chart itself is driver math over the bucket series.

    Output: ``(bucket_us, n_rows, n_window, flagged)`` — flagged 0/1 int64,
    0 whenever fewer than ``min_window`` trailing buckets exist.
    """
    bucket_us = np.int64(bucket_s) * 1_000_000

    def counts(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[ts_col]))
        if t.num_rows == 0:
            z0 = pa.array([], pa.int64())
            return pa.table({"bkt": z0, "n": z0})
        day = (_ts_us(t[ts_col]) // bucket_us) * bucket_us
        uniq, cnt = np.unique(day, return_counts=True)
        return pa.table({"bkt": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    tabs = [pa.table(t) for t in ray.get(
        groupby_sum(ds.select_columns([ts_col]).map_batches(
            counts, batch_format="pyarrow"), ["bkt"], ["n"]
        ).to_arrow_refs())
        if t.num_rows]
    if not tabs:
        z0 = pa.array([], pa.int64())
        return pa.table({"bucket_us": z0, "n_rows": z0, "n_window": z0,
                         "flagged": z0})
    folded = pa.concat_tables(tabs)
    b = np.asarray(folded["bkt"], dtype=np.int64)
    order = np.argsort(b, kind="stable")
    b = b[order]
    n = np.asarray(folded["n"], dtype=np.int64)[order]
    # trailing-window chart over the (tiny) bucket series — Python ints so
    # the squared comparison can never overflow
    nw = np.zeros(len(b), dtype=np.int64)
    fl = np.zeros(len(b), dtype=np.int64)
    ints = [int(v) for v in n]
    for i in range(len(b)):
        lo = max(0, i - window)
        w = i - lo
        nw[i] = w
        if w >= min_window:
            s = sum(ints[lo:i])
            ss = sum(v * v for v in ints[lo:i])
            lhs = (w * ints[i] - s)
            if lhs * lhs > z * z * (w * ss - s * s):
                fl[i] = 1
    return pa.table({"bucket_us": pa.array(b), "n_rows": pa.array(n),
                     "n_window": pa.array(nw), "flagged": pa.array(fl)})


# --------------------------------------------- functional-dependency check


def fd_violations(ds, det_col: str, dep_col: str):
    """Functional-dependency validation: report every ``det_col`` value
    that maps to MORE THAN ONE distinct non-null ``dep_col`` value — the
    contract-level "A determines B" constraint (e.g. an order id must have
    one status). Null determinants form their own group, SQL-style.

    Scale shape: the exact two-level distinct-pair combiner
    (``relational.grouped_count_distinct`` — shuffle volume is the distinct
    (det, dep) pair set, not rows), then a vectorized ``> 1`` filter.

    Output: ``({det_col}, n_distinct_dep)``, violators only.
    """
    from raycontract.pipelines.relational import grouped_count_distinct

    counted = grouped_count_distinct(ds.select_columns([det_col, dep_col]),
                                     det_col, dep_col)

    def viol(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater(batch["n_distinct"], 1))
        return t.rename_columns([det_col, "n_distinct_dep"])

    return counted.map_batches(viol, batch_format="pyarrow")


# ------------------------------------------------------------- trend slope


def trend_slope_by_group(ds, group_col: str, ts_col: str, value_col: str,
                         y_scale: float = 100.0):
    """Per-group least-squares TREND of ``value_col`` over time — the drift
    monitor that complements :func:`control_chart` (level shifts) with
    slope ("this metric is creeping"). Slope is computed from INTEGER
    moment partials (n, Σx, Σy, Σx², Σxy with x = whole seconds since the
    global minimum timestamp, y = scaled ints — exact, order-independent;
    Σxy fits int64 for span_s × |y| × rows/group ≲ 9e18, widen partials
    beyond) in float64 with the SAME expression order as the SQL oracle,
    emitted as ``slope_day_micro`` (slope in y-units/day × 1e6, int64;
    0 when the group has a single distinct timestamp).

    Three shuffle-free passes: a global min-ts fold (one int per block),
    grouped moment partials + one adaptive fold, driver math per group.
    Rows with null group/ts/value are excluded (and in the oracle).

    Output: ``({group_col}, n_rows, slope_day_micro)``.
    """
    def _valid(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.and_kleene(
            pc.and_kleene(pc.is_valid(batch[group_col]),
                          pc.is_valid(batch[ts_col])),
            pc.is_valid(batch[value_col])))

    proj = ds.select_columns([group_col, ts_col, value_col]).materialize()

    def bounds(batch: pa.Table) -> pa.Table:
        t = _valid(batch)
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"k": z, "m": z, "mx": z, "ay": z, "n": z})
        ts = _ts_us(t[ts_col])
        y = _round_half_away(
            np.asarray(pc.cast(t[value_col], pa.float64())) * y_scale)
        return pa.table({"k": pa.array([1], pa.int64()),
                         "m": pa.array([int(ts.min())], pa.int64()),
                         "mx": pa.array([int(ts.max())], pa.int64()),
                         "ay": pa.array([int(np.abs(y).max())], pa.int64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    mins = [pa.table(t) for t in ray.get(
        groupby_agg(proj.map_batches(bounds, batch_format="pyarrow"),
                    ["k"], {"m": "min", "mx": "max", "ay": "max", "n": "sum"}
                    ).to_arrow_refs()) if t.num_rows]
    if not mins:
        z = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_rows": z, "slope_day_micro": z})
    bt = pa.concat_tables(mins)
    anchor_s = int(bt["m"][0].as_py()) // 1_000_000
    # int64-overflow guard for the moment sums (the oracle's HUGEINT never
    # wraps; np.add.at would wrap SILENTLY): sum of n terms each bounded by
    # span² (sxx) / span·max|y| (sxy) must stay below 2^63. Exact worst-case
    # bound in Python ints — raise loudly rather than degrade (VERDICT-r4
    # convention; widen to per-block hugeint partials to lift).
    span_s = int(bt["mx"][0].as_py()) // 1_000_000 - anchor_s + 1
    n_tot = int(bt["n"][0].as_py())
    max_ay = int(bt["ay"][0].as_py())
    if max(span_s * span_s, span_s * max_ay) * n_tot >= 2 ** 63:
        raise ValueError(
            f"trend_slope_by_group int64 moment bound exceeded "
            f"(span_s={span_s}, max|y|={max_ay}, rows={n_tot}); widen the "
            "partials to hugeint/object sums before running at this scale")

    def moments(batch: pa.Table) -> pa.Table:
        t = _valid(batch)
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"g": pa.array([], pa.string()), "n": z,
                             "sx": z, "sy": z, "sxx": z, "sxy": z})
        x = _ts_us(t[ts_col]) // 1_000_000 - anchor_s
        y = _round_half_away(
            np.asarray(pc.cast(t[value_col], pa.float64())) * y_scale)
        g = np.asarray(t[group_col].cast(pa.string()))
        uniq, inv = np.unique(g, return_inverse=True)
        k = len(uniq)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        sx = np.zeros(k, np.int64); np.add.at(sx, inv, x)
        sy = np.zeros(k, np.int64); np.add.at(sy, inv, y)
        sxx = np.zeros(k, np.int64); np.add.at(sxx, inv, x * x)
        sxy = np.zeros(k, np.int64); np.add.at(sxy, inv, x * y)
        return pa.table({"g": pa.array(uniq), "n": pa.array(n),
                         "sx": pa.array(sx), "sy": pa.array(sy),
                         "sxx": pa.array(sxx), "sxy": pa.array(sxy)})

    folded = pa.concat_tables(
        [pa.table(t) for t in ray.get(
            groupby_sum(proj.map_batches(moments, batch_format="pyarrow"),
                        ["g"], ["n", "sx", "sy", "sxx", "sxy"]
                        ).to_arrow_refs())
         if t.num_rows])
    g = np.asarray(folded["g"])
    order = np.argsort(g, kind="stable")
    g = g[order]
    n = np.asarray(folded["n"], dtype=np.float64)[order]
    sx = np.asarray(folded["sx"], dtype=np.float64)[order]
    sy = np.asarray(folded["sy"], dtype=np.float64)[order]
    sxx = np.asarray(folded["sxx"], dtype=np.float64)[order]
    sxy = np.asarray(folded["sxy"], dtype=np.float64)[order]
    denom = n * sxx - sx * sx
    slope = np.where(denom > 0, (n * sxy - sx * sy)
                     / np.where(denom > 0, denom, 1.0), 0.0)
    return pa.table({group_col: pa.array(g),
                     "n_rows": pa.array(n.astype(np.int64)),
                     "slope_day_micro": pa.array(_round_half_away(
                         slope * 86400.0 * 1e6))})


def _grouped_pair_counts(ds, group_col: str, value_col: str,
                         value_type: pa.DataType,
                         max_driver_rows: int = 5_000_000) -> pa.Table:
    """Folded exact (group, value, count) pairs — the shared first stage of
    the entropy and KS profiles (groups cast to string, values to
    ``value_type``; null group/value rows excluded, SQL-style). ONE pass of
    per-batch pair pre-counts + one adaptive fold; shuffle volume is the
    distinct pair set."""
    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group_col].cast(pa.string()),
                      "v": batch[value_col].cast(value_type)})
        t = t.filter(pc.and_kleene(pc.is_valid(t["g"]), pc.is_valid(t["v"])))
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "v": pa.array([], value_type),
                             "n": pa.array([], pa.int64())})
        t = t.append_column("n", pa.array(np.ones(t.num_rows, np.int64)))
        return t.group_by(["g", "v"]).aggregate([("n", "sum")]
                                                ).rename_columns(["g", "v", "n"])

    refs = groupby_sum(
        ds.select_columns([group_col, value_col]).map_batches(
            partial, batch_format="pyarrow"), ["g", "v"], ["n"]
    ).to_arrow_refs()
    tabs, total = [], 0
    for r in refs:  # enforce the budget DURING the fetch, before the memory
        t = pa.table(ray.get(r))
        if t.num_rows:
            tabs.append(t)
            total += t.num_rows
        if total > max_driver_rows:
            raise ValueError(
                f">{max_driver_rows} distinct (group, value) pairs exceed "
                "the driver budget; bucket the value column "
                "(psi_by_group's fixed-width buckets) at this cardinality")
    if not tabs:
        return pa.table({"g": pa.array([], pa.string()),
                         "v": pa.array([], value_type),
                         "n": pa.array([], pa.int64())})
    return pa.concat_tables(tabs)


# ---------------------------------------------------------------- entropy



def entropy_by_group(ds, group_col: str, value_col: str):
    """Per-group Shannon entropy of a categorical column (natural log) —
    the diversity monitor ("did this source collapse to one language?").
    Exact counts travel; entropy is driver math in the SQL oracle's exact
    expression order, ``ln(N) − Σ n·ln(n) / N``, emitted as
    ``entropy_micro`` (int64, nats × 1e6).

    Distributed work: ONE pass of (group, value, count) partials + one
    adaptive fold (shuffle volume = distinct pairs); null group or value
    rows are excluded (and in the oracle).

    Output: ``({group_col}, n_rows, n_distinct, entropy_micro)``.
    """
    folded = _grouped_pair_counts(ds, group_col, value_col, pa.string())
    if folded.num_rows == 0:
        z = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_rows": z, "n_distinct": z, "entropy_micro": z})
    g = np.asarray(folded["g"])
    n = np.asarray(folded["n"], dtype=np.int64)
    groups, gi = np.unique(g, return_inverse=True)
    k = len(groups)
    tot = np.zeros(k, np.int64)
    np.add.at(tot, gi, n)
    nd = np.bincount(gi, minlength=k).astype(np.int64)
    # Σ n·ln(n) per group, then H = ln(N) − Σ/N — same order as the oracle
    nlogn = n.astype(np.float64) * np.log(n.astype(np.float64))
    s = np.zeros(k, np.float64)
    np.add.at(s, gi, nlogn)
    ent = np.log(tot.astype(np.float64)) - s / tot.astype(np.float64)
    return pa.table({group_col: pa.array(groups.tolist(), pa.string()),
                     "n_rows": pa.array(tot),
                     "n_distinct": pa.array(nd),
                     "entropy_micro": pa.array(_round_half_away(ent * 1e6))})


# ------------------------------------------------------ referential trend


def orphan_rate_daily(ds, ref_ds, key_col: str, ref_key_col: str,
                      ts_col: str, bucket_s: int = 86400,
                      max_broadcast: int = 2_000_000):
    """Referential-integrity TREND: per time bucket, how many rows carry a
    ``key_col`` with no match in the reference table (NOT-EXISTS semantics
    — null keys count as orphans) — "did the producer start emitting
    dangling ids on Tuesday?". The north-star's per-partition violation
    metric as a time series.

    Scale shape: the reference's distinct keys reduce per block and
    broadcast ONCE (``ray.put`` sorted int64; raises loudly beyond
    ``max_broadcast`` — switch to the bucketed key exchange of
    ``pipelines/joins.py`` at that cardinality), then ONE zero-shuffle
    counting pass emits per-bucket (n_rows, n_orphan) partials + one fold.

    Output: ``(bucket_us, n_rows, n_orphan)``.
    """
    bucket_us = np.int64(bucket_s) * 1_000_000

    def keys_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[ref_key_col]))
        u = np.unique(np.asarray(t[ref_key_col].cast(pa.int64())))
        return pa.table({"k": pa.array(u), "one": pa.array(
            np.ones(len(u), np.int64))})

    ktabs = [pa.table(t) for t in ray.get(
        groupby_sum(ref_ds.select_columns([ref_key_col]).map_batches(
            keys_partial, batch_format="pyarrow"), ["k"], ["one"]
        ).to_arrow_refs()) if t.num_rows]
    keys = (np.sort(np.asarray(pa.concat_tables(ktabs)["k"], dtype=np.int64))
            if ktabs else np.empty(0, np.int64))
    if len(keys) > max_broadcast:
        raise ValueError(
            f"{len(keys)} reference keys exceed max_broadcast="
            f"{max_broadcast}; use the bucketed key exchange "
            "(pipelines.joins) at this cardinality")
    keys_ref = ray.put(keys)

    def counts(batch: pa.Table, _ref=keys_ref) -> pa.Table:
        k = ray.get(_ref)
        t = batch.filter(pc.is_valid(batch[ts_col]))
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"bkt": z, "n": z, "n_orphan": z})
        day = (_ts_us(t[ts_col]) // bucket_us) * bucket_us
        isnull = np.asarray(pc.is_null(t[key_col]))
        v = np.asarray(pc.fill_null(pc.cast(t[key_col], pa.int64()), 0))
        if len(k):
            pos = np.minimum(np.searchsorted(k, v), len(k) - 1)
            orphan = isnull | (k[pos] != v)
        else:
            orphan = np.ones(t.num_rows, bool)
        uniq, inv = np.unique(day, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        no = np.zeros(len(uniq), np.int64)
        np.add.at(no, inv, orphan.astype(np.int64))
        return pa.table({"bkt": pa.array(uniq), "n": pa.array(n),
                         "n_orphan": pa.array(no)})

    tabs = [pa.table(t) for t in ray.get(
        groupby_sum(ds.select_columns([key_col, ts_col]).map_batches(
            counts, batch_format="pyarrow"), ["bkt"], ["n", "n_orphan"]
        ).to_arrow_refs()) if t.num_rows]
    if not tabs:
        z = pa.array([], pa.int64())
        return pa.table({"bucket_us": z, "n_rows": z, "n_orphan": z})
    folded = pa.concat_tables(tabs)
    b = np.asarray(folded["bkt"], dtype=np.int64)
    order = np.argsort(b, kind="stable")
    return pa.table({"bucket_us": pa.array(b[order]),
                     "n_rows": pa.array(
                         np.asarray(folded["n"], np.int64)[order]),
                     "n_orphan": pa.array(
                         np.asarray(folded["n_orphan"], np.int64)[order])})


# --------------------------------------------------------------- exact KS


def ks_by_group(ds, group_col: str, value_col: str):
    """EXACT Kolmogorov–Smirnov distance of each group's ``value_col``
    distribution (integer-valued) against the GLOBAL distribution — the
    north-star's "per-column KS comparison" as a precise, oracle-paired
    query (``stages/drift.py`` keeps the sketch-based t-digest variant for
    streaming baselines): KS_g = max over the union support of
    ``|CDF_g(v) − CDF_global(v)|``, emitted as ``ks_micro`` (int64).

    Distributed work: ONE pass of exact (group, value, count) partials +
    one adaptive fold (shuffle volume = the distinct pair set); the
    step-function CDFs and the max are driver math over
    groups × distinct-values, with the division in the oracle's exact
    expression order. Null group/value rows are excluded.

    Output: ``({group_col}, n_rows, ks_micro)``.
    """
    folded = _grouped_pair_counts(ds, group_col, value_col, pa.int64())
    if folded.num_rows == 0:
        z = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], pa.string()),
                         "n_rows": z, "ks_micro": z})
    g = np.asarray(folded["g"])
    v = np.asarray(folded["v"], dtype=np.int64)
    n = np.asarray(folded["n"], dtype=np.int64)
    support = np.unique(v)
    vi = np.searchsorted(support, v)
    S = len(support)
    glob = np.zeros(S, np.int64)
    np.add.at(glob, vi, n)
    gcum = np.cumsum(glob)
    N = float(gcum[-1])
    groups, gi = np.unique(g, return_inverse=True)
    K = len(groups)
    if K * S > 200_000_000:  # ~1.6 GB of int64 — the dense-CDF budget
        raise ValueError(
            f"KS dense CDF would need {K}x{S} cells; bucket the value "
            "column (fixed-width integer buckets keep KS exact over the "
            "bucketed distribution) at this cardinality")
    # dense (group, support) counts — groups × distinct values, driver-sized
    dense = np.zeros((K, S), np.int64)
    np.add.at(dense, (gi, vi), n)
    cumg = np.cumsum(dense, axis=1)
    ng = cumg[:, -1].astype(np.float64)
    # |cumg/ng − cum/N| in the oracle's exact expression order
    diff = np.abs(cumg.astype(np.float64) / ng[:, None]
                  - gcum.astype(np.float64) / N)
    ks = diff.max(axis=1)
    return pa.table({group_col: pa.array(groups.tolist(), pa.string()),
                     "n_rows": pa.array(ng.astype(np.int64)),
                     "ks_micro": pa.array(_round_half_away(ks * 1e6))})
