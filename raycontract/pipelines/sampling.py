"""Deterministic distributed sampling — fraction, global bottom-k
("reservoir"), and stratified per-group quota.

Training-data pipelines sample constantly (eval carve-outs, per-source
quotas, debug slices). Random sampling is irreproducible across engines and
retries, so every operator here derives its randomness from a salted hash of
the row id (the same Knuth multiplicative hash as
``curation.hash_split``, ``curation.py:72-105``) — the sample is a pure
function of (id, salt), identical on Ray, DuckDB, or a resumed run.

Scale shapes (10^12 rows):
- ``sample_fraction``: one vectorized filter per batch, zero shuffle.
- ``bottomk_sample``: per-batch partial bottom-k (only k rows per block
  survive), then one tiny final fold — no global sort of the input.
- ``stratified_sample``: per-batch partial bottom-k per group, then a
  groupby over partials of ≤ k × groups × blocks rows — the full table
  never shuffles, only candidate rows do.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raycontract.functions.strhash import md5_u32, md5_u32_sql

_KNUTH = 2654435761
_MOD = 1 << 32


def hash_u32(col: pa.ChunkedArray | pa.Array, salt: int = 0) -> np.ndarray:
    """Salted deterministic uint64-valued hash in [0, 2^32) of an integer or
    string id column. SQL equivalent: :func:`hash_sql_expr`. Integer ids must
    be NON-NEGATIVE (numpy wraps mod 2^64 where SQL HUGEINT keeps the sign)
    — same contract as ``curation.hash_split``. String ids hash through the
    vectorized embedded-DuckDB md5 kernel (``functions/strhash.py``)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        ids = np.asarray(pc.cast(col, pa.int64()), dtype=np.int64)
        return ((ids.astype(np.uint64) + np.uint64(salt))
                * np.uint64(_KNUTH)) % np.uint64(_MOD)
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return md5_u32(col, salt)
    raise ValueError(f"id column must be integer or string, got {col.type}")


def hash_sql_expr(id_col: str, salt: int = 0, string_id: bool = False) -> str:
    """ANSI-SQL expression reproducing :func:`hash_u32` (DuckDB-tested).
    The integer path computes in HUGEINT so ids up to 2^63-1 never overflow
    (UBIGINT arithmetic throws above ~6.9e9); ``% 2**32`` of the exact
    product equals numpy's wrap-mod-2^64-then-mod-2^32 since 2^32 | 2^64."""
    if string_id:
        return md5_u32_sql(id_col, salt)
    return f"((CAST({id_col} AS HUGEINT) + {salt}) * {_KNUTH}) % {_MOD}"


def sample_fraction(ds, id_col: str, fraction: float, salt: int = 0):
    """Keep rows whose salted id-hash falls below ``fraction`` of the hash
    space — a reproducible ~fraction sample with zero shuffle. SQL oracle:
    ``WHERE hash_sql_expr(...) < int(fraction * 2**32)``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    threshold = np.uint64(int(fraction * _MOD))

    def fn(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.array(hash_u32(batch[id_col], salt) < threshold))

    return ds.map_batches(fn, batch_format="pyarrow")


def bottomk_sample(ds, id_col: str, n: int, salt: int = 0):
    """Exactly-n deterministic global sample: the n rows with the smallest
    salted id-hash (ties broken by id). Equivalent to a bottom-k sketch —
    each block surrenders at most n candidate rows, the final fold sorts
    only n × blocks rows. SQL oracle: ``ORDER BY hash, id LIMIT n``."""

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col], salt)
        if len(h) > n:
            keep = np.lexsort((np.asarray(batch[id_col]), h))[:n]
            batch = batch.take(pa.array(keep))
            h = h[keep]
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    cand = ds.map_batches(partial, batch_format="pyarrow")
    # final fold: the candidate set is ≤ n × blocks rows — tiny
    return (cand.sort(["__h", id_col]).limit(n).drop_columns(["__h"]))


def stratified_sample(ds, group_col: str, id_col: str, n_per_group: int,
                      salt: int = 0):
    """Per-group quota sample: the ``n_per_group`` rows with the smallest
    salted id-hash inside each group (ties by id). Partial bottom-k per
    (batch, group) first, so the groupby shuffles at most
    n × groups × blocks candidate rows. SQL oracle:
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY hash, id) <= n``."""

    def _null_safe_gkey(col) -> pa.Array:
        """String shuffle key: null groups get chr(1), real values an '='
        prefix (no collision) — Ray's sort-based groupby cannot order null
        keys, and SQL PARTITION BY keeps them as a group."""
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        tagged = pc.binary_join_element_wise(
            pa.scalar("="), pc.cast(col, pa.string()), pa.scalar(""))
        return pc.fill_null(tagged, "\x01")

    def partial(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col], salt)
        ids = np.asarray(batch[id_col])
        # numpy group-wise bottom-k: sort by (group, h, id), keep first n
        # per run; null groups take a sentinel code (SQL keeps them)
        g = batch[group_col].combine_chunks() if isinstance(
            batch[group_col], pa.ChunkedArray) else batch[group_col]
        enc = pc.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gc = np.asarray(pc.fill_null(enc.indices, len(enc.dictionary)),
                        dtype=np.int64)
        order = np.lexsort((ids, h, gc))
        gs = gc[order]
        run_start = np.r_[0, np.flatnonzero(np.diff(gs)) + 1]
        rank = np.arange(len(gs)) - np.repeat(run_start, np.diff(np.r_[run_start, len(gs)]))
        keep = order[rank < n_per_group]
        out = batch.take(pa.array(keep))
        out = out.append_column("__h", pa.array(h[keep].astype(np.int64)))
        return out.append_column("__gkey", _null_safe_gkey(out[group_col]))

    cand = ds.map_batches(partial, batch_format="pyarrow")

    def final(group: pa.Table) -> pa.Table:
        h = np.asarray(group["__h"])
        ids = np.asarray(group[id_col])
        keep = np.lexsort((ids, h))[:n_per_group]
        return group.take(pa.array(np.sort(keep))).drop_columns(
            ["__h", "__gkey"])

    return cand.groupby("__gkey").map_groups(final, batch_format="pyarrow")


def mixture_sample(ds, group_col: str, id_col: str, weights: dict[str, float],
                   default: float = 1.0, salt: int = 0):
    """Domain / language mixture resampling (training-mix reweighting): keep
    each row of group ``g`` with probability ``weights.get(g, default)``,
    decided by the salted deterministic id-hash — the standard
    "temperature-sample sources to a target mixture" op, reproducible across
    engines, retries and resumes.

    One vectorized filter per batch, zero shuffle: group values are
    dictionary-encoded once per batch and mapped to per-row thresholds
    through a numpy lookup table (no per-row Python). SQL oracle:
    ``WHERE hash < CASE group WHEN ... THEN t_g ... ELSE t_default END``
    (:func:`mixture_sample_sql_pred`).
    """
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {g!r} must be in [0, 1], got {w}")
    if not 0.0 <= default <= 1.0:
        raise ValueError("default weight must be in [0, 1]")
    thresholds = {g: np.uint64(int(w * _MOD)) for g, w in weights.items()}
    default_thr = np.uint64(int(default * _MOD))

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        h = hash_u32(batch[id_col], salt)
        enc = batch[group_col].combine_chunks().dictionary_encode()
        # Sentinel slot at the end of the LUT for NULL group values: they
        # keep the default weight, matching the SQL twin's CASE...ELSE
        # (dictionary_encode yields null indices for null values).
        lut = np.array([thresholds.get(v.as_py(), default_thr)
                        for v in enc.dictionary] + [default_thr],
                       dtype=np.uint64)
        codes = np.asarray(pc.fill_null(enc.indices, len(lut) - 1),
                           dtype=np.int64)
        return batch.filter(pa.array(h < lut[codes]))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_sample_sql_pred(group_col: str, id_col: str,
                            weights: dict[str, float], default: float = 1.0,
                            salt: int = 0, string_id: bool = False) -> str:
    """WHERE-clause predicate reproducing :func:`mixture_sample` in SQL."""
    whens = " ".join(f"WHEN '{g}' THEN {int(w * _MOD)}"
                     for g, w in sorted(weights.items()))
    case = f"CASE {group_col} {whens} ELSE {int(default * _MOD)} END"
    return f"{hash_sql_expr(id_col, salt, string_id)} < {case}"


def weighted_sample(ds, id_col: str, weight_col: str, scale: float,
                    salt: int = 0):
    """Deterministic WEIGHTED Bernoulli sample (importance sampling for data
    mixing): row i kept iff ``hash(id) < 2^32 · min(1, weight_i / scale)``
    — inclusion probability proportional to the row's weight, capped at 1,
    reproducible across engines, retries and resumes. One vectorized filter
    per batch, zero shuffle. SQL oracle twin::

        WHERE hash_expr < CAST(ROUND(4294967296 *
              LEAST(1.0, weight / scale)) AS BIGINT)
    """
    if scale <= 0:
        raise ValueError("scale must be positive")

    def fn(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[id_col], salt)
        w = pc.cast(batch[weight_col].combine_chunks(), pa.float64())
        p = pc.min_element_wise(pc.divide(w, float(scale)), 1.0)
        thr = np.asarray(pc.cast(pc.round(
            pc.multiply(p, float(_MOD)), round_mode="half_towards_infinity"),
            pa.int64())).astype(np.uint64)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow")


def mixture_plan(ds, group_col: str, text_col: str):
    """Mixture PLANNER — computes the per-group sampling rates that
    :func:`mixture_sample` applies: given the corpus's actual token mass per
    group, the Bernoulli keep-rate that equalizes every group's contribution
    (uniform target shares; groups below their quota keep everything,
    rate capped at 1). The domain-reweighting step every LLM data recipe
    runs before mixing.

    One pass of per-group (docs, tokens) integer partials (whitespace
    tokens = space-count + 1, the repo's oracle convention) + one adaptive
    fold; the plan itself is driver math over the K-groups table in the
    oracle's exact expression order, rates in integer micro-units.

    Output: ``({group_col}, n_docs, n_tokens, share_micro, rate_micro)``.
    """
    import ray as _ray

    from raycontract.pipelines.smallagg import groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.and_kleene(pc.is_valid(batch[group_col]),
                                       pc.is_valid(batch[text_col])))
        if t.num_rows == 0:
            z = pa.array([], pa.int64())
            return pa.table({"g": pa.array([], pa.string()),
                             "nd": z, "nt": z})
        txt = t[text_col]
        n_chars = pc.utf8_length(txt)
        stripped = pc.utf8_length(pc.replace_substring(txt, " ", ""))
        tok = np.asarray(pc.add(pc.subtract(n_chars, stripped), 1),
                         dtype=np.int64)
        g = np.asarray(t[group_col].cast(pa.string()))
        uniq, inv = np.unique(g, return_inverse=True)
        nd = np.bincount(inv).astype(np.int64)
        nt = np.zeros(len(uniq), np.int64)
        np.add.at(nt, inv, tok)
        return pa.table({"g": pa.array(uniq), "nd": pa.array(nd),
                         "nt": pa.array(nt)})

    tabs = [pa.table(t) for t in _ray.get(
        groupby_sum(ds.select_columns([group_col, text_col]).map_batches(
            partial, batch_format="pyarrow"), ["g"], ["nd", "nt"]
        ).to_arrow_refs()) if t.num_rows]
    if not tabs:
        z = pa.array([], pa.int64())
        return pa.table({group_col: pa.array([], pa.string()), "n_docs": z,
                         "n_tokens": z, "share_micro": z, "rate_micro": z})
    f = pa.concat_tables(tabs)
    g = np.asarray(f["g"])
    order = np.argsort(g, kind="stable")
    g = g[order]
    nd = np.asarray(f["nd"], np.int64)[order]
    nt = np.asarray(f["nt"], np.int64)[order]
    tot = float(nt.sum())
    k = float(len(g))
    share = nt.astype(np.float64) / tot
    rate = np.minimum(1.0, (1.0 / k * tot) / nt.astype(np.float64))
    rnd = lambda x: (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)  # noqa: E731
    return pa.table({group_col: pa.array(g.tolist(), pa.string()),
                     "n_docs": pa.array(nd), "n_tokens": pa.array(nt),
                     "share_micro": pa.array(rnd(share * 1e6)),
                     "rate_micro": pa.array(rnd(rate * 1e6))})
