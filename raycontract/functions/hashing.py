"""Vectorized 64-bit hashing of Arrow columns.

Used for content-hash uniqueness (phash-bucketed exact uniqueness per
BASELINE.json north_star), HLL distinct sketches, exact dedup keys and
hash-partitioned joins. Polars' SIMD-vectorized xxhash-style ``Series.hash``
is used when the dtype supports it (strings, binary, ints, floats) — zero-copy
from Arrow; falls back to ``pandas.util.hash_array`` / per-row xxhash for
exotic types.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def hash64(col: "pa.Array | pa.ChunkedArray", seed: int = 0) -> np.ndarray:
    """Hash an Arrow column to uint64. Nulls hash to a fixed value; callers
    that must ignore nulls should mask with ``col.is_valid()`` separately.

    Consistency contract: every block of a column MUST hash through the
    same function — dedup/join keys computed with two different hashers
    would silently miss matches. So for dtypes polars supports, a polars
    failure (observed once: a transient ``polars._reexport`` import race in
    a reused Ray worker) is RETRIED and then raised loudly, never silently
    downgraded to the pandas hasher; the pandas fallback is reserved for
    dtypes polars cannot hash (consistently used for ALL their blocks)."""
    if isinstance(col, pa.ChunkedArray) and col.num_chunks != 1:
        col = col.combine_chunks()
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col)
    # decode dictionary blocks FIRST: mixed dictionary/plain blocks of the
    # same column must hash identically (the consistency contract below)
    if pa.types.is_dictionary(col.type):
        col = col.cast(col.type.value_type)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
    t = col.type
    polars_supported = (
        pa.types.is_string(t) or pa.types.is_large_string(t)
        or pa.types.is_binary(t) or pa.types.is_large_binary(t)
        or pa.types.is_integer(t) or pa.types.is_floating(t)
        or pa.types.is_boolean(t) or pa.types.is_temporal(t))

    def _polars():
        from raycontract._plsafe import import_polars as _ipl; pl = _ipl()

        s = pl.from_arrow(col)
        return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)

    if polars_supported:
        try:
            return _polars()
        except Exception:
            import time as _t

            _t.sleep(0.1)  # transient import race: one retry, then loud
            return _polars()
    import pandas as pd

    # exotic types (struct/list/...): serialize deterministically first —
    # pandas can't factorize unhashable values like dicts, and hash_key
    # must be exactly 16 bytes (both made the old fallback unreachable)
    ser = np.array([repr(v) for v in col.to_pylist()], dtype=object)
    return pd.util.hash_array(ser,
                              hash_key=f"{seed:016d}"[:16]).astype(np.uint64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit finalizer (public-domain splitmix64 constants) —
    used to derive independent hash families from one base hash."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x
