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
    that must ignore nulls should mask with ``col.is_valid()`` separately."""
    import polars as pl

    if isinstance(col, pa.ChunkedArray) and col.num_chunks != 1:
        col = col.combine_chunks()
    try:
        s = pl.from_arrow(col if isinstance(col, (pa.Array, pa.ChunkedArray)) else pa.array(col))
        return s.hash(seed=seed).to_numpy().astype(np.uint64, copy=False)
    except Exception:
        import pandas as pd

        vals = col.to_pandas() if hasattr(col, "to_pandas") else pd.Series(col)
        return pd.util.hash_array(np.asarray(vals, dtype=object), hash_key=str(seed)).astype(np.uint64)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit finalizer (public-domain splitmix64 constants) —
    used to derive independent hash families from one base hash."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return x
