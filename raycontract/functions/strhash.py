"""Vectorized, engine-portable string-id hashing.

The deterministic-sampling / split operators (``pipelines/sampling.py``,
``pipelines/curation.py``) derive all randomness from a salted hash of the
row id so results are a pure function of (id, salt) — identical on Ray, in
the DuckDB oracle, and across resumed runs. For string ids the hash is

    h = md5_number_lower(salt_prefix || id) % 2**32
      = int.from_bytes(md5(prefix + id).digest()[8:12], 'little')

evaluated **per batch in embedded DuckDB** (one cached connection per worker
process, ``threads=1`` since Ray owns the parallelism): C-speed md5 with no
string slicing, measured ~12x faster than a per-row ``hashlib`` Python loop
on a 1M-id column (BASELINE.md round-4 micro-bench), and bit-identical to
the SQL oracle *by construction* — both sides run the same expression.

A pure-Python ``hashlib`` fallback (same bytes) guards the import so the
library still works where duckdb is absent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

try:  # duckdb is baked into the target environment; guard anyway
    import duckdb as _duckdb
except ImportError:  # pragma: no cover - exercised only without duckdb
    _duckdb = None

_CON = None  # one embedded connection per worker process, lazily created

_U32_MOD = 1 << 32


def _connection():
    global _CON
    if _CON is None:
        _CON = _duckdb.connect()
        # Ray schedules one task per core already; DuckDB fan-out would
        # oversubscribe the worker.
        _CON.execute("SET threads=1")
    return _CON


def md5_u32(col: pa.Array | pa.ChunkedArray, salt: int = 0) -> np.ndarray:
    """uint64 ndarray of ``md5_number_lower(prefix||id) % 2**32`` per row
    (prefix = ``str(salt)`` when salt != 0, matching :func:`md5_u32_sql`)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if _duckdb is not None:
        tbl = pa.table({"s": col})
        expr = (f"md5_number_lower('{int(salt)}' || s)" if salt
                else "md5_number_lower(s)")
        out = _connection().execute(
            f"SELECT {expr} % {_U32_MOD} AS h FROM tbl").arrow()
        h = out["h"]
        h = h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
        return np.asarray(h.cast(pa.uint64()), dtype=np.uint64)
    # fallback: same bytes via hashlib (slow path, no duckdb available)
    import hashlib

    pre = str(int(salt)) if salt else ""
    return np.fromiter(
        (int.from_bytes(hashlib.md5((pre + s).encode()).digest()[8:12],
                        "little")
         for s in col.to_pylist()),
        dtype=np.uint64, count=len(col))


def md5_u32_sql(id_col: str, salt: int = 0) -> str:
    """The ANSI-SQL (DuckDB) expression reproducing :func:`md5_u32`."""
    arg = f"'{int(salt)}' || {id_col}" if salt else id_col
    return f"(md5_number_lower({arg}) % {_U32_MOD})"
