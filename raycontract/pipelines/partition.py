"""Key-hash partitioning for per-key windowed operators.

Ray Data's ``groupby(key).map_groups`` invokes the UDF once per GROUP — fine
for thousands of groups, ruinous for 10^9 (per-call Python + frame overhead
dwarfs the vectorized work when groups are 10-100 rows). The scale-safe
shape used by ``sessionize_events``, ``lag_delta`` and ``asof_join``:

1. add ``__part = hash(key) % P`` (vectorized per batch, no Python rows),
2. ``groupby("__part").map_groups(kernel)`` — the kernel runs once per
   PARTITION (P calls total, P ~ cluster cores), and
3. inside the kernel, ONE ``np.lexsort`` by (key, ts) and a vectorized
   run-boundary pass (``np.flatnonzero(np.diff(codes))``) handle every key
   in the partition at once — the same trick as ``topk_per_group``'s
   per-batch candidate kernel (relational.py).

Partitioning assumption (document per operator): one partition fits in a
worker's heap — size ``num_partitions`` to data volume, not key count. Keys
are never split across partitions, so no key-level skew cap beyond the
usual hot-key caveat.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def default_num_partitions() -> int:
    import ray

    return max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))


def hash_partition_codes(col: pa.Array | pa.ChunkedArray,
                         num_partitions: int) -> np.ndarray:
    """Vectorized partition id in [0, P) for an integer or string key column.
    Null keys get partition 0 (callers that need SQL join semantics should
    drop null keys first — a null never equi-matches anything)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_integer(col.type):
        ids = np.asarray(pc.cast(col.fill_null(0), pa.int64()), dtype=np.int64)
        h = (ids.astype(np.uint64) * _KNUTH) % _MOD32
    elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        from raycontract.functions.strhash import md5_u32

        h = md5_u32(col.fill_null(""))
    else:
        raise ValueError(f"partition key must be integer or string, got {col.type}")
    return (h % np.uint64(num_partitions)).astype(np.int32)


def with_partition_column(ds, key: str, num_partitions: Optional[int] = None,
                          part_col: str = "__part"):
    """Append the partition-id column (one vectorized pass, zero shuffle)."""
    P = num_partitions or default_num_partitions()

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            part_col, pa.array(hash_partition_codes(batch[key], P)))

    return ds.map_batches(tag, batch_format="pyarrow")


def key_codes(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """int64 codes identifying equal keys within ONE in-memory table
    (dictionary indices — first-appearance order, fine for run detection,
    NOT value-ordered)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return np.asarray(enc.indices.fill_null(-1), dtype=np.int64)
