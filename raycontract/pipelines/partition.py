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
    Null keys hash as key 0 / empty string, so they co-locate in that key's
    partition — NOT necessarily partition 0 (callers that need SQL join
    semantics should drop null keys first — a null never equi-matches
    anything)."""
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


def _split_block_task(block, key: str, num_partitions: int):
    """Wave 1 of the manual exchange: slice ONE block into per-partition
    tables by key hash (returned via ray num_returns)."""
    t = pa.table(block)
    if num_partitions == 1:
        # ray num_returns=1 ships the return value itself, not a 1-tuple
        return t
    if t.num_rows == 0:
        return tuple([t] * num_partitions)
    codes = hash_partition_codes(t[key], num_partitions)
    return tuple(t.filter(pa.array(codes == p)) for p in range(num_partitions))


def _merge_apply_task(kernel, *slices):
    """Wave 2: concatenate one partition's slices and run the kernel."""
    parts = [pa.table(s) for s in slices]
    merged = pa.concat_tables(parts, promote_options="default")
    return kernel(merged)


def partition_map(ds, key: str, kernel, num_partitions: Optional[int] = None,
                  manual_block_limit: int = 1024):
    """Apply ``kernel(table) -> table`` once per key-hash PARTITION, with all
    rows of a key co-located.

    Two execution shapes, picked by input block count:

    - **manual 2-wave exchange** (≤ ``manual_block_limit`` blocks): one split
      task per block (``num_returns=P`` key-hash slices) + one merge task per
      partition. Ray's sort-based ``groupby().map_groups`` costs seconds of
      fixed machinery even on 100k rows (measured 3-13 s at sf0.1); the
      manual exchange is exactly 2 task waves and runs in well under a
      second at those sizes. B×P slice objects bound the small path.
    - **keyed groupby fallback** (larger inputs): ``groupby("__part")
      .map_groups`` — Ray's hierarchical sort shuffle with spilling, the
      right machinery once B×P object-count would explode (the 100-TB
      shape).

    Both shapes invoke the kernel once per PARTITION (P ~ cluster cores),
    never once per key. Partitioning assumption: one partition fits a
    worker's heap — size ``num_partitions`` to data volume.
    """
    import ray
    import ray.data as rd

    P = num_partitions or default_num_partitions()
    refs = ds.to_arrow_refs()
    if len(refs) <= manual_block_limit:
        split_remote = ray.remote(num_cpus=1)(_split_block_task)
        merge_remote = ray.remote(num_cpus=1)(_merge_apply_task)
        outs = []
        for r in refs:
            o = split_remote.options(num_returns=P).remote(r, key, P)
            outs.append([o] if P == 1 else o)
        futs = [merge_remote.remote(kernel, *[outs[b][p] for b in range(len(outs))])
                for p in range(P)]
        return rd.from_arrow_refs(futs)

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", pa.array(hash_partition_codes(batch[key], P)))

    def run(part: pa.Table) -> pa.Table:
        return kernel(part.drop_columns(["__part"]))

    return (rd.from_arrow_refs(refs)
            .map_batches(tag, batch_format="pyarrow")
            .groupby("__part").map_groups(run, batch_format="pyarrow"))


def key_codes(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """int64 codes identifying equal keys within ONE in-memory table
    (dictionary indices — first-appearance order, fine for run detection,
    NOT value-ordered)."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return np.asarray(enc.indices.fill_null(-1), dtype=np.int64)
