"""Referential-integrity check: child.fk ⊆ parent.pk (SURVEY.md §2a #16).

The reference only lints references statically
(``lint/linters/field_reference_linter.py:20-48``; execution is a TODO at
``engines/data_contract_checks.py:62``) — here it is a real distributed
check, per the north star.

Two physical strategies (SURVEY.md §2e "Joins/lookups"):

- **broadcast semi-anti join** (default when the parent key set is small
  enough): distinct parent keys are collected via the same
  shuffle-light two-stage distinct as uniqueness, ``ray.put`` ONCE, and every
  child batch filters against the shared set read from the object store in
  each task — no shuffle of the child side at all.
- **bucketed anti join** (both sides large): both sides are hashed into B
  buckets inside ``map_batches`` (child pre-deduped per batch), tagged,
  unioned and grouped by bucket; each group anti-joins child-distinct against
  parent keys. Shuffle volume = distinct keys per side, not rows.

NULL FKs are not violations (they are the ``required`` check's business,
matching soda's missing/invalid split).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

DEFAULT_BROADCAST_LIMIT = 2_000_000  # distinct parent keys; ~16-60MB in plasma


def _distinct_per_batch(column: str):
    def fn(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch[column].drop_null())
        return pa.table({column: u})

    return fn


def referential_stats(
    child_ds,
    fk: str,
    parent_ds,
    pk: str,
    max_samples: int = 20,
    broadcast_limit: int = DEFAULT_BROADCAST_LIMIT,
    num_buckets: int = 64,
) -> dict[str, Any]:
    """Returns {'violation_rows', 'violation_keys', 'samples', 'strategy'}."""
    # distinct parent keys, pre-deduped per batch before any driver collection
    parent_keys_ds = parent_ds.select_columns([pk]).map_batches(
        _distinct_per_batch(pk), batch_format="pyarrow"
    )
    # upper bound on distinct keys = raw parent row count — for a plain
    # parquet read this is metadata-only (no scan, no extra execution)
    approx_parent = parent_ds.count()

    child_schema = child_ds.schema()
    fk_type = dict(zip(child_schema.names, child_schema.types))[fk]

    if approx_parent <= broadcast_limit:
        return _broadcast_anti(child_ds, fk, parent_keys_ds, pk, max_samples, fk_type)
    return _bucketed_anti(child_ds, fk, parent_keys_ds, pk, max_samples, num_buckets)


def _broadcast_anti(child_ds, fk, parent_keys_ds, pk, max_samples, fk_type) -> dict[str, Any]:
    chunks = [
        batch[pk].combine_chunks()
        for batch in parent_keys_ds.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if batch.num_rows
    ]
    if chunks:
        keys = pc.unique(pa.chunked_array(chunks))
    else:
        # empty parent: schema() of a fully-empty dataset can be None — use
        # the child's FK type so is_in still works (everything dangles)
        keys = pa.array([], type=fk_type)
    keys_ref = ray.put(keys)  # broadcast once; every task reads from plasma

    class AntiJoin:
        """Actor-pool stage: parent key set fetched once per actor."""

        def __init__(self, keys_ref):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch[fk]
            dangling = pc.and_(
                pc.invert(pc.is_in(col, value_set=self.keys)), col.is_valid()
            )
            import pickle

            n = int(pc.sum(pc.cast(dangling, pa.int64())).as_py() or 0)
            samples = []
            if n:
                idx = np.flatnonzero(np.asarray(dangling.combine_chunks().fill_null(False)))
                samples = col.take(pa.array(idx[:max_samples])).to_pylist()
            vals = pc.unique(col.filter(dangling)) if n else None
            payload = pickle.dumps(
                {"rows": n, "keys": vals.to_pylist()[:1000] if vals is not None else [], "samples": samples}
            )
            return pa.table({"payload": pa.array([payload], type=pa.binary())})

    # max_restarts=0 (deliberate, VERDICT r2 #6 / ray#53727): the constructor
    # arg lives in the object store; a Ray-level actor restart after ref loss
    # would fail anyway (ref loss == driver death here, since the driver owns
    # keys_ref for the stage's whole lifetime). Ray Data's pool manages
    # replacement actors itself, so disabling core-worker restarts only
    # silences the spurious warning.
    rows = child_ds.select_columns([fk]).map_batches(
        AntiJoin, fn_constructor_args=(keys_ref,), batch_format="pyarrow",
        concurrency=(1, 8), max_restarts=0,
    ).take_all()
    import pickle

    out = {"violation_rows": 0, "samples": [], "strategy": "broadcast"}
    keyset: set = set()
    for r in rows:
        p = pickle.loads(r["payload"])
        out["violation_rows"] += p["rows"]
        keyset.update(p["keys"])
        if len(out["samples"]) < max_samples:
            out["samples"].extend(p["samples"][: max_samples - len(out["samples"])])
    out["violation_keys"] = len(keyset)
    return out


def _bucketed_anti(child_ds, fk, parent_keys_ds, pk, max_samples, num_buckets) -> dict[str, Any]:
    """Hash-partitioned anti join over (key, side, count) triples."""

    def tag(side: int, column: str):
        def fn(batch: pa.Table) -> pa.Table:
            from raycontract.functions.hashing import hash64

            col = batch[column].drop_null()
            if side == 0:  # child: keep per-batch counts so rows aren't shuffled
                vc = pc.value_counts(col)
                keys, cnts = vc.field("values"), vc.field("counts")
            else:
                keys = pc.unique(col)
                cnts = pa.array(np.ones(len(keys), dtype=np.int64))
            if len(keys) == 0:
                return pa.table({"_b": pa.array([], type=pa.int64()),
                                 "_key": pa.array([], type=col.type),
                                 "_side": pa.array([], type=pa.int8()),
                                 "_cnt": pa.array([], type=pa.int64())})
            b = (hash64(keys) % np.uint64(num_buckets)).astype(np.int64)
            return pa.table({
                "_b": pa.array(b),
                "_key": keys,
                "_side": pa.array(np.full(len(keys), side, dtype=np.int8)),
                "_cnt": cnts,
            })

        return fn

    child_tagged = child_ds.select_columns([fk]).map_batches(tag(0, fk), batch_format="pyarrow")
    parent_tagged = parent_keys_ds.map_batches(tag(1, pk), batch_format="pyarrow")
    both = child_tagged.union(parent_tagged)

    def anti(group: pa.Table) -> pa.Table:
        import pickle

        side = group["_side"]
        parent_keys = pc.unique(group["_key"].filter(pc.equal(side, 1)))
        child_mask = pc.equal(side, 0)
        ckeys = group["_key"].filter(child_mask)
        ccnts = group["_cnt"].filter(child_mask)
        dangling = pc.invert(pc.is_in(ckeys, value_set=parent_keys))
        # per-key child counts may repeat across batches → aggregate
        bad_keys = ckeys.filter(dangling)
        bad_cnts = ccnts.filter(dangling)
        uniq = pc.unique(bad_keys)
        rows = int(pc.sum(bad_cnts).as_py() or 0)
        payload = pickle.dumps({
            "rows": rows,
            "keys": len(uniq),
            "samples": uniq.to_pylist()[:max_samples],
        })
        return pa.table({"payload": pa.array([payload], type=pa.binary())})

    rows = both.groupby("_b").map_groups(anti, batch_format="pyarrow").take_all()
    import pickle

    out = {"violation_rows": 0, "violation_keys": 0, "samples": [], "strategy": "bucketed"}
    for r in rows:
        p = pickle.loads(r["payload"])
        out["violation_rows"] += p["rows"]
        out["violation_keys"] += p["keys"]
        if len(out["samples"]) < max_samples:
            out["samples"].extend(p["samples"][: max_samples - len(out["samples"])])
    return out
