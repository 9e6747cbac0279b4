"""Corpus-curation operators for training-data pipelines.

Beyond the reference's check surface — the standard LLM-corpus curation
family, each a vectorized ``map_batches`` stage:

- **PII scan/redact**: RE2-compatible email/phone/ipv4/ssn patterns via
  ``pyarrow.compute`` regex kernels (scan counts are DuckDB-oracle-exact;
  redaction replaces matches with type tags).
- **Deterministic split**: Knuth multiplicative hash on the id → stable
  train/val/test assignment, reproducible in SQL for the oracle.
- **Decontamination**: benchmark-phrase blocklist broadcast once per actor;
  documents containing any blocklisted phrase are flagged (substring
  containment, matching the oracle's ``contains``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray

# RE2-compatible (no lookaround) so DuckDB oracles agree bit-for-bit
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(?:\+?[0-9]{1,3}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_scan(ds, text_col: str = "text", id_col: str = "doc_id",
             patterns: Optional[dict[str, str]] = None):
    """Per-document PII hit flags: (id, has_<type>... , has_pii)."""
    pats = patterns or PII_PATTERNS

    def fn(batch: pa.Table) -> pa.Table:
        cols = {id_col: batch[id_col]}
        any_mask = None
        for name, pat in pats.items():
            m = pc.match_substring_regex(batch[text_col], pat)
            m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
            m = m.fill_null(False)
            cols[f"has_{name}"] = m
            any_mask = m if any_mask is None else pc.or_(any_mask, m)
        cols["has_pii"] = any_mask if any_mask is not None else pa.array(
            [False] * batch.num_rows)
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


def pii_redact(ds, text_col: str = "text", id_col: str = "doc_id",
               patterns: Optional[dict[str, str]] = None):
    """Redacted copy of the text column: every PII match replaced with its
    ``[TYPE]`` tag (vectorized regex replace per pattern)."""
    pats = patterns or PII_PATTERNS

    def fn(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        for name, pat in pats.items():
            t = pc.replace_substring_regex(t, pat, f"[{name.upper()}]")
        return pa.table({id_col: batch[id_col], "text_redacted": t})

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


# 2654435761 = floor(2^32 / phi): Knuth's multiplicative hash constant —
# reproducible in ANSI SQL with one multiply + modulo (the oracle contract)
_KNUTH = 2654435761
_MOD = 1 << 32


def hash_split(ds, id_col: str, fractions: Sequence[float],
               names: Optional[Sequence[str]] = None):
    """Deterministic dataset split on the id: stable across runs, machines
    and engines (Knuth multiplicative hash mod 2^32 → cumulative fraction
    buckets). Returns the input with a ``split`` column; filter downstream
    (``ds.filter(expr="split == 'train'")``) so the split never shuffles."""
    names = list(names or [f"split_{i}" for i in range(len(fractions))])
    if len(names) != len(fractions):
        raise ValueError("names and fractions must align")
    total = float(sum(fractions))
    bounds = []
    acc = 0.0
    for f in fractions:
        acc += f / total
        bounds.append(int(acc * _MOD))
    bounds[-1] = _MOD  # guard fp rounding

    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        col = batch[id_col].combine_chunks()
        if pa.types.is_integer(col.type):
            ids = np.asarray(pc.cast(col, pa.int64()), dtype=np.int64)
            h = (ids.astype(np.uint64) * np.uint64(_KNUTH)) % np.uint64(_MOD)
        elif pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            # md5_number_lower(id) % 2^32 — evaluated vectorized in embedded
            # DuckDB (functions/strhash.py), bit-identical to the SQL oracle
            # by construction and ~12x the per-row hashlib loop.
            from raycontract.functions.strhash import md5_u32

            h = md5_u32(col)
        else:
            raise ValueError(
                f"hash_split id column {id_col!r} must be integer or string, "
                f"got {col.type}")
        out = np.empty(len(col), dtype=object)
        lo = 0
        for name, hi in zip(names, bounds):
            out[(h >= lo) & (h < hi)] = name
            lo = hi
        return batch.append_column("split", pa.array(out.tolist(), type=pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_split_sql_expr(id_col: str, fractions: Sequence[float],
                        names: Optional[Sequence[str]] = None,
                        string_id: bool = False) -> str:
    """The ANSI-SQL CASE expression that reproduces :func:`hash_split`'s
    ``split`` column (the oracle contract for both id types)."""
    names = list(names or [f"split_{i}" for i in range(len(fractions))])
    total = float(sum(fractions))
    if string_id:
        from raycontract.functions.strhash import md5_u32_sql

        h = md5_u32_sql(id_col)
    else:
        # HUGEINT: exact product, no UBIGINT overflow for ids up to 2^63-1;
        # % 2^32 of the exact value == numpy's uint64 wraparound then % 2^32
        h = f"(CAST({id_col} AS HUGEINT) * {_KNUTH}) % {_MOD}"
    clauses, acc = [], 0.0
    for name, f in zip(names[:-1], fractions[:-1]):
        acc += f / total
        clauses.append(f"WHEN {h} < {int(acc * _MOD)} THEN '{name}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{names[-1]}' END"


class AhoCorasick:
    """Multi-pattern substring automaton (classic published algorithm):
    goto/fail/output tables built once, then ``contains_any`` scans a text
    in O(len(text)) regardless of the number of patterns."""

    def __init__(self, patterns: Sequence[str]):
        self.goto: list[dict[str, int]] = [{}]
        self.out: list[bool] = [False]
        self.fail: list[int] = [0]
        for p in patterns:
            if not p:
                continue
            s = 0
            for ch in p:
                nxt = self.goto[s].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.out.append(False)
                    self.fail.append(0)
                    nxt = len(self.goto) - 1
                    self.goto[s][ch] = nxt
                s = nxt
            self.out[s] = True
        # BFS failure links
        from collections import deque

        q = deque()
        for s in self.goto[0].values():
            self.fail[s] = 0
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in self.goto[r].items():
                q.append(s)
                f = self.fail[r]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[s] = self.goto[f].get(ch, 0) if self.goto[f].get(ch, 0) != s else 0
                self.out[s] = self.out[s] or self.out[self.fail[s]]

    def contains_any(self, text: str) -> bool:
        s = 0
        goto, fail, out = self.goto, self.fail, self.out
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                return True
        return False


class Decontaminator:
    """Actor-pool stage: flag documents containing ANY blocklisted benchmark
    phrase (substring containment). The phrase list ships once via
    ``ray.put`` and is fetched per actor in ``__init__`` — never per batch.
    Small blocklists use per-phrase Arrow ``match_substring`` kernels
    (vectorized across the batch); beyond ``automaton_threshold`` phrases an
    Aho-Corasick automaton (built once per actor) scans each text in
    O(len(text)) independent of blocklist size — the 10^5-phrase path."""

    def __init__(self, phrases_ref, text_col: str, id_col: str,
                 automaton_threshold: int = 50):
        self.phrases: list[str] = ray.get(phrases_ref)
        self.text_col, self.id_col = text_col, id_col
        self.ac = (AhoCorasick(self.phrases)
                   if len(self.phrases) > automaton_threshold else None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.ac is not None:
            texts = batch[self.text_col].to_pylist()
            contaminated = pa.array([bool(t) and self.ac.contains_any(t)
                                     for t in texts])
        else:
            contaminated = None
            for p in self.phrases:
                m = pc.match_substring(batch[self.text_col], p)
                m = m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m
                m = m.fill_null(False)
                contaminated = m if contaminated is None else pc.or_(contaminated, m)
            if contaminated is None:
                contaminated = pa.array([False] * batch.num_rows)
        return pa.table({self.id_col: batch[self.id_col],
                         "contaminated": contaminated})


def decontaminate_flags(ds, phrases: Sequence[str], text_col: str = "text",
                        id_col: str = "doc_id", concurrency=(1, 8),
                        automaton_threshold: int = 50):
    ref = ray.put(list(phrases))
    # max_restarts=0 (ray#53727): ObjectRef constructor arg, restart would fail.
    return ds.select_columns([id_col, text_col]).map_batches(
        Decontaminator, fn_constructor_args=(ref, text_col, id_col,
                                             automaton_threshold),
        batch_format="pyarrow", concurrency=concurrency, max_restarts=0,
    )


def _word_gram_hashes(col, n: int):
    """(flat uint64 word-n-gram hashes ordered by row, per-row gram counts)
    for an Arrow string column. Each whitespace token is hashed, then one
    rolling polynomial combine over the concatenated word-hash array with a
    boundary mask selects within-row windows — the word-level analog of
    ``dedup._batch_shingle_hashes`` (no per-document Python). Rows with
    fewer than n words (nulls included) yield 0 grams; equal word sequences
    hash equal, distinct ones collide at 2^-64."""
    import numpy as np

    from raycontract.functions.hashing import hash64, splitmix64
    from raycontract.pipelines.dedup import _rolling_hash_select

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    words = pc.split_pattern(col, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    lens = np.asarray(pc.cast(pc.fill_null(
        pc.list_value_length(words), 0), pa.int64()))
    counts = np.maximum(lens - n + 1, 0).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64), counts
    flat_words = pc.list_flatten(words)  # skips null lists; lens align
    wh = splitmix64(hash64(flat_words, seed=3))
    offsets = np.r_[0, np.cumsum(lens)[:-1]]
    rows = np.flatnonzero(counts)
    return _rolling_hash_select(wh, offsets[rows], counts[rows], n), counts


def ngram_contamination(ds, eval_mask_fn, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 8,
                        broadcast_limit: int = 50_000_000,
                        mode: str = "auto", num_buckets: int = 64):
    """Per-document n-gram overlap with an eval set — the GPT-3-style
    contamination REPORT (`decontaminate_flags` is the hard phrase filter;
    this measures gram-level leakage). ``eval_mask_fn(batch) -> Boolean
    Array`` marks eval rows; output, for every NON-eval row with ≥ n words:
    ``(id, n_grams, n_contaminated)`` where a gram is contaminated iff its
    word sequence appears anywhere in the eval set (each occurrence counts).

    Two scale shapes, chosen by ``mode`` ("auto" picks by eval size):

    - **broadcast** (eval distinct grams ≤ ``broadcast_limit``, the normal
      case — eval corpora are small): eval gram hashes reduce per block
      (np.unique inside map_batches — shuffle-free), union on the driver,
      ship ONCE via ``ray.put`` as a SORTED uint64 array; scoring is
      zero-shuffle searchsorted membership + offset bincount per batch.
    - **bucketed** (arbitrarily large eval sets): per-doc distinct gram
      hashes (with occurrence counts) and eval gram hashes exchange ONCE
      by ``hash % num_buckets``; each bucket kernel does the same sorted
      membership locally and emits per-doc hit partials. Shuffle volume is
      gram HASHES (8B each), never text. Both paths produce identical
      output (asserted in tests)."""
    import numpy as np

    # the passes read the same two columns: materialize the projection once
    # so the base table's parquet read + decode doesn't run twice
    proj = ds.select_columns([id_col, text_col]).materialize()

    def eval_partial(batch: pa.Table) -> pa.Table:
        sub = batch.filter(eval_mask_fn(batch))
        flat, _ = _word_gram_hashes(sub[text_col], n)
        u = np.unique(flat)
        return pa.table({"g": pa.array(u.view(np.int64))})

    def _membership(flat: np.ndarray, grams: np.ndarray) -> np.ndarray:
        if not grams.size:
            return np.zeros(flat.size, dtype=bool)
        pos = np.searchsorted(grams, flat)
        return (pos < grams.size) & (
            grams[np.minimum(pos, grams.size - 1)] == flat)

    if mode not in ("auto", "broadcast", "bucketed"):
        raise ValueError(f"unknown mode {mode!r}")

    if mode != "bucketed":
        # stream-collect per-block distinct partials with EARLY ABORT: if
        # the accumulated (pre-global-dedup, conservative) row count passes
        # the limit, stop before the driver ever concatenates a huge array
        # and fall through to the bucketed path (mode='auto') — the whole
        # point of that path is protecting driver memory
        parts, acc = [], 0
        aborted = False
        for b in proj.map_batches(
                eval_partial, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"):
            if not b.num_rows:
                continue
            parts.append(np.asarray(b["g"]))
            acc += b.num_rows
            if acc > broadcast_limit:
                aborted = True
                break
        if aborted:
            if mode == "broadcast":
                raise ValueError(
                    f"eval gram partials ({acc}+) exceed broadcast_limit "
                    f"({broadcast_limit}); use mode='bucketed'")
            mode = "bucketed"
        else:
            # view back to uint64 BEFORE unique: int64 sort order differs
            # for hashes >= 2^63, breaking searchsorted membership
            eval_grams = (np.unique(np.concatenate(parts).view(np.uint64))
                          if parts else np.empty(0, dtype=np.uint64))
            ref = ray.put(eval_grams)

            def score(batch: pa.Table) -> pa.Table:
                grams = ray.get(ref)
                sub = batch.filter(pc.invert(eval_mask_fn(batch)))
                flat, counts = _word_gram_hashes(sub[text_col], n)
                rows = np.flatnonzero(counts)
                hit = _membership(flat, grams)
                row_of = np.repeat(np.arange(len(sub), dtype=np.int64), counts)
                n_cont = np.bincount(row_of[hit], minlength=len(sub))
                return pa.table({
                    id_col: sub[id_col].filter(pa.array(counts > 0)),
                    "n_grams": pa.array(counts[rows]),
                    "n_contaminated": pa.array(n_cont[rows].astype(np.int64)),
                })

            return proj.map_batches(score, batch_format="pyarrow")

    # ---------------- bucketed semi-join path (arbitrarily large eval sets)
    from raycontract.pipelines.smallagg import groupby_sum

    B = np.uint64(num_buckets)
    id_type = dict(zip(proj.schema().names, proj.schema().types))[id_col]

    def doc_gram_rows(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.invert(eval_mask_fn(batch)))
        empty = pa.table({"_b": pa.array([], pa.int64()),
                          "_id": pa.array([], id_type),
                          "g": pa.array([], pa.int64()),
                          "n_occ": pa.array([], pa.int64()),
                          "_side": pa.array([], pa.int8())})
        flat, counts = _word_gram_hashes(sub[text_col], n)
        if not flat.size:
            return empty
        # ids keep their ORIGINAL Arrow type (string ids work; output dtype
        # matches the broadcast path exactly)
        row_of = np.repeat(np.arange(len(sub), dtype=np.int64), counts)
        ids_rep = sub[id_col].combine_chunks().take(pa.array(row_of))
        # batch-level combiner: (id, gram) multiplicity via Arrow group_by
        pairs = pa.table({"_id": ids_rep,
                          "g": pa.array(flat.view(np.int64))})
        agg = pairs.group_by(["_id", "g"]).aggregate([([], "count_all")])
        gsel = np.asarray(agg["g"]).view(np.uint64)
        return pa.table({
            "_b": pa.array((gsel % B).astype(np.int64)),
            "_id": agg["_id"],
            "g": agg["g"],
            "n_occ": pc.cast(agg["count_all"], pa.int64()),
            "_side": pa.array(np.zeros(len(agg), dtype=np.int8))})

    def eval_gram_rows(batch: pa.Table) -> pa.Table:
        t = eval_partial(batch)
        u = np.asarray(t["g"]).view(np.uint64)
        return pa.table({
            "_b": pa.array((u % B).astype(np.int64)),
            "_id": pa.nulls(u.size, id_type),
            "g": t["g"],
            "n_occ": pa.array(np.zeros(u.size, dtype=np.int64)),
            "_side": pa.array(np.ones(u.size, dtype=np.int8))})

    both = proj.map_batches(doc_gram_rows, batch_format="pyarrow").union(
        proj.map_batches(eval_gram_rows, batch_format="pyarrow"))

    def per_bucket(group: pa.Table) -> pa.Table:
        side = np.asarray(group["_side"])
        g = np.asarray(group["g"]).view(np.uint64)
        eset = np.unique(g[side == 1])
        rows_mask = side == 0
        hit = np.zeros(len(group), dtype=bool)
        hit[rows_mask] = _membership(g[rows_mask], eset)
        hits = group.filter(pa.array(hit))
        if hits.num_rows == 0:
            return pa.table({"_id": pa.array([], id_type),
                             "n_contaminated": pa.array([], pa.int64())})
        agg = pa.table({"_id": hits["_id"], "n_occ": hits["n_occ"]}
                       ).group_by(["_id"]).aggregate([("n_occ", "sum")])
        return pa.table({"_id": agg["_id"],
                         "n_contaminated": pc.cast(agg["n_occ_sum"],
                                                   pa.int64())})

    cont = both.groupby("_b").map_groups(per_bucket, batch_format="pyarrow")

    def totals_partial(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.invert(eval_mask_fn(batch)))
        flat, counts = _word_gram_hashes(sub[text_col], n)
        rows = np.flatnonzero(counts)
        return pa.table({"_id": sub[id_col].combine_chunks().take(
                             pa.array(rows)),
                         "n_grams": pa.array(counts[rows]),
                         "n_contaminated": pa.array(
                             np.zeros(rows.size, dtype=np.int64))})

    def cont_shaped(batch: pa.Table) -> pa.Table:
        return pa.table({"_id": batch["_id"],
                         "n_grams": pa.array(
                             np.zeros(batch.num_rows, dtype=np.int64)),
                         "n_contaminated": batch["n_contaminated"]})

    merged = groupby_sum(
        proj.map_batches(totals_partial, batch_format="pyarrow").union(
            cont.map_batches(cont_shaped, batch_format="pyarrow")),
        ["_id"], ["n_grams", "n_contaminated"])

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch["_id"],
                         "n_grams": batch["n_grams"],
                         "n_contaminated": batch["n_contaminated"]})

    return merged.map_batches(finish, batch_format="pyarrow")
