"""Text-analysis operators over a documents table (training-data pipeline
extensions; SURVEY.md §2 add-ons).

All stages are vectorized ``map_batches`` (Arrow / numpy / polars kernels) or
actor pools with per-actor setup (stopword tables, compiled regexes) —
never per-row Python in the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny built-in stopword profiles for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "et", "de", "un", "une", "est", "que", "pour", "dans"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "es": {"el", "la", "y", "de", "un", "una", "es", "que", "por", "con"},
}


def token_count_expr(batch: pa.Table, text_col: str) -> pa.Array:
    """Whitespace token count = single-space count + 1 (deterministic, matches
    the SQL ``length(t) - length(replace(t,' ','')) + 1`` oracle exactly)."""
    t = batch[text_col]
    return pc.add(pc.count_substring(t, " "), 1)


def text_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    """(id, n_tokens, n_chars_calc) — vectorized Arrow kernels only."""

    def fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "n_tokens": pc.cast(token_count_expr(batch, text_col), pa.int64()),
            "n_chars_calc": pc.cast(pc.utf8_length(batch[text_col]), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


# The GPT-2 pre-tokenization pattern (public: the published BPE papers /
# tokenizer docs): contraction suffixes, letter runs with optional leading
# space, digit runs, punctuation runs, whitespace. This is the "BPE-ish"
# token counter — it counts the PRE-merge word pieces a byte-level BPE
# would start from (the subsequent merge table is model-specific).
_BPE_SPLIT = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"


class BpeTokenCounter:
    """Actor-pool stage: regex pre-tokenizer token counts per document
    (compiled ONCE per actor in ``__init__`` — never per batch)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re

        self.re = re.compile(_BPE_SPLIT)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        counts = [len(self.re.findall(t)) if t else 0 for t in texts]
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_bpe_tokens": pa.array(counts, type=pa.int64()),
        })


def bpe_token_counts(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        BpeTokenCounter(text_col, id_col), batch_format="pyarrow")


# RE2-compatible variant: GPT-2 split minus the `\s+(?!\S)` lookahead (RE2
# has no lookaround). Counting runs as ONE vectorized Arrow kernel
# (pc.count_substring_regex — Arrow embeds RE2, the same engine as DuckDB's
# regexp functions, so an oracle using this pattern is engine-exact).
BPE_SPLIT_RE2 = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_counts_re2(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Vectorized RE2 pre-tokenizer counts (see BPE_SPLIT_RE2). Differs from
    :func:`bpe_token_counts` only on runs of whitespace preceding a token
    (the lookahead case); fully zero-copy Arrow, no actor state needed."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = pc.count_substring_regex(batch[text_col], BPE_SPLIT_RE2)
        return pa.table({
            id_col: batch[id_col],
            "n_bpe_tokens": pc.cast(counts.fill_null(0), pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


class LangId:
    """Stopword-profile language ID (+ CJK codepoint check for zh).

    Heuristic, not a model — per-actor state is the stopword tables; scoring
    is a per-batch loop over token sets (cheap; tokens via one vectorized
    lowercase+split)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch[self.text_col]).to_pylist()
        preds = []
        for t in texts:
            if t is None:
                preds.append(None)
                continue
            if any("一" <= ch <= "鿿" for ch in t[:200]):
                preds.append("zh")
                continue
            toks = set(t.split())
            scores = {lang: len(toks & sw) for lang, sw in self.profiles.items()}
            best = max(scores, key=lambda k: (scores[k], k))
            preds.append(best if scores[best] > 0 else "en")
        return pa.table({self.id_col: batch[self.id_col], "pred_lang": pa.array(preds)})


def lang_id(ds, text_col: str = "text", id_col: str = "doc_id"):
    # instance → elastic tasks (stopword tables are tiny; warm-worker reuse
    # beats actor-pool cold start; use an actor pool only for heavy models)
    return ds.select_columns([id_col, text_col]).map_batches(
        LangId(text_col, id_col), batch_format="pyarrow",
    )


class QualityScorer:
    """Document quality scoring: length / punctuation / stopword-ratio
    heuristics (the standard web-corpus filters), vectorized where Arrow has
    kernels."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.stop = frozenset(w for sw in _STOPWORDS.values() for w in sw)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch[self.text_col]
        n_chars = pc.utf8_length(t)
        n_tokens = pc.add(pc.count_substring(t, " "), 1)
        n_punct = pc.add(
            pc.add(pc.count_substring(t, "."), pc.count_substring(t, ",")),
            pc.add(pc.count_substring(t, "!"), pc.count_substring(t, "?")),
        )
        texts = pc.utf8_lower(t).to_pylist()
        stop_ratio = []
        n_ws_tokens, n_stop_tokens = [], []
        for s in texts:
            if not s:
                stop_ratio.append(0.0)
                n_ws_tokens.append(0)
                n_stop_tokens.append(0)
                continue
            toks = s.split()
            n_stop = sum(1 for w in toks if w in self.stop)
            n_ws_tokens.append(len(toks))
            n_stop_tokens.append(n_stop)
            stop_ratio.append(n_stop / max(len(toks), 1))
        nc = np.asarray(pc.cast(n_chars, pa.float64()))
        length_score = np.clip(nc / 500.0, 0, 1)
        punct_ratio = np.asarray(pc.cast(n_punct, pa.float64())) / np.maximum(nc, 1)
        sr = np.array(stop_ratio)
        quality = 0.5 * length_score + 0.3 * np.clip(sr * 4, 0, 1) + 0.2 * (1 - np.clip(punct_ratio * 10, 0, 1))
        return pa.table({
            self.id_col: batch[self.id_col],
            "n_chars_calc": pc.cast(n_chars, pa.int64()).fill_null(0),
            "n_tokens": pc.cast(n_tokens, pa.int64()).fill_null(0),
            # integer measurements alongside the composite score: exact,
            # SQL-reproducible (the oracle-paired surface) and directly usable
            # by downstream threshold filters without float-rounding concerns
            "n_ws_tokens": pa.array(n_ws_tokens, type=pa.int64()),
            "n_stop_tokens": pa.array(n_stop_tokens, type=pa.int64()),
            "stop_ratio": pa.array(sr, type=pa.float64()),
            "quality_score": pa.array(quality, type=pa.float64()),
        })


def quality_scores(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        QualityScorer(text_col, id_col), batch_format="pyarrow",
    )


class RepetitionScorer:
    """Gopher-style repetition filters (published web-corpus heuristics):
    duplicate-line fraction, duplicate-line CHARACTER fraction, and
    top-duplicated-n-gram character fraction — the signals that catch
    boilerplate/navigation pages exact-dedup misses."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", ngram: int = 3):
        self.text_col, self.id_col, self.n = text_col, id_col, ngram

    def _doc(self, t: str) -> tuple:
        if not t:
            return 0.0, 0.0, 0.0, 0, 0, 0, 0
        lines = [l for l in t.splitlines() if l.strip()]
        dup_line_frac = dup_char_frac = 0.0
        dup_lines = dup_chars = n_line_chars = 0
        if lines:
            from collections import Counter

            c = Counter(lines)
            dup_lines = sum(v for v in c.values() if v > 1)
            dup_chars = sum(len(k) * v for k, v in c.items() if v > 1)
            n_line_chars = sum(len(l) for l in lines)
            dup_line_frac = dup_lines / len(lines)
            dup_char_frac = dup_chars / max(n_line_chars, 1)
        toks = t.split()
        top_ngram_frac = 0.0
        if len(toks) >= self.n:
            from collections import Counter

            grams = Counter(tuple(toks[i:i + self.n])
                            for i in range(len(toks) - self.n + 1))
            g, cnt = grams.most_common(1)[0]
            if cnt > 1:
                top_ngram_frac = (cnt * sum(len(w) for w in g)) / max(len(t), 1)
        return (dup_line_frac, dup_char_frac, top_ngram_frac,
                len(lines), n_line_chars, dup_lines, dup_chars)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        rows = [self._doc(t) for t in texts]
        return pa.table({
            self.id_col: batch[self.id_col],
            "dup_line_frac": pa.array([r[0] for r in rows], type=pa.float64()),
            "dup_line_char_frac": pa.array([r[1] for r in rows], type=pa.float64()),
            "top_ngram_char_frac": pa.array([r[2] for r in rows], type=pa.float64()),
            # exact integer numerators/denominators of the line metrics —
            # SQL-reproducible (oracle-paired) and float-rounding-free
            "n_lines": pa.array([r[3] for r in rows], type=pa.int64()),
            "n_line_chars": pa.array([r[4] for r in rows], type=pa.int64()),
            "dup_lines": pa.array([r[5] for r in rows], type=pa.int64()),
            "dup_line_chars": pa.array([r[6] for r in rows], type=pa.int64()),
        })


def repetition_scores(ds, text_col: str = "text", id_col: str = "doc_id", ngram: int = 3):
    return ds.select_columns([id_col, text_col]).map_batches(
        RepetitionScorer(text_col, id_col, ngram), batch_format="pyarrow",
    )


def fingerprints(ds, text_col: str = "text", id_col: str = "doc_id", window: int = 16,
                 shingle_hasher=None):
    """Winnowing-style document fingerprint: min rolling-hash over each
    window → 64-bit doc fingerprint = xor of window minima (rolling hash per
    Rabin-Karp; Schleimer et al. winnowing).

    ``shingle_hasher``: text → np.uint64 array of shingle hashes. Default is
    the fast byte-rolling :func:`~raycontract.pipelines.dedup._shingle_hashes`
    (k=8); the oracle-paired twin injects an md5-based char-shingle hasher
    that DuckDB reproduces exactly (``md5_number_lower``)."""

    def fn(batch: pa.Table) -> pa.Table:
        from raycontract.pipelines.dedup import _shingle_hashes

        hasher = shingle_hasher or (lambda t: _shingle_hashes(t, 8))
        outs = []
        for t in batch[text_col].to_pylist():
            sh = hasher(t)
            if sh.size == 0:
                outs.append(0)
                continue
            if sh.size <= window:
                outs.append(int(sh.min().astype(np.int64)))
                continue
            win = np.lib.stride_tricks.sliding_window_view(sh, window)
            minima = win.min(axis=1)
            fp = np.uint64(0)
            for m in np.unique(minima):
                fp ^= m
            outs.append(int(fp.astype(np.int64)))
        return pa.table({id_col: batch[id_col],
                         "fingerprint": pa.array(outs, type=pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_words: int = 32, overlap: int = 8):
    """Overlapping word-window chunking (RAG / context-window prep): each
    document becomes ceil-ish ``n_words / stride`` chunks of ``chunk_words``
    whitespace tokens starting every ``stride = chunk_words - overlap`` words
    (a chunk exists for every start < n_words; the tail chunk may be short).

    Emits ``(id, chunk_id, chunk_text, n_tokens)``. Fully vectorized: ONE
    ``split_pattern`` per batch, then one ``list_slice`` + ``binary_join``
    Arrow kernel pass per chunk ordinal (loop bound = max chunks per doc —
    O(doc_len/stride), never O(rows)). Matches the DuckDB
    ``string_split``/``generate_series``/``array_to_string`` oracle exactly,
    including empty-string token semantics.

    Scale note: pure map-side flat-map — no shuffle; output rows ≈
    input_words/stride, streamed block by block.
    """
    stride = chunk_words - overlap
    if stride <= 0:
        raise ValueError("chunk_words must exceed overlap")

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], batch[id_col].type),
                          "chunk_id": pa.array([], pa.int64()),
                          "chunk_text": pa.array([], pa.string()),
                          "n_tokens": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        words = pc.split_pattern(batch[text_col], " ")
        nw = pc.cast(pc.list_value_length(words), pa.int64())
        max_words = pc.max(nw).as_py()
        outs = []
        j = 0
        while j * stride < max_words:
            start = j * stride
            mask = pc.greater(nw, start)
            sub_words = words.filter(mask)
            sl = pc.list_slice(sub_words, start, start + chunk_words)
            outs.append(pa.table({
                id_col: batch[id_col].filter(mask),
                "chunk_id": pa.array(np.full(len(sub_words), j, dtype=np.int64)),
                "chunk_text": pc.binary_join(sl, " "),
                "n_tokens": pc.min_element_wise(
                    pc.subtract(nw.filter(mask), start),
                    pa.scalar(chunk_words, pa.int64())),
            }))
            j += 1
        return pa.concat_tables(outs) if outs else empty

    return ds.select_columns([id_col, text_col]).map_batches(fn, batch_format="pyarrow")


def chunk_documents_sql(chunk_words: int = 32, overlap: int = 8,
                        table: str = "documents", text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`chunk_documents` (1-based inclusive list slices)."""
    stride = chunk_words - overlap
    return f"""
WITH w AS (SELECT {id_col}, string_split({text_col}, ' ') AS words FROM {table}),
s AS (SELECT {id_col}, words,
             unnest(generate_series(1, len(words), {stride})) AS start FROM w)
SELECT {id_col},
       CAST((start - 1) // {stride} AS BIGINT) AS chunk_id,
       array_to_string(words[start : start + {chunk_words} - 1], ' ') AS chunk_text,
       CAST(least(len(words) - start + 1, {chunk_words}) AS BIGINT) AS n_tokens
FROM s"""


def vocab_topk(ds, text_col: str = "text", k: int = 100):
    """Corpus vocabulary top-k by term frequency (BPE-corpus stats / vocab
    building): per-batch ``split → list_flatten → value_counts`` partials
    (the combiner — shuffle volume is the BATCH-distinct vocabulary, zipf-
    bounded, not the token stream), adaptive grouped-sum reduce, then
    deterministic top-k (count desc, word asc). Same shape as
    ``heavy_hitters_users`` (`relational.py`)."""
    from raycontract.pipelines.smallagg import groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch[text_col], " "))
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.select_columns([text_col]).map_batches(partial, batch_format="pyarrow")
    agg = groupby_sum(partials, ["word"], ["cnt"])
    return agg.sort(["cnt", "word"], descending=[True, False]).limit(k)


def pack_sequences(ds, id_col: str = "doc_id", text_col: str = "text",
                   capacity: int = 256, num_partitions: int = 8):
    """Greedy sequential sequence packing (LLM-pretraining batch prep): docs
    are hash-partitioned (``part = knuth(id) % P``, `partition.py` codes),
    ordered by id within each partition, and folded greedily into bins of at
    most ``capacity`` whitespace tokens — a doc that would overflow a
    non-empty bin starts the next bin; a doc longer than ``capacity``
    occupies a bin alone. Emits ``(id, part, bin, n_tokens)`` — the packing
    plan a downstream concatenate-and-tokenize stage executes.

    Scale shape: ONE exchange co-locates each partition
    (``partition_map``), then one kernel per partition: token counts come
    from a vectorized ``split_pattern``/``list_value_length`` pass; the
    greedy fold is a Python loop over per-doc INT token counts only (no
    texts, no rows — ~10 ns/doc), inherently sequential per partition by
    definition of the op. Bins never span partitions, so the plan is
    deterministic under any parallelism. Oracle: recursive-CTE twin
    (:func:`pack_sequences_sql`) — rows+hash-identical by construction.
    """
    from raycontract.pipelines.partition import hash_partition_codes, partition_map

    if capacity <= 0:
        raise ValueError("capacity must be positive")

    def kernel(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "part": pa.array([], pa.int64()),
                          "bin": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        ids = np.asarray(pc.cast(t[id_col].combine_chunks(), pa.int64()))
        part = int(hash_partition_codes(t[id_col], num_partitions)[0])
        nw = np.asarray(pc.cast(pc.list_value_length(
            pc.split_pattern(t[text_col], " ")), pa.int64()))
        order = np.argsort(ids, kind="stable")
        toks = nw[order]
        bins = np.empty(len(toks), dtype=np.int64)
        b = 0
        fill = 0
        for i, tk in enumerate(toks):
            if fill > 0 and fill + tk > capacity:
                b += 1
                fill = 0
            bins[i] = b
            fill += tk
        return pa.table({id_col: pa.array(ids[order]),
                         "part": pa.array(np.full(len(toks), part, dtype=np.int64)),
                         "bin": pa.array(bins),
                         "n_tokens": pa.array(toks)})

    return partition_map(ds.select_columns([id_col, text_col]), id_col, kernel,
                         num_partitions=num_partitions)


def pack_sequences_sql(capacity: int = 256, num_partitions: int = 8,
                       table: str = "documents", text_col: str = "text",
                       id_col: str = "doc_id") -> str:
    """DuckDB recursive-CTE twin of :func:`pack_sequences` (same knuth
    partition codes, same id order, same greedy overflow rule)."""
    return f"""
WITH RECURSIVE w AS (
  SELECT {id_col},
         CAST(((CAST({id_col} AS HUGEINT) * 2654435761) % 4294967296)
              % {num_partitions} AS BIGINT) AS part,
         CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS n_tokens
  FROM {table}),
o AS (
  SELECT {id_col}, part, n_tokens,
         row_number() OVER (PARTITION BY part ORDER BY {id_col}) AS rn
  FROM w),
packed AS (
  SELECT part, rn, {id_col}, n_tokens, CAST(0 AS BIGINT) AS bin,
         n_tokens AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT o.part, o.rn, o.{id_col}, o.n_tokens,
         CASE WHEN packed.fill > 0 AND packed.fill + o.n_tokens > {capacity}
              THEN packed.bin + 1 ELSE packed.bin END,
         CASE WHEN packed.fill > 0 AND packed.fill + o.n_tokens > {capacity}
              THEN o.n_tokens ELSE packed.fill + o.n_tokens END
  FROM packed JOIN o ON o.part = packed.part AND o.rn = packed.rn + 1)
SELECT {id_col}, part, bin, n_tokens FROM packed"""


def tfidf_topk(ds, text_col: str = "text", id_col: str = "doc_id", k: int = 5):
    """Per-document top-k salient terms with corpus document frequency —
    the inverted-index / TF-IDF statistics op (`(doc, term, tf, df)`), ranked
    per doc by (tf desc, term asc) so the output is deterministic and
    integer-exact (no float idf — downstream applies any idf formula to
    ``df`` losslessly).

    Scale shape, two map-side passes over the text (each streams):

    1. **top-k pass** (zero shuffle): per batch — docs are whole within a
       batch — one ``split_pattern``/``list_parent_indices`` explode, one
       ``np.lexsort`` run-boundary pass for per-(doc,term) tf, one ranked
       run-boundary pass for top-k; only k rows per doc survive.
    2. **df pass**: per-batch distinct-(term,doc) counts → ``groupby_sum``
       — shuffle volume is the batch-distinct vocabulary (zipf-bounded),
       never the token stream; the reduced df table (corpus vocabulary) is
       broadcast once (`joins.broadcast_hash_join`) to attach df.
    """
    from raycontract.pipelines.joins import broadcast_hash_join
    from raycontract.pipelines.smallagg import groupby_sum

    proj = ds.select_columns([id_col, text_col])
    empty = pa.table({"__doc_idx": pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64())})

    def doc_term_tf(batch: pa.Table):
        """(candidate doc-run index, sorted-term-rank code, tf) — shared by
        both passes; every returned row is one distinct (doc, term) pair."""
        words = pc.split_pattern(batch[text_col], " ")
        parent = np.asarray(pc.list_parent_indices(words), dtype=np.int64)
        flat = pc.list_flatten(words).combine_chunks()
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        terms = np.asarray(enc.dictionary)
        # remap codes so ascending code == ascending lexicographic term
        lex = np.argsort(terms, kind="stable")
        inv = np.empty(len(lex), dtype=np.int64)
        inv[lex] = np.arange(len(lex))
        codes = inv[codes]
        terms = terms[lex]
        order = np.lexsort((codes, parent))
        p, c = parent[order], codes[order]
        starts = np.r_[0, np.flatnonzero((np.diff(p) != 0) | (np.diff(c) != 0)) + 1]
        tf = np.diff(np.r_[starts, len(p)])
        return p[starts], c[starts], tf, terms

    def topk_pass(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty.set_column(0, id_col, pa.array([], batch[id_col].type))
        doc, code, tf, terms = doc_term_tf(batch)
        sel = np.lexsort((code, -tf, doc))
        d = sel_doc = doc[sel]
        run_start = np.r_[0, np.flatnonzero(np.diff(d)) + 1]
        rank = np.arange(len(d)) - np.repeat(
            run_start, np.diff(np.r_[run_start, len(d)]))
        keep = sel[rank < k]
        return pa.table({
            id_col: batch[id_col].take(pa.array(doc[keep])),
            "term": pa.array(terms[code[keep]], pa.string()),
            "tf": pa.array(tf[keep], pa.int64())})

    def df_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        _, code, _, terms = doc_term_tf(batch)
        cnt = np.bincount(code, minlength=len(terms))
        nz = np.flatnonzero(cnt)
        return pa.table({"term": pa.array(terms[nz], pa.string()),
                         "df": pa.array(cnt[nz], pa.int64())})

    import ray

    df_ds = groupby_sum(proj.map_batches(df_partial, batch_format="pyarrow"),
                        ["term"], ["df"])
    df_tab = pa.concat_tables(
        [pa.table(b) for b in ray.get(df_ds.to_arrow_refs())])
    topk = proj.map_batches(topk_pass, batch_format="pyarrow")
    return broadcast_hash_join(topk, df_tab, on="term")


def word_diversity(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Per-document type-token counts (vocabulary richness — a standard
    LLM-corpus quality signal): total words and DISTINCT words per doc.

    Pure per-batch map (zero shuffle): ``split_pattern`` → flatten →
    ``dictionary_encode`` gives integer word codes; (row, code) pairs are
    packed into one uint64 and ``np.unique`` + ``bincount`` count distincts
    for every row in the batch at once — no per-row Python."""

    def kernel(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch[text_col]))  # oracle's unnest
        # of a NULL split yields no rows, so null-text docs are omitted
        words = pc.split_pattern(batch[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = np.asarray(pc.cast(pc.list_value_length(words), pa.int64()))
        flat = words.flatten()
        enc = pc.dictionary_encode(flat)
        codes = np.asarray(enc.indices, dtype=np.uint64)
        row = np.repeat(np.arange(batch.num_rows, dtype=np.uint64), n_words)
        key = (row << np.uint64(32)) | codes  # batch vocab << 2^32
        uniq_rows = (np.unique(key) >> np.uint64(32)).astype(np.int64)
        n_unique = np.bincount(uniq_rows, minlength=batch.num_rows)
        return pa.table({id_col: batch[id_col],
                         "n_words": pa.array(n_words),
                         "n_unique_words": pa.array(n_unique.astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")


def bigram_topk(ds, text_col: str = "text", k: int = 100):
    """Corpus top-k word bigrams by frequency (n-gram LM / tokenizer-merge
    statistics). Same combiner shape as :func:`vocab_topk`: per-batch
    partials — adjacent flattened words joined vectorized, row-boundary
    pairs masked out, ``value_counts`` — so shuffle volume is the
    batch-distinct bigram vocabulary, then one grouped sum + deterministic
    top-k (count desc, bigram asc)."""
    from raycontract.pipelines.smallagg import groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        flat = words.flatten()
        if len(flat) < 2:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        joined = pc.binary_join_element_wise(
            flat.slice(0, len(flat) - 1), flat.slice(1), " ")
        mask = np.ones(len(flat) - 1, dtype=bool)
        # positions whose right neighbour starts the next row are not bigrams
        offs = np.asarray(words.offsets, dtype=np.int64)
        boundaries = offs[1:-1] - 1  # last word index of every row but the last
        mask[boundaries[boundaries >= 0]] = False
        vc = pc.value_counts(joined.filter(pa.array(mask)))
        return pa.table({"bigram": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow")
    agg = groupby_sum(partials, ["bigram"], ["cnt"])
    return agg.sort(["cnt", "bigram"], descending=[True, False]).limit(k)


def word_counts(ds, text_col: str = "text"):
    """(word, cnt) corpus table — the zipf-bounded combiner reduction every
    tokenizer-training pipeline starts from (same partial shape as
    :func:`vocab_topk`, without the top-k cut)."""
    from raycontract.pipelines.smallagg import groupby_sum

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(pc.split_pattern(batch[text_col], " "))
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    return groupby_sum(ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"), ["word"], ["cnt"])


def _bpe_pairs_of(syms: list, cnt: int, acc: dict):
    for a, b in zip(syms[:-1], syms[1:]):
        acc[(a, b)] = acc.get((a, b), 0) + cnt


def _bpe_apply(syms: list, left: str, right: str) -> list:
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _bpe_train_driver(words: list[list], cnts: list[int], num_merges: int):
    merges = []
    words = [list(w) for w in words]
    for _ in range(num_merges):
        acc: dict = {}
        for syms, c in zip(words, cnts):
            _bpe_pairs_of(syms, c, acc)
        if not acc:
            break
        # deterministic argmax: count desc, then (left, right) asc
        (left, right), cnt = min(acc.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, cnt))
        words = [_bpe_apply(w, left, right) for w in words]
    return merges


def bpe_train_merges(ds, text_col: str = "text", num_merges: int = 20,
                     driver_limit: int = 2_000_000, force: str = "auto"):
    """Learn the first ``num_merges`` BPE merge rules over the corpus
    (Sennrich et al. 2016, arXiv:1508.07909): character symbols, most-
    frequent adjacent pair merged per round, frequencies weighted by word
    count. Deterministic: integer counts, argmax tie-break (count desc,
    pair asc).

    Scale shape: training never touches the corpus again after ONE
    distributed word-count pass — BPE operates on the zipf-bounded (word,
    cnt) table. ≤ ``driver_limit`` vocab rows train on the driver (pure
    Python over the small table); larger vocabularies run DISTRIBUTED
    rounds: per-batch weighted pair-count partials → adaptive grouped sum →
    driver argmax of the (pairs, count) table → broadcast merge applied per
    batch. Each round is two small executions over the materialized vocab,
    never the corpus. ``force`` ∈ {auto, driver, distributed} pins a path
    (the entry query cross-checks both).

    Returns (rank:int64 1-based, left, right, count:int64)."""
    import ray.data as rd

    wc = word_counts(ds, text_col).materialize()
    n_vocab = wc.count()

    def to_syms(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in words],
                             type=pa.list_(pa.string())),
            "cnt": batch["cnt"],
        })

    if force == "driver" or (force == "auto" and n_vocab <= driver_limit):
        words, cnts = [], []
        for b in wc.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            words.extend([list(w) for w in b["word"].to_pylist()])
            cnts.extend(b["cnt"].to_pylist())
        merges = _bpe_train_driver(words, cnts, num_merges)
    else:
        from raycontract.pipelines.smallagg import groupby_sum

        cur = wc.map_batches(to_syms, batch_format="pyarrow").materialize()
        merges = []
        for _ in range(num_merges):
            def pairs(batch: pa.Table) -> pa.Table:
                acc: dict = {}
                cnts_b = batch["cnt"].to_pylist()
                for syms, c in zip(batch["syms"].to_pylist(), cnts_b):
                    _bpe_pairs_of(syms, c, acc)
                if not acc:
                    return pa.table({"l": pa.array([], pa.string()),
                                     "r": pa.array([], pa.string()),
                                     "n": pa.array([], pa.int64())})
                ls, rs = zip(*acc.keys())
                return pa.table({"l": pa.array(ls), "r": pa.array(rs),
                                 "n": pa.array(list(acc.values()), pa.int64())})

            folded = groupby_sum(cur.map_batches(pairs, batch_format="pyarrow"),
                                 ["l", "r"], ["n"])
            t = pa.concat_tables([pa.table(b) for b in folded.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow")],
                promote_options="default")
            if t.num_rows == 0:
                break
            rows = sorted(zip(t["l"].to_pylist(), t["r"].to_pylist(),
                              t["n"].to_pylist()),
                          key=lambda x: (-x[2], x[0], x[1]))
            left, right, cnt = rows[0]
            merges.append((left, right, int(cnt)))

            def apply(batch: pa.Table, _l=left, _r=right) -> pa.Table:
                return pa.table({
                    "syms": pa.array([_bpe_apply(s, _l, _r)
                                      for s in batch["syms"].to_pylist()],
                                     type=pa.list_(pa.string())),
                    "cnt": batch["cnt"],
                })

            cur = cur.map_batches(apply, batch_format="pyarrow").materialize()

    return pa.table({
        "rank": pa.array(range(1, len(merges) + 1), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "count": pa.array([m[2] for m in merges], pa.int64()),
    })


def oov_rate(ds, text_col: str = "text", id_col: str = "doc_id",
             vocab_k: int = 1000):
    """Per-document out-of-vocabulary counts against the corpus top-k
    vocabulary (the vocabulary-coverage quality filter): two chained
    distributed stages — (1) :func:`vocab_topk` builds the zipf-bounded
    top-k word list (deterministic count-desc/word-asc tie-break), which is
    ``ray.put`` ONCE; (2) one zero-shuffle pass counts each doc's tokens
    absent from it (vectorized ``pc.is_in`` + offset ``bincount``).
    Output: (id, n_tokens:int64, n_oov:int64)."""
    import ray

    vt = vocab_topk(ds, text_col, k=vocab_k)
    chunks = [b["word"].combine_chunks()
              for b in vt.iter_batches(batch_size=1 << 20,
                                       batch_format="pyarrow") if b.num_rows]
    vocab = (pa.concat_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                               else c for c in chunks])
             if chunks else pa.array([], pa.string()))
    ref = ray.put(vocab)

    def kernel(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        # NULL text rows are skipped (matching the SQL oracle's WHERE
        # text IS NOT NULL): list_value_length of a null list is null,
        # which would poison the np.repeat row index below.
        batch = batch.filter(pc.is_valid(batch[text_col]))
        words = pc.split_pattern(batch[text_col], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        n_words = np.asarray(pc.cast(pc.list_value_length(words), pa.int64()))
        flat = words.flatten()
        oov = np.asarray(pc.invert(pc.is_in(flat, value_set=v))).astype(bool)
        row = np.repeat(np.arange(batch.num_rows), n_words)
        n_oov = np.bincount(row[oov], minlength=batch.num_rows)
        return pa.table({id_col: batch[id_col],
                         "n_tokens": pa.array(n_words),
                         "n_oov": pa.array(n_oov.astype(np.int64))})

    return ds.select_columns([id_col, text_col]).map_batches(
        kernel, batch_format="pyarrow")
