"""Text-analysis operators over document tables — all pure Column
expressions (JVM-side, whole-stage codegen; no python in the hot path).

- token counting (whitespace + BPE-ish subword estimate)
- quality scoring (length / punctuation / stopword / word-shape ratios)
- language ID (stopword-hit n-gram heuristic)
- document fingerprinting (normalized md5 + positional rolling sample)
- repetition stats (Gopher-style top-/duplicated-n-gram signals)
- benchmark contamination flagging (shared word-n-gram semi-join)
- PII redaction (email / IPv4 / SSN patterns, RE2-compatible regexes)
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators.partitioning import spread_to_parallelism

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "et", "de", "des", "est", "une", "dans", "que"],
    "es": ["el", "la", "los", "de", "que", "y", "en", "un", "es", "por"],
}


def words(col: Column) -> Column:
    """Lower-cased whitespace tokens; empty string → empty array."""
    trimmed = F.trim(F.lower(col))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(trimmed, r"\s+"))


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def subword_token_estimate(col: Column) -> Column:
    """BPE-ish token estimate: word-piece boundaries approximated by
    splitting on non-alphanumerics plus a long-word correction —
    the standard ~4-chars-per-token heuristic, computable JVM-side."""
    pieces = F.size(F.filter(
        F.split(F.lower(col), r"[^\p{L}\p{N}]+"), lambda w: F.length(w) > 0))
    long_corr = F.floor(F.length(col) / F.lit(16))
    return (pieces + long_corr).cast("long")


def punct_ratio(col: Column) -> Column:
    total = F.greatest(F.length(col), F.lit(1)).cast("double")
    puncts = F.length(F.regexp_replace(col, r"[^\p{Punct}]", ""))
    return puncts / total


def alpha_ratio(col: Column) -> Column:
    total = F.greatest(F.length(col), F.lit(1)).cast("double")
    alphas = F.length(F.regexp_replace(col, r"[^\p{L}]", ""))
    return alphas / total


def mean_word_len(col: Column) -> Column:
    w = words(col)
    n = F.greatest(F.size(w), F.lit(1)).cast("double")
    return F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    w = words(col)
    n = F.greatest(F.size(w), F.lit(1)).cast("double")
    sw = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
    hits = F.size(F.filter(w, lambda x: F.array_contains(sw, x)))
    return hits / n


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, mostly letters,
    sane word lengths, not punctuation soup, has common-word mass."""
    length_ok = F.least(F.length(col).cast("double") / F.lit(200.0), F.lit(1.0))
    alpha = alpha_ratio(col)
    punct_pen = F.lit(1.0) - F.least(punct_ratio(col) * 4.0, F.lit(1.0))
    mwl = mean_word_len(col)
    wordlen_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    return (length_ok * 0.25 + alpha * 0.25 + punct_pen * 0.2
            + wordlen_ok * 0.15 + sw * 0.15)


def stopword_hits(col: Column, lang: str) -> Column:
    """Total stopword occurrences for one language (counts, not distinct)."""
    w = words(col)
    sw = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
    return F.size(F.filter(w, lambda x: F.array_contains(sw, x)))


def language_id(col: Column) -> Column:
    """argmax over per-language stopword hits; 'und' (undetermined) when
    no language scores. Deterministic tie-break: language order."""
    langs = list(_STOPWORDS)
    hits = [stopword_hits(col, l) for l in langs]
    best = F.greatest(*hits)
    expr = F.lit("und")
    for l, h in zip(reversed(langs), reversed(hits)):
        expr = F.when((best > 0) & (h == best), F.lit(l)).otherwise(expr)
    return expr


def fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of whitespace/case-normalized text."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def rolling_fingerprint(col: Column, window: int = 64, step: int = 32) -> Column:
    """Positional fingerprint: md5 of each window-sized slice sampled
    every ``step`` chars (first 8 slices) — for partial-overlap detection."""
    starts = F.sequence(F.lit(0), F.least(
        F.greatest((F.length(col) - window), F.lit(0)), F.lit(step * 7)), F.lit(step))
    return F.transform(starts, lambda s: F.md5(F.substring(col, s + 1, window)))


def word_ngrams(col: Column, n: int) -> Column:
    """Space-joined word n-grams as an array; empty when the document has
    fewer than ``n`` words. Pure JVM array ops (split/slice/concat_ws)."""
    w = words(col)
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(w) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(w, i, n))))


def _max_run_length(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — one
    O(G) fold (JVM aggregate), no nested lambda re-evaluation."""
    inc = lambda acc, x: F.when(x.eqNullSafe(acc["prev"]),
                                acc["run"] + 1).otherwise(F.lit(1))
    return F.aggregate(
        sorted_arr,
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).alias("run"), F.lit(0).alias("best")),
        lambda acc, x: F.struct(
            x.alias("prev"),
            inc(acc, x).alias("run"),
            F.greatest(acc["best"], inc(acc, x)).alias("best")),
        lambda acc: acc["best"])


def top_ngram_count(col: Column, n: int) -> Column:
    """Occurrences of the document's most frequent word n-gram — the
    Gopher "fraction of tokens in the most common n-gram" repetition
    signal's numerator. Max multiplicity = longest equal-run of the
    sorted gram array: O(G log G) per row, embarrassingly parallel,
    no shuffle."""
    return _max_run_length(F.array_sort(word_ngrams(col, n))).cast("int")


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition features (Gopher quality-filter family):
    token count, 2-gram total/distinct/top counts, 5-gram total/distinct.
    Integer-only surface; callers derive the ratios (top2/n_grams2 etc.).
    Zero Python in the hot path; no shuffle. Staged as two projections so
    each gram array is built ONCE per row (CollapseProject keeps
    non-cheap expressions referenced more than once in their own
    stage — a single select would rebuild `_g2` per referencing column).
    Under-partitioned inputs are spread to defaultParallelism first
    (same rationale as contamination())."""
    df = spread_to_parallelism(df)
    c = F.col(text_col)
    staged = df.select(
        F.col(id_col),
        token_count(c).cast("int").alias("n_tokens"),
        word_ngrams(c, 2).alias("_g2"),
        word_ngrams(c, 5).alias("_g5"),
    )
    return staged.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.size("_g2").alias("n_grams2"),
        F.size(F.array_distinct("_g2")).alias("n_distinct_grams2"),
        _max_run_length(F.array_sort(F.col("_g2"))).cast("int").alias("top2_count"),
        F.size("_g5").alias("n_grams5"),
        F.size(F.array_distinct("_g5")).alias("n_distinct_grams5"),
    )


def contamination(corpus: DataFrame, benchmark: DataFrame, n: int = 4,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Flag corpus documents sharing ≥1 word n-gram with a benchmark/eval
    set (train-test contamination screen, GPT-3 §C / Llama style).

    Scale shape: the benchmark's distinct gram set is small → broadcast;
    corpus grams explode and broadcast-hash-semi-join with NO shuffle of
    the corpus; only the per-doc count aggregation shuffles (doc_id keys,
    map-side combine). Returns (id_col, n_contaminated_grams) for hit
    documents only. Under-partitioned inputs (one small file) are spread
    to defaultParallelism first so gram construction uses every core —
    at scale the input is already wide and no extra shuffle happens."""
    corpus = spread_to_parallelism(corpus)
    benchmark = spread_to_parallelism(benchmark)
    # r18 (guide §2.3, VERDICT r17 task 6): dedup grams PER ROW with
    # array_distinct BEFORE the explode — then the aggregation is a
    # plain count with map-side partial aggregation (one row per doc
    # per map partition crosses the exchange) instead of countDistinct,
    # which shipped every surviving (doc, gram) pair through the
    # shuffle to dedup what the row already could. Same result: with
    # per-doc-unique grams, count(matched) == countDistinct(matched).
    grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_ngrams(F.col(text_col), n)))
        .alias("gram"))
    bench_grams = (benchmark
                   .select(F.explode(F.array_distinct(
                       word_ngrams(F.col(text_col), n))).alias("gram"))
                   .distinct())
    return (grams
            .join(F.broadcast(bench_grams), "gram")
            .groupBy(id_col)
            .agg(F.count("gram").cast("int").alias("n_contaminated_grams")))


# (name, RE2+Java-compatible pattern, replacement) — ordered; SSN before
# IPv4 is irrelevant (disjoint), email first so its dotted host never
# half-matches the IPv4 rule. No lookaround/backrefs: must run identically
# under Java regex (Spark) and RE2 (DuckDB oracle).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(col: Column) -> Column:
    """Replace email / SSN / IPv4 literals with typed placeholder tokens.
    Chained JVM regexp_replace — whole-stage codegen, no Python."""
    out = col
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(col: Column) -> list[Column]:
    """One aliased match-count Column per PII pattern (n_email, n_ssn,
    n_ipv4) — counted on the ORIGINAL text, in PII_PATTERNS order."""
    return [F.regexp_count(col, F.lit(pat)).cast("int").alias(f"n_{name}")
            for name, pat, _ in PII_PATTERNS]


def chunk_documents(df: DataFrame, chunk_chars: int = 1000,
                    overlap_chars: int = 100, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping character chunks (the upstream
    step pack_sequences assumes for oversized docs, and the RAG indexing
    primitive). Pure JVM: sequence → substring → posexplode; chunk i
    starts at i·(chunk−overlap), consecutive chunks overlap by
    ``overlap_chars``, the last chunk may be shorter, an empty document
    yields one empty chunk (the row is never lost). Start positions
    stop at len−overlap−1: a later start would yield a chunk fully
    contained in its predecessor (coverage still holds — the last kept
    start is ≥ len−chunk). No shuffle; ~len/(chunk−overlap) rows per
    doc."""
    if not 0 <= overlap_chars < chunk_chars:
        raise ValueError(f"need 0 <= overlap {overlap_chars} < chunk {chunk_chars}")
    step = chunk_chars - overlap_chars
    c = F.col(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(c) - overlap_chars - 1, F.lit(0)),
        F.lit(step))
    chunks = F.transform(starts, lambda s: F.substring(c, s + 1, chunk_chars))
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"))


def duplicate_span_scrub(df: DataFrame, window: int = 50,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact-substring deduplication at TOKEN-WINDOW granularity —
    the ExactSubstr operation of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL 2022), re-expressed for
    Spark: every ``window``-token span whose md5 appears MORE THAN ONCE
    in the corpus (any doc, including the same doc) is removed from all
    its occurrences; the survivors are reassembled in order. Paper uses
    a suffix array; a corpus-global rolling-window hash count finds the
    same ≥window-token repeats (modulo md5 collisions) with two ordinary
    shuffles — no suffix array to build, shard, or merge at 100 TB.

    Returns ``(id_col, n_tokens, n_removed, scrubbed)``; docs shorter
    than ``window`` tokens pass through unchanged (n_removed 0), empty
    docs yield an empty ``scrubbed``.

    Scale shape: the exploded window stream carries (doc_id, pos,
    32-byte md5) — token text never enters the wide shuffle; duplicate
    hashes come from ONE map-side-combined count; dup-start marks shuffle
    back on the hash join and fold to one array per doc. The final mask
    is a JVM higher-order filter: O(tokens x dup_starts_per_doc) with no
    Python in the loop. Dup spans cluster (a repeated paragraph yields a
    RUN of starts), so dup_starts per doc stays near the number of
    repeated regions, not token count."""
    if window < 2:
        raise ValueError(f"window must be >= 2 tokens: {window}")
    c = F.col(text_col)
    toks = df.select(F.col(id_col), words(c).alias("_w"))
    # md5 of every window-token slice, positions 0-based
    n_win = F.size(F.col("_w")) - (window - 1)
    winh = (toks.filter(F.size("_w") >= window)
            .select(
                id_col,
                F.posexplode(F.transform(
                    F.sequence(F.lit(1), n_win),
                    lambda i: F.md5(F.concat_ws(
                        " ", F.slice(F.col("_w"), i, window)))))
                .alias("_pos", "_h")))
    dup = (winh.groupBy("_h").agg(F.count("*").alias("_c"))
           .filter(F.col("_c") > 1).select("_h"))
    starts = (winh.join(dup, "_h")
              .groupBy(id_col)
              .agg(F.array_sort(F.collect_set("_pos")).alias("_starts")))
    out = (toks.join(starts, id_col, "left")
           .select(
               id_col,
               F.size("_w").cast("long").alias("n_tokens"),
               F.filter(
                   F.transform(F.col("_w"),
                               lambda x, i: F.struct(x.alias("t"),
                                                     i.alias("i"))),
                   lambda s: ~F.exists(
                       F.coalesce(F.col("_starts"),
                                  F.array().cast("array<integer>")),
                       lambda v: (v <= s["i"]) & (s["i"] < v + window)))
               .alias("_kept")))
    return out.select(
        id_col, "n_tokens",
        (F.col("n_tokens") - F.size("_kept")).cast("long").alias("n_removed"),
        F.concat_ws(" ", F.transform(F.col("_kept"), lambda s: s["t"]))
        .alias("scrubbed"))


def paragraph_dedup(df: DataFrame, max_doc_freq: int = 2,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Cross-corpus repeated-paragraph removal (the boilerplate scrub
    step of web-scale pipelines — nav bars, cookie banners, license
    footers repeat across sites while real prose does not). Documents
    split on blank lines; a paragraph whose NORMALIZED form (lowercase,
    whitespace collapsed) appears in more than ``max_doc_freq``
    DISTINCT documents is dropped from every document; survivors are
    reassembled in original order. Returns (id_col, text, n_paras,
    n_kept) — a fully-boilerplate document survives with empty text,
    never silently vanishes.

    Plan at scale: one posexplode (no shuffle), one hash aggregation
    for corpus-global paragraph frequency (the inherent shuffle), one
    anti-join on the frequency key, one groupBy(id) to reassemble.
    Pure Column expressions end-to-end — no UDFs, no driver state;
    paragraph keys are md5 digests so the aggregation carries 32-byte
    keys, not paragraph bodies."""
    if max_doc_freq < 1:
        raise ValueError(f"max_doc_freq must be >= 1, got {max_doc_freq}")
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), r"\n[\t ]*\n"))
        .alias("para_idx", "para"))
    norm = F.trim(F.regexp_replace(F.lower(F.col("para")), r"\s+", " "))
    paras = (paras.withColumn("pkey", F.md5(norm))
             .filter(F.length(norm) > 0))  # blank-run artifacts
    banned = (paras.groupBy("pkey")
              .agg(F.countDistinct(id_col).alias("df_count"))
              .filter(F.col("df_count") > max_doc_freq)
              .select("pkey"))
    kept = paras.join(banned, "pkey", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws("\n\n", F.transform(
            F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
            lambda s: s["para"])).alias("text"),
        F.count("*").alias("n_kept"))
    totals = paras.groupBy(id_col).agg(F.count("*").alias("n_paras"))
    return (df.select(id_col).join(totals, id_col, "left")
            .join(rebuilt, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("text"), F.lit("")).alias("text"),
                    F.coalesce(F.col("n_paras"), F.lit(0)).alias("n_paras"),
                    F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept")))


def token_frequency_stats(df: DataFrame, freq_source: Optional[DataFrame] = None,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          broadcast_max_vocab: Optional[int] = 2_000_000) -> DataFrame:
    """Corpus-familiarity features — the integer-safe core of a unigram
    LM quality filter (CCNet-style: documents made of corpus-rare tokens
    are low-quality or out-of-domain; -Σ log p derives from these counts
    in the caller's float policy of choice). Per document, against word
    frequencies counted over ``freq_source`` (default: ``df`` itself):

      n_tokens, sum_freq (Σ corpus count of each token occurrence),
      min_freq (rarest token's corpus count; 0 when any token is OOV).

    Scale shape: one groupBy(word) over the exploded freq source
    (map-side combine), one final groupBy(doc). The frequency table is
    broadcast to the corpus join ONLY while its vocabulary is bounded:
    a 100 TB web corpus's unigram vocab (URLs, ids, typos) is tens of
    GB and an unconditional ``F.broadcast`` would OOM every executor.
    Same gate pattern as the eq-delete key broadcast
    (``engine.read.eq-delete-broadcast-max-records`` in table.py): the
    vocab is materialized once (localCheckpoint — it is needed verbatim
    by the join anyway), counted, and broadcast-hinted only when
    ``<= broadcast_max_vocab`` rows; above the gate (or when the gate is
    None) no hint is attached and AQE picks the join strategy — a
    shuffled hash join on `_w`. All integers — no cross-engine float
    surface.

    Caller-facing contract (ADVICE r07): when ``broadcast_max_vocab``
    is set (the default), calling this function RUNS a Spark job
    immediately — the vocab aggregate is materialized eagerly to decide
    the join strategy, even if the returned DataFrame is never executed.
    Pass ``broadcast_max_vocab=None`` for a fully lazy plan. The
    checkpointed vocab blocks live on executors without lineage: if an
    executor holding them dies, downstream actions on the returned
    DataFrame fail rather than recompute (acceptable for the ~minutes
    lifetime of a batch query; rerun the operator on failure — callers
    needing replayable fault tolerance should persist ``freq_source``'s
    aggregate themselves with reliable checkpointing)."""
    src = freq_source if freq_source is not None else df
    freqs = (src.select(F.explode(words(F.col(text_col))).alias("_w"))
             .groupBy("_w").agg(F.count("*").alias("_freq")))
    if broadcast_max_vocab is not None:
        # materialize the aggregate once; the count and the join both
        # read the checkpointed blocks (no second pass over the corpus)
        freqs = freqs.localCheckpoint(eager=True)
        if freqs.count() <= broadcast_max_vocab:
            freqs = F.broadcast(freqs)
    toks = df.select(F.col(id_col), F.explode(words(F.col(text_col))).alias("_w"))
    return (toks.join(freqs, "_w", "left")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_tokens"),
                 F.sum(F.coalesce("_freq", F.lit(0)))
                 .cast("long").alias("sum_freq"),
                 F.min(F.coalesce("_freq", F.lit(0)))
                 .cast("long").alias("min_freq")))


def analyze_documents(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Full per-document feature set in one JVM-side projection."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        subword_token_estimate(c).alias("n_subword_tokens"),
        F.round(alpha_ratio(c), 4).alias("alpha_ratio"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(mean_word_len(c), 4).alias("mean_word_len"),
        F.round(stopword_ratio(c), 4).alias("stopword_ratio"),
        F.round(quality_score(c), 4).alias("quality"),
        language_id(c).alias("lang_pred"),
        fingerprint(c).alias("fingerprint"),
    )
