"""Sparse lexical retrieval — BM25 top-k search as a pure DataFrame
plan. The exact-term counterpart to `operators/similarity.py`'s
dense-vector ANN: LLM data pipelines use it for benchmark
decontamination sweeps, targeted corpus curation ("find documents
about X"), and hard-negative mining, where embedding recall misses
exact-term evidence.

Scoring is Lucene-variant BM25 (always-positive IDF):

    score(q, d) = Σ_{t ∈ q} qtf(t) · ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                  · tf(t,d)·(k1 + 1) / (tf(t,d) + k1·(1 - b + b·|d|/avgdl))

Scale shape: corpus statistics are two hash aggregations over the
exploded token stream (per-(doc, token) tf and per-token df — the
inherent shuffles, both map-side combined) plus a 1-row (N, avgdl)
aggregate. The QUERY side (terms of the query set) is small by
construction and BROADCASTS into the postings join, so scoring is one
broadcast hash join over the corpus tf table — corpus-linear, no
cartesian — followed by one (query, doc) aggregation and a per-query
top-k window. Nothing driver-side.

Scores round at 1e-6 BEFORE ranking (ties then break on doc id), so
libm last-ulp drift between engines cannot reorder a result list —
the correctness oracle re-derives the same formula in ANSI SQL.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCORE_DECIMALS = 6


def _tokens(col: Column) -> Column:
    """Lower-cased alphanumeric tokens, empties filtered — the same
    engine-portable token class as `operators/classify.py`."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"),
                    lambda t: F.length(t) > 0)


def bm25_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id",
              query_text_col: str = "query_text",
              query_id_col: str = "query_id") -> DataFrame:
    """Top-``k`` corpus documents per query row, BM25-ranked. Returns
    (query_id_col, id_col, rank, score) — only documents sharing at
    least one term with the query are candidates (standard sparse-
    retrieval semantics; a no-overlap query returns no rows)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = (corpus.select(F.col(id_col),
                        F.explode(_tokens(F.col(text_col))).alias("token"))
          .groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    doc_len = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # N and avgdl from the full corpus (zero-token docs count toward N
    # and pull avgdl down, matching their presence in the collection)
    stats = (corpus.select(F.col(id_col))
             .join(doc_len, id_col, "left").na.fill({"dl": 0})
             .agg(F.count("*").alias("n_docs"),
                  F.avg(F.col("dl").cast("double")).alias("avgdl")))
    df_t = tf.groupBy("token").agg(F.count("*").alias("df"))
    qterms = (queries.select(
        F.col(query_id_col),
        F.explode(_tokens(F.col(query_text_col))).alias("token"))
        .groupBy(query_id_col, "token").agg(F.count("*").alias("qtf")))
    # postings join: broadcast the small query-term side over corpus tf
    return _score_and_rank(
        tf, F.broadcast(df_t.join(qterms.select("token").distinct(),
                                  "token")),
        doc_len, stats, qterms, k, k1, b, query_id_col, id_col)


def _score_and_rank(tf, df_t, doc_len, stats, qterms, k, k1, b,
                    query_id_col, id_col):
    """The one BM25 scoring plan both entry points share (so the
    persisted index can never drift from the one-shot path): postings ⋈
    query terms ⋈ df ⋈ doc lengths × (N, avgdl), scored, rounded,
    ranked per query. ``df_t=None`` means ``tf`` already carries its
    ``df`` column (the indexed search computes it as a window over the
    token-pruned slice — one scan instead of re-aggregating the
    postings; the one-shot path keeps the broadcast join because its
    corpus-sized tf must not be window-shuffled whole)."""
    joined = tf.join(F.broadcast(qterms), "token")
    if df_t is not None:
        joined = joined.join(df_t, "token")
    joined = (joined
              .join(doc_len, id_col)
              .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    tf_part = (F.col("tf") * (F.lit(k1) + 1.0)
               / (F.col("tf") + F.lit(k1)
                  * (F.lit(1.0 - b)
                     + F.lit(b) * F.col("dl") / F.col("avgdl"))))
    scored = (joined
              .withColumn("part", F.col("qtf") * idf * tf_part)
              .groupBy(query_id_col, id_col)
              .agg(F.round(F.sum("part"), SCORE_DECIMALS).alias("score")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, id_col, "rank", "score"))


# ---------------------------------------------------------------------------
# Persisted BM25 index (VERDICT r10 task 6): the one-shot bm25_topk
# recomputes tf/df for every query batch — corpus-linear per CALL. A
# pipeline that decontaminates against the same corpus repeatedly (or
# grows it between sweeps) wants the postings persisted once, the same
# store pattern as dedup.minhash_build_store.
# ---------------------------------------------------------------------------

_POSTINGS_SCHEMA = "token string, doc_id long, tf long"
# search() pushes the query's distinct tokens into the postings scan as
# an IN filter; past this many tokens it keeps the full-scan semi-join
MAX_SCAN_PUSHDOWN_TOKENS = 10_000
_DOCLEN_SCHEMA = "doc_id long, dl long"


class Bm25Index:
    """Two IceTables under one location: ``postings`` (token, doc_id,
    tf — range-clustered on token so per-file bounds prune postings
    reads down to the query's terms) and ``doclens`` (doc_id, dl; one
    row per corpus doc INCLUDING zero-token docs, so N and avgdl derive
    exactly from a cheap aggregate). df(token) is the posting-list
    length, counted from the postings the query touches anyway — no
    third table to keep consistent.

    Scale: search cost tracks the QUERY's posting lists (token bounds
    prune the rest of the postings table), not the corpus; ``add``
    cost tracks the new batch. Snapshots make index updates atomic and
    time-travelable like any other table."""

    def __init__(self, spark, postings, doclens):
        self.spark = spark
        self.postings = postings
        self.doclens = doclens

    # -- lifecycle --------------------------------------------------------
    @classmethod
    def build(cls, spark, location: str, corpus: DataFrame,
              text_col: str = "text", id_col: str = "doc_id",
              buckets: Optional[int] = None) -> "Bm25Index":
        import os

        from iceberg_cpp_spark.core.types import schema_from_spark
        from iceberg_cpp_spark.table import IceTable

        postings = IceTable.create(
            spark, os.path.join(location, "postings"),
            schema_from_spark(
                spark.createDataFrame([], _POSTINGS_SCHEMA).schema))
        doclens = IceTable.create(
            spark, os.path.join(location, "doclens"),
            schema_from_spark(
                spark.createDataFrame([], _DOCLEN_SCHEMA).schema))
        idx = cls(spark, postings, doclens)
        return idx.add(corpus, text_col=text_col, id_col=id_col,
                       buckets=buckets)

    @classmethod
    def load(cls, spark, location: str) -> "Bm25Index":
        import os

        from iceberg_cpp_spark.table import IceTable

        return cls(spark,
                   IceTable.load(spark, os.path.join(location, "postings")),
                   IceTable.load(spark, os.path.join(location, "doclens")))

    # -- maintenance --------------------------------------------------------
    # sizing for the auto bucket count: a postings row (short token +
    # two longs) parquet-encodes at ~15-30 B, so ~4M rows/bucket lands
    # output files in the guide-§6 128 MB-1 GB band
    _POSTING_ROWS_PER_BUCKET = 4_000_000

    def add(self, new_docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id",
            buckets: Optional[int] = None) -> "Bm25Index":
        """Index a new batch: one tf aggregation over the batch, two
        appends. Re-submitted doc ids are skipped (anti-join against
        doclens) so a replayed batch is a no-op, not a double-count.

        ``buckets`` (token-range clustering width of the postings
        append) defaults to SCALE-ADAPTIVE (r17, guide §2/§6): derived
        from the batch's token count so postings files land near the
        128 MB-1 GB band — a fixed 32 made a small batch pay a 32-way
        range shuffle and write 32 tiny files, while a 10^12-token
        batch would cram ~30 GB per file. Pass an explicit count to
        pin the old behavior."""
        docs = new_docs.select(F.col(id_col).alias("doc_id"),
                               F.col(text_col).alias("text"))
        if self.doclens.current_snapshot() is not None:
            # replay gate; skipped on a fresh index (nothing to rescan)
            docs = docs.join(self.doclens.to_df().select("doc_id"),
                             "doc_id", "left_anti")
        # persist tf: it feeds BOTH the doclens aggregation and the
        # postings append — unpersisted, the batch tokenizes (explode +
        # groupBy over every document) twice
        tf = (docs.select("doc_id",
                          F.explode(_tokens(F.col("text"))).alias("token"))
              .groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
              ).persist()
        dl = (docs.select("doc_id")
              .join(tf.groupBy("doc_id").agg(F.sum("tf").alias("dl")),
                    "doc_id", "left").na.fill({"dl": 0})).persist()
        try:
            b = dl.agg(F.count("*").alias("n"),
                       F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
                       ).collect()[0]
            if buckets is None:
                # total token occurrences (Σdl, already collected)
                # bound the postings row count from above
                buckets = max(1, -(-int(b["s"])
                                   // self._POSTING_ROWS_PER_BUCKET))
            # range-cluster postings on token: per-file token bounds make
            # search prune straight to the query's posting lists
            self.postings = self.postings.append(
                tf.select("token", "doc_id", "tf")
                .repartitionByRange(buckets, "token"))
            pn, ps = self._stats_pair()
            # cumulative corpus stats ride the doclens commit's SUMMARY
            # — atomic with the rows they describe, so search never
            # rescans the doclens table for N/avgdl (at 10^9 docs that
            # scan per query set is the scale killer). A crash between
            # the two appends is covered by the doclens replay gate.
            self.doclens = self.doclens.append(
                dl.select("doc_id", "dl"),
                summary_extras={
                    "bm25.n-docs": str(pn + int(b["n"])),
                    "bm25.total-dl": str(ps + int(b["s"]))})
        finally:
            dl.unpersist()
            tf.unpersist()
        return self

    def remove(self, doc_ids: DataFrame, id_col: str = "doc_id") -> "Bm25Index":
        """Delete documents from the index: EQUALITY DELETES keyed by
        doc_id on both IceTables. The corpus statistics shrink exactly —
        N/avgdl derive from live doclens rows, df(t) is counted from
        live postings — so search-after-remove equals a one-shot
        ``bm25_topk`` over the reduced corpus (pinned by tests).

        doclens deletes FIRST: a torn crash between the two commits can
        then never surface a removed doc in results (scoring inner-joins
        doclens), and replaying the remove converges — equality deletes
        of already-deleted keys are no-ops, so the operation is
        replay-idempotent. A removed id can be re-indexed later via
        ``add`` (the doclens replay gate sees it as absent). Delete-file
        accumulation folds via the tables' ordinary
        ``rewrite_equality_deletes`` maintenance."""
        keys = doc_ids.select(F.col(id_col).alias("doc_id")).distinct()
        keys = keys.persist()
        try:
            r = (self.doclens.to_df()
                 .join(keys, "doc_id", "left_semi")
                 .agg(F.count("*").alias("n"),
                      F.coalesce(F.sum("dl"), F.lit(0)).alias("s"))
                 .collect()[0])
            pn, ps = self._stats_pair()
            self.doclens = self.doclens.delete_by_keys(
                keys, summary_extras={
                    "bm25.n-docs": str(pn - int(r["n"])),
                    "bm25.total-dl": str(ps - int(r["s"]))})
            self.postings = self.postings.delete_by_keys(keys)
        finally:
            keys.unpersist()
        return self

    def _stats_pair(self) -> tuple:
        """(n_docs, total_dl) of the CURRENT doclens snapshot: from the
        snapshot summary when this index's write paths stamped it (the
        common case), else one aggregate over the live rows (foreign
        edits / pre-r14 indexes — correct, just not O(1))."""
        snap = self.doclens.current_snapshot()
        if snap is None:
            return 0, 0
        s = snap.summary or {}
        if "bm25.n-docs" in s and "bm25.total-dl" in s:
            return int(s["bm25.n-docs"]), int(s["bm25.total-dl"])
        r = (self.doclens.to_df()
             .agg(F.count("*").alias("n"),
                  F.coalesce(F.sum("dl"), F.lit(0)).alias("s"))
             .collect()[0])
        return int(r["n"]), int(r["s"])

    # -- search -------------------------------------------------------------
    def search(self, queries: DataFrame, k: int = 10,
               k1: float = 1.2, b: float = 0.75,
               query_text_col: str = "query_text",
               query_id_col: str = "query_id") -> DataFrame:
        """Identical semantics (and identical rounded scores) to the
        one-shot ``bm25_topk`` — pinned by tests — but reading the
        persisted postings instead of re-aggregating the corpus."""
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        qterms = (queries.select(
            F.col(query_id_col),
            F.explode(_tokens(F.col(query_text_col))).alias("token"))
            .groupBy(query_id_col, "token").agg(F.count("*").alias("qtf")))
        doclen_df = self.doclens.to_df()
        # N/avgdl from the doclens snapshot SUMMARY (stamped atomically
        # by add/remove) — zero doclens scans per search; the integer
        # total/count division equals Spark's avg() exactly, so scores
        # stay bit-identical to the aggregate path. Fallback: aggregate.
        n_docs, total_dl = self._stats_pair()
        if n_docs > 0:
            stats = self.spark.createDataFrame(
                [(n_docs, total_dl / n_docs)],
                "n_docs long, avgdl double")
        else:
            stats = doclen_df.agg(
                F.count("*").alias("n_docs"),
                F.avg(F.col("dl").cast("double")).alias("avgdl"))
        # postings restricted to the query's tokens. The query set is
        # small by construction: its distinct tokens collect to the
        # driver and push into the SCAN as an IN filter, so file-level
        # token bounds (range-clustered at write) prune whole posting
        # files and the parquet reader gets the pushed predicate. Past
        # the cap the plan keeps the full scan + semi-join (still
        # corpus-linear, never wrong).
        from iceberg_cpp_spark.plans import expressions as ex

        cap = MAX_SCAN_PUSHDOWN_TOKENS
        toks = [r["token"]
                for r in qterms.select("token").distinct().limit(cap + 1)
                .collect()]
        if len(toks) <= cap:
            tf = self.postings.scan(
                filter=ex.in_(ex.Reference("token"), toks)).to_df()
        else:
            tf = (self.postings.to_df()
                  .join(F.broadcast(qterms.select("token").distinct()),
                        "token", "left_semi"))
        # the two add() appends (postings, then doclens) are separate
        # commits: a crash between them makes the replayed batch
        # re-append identical postings rows (doclens can never
        # duplicate — it gates the replay). MAX over the duplicate rows
        # restores the exact tf, so a torn replay is harmless; the
        # aggregate runs on the token-pruned slice only
        tf = tf.groupBy("token", "doc_id").agg(F.max("tf").alias("tf"))
        # df as a window over the deduped slice: (token, doc_id) is
        # unique after the MAX, so count-per-token IS countDistinct —
        # one pass over the token-pruned postings instead of a second
        # scan + aggregate + broadcast join (the slice is query-token-
        # bounded, so the window shuffle is small by construction)
        tf = tf.withColumn(
            "df", F.count("*").over(Window.partitionBy("token")))
        return _score_and_rank(tf, None, doclen_df, stats,
                               qterms, k, k1, b, query_id_col, "doc_id")


def build_bm25_index(spark, location: str, corpus: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     buckets: int = 32) -> Bm25Index:
    """Functional alias for ``Bm25Index.build`` (the
    minhash_build_store-shaped entry point)."""
    return Bm25Index.build(spark, location, corpus, text_col=text_col,
                           id_col=id_col, buckets=buckets)
