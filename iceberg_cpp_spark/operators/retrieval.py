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
    joined = (tf.join(F.broadcast(qterms), "token")
              .join(F.broadcast(df_t.join(
                  qterms.select("token").distinct(), "token")), "token")
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
