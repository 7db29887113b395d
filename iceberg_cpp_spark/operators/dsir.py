"""DSIR — Data Selection via Importance Resampling (hashed n-grams).

Public basis: Xie et al., "Data Selection for Language Models via
Importance Resampling" (NeurIPS 2023). Raw web documents are scored by
how much more likely their hashed n-gram features are under a TARGET
distribution (a small high-quality corpus) than under the RAW corpus
distribution, then resampled by importance weight with Gumbel top-k.
The reference engine (C++, /root/reference/src/iceberg) has no
LLM-pipeline surface — this extends the training-data toolkit.

Everything is engine-portable by construction: features hash through
md5 (identical on Spark / DuckDB / Python — same trick as
``sampling.hash_unit``), the Gumbel noise derives from md5 as well
(deterministic, seedable by salt, reproducible across engines and
repartitionings), and the only float math is two logs over integer
counts plus one sum.

Scale shape (100 TB): the feature space is a FIXED number of hash
buckets (default 2^13), so both count tables and the per-bucket
log-ratio table are bucket-sized — always broadcastable, never
corpus-sized. Scoring is one explode + one broadcast join + one
groupBy(doc): a single shuffle on the document key. Resampling is a
global top-k (``ORDER BY ... LIMIT k``), which Spark executes as
per-partition top-k + driver merge of k rows — no full sort.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators.text import words

__all__ = ["hashed_ngram_features", "dsir_log_weights", "dsir_resample"]

_U32 = 4294967296.0  # 2^32; md5 prefix → uniform [0,1) denominator


def _bucket(col: Column, n_buckets: int) -> Column:
    """md5-derived hash bucket in [0, n_buckets) — first 8 hex chars of
    md5 as an integer, mod the bucket count. Non-negative by
    construction (32-bit value), portable to any engine with md5."""
    h = F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
    return h % F.lit(n_buckets)


def hashed_ngram_features(col: Column, n_buckets: int = 8192) -> Column:
    """Hashed unigram + bigram feature buckets of a text column, as
    ``array<long>`` with repeats (a document's feature COUNT vector is
    the multiset of its bucket ids). Bigrams join their words with a
    single space, so ``"a b"`` the bigram and ``"a b"`` typed literally
    collide — by design: hashing is already a collision device."""
    w = words(col)
    uni = F.transform(w, lambda x: _bucket(x, n_buckets))
    bi = F.when(F.size(w) >= 2, F.transform(
        F.slice(w, 1, F.size(w) - 1),
        lambda x, i: _bucket(
            F.concat(x, F.lit(" "), F.element_at(w, i + 2)), n_buckets),
    )).otherwise(F.array().cast("array<bigint>"))
    return F.concat(uni, bi)


def _bucket_counts(df: DataFrame, text_col: str, n_buckets: int,
                   out: str) -> DataFrame:
    return (df.select(F.explode(
                hashed_ngram_features(F.col(text_col), n_buckets))
                .alias("_b"))
            .groupBy("_b").agg(F.count("*").alias(out)))


def dsir_log_weights(raw: DataFrame, target: DataFrame,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_buckets: int = 8192) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``log_w(doc) = Σ_features [ ln p_target(b) − ln p_raw(b) ]`` with
    add-1 smoothed bucket probabilities ``p(b) = (c_b + 1)/(N + B)``.
    Documents whose features look more target-like than raw-like score
    positive. Returns ``(id_col, n_features, log_weight)`` with
    ``log_weight`` rounded to 6 decimals; documents with no tokens are
    absent (no features to score).

    Both count tables have at most ``n_buckets`` rows — broadcast
    unconditionally; the corpus-side cost is one explode + one shuffle
    on ``id_col``."""
    rawc = _bucket_counts(raw, text_col, n_buckets, "_cr")
    tgtc = _bucket_counts(target, text_col, n_buckets, "_ct")
    b = float(n_buckets)
    lam = (rawc.join(tgtc, "_b", "left")
           .crossJoin(F.broadcast(
               rawc.agg(F.sum("_cr").alias("_nr"))
               .crossJoin(tgtc.agg(F.sum("_ct").alias("_nt")))))
           .select(
               "_b",
               (F.log((F.coalesce("_ct", F.lit(0)).cast("double") + 1.0)
                      / (F.col("_nt").cast("double") + b))
                - F.log((F.col("_cr").cast("double") + 1.0)
                        / (F.col("_nr").cast("double") + b))).alias("_lam")))

    feats = raw.select(
        F.col(id_col),
        F.explode(hashed_ngram_features(F.col(text_col), n_buckets))
        .alias("_b"))
    return (feats.join(F.broadcast(lam), "_b")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_features"),
                 F.round(F.sum("_lam"), 6).alias("log_weight")))


def dsir_resample(raw: DataFrame, target: DataFrame, k: int,
                  text_col: str = "text", id_col: str = "doc_id",
                  n_buckets: int = 8192, salt: str = "dsir",
                  gumbel: bool = True,
                  weights: Optional[DataFrame] = None) -> DataFrame:
    """Select ``k`` documents from ``raw`` by importance weight.

    With ``gumbel=True`` (the paper's estimator) each document's score
    is ``log_weight + Gumbel(0,1)`` — a sample WITHOUT replacement from
    the softmax of the weights (Gumbel top-k trick). The noise is
    ``−ln(−ln u)`` with ``u = (md5_32(salt|doc_id) + 0.5) / 2^32``:
    deterministic, engine-portable, repartition-stable — rerunning or
    re-sharding the corpus selects the SAME k documents. ``gumbel=
    False`` degrades to plain top-k by weight (greedy, lower diversity).

    Returns ``(id_col, n_features, score)`` ordered by
    ``(score DESC, id_col)``; ``score`` is rounded to 6 decimals BEFORE
    ranking so the cut is reproducible across engines (ties broken on
    ``id_col``, same convention as bm25_topk / nb_predict)."""
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    w = weights if weights is not None else dsir_log_weights(
        raw, target, text_col=text_col, id_col=id_col, n_buckets=n_buckets)
    score = F.col("log_weight")
    if gumbel:
        u = ((F.conv(F.substring(
                F.md5(F.concat(F.lit(salt + "|"),
                               F.col(id_col).cast("string"))), 1, 8),
                16, 10).cast("long").cast("double") + F.lit(0.5))
             / F.lit(_U32))
        score = score + -F.log(-F.log(u))
    return (w.select(id_col, "n_features",
                     F.round(score, 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
