"""N-gram language-model scoring — CCNet-style perplexity filtering.

A small LM's cross-entropy over a document is one of the strongest
public quality signals for web-scale training corpora (Wenzek et al.,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data", 2019): documents the model finds surprising are boilerplate,
gibberish, or out-of-domain. The reference engine (C++,
/root/reference/src/iceberg) has no LLM-pipeline surface — this module
extends the training-data toolkit alongside operators/text.py's
unigram familiarity features.

The model here is an add-k-smoothed bigram LM:

    p(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * (V + 1))

with ``V`` the unigram vocabulary size of the LM source (the ``+ 1``
reserves one slot of smoothing mass for OOV continuations). Training is
two Spark aggregations (bigram counts, unigram counts) — pure map-side
combine, no driver state; scoring is two broadcast-gated joins over the
exploded document bigrams. Everything upstream of the final ``ln`` is
integer counting, so the cross-engine float surface is one log and one
mean, rounded by the caller's policy.

Scale shape (100 TB): the count tables are vocabulary-sized, not
corpus-sized; they broadcast only while bounded (same gate pattern as
``text.token_frequency_stats`` / the eq-delete broadcast in table.py)
and otherwise fall back to AQE-planned shuffled hash joins on the token
keys. Nothing row-scale ever reaches the driver.
"""
from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators.text import words

__all__ = ["bigram_pairs", "bigram_cross_entropy"]


def bigram_pairs(col: Column) -> Column:
    """Adjacent word pairs of ``col`` as ``array<struct<w1,w2>>``
    (empty when the text has fewer than two tokens). Tokenization is
    ``text.words`` — lowercase, whitespace split — so counts line up
    with every other text operator (and with the DuckDB oracles)."""
    w = words(col)
    return F.when(F.size(w) >= 2, F.transform(
        F.slice(w, 1, F.size(w) - 1),
        lambda x, i: F.struct(x.alias("w1"),
                              F.element_at(w, i + 2).alias("w2")),
    )).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))


def _gated(df: DataFrame, max_rows: Optional[int]) -> DataFrame:
    """Materialize ``df`` once and broadcast-hint it only while its row
    count stays under ``max_rows`` (None disables the gate AND the
    materialization — fully lazy, AQE picks the join)."""
    if max_rows is None:
        return df
    df = df.localCheckpoint(eager=True)
    return F.broadcast(df) if df.count() <= max_rows else df


def bigram_cross_entropy(df: DataFrame,
                         lm_source: Optional[DataFrame] = None,
                         k: float = 0.5,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         broadcast_max_rows: Optional[int] = 2_000_000,
                         ) -> DataFrame:
    """Per-document bigram-LM cross-entropy (nats/bigram), CCNet-style.

    Trains the add-``k`` bigram model on ``lm_source`` (default: ``df``
    itself — self-scoring, the usual first pass before a clean-corpus
    LM exists) and scores every document of ``df`` that has at least
    two tokens. Returns ``(id_col, n_bigrams, cross_entropy)`` with
    ``cross_entropy = round(-mean ln p(w2|w1), 6)``; perplexity is
    ``exp(cross_entropy)`` for callers that want it.

    OOV policy: a bigram whose CONTEXT word is outside the LM vocab
    scores ``ln(k / (0 + k*(V+1))) = -ln(V+1)`` — the uniform floor;
    an unseen continuation after a known context gets the add-k mass.
    Both fall out of ``coalesce(count, 0)``, no special-casing.

    Two corpus passes when self-scoring (count + score); the count
    tables are materialized once behind the broadcast gate so neither
    join recomputes them. When ``broadcast_max_rows`` is set (default)
    this function RUNS Spark jobs eagerly to size the tables — pass
    None for a fully lazy plan (AQE-planned joins, no hint)."""
    if k <= 0:
        raise ValueError(f"smoothing k must be positive: {k}")
    src = lm_source if lm_source is not None else df

    src_big = src.select(F.explode(bigram_pairs(F.col(text_col))).alias("_bg"))
    bc = (src_big.select(F.col("_bg.w1").alias("w1"),
                         F.col("_bg.w2").alias("w2"))
          .groupBy("w1", "w2").agg(F.count("*").alias("_c2")))
    uc = (src.select(F.explode(words(F.col(text_col))).alias("_w"))
          .groupBy("_w").agg(F.count("*").alias("_c1")))

    # vocab size feeds the smoothing denominator — one scalar. Under
    # the gate, reuse the materialized unigram table for the count;
    # lazily, let Spark compute it as a scalar subquery-free cross join.
    if broadcast_max_rows is not None:
        uc = uc.localCheckpoint(eager=True)
        vocab = uc.count()
        if vocab <= broadcast_max_rows:
            uc = F.broadcast(uc)
        v_df = None
        bc = _gated(bc, broadcast_max_rows)
    else:
        v_df = uc.agg(F.count("*").alias("_nv"))
        vocab = None

    doc_big = df.select(
        F.col(id_col),
        F.explode(bigram_pairs(F.col(text_col))).alias("_bg"),
    ).select(id_col, F.col("_bg.w1").alias("w1"), F.col("_bg.w2").alias("w2"))

    scored = (doc_big
              .join(bc, ["w1", "w2"], "left")
              .join(uc, doc_big["w1"] == uc["_w"], "left"))
    if v_df is not None:
        scored = scored.crossJoin(F.broadcast(v_df))
        nv = F.col("_nv").cast("double")
    else:
        nv = F.lit(float(vocab))
    logp = F.log(
        (F.coalesce(F.col("_c2"), F.lit(0)).cast("double") + F.lit(k))
        / (F.coalesce(F.col("_c1"), F.lit(0)).cast("double")
           + F.lit(k) * (nv + F.lit(1.0))))
    return (scored.groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_bigrams"),
                 F.round(-F.avg(logp), 6).alias("cross_entropy")))
