"""Trained document classification — multinomial Naive Bayes over
token counts, train AND apply as pure DataFrame plans (no MLlib, no
UDFs, no driver-side math). The trained-classifier step of an
LLM-data pipeline (quality / source / language routing) that the
heuristic scores in `operators/text.py` feed but cannot replace:
here the decision function is LEARNED from a labeled split instead
of hand-set thresholds.

Why Naive Bayes and not MLlib LogisticRegression: the posterior is a
closed-form function of exact integer corpus counts, so training is
two hash aggregations (token×label counts, label totals) and the
whole model stays a DataFrame — reproducible bit-for-bit across
engines (the correctness oracle re-derives it in ANSI SQL), trivially
re-trainable incrementally (counts add), and free of iterative solver
nondeterminism. At 100 TB the training scan is one map-side-combined
aggregation over the corpus; the model (vocab × labels) is megabytes
and BROADCASTS at apply time, so scoring is shuffle-free per token
and one (doc, label) aggregation overall.

Scores are log-space: score(d, l) = log P(l) + Σ_t tf(t, d) ·
log((c(t, l) + 1) / (N_l + V)) with Laplace smoothing (V = vocab
size, N_l = token count of class l). Unseen-token handling falls out
of the algebra: Σ over ALL doc tokens of -log(N_l + V) plus
Σ over MATCHED (token, label) pairs of log(c + 1).

Scale shape: train = 2 aggregations (the inherent shuffles) + 1
distinct for V; apply = 1 per-doc tf aggregation, a broadcast join
against the model, 1 (doc, label) aggregation, and an argmax window
partitioned by doc. Nothing driver-side; no cartesian (the per-label
fanout is |labels|, a constant). Scores are rounded (1e-6) before the
argmax so last-ulp libm differences between engines can't flip a
prediction; ties break on label order, deterministically.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SCORE_DECIMALS = 6


def _tokens(col: Column) -> Column:
    """Lower-cased alphanumeric tokens; empties filtered (leading
    delimiter yields an empty split head). Same regex class both
    engines support without lookaround."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"),
                    lambda t: F.length(t) > 0)


@dataclass(frozen=True)
class NaiveBayesModel:
    """Trained model as two lazy DataFrames (nothing is collected):

    - ``token_counts``: (label, token, cnt) — Laplace numerator parts.
    - ``class_stats``: (label, log_prior, n_class_tokens, vocab_size)
      — one row per label; ``vocab_size`` is replicated onto every row
      so apply never needs a scalar action.
    """
    token_counts: DataFrame
    class_stats: DataFrame


def train_nb(df: DataFrame, text_col: str = "text",
             label_col: str = "label") -> NaiveBayesModel:
    """Fit multinomial NB from a labeled DataFrame. Two aggregations
    over the exploded token stream; the label-priors aggregation runs
    over the (cheap) un-exploded rows."""
    toks = df.select(F.col(label_col).alias("label"),
                     F.explode(_tokens(F.col(text_col))).alias("token"))
    token_counts = toks.groupBy("label", "token").agg(
        F.count("*").alias("cnt"))
    class_tokens = toks.groupBy("label").agg(
        F.count("*").alias("n_class_tokens"))
    doc_counts = (df.groupBy(F.col(label_col).alias("label"))
                  .agg(F.count("*").alias("n_docs")))
    # priors need the corpus total; vocab size is shared by all labels.
    # Both are 1-row aggregates — cross-joined, not collected, so the
    # model builds in one lazy plan (Spark broadcasts 1-row sides).
    total = df.agg(F.count("*").alias("n_total"))
    vocab = token_counts.select("token").distinct().agg(
        F.count("*").alias("vocab_size"))
    class_stats = (doc_counts
                   .join(class_tokens, "label", "left")
                   .na.fill({"n_class_tokens": 0})
                   .crossJoin(F.broadcast(total))
                   .crossJoin(F.broadcast(vocab))
                   .select(
                       "label",
                       (F.log(F.col("n_docs").cast("double"))
                        - F.log(F.col("n_total").cast("double"))
                        ).alias("log_prior"),
                       "n_class_tokens", "vocab_size"))
    return NaiveBayesModel(token_counts=token_counts,
                           class_stats=class_stats)


def nb_scores(model: NaiveBayesModel, df: DataFrame,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Per-(doc, label) log-posterior scores, rounded to
    ``SCORE_DECIMALS``. Every input doc gets |labels| rows — zero-token
    docs score on priors alone."""
    tf = (df.select(F.col(id_col),
                    F.explode(_tokens(F.col(text_col))).alias("token"))
          .groupBy(id_col, "token").agg(F.count("*").alias("tf")))
    doc_stats = tf.groupBy(id_col).agg(F.sum("tf").alias("n_doc_tokens"))
    matched = (tf.join(F.broadcast(model.token_counts), "token")
               .groupBy(id_col, "label")
               .agg(F.sum(F.col("tf")
                          * F.log(F.col("cnt").cast("double") + 1.0))
                    .alias("matched_loglik")))
    scores = (df.select(id_col)
              .crossJoin(F.broadcast(model.class_stats))
              .join(doc_stats, id_col, "left")
              .na.fill({"n_doc_tokens": 0})
              .join(matched, [id_col, "label"], "left")
              .na.fill({"matched_loglik": 0.0}))
    denom = F.log(F.col("n_class_tokens").cast("double")
                  + F.col("vocab_size").cast("double"))
    return scores.select(
        F.col(id_col), F.col("label"),
        F.round(F.col("log_prior") + F.col("matched_loglik")
                - F.col("n_doc_tokens") * denom,
                SCORE_DECIMALS).alias("score"))


def nb_predict(model: NaiveBayesModel, df: DataFrame,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Argmax over ``nb_scores`` → (id_col, pred_label, score). Ties
    on the rounded score break toward the lexically-smallest label."""
    s = nb_scores(model, df, text_col=text_col, id_col=id_col)
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("label").asc())
    return (s.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(F.col(id_col), F.col("label").alias("pred_label"),
                    "score"))
