"""Bigram-LM perplexity scoring and DSIR importance resampling.

Every numeric check runs against an INDEPENDENT plain-Python
re-derivation (dicts + hashlib + math, no shared code with the
operators), following the BM25/NaiveBayes test pattern.
"""
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators import dsir, lm


def _words(s):
    s = s.strip().lower()
    return s.split() if s else []


# ---------------------------------------------------------------------------
# bigram LM


def _lm_reference(score_docs, lm_docs, k=0.5):
    """Independent add-k bigram LM: train on lm_docs, score score_docs.
    Returns {doc_id: (n_bigrams, cross_entropy_rounded_6)}."""
    uni, big = {}, {}
    for _, txt in lm_docs:
        ws = _words(txt)
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for did, txt in score_docs:
        ws = _words(txt)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        lps = [math.log((big.get(p, 0) + k)
                        / (uni.get(p[0], 0) + k * (v + 1))) for p in pairs]
        out[did] = (len(pairs), round(-sum(lps) / len(lps), 6))
    return out


class TestBigramLM:
    CORPUS = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "dogs ran fast"),
        (4, "solo"),          # 1 token -> no bigrams, absent from output
        (5, ""),              # empty -> absent
        (6, "the the the"),   # repeated-token degenerate case
    ]

    def test_self_scored_matches_reference(self, spark):
        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
               for r in lm.bigram_cross_entropy(df).collect()}
        exp = _lm_reference(self.CORPUS, self.CORPUS)
        assert set(got) == set(exp) == {1, 2, 3, 6}
        for did in exp:
            assert got[did][0] == exp[did][0]
            assert got[did][1] == pytest.approx(exp[did][1], abs=2e-6)

    def test_oov_scores_uniform_floor(self, spark):
        """A doc whose words are all outside the LM vocab scores
        -ln(k/(k*(V+1))) = ln(V+1) per bigram — the uniform floor."""
        train = spark.createDataFrame(self.CORPUS[:3],
                                      "doc_id long, text string")
        test = spark.createDataFrame([(9, "zz qq zz")],
                                     "doc_id long, text string")
        row = lm.bigram_cross_entropy(test, lm_source=train).collect()[0]
        v = len({w for _, t in self.CORPUS[:3] for w in _words(t)})
        assert row["n_bigrams"] == 2
        assert row["cross_entropy"] == pytest.approx(
            math.log(v + 1), abs=2e-6)

    def test_lazy_equals_gated(self, spark):
        df = spark.createDataFrame(self.CORPUS, "doc_id long, text string")
        gated = {r["doc_id"]: r["cross_entropy"]
                 for r in lm.bigram_cross_entropy(df).collect()}
        lazy = {r["doc_id"]: r["cross_entropy"]
                for r in lm.bigram_cross_entropy(
                    df, broadcast_max_rows=None).collect()}
        assert gated == lazy

    def test_k_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="k must be positive"):
            lm.bigram_cross_entropy(df, k=0.0)

    def test_randomized_against_reference(self, spark):
        rng = random.Random(20260815)
        vocab = [f"w{i}" for i in range(25)]
        corpus = [(d, " ".join(vocab[min(int(rng.expovariate(0.25)), 24)]
                               for _ in range(rng.randint(0, 30))))
                  for d in range(60)]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
               for r in lm.bigram_cross_entropy(df).collect()}
        exp = _lm_reference(corpus, corpus)
        assert set(got) == set(exp)
        for did in exp:
            assert got[did][0] == exp[did][0]
            assert got[did][1] == pytest.approx(exp[did][1], abs=2e-6)


# ---------------------------------------------------------------------------
# DSIR


def _bucket(s, n_buckets):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n_buckets


def _feats(txt, n_buckets):
    ws = _words(txt)
    return ([_bucket(w, n_buckets) for w in ws]
            + [_bucket(f"{a} {b}", n_buckets) for a, b in zip(ws, ws[1:])])


def _dsir_reference(raw, target, n_buckets):
    """Independent DSIR log-weights: {doc_id: (n_features, log_w_r6)}."""
    rawc, tgtc = {}, {}
    for _, txt in raw:
        for b in _feats(txt, n_buckets):
            rawc[b] = rawc.get(b, 0) + 1
    for _, txt in target:
        for b in _feats(txt, n_buckets):
            tgtc[b] = tgtc.get(b, 0) + 1
    nr, nt = sum(rawc.values()), sum(tgtc.values())
    lam = {b: math.log((tgtc.get(b, 0) + 1.0) / (nt + n_buckets))
           - math.log((c + 1.0) / (nr + n_buckets))
           for b, c in rawc.items()}
    out = {}
    for did, txt in raw:
        fs = _feats(txt, n_buckets)
        if fs:
            out[did] = (len(fs), round(sum(lam[b] for b in fs), 6))
    return out


def _gumbel(did, salt="dsir"):
    h = int(hashlib.md5(f"{salt}|{did}".encode()).hexdigest()[:8], 16)
    return -math.log(-math.log((h + 0.5) / 4294967296.0))


class TestDSIR:
    RAW = [
        (1, "spark shuffles data across the cluster"),
        (2, "the cluster scales spark jobs"),
        (3, "quantum cats purr loudly"),
        (4, "cats and dogs and cats"),
        (5, "data pipelines clean web text for training"),
        (6, ""),  # no features -> absent
    ]
    TARGET = [(101, "spark data pipelines for training"),
              (102, "clean web text data")]

    def test_weights_match_reference(self, spark):
        raw = spark.createDataFrame(self.RAW, "doc_id long, text string")
        tgt = spark.createDataFrame(self.TARGET, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_features"], r["log_weight"])
               for r in dsir.dsir_log_weights(raw, tgt,
                                              n_buckets=256).collect()}
        exp = _dsir_reference(self.RAW, self.TARGET, 256)
        assert set(got) == set(exp) == {1, 2, 3, 4, 5}
        for did in exp:
            assert got[did][0] == exp[did][0]
            assert got[did][1] == pytest.approx(exp[did][1], abs=2e-6)

    def test_target_like_docs_rank_higher(self, spark):
        """Docs sharing vocabulary with the target outweigh docs that
        don't — the point of the operator."""
        raw = spark.createDataFrame(self.RAW, "doc_id long, text string")
        tgt = spark.createDataFrame(self.TARGET, "doc_id long, text string")
        w = {r["doc_id"]: r["log_weight"]
             for r in dsir.dsir_log_weights(raw, tgt,
                                            n_buckets=256).collect()}
        assert w[5] > w[3]  # training-data doc beats quantum cats
        assert w[1] > w[4]

    def test_resample_matches_reference_and_is_stable(self, spark):
        raw = spark.createDataFrame(self.RAW, "doc_id long, text string")
        tgt = spark.createDataFrame(self.TARGET, "doc_id long, text string")
        exp_w = _dsir_reference(self.RAW, self.TARGET, 256)
        exp = sorted(((round(w + _gumbel(d), 6), d)
                      for d, (_, w) in exp_w.items()),
                     key=lambda p: (-p[0], p[1]))[:3]
        for attempt in range(2):  # determinism across reruns
            got = [(r["score"], r["doc_id"]) for r in
                   dsir.dsir_resample(raw.repartition(4 if attempt else 2),
                                      tgt, 3, n_buckets=256).collect()]
            assert [d for _, d in got] == [d for _, d in exp]
            for (s_got, _), (s_exp, _) in zip(got, exp):
                assert s_got == pytest.approx(s_exp, abs=2e-6)

    def test_plain_topk_without_gumbel(self, spark):
        raw = spark.createDataFrame(self.RAW, "doc_id long, text string")
        tgt = spark.createDataFrame(self.TARGET, "doc_id long, text string")
        exp_w = _dsir_reference(self.RAW, self.TARGET, 256)
        exp_ids = [d for d, _ in sorted(
            exp_w.items(), key=lambda p: (-p[1][1], p[0]))][:2]
        got = dsir.dsir_resample(raw, tgt, 2, n_buckets=256,
                                 gumbel=False).collect()
        assert [r["doc_id"] for r in got] == exp_ids

    def test_k_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="k must be positive"):
            dsir.dsir_resample(df, df, 0)

    def test_randomized_weights_against_reference(self, spark):
        rng = random.Random(42)
        vocab = [f"t{i}" for i in range(40)]
        raw = [(d, " ".join(rng.choice(vocab)
                            for _ in range(rng.randint(0, 20))))
               for d in range(50)]
        target = [(1000 + d, " ".join(rng.choice(vocab[:12])
                                      for _ in range(rng.randint(1, 15))))
                  for d in range(10)]
        rdf = spark.createDataFrame(raw, "doc_id long, text string")
        tdf = spark.createDataFrame(target, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_features"], r["log_weight"])
               for r in dsir.dsir_log_weights(rdf, tdf,
                                              n_buckets=64).collect()}
        exp = _dsir_reference(raw, target, 64)
        assert set(got) == set(exp)
        for did in exp:
            assert got[did][0] == exp[did][0]
            assert got[did][1] == pytest.approx(exp[did][1], abs=2e-6)
