"""Byte-pair encoding: train a merge table on a corpus sample, apply it
distributed — real subword token counts for budget/packing decisions,
replacing the whitespace+length heuristic where exactness matters.

Split of labor (the standard one): the merge LOOP is inherently
sequential — every merge changes the pair counts that choose the next —
so training runs driver-side over a deterministic uniform sample
(crc32-ordered, the same scheme as IVF/PQ codebooks; tokenizers are
trained on samples in practice). APPLICATION is embarrassingly parallel:
the merge table broadcasts with the UDF closure and each document
encodes independently in Arrow-batched pandas workers.

Algorithm (the classic Sennrich et al. 2016 word-internal BPE):
words are char sequences with a trailing end-of-word marker; each
training step merges the most frequent adjacent symbol pair (ties break
lexicographically, so training is fully deterministic); encoding
replays merges greedily by rank, exactly GPT-2's encoder loop.
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

EOW = "</w>"


def _word_freqs(texts) -> dict:
    out: dict = {}
    for t in texts:
        for w in (t or "").lower().split():
            out[w] = out.get(w, 0) + 1
    return out


def train_bpe(corpus: DataFrame, num_merges: int = 200,
              text_col: str = "text", sample_rows: int = 10_000,
              id_col: Optional[str] = None) -> list:
    """Learn ``num_merges`` merge rules from a deterministic uniform
    sample of the corpus. Returns [(left, right), ...] in merge order.
    Stops early when no pair occurs at least twice."""
    key_str = (F.col(id_col) if id_col is not None
               else F.col(text_col)).cast("string")
    sample = (corpus.select(F.col(text_col), F.crc32(key_str.cast("binary"))
                            .alias("_sk"), key_str.alias("_kt"))
              .orderBy("_sk", "_kt").limit(sample_rows).toPandas())
    freqs = _word_freqs(sample[text_col].tolist())
    vocab = {w: tuple(w) + (EOW,) for w in freqs}
    merges: list = []
    for _ in range(num_merges):
        pair_counts: dict = {}
        for w, syms in vocab.items():
            f = freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + f
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographically smallest
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Greedy rank-replay (GPT-2's encoder loop): repeatedly merge the
    lowest-rank adjacent pair until none is mergeable."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


_CACHE_CAP = 1_000_000  # distinct words per worker before reset


def bpe_token_count_udf(merges: list):
    """Arrow-batched per-document BPE token count; the merge table rides
    in the closure (broadcast once per executor). Per-worker word cache:
    natural language repeats words, so amortized cost per token is far
    below one full encode. The cache resets at ``_CACHE_CAP`` entries so
    a heavy unique-token tail (URLs, ids) cannot grow a long-lived
    worker without bound."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    cache: dict = {}

    @pandas_udf(T.LongType())
    def count_tokens(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            n = 0
            for w in (t or "").lower().split():
                hit = cache.get(w)
                if hit is None:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    hit = len(encode_word(w, ranks))
                    cache[w] = hit
                n += hit
            out.append(n)
        return pd.Series(out, dtype="int64")

    return count_tokens


def bpe_token_count(merges: list, text_col: str = "text") -> Column:
    """Column of per-document BPE token counts for ``text_col`` —
    attachable to any DataFrame having that column."""
    return bpe_token_count_udf(merges)(F.col(text_col))
