"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's scope (iceberg-cpp is a table-format SDK), these
are the data-pipeline operators a 100 TB corpus needs. Every design is
BUCKETED — candidate generation is always a hash/band bucket join, never
an all-pairs cross join, so the shuffle volume is O(n·bands), not O(n²).

- exact_dedup:        sha2 content key → groupBy → keep min id (one shuffle)
- minhash_lsh_dedup:  shingles → k minhash perms (vectorized numpy in a
                      pandas UDF) → b bands → explode → band-bucket join →
                      keep docs that never share a bucket with a smaller id
- simhash_dedup:      64-bit simhash → 4×16-bit bands → same bucket scheme
                      (catches hamming-distance ≤ small dups)
- ngram_jaccard_verify: exact n-gram Jaccard on candidate PAIRS only
- embedding_dedup:    random-hyperplane LSH buckets over array<float> →
                      within-bucket cosine ≥ threshold → drop larger id

All deterministic (fixed seeds, min-id representatives) so results are
stable across runs and cluster sizes.
"""

from __future__ import annotations

import functools
import zlib
from typing import Iterable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from iceberg_cpp_spark.operators.partitioning import spread_to_parallelism

_MERSENNE = (1 << 61) - 1
_SEED = 42


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def content_key(col: Column, normalize: bool = True) -> Column:
    """Stable 256-bit content key. With normalize, case/whitespace
    differences don't defeat dedup."""
    c = col
    if normalize:
        c = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.sha2(c, 256)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True) -> DataFrame:
    """Keep one row (min id) per distinct content. Single hash-partition
    shuffle on the 256-bit key; partial aggregation map-side."""
    key = content_key(F.col(text_col), normalize).alias("_ck")
    winners = (
        df.select(key, F.col(id_col))
        .groupBy("_ck")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(winners, on=id_col, how="leftsemi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _perm_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    rs = np.random.RandomState(_SEED)
    a = rs.randint(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rs.randint(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, width: int) -> np.ndarray:
    """Word-level shingles → stable 32-bit hashes (crc32: fast, seedless,
    identical on every worker — python's hash() is salted per process)."""
    words = text.split()
    if len(words) < width:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + width]) for i in range(len(words) - width + 1)]
    return np.unique(np.array(
        [zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.int64))


def _axb_mod_p(a: np.ndarray, b: np.ndarray, x: np.ndarray) -> np.ndarray:
    """EXACT (a ⊗ x + b) mod p as a (len(a), len(x)) uint64 matrix.

    p = 2^61-1 is Mersenne, a,b < p, x < 2^32. A plain int64 product
    a*x reaches 2^93 and silently wraps mod 2^64 (the r4 spec bug the
    golden-vector anchors caught) — so split a = a_hi·2^32 + a_lo and
    reduce with 2^61 ≡ 1 (mod p); every intermediate fits uint64."""
    P = np.uint64(_MERSENNE)
    a = a.astype(np.uint64)
    x = x.astype(np.uint64)
    a_hi = a >> np.uint64(32)                      # < 2^29
    a_lo = a & np.uint64(0xFFFFFFFF)
    hi = a_hi[:, None] * x[None, :]                # < 2^61
    lo = a_lo[:, None] * x[None, :]                # < 2^64
    # hi·2^32 ≡ (hi >> 29) + ((hi mod 2^29) << 32)  (mod p)
    hi = (hi >> np.uint64(29)) + ((hi & np.uint64((1 << 29) - 1))
                                  << np.uint64(32))

    def red(t):
        t = (t & P) + (t >> np.uint64(61))
        return (t & P) + (t >> np.uint64(61))

    m = red(red(hi) + red(lo) + b.astype(np.uint64)[:, None])
    return np.where(m == P, np.uint64(0), m)


def minhash_signature_udf(num_perm: int = 128, shingle_width: int = 3):
    """array<long> minhash signature as a vectorized pandas UDF."""
    a, b = _perm_params(num_perm)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            x = _shingle_hashes(t, shingle_width)
            # exact (a ⊗ x + b) mod p, min over shingles
            m = _axb_mod_p(a, b, x).min(axis=1).astype(np.int64)
            out.append(m.tolist())
        return pd.Series(out)

    return sig


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 128, bands: int = 32,
                      shingle_width: int = 3,
                      verify_jaccard: Optional[float] = None,
                      materialize: str = "checkpoint") -> DataFrame:
    """Fuzzy dedup. b bands × r rows (r = num_perm//bands): docs agreeing
    on all r minhashes of any band land in the same bucket. A doc is a
    duplicate iff some bucket contains a smaller id. The only shuffle is
    the band-bucket groupBy (exploded rows: n·bands) — 100 TB-viable;
    there is no pairwise comparison.

    With ``verify_jaccard`` set, LSH only *nominates* candidate pairs;
    each is then verified with exact n-gram Jaccard and dropped only
    when similarity ≥ the threshold (the canonical band→verify
    pipeline: verification cost is O(candidates), not O(n²)).

    ``materialize`` picks the signature-reuse strategy (the signature
    UDF is the expensive step and the plan reads it from two branches):

    - ``"checkpoint"`` (default): eager ``localCheckpoint`` — lineage
      truncated, blocks stay pinned for the SESSION (no unpersist hook
      exists once lineage is cut). Cheapest failure mode at 100 TB, but
      a slow leak on a shared long-lived session.
    - ``"persist"``: ``persist()`` + count to materialize. The blocks
      are freeable: the returned DataFrame carries a
      ``release_signatures()`` callable — invoke it AFTER consuming the
      result to unpersist (materializing the result after release
      re-runs the UDF; that is the trade for reclaimable storage).
    """
    assert num_perm % bands == 0, "num_perm must divide evenly into bands"
    if materialize not in ("checkpoint", "persist"):
        raise ValueError(f"materialize must be 'checkpoint' or 'persist',"
                         f" got {materialize!r}")
    r = num_perm // bands
    sig = minhash_signature_udf(num_perm, shingle_width)
    src = df.select(F.col(id_col), F.col(text_col))
    # the signature UDF is the expensive step: a small/single-file input
    # arrives as ONE partition and would run it single-threaded — spread
    # it across the cluster first (results are per-row, so the shuffle
    # is semantics-free; at real scale inputs are already partitioned)
    src = spread_to_parallelism(src)
    with_sig = src.select(F.col(id_col), sig(F.col(text_col)).alias("_sig"))
    release = None
    if materialize == "checkpoint":
        with_sig = with_sig.localCheckpoint(eager=True)
    else:
        with_sig = with_sig.persist()
        with_sig.count()  # materialize now: both branches read the cache
        release = functools.partial(with_sig.unpersist, blocking=True)
    band_hashes = F.array(*[
        F.xxhash64(F.concat_ws(",", F.slice("_sig", i * r + 1, r).cast("array<string>")))
        for i in range(bands)
    ])
    banded = with_sig.select(id_col, F.posexplode(band_hashes).alias("_band", "_bucket"))
    # groupBy-min + join-back instead of a window-min: min() partial-
    # aggregates MAP-SIDE, so a degenerate corpus (one giant bucket of
    # near-identical docs) no longer lands a whole bucket on one task.
    # Only collision buckets (>1 member) survive to the join; AQE turns
    # the join broadcast when that table is small and splits skewed
    # buckets when it isn't. The signature UDF still runs once per doc.
    mins = (banded.groupBy("_band", "_bucket")
            .agg(F.min(id_col).alias("_rep"), F.count("*").alias("_n"))
            .filter(F.col("_n") > 1).drop("_n"))
    candidates = (banded.join(mins, ["_band", "_bucket"])
                  .filter(F.col(id_col) > F.col("_rep")))
    if verify_jaccard is None:
        dup_ids = candidates.select(id_col).distinct()
    else:
        pairs = candidates.select(F.col("_rep").alias("id_a"),
                                  F.col(id_col).alias("id_b")).distinct()
        verified = ngram_jaccard_pairs(df, pairs, text_col=text_col,
                                       id_col=id_col, n=shingle_width)
        dup_ids = (verified.filter(F.col("jaccard") >= verify_jaccard)
                   .select(F.col("id_b").alias(id_col)).distinct())
    out = df.join(dup_ids, on=id_col, how="left_anti")
    if release is not None:
        # caller-invoked storage reclamation for materialize="persist"
        out.release_signatures = release
    return out


def _minhash_banded(df: DataFrame, text_col: str, id_col: str,
                    num_perm: int, bands: int,
                    shingle_width: int) -> DataFrame:
    """(id, _band, _bucket) exploded LSH band rows, signature job
    materialized once (the shared front half of batch and incremental
    minhash dedup)."""
    assert num_perm % bands == 0, "num_perm must divide evenly into bands"
    r = num_perm // bands
    sig = minhash_signature_udf(num_perm, shingle_width)
    src = df.select(F.col(id_col), F.col(text_col))
    src = spread_to_parallelism(src)
    with_sig = (src.select(F.col(id_col), sig(F.col(text_col)).alias("_sig"))
                .localCheckpoint(eager=True))
    band_hashes = F.array(*[
        F.xxhash64(F.concat_ws(
            ",", F.slice("_sig", i * r + 1, r).cast("array<string>")))
        for i in range(bands)
    ])
    return with_sig.select(
        id_col, F.posexplode(band_hashes).alias("_band", "_bucket"))


STORE_SCHEMA = "band int, bucket long, doc_id long"


def minhash_build_store(spark, location: str, docs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 128, bands: int = 32,
                        shingle_width: int = 3):
    """Seed an INCREMENTAL dedup store: batch-dedup the seed corpus,
    then persist the survivors' (band, bucket, min doc id) rows as an
    IceTable — the state a growing-corpus pipeline carries between
    ingestion batches. Returns (survivors_df, store_table)."""
    from iceberg_cpp_spark.core.types import schema_from_spark
    from iceberg_cpp_spark.table import IceTable

    survivors = minhash_lsh_dedup(docs, text_col=text_col, id_col=id_col,
                                  num_perm=num_perm, bands=bands,
                                  shingle_width=shingle_width)
    banded = _minhash_banded(survivors, text_col, id_col,
                             num_perm, bands, shingle_width)
    rows = (banded.groupBy("_band", "_bucket")
            .agg(F.min(id_col).alias("doc_id"))
            .select(F.col("_band").cast("int").alias("band"),
                    F.col("_bucket").alias("bucket"), "doc_id"))
    store = IceTable.create(
        spark, location,
        schema_from_spark(spark.createDataFrame([], STORE_SCHEMA).schema))
    store = store.append(rows)
    return survivors, store


def minhash_incremental_dedup(store, new_docs: DataFrame,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              num_perm: int = 128, bands: int = 32,
                              shingle_width: int = 3):
    """Incremental corpus dedup against a persisted LSH bucket store
    (the production shape for a GROWING corpus: the existing corpus is
    never re-hashed). A new doc is dropped when any of its band buckets
    already exists in the store (matches an earlier survivor) or
    contains a smaller id within the batch (the same bucket-min rule as
    ``minhash_lsh_dedup``). Surviving docs' buckets are then published
    to the store with an insert-only MERGE INTO (one snapshot per
    batch; exactly the engine's own upsert machinery), so consecutive
    batches — or a replay of the same batch — dedup against everything
    already accepted.

    Per-batch cost: signature work O(new docs) + one join against the
    store's bucket table (broadcast when small, shuffled when not) +
    the MERGE's anti-join. Returns (survivors_df, updated_store).

    Streaming callers that commit survivors to ANOTHER table must
    sequence the two writes themselves via
    ``minhash_incremental_candidates`` + ``minhash_publish_buckets``:
    publishing the buckets BEFORE the survivor commit would make a
    replayed batch see its own buckets and drop every row (see
    ``streaming/incremental.py dedup_ingest_stream``)."""
    survivors, new_rows = minhash_incremental_candidates(
        store, new_docs, text_col=text_col, id_col=id_col,
        num_perm=num_perm, bands=bands, shingle_width=shingle_width)
    store = minhash_publish_buckets(store, new_rows)
    return survivors, store


def minhash_incremental_candidates(store, new_docs: DataFrame,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   num_perm: int = 128, bands: int = 32,
                                   shingle_width: int = 3):
    """Dedup decision WITHOUT the store write: returns (survivors_df,
    new_bucket_rows) where new_bucket_rows is the (band, bucket, doc_id)
    set the caller later publishes via ``minhash_publish_buckets``."""
    banded = _minhash_banded(new_docs, text_col, id_col,
                             num_perm, bands, shingle_width)
    store_keys = (store.to_df()
                  .select(F.col("band").alias("_band"),
                          F.col("bucket").alias("_bucket")))
    hit_store = (banded.join(store_keys, ["_band", "_bucket"], "left_semi")
                 .select(id_col))
    mins = (banded.groupBy("_band", "_bucket")
            .agg(F.min(id_col).alias("_rep"), F.count("*").alias("_n"))
            .filter(F.col("_n") > 1).drop("_n"))
    within = (banded.join(mins, ["_band", "_bucket"])
              .filter(F.col(id_col) > F.col("_rep")).select(id_col))
    dup_ids = hit_store.unionByName(within).distinct()
    survivors = new_docs.join(dup_ids, on=id_col, how="left_anti")
    new_rows = (banded.join(dup_ids, on=id_col, how="left_anti")
                .groupBy("_band", "_bucket")
                .agg(F.min(id_col).alias("doc_id"))
                .select(F.col("_band").cast("int").alias("band"),
                        F.col("_bucket").alias("bucket"), "doc_id"))
    return survivors, new_rows


def minhash_publish_buckets(store, new_rows: DataFrame):
    """Publish a batch's surviving buckets to the store: insert-only
    MERGE on (band, bucket) — key-idempotent, so replaying the same
    batch inserts nothing. One snapshot per call."""
    return store.merge_into(new_rows, on=["band", "bucket"],
                            when_matched=None, when_not_matched="insert")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_udf(shingle_width: int = 2):
    """64-bit simhash as long (vectorized per batch)."""

    @pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            words = t.lower().split()
            if len(words) < shingle_width:
                grams = [" ".join(words)] if words else [""]
            else:
                grams = [" ".join(words[i:i + shingle_width])
                         for i in range(len(words) - shingle_width + 1)]
            hs = np.array([zlib.crc32(g.encode()) | (zlib.crc32(g[::-1].encode()) << 32)
                           for g in grams], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            v = np.where(bits, 1, -1).sum(axis=0)
            h = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(h - (1 << 64) if h >= (1 << 63) else h)  # to signed
        return pd.Series(out, dtype="object")

    return sh


def simhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  bands: int = 4) -> DataFrame:
    """Near-dup removal via simhash band buckets: 64/bands-bit chunks;
    hamming-close docs agree on ≥1 chunk (pigeonhole) and collide there."""
    width = 64 // bands
    sh = simhash_udf()
    # eager checkpoint: two plan branches consume the hash (see
    # minhash_lsh_dedup) — compute the UDF once, 8 bytes/doc stored;
    # under-partitioned inputs spread first so the UDF parallelizes
    src = df.select(F.col(id_col), F.col(text_col))
    src = spread_to_parallelism(src)
    with_h = (src.select(F.col(id_col), sh(F.col(text_col)).alias("_sh"))
              .localCheckpoint(eager=True))
    band_vals = F.array(*[
        F.shiftrightunsigned("_sh", i * width).bitwiseAND(F.lit((1 << width) - 1))
        for i in range(bands)
    ])
    banded = with_h.select(id_col, F.posexplode(band_vals).alias("_band", "_bucket"))
    # map-side-combinable groupBy-min + join-back (see minhash_lsh_dedup:
    # immune to one-giant-bucket skew, unlike a window over the bucket)
    mins = (banded.groupBy("_band", "_bucket")
            .agg(F.min(id_col).alias("_rep"), F.count("*").alias("_n"))
            .filter(F.col("_n") > 1).drop("_n"))
    dup_ids = (banded.join(mins, ["_band", "_bucket"])
               .filter(F.col(id_col) > F.col("_rep"))
               .select(id_col).distinct())
    return df.join(dup_ids, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard (verification on candidate pairs)
# ---------------------------------------------------------------------------

def minhash_cross_pairs(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        num_perm: int = 128, bands: int = 32,
                        shingle_width: int = 3,
                        verify_jaccard: Optional[float] = None) -> DataFrame:
    """Near-duplicate pairs BETWEEN two corpora — fuzzy decontamination:
    where the n-gram screen (text.contamination) needs verbatim overlap,
    this catches benchmark documents that survive light paraphrase. Both
    sides are banded with the SAME minhash permutations; a bucket-
    equality join nominates candidates; with ``verify_jaccard`` each is
    confirmed by exact n-gram Jaccard. Returns (corpus side ``id_a``,
    benchmark side ``id_b``[, ``jaccard``]) distinct pairs.

    Scale shape: each side shuffles once on (band, bucket); the join is
    bucket-local (benchmark side is small → AQE broadcasts it); no cross
    product; verification cost is O(candidates)."""
    assert num_perm % bands == 0, "num_perm must divide evenly into bands"
    r = num_perm // bands
    sig = minhash_signature_udf(num_perm, shingle_width)
    def banded(df: DataFrame, out_id: str) -> DataFrame:
        src = spread_to_parallelism(
            df.select(F.col(id_col), F.col(text_col)))
        with_sig = src.select(F.col(id_col).alias(out_id),
                              sig(F.col(text_col)).alias("_sig"))
        band_hashes = F.array(*[
            F.xxhash64(F.concat_ws(
                ",", F.slice("_sig", i * r + 1, r).cast("array<string>")))
            for i in range(bands)
        ])
        return with_sig.select(
            out_id, F.posexplode(band_hashes).alias("_band", "_bucket"))

    pairs = (banded(corpus, "id_a")
             .join(banded(benchmark, "id_b"), ["_band", "_bucket"])
             .select("id_a", "id_b").distinct())
    if verify_jaccard is None:
        return pairs
    grams_a = corpus.select(F.col(id_col).alias("id_a"),
                            ngram_set(F.col(text_col), shingle_width).alias("_ga"))
    grams_b = benchmark.select(F.col(id_col).alias("id_b"),
                               ngram_set(F.col(text_col), shingle_width).alias("_gb"))
    joined = pairs.join(grams_a, "id_a").join(grams_b, "id_b")
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return (joined.select(
        "id_a", "id_b",
        F.when(union > 0, inter / union).otherwise(F.lit(1.0)).alias("jaccard"))
        .filter(F.col("jaccard") >= verify_jaccard))


def ngram_set(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram array, JVM-side (no python)."""
    words = F.split(F.trim(F.lower(col)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(df: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3) -> DataFrame:
    """Exact Jaccard for given (id_a, id_b) candidate pairs — the verify
    step after LSH banding. Two broadcast-able joins + JVM set ops."""
    grams = df.select(F.col(id_col), ngram_set(F.col(text_col), n).alias("_g"))
    a = grams.select(F.col(id_col).alias("id_a"), F.col("_g").alias("_ga"))
    b = grams.select(F.col(id_col).alias("id_b"), F.col("_g").alias("_gb"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return joined.select(
        "id_a", "id_b",
        F.when(union > 0, inter / union).otherwise(F.lit(1.0)).alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# Embedding near-duplicate (cosine) via hyperplane LSH
# ---------------------------------------------------------------------------

def hyperplane_bucket_udf(planes: int, dim: int):
    """Random-hyperplane LSH bucket as long: bit i of the bucket is
    sign(H[i]·x) with H = RandomState(42).normal(size=(planes, dim)).
    Module-level so tests can pin golden bucket integers directly."""
    rs = np.random.RandomState(_SEED)
    H = rs.normal(size=(planes, dim)).astype(np.float64)

    @pandas_udf(T.LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            x = np.asarray(v, dtype=np.float64)
            sig = (H @ x) > 0
            out.append(int(sig.astype(np.uint64)
                           @ (1 << np.arange(planes, dtype=np.uint64))))
        return pd.Series(out, dtype="int64")

    return bucket


def _grouped_cosine_dedup(df: DataFrame, vec_col: str, id_col: str,
                          threshold: float, group_fn) -> DataFrame:
    """Shared skeleton for cosine near-dup removal without an n² cross
    join: collapse exact-identical vectors, group the distinct vectors
    via ``group_fn`` (LSH buckets, clusters, …), run the exact cosine
    check only INSIDE groups, keep the min id of each similar set.

    ``group_fn(distinct_vecs) -> DataFrame(id, vec, _g)`` supplies the
    grouping column."""
    # Degenerate-bucket guard, part 1: collapse EXACT-identical vectors
    # first (sha2 of the vector's string form, one map-side-combinable
    # shuffle — the same shape as exact_dedup). Identical vectors have
    # cosine 1.0 >= any threshold <= 1, so dropping non-min ids here is
    # semantics-preserving — and an adversarial corpus of 50k copies of
    # one vector becomes ONE representative instead of one O(n²) bucket.
    vkey = F.sha2(F.col(vec_col).cast("array<double>").cast("string"), 256)
    # eager checkpoint: TWO plan branches consume the collapse result
    # (distinct_vecs leftsemi + exact_dups left_anti) — without it the
    # full-corpus sha2 groupBy would execute twice (8 bytes/distinct-id
    # of executor-local storage, same trade as the minhash signatures)
    reps = (df.select(F.col(id_col), vkey.alias("_vk"))
            .groupBy("_vk").agg(F.min(id_col).alias(id_col))
            .drop("_vk")
            .localCheckpoint(eager=True))
    distinct_vecs = df.join(reps, on=id_col, how="leftsemi")
    keyed = group_fn(distinct_vecs)

    def find_dups(grp: pd.DataFrame) -> pd.DataFrame:
        # one call per group (applyInPandas guarantees whole groups,
        # unlike mapInPandas batch boundaries). Part 2 of the guard:
        # the pairwise cosine runs in bounded TILES (chunk x chunk),
        # never materializing a full group² similarity matrix.
        if len(grp) < 2:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64")})
        ids = grp[id_col].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in grp[vec_col]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        order = np.argsort(ids)
        ids, Mn = ids[order], Mn[order]
        n, ch = len(ids), 4096
        dups: list[int] = []
        for s in range(0, n, ch):
            block = Mn[s:s + ch]
            hit = np.zeros(len(block), dtype=bool)
            for ps in range(0, s + len(block), ch):
                prior = Mn[ps:ps + min(ch, s + len(block) - ps)]
                S = block @ prior.T >= threshold
                if ps < s:
                    hit |= S.any(axis=1)
                else:  # same tile: only strictly-earlier rows count
                    hit |= np.tril(S, k=-1).any(axis=1)
            dups.extend(int(ids[s + j]) for j in np.nonzero(hit)[0])
        return pd.DataFrame({id_col: pd.Series(dups, dtype="int64")})

    bucket_dups = (
        keyed.groupBy("_g")
        .applyInPandas(find_dups, schema=f"{id_col} long")
        .distinct()
    )
    exact_dups = df.select(id_col).join(reps, on=id_col, how="left_anti")
    dup_ids = bucket_dups.unionByName(exact_dups).distinct()
    return df.join(dup_ids, on=id_col, how="left_anti")


def embedding_dedup(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
                    threshold: float = 0.95, planes: int = 16,
                    dim: Optional[int] = None) -> DataFrame:
    """Cosine near-dup removal without an n² cross join: sign-pattern of
    ``planes`` random hyperplanes buckets similar vectors together; the
    exact cosine check runs only inside buckets (arrow-batched)."""
    if dim is None:
        first = df.select(F.size(vec_col)).first()
        if first is None:
            return df
        dim = first[0]
    bucket = hyperplane_bucket_udf(planes, dim)

    def group(distinct_vecs: DataFrame) -> DataFrame:
        return distinct_vecs.select(
            F.col(id_col), F.col(vec_col),
            bucket(F.col(vec_col)).alias("_g"))

    return _grouped_cosine_dedup(df, vec_col, id_col, threshold, group)


def semantic_dedup(df: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id", threshold: float = 0.95,
                   clusters: Optional[DataFrame] = None, k: int = 64,
                   seed: int = 42, max_iter: int = 10) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, public): group
    the embedding space into data-adaptive CLUSTERS, then prune
    near-duplicates within each cluster by exact cosine — the min-id
    member of each similar set survives. Versus random-hyperplane LSH
    (``embedding_dedup``), learned clusters follow the data's actual
    density, catching near-dups whose hyperplane signs differ.

    ``clusters``: optional (id, cluster) DataFrame for a caller-supplied
    (e.g. deterministic) partitioning; default is distributed MLlib
    KMeans (``similarity.kmeans_clusters`` — map-side assignment with
    broadcast centers, no driver rows).

    Scale: the only shuffles are the exact-collapse groupBy, the cluster
    join, and the per-cluster applyInPandas; within-cluster cost is
    bounded by cluster size (pick k ~ n / target_cluster_size) and the
    pairwise check is tiled, so no cluster² matrix materializes."""
    if clusters is None:
        from iceberg_cpp_spark.operators.similarity import kmeans_clusters

        clusters = kmeans_clusters(df, k=k, vec_col=vec_col,
                                   id_col=id_col, seed=seed,
                                   max_iter=max_iter)
    clusters = clusters.select(F.col(id_col),
                               F.col("cluster").alias("_g"))

    def group(distinct_vecs: DataFrame) -> DataFrame:
        return (distinct_vecs.select(F.col(id_col), F.col(vec_col))
                .join(clusters, on=id_col))

    return _grouped_cosine_dedup(df, vec_col, id_col, threshold, group)


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b", max_iter: int = 20) -> DataFrame:
    """Connected components over a duplicate-pair graph by min-label
    propagation (iterative; converges in O(component diameter) rounds,
    each one join + one aggregation — no driver-side graph). Returns
    (id, component) where component = min id in the component."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=False)
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("comp", F.col("id")))
    for _ in range(max_iter):
        prop = (edges.join(labels, edges.src == labels.id)
                .select(F.col("dst").alias("id"), F.col("comp")))
        new_labels = (labels.union(prop)
                      .groupBy("id").agg(F.min("comp").alias("comp"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "id")
                   .filter("n.comp <> o.comp").count())
        labels = new_labels
        if changed == 0:
            break
    return labels


def transitive_dedup(df: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Keep ONE representative (min id) per connected component of the
    duplicate-pair graph — the transitive closure bucket-min LSH alone
    does not give (A~B, B~C but A≁C still collapses to one survivor)."""
    comps = connected_components(pairs)
    drop = comps.filter(F.col("id") != F.col("comp")) \
                .select(F.col("id").alias(id_col))
    return df.join(drop, on=id_col, how="left_anti")
