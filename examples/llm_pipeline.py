"""End-to-end training-data pipeline over the documents corpus: the
composition a 100 TB curation job runs, expressed start-to-finish with
this repo's operators —

  quality filter → language filter → repetition filter → exact-substring
  span scrub → LM-perplexity filter → exact dedup → MinHash near-dedup →
  benchmark-contamination screen → DSIR importance selection → PII
  redaction → deterministic corpus split → sequence packing → Iceberg
  table commit

Every step is a declarative DataFrame transform (Catalyst plans the
whole chain; nothing materializes until the final write), and every
decision is content-hash deterministic, so the same corpus yields the
same dataset on any cluster size.

Run: python examples/llm_pipeline.py [sf_dir]   (default sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from iceberg_cpp_spark import IceTable
from iceberg_cpp_spark.core.types import schema_from_spark
from iceberg_cpp_spark.operators import dedup, sampling
from iceberg_cpp_spark.operators import text as tx
from iceberg_cpp_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="llm-pipeline", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()
    print(f"corpus: {n0} documents")

    # 1. quality + language gates — pure Column expressions, no shuffle
    c = F.col("text")
    kept = docs.filter((tx.quality_score(c) >= 0.5)
                       & (tx.language_id(c) != "und"))

    # 2. repetition filter (Gopher): drop docs whose top 2-gram covers
    #    >20% of 2-gram positions
    rep = tx.repetition_stats(kept)
    kept = (kept.join(rep.filter((F.col("n_grams2") == 0)
                                 | (F.col("top2_count")
                                    <= 0.2 * F.col("n_grams2")))
                      .select("doc_id"), "doc_id", "left_semi"))

    # 2b. exact-substring scrub (Lee et al. ExactSubstr): corpus-wide
    #     repeated 8-token spans removed from every occurrence BEFORE
    #     near-dedup, so boilerplate can't glue unrelated docs together
    scrubbed = tx.duplicate_span_scrub(kept, window=8)
    kept = (kept.drop("text")
            .join(scrubbed.select("doc_id",
                                  F.col("scrubbed").alias("text")),
                  "doc_id"))

    # 2c. CCNet-style LM-perplexity gate: an add-k bigram model trained
    #     on the corpus itself scores each doc; the most surprising
    #     quartile (boilerplate residue, gibberish, OOD) is dropped
    from iceberg_cpp_spark.operators import lm

    ce = lm.bigram_cross_entropy(kept)
    cut = ce.approxQuantile("cross_entropy", [0.75], 0.01)[0]
    kept = kept.join(ce.filter(F.col("cross_entropy") <= cut)
                     .select("doc_id"), "doc_id", "left_semi")

    # 3. exact then MinHash near-dedup (one shuffle each, no O(n²))
    kept = dedup.exact_dedup(kept)
    kept = dedup.minhash_lsh_dedup(kept)

    # 4. contamination screen vs a benchmark set (here: a held-out slice)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    dirty = tx.contamination(kept.join(bench, "doc_id", "left_anti"),
                             bench, n=4)
    kept = (kept.join(bench, "doc_id", "left_anti")
            .join(dirty.select("doc_id"), "doc_id", "left_anti"))

    # 4b. DSIR importance selection toward an in-domain target (the
    #     English slice stands in for a curated target corpus): hashed
    #     n-gram log-ratios + seeded Gumbel top-k — deterministic,
    #     repartition-stable, resumable
    from iceberg_cpp_spark.operators import dsir

    target = docs.filter(F.col("lang") == "en")
    want = max(50, int(kept.count() * 0.8))
    chosen = dsir.dsir_resample(kept, target, k=want, n_buckets=1024)
    kept = kept.join(chosen.select("doc_id"), "doc_id", "left_semi")

    # 5. PII scrub + stable split + REAL token counts (trained BPE)
    #    + sequence packing
    from iceberg_cpp_spark.operators import bpe

    kept = kept.withColumn("text", tx.redact_pii(F.col("text")))
    kept = sampling.split(kept, weights=[0.9, 0.05, 0.05])
    merges = bpe.train_bpe(docs, num_merges=100, id_col="doc_id")
    kept = kept.withColumn("n_tokens", bpe.bpe_token_count(merges))
    packed = sampling.pack_sequences(kept, seq_len=2048)

    # 5b. multimodal sidecar: render a PNG thumbnail payload per doc
    #     (stand-in for scraped images) and decode back through the
    #     Arrow-batched codec pipeline; on_error='skip' records corrupt
    #     payloads in a decode_error column instead of killing the
    #     stage — at corpus scale some fraction is always broken
    from iceberg_cpp_spark.operators.multimodal import decode_images

    def render(batches):
        import numpy as np
        import pandas as pd

        from iceberg_cpp_spark.operators import codecs

        for b in batches:
            payloads = []
            for did, t in zip(b["doc_id"], b["text"]):
                raw = np.frombuffer((t or " ").encode(), np.uint8)[:256]
                img = np.zeros((16, 16, 1), np.uint8)
                img.reshape(-1)[:len(raw)] = raw
                p = codecs.encode_png(img)
                # simulate corpus rot: every 17th payload is truncated
                payloads.append(p[:20] if did % 17 == 0 else p)
            yield pd.DataFrame({"media_id": b["doc_id"],
                                "payload": payloads})

    media = packed.select("doc_id", "text").mapInPandas(
        render, schema="media_id long, payload binary")
    decoded = decode_images(media, on_error="skip")
    n_bad = decoded.filter("decode_error IS NOT NULL").count()
    print(f"multimodal: {decoded.count()} payloads decoded, "
          f"{n_bad} corrupt (skipped, not fatal)")

    # 6. commit the curated dataset as an Iceberg table
    out = packed.select("doc_id", "text", "lang", "source", "_split",
                        "n_tokens", "_pack", "_offset", "_end_pack")
    loc = os.path.join(tempfile.mkdtemp(prefix="llm_pipe_"), "curated")
    t = IceTable.create(spark, loc, schema_from_spark(out.schema))
    t.append(out)

    n1 = t.to_df().count()
    by_split = {r["_split"]: r["n"] for r in
                t.to_df().groupBy("_split").agg(F.count("*").alias("n"))
                .collect()}
    n_packs = t.to_df().agg(F.max("_end_pack")).first()[0] + 1
    print(f"curated: {n1}/{n0} docs kept, splits={by_split}, "
          f"{n_packs} packed sequences of 2048 tokens")
    print(f"table: {t.metadata_location}")
    assert 0 < n1 < n0

    # 7. the corpus GROWS: later ingestion batches dedup against a
    # persisted LSH bucket store (an IceTable) instead of re-hashing
    # everything accepted so far; the store update is an insert-only
    # MERGE, one snapshot per batch, so a replayed batch drops entirely
    store_loc = os.path.join(tempfile.mkdtemp(prefix="llm_pipe_"), "store")
    _, store = dedup.minhash_build_store(spark, store_loc, kept)
    batch = docs.filter("doc_id % 17 = 3")  # overlaps the seed corpus
    fresh, store = dedup.minhash_incremental_dedup(store, batch)
    print(f"incremental: {fresh.count()}/{batch.count()} batch docs new "
          f"(store snapshots: {len(store.snapshots())})")
    spark.stop()


if __name__ == "__main__":
    main()
