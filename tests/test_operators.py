"""LLM-pipeline operators: dedup correctness on constructed duplicates,
ANN vs numpy brute force, text metrics vs python, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_cpp_spark.operators import (classify, dedup, multimodal,
                                          retrieval, similarity, text)


@pytest.fixture(scope="module")
def dup_docs(spark):
    """50 mutually-distinct base docs (disjoint-ish random vocab draws);
    ids 1000+ are near-copies (one word changed) of 0-9, ids 2000+ are
    exact copies of 0-4."""
    import random

    vocab = [f"w{k}" for k in range(400)]
    base = []
    for i in range(50):
        rng = random.Random(1000 + i)
        base.append((i, " ".join(rng.sample(vocab, 30))))
    near = [(1000 + i, "changed " + base[i][1].split(" ", 1)[1]) for i in range(10)]
    exact = [(2000 + i, base[i][1]) for i in range(5)]
    return spark.createDataFrame(base + near + exact, "doc_id long, text string")


class TestExactDedup:
    def test_removes_exact_keeps_near(self, dup_docs):
        out = dedup.exact_dedup(dup_docs)
        ids = {r["doc_id"] for r in out.collect()}
        assert len(ids) == 60  # 65 - 5 exact copies
        assert all(2000 + i not in ids for i in range(5))  # min-id wins
        assert all(i in ids for i in range(50))

    def test_normalization(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "HELLO   WORLD")],
            "doc_id long, text string")
        assert dedup.exact_dedup(df).count() == 1
        assert dedup.exact_dedup(df, normalize=False).count() == 3


class TestMinHash:
    def test_catches_near_duplicates(self, dup_docs):
        out = dedup.minhash_lsh_dedup(dup_docs, num_perm=64, bands=16)
        ids = {r["doc_id"] for r in out.collect()}
        # all exact copies removed, most near-copies removed
        assert all(2000 + i not in ids for i in range(5))
        removed_near = sum(1 for i in range(10) if 1000 + i not in ids)
        assert removed_near >= 8
        assert all(i in ids for i in range(50))  # originals survive

    def test_deterministic(self, dup_docs):
        a = sorted(r["doc_id"] for r in dedup.minhash_lsh_dedup(
            dup_docs, num_perm=64, bands=16).collect())
        b = sorted(r["doc_id"] for r in dedup.minhash_lsh_dedup(
            dup_docs.repartition(7), num_perm=64, bands=16).collect())
        assert a == b

    def test_degenerate_corpus_no_bucket_skew(self, spark):
        """All-identical 50k-doc corpus: every doc lands in ONE bucket per
        band. The groupBy-min + join-back scheme partial-aggregates
        map-side (VERDICT r02 de-skew ask), so this must both finish and
        collapse to a single survivor — and the plan must show a partial
        aggregate, not a window over the giant bucket."""
        import time

        from pyspark.sql import functions as F

        n = 50_000
        docs = (spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.lit("the same exact document text repeated verbatim "
                  "across the entire corpus for skew testing").alias("text")))
        out = dedup.minhash_lsh_dedup(docs, num_perm=64, bands=16)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "partial_min" in plan or "partial min" in plan.lower(), \
            "bucket-min must partial-aggregate map-side"
        assert "Window" not in plan, \
            "a window over the bucket would serialize the giant bucket"
        t0 = time.time()
        survivors = out.select("doc_id").collect()
        took = time.time() - t0
        assert [r["doc_id"] for r in survivors] == [0]
        assert took < 120, f"degenerate corpus took {took:.0f}s"

    def test_persist_mode_frees_storage(self, spark, dup_docs):
        """VERDICT r09 task 4: materialize='persist' gives the same
        answer AND reclaims the signature cache via the
        release_signatures() handle — closing the localCheckpoint
        session-leak for long-lived shared sessions. Default behavior
        (checkpoint) unchanged."""
        sc = spark.sparkContext

        def n_cached() -> int:
            return sc._jsc.getPersistentRDDs().size()

        before = n_cached()
        out = dedup.minhash_lsh_dedup(dup_docs, num_perm=64, bands=16,
                                      materialize="persist")
        assert n_cached() == before + 1  # signatures materialized+cached
        ids = sorted(r["doc_id"] for r in out.collect())
        out.release_signatures()
        assert n_cached() == before, "signature cache not freed"
        # (the default checkpoint mode, run AFTER the release check,
        # pins its blocks for the session — the documented trade)
        default = sorted(r["doc_id"] for r in dedup.minhash_lsh_dedup(
            dup_docs, num_perm=64, bands=16).collect())
        assert ids == default
        # invalid knob fails fast
        import pytest

        with pytest.raises(ValueError, match="materialize"):
            dedup.minhash_lsh_dedup(dup_docs, materialize="nope")


class TestSemanticDedup:
    @staticmethod
    def _corpus(spark):
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.normal(size=(40, 16))
        rows = []
        for i, v in enumerate(base):
            rows.append((i, [float(x) for x in v]))
        # near-dups: tiny perturbations of the first 5 vectors
        for i in range(5):
            pert = base[i] + rng.normal(scale=1e-3, size=16)
            rows.append((100 + i, [float(x) for x in pert]))
        # exact copies of vectors 6 and 7
        rows.append((200, [float(x) for x in base[6]]))
        rows.append((201, [float(x) for x in base[7]]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")

    def test_kmeans_default_removes_near_and_exact(self, spark):
        """Default (MLlib KMeans) clustering: exact copies and tiny
        perturbations are pruned; min ids survive; originals stay."""
        from iceberg_cpp_spark.operators import dedup

        df = self._corpus(spark)
        out = dedup.semantic_dedup(df, threshold=0.999, k=8)
        ids = {r["vec_id"] for r in out.collect()}
        assert all(i in ids for i in range(40))      # originals survive
        assert all(100 + i not in ids for i in range(5))  # near-dups out
        assert 200 not in ids and 201 not in ids     # exact copies out

    def test_injected_clusters_deterministic(self, spark):
        """The clusters= injection (the oracle row's deterministic
        axis-cluster variant) is repartition-stable."""
        from pyspark.sql import functions as F

        from iceberg_cpp_spark.operators import dedup

        df = self._corpus(spark)
        absv = F.transform(F.col("embedding"), lambda x: F.abs(x))
        cl = df.select(
            "vec_id",
            (F.array_position(absv, F.array_max(absv)) - 1)
            .cast("int").alias("cluster"))
        a = sorted(r["vec_id"] for r in dedup.semantic_dedup(
            df, threshold=0.999, clusters=cl).collect())
        b = sorted(r["vec_id"] for r in dedup.semantic_dedup(
            df.repartition(7), threshold=0.999, clusters=cl).collect())
        assert a == b
        # exact copies share their original's cluster -> pruned even
        # under the crude axis grouping
        assert 200 not in a and 201 not in a


class TestIncrementalMinHash:
    def test_store_backed_batches_and_replay(self, spark, dup_docs,
                                             tmp_path):
        """minhash_build_store + minhash_incremental_dedup: a second
        batch dedups against the persisted store without re-hashing the
        seed corpus; replaying the SAME batch drops every doc (its
        buckets are now in the store) — the exactly-once-ish property a
        growing-corpus pipeline needs."""
        import os

        from iceberg_cpp_spark.operators import dedup

        seed = dup_docs.filter("doc_id < 1000")  # originals only
        survivors, store = dedup.minhash_build_store(
            spark, os.path.join(str(tmp_path), "store"), seed,
            num_perm=64, bands=16)
        assert survivors.count() == 50
        # batch: near-copies of seed docs + one genuinely new doc
        batch = dup_docs.filter("doc_id >= 1000")  # 10 near + 5 exact
        new_doc = spark.createDataFrame(
            [(5000, "an entirely novel document about nothing else")],
            "doc_id long, text string")
        rows_before = store.to_df().count()
        snaps_before = len(store.snapshots())
        out, store2 = dedup.minhash_incremental_dedup(
            store, batch.unionByName(new_doc), num_perm=64, bands=16)
        ids = {r["doc_id"] for r in out.collect()}
        assert 5000 in ids                       # novel doc survives
        assert all(2000 + i not in ids for i in range(5))  # exact copies
        assert sum(1 for i in range(10) if 1000 + i in ids) <= 2
        # store grew by the survivors' buckets in ONE MERGE commit
        assert store2.to_df().count() > rows_before
        assert len(store2.snapshots()) == snaps_before + 1
        # REPLAY: the same batch against the updated store -> all dups
        replay, _ = dedup.minhash_incremental_dedup(
            store2, batch.unionByName(new_doc), num_perm=64, bands=16)
        assert replay.count() == 0


class TestGoldenVectors:
    """Third-party anchors for the LLM-dedup kernels (VERDICT r4 item
    3): literal constants derived with an INDEPENDENT pure-python-int
    implementation of each documented spec (no numpy broadcasting, no
    shared helper code), the Appendix-B treatment bucket[N] gets in
    test_transforms.py. A spec-level bug shared by the engine and the
    fixture generator cannot pass these — the first run of this
    derivation caught the engine's int64-wrap in (a*x+b) mod p."""

    T1 = "the quick brown fox jumps over the lazy dog"

    def test_shingle_hashes_golden(self):
        # crc32 of the word-3-grams of T1, unique-sorted:
        #   "the quick brown", "quick brown fox", ... "the lazy dog"
        assert dedup._shingle_hashes(self.T1, 3).tolist() == [
            688936931, 709202338, 1272230570, 1834140213,
            1897471436, 3249799493, 3573724801]
        # shorter than width -> the whole text as one shingle
        assert dedup._shingle_hashes("a b", 3).tolist() == [2154585299]

    def test_perm_params_golden(self):
        # RandomState(42).randint draws, pinned: the signature spec is
        # (a*x + b) mod (2^61 - 1) over THESE exact coefficients
        a, b = dedup._perm_params(8)
        assert a.tolist() == [
            2297359619001564596, 1396682528897996047, 1973689801170867272,
            1819927849474927637, 572192888165898362, 571748048327668951,
            1071453510346823115, 2143071682933157237]
        assert b.tolist() == [
            1865242737500154727, 1532418594269339778, 379716980844854580,
            1750777661071092055, 1520798217888136605, 1611122243678701953,
            1048235628103308219, 1077373049702139040]

    def test_minhash_signature_golden(self, spark):
        # min over shingles of exact (a*x + b) mod p, p = 2^61-1 —
        # derived with arbitrary-precision ints, NOT the engine's
        # vectorized uint64 reduction
        df = spark.createDataFrame([(1, self.T1), (2, "a b")],
                                   "doc_id long, text string")
        sig = dedup.minhash_signature_udf(num_perm=8, shingle_width=3)
        got = {r["doc_id"]: r["s"]
               for r in df.select("doc_id",
                                  sig(F.col("text")).alias("s")).collect()}
        assert got[1] == [
            838360147951669747, 132342025830625819, 238593058046986969,
            952900478005830954, 27886602127102212, 119070636492815916,
            198958336644572675, 404920741812586067]
        assert got[2] == [
            978244368310984482, 765821485099618389, 384768995323111172,
            590212473791581322, 1869468833148911521, 983300986623426689,
            1325988573520911746, 1162189145003237376]

    def test_simhash_golden(self, spark):
        # sign-bit aggregation of crc32(g) | crc32(reversed g) << 32
        # over word-2-grams, derived with per-bit python-int loops
        df = spark.createDataFrame(
            [(1, self.T1), (2, "hello world hello")],
            "doc_id long, text string")
        sh = dedup.simhash_udf()
        got = {r["doc_id"]: r["h"]
               for r in df.select("doc_id",
                                  sh(F.col("text")).alias("h")).collect()}
        assert got[1] == 8576841617363808932
        assert got[2] == -8646829370716978811

    def test_hyperplane_bucket_golden(self, spark):
        # H = RandomState(42).normal(size=(16, 4)); bit i = H[i]@x > 0.
        # First row pinned so a seed/shape drift fails loudly:
        H0 = np.random.RandomState(42).normal(size=(16, 4))[0]
        assert np.allclose(
            H0, [0.496714153011, -0.138264301171, 0.647688538101,
                 1.523029856408], atol=1e-11)
        df = spark.createDataFrame(
            [(1, [1.0, 0.0, -1.0, 0.5]), (2, [0.2, -0.3, 0.9, 1.1]),
             (3, [-1.0, 0.0, 1.0, -0.5])],
            "vec_id long, embedding array<double>")
        bucket = dedup.hyperplane_bucket_udf(planes=16, dim=4)
        got = {r["vec_id"]: r["b"]
               for r in df.select("vec_id",
                                  bucket(F.col("embedding")).alias("b"))
               .collect()}
        # sign-pattern integers derived with per-plane python float dots
        assert got == {1: 34537, 2: 30851, 3: 30998}


class TestBPE:
    def test_train_golden_hand_computed(self, spark):
        """Pair counts for 'low lower lowest': (l,o)=3 ties (o,w)=3 →
        lexicographic pick (l,o); then (lo,w)=3; then (low,e)=2 beats
        every 1-count pair. Fully hand-derived."""
        from iceberg_cpp_spark.operators import bpe

        df = spark.createDataFrame([(1, "low lower lowest")],
                                   "doc_id long, text string")
        assert bpe.train_bpe(df, num_merges=3, id_col="doc_id") \
            == [("l", "o"), ("lo", "w"), ("low", "e")]

    def test_encode_golden(self):
        from iceberg_cpp_spark.operators import bpe

        ranks = {("l", "o"): 0, ("lo", "w"): 1, ("low", "e"): 2}
        assert bpe.encode_word("low", ranks) == ["low", bpe.EOW]
        assert bpe.encode_word("lower", ranks) == ["lowe", "r", bpe.EOW]
        assert bpe.encode_word("xyz", ranks) == ["x", "y", "z", bpe.EOW]

    def test_distributed_count_matches_local(self, spark, documents):
        from iceberg_cpp_spark.operators import bpe

        docs = documents.limit(100).cache()
        merges = bpe.train_bpe(docs, num_merges=50, id_col="doc_id")
        got = {r["doc_id"]: r["n"] for r in docs.select(
            "doc_id", bpe.bpe_token_count(merges).alias("n")).collect()}
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for r in docs.select("doc_id", "text").collect():
            exp = sum(len(bpe.encode_word(w, ranks))
                      for w in r["text"].lower().split())
            assert got[r["doc_id"]] == exp
        # merge table is deterministic under repartitioning
        assert merges == bpe.train_bpe(docs.repartition(7), num_merges=50,
                                       id_col="doc_id")


class TestCrossCorpusPairs:
    def test_near_copy_across_corpora_found(self, spark):
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark woods tonight")
        corpus = spark.createDataFrame([
            (1, base),
            (3, "completely different words about spark partitions here "
                "nothing shared with anything else at all today"),
        ], "doc_id long, text string")
        bench = spark.createDataFrame([
            (2, base.replace("tonight", "tomorrow")),  # near-copy of 1
            (4, "unrelated benchmark prose entirely of its own style and "
                "topic never overlapping the corpus text"),
        ], "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]) for r in
               dedup.minhash_cross_pairs(corpus, bench,
                                         verify_jaccard=0.5).collect()}
        assert got == {(1, 2)}

    def test_verify_threshold_filters(self, spark):
        a = spark.createDataFrame([(1, "alpha beta gamma delta epsilon")],
                                  "doc_id long, text string")
        b = spark.createDataFrame([(2, "alpha beta gamma delta epsilon")],
                                  "doc_id long, text string")
        exact = dedup.minhash_cross_pairs(a, b, verify_jaccard=0.99).collect()
        assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in exact] \
            == [(1, 2, 1.0)]


class TestSimHash:
    def test_catches_near_duplicates(self, dup_docs):
        out = dedup.simhash_dedup(dup_docs)
        ids = {r["doc_id"] for r in out.collect()}
        assert all(2000 + i not in ids for i in range(5))
        assert sum(1 for i in range(10) if 1000 + i not in ids) >= 5


class TestNgramJaccard:
    def test_exact_values(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d"), (3, "x y z w")],
            "doc_id long, text string")
        pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
        rows = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in dedup.ngram_jaccard_pairs(df, pairs).collect()}
        assert rows[(1, 2)] == 1.0
        assert rows[(1, 3)] == 0.0


class TestEmbeddingDedup:
    def test_near_duplicate_vectors_removed(self, spark):
        rng = np.random.RandomState(7)
        base = rng.normal(size=(30, 16)).astype("float32")
        rows = [(i, base[i].tolist()) for i in range(30)]
        # 100+i: tiny perturbation of i → cosine ≈ 1
        rows += [(100 + i, (base[i] + 1e-4).tolist()) for i in range(5)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = dedup.embedding_dedup(df, threshold=0.999, planes=8)
        ids = {r["vec_id"] for r in out.collect()}
        assert sum(1 for i in range(5) if 100 + i not in ids) >= 4
        assert all(i in ids for i in range(30))

    def test_degenerate_corpus_no_bucket_blowup(self, spark):
        """All-identical 50k-vector corpus (VERDICT r4 item 7): without
        a guard every vector lands in ONE hyperplane bucket and the
        within-bucket cosine is O(n²) on a single task. The exact-vector
        collapse must reduce it to one representative — survivors == 1,
        bounded wall time, and the giant-bucket pairwise never runs."""
        import time

        n = 50_000
        df = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(float(j)) for j in [1.0, -2.0, 0.5, 3.0]])
            .alias("embedding"))
        t0 = time.time()
        out = dedup.embedding_dedup(df, threshold=0.95, planes=16)
        survivors = [r["vec_id"] for r in out.collect()]
        took = time.time() - t0
        assert survivors == [0]
        assert took < 120, f"degenerate corpus took {took:.0f}s"

    def test_tiled_cosine_matches_full_matrix(self, spark):
        """Distinct-but-near vectors crossing the 4096 tile boundary:
        the tiled pairwise must find exactly the pairs the full n²
        matrix would."""
        rng = np.random.RandomState(3)
        base = rng.normal(size=(12, 8))
        rows = []
        for i in range(5000):  # > one 4096 tile, few distinct contents
            v = base[i % 12] + rng.normal(size=8) * 1e-3
            rows.append((i, v.tolist()))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = dedup.embedding_dedup(df, threshold=0.999, planes=2)
        ids = sorted(r["vec_id"] for r in out.collect())
        # oracle with the SAME bucket semantics (pinned H), full n²
        # within each bucket: j survives iff no earlier same-bucket i
        # has cos >= th
        M = np.stack([np.asarray(v) for _, v in rows])
        Mn = M / np.linalg.norm(M, axis=1)[:, None]
        H = np.random.RandomState(42).normal(size=(2, 8))
        bkt = ((H @ M.T) > 0).T @ np.array([1, 2])
        exp = []
        for j in range(len(rows)):
            prior = [i for i in range(j) if bkt[i] == bkt[j]]
            if not prior or not (Mn[prior] @ Mn[j] >= 0.999).any():
                exp.append(j)
        assert ids == exp


class TestSimilarity:
    def test_topk_matches_numpy(self, spark, embeddings):
        emb = embeddings.limit(200).cache()
        pdf = emb.toPandas()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        ids = pdf["vec_id"].to_numpy()
        Mn = M / np.linalg.norm(M, axis=1)[:, None]

        q = emb.filter(F.col("vec_id") == int(ids[0])).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        got = [r["vec_id"] for r in similarity.cosine_topk(emb, q, k=5)
               .orderBy("rank").collect()]
        qi = int(np.where(ids == ids[0])[0][0])
        sims = Mn @ Mn[qi]
        # numpy tie-break: score desc then id asc, like the operator
        order = sorted(range(len(ids)), key=lambda j: (-sims[j], ids[j]))[:5]
        assert got == [int(ids[j]) for j in order]

    def test_ivf_mostly_agrees_with_brute(self, spark, embeddings):
        emb = embeddings.cache()
        q = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
        brute = {(r["query_id"], r["vec_id"]) for r in
                 similarity.cosine_topk(emb, q, k=3).collect()}
        C = similarity.train_centroids(emb, ncentroids=8, sample_rows=500)
        ivf = {(r["query_id"], r["vec_id"]) for r in
               similarity.ivf_topk(similarity.assign_centroids(emb, C), C, q,
                                   k=3, nprobe=4).collect()}
        # recall ≥ 60% with half the cells probed
        assert len(brute & ivf) >= 0.6 * len(brute)

    def test_pq_encode_and_adc_golden(self, spark):
        """Hand-computed anchor for the PQ encode + ADC path (independent
        of the fixture generator's shared spec): explicit codebooks, codes
        and distances verified by hand."""
        # m=2 subspaces of 2 dims, 2 codewords each
        books = np.array([[[0.0, 0.0], [10.0, 10.0]],
                          [[0.0, 0.0], [5.0, 5.0]]])
        df = spark.createDataFrame(
            [(1, [0.1, 0.0, 4.9, 5.0]), (2, [9.9, 10.0, 0.2, 0.0])],
            "vec_id long, embedding array<float>")
        enc = similarity.pq_encode(df, books)
        codes = {r["vec_id"]: list(r["_pq"]) for r in enc.collect()}
        assert codes == {1: [0, 1], 2: [1, 0]}

        q = spark.createDataFrame(
            [(9, [0.0, 0.0, 5.0, 5.0])],
            "query_id long, query_vec array<float>")
        # LUT for q: sub0 -> [0, 200]; sub1 -> [50, 0]
        # dist(vec1)=LUT0[0]+LUT1[1]=0 ; dist(vec2)=LUT0[1]+LUT1[0]=250
        got = [(r["vec_id"], r["rank"]) for r in
               similarity.pq_topk(enc, books, q, k=2).orderBy("rank").collect()]
        assert got == [(1, 1), (2, 2)]

    def test_pq_self_hit_and_l2_recall(self, spark, embeddings):
        emb = embeddings.cache()
        B = similarity.train_pq(emb, m=8, nbits=4, sample_rows=500,
                                id_col="vec_id")
        assert B.shape == (8, 16, 8)
        enc = similarity.pq_encode(emb, B)
        q = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"))
        got = similarity.pq_topk(enc, B, q, k=5).collect()
        # every query's nearest code-distance hit is itself
        self_ranks = {r["query_id"]: r["rank"] for r in got
                      if r["query_id"] == r["vec_id"]}
        assert all(v == 1 for v in self_ranks.values()) and len(self_ranks) == 8
        # recall vs exact L2 (numpy) stays useful under 32x compression
        pdf = emb.toPandas()
        M = np.stack([np.asarray(v, np.float64) for v in pdf["embedding"]])
        ids = pdf["vec_id"].to_numpy()
        exact = set()
        for qid in range(8):
            qx = M[np.where(ids == qid)[0][0]]
            d = ((M - qx) ** 2).sum(axis=1)
            order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))[:5]
            exact.update((qid, int(ids[j])) for j in order)
        # pure-ADC recall on near-random vectors is limited by distance
        # concentration — well above the 1% chance floor is what matters
        approx = {(r["query_id"], r["vec_id"]) for r in got}
        assert len(exact & approx) >= 0.2 * len(exact)
        # the standard fix: ADC shortlist + exact re-rank recovers recall
        rer = {(r["query_id"], r["vec_id"]) for r in
               similarity.pq_topk(enc, B, q, k=5, rerank_factor=8).collect()}
        assert len(exact & rer) >= 0.6 * len(exact)
        assert len(exact & rer) >= len(exact & approx)

    def test_centroid_sample_cap_is_loud(self, spark):
        """The ONE driver-side materialization in the ANN plane is the
        training sample — raising sample_rows past the memory-safe cap
        must refuse loudly instead of OOMing the driver mid-job."""
        import pandas as pd

        emb = spark.createDataFrame(
            pd.DataFrame([(0, [0.0] * 4)], columns=["vec_id", "embedding"]))
        with pytest.raises(ValueError, match="driver-safe cap"):
            similarity.train_centroids(emb, sample_rows=1_000_001)

    def test_centroid_sample_survives_degenerate_first_rows(self, spark):
        """VERDICT r4 item 2: the training sample must be uniform over
        the corpus, not `.limit()` (= first file). Corpus layout: the
        FIRST 1000 rows are one identical vector (a degenerate shard);
        the rest spread over 8 well-separated clusters. Hash-ordered
        sampling must reach the clusters, yielding diverse centroids
        and high IVF recall."""
        import pandas as pd

        rs = np.random.RandomState(7)
        centers = rs.normal(size=(8, 16)) * 10
        rows = [(i, [1.0] * 16) for i in range(1000)]  # degenerate head
        for i in range(1000, 4000):
            c = centers[i % 8]
            rows.append((i, (c + rs.normal(size=16) * 0.1).tolist()))
        emb = spark.createDataFrame(
            pd.DataFrame(rows, columns=["vec_id", "embedding"])
        ).coalesce(1)  # single partition: limit() WOULD take the head

        C = similarity.train_centroids(emb, ncentroids=8, sample_rows=500,
                                       id_col="vec_id")
        # centroids must not collapse onto the degenerate head
        assert len({tuple(np.round(c, 6)) for c in C}) >= 6
        q = (spark.createDataFrame(
            pd.DataFrame([(int(i), centers[i % 8].tolist())
                          for i in range(8)],
                         columns=["query_id", "query_vec"])))
        brute = {(r["query_id"], r["vec_id"]) for r in
                 similarity.cosine_topk(
                     emb, q.select(F.col("query_id"),
                                   F.col("query_vec")), k=5).collect()}
        ivf = {(r["query_id"], r["vec_id"]) for r in
               similarity.ivf_topk(similarity.assign_centroids(emb, C), C, q,
                                   k=5, nprobe=3).collect()}
        assert len(brute & ivf) >= 0.8 * len(brute)


class TestBM25:
    @staticmethod
    def _reference(corpus, queries, k, k1=1.2, b=0.75):
        """Independent plain-Python BM25 (Lucene positive-IDF variant)
        — loops and dicts, no shared code with the operator."""
        import math
        import re
        tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        tfs = {d: {} for d, _ in corpus}
        for d, txt in corpus:
            for t in tok(txt):
                tfs[d][t] = tfs[d].get(t, 0) + 1
        n = len(corpus)
        avgdl = sum(sum(m.values()) for m in tfs.values()) / n
        df = {}
        for m in tfs.values():
            for t in m:
                df[t] = df.get(t, 0) + 1
        out = {}
        for qid, qtxt in queries:
            scores = {}
            qtf = {}
            for t in tok(qtxt):
                qtf[t] = qtf.get(t, 0) + 1
            for t, qn in qtf.items():
                if t not in df:
                    continue
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                for d, m in tfs.items():
                    if t not in m:
                        continue
                    dl = sum(m.values())
                    part = (m[t] * (k1 + 1)
                            / (m[t] + k1 * (1 - b + b * dl / avgdl)))
                    scores[d] = scores.get(d, 0.0) + qn * idf * part
            ranked = sorted(((round(s, 6), d) for d, s in scores.items()),
                            key=lambda p: (-p[0], p[1]))[:k]
            out[qid] = [(d, r + 1, s) for r, (s, d) in enumerate(ranked)]
        return out

    def test_matches_python_reference(self, spark):
        corpus = [
            (1, "spark shuffles data across the cluster"),
            (2, "the cluster scales spark jobs; spark spark"),
            (3, "quantum cats purr loudly"),
            (4, "data data data everywhere and not a byte to keep"),
            (5, "loudly the jobs hum across data centers"),
            (6, ""),
        ]
        queries = [(10, "spark data cluster"), (11, "loudly purr"),
                   (12, "zz_nomatch")]
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        qdf = spark.createDataFrame(queries,
                                    "query_id long, query_text string")
        got = {}
        for r in retrieval.bm25_topk(cdf, qdf, k=3).collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["rank"], r["score"]))
        expected = self._reference(corpus, queries, k=3)
        assert sorted(got) == [10, 11]  # no-overlap query yields no rows
        for qid in got:
            got[qid].sort(key=lambda p: p[1])
            assert [(d, rk) for d, rk, _ in got[qid]] == \
                [(d, rk) for d, rk, _ in expected[qid]]
            for (_, _, s_got), (_, _, s_exp) in zip(got[qid], expected[qid]):
                assert s_got == pytest.approx(s_exp, abs=2e-6)

    def test_k_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        q = spark.createDataFrame([(1, "a")],
                                  "query_id long, query_text string")
        with pytest.raises(ValueError, match="k must be"):
            retrieval.bm25_topk(df, q, k=0)

    def test_randomized_against_reference(self, spark):
        """Seeded random corpus (Zipf-ish vocab, variable doc lengths,
        punctuation noise) vs the independent Python reference — one
        Spark round-trip, full-output equality on ranks."""
        import random
        rng = random.Random(20260815)
        vocab = [f"w{i}" for i in range(30)]
        corpus = []
        for d in range(40):
            n = rng.randint(0, 25)
            words = [vocab[min(int(rng.expovariate(0.2)), 29)]
                     for _ in range(n)]
            sep = [" ", "  ", ", ", ".\n"]
            corpus.append((d, "".join(w + rng.choice(sep) for w in words)))
        queries = [(100 + i, " ".join(
            vocab[rng.randrange(30)] for _ in range(rng.randint(1, 4))))
            for i in range(6)]
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        qdf = spark.createDataFrame(queries,
                                    "query_id long, query_text string")
        got = {}
        for r in retrieval.bm25_topk(cdf, qdf, k=4).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"]))
        expected = self._reference(corpus, queries, k=4)
        assert set(got) == {q for q, hits in expected.items() if hits}
        for qid, hits in got.items():
            hits.sort()
            exp = [(rk, d) for d, rk, _ in expected[qid]]
            assert [(rk, d) for rk, d, _ in hits] == exp
            for (_, _, s_got), (_, _, s_exp) in zip(
                    hits, expected[qid]):
                assert s_got == pytest.approx(s_exp, abs=2e-6)


class TestNaiveBayes:
    def test_hand_derived_scores(self, spark):
        """Golden check against pen-and-paper smoothed log-posteriors:
        train A='x x y', B='z z' (V=3, N_A=3, N_B=2, priors 1/2 each);
        score doc 'x z q' (q unseen):
          score_A = ln(.5) + 1*ln(2+1) - 3*ln(3+3) = -4.969813
          score_B = ln(.5) + 1*ln(2+1) - 3*ln(2+3) = -4.422849
        → predicts B. A zero-token doc scores priors only; the equal
        priors tie breaks to the lexically-smaller label A."""
        train = spark.createDataFrame(
            [("A", "x x y"), ("B", "z z")], "label string, text string")
        model = classify.train_nb(train)
        test = spark.createDataFrame(
            [(1, "x z q"), (2, "??")], "doc_id long, text string")
        scores = {(r["doc_id"], r["label"]): r["score"]
                  for r in classify.nb_scores(model, test).collect()}
        assert scores[(1, "A")] == pytest.approx(-4.969813, abs=1e-6)
        assert scores[(1, "B")] == pytest.approx(-4.422849, abs=1e-6)
        assert scores[(2, "A")] == scores[(2, "B")] == pytest.approx(
            -0.693147, abs=1e-6)
        pred = {r["doc_id"]: r["pred_label"]
                for r in classify.nb_predict(model, test).collect()}
        assert pred == {1: "B", 2: "A"}

    def test_separable_corpus_recovers_labels(self, spark):
        """A vocabulary-disjoint corpus must classify its own training
        split perfectly — an end-to-end sanity pin on the smoothing
        algebra (a sign error or swapped denominator breaks this)."""
        rows = []
        for i in range(30):
            rows.append((i, "spam" if i % 2 else "ham",
                         ("buy now cheap " if i % 2 else
                          "meeting notes agenda ") * (1 + i % 3)))
        df = spark.createDataFrame(rows, "doc_id long, label string, text string")
        model = classify.train_nb(df)
        out = classify.nb_predict(model, df).join(
            df.select("doc_id", "label"), "doc_id")
        bad = out.filter(F.col("pred_label") != F.col("label")).count()
        assert bad == 0

    def test_randomized_against_reference(self, spark):
        """Seeded random labeled corpus vs an independent plain-Python
        posterior (loops + math.log, no shared code): per-(doc, label)
        scores AND argmax labels must agree."""
        import math
        import random
        import re
        rng = random.Random(97)
        vocab = [f"t{i}" for i in range(25)]
        labels = ["a", "b", "c"]
        rows = [(d, rng.choice(labels),
                 " ".join(vocab[rng.randrange(25)]
                          for _ in range(rng.randint(0, 15))))
                for d in range(50)]
        train = [r for r in rows if r[0] % 3 != 0]
        test = [r for r in rows if r[0] % 3 == 0]
        tok = lambda s: [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]
        cnt, n_class, n_docs = {}, {}, {}
        vocab_seen = set()
        for _, lbl, txt in train:
            n_docs[lbl] = n_docs.get(lbl, 0) + 1
            for t in tok(txt):
                cnt[(lbl, t)] = cnt.get((lbl, t), 0) + 1
                n_class[lbl] = n_class.get(lbl, 0) + 1
                vocab_seen.add(t)
        V, total = len(vocab_seen), len(train)
        exp_scores, exp_pred = {}, {}
        for d, _, txt in test:
            toks = tok(txt)
            best = None
            for lbl in sorted(n_docs):
                s = math.log(n_docs[lbl] / total)
                for t in toks:
                    s += math.log(cnt.get((lbl, t), 0) + 1)
                s -= len(toks) * math.log(n_class.get(lbl, 0) + V)
                s = round(s, 6)
                exp_scores[(d, lbl)] = s
                if best is None or s > best[0]:
                    best = (s, lbl)
            exp_pred[d] = best[1]
        df = spark.createDataFrame(rows, "doc_id long, label string, text string")
        model = classify.train_nb(df.filter(F.col("doc_id") % 3 != 0))
        tdf = df.filter(F.col("doc_id") % 3 == 0)
        got_scores = {(r["doc_id"], r["label"]): r["score"]
                      for r in classify.nb_scores(model, tdf).collect()}
        assert set(got_scores) == set(exp_scores)
        for k in exp_scores:
            assert got_scores[k] == pytest.approx(exp_scores[k], abs=2e-6)
        got_pred = {r["doc_id"]: r["pred_label"]
                    for r in classify.nb_predict(model, tdf).collect()}
        assert got_pred == exp_pred


class TestText:
    def test_paragraph_dedup(self, spark):
        """Repeated-boilerplate paragraphs drop corpus-wide; survivors
        reassemble in order; a fully-boilerplate doc keeps its row with
        empty text; within-doc repetition alone never triggers a drop
        (frequency is DISTINCT docs)."""
        bp = "Accept cookies to continue."
        df = spark.createDataFrame([
            (1, f"Unique intro one.\n\n{bp}\n\nUnique body one."),
            (2, f"{bp}\n \nUnique body two."),
            (3, f"Unique three A.\n\n{bp}"),
            (4, bp),                       # fully boilerplate
            (5, "Solo doc.\n\nSolo doc."),  # repeated only WITHIN one doc
            (6, ""),
        ], "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               text.paragraph_dedup(df, max_doc_freq=2).collect()}
        assert out[1]["text"] == "Unique intro one.\n\nUnique body one."
        assert out[1]["n_paras"] == 3 and out[1]["n_kept"] == 2
        assert out[2]["text"] == "Unique body two."
        assert out[3]["text"] == "Unique three A."
        assert out[4]["text"] == "" and out[4]["n_kept"] == 0
        assert out[4]["n_paras"] == 1
        assert out[5]["text"] == "Solo doc.\n\nSolo doc."
        assert out[6]["text"] == "" and out[6]["n_paras"] == 0
        # case/whitespace variants of the boilerplate normalize together
        df2 = spark.createDataFrame([
            (1, "ACCEPT   cookies to continue.\n\nKeep me."),
            (2, "accept cookies  to continue."),
            (3, "Accept cookies to continue.\n\nAlso keep."),
        ], "doc_id long, text string")
        out2 = {r["doc_id"]: r["text"] for r in
                text.paragraph_dedup(df2, max_doc_freq=2).collect()}
        assert out2 == {1: "Keep me.", 2: "", 3: "Also keep."}

    def test_token_count(self, spark):
        df = spark.createDataFrame(
            [(1, "one two three"), (2, ""), (3, "   "), (4, "single")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["n"] for r in
               df.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()}
        assert got == {1: 3, 2: 0, 3: 0, 4: 1}

    def test_fingerprint_normalizes(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello   World"), (2, "hello world")], "doc_id long, text string")
        fps = [r["fp"] for r in
               df.select(text.fingerprint(F.col("text")).alias("fp")).collect()]
        assert fps[0] == fps[1]

    def test_language_id(self, spark):
        df = spark.createDataFrame([
            (1, "the cat sat on the mat and it was happy"),
            (2, "der Hund ist nicht mit der Katze und die Maus"),
            (3, "le chat est dans la maison et les oiseaux"),
            (4, "el perro y el gato en la casa es grande"),
            (5, "xyzzy plugh qwerty"),
        ], "doc_id long, text string")
        got = {r["doc_id"]: r["lang"] for r in
               df.select("doc_id", text.language_id(F.col("text")).alias("lang")).collect()}
        assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}

    def test_quality_ranges(self, documents):
        rows = text.analyze_documents(documents).collect()
        assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
        assert all(r["n_tokens"] > 0 for r in rows)

    def test_word_ngrams(self, spark):
        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "x y"), (3, "")], "doc_id long, text string")
        got = {r["doc_id"]: r["g"] for r in df.select(
            "doc_id", text.word_ngrams(F.col("text"), 3).alias("g")).collect()}
        assert got == {1: ["a b c", "b c d"], 2: [], 3: []}

    def test_repetition_stats_golden(self, spark):
        # "a b a b a b c": 2-grams [ab, ba, ab, ba, ab, bc] → top "a b" ×3
        df = spark.createDataFrame(
            [(1, "a b a b a b c")], "doc_id long, text string")
        r = text.repetition_stats(df).collect()[0]
        assert (r["n_tokens"], r["n_grams2"], r["n_distinct_grams2"],
                r["top2_count"]) == (7, 6, 3, 3)
        assert (r["n_grams5"], r["n_distinct_grams5"]) == (3, 3)

    def test_contamination_counts_shared_grams(self, spark):
        corpus = spark.createDataFrame([
            (1, "one two three four five six"),   # shares 4-grams 1-4, 2-5, 3-6
            (2, "totally disjoint words here now"),
        ], "doc_id long, text string")
        bench = spark.createDataFrame(
            [(9, "one two three four five six")], "doc_id long, text string")
        got = {r["doc_id"]: r["n_contaminated_grams"]
               for r in text.contamination(corpus, bench, n=4).collect()}
        assert got == {1: 3}

    def test_chunk_documents_golden(self, spark):
        df = spark.createDataFrame(
            [(1, "abcdefghij"), (2, ""), (3, "xy")],
            "doc_id long, text string")
        got = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in
               text.chunk_documents(df, chunk_chars=4, overlap_chars=2)
               .collect()}
        # step=2, starts bounded by len-overlap-1=7: 0,2,4,6 — the start
        # at 8 would give 'ij', fully contained in 'ghij', and is dropped
        assert got == {(1, 0): "abcd", (1, 1): "cdef", (1, 2): "efgh",
                       (1, 3): "ghij",
                       (2, 0): "", (3, 0): "xy"}
        with pytest.raises(ValueError, match="overlap"):
            text.chunk_documents(df, chunk_chars=4, overlap_chars=4)

    def test_chunk_documents_coverage_invariant(self, spark, documents):
        """Every document reconstructs exactly from its chunks: chunk i
        overlaps its successor by exactly overlap_chars, the first chunk
        starts at 0, and concatenating each chunk minus the overlap
        yields the original text — for arbitrary real corpus lengths."""
        chunk, overlap = 96, 32
        rows = (text.chunk_documents(documents, chunk_chars=chunk,
                                     overlap_chars=overlap)
                .groupBy("doc_id")
                .agg(F.sort_array(F.collect_list(
                    F.struct("chunk_idx", "chunk_text"))).alias("cs"))
                .collect())
        orig = {r["doc_id"]: r["text"] for r in documents.collect()}
        assert len(rows) == len(orig)
        step = chunk - overlap
        for r in rows:
            parts = [c["chunk_text"] for c in r["cs"]]
            rebuilt = parts[0] + "".join(p[overlap:] for p in parts[1:])
            assert rebuilt == orig[r["doc_id"]]
            # all but the last chunk are full-width
            assert all(len(p) == chunk for p in parts[:-1])

    def test_token_frequency_stats_golden(self, spark):
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "b c")], "doc_id long, text string")
        # corpus freqs: a=2, b=2, c=1
        got = {r["doc_id"]: (r["n_tokens"], r["sum_freq"], r["min_freq"])
               for r in text.token_frequency_stats(df).collect()}
        assert got == {1: (3, 6, 2), 2: (2, 3, 1)}
        # external freq source: OOV tokens count 0 and floor min_freq
        ref = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
        got2 = {r["doc_id"]: (r["n_tokens"], r["sum_freq"], r["min_freq"])
                for r in text.token_frequency_stats(df, freq_source=ref)
                .collect()}
        assert got2 == {1: (3, 3, 1), 2: (2, 1, 0)}

    def test_token_frequency_vocab_broadcast_gate(self, spark):
        """VERDICT r05/r06 scale-killer: the vocabulary broadcast must be
        size-gated. A vocab over the gate must carry NO broadcast hint
        (AQE chooses — shuffled hash join at real scale); a vocab under
        the gate keeps the hint. Asserted on the analyzed logical plan:
        the executed plan of a tiny test join is broadcast either way."""
        from pyspark.sql import functions as F

        docs = spark.range(40).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("tok"), F.col("id").cast("string"),
                     F.lit(" shared")).alias("text"))

        def analyzed(df):
            return df._jdf.queryExecution().analyzed().toString()

        over = text.token_frequency_stats(docs, broadcast_max_vocab=5)
        assert "ResolvedHint" not in analyzed(over), \
            "vocab over the gate must not be broadcast-hinted"
        under = text.token_frequency_stats(docs, broadcast_max_vocab=10_000)
        assert "ResolvedHint" in analyzed(under), \
            "bounded vocab should keep the broadcast hint"
        # results identical on both paths
        a = {tuple(r) for r in over.collect()}
        b = {tuple(r) for r in under.collect()}
        assert a == b and len(a) == 40

    def test_pii_redaction_and_counts(self, spark):
        df = spark.createDataFrame([
            (1, "mail bob.smith+x@ex-a.co.uk from 10.0.3.7 ssn 123-45-6789 end"),
            (2, "clean text, no pii at all"),
        ], "doc_id long, text string")
        rows = {r["doc_id"]: r for r in df.select(
            "doc_id", *text.pii_counts(F.col("text")),
            text.redact_pii(F.col("text")).alias("red")).collect()}
        assert rows[1]["red"] == "mail <EMAIL> from <IP> ssn <SSN> end"
        assert (rows[1]["n_email"], rows[1]["n_ssn"], rows[1]["n_ipv4"]) == (1, 1, 1)
        assert rows[2]["red"] == "clean text, no pii at all"
        assert (rows[2]["n_email"], rows[2]["n_ssn"], rows[2]["n_ipv4"]) == (0, 0, 0)


class TestMultimodal:
    @pytest.fixture()
    def media(self, spark, documents):
        return documents.limit(20).select(
            F.col("doc_id").alias("media_id"),
            F.encode("text", "utf-8").alias("payload"))

    def test_metadata_jvm_side(self, media):
        out = multimodal.with_media_metadata(media)
        r = out.first()
        assert r["byte_size"] > 0
        assert len(r["content_sha256"]) == 64
        assert r["sniffed_mime"] == "application/octet-stream"

    def test_magic_sniff(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"\xff\xd8\xff\xe0rest")),
             (2, bytearray(b"\x89PNG\r\n")),
             (3, bytearray(b"RIFFxxxx"))],
            "media_id long, payload binary")
        got = {r["media_id"]: r["sniffed_mime"]
               for r in multimodal.with_media_metadata(df).collect()}
        assert got == {1: "image/jpeg", 2: "image/png", 3: "audio/wav"}

    def test_decode_stub_raises_without_fake(self, media):
        with pytest.raises(Exception):
            multimodal.decode_images(media, fake=False).collect()

    def test_fake_decode_deterministic(self, media):
        a = multimodal.decode_images(media, fake=True).orderBy("media_id").collect()
        b = multimodal.decode_images(media, fake=True).orderBy("media_id").collect()
        assert [(r["media_id"], r["width"], r["height"]) for r in a] == \
            [(r["media_id"], r["width"], r["height"]) for r in b]

    def test_frame_sampling_shape(self, media):
        out = multimodal.sample_frames(media, fake=True)
        assert out.filter(F.col("frame_idx") < 0).count() == 0
        per = out.groupBy("media_id").count()
        assert per.filter((F.col("count") < 1) | (F.col("count") > 5)).count() == 0


class TestStreaming:
    def test_windowed_agg_matches_batch(self, spark, tmp_loc):
        import os

        from iceberg_cpp_spark.streaming.incremental import stream_events

        # bounded file stream: copy events to a stage dir, normalizing ts
        # to TIMESTAMP whether the parquet stores ns (read as long under
        # nanosAsLong) or µs (read as NTZ when inference is on)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        dt = dict(ev.dtypes)["ts"]
        if dt == "bigint":
            ev = ev.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
        elif dt == "timestamp_ntz":
            ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
        src = os.path.join(tmp_loc, "events_src")
        ev.write.parquet(src)
        schema = spark.read.parquet(src).schema

        sdf = stream_events(spark, src, schema, window="1 hour", watermark="2 hours")
        q = (sdf.writeStream.format("memory").queryName("evagg")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = spark.sql("select count(*) as n, sum(n_events) as tot from evagg").first()
        batch = ev.groupBy(F.window("ts", "1 hour"), "event_type").count()
        assert got["n"] == batch.count()
        assert got["tot"] == ev.count()


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        from iceberg_cpp_spark.operators.dedup import (
            connected_components, transitive_dedup)

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long")
        comps = {r["id"]: r["comp"]
                 for r in connected_components(pairs).collect()}
        assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

        docs = spark.createDataFrame(
            [(i,) for i in [1, 2, 3, 4, 5, 10, 11]], "doc_id long")
        kept = sorted(r["doc_id"]
                      for r in transitive_dedup(docs, pairs).collect())
        assert kept == [1, 5, 10]

    def test_empty_pairs(self, spark):
        from iceberg_cpp_spark.operators.dedup import transitive_dedup

        docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        assert transitive_dedup(docs, pairs).count() == 2


class TestKMeans:
    def test_clusters_cover_all_rows(self, spark, embeddings):
        from iceberg_cpp_spark.operators.similarity import kmeans_clusters

        cl = kmeans_clusters(embeddings, k=5)
        assert cl.count() == embeddings.count()
        ks = {r["cluster"] for r in cl.select("cluster").distinct().collect()}
        assert ks <= set(range(5)) and len(ks) >= 2
        # deterministic under a fixed seed
        cl2 = kmeans_clusters(embeddings, k=5)
        assert cl.subtract(cl2).count() == 0


class TestSampling:
    def test_pack_sequences_layout(self, spark):
        """Concat-and-split invariants + an independent python mirror of
        the BUCKETED cumulative layout (VERDICT r06 task 3)."""
        import hashlib
        import math

        from iceberg_cpp_spark.operators import sampling, text as tx

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with_tokens = docs.select(
            "doc_id", tx.token_count(F.col("text")).cast("long").alias("n_tokens"))
        out = sampling.pack_sequences(with_tokens, seq_len=256).collect()
        rows = {r["doc_id"]: r for r in out}
        # independent mirror: same md5-interval ordering, hash-prefix
        # buckets, per-bucket cumsum + contiguous pack-id offsets
        units = {d: int(hashlib.md5(f"pack|{d}".encode()).hexdigest()[:8], 16)
                 / 2**32 for d in rows}
        buckets: dict[int, list] = {}
        for d in rows:
            buckets.setdefault(int(units[d] * 64), []).append(d)
        base = 0
        for b in sorted(buckets):
            cum, le_max = 0, 0
            for d in sorted(buckets[b], key=lambda d: (units[d], d)):
                r = rows[d]
                assert r["_bucket"] == b
                assert r["_pack"] == base + cum // 256
                assert r["_offset"] == cum % 256
                cum += r["n_tokens"]
                le = (max(cum, cum - r["n_tokens"] + 1) - 1) // 256
                le_max = max(le_max, le)
                assert r["_end_pack"] == base + le
            # a bucket reserves exactly the packs its docs occupy
            # (ADVICE r07 fix; == ceil except the trailing-zero-doc case)
            base += le_max + 1
            assert le_max + 1 >= math.ceil(cum / 256)
        # pack ids are globally contiguous: every id in [0, base) is used
        used = {p for r in out for p in range(r["_pack"], r["_end_pack"] + 1)}
        assert used == set(range(base))
        # stability under repartitioning (the randomSplit failure mode)
        out2 = sampling.pack_sequences(
            with_tokens.repartition(7), seq_len=256).collect()
        assert {(r["doc_id"], r["_pack"], r["_offset"]) for r in out2} \
            == {(r["doc_id"], r["_pack"], r["_offset"]) for r in out}

    def test_pack_sequences_trailing_zero_doc_no_collision(self, spark):
        """ADVICE r07: a zero-token doc LAST in a bucket whose token
        total is an exact multiple of seq_len sits on pack sum/seq_len —
        ceil-based bucket sizing did not reserve it, colliding with the
        next bucket's first pack. Craft exactly that shape and assert
        every pack id belongs to one bucket only."""
        import hashlib

        from iceberg_cpp_spark.operators import sampling

        ids = list(range(400))
        units = {d: int(hashlib.md5(f"pack|{d}".encode()).hexdigest()[:8], 16)
                 / 2**32 for d in ids}
        buckets: dict[int, list] = {}
        for d in ids:
            buckets.setdefault(int(units[d] * 4), []).append(d)
        seq_len = 128
        tokens = {}
        for b, ds in buckets.items():
            ordered = sorted(ds, key=lambda d: (units[d], d))
            *body, last = ordered
            tokens[last] = 0  # trailing zero-token doc
            for d in body:
                tokens[d] = 1
            # pad the first body doc so the bucket totals 2*seq_len exactly
            if body:
                tokens[body[0]] = 2 * seq_len - (len(body) - 1)
        df = spark.createDataFrame(
            [(d, tokens[d]) for d in ids], "doc_id long, n_tokens long")
        out = sampling.pack_sequences(df, seq_len=seq_len,
                                      num_buckets=4).collect()
        owner: dict[int, int] = {}
        for r in out:
            for p in range(r["_pack"], r["_end_pack"] + 1):
                assert owner.setdefault(p, r["_bucket"]) == r["_bucket"], \
                    f"pack {p} shared by buckets {owner[p]} and {r['_bucket']}"
        # still globally contiguous from 0
        assert set(owner) == set(range(max(owner) + 1))
        # the trailing zero-token doc occupies the reserved extra pack
        zero_rows = [r for r in out if r["n_tokens"] == 0]
        assert zero_rows and all(r["_pack"] == r["_end_pack"] for r in zero_rows)

    def test_pack_sequences_window_is_partitioned(self, spark):
        """The 100 TB scale fix: the cumsum window must be PARTITIONED by
        _bucket — a global Window.orderBy serializes the corpus into one
        task. Asserted on the executed plan."""
        from iceberg_cpp_spark.operators import sampling

        df = spark.range(100).select(
            F.col("id").alias("doc_id"), (F.col("id") % 37).alias("n_tokens"))
        out = sampling.pack_sequences(df, seq_len=64)
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert specs, f"no window in plan:\n{plan}"
        # every corpus-sized window spec is partitioned by _bucket; the
        # only unpartitioned window allowed is the num_buckets-row
        # pack-offset prefix sum (its spec orders by _bucket directly)
        for s in specs:
            assert "_bucket" in s.split(",")[0], \
                f"unpartitioned corpus window: {s}"

    def test_pack_sequences_edges(self, spark):
        from iceberg_cpp_spark.operators import sampling

        df = spark.createDataFrame(
            [(1, 0), (2, 700), (3, 12)], "doc_id long, n_tokens long")
        # num_buckets=1 == the global layout: exact end-to-end invariants
        out = {r["doc_id"]: r for r in
               sampling.pack_sequences(df, seq_len=512, num_buckets=1).collect()}
        # zero-token doc occupies no span: end pack == start pack
        assert out[1]["_end_pack"] == out[1]["_pack"]
        # oversized doc straddles exactly ceil(700/512) - aligned packs
        big = out[2]
        assert big["_end_pack"] >= big["_pack"]
        total = sum(r["n_tokens"] for r in out.values())
        assert max(r["_end_pack"] for r in out.values()) == (total - 1) // 512
        # bucketed: an all-zero-token corpus still assigns one pack per
        # occupied bucket — no cross-bucket pack-id collision
        z = spark.createDataFrame(
            [(i, 0) for i in range(20)], "doc_id long, n_tokens long")
        zrows = sampling.pack_sequences(z, seq_len=512, num_buckets=8).collect()
        by_bucket = {}
        for r in zrows:
            assert r["_pack"] == r["_end_pack"] and r["_offset"] == 0
            by_bucket.setdefault(r["_bucket"], set()).add(r["_pack"])
        packs = [next(iter(v)) for v in by_bucket.values()]
        assert all(len(v) == 1 for v in by_bucket.values())
        assert len(set(packs)) == len(packs), "pack ids collide across buckets"
        with pytest.raises(ValueError, match="seq_len"):
            sampling.pack_sequences(df, seq_len=0)
        with pytest.raises(ValueError, match="num_buckets"):
            sampling.pack_sequences(df, seq_len=512, num_buckets=0)

    def test_stable_under_repartition(self, spark):
        from iceberg_cpp_spark.operators import sampling

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(r["doc_id"] for r in
                   sampling.hash_sample(docs, 0.3).select("doc_id").collect())
        b = sorted(r["doc_id"] for r in
                   sampling.hash_sample(docs.repartition(13), 0.3)
                   .select("doc_id").collect())
        assert a == b and 0 < len(a) < 500

    def test_superset_idempotency(self, spark):
        """rows kept from a subset are exactly the kept-subset of the
        full corpus — the property Spark's sample() lacks."""
        from iceberg_cpp_spark.operators import sampling

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        part = docs.filter("doc_id < 250")
        kept_full = {r["doc_id"] for r in
                     sampling.hash_sample(docs, 0.4).select("doc_id").collect()}
        kept_part = {r["doc_id"] for r in
                     sampling.hash_sample(part, 0.4).select("doc_id").collect()}
        assert kept_part == {i for i in kept_full if i < 250}

    def test_split_exhaustive_and_stable(self, spark):
        from iceberg_cpp_spark.operators import sampling

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = sampling.split(docs, [0.8, 0.1, 0.1]).select("doc_id", "_split")
        rows = {r["doc_id"]: r["_split"] for r in out.collect()}
        assert len(rows) == 500
        assert set(rows.values()) == {"train", "valid", "test"}
        # growing the corpus never migrates an existing row
        sub = sampling.split(docs.filter("doc_id < 100"), [0.8, 0.1, 0.1])
        for r in sub.collect():
            assert rows[r["doc_id"]] == r["_split"]

    def test_weighted_mix(self, spark):
        from iceberg_cpp_spark.operators import sampling

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = docs.filter("doc_id < 250")
        b = docs.filter("doc_id >= 250")
        out = sampling.weighted_mix([a, b], [1.0, 0.2])
        n_a = out.filter("doc_id < 250").count()
        n_b = out.filter("doc_id >= 250").count()
        assert n_a == 250          # weight 1.0 keeps everything
        assert 10 <= n_b <= 120    # ~20% of 250

    def test_bad_args(self, spark):
        import pytest as _pt

        from iceberg_cpp_spark.operators import sampling

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        with _pt.raises(ValueError):
            sampling.hash_sample(docs, 1.5)
        with _pt.raises(ValueError):
            sampling.weighted_mix([docs], [0.5, 0.5])


class TestSpanScrub:
    """duplicate_span_scrub vs an independent plain-Python ExactSubstr
    reference (dict-counted window hashes, no shared code)."""

    @staticmethod
    def _reference(corpus, window):
        import hashlib

        toks = {d: (t.strip().lower().split() if t.strip() else [])
                for d, t in corpus}
        counts = {}
        for ws in toks.values():
            for i in range(len(ws) - window + 1):
                h = hashlib.md5(" ".join(ws[i:i + window]).encode()).hexdigest()
                counts[h] = counts.get(h, 0) + 1
        out = {}
        for d, ws in toks.items():
            dead = set()
            for i in range(len(ws) - window + 1):
                h = hashlib.md5(" ".join(ws[i:i + window]).encode()).hexdigest()
                if counts[h] > 1:
                    dead.update(range(i, i + window))
            kept = [w for i, w in enumerate(ws) if i not in dead]
            out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
        return out

    def _check(self, spark, corpus, window):
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["scrubbed"])
               for r in text.duplicate_span_scrub(df, window=window).collect()}
        exp = self._reference(corpus, window)
        assert got == exp

    def test_cross_doc_and_within_doc_repeats(self, spark):
        shared = "one two three four"
        corpus = [
            (1, f"intro {shared} tail words here"),
            (2, f"other head {shared} closing"),
            (3, "unique text that repeats nothing at all today"),
            (4, "loop loop loop loop loop loop loop loop loop"),  # self-repeat
            (5, "short doc"),   # below window -> untouched
            (6, ""),            # empty -> empty scrubbed
        ]
        self._check(spark, corpus, window=4)
        # and the specific semantics: doc 3 untouched, doc 5 untouched
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {r["doc_id"]: r for r in
               text.duplicate_span_scrub(df, window=4).collect()}
        assert got[3]["n_removed"] == 0
        assert got[5]["scrubbed"] == "short doc"
        assert got[6]["scrubbed"] == "" and got[6]["n_tokens"] == 0
        assert got[4]["n_removed"] == 9  # fully self-repeating
        assert shared not in got[1]["scrubbed"]
        assert shared not in got[2]["scrubbed"]

    def test_window_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="window must be"):
            text.duplicate_span_scrub(df, window=1)

    def test_randomized_against_reference(self, spark):
        import random

        rng = random.Random(20260815)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> real repeats
        corpus = [(d, " ".join(rng.choice(vocab)
                               for _ in range(rng.randint(0, 25))))
                  for d in range(40)]
        self._check(spark, corpus, window=3)


class TestBm25PersistedIndex:
    """Bm25Index (VERDICT r10 task 7): persisted postings/doclens
    IceTables; search must equal the one-shot bm25_topk exactly
    (rounded scores, ranks), incrementally-built indexes must equal
    built-at-once ones, and replayed batches must not double-count."""

    CORPUS = [
        (1, "spark shuffles data across the cluster"),
        (2, "the cluster scales spark jobs; spark spark"),
        (3, "quantum cats purr loudly"),
        (4, "data data data everywhere and not a byte to keep"),
        (5, "loudly the jobs hum across data centers"),
        (6, ""),
    ]
    QUERIES = [(10, "spark data cluster"), (11, "loudly purr"),
               (12, "zz_nomatch")]

    def _dfs(self, spark):
        return (spark.createDataFrame(self.CORPUS,
                                      "doc_id long, text string"),
                spark.createDataFrame(self.QUERIES,
                                      "query_id long, query_text string"))

    @staticmethod
    def _rows(df):
        return sorted(tuple(r) for r in df.collect())

    def test_search_equals_one_shot(self, spark, tmp_loc):
        cdf, qdf = self._dfs(spark)
        idx = retrieval.build_bm25_index(spark, f"{tmp_loc}/idx", cdf)
        got = self._rows(idx.search(qdf, k=3))
        want = self._rows(retrieval.bm25_topk(cdf, qdf, k=3))
        assert got == want and got

    def test_incremental_equals_full_and_replay_noop(self, spark, tmp_loc):
        cdf, qdf = self._dfs(spark)
        first = spark.createDataFrame(self.CORPUS[:3],
                                      "doc_id long, text string")
        second = spark.createDataFrame(self.CORPUS[3:],
                                       "doc_id long, text string")
        idx = retrieval.Bm25Index.build(spark, f"{tmp_loc}/idx", first)
        idx = idx.add(second)
        want = self._rows(retrieval.bm25_topk(cdf, qdf, k=3))
        assert self._rows(idx.search(qdf, k=3)) == want
        # replay: adding the same batch again must be a no-op
        idx = idx.add(second)
        assert idx.doclens.to_df().count() == len(self.CORPUS)
        assert self._rows(idx.search(qdf, k=3)) == want

    def test_load_roundtrip(self, spark, tmp_loc):
        cdf, qdf = self._dfs(spark)
        retrieval.build_bm25_index(spark, f"{tmp_loc}/idx", cdf)
        idx = retrieval.Bm25Index.load(spark, f"{tmp_loc}/idx")
        assert self._rows(idx.search(qdf, k=3)) == \
            self._rows(retrieval.bm25_topk(cdf, qdf, k=3))

    def test_token_bounds_prune_postings(self, spark, tmp_loc):
        """The point of persisting: a query's postings scan plans only
        the files whose token range can match."""
        from iceberg_cpp_spark.plans import expressions as ex

        # two disjoint vocabularies, indexed as two appends → files
        # with disjoint token bounds
        a = spark.createDataFrame(
            [(i, f"aaa{i % 3} alpha") for i in range(20)],
            "doc_id long, text string")
        z = spark.createDataFrame(
            [(100 + i, f"zzz{i % 3} zulu") for i in range(20)],
            "doc_id long, text string")
        idx = retrieval.Bm25Index.build(spark, f"{tmp_loc}/idx", a,
                                        buckets=1)
        idx = idx.add(z, buckets=1)
        all_files = list(idx.postings.scan().plan_files())
        pruned = list(idx.postings.scan(
            filter=ex.in_(ex.Reference("token"), ["zulu"])).plan_files())
        assert len(pruned) < len(all_files)
        qdf = spark.createDataFrame([(1, "zulu")],
                                    "query_id long, query_text string")
        hits = idx.search(qdf, k=50).collect()
        assert {r["doc_id"] for r in hits} == {100 + i for i in range(20)}

    def test_torn_add_replay_is_harmless(self, spark, tmp_loc):
        """Crash-between-appends simulation: postings landed but
        doclens did not, then the batch replays. The duplicate postings
        rows must not change any score (search dedups per
        (token, doc_id) with MAX)."""
        cdf, qdf = self._dfs(spark)
        first = spark.createDataFrame(self.CORPUS[:3],
                                      "doc_id long, text string")
        second = spark.createDataFrame(self.CORPUS[3:],
                                       "doc_id long, text string")
        idx = retrieval.Bm25Index.build(spark, f"{tmp_loc}/idx", first)
        # torn add: append the postings of `second` WITHOUT doclens
        docs = second.select("doc_id", "text")
        from iceberg_cpp_spark.operators.retrieval import _tokens
        tf = (docs.select("doc_id",
                          F.explode(_tokens(F.col("text"))).alias("token"))
              .groupBy("doc_id", "token").agg(F.count("*").alias("tf")))
        idx.postings = idx.postings.append(
            tf.select("token", "doc_id", "tf"))
        # replay the full batch — anti-join sees no doclens rows, so
        # postings duplicate exactly
        idx = idx.add(second)
        want = self._rows(retrieval.bm25_topk(cdf, qdf, k=3))
        assert self._rows(idx.search(qdf, k=3)) == want

    def test_remove_equals_one_shot_on_reduced_corpus(self, spark,
                                                      tmp_loc):
        """Document deletion (VERDICT r12 task 6): equality deletes on
        both tables shrink N/avgdl/df exactly — search-after-remove
        equals a one-shot bm25_topk over the reduced corpus; replaying
        the remove is a no-op; a removed id can be re-indexed."""
        cdf, qdf = self._dfs(spark)
        idx = retrieval.build_bm25_index(spark, f"{tmp_loc}/idx", cdf)
        gone = spark.createDataFrame([(2,), (4,)], "doc_id long")
        idx = idx.remove(gone)
        reduced = spark.createDataFrame(
            [r for r in self.CORPUS if r[0] not in (2, 4)],
            "doc_id long, text string")
        want = self._rows(retrieval.bm25_topk(reduced, qdf, k=3))
        assert self._rows(idx.search(qdf, k=3)) == want
        assert idx.doclens.to_df().count() == len(self.CORPUS) - 2
        # replay-idempotent
        idx = idx.remove(gone)
        assert self._rows(idx.search(qdf, k=3)) == want
        # a removed doc re-indexes (the doclens replay gate sees it gone)
        idx = idx.add(spark.createDataFrame([self.CORPUS[1]],
                                            "doc_id long, text string"))
        full = self._rows(retrieval.bm25_topk(
            spark.createDataFrame(
                [r for r in self.CORPUS if r[0] != 4],
                "doc_id long, text string"), qdf, k=3))
        assert self._rows(idx.search(qdf, k=3)) == full

    def test_torn_remove_never_surfaces_removed_doc(self, spark, tmp_loc):
        """Crash between the two delete commits: doclens row gone,
        postings rows still live. The removed doc must not appear in
        results (scoring inner-joins doclens) and the replayed remove
        converges to the reduced-corpus scores."""
        cdf, qdf = self._dfs(spark)
        idx = retrieval.build_bm25_index(spark, f"{tmp_loc}/idx", cdf)
        gone = spark.createDataFrame([(1,)], "doc_id long")
        # torn: only the doclens leg of remove() ran
        idx.doclens = idx.doclens.delete_by_keys(gone)
        assert not any(
            r["doc_id"] == 1 for r in idx.search(qdf, k=10).collect())
        idx = idx.remove(gone)  # replay converges
        reduced = spark.createDataFrame(
            [r for r in self.CORPUS if r[0] != 1],
            "doc_id long, text string")
        assert (self._rows(idx.search(qdf, k=3))
                == self._rows(retrieval.bm25_topk(reduced, qdf, k=3)))

    def test_wide_query_set_semi_join_fallback(self, spark, tmp_loc,
                                               monkeypatch):
        """Past MAX_SCAN_PUSHDOWN_TOKENS the search keeps the full-scan
        semi-join instead of the IN pushdown — results identical."""
        from iceberg_cpp_spark.operators import retrieval as rt

        cdf, qdf = self._dfs(spark)
        idx = rt.build_bm25_index(spark, f"{tmp_loc}/idx", cdf)
        want = self._rows(idx.search(qdf, k=3))
        monkeypatch.setattr(rt, "MAX_SCAN_PUSHDOWN_TOKENS", 2)
        assert self._rows(idx.search(qdf, k=3)) == want


class TestBm25SummaryStats:
    """r14: N/avgdl ride the doclens snapshot summary (O(1) at search
    time). The stamped values must equal the aggregate exactly through
    add AND remove, and a summary-less doclens (foreign append) must
    fall back to the aggregate with identical scores."""

    def _mk(self, spark, tmp_loc):
        corpus = spark.createDataFrame(
            TestBm25PersistedIndex.CORPUS, "doc_id long, text string")
        return retrieval.build_bm25_index(spark, f"{tmp_loc}/idx", corpus)

    def test_summary_tracks_aggregate(self, spark, tmp_loc):
        from pyspark.sql import functions as F

        idx = self._mk(spark, tmp_loc)

        def agg_pair(i):
            r = (i.doclens.to_df()
                 .agg(F.count("*").alias("n"),
                      F.coalesce(F.sum("dl"), F.lit(0)).alias("s"))
                 .collect()[0])
            return int(r["n"]), int(r["s"])

        s = idx.doclens.current_snapshot().summary
        assert (int(s["bm25.n-docs"]), int(s["bm25.total-dl"])) \
            == agg_pair(idx) == idx._stats_pair()
        idx = idx.add(spark.createDataFrame(
            [(7, "seven new tokens for the corpus here")],
            "doc_id long, text string"))
        assert idx._stats_pair() == agg_pair(idx)
        idx = idx.remove(spark.createDataFrame([(2,), (4,)],
                                               "doc_id long"))
        s = idx.doclens.current_snapshot().summary
        assert "bm25.n-docs" in s  # extras rode the DELETE commit
        assert idx._stats_pair() == agg_pair(idx)

    def test_foreign_doclens_append_falls_back(self, spark, tmp_loc):
        idx = self._mk(spark, tmp_loc)
        qdf = spark.createDataFrame(TestBm25PersistedIndex.QUERIES,
                                    "query_id long, query_text string")
        # a raw table append WITHOUT the index's write path: the new
        # snapshot's summary has no bm25.* keys
        idx.doclens = idx.doclens.append(spark.createDataFrame(
            [(99, 3)], "doc_id long, dl long"))
        assert "bm25.n-docs" not in (
            idx.doclens.current_snapshot().summary or {})
        # _stats_pair falls back to the exact aggregate (7 docs now)
        n, tot = idx._stats_pair()
        assert n == 7
        # and search still runs correctly off the aggregate path
        got = sorted(tuple(r) for r in idx.search(qdf, k=2).collect())
        assert got  # non-empty, no crash
