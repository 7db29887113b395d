"""Generate oracle fixtures for the LLM-pipeline queries that have no
SQL-expressible oracle (LSH dedup, IVF ANN).

Each fixture is a parquet of EXPECTED outputs computed by an
independent, Spark-free reimplementation of the published algorithm
(numpy + union-find on the driver — feasible at oracle scale, sf<=0.1),
mirroring the seeded spec the engine implements in
iceberg_cpp_spark/operators/{dedup,similarity}.py.  The driver's
correctness gate then compares the Spark output against the fixture via
oracle_sql() — the same pattern as assets/bucket16_l_orderkey.parquet
for the bucket transform.

Coverage: sf0.001 / sf0.01 / sf0.1 ONLY (the gate runs at sf0.01).  Each
row carries ``tag`` = SUM(length(text)) over the documents table of its
sf dir, so one oracle query self-selects the right slice:
  WHERE tag = (SELECT SUM(length(text)) FROM documents)
At any other scale factor the slice is empty and the compare fails
LOUDLY (row-count mismatch) instead of silently passing.

Usage: python scripts/gen_llm_fixtures.py [out_dir]
"""

from __future__ import annotations

import os
import re
import sys
import zlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/assets/llm_oracles"

MERSENNE = (1 << 61) - 1
SEED = 42


# -- minhash (spec: operators/dedup.py minhash_signature_udf) ---------------

def perm_params(num_perm: int):
    rs = np.random.RandomState(SEED)
    a = rs.randint(1, MERSENNE, size=num_perm, dtype=np.int64)
    b = rs.randint(0, MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def shingle_hashes(text: str, width: int) -> np.ndarray:
    words = text.split()
    if len(words) < width:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + width]) for i in range(len(words) - width + 1)]
    return np.unique(np.array(
        [zlib.crc32(g.encode("utf-8")) for g in grams], dtype=np.int64))


def minhash_sigs(texts, num_perm=64, width=3) -> np.ndarray:
    """EXACT (a*x + b) mod p via arbitrary-precision python ints — a
    deliberately different implementation path from the engine's
    vectorized uint64 Mersenne reduction (operators/dedup.py
    _axb_mod_p), so an arithmetic bug on either side fails the gate
    instead of cancelling out (the r4 int64-wrap bug did exactly
    that when both sides shared the numpy expression)."""
    a, b = perm_params(num_perm)
    ai = [int(v) for v in a]
    bi = [int(v) for v in b]
    out = np.empty((len(texts), num_perm), dtype=np.int64)
    for i, t in enumerate(texts):
        xs = [int(v) for v in shingle_hashes(t, width)]
        out[i] = [min((aa * x + bb) % MERSENNE for x in xs)
                  for aa, bb in zip(ai, bi)]
    return out


def band_buckets(ids, sigs, bands: int):
    """{(band, r-tuple) -> sorted member ids}; tuple equality mirrors the
    engine's xxhash64-of-joined-values bucket key (injective mod 2^-64
    collisions)."""
    r = sigs.shape[1] // bands
    buckets: dict[tuple, list[int]] = {}
    for i, did in enumerate(ids):
        for band in range(bands):
            key = (band, tuple(sigs[i, band * r:(band + 1) * r]))
            buckets.setdefault(key, []).append(int(did))
    return buckets


def bucket_min_dups(buckets) -> set[int]:
    dups: set[int] = set()
    for members in buckets.values():
        if len(members) > 1:
            m = min(members)
            dups.update(x for x in members if x != m)
    return dups


# -- exact n-gram jaccard (spec: operators/dedup.py ngram_set) --------------

def ngram_set(text: str, n: int = 3) -> frozenset:
    t = text.lower().strip(" ")  # F.trim strips ASCII spaces
    words = re.split(r"\s+", t)
    grams = {" ".join(words[i:i + n])
             for i in range(0, max(len(words) - n, 0) + 1)}
    return frozenset(grams)


def jaccard(a: frozenset, b: frozenset) -> float:
    u = len(a | b)
    return (len(a & b) / u) if u else 1.0


# -- simhash (spec: operators/dedup.py simhash_udf) -------------------------

def simhash64(t: str, width: int = 2) -> int:
    words = t.lower().split()
    if len(words) < width:
        grams = [" ".join(words)] if words else [""]
    else:
        grams = [" ".join(words[i:i + width]) for i in range(len(words) - width + 1)]
    hs = np.array([zlib.crc32(g.encode()) | (zlib.crc32(g[::-1].encode()) << 32)
                   for g in grams], dtype=np.uint64)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    v = np.where(bits, 1, -1).sum(axis=0)
    h = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
    return h - (1 << 64) if h >= (1 << 63) else h


# -- union-find for transitive dedup ----------------------------------------

class UF:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


# -- jvm-identical cosine (spec: operators/similarity.py dot/l2_norm) -------

def jvm_dot(x, y) -> float:
    acc = 0.0
    for a, b in zip(x, y):
        acc = acc + float(a) * float(b)
    return acc


def jvm_norm(x) -> float:
    acc = 0.0
    for a in x:
        acc = acc + float(a) * float(a)
    return float(np.sqrt(acc))


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = {k: [] for k in ["minhash", "minhash_verified", "simhash",
                            "embedding", "semantic", "transitive", "ivf",
                            "pq", "cross", "bpe", "incremental"]}

    for sf_dir in SF_DIRS:
        docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
        emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas()
        tag = int(docs["text"].str.len().sum())
        ids = docs["doc_id"].to_numpy()
        texts = docs["text"].tolist()
        assert not any(t is None for t in texts)
        print(f"{sf_dir}: tag={tag} docs={len(ids)} emb={len(emb)}")

        # dedup_minhash: num_perm=64, bands=16, no verify
        sigs = minhash_sigs(texts, 64, 3)
        buckets = band_buckets(ids, sigs, 16)
        dups = bucket_min_dups(buckets)
        for d in sorted(set(map(int, ids)) - dups):
            rows["minhash"].append((tag, d))

        # dedup_minhash_verified: same banding, jaccard >= 0.7 confirm
        grams = {int(i): ngram_set(t) for i, t in zip(ids, texts)}
        pairs = set()
        for members in buckets.values():
            if len(members) > 1:
                m = min(members)
                pairs.update((m, x) for x in members if x > m)
        vdrop = {b for a, b in pairs if jaccard(grams[a], grams[b]) >= 0.7}
        for d in sorted(set(map(int, ids)) - vdrop):
            rows["minhash_verified"].append((tag, d))

        # dedup_transitive: same banding -> pairs -> connected components,
        # keep min id per component
        uf = UF()
        for a, b in pairs:
            uf.union(a, b)
        tdrop = {x for x in uf.p if uf.find(x) != x}
        for d in sorted(set(map(int, ids)) - tdrop):
            rows["transitive"].append((tag, d))

        # dedup_incremental: seed corpus = even doc_ids -> batch LSH
        # dedup -> store = survivors' (band, r-tuple) buckets; batch =
        # odd doc_ids, dropped on a store hit OR a smaller odd id in the
        # same bucket (the engine's bucket-min rule); num_perm=64,
        # bands=16 (same banding as dedup_minhash)
        even_ix = [i for i, d in enumerate(ids) if int(d) % 2 == 0]
        odd_ix = [i for i, d in enumerate(ids) if int(d) % 2 == 1]
        old_buckets = band_buckets([int(ids[i]) for i in even_ix],
                                   sigs[even_ix], 16)
        old_survivors = (set(int(ids[i]) for i in even_ix)
                         - bucket_min_dups(old_buckets))
        store_keys = {key for key, members in old_buckets.items()
                      if any(m in old_survivors for m in members)}
        new_buckets = band_buckets([int(ids[i]) for i in odd_ix],
                                   sigs[odd_ix], 16)
        inc_dups = bucket_min_dups(new_buckets)
        for key, members in new_buckets.items():
            if key in store_keys:
                inc_dups.update(members)
        for d in sorted(set(int(ids[i]) for i in odd_ix) - inc_dups):
            rows["incremental"].append((tag, d))

        # dedup_cross_corpus: corpus = odd doc_ids, benchmark = even;
        # same 128-perm/32-band spec AS THE ENGINE (minhash_cross_pairs
        # defaults — NOT the 64-perm sigs computed above for
        # dedup_minhash), bucket-equality join across the two sides,
        # exact 3-gram jaccard >= 0.5 verify. Band keys here are raw
        # signature tuples; the engine xxhashes the same tuples — bucket
        # equality is identical (same argument as band_buckets).
        sigs128 = minhash_sigs(texts, 128, 3)
        even = {int(i) for i in ids if i % 2 == 0}
        cb: dict[tuple, list[int]] = {}
        bb: dict[tuple, list[int]] = {}
        for i, s in zip(ids, sigs128):
            tgt = bb if int(i) in even else cb
            for band in range(32):
                tgt.setdefault((band, tuple(s[band * 4:(band + 1) * 4])),
                               []).append(int(i))
        cross = set()
        for k, members in bb.items():
            for a in cb.get(k, []):
                for b in members:
                    cross.add((a, b))
        for a, b in sorted(cross):
            if jaccard(grams[a], grams[b]) >= 0.5:
                rows["cross"].append((tag, a, b))

        # text_bpe_tokens: num_merges=100, sample = crc32(doc_id)-ordered
        # first 4000 docs. INDEPENDENT implementation: Counter-based
        # training with regex merge application, and SEQUENTIAL in-rank-
        # order encoding (the original Sennrich script's scheme) versus
        # the engine's greedy lowest-rank loop (GPT-2's scheme) — for a
        # trained table the two must agree, so a divergence fails loudly.
        import re
        from collections import Counter

        doc_order = sorted(range(len(ids)),
                           key=lambda i: (zlib.crc32(str(int(ids[i])).encode()),
                                          str(int(ids[i]))))
        sample_texts = [texts[i] for i in doc_order[:4000]]
        wf = Counter(w for t in sample_texts for w in (t or "").lower().split())
        vocab_s = {w: " ".join(list(w) + ["</w>"]) for w in wf}
        bpe_merges = []
        for _ in range(100):
            pc: Counter = Counter()
            for w, s in vocab_s.items():
                syms = s.split(" ")
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += wf[w]
            if not pc:
                break
            best = min(pc, key=lambda p: (-pc[p], p))
            if pc[best] < 2:
                break
            bpe_merges.append(best)
            pat = re.compile(
                r"(?<!\S)" + re.escape(best[0]) + " " + re.escape(best[1])
                + r"(?!\S)")
            vocab_s = {w: pat.sub(best[0] + best[1], s)
                       for w, s in vocab_s.items()}
        enc_cache: dict = {}

        def enc_len(w: str) -> int:
            hit = enc_cache.get(w)
            if hit is None:
                s = " ".join(list(w) + ["</w>"])
                for a, b in bpe_merges:  # sequential in rank order
                    s = re.sub(r"(?<!\S)" + re.escape(a) + " " + re.escape(b)
                               + r"(?!\S)", a + b, s)
                hit = len(s.split(" "))
                enc_cache[w] = hit
            return hit

        for did, t in zip(ids, texts):
            n = sum(enc_len(w) for w in (t or "").lower().split())
            rows["bpe"].append((tag, int(did), n))

        # dedup_simhash: bands=4, 16-bit chunks
        sh = {int(i): simhash64(t) for i, t in zip(ids, texts)}
        sbuckets: dict[tuple, list[int]] = {}
        for did, h in sh.items():
            u = h & ((1 << 64) - 1)
            for band in range(4):
                sbuckets.setdefault((band, (u >> (band * 16)) & 0xFFFF),
                                    []).append(did)
        sdups = bucket_min_dups(sbuckets)
        for d in sorted(set(map(int, ids)) - sdups):
            rows["simhash"].append((tag, d))

        # dedup_embedding: planes=16, threshold=0.98
        vecs = emb["embedding"].tolist()
        vids = emb["vec_id"].to_numpy()
        dim = len(vecs[0])
        H = np.random.RandomState(SEED).normal(size=(16, dim)).astype(np.float64)
        ebuckets: dict[int, list[int]] = {}
        xmap = {}
        for vid, v in zip(vids, vecs):
            x = np.asarray(v, dtype=np.float64)
            xmap[int(vid)] = x
            sig = (H @ x) > 0
            bkt = int(sig.astype(np.uint64) @ (1 << np.arange(16, dtype=np.uint64)))
            ebuckets.setdefault(bkt, []).append(int(vid))
        edups: set[int] = set()
        for members in ebuckets.values():
            if len(members) < 2:
                continue
            mids = np.array(sorted(members))
            M = np.stack([xmap[i] for i in mids])
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            Mn = M / norms[:, None]
            sims = Mn @ Mn.T
            for j in range(1, len(mids)):
                if (sims[j, :j] >= 0.98).any():
                    edups.add(int(mids[j]))
        for d in sorted(set(map(int, vids)) - edups):
            rows["embedding"].append((tag, d))

        # dedup_semantic (deterministic axis-cluster variant):
        # cluster = argmax |dimension| (first max wins, matching Spark's
        # array_position on the first equal element); threshold=0.4 —
        # the synthetic embeddings are random (max pairwise cosine
        # ~0.51), so a "near-dup" threshold prunes nothing; 0.4 yields a
        # non-trivial survivor set at every sf. Identical vectors need
        # no separate collapse — cosine 1.0 within their shared cluster
        # prunes the non-min ids
        cbuckets: dict[int, list[int]] = {}
        for vid, v in zip(vids, vecs):
            a = np.abs(np.asarray(v, dtype=np.float64))
            cbuckets.setdefault(int(np.argmax(a)), []).append(int(vid))
        smdups: set[int] = set()
        for members in cbuckets.values():
            if len(members) < 2:
                continue
            mids = np.array(sorted(members))
            M = np.stack([xmap[i] for i in mids])
            norms = np.linalg.norm(M, axis=1)
            norms[norms == 0] = 1.0
            Mn = M / norms[:, None]
            sims = Mn @ Mn.T
            for j in range(1, len(mids)):
                if (sims[j, :j] >= 0.4).any():
                    smdups.add(int(mids[j]))
        for d in sorted(set(map(int, vids)) - smdups):
            rows["semantic"].append((tag, d))

        # ann_ivf_topk: ncentroids=16, sample_rows=4000, iters=10,
        # nprobe=4, k=5, queries = vec_id < 8. Training sample spec:
        # rows ordered by (crc32(str(vec_id)), str(vec_id)) — the engine
        # computes the same key JVM-side (F.crc32 of the id's decimal
        # string, string tie-break), mirrored here with zlib.crc32.
        order = sorted(range(len(vecs)),
                       key=lambda i: (zlib.crc32(str(int(vids[i])).encode()),
                                      str(int(vids[i]))))
        X = np.stack([np.asarray(vecs[i], dtype=np.float64)
                      for i in order[:min(4000, len(vecs))]])
        rs = np.random.RandomState(SEED)
        C = X[rs.choice(len(X), size=min(16, len(X)), replace=False)]
        for _ in range(10):
            d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(C)):
                m = assign == j
                if m.any():
                    C[j] = X[m].mean(axis=0)
        cell = {int(vid): int(((C - xmap[int(vid)]) ** 2).sum(axis=1).argmin())
                for vid in vids}
        for qid in sorted(v for v in map(int, vids) if v < 8):
            qx = xmap[qid]
            d2 = ((C - qx) ** 2).sum(axis=1)
            probes = set(int(i) for i in np.argsort(d2)[:4])
            qraw = vecs[list(vids).index(qid)]  # float32 values, like Spark
            qn = jvm_norm(qraw)
            scored = []
            for vid in map(int, vids):
                if cell[vid] not in probes:
                    continue
                vraw = vecs[list(vids).index(vid)]
                score = jvm_dot(vraw, qraw) / (jvm_norm(vraw) * qn)
                scored.append((-score, vid))
            scored.sort()
            for rank, (_, vid) in enumerate(scored[:5], start=1):
                rows["ivf"].append((tag, qid, vid, rank))

        # ann_pq_topk: m=8, nbits=4, sample_rows=4000, iters=10, k=5,
        # queries = vec_id < 8. Independent numpy mirror of the PQ spec
        # (same crc32-ordered sample, per-subspace RandomState(SEED+j)
        # k-means, ADC = left-to-right sum of per-subspace LUT entries,
        # rank by (distance asc, vec_id asc)).
        Xs = np.stack([np.asarray(vecs[i], dtype=np.float64)
                       for i in order[:min(4000, len(vecs))]])
        m_sub, nbits = 8, 4
        dsub, ncodes = dim // m_sub, 2 ** nbits
        books = np.empty((m_sub, ncodes, dsub), dtype=np.float64)
        for j in range(m_sub):
            S = Xs[:, j * dsub:(j + 1) * dsub]
            rsj = np.random.RandomState(SEED + j)
            Cj = S[rsj.choice(len(S), size=min(ncodes, len(S)),
                              replace=False)].copy()
            for _ in range(10):
                d2 = ((S[:, None, :] - Cj[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for c in range(len(Cj)):
                    msk = assign == c
                    if msk.any():
                        Cj[c] = S[msk].mean(axis=0)
            books[j, :len(Cj)] = Cj
            if len(Cj) < ncodes:
                books[j, len(Cj):] = Cj[0]
        codes = {}
        for vid in map(int, vids):
            x = xmap[vid]
            codes[vid] = [int(((books[j] - x[j * dsub:(j + 1) * dsub]) ** 2)
                              .sum(axis=1).argmin()) for j in range(m_sub)]
        for qid in sorted(v for v in map(int, vids) if v < 8):
            qx = xmap[qid]
            lut = [((books[j] - qx[j * dsub:(j + 1) * dsub]) ** 2).sum(axis=1)
                   for j in range(m_sub)]
            scored = []
            for vid in map(int, vids):
                dist = 0.0
                for j in range(m_sub):
                    dist += float(lut[j][codes[vid][j]])
                scored.append((dist, vid))
            scored.sort()
            for rank, (_, vid) in enumerate(scored[:5], start=1):
                rows["pq"].append((tag, qid, vid, rank))

    for name, cols in [("minhash", ["tag", "doc_id"]),
                       ("minhash_verified", ["tag", "doc_id"]),
                       ("simhash", ["tag", "doc_id"]),
                       ("transitive", ["tag", "doc_id"]),
                       ("embedding", ["tag", "vec_id"]),
                       ("semantic", ["tag", "vec_id"]),
                       ("ivf", ["tag", "query_id", "vec_id", "rank"]),
                       ("pq", ["tag", "query_id", "vec_id", "rank"]),
                       ("cross", ["tag", "id_a", "id_b"]),
                       ("bpe", ["tag", "doc_id", "n_bpe"]),
                       ("incremental", ["tag", "doc_id"])]:
        df = pd.DataFrame(rows[name], columns=cols).astype("int64")
        path = os.path.join(OUT, f"{name}.parquet")
        df.to_parquet(path, index=False)
        print(f"wrote {path}: {len(df)} rows")


if __name__ == "__main__":
    main()
