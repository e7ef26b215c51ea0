"""Tests for the training-data pipeline operators: dedup (exact, MinHash,
SimHash, Jaccard), similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.pipeline.dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
    word_jaccard_pairs,
)
from ddsketchy_spark.pipeline.similarity import ann_query, cosine_topk, lsh_cosine_topk
from ddsketchy_spark.pipeline.text import (
    exact_fingerprint,
    lang_id,
    quality_scores,
    token_stats,
    winnowing_fingerprints,
)


@pytest.fixture(scope="module")
def docs_with_dups(spark, sf001_dir):
    """documents table + planted exact dups (copies of the first 20) and
    near-dups (one word changed)."""
    base = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    dup = (base.filter("doc_id < 20")
           .withColumn("doc_id", F.col("doc_id") + 100000))
    near = (base.filter("doc_id >= 20 and doc_id < 40")
            .withColumn("doc_id", F.col("doc_id") + 200000)
            .withColumn("text", F.concat(F.col("text"), F.lit(" zzzextra"))))
    return base.unionByName(dup).unionByName(near).cache()


def test_exact_dedup(spark, docs_with_dups):
    groups = exact_dup_groups(docs_with_dups).collect()
    assert len(groups) == 20
    assert all(g["n_docs"] == 2 for g in groups)
    kept = dedup_exact(docs_with_dups)
    n_total = docs_with_dups.count()
    assert kept.count() == n_total - 20
    # representative is the min id (original, not the planted copy)
    assert kept.filter("doc_id >= 100000 and doc_id < 200000").count() == 0


def test_minhash_estimates_jaccard(spark, docs_with_dups):
    pairs = minhash_lsh_pairs(docs_with_dups, num_perm=128, bands=32).collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    # every planted exact dup is a candidate with est_jaccard == 1
    for i in range(20):
        assert (i, i + 100000) in found, i
        assert found[(i, i + 100000)] == 1.0
    # near-dups (one appended word) should mostly surface with high estimate
    near_found = [found.get((i, i + 200000)) for i in range(20, 40)]
    assert sum(v is not None and v > 0.5 for v in near_found) >= 15


def test_minhash_signature_deterministic(spark, docs_with_dups):
    s1 = {r["doc_id"]: tuple(r["sig"]) for r in
          minhash_signatures(docs_with_dups.repartition(7)).collect()}
    s2 = {r["doc_id"]: tuple(r["sig"]) for r in
          minhash_signatures(docs_with_dups.coalesce(1)).collect()}
    assert s1 == s2


def test_signature_law_v2_rederivation(spark, monkeypatch):
    """Pin signature law v2 (round 3): MinHash and SimHash signatures are
    re-derived doc-by-doc in pure Python integer arithmetic — word hashes
    from a plain top-level xxhash64 projection (no lambda, no mapInArrow),
    FNV-poly shingle combine, splitmix64 finalize, per-perm min / bit
    votes — and must match the vectorized engines bit-for-bit, with the
    permutation chunk shrunk to force chunk boundaries mid-batch."""
    import ddsketchy_spark.pipeline.dedup as dd

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "δδδ", "x", "the", "of", "zz9"]
    rows = [(i, " ".join(rng.choice(vocab, size=int(rng.integers(1, 40)))))
            for i in range(30)]
    rows += [(100, ""), (101, "single"), (102, "two words"), (103, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    seed, num_perm, k = 5, 16, 3
    monkeypatch.setattr(dd, "_PERM_CHUNK_SHINGLES", 16)
    monkeypatch.setattr(dd, "_SIMHASH_CHUNK_WORDS", 16)
    got_min = {r["doc_id"]: list(r["sig"]) for r in
               dd.minhash_signatures(df.coalesce(1), num_perm=num_perm,
                                     shingle_k=k, seed=seed).collect()}
    got_sim = {r["doc_id"]: r["simhash"] for r in
               dd.simhash_signatures(df.coalesce(1), seed=seed).collect()}

    # word hashes via an independent plain projection
    wh_rows = (df.where("text IS NOT NULL")
               .select("doc_id", F.posexplode(F.split("text", " ")))
               .select("doc_id", "pos",
                       F.xxhash64(F.col("col"), F.lit(seed)).alias("h"))
               .collect())
    words_of: dict[int, dict[int, int]] = {}
    for r in wh_rows:
        words_of.setdefault(r["doc_id"], {})[r["pos"]] = r["h"]

    MASK = (1 << 64) - 1
    P = 0x100000001B3

    def smix(x, s):
        z = (x + (0x9E3779B97F4A7C15 * (s + 1))) & MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK
        return z ^ (z >> 31)

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    arng = np.random.default_rng(seed)
    A = (arng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.int64) | 1).tolist()
    B = arng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.int64).tolist()

    assert set(got_min) == set(words_of) and 103 not in got_min
    for doc_id, by_pos in words_of.items():
        wh = [by_pos[p] & MASK for p in range(len(by_pos))]
        m = len(wh)
        if m < k:
            windows = [wh]
        else:
            windows = [wh[j:j + k] for j in range(m - k + 1)]
        shingles = []
        for win in windows:
            poly = 0
            for h in win:
                poly = (poly * P + h) & MASK
            shingles.append(signed(smix(poly, seed)))
        exp_sig = [min(signed((A[i] * (s & MASK) + B[i]) & MASK)
                       for s in shingles) for i in range(num_perm)]
        assert got_min[doc_id] == exp_sig, doc_id
        # simhash: majority vote per bit over word-occurrence hashes
        bits = 0
        for b in range(64):
            votes = sum((h >> b) & 1 for h in wh)
            if 2 * votes > m:
                bits |= 1 << b
        assert got_sim[doc_id] == signed(bits), doc_id


def test_shingle_hashes_flat_fuzz():
    """Pure-NumPy fuzz of the batch shingle combiner against a naive
    per-document big-int reference: random doc counts/lengths, k in 1..4
    (k=1 skips the poly loop; many docs shorter than k), exact equality."""
    from ddsketchy_spark.core.hashing import splitmix64
    from ddsketchy_spark.pipeline.dedup import _SHINGLE_POLY, _shingle_hashes_flat

    rng = np.random.default_rng(3)
    MASK = (1 << 64) - 1
    P = int(_SHINGLE_POLY)
    for trial in range(25):
        n = int(rng.integers(1, 30))
        k = int(rng.integers(1, 5))
        seed = int(rng.integers(0, 100))
        lens = rng.integers(1, 12, size=n).astype(np.int64)
        flat = rng.integers(-2**62, 2**62, size=int(lens.sum()), dtype=np.int64)
        got, counts = _shingle_hashes_flat(flat, lens, k, seed)
        exp, off = [], 0
        for L in lens:
            ws = [int(x) & MASK for x in flat[off:off + L]]
            off += L
            wins = [ws] if L < k else [ws[j:j + k] for j in range(L - k + 1)]
            for w in wins:
                poly = 0
                for h in w:
                    poly = (poly * P + h) & MASK
                exp.append(int(splitmix64(
                    np.array([poly], dtype=np.uint64).view(np.int64),
                    seed).view(np.int64)[0]))
        assert got.tolist() == exp, (trial, k)
        assert counts.tolist() == np.maximum(lens - k + 1, 1).tolist()


def test_simhash_near_pairs(spark, docs_with_dups):
    pairs = simhash_near_pairs(docs_with_dups, max_hamming=3).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    for i in range(20):
        assert found.get((i, i + 100000)) == 0, i  # identical docs -> distance 0


def test_simhash_max_block_size(spark):
    """max_block_size drops an identical-doc flood's pairs while ordinary
    duplicate pairs survive (the degenerate-bucket guard, simhash form)."""
    from ddsketchy_spark.pipeline.dedup import simhash_near_pairs

    rows = [(i, "spam spam lorem ipsum dolor sit amet boilerplate")
            for i in range(12)]
    rows += [(100, "a genuinely unique document about owls and rivers"),
             (101, "a genuinely unique document about owls and rivers")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {(r["id_a"], r["id_b"]) for r in
              simhash_near_pairs(docs, max_hamming=3,
                                 max_block_size=5).collect()}
    assert (100, 101) in capped
    assert not any(a < 12 and b < 12 for a, b in capped)
    full = {(r["id_a"], r["id_b"]) for r in
            simhash_near_pairs(docs, max_hamming=3).collect()}
    assert sum(a < 12 and b < 12 for a, b in full) == 66


def test_word_jaccard_exact(spark, docs_with_dups):
    pairs = word_jaccard_pairs(docs_with_dups.filter("doc_id < 200000"),
                               threshold=0.999).collect()
    exact_pairs = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(i, i + 100000) for i in range(20)} <= exact_pairs


def test_word_jaccard_allpairs_parity(spark, docs_with_dups):
    """The prefix-filtered AllPairs join (the scale engine) must produce
    the exact pair set AND jaccard values of the cartesian baseline, at a
    loose threshold (many near pairs, exercises size/prefix filters) and
    at a tight one; NULL text rows never pair under either engine."""
    docs = docs_with_dups.select("doc_id", "text").unionByName(
        spark.createDataFrame([(999_999, None)], "doc_id long, text string"))
    for t in (0.5, 0.999):
        cart = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                word_jaccard_pairs(docs, threshold=t,
                                   method="cartesian").collect()}
        ap = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              word_jaccard_pairs(docs, threshold=t,
                                 method="allpairs").collect()}
        assert set(ap) == set(cart), t
        for k in cart:
            assert ap[k] == cart[k], (t, k)
        assert not any(999_999 in k for k in ap)
    assert len(cart) > 0
    with pytest.raises(ValueError, match="method"):
        word_jaccard_pairs(docs, method="bogus")


def test_cosine_topk_and_lsh(spark, sf001_dir):
    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    exact = cosine_topk(emb, k=3)
    rows = exact.collect()
    n = emb.count()
    assert len(rows) == n * 3
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # self-similarity excluded; cos within [-1, 1]
    for rid, nbrs in by_id.items():
        assert all(r["neighbor"] != rid for r in nbrs)
        assert all(-1.0001 <= r["cos"] <= 1.0001 for r in nbrs)

    approx = lsh_cosine_topk(emb, k=3, n_planes=16, bands=8)
    arows = approx.collect()
    # recall@1: the true nearest neighbor found for most vectors
    true_nn = {r["id"]: r["neighbor"] for r in rows
               if r["cos"] == max(x["cos"] for x in by_id[r["id"]])}
    approx_by_id = {}
    for r in arows:
        approx_by_id.setdefault(r["id"], set()).add(r["neighbor"])
    hits = sum(1 for i, nn in true_nn.items() if nn in approx_by_id.get(i, set()))
    assert hits / len(true_nn) > 0.6, hits / len(true_nn)


def test_dedup_near_text_end_to_end(spark, docs_with_dups):
    """LSH pairs -> connected components -> keep set, through the fully
    distributed verify='local' engine: every planted exact dup is folded
    into its original's cluster (min id kept), near-dups mostly merge too,
    untouched docs keep themselves, one keep per component."""
    from ddsketchy_spark.pipeline.dedup import dedup_near_text

    res = dedup_near_text(docs_with_dups, threshold=0.8, num_perm=128,
                          bands=32, verify="local").cache()
    rows = {r["doc_id"]: r for r in res.collect()}
    assert len(rows) == docs_with_dups.count()
    # exact dup copies always cluster with the original (the corpus itself
    # may contain near-dups among originals, so the component root can be a
    # smaller id than i); the planted copy (id+100000) is never the keeper
    for i in range(20):
        assert rows[i + 100000]["component"] == rows[i]["component"] <= i
        assert not rows[i + 100000]["keep"]
    # near-dups (one appended word, J ~ len/(len+1)) mostly merge at 0.8
    merged = sum(rows[i + 200000]["component"] == rows[i]["component"]
                 for i in range(20, 40))
    assert merged >= 15, merged
    # one keep per component, and keeps == components
    comps = {}
    for r in rows.values():
        comps.setdefault(r["component"], []).append(r["keep"])
    assert all(sum(k) == 1 for k in comps.values())
    res.unpersist()


def test_minhash_lsh_local_parity(spark, docs_with_dups):
    """verify='local' (fully distributed, no broadcast matrix) must produce
    the exact pair set and est_jaccard values of verify='broadcast'."""
    kw = dict(num_perm=64, bands=16)
    bp = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
          minhash_lsh_pairs(docs_with_dups, verify="broadcast", **kw).collect()}
    lp = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
          minhash_lsh_pairs(docs_with_dups, verify="local", **kw).collect()}
    assert bp == lp and len(bp) > 0
    # auto mode falls over to local above the broadcast cap — same result
    ap = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
          minhash_lsh_pairs(docs_with_dups, verify="auto",
                            max_broadcast_rows=10, **kw).collect()}
    assert ap == bp
    # explicit broadcast above the cap still refuses (user asked for it)
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        minhash_lsh_pairs(docs_with_dups, verify="broadcast",
                          max_broadcast_rows=10, **kw)


def test_minhash_lsh_local_sig_broadcast_gate_parity(spark, docs_with_dups):
    """The local engine's gated broadcast signature join-back (r6) must
    produce the exact pair set and est values of the all-shuffle join-back
    (broadcast_docs=None disables the gate; above-gate corpora take the
    same disabled path)."""
    kw = dict(num_perm=64, bands=16, verify="local")
    on = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
          minhash_lsh_pairs(docs_with_dups, **kw).collect()}
    off = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
           minhash_lsh_pairs(docs_with_dups, broadcast_docs=None,
                             **kw).collect()}
    assert on == off and len(on) > 0
    # a gate smaller than the corpus must also take the shuffle path
    low = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
           minhash_lsh_pairs(docs_with_dups, broadcast_docs=3,
                             **kw).collect()}
    assert low == off


def test_minhash_lsh_max_bucket_size(spark):
    """The degenerate-bucket cap drops exactly the oversized buckets'
    pairs, identically in both engines: a 12-doc boilerplate clique is
    gone, an ordinary duplicate pair survives."""
    rows = [(i, "spam spam lorem ipsum dolor sit amet boilerplate")
            for i in range(12)]
    rows += [(100, "a genuinely unique document about owls and rivers"),
             (101, "a genuinely unique document about owls and rivers"),
             (102, "completely unrelated text mentioning quasars instead")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(num_perm=64, bands=16, max_bucket_size=5)
    bp = {(r["id_a"], r["id_b"]) for r in
          minhash_lsh_pairs(docs, verify="broadcast", **kw).collect()}
    lp = {(r["id_a"], r["id_b"]) for r in
          minhash_lsh_pairs(docs, verify="local", **kw).collect()}
    assert bp == lp
    assert (100, 101) in bp                      # small bucket survives
    assert not any(a < 12 and b < 12 for a, b in bp)  # clique dropped
    # without the cap the clique's 66 pairs are all present
    full = {(r["id_a"], r["id_b"]) for r in
            minhash_lsh_pairs(docs, verify="local", num_perm=64,
                              bands=16).collect()}
    assert sum(a < 12 and b < 12 for a, b in full) == 66


def test_lsh_cosine_local_parity(spark, sf001_dir):
    """verify='local' must produce the same top-k rows and cosines as
    verify='broadcast' (identical NumPy signature + scoring math)."""
    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    kw = dict(k=3, n_planes=16, bands=8, dim=64)
    bp = {(r["id"], r["neighbor"]): r["cos"] for r in
          lsh_cosine_topk(emb, verify="broadcast", **kw).collect()}
    lp = {(r["id"], r["neighbor"]): r["cos"] for r in
          lsh_cosine_topk(emb, verify="local", **kw).collect()}
    assert set(bp) == set(lp)
    for key in bp:
        assert bp[key] == pytest.approx(lp[key], abs=1e-12)
    # auto above the cap = local
    ap = {(r["id"], r["neighbor"]) for r in
          lsh_cosine_topk(emb, verify="auto", max_broadcast_rows=10,
                          **kw).collect()}
    assert ap == set(bp)


def test_lsh_cosine_max_bucket_size(spark):
    """The degenerate-bucket cap drops oversized band buckets identically
    in both cosine-LSH engines: a 12-vector identical clique is gone, an
    ordinary duplicate pair survives, uncapped keeps the clique."""
    rows = [(i, [1.0, 2.0, 3.0, 0.5]) for i in range(12)]
    rows += [(100, [-3.0, 1.0, 0.0, 2.0]), (101, [-3.0, 1.0, 0.0, 2.0]),
             (102, [0.2, -5.0, 1.0, 0.1])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kw = dict(k=5, n_planes=16, bands=4, dim=4, max_bucket_size=5)
    bp = {(r["id"], r["neighbor"]) for r in
          lsh_cosine_topk(df, verify="broadcast", **kw).collect()}
    lp = {(r["id"], r["neighbor"]) for r in
          lsh_cosine_topk(df, verify="local", **kw).collect()}
    assert bp == lp
    assert (100, 101) in bp and (101, 100) in bp
    assert not any(a < 12 and b < 12 for a, b in bp)
    full = {(r["id"], r["neighbor"]) for r in
            lsh_cosine_topk(df, verify="local", k=5, n_planes=16, bands=4,
                            dim=4).collect()}
    assert any(a < 12 and b < 12 for a, b in full)


def test_ann_query_batch_exact(spark, sf001_dir):
    """Batched ANN equals per-query exact ann_query for every query, k
    larger than any single Arrow batch's contribution, and ids/cosines
    match bit-for-bit; zero-norm table vectors never win or poison."""
    from ddsketchy_spark.pipeline.similarity import ann_query, ann_query_batch

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    qvecs = [r["embedding"] for r in
             emb.filter("vec_id IN (0, 7, 19)").orderBy("vec_id").collect()]
    batch = ann_query_batch(emb.repartition(5), qvecs, k=8,
                            query_ids=[0, 7, 19]).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    assert set(by_q) == {0, 7, 19}
    for qid, vec in zip([0, 7, 19], qvecs):
        single = [(r["vec_id"], r["cos"]) for r in
                  ann_query(emb, vec, k=8).collect()]
        got = sorted(by_q[qid], key=lambda t: (-t[1], t[0]))
        assert [i for i, _ in got] == [i for i, _ in single], qid
        for (gi, gc), (si, sc) in zip(got, single):
            assert gc == pytest.approx(sc, abs=1e-9), (qid, gi)
    # zero-norm vector present: batch path must not return NaN rows
    withzero = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame([(99_999, [0.0] * 64)],
                              "vec_id long, embedding array<double>"))
    rows = ann_query_batch(withzero, qvecs[:1], k=5).collect()
    assert len(rows) == 5 and all(not np.isnan(r["cos"]) for r in rows)
    assert all(r["vec_id"] != 99_999 for r in rows)
    # fewer valid rows than k: the NaN sentinel (-2.0) must never leak as
    # a "neighbor" — only the real vectors come back
    tiny = emb.select("vec_id", "embedding").limit(2).unionByName(
        spark.createDataFrame([(99_999, [0.0] * 64)],
                              "vec_id long, embedding array<double>"))
    trows = ann_query_batch(tiny, qvecs[:1], k=5).collect()
    assert len(trows) == 2, trows
    assert all(r["vec_id"] != 99_999 and r["cos"] >= -1.0001 for r in trows)


def test_ivf_sample_trained(spark, sf001_dir):
    """IVF trains on a bounded deterministic sample: recall holds even when
    train_rows is far below the table size, and results stay deterministic
    across partitionings."""
    from ddsketchy_spark.pipeline.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    exact = cosine_topk(emb, k=1)
    true_nn = {r["id"]: r["neighbor"] for r in exact.collect()}
    approx = ivf_cosine_topk(emb, k=3, n_clusters=8, n_probe=3, train_rows=60)
    by_id = {}
    for r in approx.collect():
        by_id.setdefault(r["id"], set()).add(r["neighbor"])
    hits = sum(1 for i, nn in true_nn.items() if nn in by_id.get(i, set()))
    assert hits / len(true_nn) > 0.5, hits / len(true_nn)
    again = {(r["id"], r["neighbor"]) for r in
             ivf_cosine_topk(emb.repartition(7), k=3, n_clusters=8,
                             n_probe=3, train_rows=60).collect()}
    assert {(r["id"], r["neighbor"]) for r in approx.collect()} == again


def test_ivf_cosine_topk(spark, sf001_dir):
    from ddsketchy_spark.pipeline.similarity import ivf_cosine_topk

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    exact = cosine_topk(emb, k=1)
    true_nn = {r["id"]: r["neighbor"] for r in exact.collect()}
    approx = ivf_cosine_topk(emb, k=3, n_clusters=8, n_probe=3)
    rows = approx.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], set()).add(r["neighbor"])
    hits = sum(1 for i, nn in true_nn.items() if nn in by_id.get(i, set()))
    assert hits / len(true_nn) > 0.5, hits / len(true_nn)
    # deterministic across runs
    again = {(r["id"], r["neighbor"]) for r in
             ivf_cosine_topk(emb, k=3, n_clusters=8, n_probe=3).collect()}
    assert {(r["id"], r["neighbor"]) for r in rows} == again


def test_ann_query(spark, sf001_dir):
    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
    out = ann_query(emb, qvec, k=5).collect()
    assert len(out) == 5
    assert out[0]["vec_id"] == 0  # the query vector itself is its own NN
    assert out[0]["cos"] == pytest.approx(1.0, abs=1e-6)
    assert all(out[i]["cos"] >= out[i + 1]["cos"] for i in range(4))


def test_token_stats_and_quality(spark, sf001_dir):
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    ts = token_stats(docs).collect()
    for r in ts[:50]:
        assert r["n_ws_tokens"] == len(r["text"].split(" "))
        assert r["n_chars_calc"] == len(r["text"])
    qs = quality_scores(docs).collect()
    for r in qs[:50]:
        words = r["text"].split(" ")
        assert r["n_words"] == len(words)
        assert r["stopword_ratio"] == pytest.approx(
            sum(w in ("the", "a", "and", "of", "to", "in", "is", "it") for w in words)
            / len(words))
        assert 0.0 <= r["punct_ratio"] <= 1.0


def test_lang_id_deterministic(spark, sf001_dir):
    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    out = lang_id(docs)
    rows = out.collect()
    assert all(r["pred_lang"] in ("en", "de", "es", "fr", "zh") for r in rows)
    # deterministic across partitionings
    again = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs.repartition(5)).collect()}
    assert {r["doc_id"]: r["pred_lang"] for r in rows} == again


def test_fingerprints(spark, docs_with_dups):
    fps = exact_fingerprint(docs_with_dups)
    n_distinct = fps.select("fingerprint").distinct().count()
    assert n_distinct == docs_with_dups.count() - 20  # planted dups collide
    wf = winnowing_fingerprints(docs_with_dups.filter("doc_id < 50"), k=5, window=4)
    rows = wf.collect()
    assert len(rows) > 0
    # identical docs share identical fingerprint sets
    wf2 = winnowing_fingerprints(docs_with_dups.filter(
        "doc_id < 20 or (doc_id >= 100000 and doc_id < 100020)"))
    sets = {}
    for r in wf2.collect():
        sets.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for i in range(20):
        assert sets[i] == sets[i + 100000], i


def test_winnowing_vectorized_matches_v1(spark, monkeypatch):
    """The round-3 batch-vectorized winnowing (Arrow string buffers, doc-
    boundary chunking) must reproduce the v1 per-document law bit-for-bit:
    same char-length guard, same UTF-8 byte grams, same leftmost-window-
    min selection — on unicode, boundary-length, and empty docs, with the
    chunk size shrunk to force mid-batch boundaries."""
    import ddsketchy_spark.pipeline.text as tx

    rng = np.random.default_rng(11)
    letters = list("abcdefgh XYZ.,!")
    rows = [(i, "".join(rng.choice(letters, size=int(rng.integers(5, 300)))))
            for i in range(40)]
    rows += [(100, None), (101, ""), (102, "abcd"),      # skipped (< k chars)
             (103, "abcde"),                             # exactly k chars
             (104, "abcdefgh"),                          # n == window
             (105, "ÿüé"),                               # 3 chars < k: skip
             (106, "ÿüéAB"),                             # 5 chars, 8 bytes
             (107, "Ünïcødé TEXT with ümläuts and ß repeated " * 4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, window = 5, 4
    monkeypatch.setattr(tx, "_WINNOW_CHUNK_BYTES", 32)
    got: dict[int, set] = {}
    for r in tx.winnowing_fingerprints(df.coalesce(1), k=k,
                                       window=window).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))

    MASK = np.int64((1 << 61) - 1)
    powers = np.array([pow(1000003, k - 1 - j, 1 << 61) for j in range(k)],
                      dtype=np.int64)
    exp: dict[int, set] = {}
    for doc_id, t in rows:
        if t is None or len(t) < k:
            continue
        a = np.frombuffer(t.lower().encode("utf-8", "ignore"), dtype=np.uint8)
        n = len(a) - k + 1
        if n <= 0:
            continue
        with np.errstate(over="ignore"):
            grams = np.lib.stride_tricks.sliding_window_view(a, k).astype(np.int64)
            h = (grams * powers).sum(axis=1) & MASK
        if n <= window:
            sel = np.array([int(np.argmin(h))])
        else:
            wins = np.lib.stride_tricks.sliding_window_view(h, window)
            sel = np.unique(np.argmin(wins, axis=1) + np.arange(len(wins)))
        exp[doc_id] = {(int(p), int(h[p])) for p in sel}
    assert got == exp


def test_repetition_scores(spark):
    """Gopher-style repetition metrics: exact fractions on hand-computable
    docs, 0.0 (never NULL) for NULL/short docs, line-dup fraction."""
    from ddsketchy_spark.pipeline.text import repetition_scores

    rows = [
        (1, "a b a b a b"),     # bigrams [ab,ba,ab,ba,ab]: 1-2/5 = 0.6
        (2, "x y z"),           # all bigrams/trigrams distinct -> 0.0
        (3, None),
        (4, "one"),             # no bigrams -> 0.0
        (5, "l1\nl2\nl1"),      # 1 - 2/3 lines
    ]
    out = {r["doc_id"]: r for r in
           repetition_scores(spark.createDataFrame(
               rows, "doc_id long, text string")).collect()}
    assert out[1]["dup_ngram_frac_2"] == pytest.approx(0.6)
    assert out[1]["dup_ngram_frac_3"] == pytest.approx(0.5)  # [aba,bab,aba,bab]
    assert out[2]["dup_ngram_frac_2"] == 0.0
    assert out[2]["dup_ngram_frac_3"] == 0.0
    assert out[3]["dup_ngram_frac_2"] == 0.0 and out[3]["dup_line_frac"] == 0.0
    assert out[4]["dup_ngram_frac_2"] == 0.0
    assert out[5]["dup_line_frac"] == pytest.approx(0.333333)


def test_dedup_paragraphs(spark):
    """Corpus-wide paragraph dedup: first occurrence (doc_id, pos) wins,
    later occurrences are cut from the text (case/trim-insensitive
    match), short paragraphs are never candidates, NULL text/id rows pass
    through, and a fully-duplicated doc becomes ''."""
    from ddsketchy_spark.pipeline.dedup import dedup_paragraphs

    P = "this paragraph is long enough to participate in dedup"
    Q = "another sufficiently long and distinct paragraph right here"
    rows = [
        (1, f"{P}\nshort\n{Q}"),
        (2, f"{P}\na unique second-document paragraph that is long"),
        (3, f"short\n{P}"),
        (4, None),
        (5, P),
        (6, "  " + P.upper()),   # trim+case-insensitive duplicate
        (None, P),               # NULL id: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_paragraphs(df).collect()}
    assert out[1]["text"] == f"{P}\nshort\n{Q}"        # first occurrence
    assert out[1]["n_paras_removed"] == 0
    assert out[2]["text"] == "a unique second-document paragraph that is long"
    assert out[2]["n_paras_removed"] == 1
    assert out[3]["text"] == "short" and out[3]["n_paras_removed"] == 1
    assert out[4]["text"] is None and out[4]["n_paras_removed"] == 0
    assert out[5]["text"] == "" and out[5]["n_paras_removed"] == 1
    assert out[6]["text"] == "" and out[6]["n_paras_removed"] == 1
    null_rows = [r for r in dedup_paragraphs(df).collect()
                 if r["doc_id"] is None]
    assert len(null_rows) == 1 and null_rows[0]["text"] == P
    # literal separator: '. ' must not behave as any-char-space regex
    d2 = spark.createDataFrame(
        [(1, f"{P}. {Q}"), (2, f"{P}. tail paragraph long enough to keep")],
        "doc_id long, text string")
    o2 = {r["doc_id"]: r for r in dedup_paragraphs(d2, sep=". ").collect()}
    assert o2[1]["text"] == f"{P}. {Q}"
    assert o2[2]["text"] == "tail paragraph long enough to keep"


def test_dedup_paragraphs_within_doc(spark):
    """The first-occurrence law also applies WITHIN one document: a
    paragraph repeated in the same doc keeps only its first copy."""
    from ddsketchy_spark.pipeline.dedup import dedup_paragraphs

    P = "a paragraph long enough to be a dedup candidate indeed"
    df = spark.createDataFrame(
        [(1, f"{P}\nmiddle filler paragraph that is long enough too\n{P}")],
        "doc_id long, text string")
    r = dedup_paragraphs(df).collect()[0]
    assert r["text"] == f"{P}\nmiddle filler paragraph that is long enough too"
    assert r["n_paras_removed"] == 1


def test_clean_corpus_with_paragraph_stage(spark):
    """clean_corpus's optional paragraph-dedup stage composes with the
    downstream near-dedup self-joins (regression guard for the
    HOF-lambda/DeduplicateRelations trap at broadcast-sized plans):
    boilerplate survives only in its first document."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    P = ("a long shared boilerplate paragraph that should be removed "
         "from every later document")
    rows = [(i, f"wholly distinct body number {i} with its own words "
             f"token{i}a token{i}b the of and to\n{P}", "t")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       para_dedup_kw={"min_chars": 20},
                       near_dedup_kw={"verify": "local", "num_perm": 32,
                                      "bands": 8, "threshold": 0.9})
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert sum(P in t for t in got.values()) == 1
    # skipping the stage (default) leaves the boilerplate everywhere
    out2 = clean_corpus(df, quality_kw={"min_words": 3},
                        near_dedup_kw={"verify": "local", "num_perm": 32,
                                       "bands": 8, "threshold": 0.95})
    got2 = {r["doc_id"]: r["text"] for r in out2.collect()}
    assert all(P in t for t in got2.values())


def test_clean_corpus_with_line_clean_stage(spark):
    """clean_corpus's optional C4 line-clean stage (1b) cuts bad lines
    BEFORE the doc filter and composes with the downstream near-dedup
    self-joins (the HOF-on-self-joining-frame trap — clean_lines' lambda
    is the safe own-variable-only form); pages tripping C4 page rules
    drop entirely."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    good = ("This is a perfectly fine training sentence number {i} of the "
            "corpus body.")
    rows = [(i, "\n".join([good.format(i=i) + f" unique{i}a the of and.",
                           "no terminal punctuation on this line",
                           good.format(i=i) + f" unique{i}b it is to in.",
                           "short.",
                           good.format(i=i) + f" unique{i}c and the of."]),
             "t") for i in range(12)]
    rows.append((100, "A page with lorem ipsum inside it stays banned.\n"
                 + "\n".join([good.format(i=100) + " the of and to."] * 4),
                 "t"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       line_clean_kw={"min_kept_lines": 3},
                       near_dedup_kw={"verify": "local", "num_perm": 32,
                                      "bands": 8, "threshold": 0.95})
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 100 not in got                      # page blocklist
    assert set(got) == set(range(12))
    for i, t in got.items():
        lines = t.split("\n")
        assert len(lines) == 3                 # 2 bad lines cut
        assert all(ln.rstrip().endswith(".") for ln in lines)
    # default (None) leaves text untouched
    out2 = clean_corpus(df.where("doc_id < 12"),
                        quality_kw={"min_words": 3},
                        near_dedup_kw={"skip": True})
    assert all(len(r["text"].split("\n")) == 5 for r in out2.collect())


def test_clean_corpus_with_boilerplate_stage(spark):
    """clean_corpus's optional corpus-frequency boilerplate stage (2a)
    cuts repeated banner lines from every surviving doc and composes
    with the downstream near-dedup SELF-joins at broadcast size — the
    rewrite is a HOF referencing a joined loser array, the exact
    DeduplicateRelations shape the paragraph-dedup stage already
    exercises."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    banner = "Subscribe to our newsletter for updates and offers today."
    body = ("This is a perfectly fine training sentence number {i} of the "
            "corpus body with unique{i} the of and to it is.")
    rows = [(i, banner + "\n" + body.format(i=i), "t") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       boilerplate_kw={"min_docs": 5},
                       near_dedup_kw={"verify": "local", "num_perm": 32,
                                      "bands": 8, "threshold": 0.95})
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == set(range(10))
    for i, t in got.items():
        assert banner not in t and t == body.format(i=i)
    # threshold not met -> untouched
    out2 = clean_corpus(df, quality_kw={"min_words": 3},
                        boilerplate_kw={"min_docs": 50},
                        near_dedup_kw={"skip": True})
    assert all(banner in r["text"] for r in out2.collect())
    # the JOIN engine's rewrite is an outer-column HOF on a joined
    # frame; pin that it too survives the downstream self-joins at
    # broadcast size (r5 review: verified safe on this Spark, kept
    # pinned against regressions of the DeduplicateRelations rewrite)
    out3 = clean_corpus(df, quality_kw={"min_words": 3},
                        boilerplate_kw={"min_docs": 5, "engine": "join"},
                        near_dedup_kw={"verify": "local", "num_perm": 32,
                                       "bands": 8, "threshold": 0.95})
    assert {r["doc_id"]: r["text"] for r in out3.collect()} == got


def test_url_domain_operators(spark):
    """URL gating laws: host extraction (scheme/userinfo/port/scheme-less/
    NULL), public-suffix registrable-domain reduction, block vs allow
    modes, and list-vs-broadcast-DataFrame blocklist equivalence."""
    from ddsketchy_spark.pipeline.urls import filter_by_domain, url_domains

    rows = [
        (0, "https://www.example.co.uk/path?q=1"),
        (1, "http://sub.deep.site3.com:8080/a/b"),
        (2, "ftp://user:pw@files.example.com/x"),
        (3, "example.com/no-scheme"),
        (4, "https://localhost/admin"),
        (5, "HTTPS://WWW.UPPER.COM/Y"),
        (6, None),
        (7, "https://ads.tracker.co.uk/pixel"),
        (8, "co.uk"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: (r["host"], r["domain"])
           for r in url_domains(df).collect()}
    assert got[0] == ("www.example.co.uk", "example.co.uk")  # multi-suffix
    assert got[1] == ("sub.deep.site3.com", "site3.com")     # port stripped
    assert got[2] == ("files.example.com", "example.com")    # userinfo
    assert got[3] == ("example.com", "example.com")          # scheme-less
    assert got[4] == ("localhost", "localhost")              # single label
    assert got[5] == ("www.upper.com", "upper.com")          # lowercased
    assert got[6] == ("", "")                                # NULL -> ''
    assert got[8] == ("co.uk", "co.uk")                      # bare suffix

    blocked = ["site3.com", "TRACKER.co.uk"]
    lab = {r["doc_id"]: r["keep"]
           for r in filter_by_domain(df, blocked).collect()}
    assert not lab[1] and not lab[7]
    assert all(lab[i] for i in (0, 2, 3, 4, 5, 6, 8))
    # DataFrame blocklist (the broadcast path) decides identically
    bdf = spark.createDataFrame([(d,) for d in blocked], "d string")
    lab2 = {r["doc_id"]: r["keep"]
            for r in filter_by_domain(df, bdf).collect()}
    assert lab2 == lab
    # allow mode inverts; ''-domain rows drop under allow
    allow = {r["doc_id"]: r["keep"]
             for r in filter_by_domain(df, ["example.co.uk"],
                                       mode="allow").collect()}
    assert allow[0] and not allow[6] and sum(allow.values()) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        filter_by_domain(df, [], mode="nope")


def test_clean_corpus_paragraph_stage_plus_benchmark(spark):
    """para_dedup_kw AND benchmark together at broadcast size (ADVICE r3):
    decontaminate builds n-grams from the paragraph stage's rewritten text
    — whose projection contains the HOF lambda capturing the joined
    _loser_pos column — and left-anti self-joins it back onto out. That is
    exactly the DeduplicateRelations/HOF outer-capture shape that crashes
    ONLY on broadcast-sized plans; this must compose without it."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    P = ("a long shared boilerplate paragraph that should be removed "
         "from every later document")
    rows = [(i, f"wholly distinct body number {i} with its own words "
             f"token{i}a token{i}b the of and to\n{P}", "t")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # benchmark shares a 5-gram with doc 7's body -> doc 7 must drop
    bench = spark.createDataFrame(
        [(900, "wholly distinct body number 7 with its own words")],
        "doc_id long, text string")
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       para_dedup_kw={"min_chars": 20},
                       near_dedup_kw={"verify": "local", "num_perm": 32,
                                      "bands": 8, "threshold": 0.9},
                       benchmark=bench, decontam_n=5)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 7 not in got
    assert sum(P in t for t in got.values()) == 1


def test_clean_corpus_with_mixture_stage(spark):
    """clean_corpus's optional final mixture stage: survivors are mixed to
    per-source token budgets (n_copies appears; absent sources drop)."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    rows = [(i, f"document body {i} with the usual words and a few more "
             f"filler{i} tokens here", "A" if i < 30 else "B", 10)
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_tok long")
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       near_dedup_kw={"skip": True}, redact=False,
                       mix_budgets={"A": 150.0})  # rate 0.5; B dropped
    got = out.collect()
    assert got and all(r["source"] == "A" for r in got)
    assert all(r["n_copies"] == 1 for r in got)
    assert 5 <= len(got) <= 25  # ~15 expected of 30


def test_multimodal_plumbing(spark):
    from ddsketchy_spark.pipeline.multimodal import (
        decode_media,
        fake_feature_extract,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, n=30)
    feats = fake_feature_extract(media, dim=16).collect()
    assert len(feats) == 30
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic
    feats2 = fake_feature_extract(media, dim=16).collect()
    assert {r["media_id"]: r["features"] for r in feats} == \
        {r["media_id"]: r["features"] for r in feats2}
    plan = frame_sample_plan(media, every_n=5).collect()
    assert all(r["frame_idxs"][0] == 0 for r in plan)
    # decode without a decoder must fail loudly at execution
    with pytest.raises(Exception, match="NotImplementedError|decoder"):
        decode_media(media).collect()


# -- connected components + semantic dedup ------------------------------------


def test_connected_components_basic(spark):
    from ddsketchy_spark.pipeline.dedup import connected_components

    # two chains and a triangle: {1-2-3}, {10-11}, {20-21-22 triangle}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long")
    out = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain(spark):
    from ddsketchy_spark.pipeline.dedup import connected_components

    # a path graph needs O(diameter) rounds — exercises the iteration loop
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long")
    out = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert set(out.values()) == {0} and len(out) == 13


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the per-round lineage truncation from
    localCheckpoint (executor-resident; lost on executor failure) to
    reliable dir-based checkpoint(): identical labels, and the rounds'
    RDDs actually land in the checkpoint directory."""
    import os

    from ddsketchy_spark.pipeline.dedup import connected_components

    ckpt = str(tmp_path / "cc_ckpt")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101)], "src long, dst long")
    base = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    rel = {r["node"]: r["comp"] for r in
           connected_components(edges, checkpoint_dir=ckpt).collect()}
    assert rel == base
    # the reliable path must have written round states to the FS
    written = [os.path.join(dp, f) for dp, _, fs in os.walk(ckpt) for f in fs]
    assert written, "reliable checkpoint wrote nothing to checkpoint_dir"


def test_dedup_semantic(spark, sf001_dir):
    from ddsketchy_spark.pipeline.dedup import dedup_semantic

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    # plant exact duplicate vectors: ids 0-4 copied twice (chained clusters
    # of size 3 through the shared original)
    d1 = emb.filter("vec_id < 5").withColumn("vec_id", F.col("vec_id") + 1000)
    d2 = emb.filter("vec_id < 5").withColumn("vec_id", F.col("vec_id") + 2000)
    all_ = emb.unionByName(d1).unionByName(d2)
    out = dedup_semantic(all_, threshold=0.9, method="exact")
    rows = {r["vec_id"]: r for r in out.collect()}
    n = emb.count()
    assert len(rows) == n + 10
    for i in range(5):
        assert rows[i]["component"] == i and rows[i]["keep"]
        assert rows[i + 1000]["component"] == i and not rows[i + 1000]["keep"]
        assert rows[i + 2000]["component"] == i and not rows[i + 2000]["keep"]
    # everything else is a singleton that keeps itself
    singles = [r for vid, r in rows.items() if 5 <= vid < 1000]
    assert all(r["keep"] and r["component"] == r["vec_id"] for r in singles)


def test_dedup_semantic_lsh_matches_exact(spark, sf001_dir):
    from ddsketchy_spark.pipeline.dedup import cosine_near_pairs

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet").select(
        "vec_id", "embedding")
    d1 = emb.filter("vec_id < 8").withColumn("vec_id", F.col("vec_id") + 1000)
    all_ = emb.unionByName(d1)
    exact = {(r["src"], r["dst"]) for r in
             cosine_near_pairs(all_, 0.9, method="exact").collect()}
    lsh = {(r["src"], r["dst"]) for r in
           cosine_near_pairs(all_, 0.9, method="lsh", n_planes=16, bands=8,
                             dim=64).collect()}
    # identical vectors share every band -> LSH recall is 1.0 on exact dups
    assert exact == lsh and len(exact) == 8


def test_cosine_near_pairs_nan_guard(spark):
    """A NaN-poisoned embedding must not link rows (Spark orders NaN above
    every number, so an unguarded `cos >= thr` filter would pass)."""
    from ddsketchy_spark.pipeline.dedup import dedup_semantic

    rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0]),           # true dup pair
            (2, [0.0, 1.0]), (3, [float("nan"), 1.0])]  # poisoned row
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in dedup_semantic(df, 0.9).collect()}
    assert out[0]["component"] == 0 and out[1]["component"] == 0
    assert out[2]["component"] == 2 and out[2]["keep"]
    assert out[3]["component"] == 3 and out[3]["keep"]


def test_cosine_near_pairs_lsh_degree_over_k(spark):
    """Pair orientation: with cluster degree > k, a qualifying pair may
    survive only in the higher id's top-k list — it must still be emitted."""
    from ddsketchy_spark.pipeline.dedup import connected_components, cosine_near_pairs

    # 12 identical vectors, k=4: every pair qualifies, each node's top-k
    # keeps only 4 neighbors
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = cosine_near_pairs(df, 0.99, method="lsh", k=4, n_planes=8,
                              bands=4, dim=3)
    got = pairs.collect()
    assert all(r["src"] < r["dst"] for r in got)
    assert len(got) >= 12  # enough edges to connect all 12 nodes
    comp = {r["node"]: r["comp"] for r in
            connected_components(pairs, "src", "dst").collect()}
    assert set(comp.values()) == {0} and len(comp) == 12


def test_multimodal_resize_and_media_dedup(spark):
    """Resize plumbing (meta updated, payload rewritten, stub raises
    without a resizer) and the full media pipeline downstream: fake
    features -> embedding-cosine dedup finds planted duplicate media."""
    from ddsketchy_spark.pipeline.dedup import dedup_semantic
    from ddsketchy_spark.pipeline.multimodal import (
        fake_feature_extract,
        fake_resizer,
        resize_media,
        synth_media,
    )

    media = synth_media(spark, n=30)
    resized = resize_media(media, 32, 32, resizer=fake_resizer)
    rows = resized.collect()
    assert len(rows) == 30
    assert all(len(r["payload"]) == 32 * 32 for r in rows)
    assert all(r["meta"]["width"] == 32 and r["meta"]["height"] == 32
               for r in rows)

    # stub contract: no resizer -> NotImplementedError at execution
    with pytest.raises(Exception, match="NotImplementedError|resizer"):
        resize_media(media, 8, 8).collect()

    # plant duplicate payloads, run features -> semantic dedup end to end
    dup = media.limit(5).withColumn(
        "media_id", F.concat(F.col("media_id"), F.lit("-copy")))
    feats = fake_feature_extract(media.unionByName(dup), dim=16)
    out = dedup_semantic(feats, threshold=0.999, vec_col="features",
                         id_col="media_id", method="exact")
    removed = {r["media_id"] for r in out.where("NOT keep").collect()}
    # each planted copy clusters with its original (min id is canonical:
    # 'm-xxxxxx' < 'm-xxxxxx-copy')
    assert removed == {f"m-{i:06d}-copy" for i in range(5)}


def test_quality_filter_reasons(spark):
    """Fixed-precedence drop reasons: first tripped rule wins; keep only
    when no rule trips; NULL text is its own reason."""
    from ddsketchy_spark.pipeline.text import quality_filter

    rows = [
        (1, None),                                  # null_text
        (2, "tiny doc"),                            # too_few_words
        (3, "the " + "supercalifragilistic " * 9),  # long mean word len
        (4, ".,;: " * 6),                           # punct (but short words trip first)
        (5, "the cat sat on a mat and it is nice today in the sunny park"),
    ]
    out = {r["doc_id"]: r for r in
           quality_filter(spark.createDataFrame(rows, "doc_id long, text string"),
                          min_words=3, min_stopword_ratio=0.01,
                          max_punct_ratio=0.3).collect()}
    assert out[1]["drop_reason"] == "null_text"
    assert out[2]["drop_reason"] == "too_few_words"
    assert out[3]["drop_reason"] == "long_words"
    assert out[4]["drop_reason"] in ("short_words", "high_punct", "low_stopword")
    assert out[5]["drop_reason"] == "kept" and out[5]["keep"]
    assert not any(out[i]["keep"] for i in (1, 2, 3, 4))


def test_clean_lines_c4_rules(spark):
    """C4 line-level cleaning: each line rule (terminal punct, min words,
    blocklist phrase) drops exactly its lines; page rules fire in fixed
    precedence on the ORIGINAL text; regex-metachar line_sep is literal."""
    from ddsketchy_spark.pipeline.text import clean_lines

    rows = [
        (0, "Good line with five words here.\nshort.\n"
            "Another decent line that qualifies fine!\n"
            "this one has no terminal punct\n"
            "Final qualifying line ends properly."),
        (1, "Contains JavaScript so this line dies.\n"
            "A perfectly good line stays right here.\n"
            "Another perfectly good line stays right here.\n"
            "Yet another good line is here today."),
        (2, "Has Lorem Ipsum filler somewhere inside it.\n"
            "Good line one stays right here now.\n"
            "Good line two stays right here now.\n"
            "Good line three stays right here now."),
        (3, None),
        (4, "Only one good line survives in this doc.\nbad\nworse"),
    ]
    out = {r["doc_id"]: r for r in clean_lines(
        spark.createDataFrame(rows, "doc_id long, text string")).collect()}

    # line rules: doc 0 loses the <5-word and no-terminal-punct lines
    assert out[0]["drop_reason"] == "kept" and out[0]["keep"]
    assert out[0]["clean_text"].split("\n") == [
        "Good line with five words here.",
        "Another decent line that qualifies fine!",
        "Final qualifying line ends properly."]
    assert (out[0]["n_lines"], out[0]["n_kept_lines"]) == (5, 3)
    # blocklist is case-insensitive and kills only its line
    assert out[1]["n_kept_lines"] == 3 and out[1]["keep"]
    assert "JavaScript" not in out[1]["clean_text"]
    # page blocklist wins over line survival (all 4 lines qualify)
    assert out[2]["drop_reason"] == "page_blocklist:lorem ipsum"
    assert out[2]["n_kept_lines"] == 4 and not out[2]["keep"]
    # NULL text: its own reason, empty (never NULL) clean_text
    assert out[3]["drop_reason"] == "null_text"
    assert out[3]["clean_text"] == "" and out[3]["n_lines"] == 0
    # too_few_lines after line filtering
    assert out[4]["drop_reason"] == "too_few_lines"
    assert out[4]["n_kept_lines"] == 1

    # a regex-metachar separator splits literally (the repetition_scores
    # escape law) and survives into the rejoined text
    pipe = clean_lines(
        spark.createDataFrame(
            [(0, "First good line ends with period.|second short.|"
                 "Second good line ends with period.|"
                 "Third good line ends with period.")],
            "doc_id long, text string"),
        line_sep="|")
    r = pipe.collect()[0]
    assert r["n_lines"] == 4 and r["n_kept_lines"] == 3 and r["keep"]
    assert r["clean_text"].count("|") == 2


def test_remove_boilerplate_lines(spark):
    """Corpus-frequency boilerplate law: lines in >= min_docs DISTINCT
    docs are removed EVERYWHERE (no keep-first); within-doc repeats count
    one doc toward the threshold but every occurrence goes once the line
    qualifies; short lines are never candidates; NULL text/id pass
    through; thresholds validated."""
    from ddsketchy_spark.pipeline.text import remove_boilerplate_lines

    cookie = "Accept cookies to continue"
    rows = []
    for i in range(6):
        # cookie in all 6 docs; 'twice' repeats within doc 0 only (1 doc);
        # 'pair' in docs 0-2 (3 docs); 'xx' is below min_chars everywhere
        body = f"unique body line {i}\nxx"
        extra = "\npair boiler line" if i < 3 else ""
        twice = "\ntwice in one doc\ntwice in one doc" if i == 0 else ""
        rows.append((i, f"{cookie}\n{body}{extra}{twice}"))
    rows += [(None, cookie), (99, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["doc_id"]: r for r in
           remove_boilerplate_lines(df, min_docs=3, min_chars=5).collect()}
    # cookie (6 docs) and pair (3 docs) are boiler; 'twice' (1 doc) and
    # unique lines are not; 'xx' survives via min_chars
    assert out[0]["text"] == ("unique body line 0\nxx\n"
                              "twice in one doc\ntwice in one doc")
    assert out[0]["n_boiler_removed"] == 2  # cookie + pair
    assert out[4]["text"] == "unique body line 4\nxx"
    assert out[4]["n_boiler_removed"] == 1  # cookie only
    assert out[99]["text"] is None and out[99]["n_boiler_removed"] == 0
    null_id = [r for r in
               remove_boilerplate_lines(df, min_docs=3).collect()
               if r["doc_id"] is None][0]
    assert null_id["text"] == cookie  # NULL id: passes through untouched

    # threshold boundary: min_docs=4 leaves 'pair' (3 docs) alone
    out4 = {r["doc_id"]: r for r in
            remove_boilerplate_lines(df, min_docs=4).collect()}
    assert "pair boiler line" in out4[1]["text"]
    assert out4[1]["n_boiler_removed"] == 1

    # every-occurrence removal: make 'twice...' qualify via a second doc
    df2 = spark.createDataFrame(
        rows + [(7, "twice in one doc\nfiller line seven")],
        "doc_id long, text string")
    out2 = {r["doc_id"]: r for r in
            remove_boilerplate_lines(df2, min_docs=2, min_chars=5).collect()}
    assert out2[0]["n_boiler_removed"] == 4  # cookie + pair + BOTH repeats
    assert "twice in one doc" not in out2[0]["text"]

    # a doc that is all boilerplate becomes "" (not NULL)
    df3 = spark.createDataFrame(
        [(i, "only boiler here") for i in range(3)],
        "doc_id long, text string")
    r3 = remove_boilerplate_lines(df3, min_docs=2).collect()[0]
    assert r3["text"] == "" and r3["n_boiler_removed"] == 1

    with pytest.raises(ValueError, match="min_docs"):
        remove_boilerplate_lines(df, min_docs=1)


def test_remove_boilerplate_lines_grouped(spark):
    """RefinedWeb per-site frequency law (group_col): a line repeated
    within one domain is boilerplate THERE, while the same line below
    threshold in another domain survives; NULL-group rows pass through."""
    from ddsketchy_spark.pipeline.text import remove_boilerplate_lines

    banner = "Subscribe to the site newsletter"
    rows = ([(i, f"{banner}\nsite-a body {i} words", "a.com")
             for i in range(4)]            # 4 docs on a.com: boiler there
            + [(10, f"{banner}\nsite-b body ten words", "b.com")]  # 1 doc
            + [(20, f"{banner}\nno domain body words", None)])
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")

    out = {r["doc_id"]: r for r in remove_boilerplate_lines(
        df, min_docs=3, group_col="dom").collect()}
    for i in range(4):
        assert banner not in out[i]["text"]
        assert out[i]["n_boiler_removed"] == 1
    assert banner in out[10]["text"]     # below threshold on b.com
    assert out[10]["n_boiler_removed"] == 0
    assert out[20]["text"].startswith(banner)  # NULL group: untouched
    assert out[20]["n_boiler_removed"] == 0

    # global law over the same frame WOULD remove it everywhere (5 docs)
    gout = {r["doc_id"]: r for r in remove_boilerplate_lines(
        df, min_docs=3).collect()}
    assert banner not in gout[10]["text"]


def test_remove_boilerplate_engines_parity(spark):
    """The broadcast-set mapInArrow engine and the join engine implement
    the identical law bit-for-bit — randomized corpus with unicode case
    folding, space-padded near-misses, within-doc repeats, NULL text/id/
    group, grouped and ungrouped, plus the auto fallback and the
    broadcast cap guard."""
    import random

    from ddsketchy_spark.pipeline.text import remove_boilerplate_lines

    rng = random.Random(42)
    banners = ["  Accept Cookies To Continue  ", "ABONNEZ-VOUS · ICI →",
               "über uns — impressum", "short"]
    rows = []
    for i in range(60):
        dom = f"site-{i % 3}.com" if i % 7 else None
        parts = [f"unique {i} body line with words {rng.random():.6f}"]
        for b in banners:
            if rng.random() < 0.6:
                # vary case/padding: must still hash equal after
                # trim+lower, in BOTH engines
                v = b.upper() if rng.random() < 0.5 else b.lower()
                parts.append((" " * rng.randrange(3)) + v)
        if rng.random() < 0.2:
            parts.append(parts[-1])  # within-doc repeat
        rng.shuffle(parts)
        rows.append((i, "\n".join(parts), dom))
    rows += [(None, "Accept cookies to continue", "site-0.com"),
             (998, None, "site-1.com")]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")

    for kw in ({}, {"group_col": "dom"}):
        a = remove_boilerplate_lines(df, min_docs=5, engine="broadcast",
                                     **kw).collect()
        b = remove_boilerplate_lines(df, min_docs=5, engine="join",
                                     **kw).collect()
        key = lambda r: (r["doc_id"] is None, r["doc_id"])
        for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
            assert ra.asDict() == rb.asDict(), (kw, ra, rb)
        assert sum(r["n_boiler_removed"] for r in a) > 0, kw

    # auto falls back to the join engine when the boiler set exceeds the
    # cap; results stay identical
    fb = remove_boilerplate_lines(df, min_docs=5, engine="auto",
                                  max_broadcast_lines=0).collect()
    jn = remove_boilerplate_lines(df, min_docs=5, engine="join").collect()
    assert sorted(map(str, fb)) == sorted(map(str, jn))
    # explicit broadcast over the cap refuses loudly
    with pytest.raises(ValueError, match="max_broadcast_lines"):
        remove_boilerplate_lines(df, min_docs=5, engine="broadcast",
                                 max_broadcast_lines=0)
    with pytest.raises(ValueError, match="engine"):
        remove_boilerplate_lines(df, min_docs=5, engine="bogus")


def test_sample_to_token_budget(spark):
    """Mixture sampling law re-derived in pure Python (hashlib.md5):
    exact kept-set + copy counts, downsample AND upsample, absent-source
    and NULL-row drops, explode_copies multiplicity, and invariance under
    repartitioning (the law is a pure function of the data)."""
    import hashlib

    from ddsketchy_spark.pipeline.mix import sample_to_token_budget

    rows = ([(i, "A", 100) for i in range(100)]          # tot 10_000
            + [(1000 + i, "B", 50) for i in range(40)]   # tot 2_000
            + [(2000 + i, "C", 10) for i in range(5)]    # absent from budgets
            + [(None, "A", 100), (3000, None, 100), (3001, "A", None)])
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budgets = {"A": 5_000.0, "B": 4_600.0}  # rate A=0.5, B=2.3
    out = sample_to_token_budget(df, budgets, seed=3)
    got = {r["doc_id"]: r["n_copies"] for r in out.collect()}

    def u(i, seed=3):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:13],
                   16) / 16**13

    exp = {}
    for i, src, tok in rows:
        if i is None or src is None or tok is None or src == "C":
            continue
        rate = {"A": 0.5, "B": 2.3}[src]
        n = int(rate) + (1 if u(i) < rate - int(rate) else 0)
        if n >= 1:
            exp[i] = n
    assert got == exp
    assert 0.3 <= len([i for i in exp if i < 1000]) / 100 <= 0.7
    assert all(v >= 2 for i, v in exp.items() if 1000 <= i < 2000)
    # partitioning must not change the result
    got2 = {r["doc_id"]: r["n_copies"]
            for r in sample_to_token_budget(df.repartition(7), budgets,
                                            seed=3).collect()}
    assert got2 == got
    # exploded copies: one row per copy with a 0-based index
    ex = sample_to_token_budget(df, budgets, seed=3, explode_copies=True)
    per = {}
    for r in ex.collect():
        per.setdefault(r["doc_id"], []).append(r["copy"])
    assert {k: sorted(v) for k, v in per.items()} == \
        {k: list(range(v)) for k, v in exp.items()}


def test_pack_sequences(spark):
    """Sequence-packing law re-derived in pure Python: deterministic
    (h, id) global order, exclusive cumsum, start_seq/start_pos/n_seqs;
    invariant to repartitioning AND to n_buckets; NULL/empty rows drop."""
    import hashlib

    from ddsketchy_spark.pipeline.mix import pack_sequences

    rows = [(i, (i * 37) % 90 + 1) for i in range(80)]
    rows += [(200, 0), (201, None), (None, 5)]     # dropped
    df = spark.createDataFrame(rows, "doc_id long, n_tok long")
    L, seed = 64, 5

    def h(i):
        return int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:13], 16)

    order = sorted([r for r in rows[:80]], key=lambda r: (h(r[0]), r[0]))
    exp, off = {}, 0
    for i, n in order:
        exp[i] = (off // L, off % L, (off + n - 1) // L - off // L + 1)
        off += n
    got = {r["doc_id"]: (r["start_seq"], r["start_pos"], r["n_seqs"])
           for r in pack_sequences(df, L, seed=seed).collect()}
    assert got == exp
    for variant in (pack_sequences(df.repartition(7), L, seed=seed),
                    pack_sequences(df, L, seed=seed, n_buckets=4),
                    pack_sequences(df, L, seed=seed, n_buckets=1)):
        got2 = {r["doc_id"]: (r["start_seq"], r["start_pos"], r["n_seqs"])
                for r in variant.collect()}
        assert got2 == exp
    with pytest.raises(ValueError):
        pack_sequences(df, 0)


def test_minhash_broadcast_null_id(spark):
    """r4 regression: a NULL-id row crashed verify='broadcast' (toPandas
    float64-coerced the id column — the CLAUDE.md pandas-NULL trap — and
    the float ids then mismatched the declared long Arrow output schema).
    Law, now explicit for BOTH engines: NULL ids never enter the pair
    graph."""
    from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs

    t = "identical boilerplate text shared by the whole cluster exactly"
    df = spark.createDataFrame([(1, t), (2, t), (None, t)],
                               "doc_id long, text string")
    for verify in ("broadcast", "local"):
        got = sorted((r["id_a"], r["id_b"]) for r in
                     minhash_lsh_pairs(df, num_perm=32, bands=8,
                                       verify=verify).collect())
        assert got == [(1, 2)], verify


def test_dedup_keep_by(spark):
    """keep_by canonical selection: the highest-scoring member of each
    near-dup cluster survives (ties -> min id), singletons keep
    themselves, an all-NULL-score cluster falls back to min id, NULL ids
    pass through with keep=True."""
    from ddsketchy_spark.pipeline.dedup import dedup_near_text

    t = "identical boilerplate text shared by the whole cluster exactly"
    u = "another cluster of shared text goes right here ok friends yes"
    rows = [
        (1, t, 0.2), (2, t, 0.9), (3, t, 0.9),   # winner: 2 (max, tie->min)
        (10, "a completely different unique document body here", 0.1),
        (20, u, None), (21, u, None),            # all-NULL -> min id 20
        (None, "null id rows can never join the pair graph at all", 5.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, score double")
    out = {r["doc_id"]: (r["component"], r["keep"]) for r in
           dedup_near_text(df, threshold=0.9, num_perm=32, bands=8,
                           keep_by="score").collect()}
    assert out[1] == (1, False) and out[2] == (1, True) and out[3] == (1, False)
    assert out[10] == (10, True)
    assert out[20] == (20, True) and out[21] == (20, False)
    assert out[None] == (None, True)
    # default law unchanged: min id wins everywhere
    base = {r["doc_id"]: (r["component"], r["keep"]) for r in
            dedup_near_text(df, threshold=0.9, num_perm=32,
                            bands=8).collect()}
    assert base[1] == (1, True) and base[2] == (1, False)


def test_pipeline_end_to_end_to_shards(spark, tmp_path):
    """The whole training-data flow in one plan: clean_corpus (quality +
    near-dedup + mixture) -> pack_sequences -> write_training_shards;
    round-trips losslessly and a full re-run reproduces the shard
    contents bit-for-bit (the determinism a resumable 100-TB pipeline
    needs)."""
    from ddsketchy_spark.pipeline.compose import clean_corpus
    from ddsketchy_spark.pipeline.mix import pack_sequences
    from ddsketchy_spark.pipeline.shards import (
        read_training_shards,
        write_training_shards,
    )

    rows = []
    for i in range(120):
        body = (f"document body {i} retains the usual words and several "
                f"filler tokens number {i}")
        rows.append((i, body, "A" if i % 2 == 0 else "B",
                     len(body.split(" "))))
    rows.append((200, rows[0][1], "A", rows[0][3]))   # exact near-dup of 0
    rows.append((201, rows[1][1], "B", rows[1][3]))   # exact near-dup of 1
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_tok long")

    def run():
        cleaned = clean_corpus(df, quality_kw={"min_words": 3},
                               near_dedup_kw={"threshold": 0.9},
                               redact=False,
                               mix_budgets={"A": 700.0, "B": 700.0})
        return pack_sequences(cleaned, 64, token_col="n_tok", seed=2)

    packed = run()
    path = str(tmp_path / "e2e_shards")
    man = write_training_shards(packed, path, 4, mode="range",
                                range_col="start_seq")
    assert man["n_shards"] == 4
    back, _ = read_training_shards(spark, path)

    first = {r["doc_id"]: (r["start_seq"], r["start_pos"], r["n_seqs"])
             for r in back.collect()}
    direct = {r["doc_id"]: (r["start_seq"], r["start_pos"], r["n_seqs"])
              for r in packed.collect()}
    assert first == direct and len(first) > 50
    # near-dedup kept exactly one of each planted duplicate pair
    assert (0 in first) != (200 in first)
    assert (1 in first) != (201 in first)
    # a full pipeline re-run packs every surviving doc identically
    again = {r["doc_id"]: (r["start_seq"], r["start_pos"], r["n_seqs"])
             for r in run().collect()}
    assert again == first


def test_write_training_shards(spark, tmp_path):
    """Shard sink: deterministic membership (hash law re-derived via
    Spark's own xxhash64), exactly one data file per shard, lossless
    round-trip, range mode gives disjoint ordered ranges, subset read
    prunes, NULL keys fail loudly."""
    from ddsketchy_spark.pipeline.shards import (
        read_training_shards,
        write_training_shards,
    )

    rows = [(i, f"doc {i}", i * 3 % 97) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string, start_seq long")

    path = str(tmp_path / "hash_shards")
    man = write_training_shards(df, path, 5, seed=3)
    assert man["n_shards"] == 5 and len(man["shards"]) == 5
    assert all(s["n_files"] == 1 for s in man["shards"])
    back, man2 = read_training_shards(spark, path)
    assert man2 == man
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(200))
    # membership law: pmod(xxhash64(cast(id as string), seed), n)
    expected = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", F.pmod(F.xxhash64(F.col("doc_id").cast("string"),
                                    F.lit(3)), F.lit(5))
        .cast("int").alias("s")).collect()}
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    assert got == expected
    sub, _ = read_training_shards(spark, path, shards=[2])
    assert {r["shard"] for r in sub.collect()} == {2}

    rpath = str(tmp_path / "range_shards")
    rman = write_training_shards(df, rpath, 4, mode="range",
                                 range_col="start_seq")
    rback, _ = read_training_shards(spark, rpath)
    span = {r["shard"]: r for r in rback.groupBy("shard").agg(
        F.min("start_seq").alias("lo"), F.max("start_seq").alias("hi"),
        F.count("*").alias("n")).collect()}
    assert sorted(span) == [0, 1, 2, 3]
    assert sum(r["n"] for r in span.values()) == 200
    for i in range(3):  # contiguous, disjoint, ordered ranges
        assert span[i]["hi"] < span[i + 1]["lo"]

    # sort_within actually reaches the FILE BYTES (regression: the
    # partitioned write re-sorts by the partition column and silently
    # discarded any other order until 'shard' led the sort)
    import glob as _glob

    import pyarrow.parquet as _pq

    wpath = str(tmp_path / "sorted_shards")
    write_training_shards(df, wpath, 5, seed=3, sort_within=["start_seq"])
    for sd in sorted(_glob.glob(wpath + "/shard=*")):
        f = _glob.glob(sd + "/*.parquet")[0]
        vals = _pq.read_table(f, columns=["start_seq"])["start_seq"].to_pylist()
        assert vals == sorted(vals)

    # shuffle_seed: within-shard order is the seeded md5-uniform order
    # (re-derived in pure Python), reproducible across rewrites, and the
    # manifest records the law
    import hashlib

    spath = str(tmp_path / "shuffled_shards")
    sman = write_training_shards(df, spath, 5, seed=3, shuffle_seed=7)
    assert sman["shuffle_seed"] == 7
    assert sman["sort_within"] == ["md5_shuffle(seed=7)", "doc_id"]

    def u(i):
        return int(hashlib.md5(f"{i}:7".encode()).hexdigest()[:13], 16)

    for sd in sorted(_glob.glob(spath + "/shard=*")):
        f = _glob.glob(sd + "/*.parquet")[0]
        ids = _pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids, key=lambda i: (u(i), i))
        assert ids != sorted(ids)  # actually shuffled, not id order
    write_training_shards(df, spath, 5, seed=3, shuffle_seed=7)
    for sd in sorted(_glob.glob(spath + "/shard=*")):
        f = _glob.glob(sd + "/*.parquet")[0]
        ids = _pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids, key=lambda i: (u(i), i))

    bad = spark.createDataFrame([(None, "x", 1)],
                                "doc_id long, text string, start_seq long")
    with pytest.raises(Exception, match="NULL doc_id"):
        write_training_shards(bad, str(tmp_path / "bad"), 2)
    with pytest.raises(ValueError, match="range_col"):
        write_training_shards(df, str(tmp_path / "bad2"), 2, mode="range")
    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(df, str(tmp_path / "bad3"), 0)
    # sort_within + shuffle_seed are mutually exclusive orderings: raise
    # loudly instead of silently discarding the caller's sort_within
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_training_shards(df, str(tmp_path / "bad4"), 2,
                              sort_within=["start_seq"], shuffle_seed=7)


def test_unigram_logprob_scores(spark):
    """Unigram-LM quality-score law re-derived in pure Python: top-V
    (count DESC, word ASC) vocabulary cut, p(w)=cnt/total with the 1/total
    OOV floor, per-doc mean NLL + oov_frac; NULL id/text and token-less
    docs keep sentinels; invariant to repartitioning."""
    import math
    from collections import Counter

    from ddsketchy_spark.pipeline.text import unigram_logprob_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the rare rarer rarest"),
        (3, ""),                       # no tokens -> sentinels
        (4, None),                     # NULL text -> sentinels
        (None, "the cat"),             # NULL id: not scored, not trained on
        (5, "cat  mat"),               # doubled space: empty token dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    V = 4                              # forces the OOV path + tie-break cut

    toks = {i: [w for w in (t or "").split(" ") if w]
            for i, t in rows if i is not None}
    cnt = Counter(w for ws in toks.values() for w in ws)
    total = float(sum(cnt.values()))
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:V])
    assert any(w not in vocab for ws in toks.values() for w in ws)
    exp = {}
    for i, ws in toks.items():
        if not ws:
            exp[i] = (0, -1.0, -1.0)
            continue
        lps = [math.log(vocab.get(w, 1)) - math.log(total) for w in ws]
        oov = [0.0 if w in vocab else 1.0 for w in ws]
        exp[i] = (len(ws), round(-sum(lps) / len(ws), 6),
                  round(sum(oov) / len(ws), 6))
    exp[None] = (0, -1.0, -1.0)

    for frame in (df, df.repartition(5)):
        got = {r["doc_id"]: (r["n_scored_tokens"], r["unigram_nll"],
                             r["oov_frac"])
               for r in unigram_logprob_scores(frame, vocab_size=V).collect()}
        assert got == exp


def test_bigram_logprob_scores(spark):
    """Stupid-backoff bigram LM law re-derived in pure Python: top-B
    (count DESC, pair ASC) bigram table scored count(w1,w2)/count(w1),
    everything else backoff*p_uni(w2) under the unigram scorer's vocab
    law; adjacency on the raw split array with both words non-empty;
    sentinels for unscoreable docs; invariant to repartitioning."""
    import math
    from collections import Counter

    from ddsketchy_spark.pipeline.text import bigram_logprob_scores

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat and the cat ran"),
        (3, "rare birds fly"),
        (4, ""),                 # no tokens -> sentinels
        (5, None),               # NULL text -> sentinels
        (None, "the cat"),       # NULL id: not scored, not trained on
        (6, "cat  mat"),         # doubled space breaks adjacency -> 0 pairs
        (7, "solo"),             # single token -> sentinels
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    V, B, A = 4, 3, 0.4          # small cuts force OOV + backoff paths

    toks = {i: (t or "").split(" ") for i, t in rows if i is not None}
    words = {i: [w for w in ws if w] for i, ws in toks.items()}
    cnt = Counter(w for ws in words.values() for w in ws)
    total = float(sum(cnt.values()))
    vocab = dict(sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:V])
    pairs_all: Counter = Counter()
    doc_pairs = {}
    for i, l in toks.items():
        ps = [(l[j], l[j + 1]) for j in range(len(l) - 1)
              if l[j] and l[j + 1]]
        doc_pairs[i] = ps
        pairs_all.update(ps)
    table = dict(sorted(pairs_all.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:B])
    # both fallback paths are live in this corpus
    assert any(p not in table for ps in doc_pairs.values() for p in ps)
    assert any(w2 not in vocab for ps in doc_pairs.values()
               for (_w1, w2) in ps if (_w1, w2) not in table)
    exp = {}
    for i, ps in doc_pairs.items():
        if not ps:
            exp[i] = (0, -1.0, -1.0)
            continue
        lps, bos = [], []
        for (w1, w2) in ps:
            if (w1, w2) in table:
                lps.append(math.log(table[(w1, w2)] / cnt[w1]))
                bos.append(0.0)
            else:
                lps.append(math.log(A) + math.log(float(vocab.get(w2, 1)))
                           - math.log(total))
                bos.append(1.0)
        exp[i] = (len(ps), round(-sum(lps) / len(ps), 6),
                  round(sum(bos) / len(ps), 6))
    exp[None] = (0, -1.0, -1.0)

    for frame in (df, df.repartition(5)):
        got = {r["doc_id"]: (r["n_bigrams"], r["bigram_nll"],
                             r["backoff_frac"])
               for r in bigram_logprob_scores(
                   frame, vocab_size=V, bigram_size=B, backoff=A).collect()}
        assert got == exp
    with pytest.raises(ValueError, match="backoff"):
        bigram_logprob_scores(df, backoff=0.0)


def test_token_count_regex_law(spark):
    """The regexp_count stopword/marker law must equal the split-on-space
    token-equality law on every boundary case: trailing newline is NOT a
    boundary (\\z, not $), doubled spaces produce empty never-matching
    tokens, prefixes ("its") don't count, consecutive stopwords both
    count, NULL stays NULL."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.text import STOPWORDS, _token_count_regex

    rows = [(1, "the"), (2, "the\n"), (3, "a  a"), (4, "its"),
            (5, "of the"), (6, ""), (7, None), (8, " a"), (9, "a "),
            (10, "x the"), (11, "the x"), (12, "to\nthe"),
            (13, "a a a"), (14, "the the"), (15, "isit is it")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    hof = F.size(F.filter(F.split(F.col("text"), " "),
                          lambda w: F.array_contains(stop_arr, w)))
    rx = F.regexp_count(F.col("text"), F.lit(_token_count_regex(STOPWORDS)))
    bad = df.select("doc_id", hof.alias("a"), rx.alias("b")) \
            .where("a <> b OR (a IS NULL) <> (b IS NULL)").collect()
    assert bad == []


def test_quality_filter_repetition_rules(spark):
    """Opt-in Gopher repetition drop rules: dup_ngram_{n} / dup_line trip
    at their thresholds, sit AFTER the base rules in precedence, and a
    non-repetitive doc stays kept."""
    from ddsketchy_spark.pipeline.text import quality_filter

    rows = [
        # bigrams [the cat]x3 [cat the]x2 -> dup frac 0.6 > 0.3
        (1, "the cat the cat the cat"),
        # distinct bigrams, duplicate LINE (1 - 2/3 = 0.333 > 0.3)
        (2, "first line one\nsecond line two\nfirst line one"),
        (3, "the quick brown fox jumps over the lazy dog"),   # kept
        # short_words must win over dup_ngram_2 (precedence)
        (4, "a b a b a b"),
    ]
    out = {r["doc_id"]: r for r in
           quality_filter(spark.createDataFrame(rows, "doc_id long, text string"),
                          max_dup_ngram_frac={2: 0.3},
                          max_dup_line_frac=0.3).collect()}
    assert out[1]["drop_reason"] == "dup_ngram_2"
    assert out[2]["drop_reason"] == "dup_line"
    assert out[3]["drop_reason"] == "kept" and out[3]["keep"]
    assert out[4]["drop_reason"] == "short_words"
    # without the opt-in kwargs both repetitive docs are kept (unchanged
    # default behavior — no repetition columns computed at all)
    base = quality_filter(spark.createDataFrame(rows[:2],
                          "doc_id long, text string"))
    assert "dup_line_frac" not in base.columns
    assert all(r["keep"] for r in base.collect())


def test_repetition_scores_metachar_sep(spark):
    """line_sep is a LITERAL separator: a regex-metachar separator like
    '. ' must split on dot-space, not on any-char-space (the F.split
    regex trap dedup_paragraphs already guards against)."""
    from ddsketchy_spark.pipeline.text import repetition_scores

    rows = [(1, "alpha beta. gamma delta. alpha beta")]
    out = repetition_scores(
        spark.createDataFrame(rows, "doc_id long, text string"),
        ns=(), line_sep=". ").collect()[0]
    # lines: [alpha beta, gamma delta, alpha beta] -> 1 - 2/3
    assert out["dup_line_frac"] == pytest.approx(0.333333)


def test_ngram_counts(spark):
    """n-gram construction, counting, top-k determinism, NULL/short-doc
    handling, n=1 and n=3."""
    from ddsketchy_spark.pipeline.text import ngram_counts

    rows = [(1, "a b c a b"), (2, "a b"), (3, None), (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bi = {r["ngram"]: r["cnt"] for r in ngram_counts(df, n=2).collect()}
    assert bi == {"a b": 3, "b c": 1, "c a": 1}
    uni = {r["ngram"]: r["cnt"] for r in ngram_counts(df, n=1).collect()}
    assert uni == {"a": 3, "b": 3, "c": 1, "solo": 1}
    tri = {r["ngram"]: r["cnt"] for r in ngram_counts(df, n=3).collect()}
    assert tri == {"a b c": 1, "b c a": 1, "c a b": 1}
    top = ngram_counts(df, n=2, top_k=2).collect()
    assert [(r["ngram"], r["cnt"]) for r in top] == [("a b", 3), ("b c", 1)]


def test_ivf_index_and_query(spark, sf001_dir, tmp_path):
    """Reusable IVF index persisted END TO END: write_ivf_index saves the
    member table partitionBy(cluster) plus the centroid sidecar via the
    Hadoop FS API; read_ivf_index restores BOTH bit-identically and the
    probe is served entirely from disk — partition pruning appears in the
    scan, each query finds itself at cos~1, and recall@1 vs exact holds
    with generous probing."""
    import numpy as _np
    import pytest as _pytest

    from ddsketchy_spark.pipeline.similarity import (
        ann_query, ann_query_ivf, ivf_index, read_ivf_index, write_ivf_index)

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    idx, cents = ivf_index(emb, n_clusters=8, train_rows=100)
    path = str(tmp_path / "ivf")
    write_ivf_index(idx, cents, path, extra_meta={"seed": 11})
    stored, cents_back, meta = read_ivf_index(spark, path)
    assert _np.array_equal(cents_back, cents)  # exact float round-trip
    assert meta["n_clusters"] == 8 and meta["dim"] == 64
    assert meta["seed"] == 11
    cents = cents_back  # serve the query purely from the on-disk artifact
    # a bare parquet dir without the sidecar is rejected loudly
    bare = str(tmp_path / "bare")
    idx.write.partitionBy("cluster").parquet(bare)
    with _pytest.raises(FileNotFoundError, match="_ivf_meta"):
        read_ivf_index(spark, bare)

    qrows = (emb.filter("vec_id IN (3, 11, 42)").orderBy("vec_id")
             .select("vec_id", "embedding").collect())
    qvecs = [r["embedding"] for r in qrows]
    res = ann_query_ivf(stored, cents, qvecs, k=5, n_probe=4,
                        query_ids=[3, 11, 42])
    # partition pruning: the probed-cluster filter reaches the scan
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "cluster IN" in plan or "cluster#" in plan
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {3, 11, 42}
    for qid in by_q:
        top = max(by_q[qid], key=lambda r: r["cos"])
        assert top["id"] == qid and top["cos"] == pytest.approx(1.0, abs=1e-9)
        assert len(by_q[qid]) == 5
    # recall@1 (excluding self) vs exact single-query scans
    hits = 0
    for qid, vec in zip([3, 11, 42], qvecs):
        exact = [r["vec_id"] for r in ann_query(emb, vec, k=2).collect()
                 if r["vec_id"] != qid][0]
        got = {r["id"] for r in by_q[qid]}
        hits += exact in got
    assert hits >= 2, hits


def test_ivf_index_append(spark, sf001_dir, tmp_path):
    """append_to_ivf_index folds new vectors in under the EXISTING
    centroids: the sidecar round-trips unchanged, appended rows land in
    the right cluster partitions (identical assignment law), probes find
    appended vectors, and dim-mismatched appends are refused."""
    import pytest as _pytest

    from ddsketchy_spark.pipeline.similarity import (
        append_to_ivf_index, ann_query_ivf, ivf_index, read_ivf_index,
        write_ivf_index)

    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    idx, cents = ivf_index(emb.filter("vec_id < 400"), n_clusters=8,
                           train_rows=100)
    path = str(tmp_path / "ivf_app")
    write_ivf_index(idx, cents, path)
    extra = emb.filter("vec_id >= 400").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    meta = append_to_ivf_index(extra, path)
    assert meta["n_clusters"] == 8
    stored, cents_back, _ = read_ivf_index(spark, path)
    assert stored.count() == 500
    # the appended vectors probe back to themselves through the stored
    # index (same assignment law -> they live in the partitions the
    # probe prunes to)
    qrows = (emb.filter("vec_id IN (410, 455)").orderBy("vec_id")
             .select("vec_id", "embedding").collect())
    res = ann_query_ivf(stored, cents_back, [r["embedding"] for r in qrows],
                        k=3, n_probe=8, query_ids=[10410, 10455])
    tops = {}
    for r in res.collect():
        cur = tops.get(r["query_id"])
        if cur is None or r["cos"] > cur[1]:
            tops[r["query_id"]] = (r["id"], r["cos"])
    assert tops[10410][0] == 10410 and tops[10410][1] > 0.999999
    assert tops[10455][0] == 10455 and tops[10455][1] > 0.999999
    bad = spark.createDataFrame([(1, [1.0, 2.0])],
                                "vec_id long, embedding array<double>")
    with _pytest.raises(ValueError, match="dim"):
        append_to_ivf_index(bad, path)


def test_ivf_retrain_recovers_recall(spark, tmp_path):
    """retrain_ivf_index (r4 verdict #5): after a shifted-distribution
    append, recall at fixed n_probe decays (appended blobs smear across
    the stale centroids); retraining over the FULL index recovers it.
    Generation bookkeeping and the sidecar-as-commit-marker refusal are
    pinned too."""
    import pytest as _pytest

    from ddsketchy_spark.pipeline.similarity import (
        ann_query_ivf, ivf_index, read_ivf_index, retrain_ivf_index,
        write_ivf_index)

    rng = np.random.default_rng(17)
    dim, per_blob = 8, 60

    def blob(direction, base_id):
        d = np.zeros(dim)
        d[direction % dim] = 1.0 if direction < dim else -1.0
        pts = d + rng.normal(0, 0.08, size=(per_blob, dim))
        return [(base_id + i, [float(x) for x in pts[i]])
                for i in range(per_blob)]

    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(
        sum([blob(i, 1000 * i) for i in range(4)], []), schema)
    idx, cents = ivf_index(base, n_clusters=4, train_rows=500, seed=3)
    path = str(tmp_path / "ivf_gen1")
    write_ivf_index(idx, cents, path)
    assert read_ivf_index(spark, path)[2]["generation"] == 1

    # drifted append: blobs along the NEGATIVE axes (base_id 1e5+)
    shifted_rows = sum(
        [blob(dim + i, 100_000 + 1000 * i) for i in range(4)], [])
    from ddsketchy_spark.pipeline.similarity import append_to_ivf_index
    append_to_ivf_index(spark.createDataFrame(shifted_rows, schema), path)

    truth = {}  # per shifted blob: its own members are the true top-5
    queries, qids = [], []
    for i in range(4):
        members = [r for r in shifted_rows
                   if 100_000 + 1000 * i <= r[0] < 100_000 + 1000 * i + per_blob]
        q = np.asarray(members[0][1])
        queries.append(q)
        qids.append(i)
        v = np.asarray([m[1] for m in members])
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        top = np.argsort(-(v @ (q / np.linalg.norm(q))))[:5]
        truth[i] = {members[j][0] for j in top}

    def recall(index_path):
        stored, c, _ = read_ivf_index(spark, index_path)
        res = ann_query_ivf(stored, c, queries, k=5, n_probe=1,
                            query_ids=qids)
        got = {}
        for r in res.collect():
            got.setdefault(r["query_id"], set()).add(r["id"])
        return np.mean([len(got.get(q, set()) & truth[q]) / 5.0
                        for q in qids])

    before = recall(path)
    path2 = str(tmp_path / "ivf_gen2")
    meta2 = retrain_ivf_index(spark, path, path2, n_clusters=8, seed=3,
                              train_rows=2000)
    after = recall(path2)
    assert after >= 0.9, (before, after)
    assert after > before, (before, after)
    assert meta2["generation"] == 2 and meta2["retrained_from"] == path
    assert read_ivf_index(spark, path)[2]["generation"] == 1  # old intact
    # mid-rewrite refusal: member files without the sidecar commit marker
    import shutil
    half = str(tmp_path / "ivf_half")
    shutil.copytree(path2, half)
    import os
    os.remove(os.path.join(half, "_ivf_meta.json"))
    with _pytest.raises(FileNotFoundError, match="_ivf_meta"):
        read_ivf_index(spark, half)
    with _pytest.raises(ValueError, match="NEW generation"):
        retrain_ivf_index(spark, path2, path2 + "/")


def test_word_jaccard_allpairs_randomized(spark):
    """Randomized completeness check of the prefix/size filters: on random
    corpora over a tiny vocabulary (hot tokens, repeated words, single-word
    and duplicate docs), allpairs == cartesian at several thresholds,
    including threshold 1.0."""
    rng = np.random.default_rng(123)
    vocab = ["a", "bb", "ccc", "dd", "e", "fff", "g", "hh"]
    for trial in range(6):
        n_docs = int(rng.integers(5, 25))
        rows = []
        for i in range(n_docs):
            ln = int(rng.integers(1, 12))
            rows.append((i, " ".join(rng.choice(vocab, size=ln))))
        if n_docs >= 2:
            rows[1] = (1, rows[0][1])  # planted exact dup
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        t = [0.3, 0.65, 1.0][trial % 3]
        cart = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
                word_jaccard_pairs(docs, threshold=t,
                                   method="cartesian").collect()}
        ap = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              word_jaccard_pairs(docs, threshold=t,
                                 method="allpairs").collect()}
        assert ap == cart, (trial, t)


def test_minhash_lsh_local_string_ids(spark, docs_with_dups):
    """The distributed verify engine must handle non-numeric doc ids (the
    input-hint schema uses string ids): planted exact dups still pair with
    est_jaccard 1.0, and the pair set equals the broadcast engine's."""
    docs = docs_with_dups.withColumn(
        "doc_id", F.concat(F.lit("doc-"), F.col("doc_id").cast("string")))
    kw = dict(num_perm=64, bands=16)
    lp = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
          minhash_lsh_pairs(docs, verify="local", **kw).collect()}
    bp = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
          minhash_lsh_pairs(docs, verify="broadcast", **kw).collect()}
    assert lp == bp and len(lp) > 0
    for i in range(20):
        pair = tuple(sorted((f"doc-{i}", f"doc-{i + 100000}")))
        assert lp.get(pair) == 1.0, pair


def test_clean_corpus_null_and_dup_ids(spark, sf001_dir):
    """Rows with a NULL doc id must BYPASS the near-dedup stage and survive
    (an equi-join would silently drop them), and duplicate ids must not
    multiply rows through the keep-set join."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    base = (spark.read.parquet(f"{sf001_dir}/documents.parquet")
            .filter("doc_id < 50").select("doc_id", "text", "source"))
    extra = spark.createDataFrame(
        [(None, "a perfectly ordinary document the of and to in it goes on "
          "with enough words to pass the quality gate easily", "t"),
         (777777, "first distinct body about owls the of and rivers with "
          "plenty of ordinary words to pass the gate", "t"),
         (777777, "second distinct body about quasars the of and pulsars "
          "with plenty of ordinary words to pass the gate", "t")],
        "doc_id long, text string, source string")
    corpus = base.unionByName(extra)
    out = clean_corpus(corpus,
                       near_dedup_kw={"verify": "local", "num_perm": 64,
                                      "bands": 16})
    rows = out.collect()
    assert sum(r["doc_id"] is None for r in rows) == 1
    assert sum(r["doc_id"] == 777777 for r in rows) == 2  # kept as one unit


def test_release_cached_deps(spark, docs_with_dups, sf001_dir):
    """The verify='local' engines tag their persisted intermediates on the
    (lazy) result so long-lived drivers can release them deterministically
    after materializing; since r6 the broadcast engine shares the
    distributed banding pipeline and tags its persisted signatures too."""
    from ddsketchy_spark.pipeline.cache import cached_deps, release_cached_deps
    from ddsketchy_spark.pipeline.dedup import dedup_near_text

    pairs = minhash_lsh_pairs(docs_with_dups, verify="local",
                              num_perm=32, bands=8)
    pairs.count()
    deps = cached_deps(pairs)
    assert len(deps) == 1 and deps[0].storageLevel.useMemory
    assert release_cached_deps(pairs) == 1
    assert not deps[0].storageLevel.useMemory
    assert release_cached_deps(pairs) == 0  # idempotent
    bp = minhash_lsh_pairs(docs_with_dups, verify="broadcast",
                           num_perm=32, bands=8)
    bdeps = cached_deps(bp)
    assert len(bdeps) == 1  # r6: persisted signatures, released the same way
    assert release_cached_deps(bp) == 1
    assert not bdeps[0].storageLevel.useMemory
    # composition propagates the tag end to end
    res = dedup_near_text(docs_with_dups, verify="local", num_perm=32,
                          bands=8)
    res.count()
    assert release_cached_deps(res) == 1
    # similarity: local engine tags, broadcast doesn't
    emb = spark.read.parquet(f"{sf001_dir}/embeddings.parquet")
    lp = lsh_cosine_topk(emb, k=2, n_planes=8, bands=4, dim=64,
                         verify="local")
    lp.count()
    assert release_cached_deps(lp) == 1


def test_release_cached_deps_on_derived_frame(spark, docs_with_dups):
    """Round-3 ADVICE hardening: a result that was FILTERED/PROJECTED after
    the engine returned it (the tag lives on the original Python object)
    still releases — the plan-walk fallback finds the registered cached
    intermediate inside the derived frame's plan. Untagged, unrelated
    frames warn and release nothing."""
    import pytest as _pytest

    from ddsketchy_spark.pipeline.cache import cached_deps, release_cached_deps

    pairs = minhash_lsh_pairs(docs_with_dups, verify="local",
                              num_perm=32, bands=8)
    derived = pairs.where("est_jaccard >= 0.99").select("id_a")
    derived.count()
    dep = cached_deps(pairs)[0]
    assert cached_deps(derived) == []           # tag didn't survive — by design
    assert release_cached_deps(derived) == 1    # plan-walk fallback did
    assert not dep.storageLevel.useMemory
    # an unrelated, never-cached frame warns and returns 0
    with _pytest.warns(UserWarning, match="no cached intermediates"):
        assert release_cached_deps(docs_with_dups.limit(3)) == 0


def test_pipeline_ops_on_empty_input(spark):
    """Every pipeline operator must return an empty (not crashing) result
    on an empty corpus — the first micro-batch of any real pipeline."""
    from ddsketchy_spark.pipeline.dedup import dedup_near_text
    from ddsketchy_spark.pipeline.similarity import ann_query_batch
    from ddsketchy_spark.pipeline.text import ngram_counts, quality_filter
    from ddsketchy_spark.spark.skew import sample_by_group

    docs = spark.createDataFrame([], "doc_id long, text string")
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert minhash_lsh_pairs(docs, verify="local", num_perm=32,
                             bands=8).count() == 0
    assert minhash_lsh_pairs(docs, verify="broadcast", num_perm=32,
                             bands=8).count() == 0
    assert word_jaccard_pairs(docs, method="allpairs").count() == 0
    assert dedup_near_text(docs, verify="local").count() == 0
    assert quality_filter(docs).count() == 0
    assert ngram_counts(docs).count() == 0
    assert sample_by_group(docs, ["doc_id"], 3, "doc_id").count() == 0
    assert ann_query_batch(emb, np.ones((1, 4))).count() == 0


def test_multimodal_features_through_batch_ann(spark):
    """Media features (deterministic fake extractor over binary payloads)
    flow through the batched ANN engine: duplicate payloads are each
    other's top neighbor at cos~1 — the media near-dup retrieval path."""
    from ddsketchy_spark.pipeline.multimodal import (
        fake_feature_extract, synth_media)
    from ddsketchy_spark.pipeline.similarity import ann_query_batch

    media = synth_media(spark, n=32, seed=7)
    # plant an exact payload duplicate of media 0 under a new id
    dup = (media.limit(1)
           .withColumn("media_id", F.lit("dup-of-first")))
    feats = (fake_feature_extract(media.unionByName(dup), dim=16)
             .select("media_id",
                     F.col("features").cast("array<double>").alias("emb")))
    q0 = feats.where(F.col("media_id") == "dup-of-first") \
              .first()["emb"]
    rows = ann_query_batch(feats, [q0], vec_col="emb", id_col="media_id",
                           k=2).collect()
    assert len(rows) == 2
    top = sorted(rows, key=lambda r: -r["cos"])
    got_ids = {r["media_id"] for r in top}
    assert "dup-of-first" in got_ids
    orig = media.first()["media_id"]
    assert orig in got_ids
    assert all(r["cos"] == pytest.approx(1.0, abs=1e-9) for r in top)


def test_decontaminate(spark, sf001_dir):
    """Benchmark decontamination: a corpus doc containing a benchmark
    n-gram verbatim is dropped; untouched docs survive; NULL text passes;
    the pair list names exactly the contaminated (corpus, bench) pairs."""
    from ddsketchy_spark.pipeline.text import contamination_pairs, decontaminate

    base = spark.read.parquet(f"{sf001_dir}/documents.parquet") \
        .select("doc_id", "text")
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta"),
         (1, "one two three four five six")],
        "doc_id long, text string")
    # plant: doc 900001 quotes bench doc 0's 6-gram inside other text,
    # doc 900002 is clean, doc 900003 has NULL text
    planted = spark.createDataFrame(
        [(900001, "prefix words alpha beta gamma delta epsilon zeta suffix"),
         (900002, "totally original content with no quoted benchmark text"),
         (900003, None)],
        "doc_id long, text string")
    corpus = base.unionByName(planted)
    pairs = {(r["corpus_id"], r["bench_id"]) for r in
             contamination_pairs(corpus, bench, n=6).collect()}
    assert (900001, 0) in pairs
    assert not any(c == 900002 or c == 900003 for c, _ in pairs)
    clean = decontaminate(corpus, bench, n=6)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert 900001 not in kept and 900002 in kept and 900003 in kept
    assert clean.count() == corpus.count() - len({c for c, _ in pairs})


def test_redact_pii(spark):
    """Emails, IPv4s, phone numbers -> placeholders with per-type counts;
    NULL text passes through; clean text untouched."""
    from ddsketchy_spark.pipeline.text import redact_pii

    rows = [
        (1, "contact me at jane.doe+x@example.org or bob@sub.example.co"),
        (2, "server 10.0.0.1 and 192.168.1.255 are down"),
        (3, "call +1 555-123-4567 now"),
        (4, "mixed: a@b.io from 8.8.8.8 dial +44 20 7946 0958"),
        (5, "perfectly clean sentence"),
        (6, None),
    ]
    out = {r["doc_id"]: r for r in
           redact_pii(spark.createDataFrame(rows, "doc_id long, text string")
                      ).collect()}
    assert out[1]["n_email"] == 2 and "[EMAIL]" in out[1]["text_redacted"]
    assert "@" not in out[1]["text_redacted"]
    assert out[2]["n_ip"] == 2 and out[2]["text_redacted"].count("[IP]") == 2
    assert out[3]["n_phone"] == 1 and "[PHONE]" in out[3]["text_redacted"]
    assert out[4]["n_pii"] == 3
    assert out[5]["n_pii"] == 0 and out[5]["text_redacted"] == rows[4][1]
    assert out[6]["text_redacted"] is None and out[6]["n_pii"] == 0


def test_clean_corpus_composition(spark, sf001_dir):
    """The one-call pipeline: PII redacted in surviving text, low-quality
    and duplicate docs gone (planted copy loses to the original),
    benchmark-contaminated docs gone, clean docs survive."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    base = spark.read.parquet(f"{sf001_dir}/documents.parquet") \
        .select("doc_id", "text", "source")
    planted = spark.createDataFrame(
        [(800001, "x " * 2, "t"),                      # too few words
         (800002, None, "t"),                          # null text
         (800003, "email me at a@b.io " + "steady flow of ordinary the "
          "words goes on and on here for a while longer", "t")],
        "doc_id long, text string, source string")
    dup = (base.filter("doc_id = 3")
           .withColumn("doc_id", F.lit(800004).cast("long")))
    bench = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(20)))], "doc_id long, text string")
    contaminated = spark.createDataFrame(
        [(800005, "prologue " + " ".join(f"w{i}" for i in range(13))
          + " epilogue words continue here beyond the quoted span of it")],
        "doc_id long, text string").withColumn("source", F.lit("t"))
    corpus = base.unionByName(planted).unionByName(dup) \
                 .unionByName(contaminated)
    out = clean_corpus(corpus, benchmark=bench,
                       quality_kw={"min_words": 5},
                       near_dedup_kw={"threshold": 0.9, "num_perm": 64,
                                      "bands": 16, "verify": "local"})
    rows = {r["doc_id"]: r for r in out.collect()}
    assert 800001 not in rows and 800002 not in rows   # quality-dropped
    assert 800004 not in rows and 3 in rows            # dup loses to orig
    assert 800005 not in rows                          # decontaminated
    assert 800003 in rows
    assert "[EMAIL]" in rows[800003]["text"] and "@" not in rows[800003]["text"]
    assert set(out.columns) == {"doc_id", "text", "source"}
    assert len(rows) > 400  # the bulk of the corpus survives


def test_clean_corpus_with_domain_cut(spark):
    """clean_corpus's optional per-domain quality-cut stage: after
    cleaning, each source keeps only its top-frac rows by the rank
    column; the stage composes with the mixture stage downstream."""
    from ddsketchy_spark.pipeline.compose import clean_corpus

    rows = [(i, "document body %d with the usual words and a few more "
             "filler%d tokens here" % (i, i),
             "A" if i < 40 else "B", float(i % 40))
            for i in range(80)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, qscore double")
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       near_dedup_kw={"skip": True},
                       domain_cut_kw={"frac": 0.25, "rank_col": "qscore"})
    got = out.groupBy("source").count().collect()
    per = {r["source"]: r["count"] for r in got}
    # 40 rows/source, scores 0..39 distinct -> exactly ceil(0.25*40)=10
    assert per == {"A": 10, "B": 10}
    assert out.where("qscore < 30").count() == 0
    # composes with the mixture stage (n_copies appears downstream)
    out2 = clean_corpus(df, quality_kw={"min_words": 3},
                        near_dedup_kw={"skip": True},
                        domain_cut_kw={"frac": 0.25, "rank_col": "qscore"},
                        mix_budgets={"A": 50.0, "B": 50.0},
                        mix_kw={"token_col": "qscore"})
    assert "n_copies" in out2.columns and out2.count() > 0


def test_substring_overlap_pairs_guarantee(spark):
    """The winnowing detection guarantee: any pair sharing a verbatim run
    of >= min_len chars is reported; clearly distinct docs are not; more
    shared runs -> more shared fingerprints; max_fp_docs caps boilerplate."""
    import numpy as np

    from ddsketchy_spark.pipeline.dedup import substring_overlap_pairs

    rng = np.random.default_rng(3)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    span = rand_text(64)
    span2 = rand_text(64)
    rows = [
        (1, rand_text(100) + span + rand_text(80)),
        (2, span + rand_text(150)),                    # shares span w/ 1
        (3, rand_text(60) + span + span2 + rand_text(40)),  # shares both
        (4, rand_text(300)),                           # distinct
        (5, rand_text(20) + span2 + rand_text(90)),    # shares span2 w/ 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["n_shared_fps"]
           for r in substring_overlap_pairs(df, min_len=64).collect()}
    for pair in [(1, 2), (1, 3), (2, 3), (3, 5)]:
        assert pair in got, (pair, got)
    assert all(4 not in p for p in got)
    assert (4, 5) not in got and (1, 5) not in got and (2, 5) not in got
    # doc 3 shares BOTH spans with nobody jointly, but (1,3) and (3,5)
    # each rest on one span; a doc pair sharing two spans scores higher:
    six = df.union(spark.createDataFrame(
        [(6, span + rand_text(30) + span2)], "doc_id long, text string"))
    got6 = {(r["id_a"], r["id_b"]): r["n_shared_fps"]
            for r in substring_overlap_pairs(six, min_len=64).collect()}
    assert got6[(3, 6)] > got6[(3, 4)] if (3, 4) in got6 else got6[(3, 6)] >= 2
    # boilerplate cap: the span appears in docs 1,2,3,6 -> fps shared by
    # >3 docs vanish under max_fp_docs=3... pairs resting only on such
    # fps disappear
    capped = {(r["id_a"], r["id_b"]) for r in
              substring_overlap_pairs(six, min_len=64,
                                      max_fp_docs=1).collect()}
    assert capped == set()
    import pytest as pt
    with pt.raises(ValueError, match="min_len"):
        substring_overlap_pairs(df, min_len=4)


def test_dedup_substring_clusters(spark):
    """Doc-level policy over span evidence: chained span sharing clusters
    via connected components; min-id (or keep_by) survivor; NULL id
    passes through."""
    import numpy as np

    from ddsketchy_spark.pipeline.dedup import dedup_substring

    rng = np.random.default_rng(9)

    def rand_text(n):
        return "".join(chr(97 + c) for c in rng.integers(0, 26, n))

    s1, s2 = rand_text(64), rand_text(64)
    rows = [
        (10, s1 + rand_text(100), 0.1),
        (11, rand_text(50) + s1 + s2, 0.9),   # links 10 via s1, 12 via s2
        (12, s2 + rand_text(120), 0.5),
        (13, rand_text(250), 0.7),            # singleton
        (None, s1 + rand_text(40), 0.2),      # NULL id: passes
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, q double")
    out = {r["doc_id"]: (r["component"], r["keep"])
           for r in dedup_substring(df, min_len=64).collect()}
    assert out[10] == (10, True) and out[11] == (10, False)
    assert out[12] == (10, False) and out[13] == (13, True)
    assert out[None] == (None, True)
    # keep_by: the 0.9-quality member wins the cluster instead of min id
    out2 = {r["doc_id"]: r["keep"]
            for r in dedup_substring(df, min_len=64, keep_by="q").collect()}
    assert out2[11] and not out2[10] and not out2[12] and out2[13]


def test_word_jaccard_broadcast_matches_shuffle_plan(spark, sf001_dir):
    """r6: the bounded-corpus broadcast plan (with its NumPy collect-verify
    kernel), the broadcast plan with JOIN verification, and the all-shuffle
    plan of the AllPairs join return identical pairs and jaccard values."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup import word_jaccard_pairs

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    dup = docs.unionByName(
        docs.filter("doc_id < 20")
        .withColumn("doc_id", F.col("doc_id") + 100000))
    bro = word_jaccard_pairs(dup, threshold=0.8)          # collect-verify
    jon = word_jaccard_pairs(dup, threshold=0.8,          # broadcast joins
                             collect_verify_tokens=None)
    shf = word_jaccard_pairs(dup, threshold=0.8, broadcast_docs=0)
    got = sorted(map(tuple, bro.collect()))
    join_got = sorted(map(tuple, jon.collect()))
    want = sorted(map(tuple, shf.collect()))
    assert got == want and len(got) > 0
    assert join_got == want
    release_cached_deps(bro)
    release_cached_deps(jon)
    # NaN DOUBLE ids: the collect kernel cannot normalize NaN dict keys,
    # so the engine must fall back to the join plan (whose NaN-normalizing
    # join semantics define the law) — results equal the shuffle plan's
    nan = float("nan")
    ndocs = spark.createDataFrame(
        [(1.0, "p q r s"), (2.0, "p q r s"), (nan, "p q r s"), (3.0, "x y")],
        "doc_id double, text string")
    got_n = word_jaccard_pairs(ndocs, threshold=0.9).collect()
    want_n = word_jaccard_pairs(ndocs, threshold=0.9,
                                broadcast_docs=0).collect()
    def key(rows):
        return sorted((str(r["id_a"]), str(r["id_b"]), r["jaccard"])
                      for r in rows)
    assert key(got_n) == key(want_n) and len(got_n) >= 1


def test_connected_components_driver_matches_distributed(spark):
    """r6: the bounded-graph driver labeling (collected edges, NumPy
    min-label contraction) must produce exactly the distributed rounds'
    labels on randomized graphs, string-id graphs, and chains."""
    import numpy as np

    from ddsketchy_spark.pipeline.dedup import connected_components

    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(2, 40))
        m = int(rng.integers(1, 80))
        edges = [(int(rng.integers(0, n)), int(rng.integers(0, n)))
                 for _ in range(m)] + [(i, i + 1) for i in range(0, n - 1, 3)]
        df = spark.createDataFrame(edges, "src long, dst long")
        drv = {r["node"]: r["comp"] for r in
               connected_components(df).collect()}
        dist = {r["node"]: r["comp"] for r in
                connected_components(df, driver_collect_edges=None).collect()}
        assert drv == dist, trial
    sdf = spark.createDataFrame([("a", "b"), ("b", "c"), ("x", "y")],
                                "src string, dst string")
    drv = {r["node"]: r["comp"] for r in connected_components(sdf).collect()}
    assert drv == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    # a NULL node id falls back to the distributed path (same labels)
    ndf = spark.createDataFrame([(1, 2), (None, 3)], "src long, dst long")
    drv = {tuple(r) for r in connected_components(ndf).collect()}
    dist = {tuple(r) for r in
            connected_components(ndf, driver_collect_edges=None).collect()}
    assert drv == dist


def test_bpe_round1_cast_invariance(spark):
    """r6: round 1 counts pairs off the native arrays; training on int
    arrays must produce exactly the merges of the same data as strings
    (same counts, same tie order via the string cast)."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.bpe import train_bpe_merges

    rows = [([1, 2, 1, 2, 3, 9, 10],), ([2, 1, 2, 1, 2],),
            ([9, 10, 9, 10],), ([5],), (None,)]
    ints = spark.createDataFrame(rows, "tokens array<int>")
    strs = ints.withColumn("tokens", F.col("tokens").cast("array<string>"))
    mi = [tuple(r) for r in train_bpe_merges(
        ints, "tokens", n_merges=3, min_count=2, validate=False).collect()]
    ms = [tuple(r) for r in train_bpe_merges(
        strs, "tokens", n_merges=3, min_count=2, validate=False).collect()]
    assert mi == ms and len(mi) >= 2
