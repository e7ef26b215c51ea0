"""Product quantization (pipeline/pq.py): codebook training, encode
round-trip, ADC query law, index persistence, and the IVF-PQ (IVFADC)
composition.

The load-bearing law: with every row in the training sample and
2**nbits >= n rows, k-means seeds each point as its own centroid and
Lloyd keeps it there — reconstruction is EXACT, so the ADC score equals
the exact cosine and the whole PQ pipeline can be compared bit-for-bit
against the brute-force baseline (not just via recall thresholds)."""

import numpy as np
import pytest


def _load_emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _mini_emb(spark, n=40, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, dim))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _blobs(spark, n_blobs=6, per_blob=50, dim=16, seed=9):
    """Well-separated Gaussian blobs: blob b of row i is i // per_blob."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, dim)) * 4.0
    rows = []
    for b in range(n_blobs):
        pts = centers[b] + rng.normal(0, 0.2, size=(per_blob, dim))
        rows += [(b * per_blob + i, [float(x) for x in pts[i]])
                 for i in range(per_blob)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_codebooks_deterministic_and_guards(spark, sf001_dir):
    from ddsketchy_spark.pipeline.pq import train_pq_codebooks

    emb = _load_emb(spark, sf001_dir)
    b1 = train_pq_codebooks(emb, m=8, nbits=4, train_rows=120, seed=3)
    b2 = train_pq_codebooks(emb.repartition(7), m=8, nbits=4,
                            train_rows=120, seed=3)
    assert b1.shape == (8, 16, 8)
    # pure function of the data: identical books on any partitioning
    assert (b1 == b2).all()
    with pytest.raises(ValueError, match="nbits"):
        train_pq_codebooks(emb, nbits=9)
    with pytest.raises(ValueError, match="not divisible"):
        train_pq_codebooks(emb, m=7)
    with pytest.raises(ValueError, match="no non-null"):
        train_pq_codebooks(emb.where("vec_id IS NULL"))


def test_pq_exact_regime_matches_brute_force(spark):
    """All 40 rows in the training sample + 256 codes per subspace =>
    each row is its own centroid: codes decode exactly, ADC == cosine,
    and ann_query_pq returns the brute-force answer bit-for-bit."""
    from ddsketchy_spark.pipeline.pq import (
        ann_query_pq, pq_encode, pq_reconstruct, train_pq_codebooks)

    emb = _mini_emb(spark)
    books = train_pq_codebooks(emb, m=4, nbits=8, train_rows=1000, seed=2)
    enc = pq_encode(emb, books)
    rows = {r["id"]: r["codes"] for r in enc.collect()}
    assert len(rows) == 40 and all(len(c) == 4 for c in rows.values())

    X = np.asarray([r["embedding"] for r in
                    emb.orderBy("vec_id").collect()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for i in range(40):
        assert np.allclose(pq_reconstruct(books, rows[i]), Xn[i],
                           atol=1e-12)

    qvecs = X[:3]
    res = ann_query_pq(enc, books, qvecs, k=5, query_ids=[0, 1, 2])
    got = {(r["query_id"], r["id"]): r["score"] for r in res.collect()}
    sims = Xn @ (qvecs / np.linalg.norm(qvecs, axis=1,
                                        keepdims=True)).T  # (n, 3)
    for qi in range(3):
        order = sorted(range(40), key=lambda i: (-sims[i, qi], i))[:5]
        expect = {(qi, i) for i in order}
        assert {k for k in got if k[0] == qi} == expect
        for i in order:
            assert got[(qi, i)] == pytest.approx(sims[i, qi], abs=1e-9)
    # self-find: each query is row qi, cos 1 with itself
    for qi in range(3):
        assert got[(qi, qi)] == pytest.approx(1.0, abs=1e-9)


def test_pq_encode_excludes_nulls_and_is_partition_invariant(spark):
    from ddsketchy_spark.pipeline.pq import pq_encode, train_pq_codebooks

    emb = _mini_emb(spark)
    with_nulls = emb.union(spark.createDataFrame(
        [(None, [0.0] * 16), (99, None)],
        "vec_id long, embedding array<double>"))
    books = train_pq_codebooks(emb, m=4, nbits=4, seed=2)
    a = {r["id"]: r["codes"] for r in pq_encode(with_nulls, books).collect()}
    b = {r["id"]: r["codes"]
         for r in pq_encode(with_nulls.repartition(5), books).collect()}
    assert a == b and len(a) == 40 and None not in a and 99 not in a


def test_ann_query_pq_recall_on_blobs(spark):
    """Lossy regime (nbits=4: 16 codes/subspace over 300 rows): a tight
    blob collapses to one code, so within-blob order is gone BY DESIGN —
    what must survive 32x compression is the blob structure itself:
    every candidate a query returns comes from the query's own blob."""
    from ddsketchy_spark.pipeline.pq import (
        ann_query_pq, pq_encode, train_pq_codebooks)

    emb = _blobs(spark)
    books = train_pq_codebooks(emb, m=4, nbits=4, train_rows=1000, seed=4)
    enc = pq_encode(emb, books)
    X = np.asarray([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    qids = list(range(0, 300, 25))
    res = ann_query_pq(enc, books, X[qids], k=3, query_ids=qids)
    by_q: dict = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], set()).add(r["id"])
    hits = 0
    for qi in qids:
        cands = by_q.get(qi, set())
        hits += len(cands) == 3 and all(c // 50 == qi // 50 for c in cands)
    assert hits >= int(0.9 * len(qids)), f"blob recall {hits}/{len(qids)}"


def test_pq_index_roundtrip_and_guards(spark, tmp_path):
    from ddsketchy_spark.pipeline.pq import (
        ann_query_pq, pq_encode, read_pq_index, train_pq_codebooks,
        write_pq_index)

    emb = _mini_emb(spark)
    books = train_pq_codebooks(emb, m=4, nbits=8, train_rows=1000, seed=2)
    enc = pq_encode(emb, books)
    path = str(tmp_path / "pq")
    with pytest.raises(ValueError, match="reserved"):
        write_pq_index(enc, books, path, extra_meta={"m": 2})
    write_pq_index(enc, books, path, extra_meta={"seed": 2})
    stored, books_back, meta = read_pq_index(spark, path)
    assert (books_back == books).all()
    assert meta["seed"] == 2 and meta["dim"] == 16 and meta["generation"] == 1
    X = np.asarray([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    live = {(r["query_id"], r["id"]): r["score"]
            for r in ann_query_pq(enc, books, X[:2], k=4).collect()}
    disk = {(r["query_id"], r["id"]): r["score"]
            for r in ann_query_pq(stored, books_back, X[:2], k=4).collect()}
    assert live == disk
    bare = str(tmp_path / "bare")
    enc.write.parquet(bare)
    with pytest.raises(FileNotFoundError, match="_pq_meta"):
        read_pq_index(spark, bare)


def test_ivf_pq_exact_regime_parity(spark):
    """Exact-reconstruction regime + probing every cluster: IVFADC
    scores equal the exact cosine, so the result set is the brute-force
    answer — the composition adds pruning, never a different law."""
    from ddsketchy_spark.pipeline.pq import ann_query_ivf_pq, ivf_pq_index

    emb = _mini_emb(spark)
    idx, cents, books = ivf_pq_index(emb, n_clusters=4, m=4, nbits=8,
                                     train_rows=1000, seed=2)
    X = np.asarray([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    res = ann_query_ivf_pq(idx, cents, books, X[:3], k=5,
                           n_probe=4, query_ids=[0, 1, 2])
    got = {(r["query_id"], r["id"]): r["score"] for r in res.collect()}
    sims = Xn @ Xn[:3].T
    for qi in range(3):
        order = sorted(range(40), key=lambda i: (-sims[i, qi], i))[:5]
        assert {k for k in got if k[0] == qi} == {(qi, i) for i in order}
        for i in order:
            assert got[(qi, i)] == pytest.approx(sims[i, qi], abs=1e-9)


def test_ivf_pq_index_disk_roundtrip_and_recall(spark, tmp_path):
    """End to end from disk: build, persist partitionBy(cluster) + one
    sidecar, reload, probe 2 of 6 lists. Residual codes (unlike the flat
    PQ of test_ann_query_pq_recall_on_blobs) retain WITHIN-blob signal:
    every query finds itself at score~1, every candidate is in the
    query's own blob, and the true nearest neighbor is usually in the
    top-3 (within-blob cosine gaps are ~1e-3 here, right at the
    quantization noise floor, so recall@1 is thresholded not exact)."""
    from ddsketchy_spark.pipeline.pq import (
        ann_query_ivf_pq, ivf_pq_index, read_ivf_pq_index,
        write_ivf_pq_index)

    emb = _blobs(spark)
    idx, cents, books = ivf_pq_index(emb, n_clusters=6, m=8, nbits=8,
                                     train_rows=1000, seed=4)
    path = str(tmp_path / "ivfpq")
    with pytest.raises(ValueError, match="reserved"):
        write_ivf_pq_index(idx, cents, books, path,
                           extra_meta={"centroids": []})
    write_ivf_pq_index(idx, cents, books, path, extra_meta={"seed": 4})
    stored, cents_b, books_b, meta = read_ivf_pq_index(spark, path)
    assert (cents_b == cents).all() and (books_b == books).all()
    assert meta["n_clusters"] == 6 and meta["kind"] == "ivf_pq"
    # the partition column round-trips: probes prune on cluster=...
    assert "cluster" in stored.columns
    X = np.asarray([r["embedding"] for r in emb.orderBy("vec_id").collect()])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qids = list(range(0, 300, 30))
    res = ann_query_ivf_pq(stored, cents_b, books_b, X[qids], k=3,
                           n_probe=2, query_ids=qids)
    by_q: dict = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], set()).add(r["id"])
    sims = Xn @ Xn[qids].T
    hits = 0
    for col, qi in enumerate(qids):
        cands = by_q.get(qi, set())
        assert qi in cands, f"query {qi} did not find itself"
        assert all(c // 50 == qi // 50 for c in cands)
        s = sims[:, col].copy()
        s[qi] = -2.0
        hits += int(s.argmax()) in cands
    assert hits >= int(0.7 * len(qids)), f"recall@1 {hits}/{len(qids)}"
    bare = str(tmp_path / "bare2")
    idx.write.parquet(bare)
    with pytest.raises(FileNotFoundError, match="_ivf_pq_meta"):
        read_ivf_pq_index(spark, bare)


def test_ivf_pq_guards(spark):
    from ddsketchy_spark.pipeline.pq import ann_query_ivf_pq, ivf_pq_index

    emb = _mini_emb(spark)
    with pytest.raises(ValueError, match="nbits"):
        ivf_pq_index(emb, nbits=0)
    with pytest.raises(ValueError, match="not divisible"):
        ivf_pq_index(emb, m=5)
    idx, cents, books = ivf_pq_index(emb, n_clusters=4, m=4, nbits=4,
                                     train_rows=1000, seed=2)
    with pytest.raises(ValueError, match="dim"):
        ann_query_ivf_pq(idx, cents, books, np.zeros((1, 8)))
    with pytest.raises(ValueError, match="query_ids"):
        ann_query_ivf_pq(idx, cents, books, np.zeros((2, 16)),
                         query_ids=[1])


def test_ivf_pq_index_append(spark, tmp_path):
    """append_to_ivf_pq_index folds new vectors in under the EXISTING
    centroids + codebooks: appended members land in the cluster=...
    partitions, probe back under the identical law (each finds itself at
    the top score), and dim mismatches are refused."""
    from ddsketchy_spark.pipeline.pq import (
        ann_query_ivf_pq, append_to_ivf_pq_index, ivf_pq_index,
        read_ivf_pq_index, write_ivf_pq_index)

    emb = _blobs(spark)
    # train on the evens, append the odds: the increment is IN
    # distribution (an out-of-distribution increment degrades by design
    # — that is the documented drift caveat, remedied by a rebuild)
    idx, cents, books = ivf_pq_index(emb.filter("vec_id % 2 = 0"),
                                     n_clusters=6, m=8, nbits=8,
                                     train_rows=1000, seed=4)
    path = str(tmp_path / "ivfpq_app")
    write_ivf_pq_index(idx, cents, books, path)
    extra = emb.filter("vec_id % 2 = 1")
    meta = append_to_ivf_pq_index(extra, path)
    assert meta["n_clusters"] == 6
    stored, cents_b, books_b, _ = read_ivf_pq_index(spark, path)
    assert stored.count() == 300
    xrows = extra.orderBy("vec_id").collect()
    X = np.asarray([r["embedding"] for r in xrows])
    pos = list(range(0, 150, 30))
    qids = [int(xrows[p]["vec_id"]) for p in pos]
    res = ann_query_ivf_pq(stored, cents_b, books_b, X[pos],
                           k=3, n_probe=2, query_ids=qids)
    got = {(r["query_id"], r["id"]): r["score"] for r in res.collect()}
    # the real append guarantee is LAW PARITY: base and appended members
    # score under the identical q·centroid + ADC(residual) rule — within
    # a tight blob the quantization noise (~1e-3) exceeds the true
    # cosine gaps, so "self at rank 1" is NOT a property of the design.
    # Re-derive the probe from the stored members in NumPy.
    from ddsketchy_spark.pipeline.pq import _adc_lut, _adc_scores

    member = stored.select("id", "cluster", "codes").collect()
    ids = np.asarray([r["id"] for r in member])
    cl = np.asarray([r["cluster"] for r in member], dtype=np.int64)
    codes = np.stack([np.frombuffer(r["codes"], dtype=np.uint8)
                      for r in member])
    Qn = X[pos] / np.linalg.norm(X[pos], axis=1, keepdims=True)
    coarse = Qn @ cents_b.T
    probes = np.argsort(-coarse, axis=1)[:, :2]
    sims = _adc_scores(_adc_lut(Qn, books_b), codes) + coarse.T[cl]
    law = {}
    for c, qi in enumerate(qids):
        elig = [i for i in range(len(ids)) if cl[i] in probes[c]]
        for i in sorted(elig, key=lambda i: (-sims[i, c], ids[i]))[:3]:
            law[(qi, int(ids[i]))] = sims[i, c]
    assert set(got) == set(law)
    for k2 in law:
        assert got[k2] == pytest.approx(law[k2], abs=1e-9)
    # every candidate comes from the query's own blob (appended rows are
    # indistinguishable from base rows to the probe)
    assert all(i // 50 == qi // 50 for (qi, i) in got)
    bad = spark.createDataFrame([(999, [0.0] * 8)],
                                "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        append_to_ivf_pq_index(bad, path)
