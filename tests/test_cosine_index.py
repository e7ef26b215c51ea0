"""Incremental cosine-LSH (semantic) dedup index (pipeline/dedup_index.py).

The law under test: probing an increment of embeddings against an index
of corpus A reports exactly the cross pairs the batch engine
(lsh_cosine_topk verify="local" / dedup_semantic(method="lsh")) would
report on A u B, with bit-identical cosines (shared enrichment + einsum
scoring code); dedup_against_cosine_index composes corpus-match dropping
with within-increment semantic dedup; append_to_cosine_index folds
survivors in for the next round.
"""

import math

import pytest

from pyspark.sql import functions as F

KW = dict(n_planes=16, bands=4, seed=7)
DIM = 8


def _vec(i, scale=1.0):
    # near-orthogonal corpus geometry: basis vector i with a tiny fixed
    # tail so no component is exactly zero (sign bits stay deterministic)
    v = [0.01 * (j + 1) for j in range(DIM)]
    v[i % DIM] = 10.0
    return [x * scale for x in v]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i + 1, _vec(i)) for i in range(6)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    from ddsketchy_spark.pipeline.dedup_index import write_cosine_index

    path = str(tmp_path_factory.mktemp("cosidx") / "index")
    meta = write_cosine_index(corpus, path, **KW)
    assert meta["n_vecs"] == 6 and meta["width"] == 4 and meta["dim"] == DIM
    return path


def _increment(spark):
    rows = [
        (101, _vec(0, scale=2.0)),   # scaled copy of corpus vec 1 (cos 1)
        (102, _vec(2)),              # exact copy of corpus vec 3
        (103, [-x for x in _vec(4)]),  # negation: cos -1, never a match
        (104, _vec(1, scale=-3.0)),  # internal dup pair, absent from corpus
        (105, _vec(1, scale=-1.5)),  # (negated corpus vec 2: cos -1 to it)
        (None, _vec(0)),             # NULL id: never probed, passes through
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cross_pairs_match_batch_engine(spark, corpus, index_path):
    """Index probe == batch engine on the union, restricted to cross
    pairs — same candidate set, bit-identical cosines, in both the
    broadcast-increment and shuffle plans."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        cosine_pairs_against_index)
    from ddsketchy_spark.pipeline.similarity import lsh_cosine_topk

    inc = _increment(spark)
    union = corpus.unionByName(inc.where("vec_id IS NOT NULL"))
    topk = lsh_cosine_topk(union, k=100, verify="local", **KW)
    batch_cross = {
        (min(r["id"], r["neighbor"]), max(r["id"], r["neighbor"])): r["cos"]
        for r in topk.collect()
        if (r["id"] > 100) != (r["neighbor"] > 100)}
    release_cached_deps(topk)
    assert len(batch_cross) >= 2  # at least the two planted copies
    for bc in (True, False):
        probe = cosine_pairs_against_index(
            inc, index_path, broadcast_increment=bc)
        got = {(min(r["id_inc"], r["id_corpus"]),
                max(r["id_inc"], r["id_corpus"])): r["cos"]
               for r in probe.collect()}
        release_cached_deps(probe)
        assert got == batch_cross, f"broadcast_increment={bc}"
    # the planted copies score (numerically) 1.0
    assert math.isclose(batch_cross[(1, 101)], 1.0, rel_tol=0, abs_tol=1e-12)
    assert math.isclose(batch_cross[(3, 102)], 1.0, rel_tol=0, abs_tol=1e-12)


def test_dedup_against_cosine_index_composition(spark, index_path):
    """Corpus matches dropped (corpus_match = min matching corpus id),
    survivors semantically deduped among themselves, NULL ids pass
    through."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        dedup_against_cosine_index)

    out = dedup_against_cosine_index(
        _increment(spark), index_path, threshold=0.9)
    rows = {r["vec_id"]: r for r in out.collect()}
    release_cached_deps(out)
    assert rows[101]["corpus_match"] == 1 and not rows[101]["keep"]
    assert rows[102]["corpus_match"] == 3 and not rows[102]["keep"]
    for vid in (103, 104, 105):
        assert rows[vid]["corpus_match"] is None
    assert rows[103]["keep"]
    # internal dup pair: min id 104 is the canonical survivor
    assert rows[104]["keep"] and not rows[105]["keep"]
    assert rows[104]["component"] == 104 and rows[105]["component"] == 104
    null_row = next(r for k, r in rows.items() if k is None)
    assert null_row["keep"] and null_row["component"] is None


def test_dedup_against_cosine_index_keep_by(spark, index_path):
    """keep_by switches the within-increment survivor to the
    highest-scoring cluster member."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        dedup_against_cosine_index)

    inc = _increment(spark).withColumn(
        "quality", F.when(F.col("vec_id") == 105, 9.0).otherwise(1.0))
    out = dedup_against_cosine_index(
        inc, index_path, threshold=0.9, keep_by="quality")
    rows = {r["vec_id"]: r for r in out.collect()}
    release_cached_deps(out)
    assert rows[105]["keep"] and not rows[104]["keep"]


def test_append_and_reprobe(spark, corpus, tmp_path):
    """Appended survivors match the NEXT increment's probes; n_vecs
    tracks."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_cosine_index, cosine_pairs_against_index,
        write_cosine_index)

    path = str(tmp_path / "index")
    write_cosine_index(corpus, path, **KW)
    newbie = spark.createDataFrame(
        [(200, [-x for x in _vec(3)])], "vec_id long, embedding array<double>")
    probe0 = cosine_pairs_against_index(newbie, path)
    hits0 = probe0.where("cos >= 0.9").count()
    release_cached_deps(probe0)
    assert hits0 == 0
    meta = append_to_cosine_index(newbie, path)
    assert meta["n_vecs"] == 7
    again = spark.createDataFrame(
        [(300, [-2.0 * x for x in _vec(3)])],
        "vec_id long, embedding array<double>")
    probe1 = cosine_pairs_against_index(again, path)
    hit = probe1.where("cos >= 0.9").collect()
    release_cached_deps(probe1)
    assert len(hit) == 1 and hit[0]["id_corpus"] == 200


def test_cosine_index_guards(spark, corpus, tmp_path):
    from ddsketchy_spark.pipeline.dedup_index import (
        cosine_pairs_against_index, read_cosine_index, write_cosine_index)

    with pytest.raises(ValueError, match="divide"):
        write_cosine_index(corpus, str(tmp_path / "x"), n_planes=10, bands=4)
    with pytest.raises(ValueError, match="BIGINT"):
        write_cosine_index(corpus, str(tmp_path / "x"), n_planes=64, bands=8)
    with pytest.raises(FileNotFoundError, match="write_cosine_index"):
        read_cosine_index(spark, str(tmp_path / "nothere"))
    path = str(tmp_path / "index")
    write_cosine_index(corpus, path, **KW)
    bad_id = spark.createDataFrame(
        [("s1", _vec(0))], "vec_id string, embedding array<double>")
    with pytest.raises(ValueError, match="id type"):
        cosine_pairs_against_index(bad_id, path)
    bad_dim = spark.createDataFrame(
        [(9, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="dim"):
        cosine_pairs_against_index(bad_dim, path)
    bad_col = spark.createDataFrame([(9,)], "vec_id long")
    with pytest.raises(ValueError, match="vec_col"):
        cosine_pairs_against_index(bad_col, path)


def test_probe_max_bucket_size(spark, tmp_path):
    """A degenerate bucket (many identical corpus vectors) is dropped
    from candidacy when it exceeds the cap — counted over candidate
    corpus rows, so untouched buckets cost nothing."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        cosine_pairs_against_index, write_cosine_index)

    rows = [(i, _vec(0)) for i in range(10)] + [(50, _vec(5))]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "index")
    write_cosine_index(corpus, path, **KW)
    inc = spark.createDataFrame(
        [(101, _vec(0, scale=2.0)), (102, _vec(5, scale=2.0))],
        "vec_id long, embedding array<double>")
    capped = cosine_pairs_against_index(inc, path, max_bucket_size=5)
    got = {(r["id_inc"], r["id_corpus"]) for r in capped.collect()}
    release_cached_deps(capped)
    # the 10-member boilerplate bucket is dropped; the singleton survives
    assert got == {(102, 50)}
    full = cosine_pairs_against_index(inc, path)
    full_pairs = {(r["id_inc"], r["id_corpus"]) for r in full.collect()}
    release_cached_deps(full)
    # uncapped candidacy keeps every boilerplate pair (and possibly more
    # — near-orthogonal vectors may still share a 4-bit band key)
    assert {(101, i) for i in range(10)} <= full_pairs
    assert (102, 50) in full_pairs and got <= full_pairs


def test_lsh_cosine_broadcast_null_id(spark):
    """r4 regression (the minhash twin's bug, mirrored): a NULL-id row
    crashed lsh_cosine_topk verify='broadcast' (toPandas float64-coerced
    the id column — the CLAUDE.md pandas-NULL trap — so the Arrow scorer
    emitted float64 ids under a bigint-declared schema). Law, now
    explicit for both engines: NULL ids never enter the pair graph."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.similarity import lsh_cosine_topk

    df = spark.createDataFrame(
        [(1, _vec(0)), (2, _vec(0, scale=2.0)), (None, _vec(0))],
        "vec_id long, embedding array<double>")
    for verify in ("broadcast", "local"):
        topk = lsh_cosine_topk(df, k=5, verify=verify, **KW)
        got = sorted((r["id"], r["neighbor"]) for r in topk.collect())
        release_cached_deps(topk)
        assert got == [(1, 2), (2, 1)], verify


def test_lsh_cosine_null_vector(spark):
    """r4 regression: a NULL-vector row reshape-crashed the local
    engine's Arrow enrichment (and np.stack in broadcast). Law, mirroring
    NULL text in the minhash engine: NULL vectors never enter the pair
    graph; dedup_semantic leaves such rows as singletons."""
    from ddsketchy_spark.pipeline.dedup import dedup_semantic

    df = spark.createDataFrame(
        [(1, _vec(0)), (2, _vec(0, scale=2.0)), (3, None)],
        "vec_id long, embedding array<double>")
    for verify in ("local", "broadcast"):
        out = {r["vec_id"]: (r["component"], r["keep"]) for r in
               dedup_semantic(df, threshold=0.9, method="lsh",
                              verify=verify, **KW).collect()}
        assert out == {1: (1, True), 2: (1, False), 3: (3, True)}, verify


def test_multimodal_incremental_dedup(spark, tmp_path):
    """Multimodal seam -> incremental semantic dedup end to end: media
    features (deterministic fake extractor, string ids) build a cosine
    index once; a new media batch containing byte-duplicate payloads
    probes it and the duplicates are dropped as corpus matches —
    exercising the index with a STRING id column along the way."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        dedup_against_cosine_index, write_cosine_index)
    from ddsketchy_spark.pipeline.multimodal import (
        fake_feature_extract, synth_media)

    media = synth_media(spark, n=24)
    feats = fake_feature_extract(media, dim=16)
    path = str(tmp_path / "media_idx")
    write_cosine_index(feats, path, vec_col="features", id_col="media_id",
                       n_planes=16, bands=4)
    # new batch: 6 byte-identical payloads under new ids + the rest fresh
    dup = media.where("media_id < 'm-000006'").select(
        F.concat(F.lit("n-"), F.col("media_id")).alias("media_id"),
        "modality", "payload", "meta")
    fresh = synth_media(spark, n=40, seed=43).where(
        "media_id >= 'm-000024'")
    inc_feats = fake_feature_extract(dup.unionByName(fresh), dim=16)
    out = dedup_against_cosine_index(inc_feats, path, threshold=0.999999)
    rows = {r["media_id"]: r for r in out.collect()}
    release_cached_deps(out)
    for i in range(6):
        r = rows[f"n-m-{i:06d}"]
        assert r["corpus_match"] == f"m-{i:06d}" and not r["keep"]
    kept = [k for k, r in rows.items() if r["keep"]]
    assert len(kept) == 16 and all(k.startswith("m-0000") for k in kept)


def test_cross_parity_randomized(spark, tmp_path):
    """Randomized (seeded) parity: 200 corpus + 60 increment vectors with
    planted scaled copies — the probe's pair set and cosines equal the
    batch engine's cross pairs bit for bit."""
    import numpy as np

    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        cosine_pairs_against_index, write_cosine_index)
    from ddsketchy_spark.pipeline.similarity import lsh_cosine_topk

    rng = np.random.default_rng(1234)
    C = rng.standard_normal((200, 12))
    corpus = spark.createDataFrame(
        [(i, C[i].tolist()) for i in range(200)],
        "vec_id long, embedding array<double>")
    inc_rows = [(1000 + i, (2.0 * C[3 * i]).tolist()) for i in range(30)]
    inc_rows += [(2000 + i, rng.standard_normal(12).tolist())
                 for i in range(30)]
    inc = spark.createDataFrame(inc_rows,
                                "vec_id long, embedding array<double>")
    path = str(tmp_path / "ridx")
    write_cosine_index(corpus, path, n_planes=24, bands=4, seed=3)
    topk = lsh_cosine_topk(corpus.unionByName(inc), k=500, verify="local",
                           n_planes=24, bands=4, seed=3)
    batch_cross = {
        (min(r["id"], r["neighbor"]), max(r["id"], r["neighbor"])): r["cos"]
        for r in topk.collect()
        if (r["id"] >= 1000) != (r["neighbor"] >= 1000)}
    release_cached_deps(topk)
    probe = cosine_pairs_against_index(inc, path)
    got = {(min(r["id_inc"], r["id_corpus"]),
            max(r["id_inc"], r["id_corpus"])): r["cos"]
           for r in probe.collect()}
    release_cached_deps(probe)
    assert got == batch_cross
    # every planted copy is a candidate (identical signatures) at cos ~ 1
    for i in range(30):
        assert abs(got[(3 * i, 1000 + i)] - 1.0) < 1e-12


def test_fully_duplicate_increment_all_dropped(spark, corpus, index_path):
    """r4 advice repro: an increment that duplicates the entire indexed
    corpus leaves ZERO survivors — the steady state of a streaming crawl
    re-seeing its own output. The within pass must label it all-dropped,
    not crash: dim rides the sidecar into dedup_semantic (never an eager
    .first() probe of the empty survivor frame), and the broadcast LSH
    engine returns an empty pair frame for zero rows."""
    from ddsketchy_spark.pipeline.dedup_index import dedup_against_cosine_index

    inc = corpus.withColumn("vec_id", F.col("vec_id") + 100)
    rows = dedup_against_cosine_index(inc, index_path, threshold=0.99).collect()
    assert len(rows) == 6
    assert all(r["keep"] is False for r in rows)
    assert all(r["corpus_match"] == r["vec_id"] - 100 for r in rows)
    assert all(r["component"] is None for r in rows)


def test_cosine_probe_pushdown_parity(spark, corpus, index_path):
    """The pushed-IN bands-scan plan (r5) returns exactly the fallback
    plans' pairs with bit-identical cosines, and the key IN predicate
    reaches the parquet scan."""
    import io
    from contextlib import redirect_stdout

    from ddsketchy_spark.pipeline.dedup_index import (
        cosine_pairs_against_index,
    )

    inc = _increment(spark)
    runs = {}
    for name, kw in {
        "pushed": dict(pushdown_buckets=10_000),
        "broadcast": dict(pushdown_buckets=0, broadcast_increment=True),
        "shuffle": dict(pushdown_buckets=0, broadcast_increment=False),
    }.items():
        pairs = cosine_pairs_against_index(inc, index_path, **kw)
        runs[name] = sorted(map(tuple, pairs.collect()))
        if name == "pushed":
            buf = io.StringIO()
            with redirect_stdout(buf):
                pairs.explain("formatted")
            assert "PushedFilters: [In(key" in buf.getvalue()
    assert runs["pushed"] == runs["broadcast"] == runs["shuffle"]
    assert len(runs["pushed"]) > 0


def test_cosine_index_compaction(spark, tmp_path):
    """compact_cosine_index rewrites bands (range-sorted on (blk, key))
    and vecs (range-sorted on id) as single generations: fewer files,
    identical rows, identical probe results, crash self-heal."""
    import os

    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_cosine_index,
        compact_cosine_index,
        cosine_pairs_against_index,
        read_cosine_index,
        write_cosine_index,
    )

    path = str(tmp_path / "coscpidx")
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, _vec(i)) for i in range(lo, hi)],
        "vec_id long, embedding array<double>")
    write_cosine_index(mk(0, 6), path, **KW)
    for g in range(3):
        append_to_cosine_index(mk(6 + 6 * g, 12 + 6 * g), path)
    assert read_cosine_index(spark, path)[2]["n_vecs"] == 24

    def table_rows(name):
        return sorted(
            tuple(x if not isinstance(x, list) else tuple(x) for x in r)
            for r in spark.read.parquet(f"{path}/{name}").collect())

    def n_files(name):
        return sum(f.startswith("part-")
                   for f in os.listdir(f"{path}/{name}"))

    inc = spark.createDataFrame(
        [(1003, _vec(3, scale=2.0)), (1014, _vec(14, scale=0.5))],
        "vec_id long, embedding array<double>")
    before = {t: table_rows(t) for t in ("bands", "vecs")}
    before_probe = sorted(map(tuple, cosine_pairs_against_index(
        inc, path).collect()))
    assert len(before_probe) >= 2 and n_files("bands") > 2

    meta = compact_cosine_index(spark, path, n_files=2)
    assert meta["compactions"] == 1 and meta["n_vecs"] == 24
    assert n_files("bands") <= 2 and n_files("vecs") <= 2
    assert {t: table_rows(t) for t in ("bands", "vecs")} == before
    assert sorted(map(tuple, cosine_pairs_against_index(
        inc, path).collect())) == before_probe

    assert fsio.hadoop_rename(spark, f"{path}/bands",
                              f"{path}/bands_precompact")
    meta2 = compact_cosine_index(spark, path, n_files=2)
    assert meta2["compactions"] == 2
    assert {t: table_rows(t) for t in ("bands", "vecs")} == before
    assert sorted(map(tuple, cosine_pairs_against_index(
        inc, path).collect())) == before_probe


def test_collected_probe_matches_distributed(spark, corpus, index_path):
    """r6: the bounded-increment COLLECTED probe plan (local band
    relations, broadcast-matrix scoring) returns exactly the distributed
    plan's pairs and cosines, including under max_bucket_size (inc-side
    counts computed on the driver) and with pushdown disabled."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup_index import (
        cosine_pairs_against_index)

    inc = _increment(spark)
    for kw in ({}, {"max_bucket_size": 2}, {"pushdown_buckets": 0}):
        col = cosine_pairs_against_index(inc, index_path, **kw)
        dist = cosine_pairs_against_index(inc, index_path,
                                          collect_increment_rows=None, **kw)
        got = sorted(map(tuple, col.collect()))
        want = sorted(map(tuple, dist.collect()))
        release_cached_deps(col)
        release_cached_deps(dist)
        assert got == want, kw
    assert len(want) >= 0
