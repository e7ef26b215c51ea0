"""Incremental MinHash-LSH dedup index (pipeline/dedup_index.py).

The law under test: probing an increment against an index of corpus A
reports exactly the cross pairs the batch engine would report on A u B,
with bit-identical est_jaccard (shared signature/banding/scoring code);
dedup_against_index composes corpus-match dropping with within-increment
dedup; append_to_minhash_index folds survivors in for the next round.
"""

import pytest

from pyspark.sql import functions as F

KW = dict(num_perm=64, bands=16)

A_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "completely unrelated text mentioning quasars and radio telescopes",
    "a corpus document about owls and rivers flowing through the night",
    "training data pipelines shuffle narrow rows never the text itself",
    "yet another unique body of text to pad the corpus a little more",
]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i + 1, t) for i, t in enumerate(A_TEXTS)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    from ddsketchy_spark.pipeline.dedup_index import write_minhash_index

    path = str(tmp_path_factory.mktemp("mhidx") / "index")
    meta = write_minhash_index(corpus, path, **KW)
    assert meta["n_docs"] == 5 and meta["r"] == 4
    return path


def _increment(spark):
    rows = [
        (101, A_TEXTS[0]),            # exact dup of corpus doc 1
        (102, A_TEXTS[2]),            # exact dup of corpus doc 3
        (103, "a brand new document the corpus has never seen before"),
        (104, "duplicated within the increment but absent from the corpus"),
        (105, "duplicated within the increment but absent from the corpus"),
        (None, A_TEXTS[0]),           # NULL id: never probed, passes through
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_pairs_match_batch_engine(spark, corpus, index_path):
    """Index probe == batch engine on the union, restricted to cross
    pairs — same pair set, bit-identical est values, in both the
    broadcast-increment and shuffle plans."""
    from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs
    from ddsketchy_spark.pipeline.dedup_index import (
        minhash_pairs_against_index)

    inc = _increment(spark)
    union = corpus.unionByName(inc)
    batch_cross = {
        tuple(sorted((r["id_a"], r["id_b"]))): r["est_jaccard"]
        for r in minhash_lsh_pairs(union, verify="local", **KW).collect()
        if (r["id_a"] > 100) != (r["id_b"] > 100)}
    assert len(batch_cross) >= 2  # the two exact cross dups at least
    for bc in (True, False):
        got = {tuple(sorted((r["id_inc"], r["id_corpus"]))): r["est_jaccard"]
               for r in minhash_pairs_against_index(
                   inc, index_path, broadcast_increment=bc).collect()}
        assert got == batch_cross, f"broadcast_increment={bc}"
    # exact cross dups estimate at exactly 1.0 (every slot agrees)
    assert batch_cross[(1, 101)] == 1.0 and batch_cross[(3, 102)] == 1.0


def test_dedup_against_index_composition(spark, index_path):
    """Corpus matches dropped (corpus_match = min matching corpus id),
    survivors deduped among themselves, NULL ids pass through."""
    from ddsketchy_spark.pipeline.dedup_index import dedup_against_index

    inc = _increment(spark)
    out = dedup_against_index(inc, index_path, threshold=0.9)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 6
    assert rows[101]["keep"] is False and rows[101]["corpus_match"] == 1
    assert rows[102]["keep"] is False and rows[102]["corpus_match"] == 3
    assert rows[103]["keep"] is True and rows[103]["corpus_match"] is None
    # within-increment pair: min id 104 survives, 105 joins its component
    assert rows[104]["keep"] is True and rows[104]["component"] == 104
    assert rows[105]["keep"] is False and rows[105]["component"] == 104
    assert rows[None]["keep"] is True and rows[None]["corpus_match"] is None

    # within=False: only corpus matches drop
    out2 = dedup_against_index(inc, index_path, threshold=0.9, within=False)
    rows2 = {r["doc_id"]: r for r in out2.collect()}
    assert rows2[104]["keep"] is True and rows2[105]["keep"] is True
    assert rows2[101]["keep"] is False


def test_dedup_against_index_keep_by(spark, index_path):
    """keep_by survivor selection flows into the within-increment stage:
    the higher-scoring member of the 104/105 pair wins instead of min id."""
    from ddsketchy_spark.pipeline.dedup_index import dedup_against_index

    inc = _increment(spark).withColumn(
        "quality", F.when(F.col("doc_id") == 105, F.lit(9.0)).otherwise(1.0))
    out = dedup_against_index(inc, index_path, threshold=0.9,
                              keep_by="quality")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[105]["keep"] is True and rows[104]["keep"] is False


def test_append_and_reprobe(spark, corpus, tmp_path):
    """The incremental loop: dedup an increment, append the kept rows,
    and a doc duplicating a survivor is dropped by the NEXT probe."""
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_minhash_index, dedup_against_index, read_minhash_index,
        write_minhash_index)

    path = str(tmp_path / "index")
    write_minhash_index(corpus, path, **KW)
    inc = _increment(spark)
    labels = dedup_against_index(inc, path, threshold=0.9)
    kept_ids = [r["doc_id"] for r in
                labels.where("keep AND doc_id IS NOT NULL").collect()]
    kept = inc.join(F.broadcast(
        spark.createDataFrame([(i,) for i in kept_ids], "doc_id long")),
        "doc_id")
    meta = append_to_minhash_index(kept, path)
    assert meta["n_docs"] == 5 + len(kept_ids)
    _, _, meta_disk = read_minhash_index(spark, path)
    assert meta_disk["n_docs"] == meta["n_docs"]

    probe2 = spark.createDataFrame(
        [(201, "a brand new document the corpus has never seen before")],
        "doc_id long, text string")
    out2 = {r["doc_id"]: r for r in
            dedup_against_index(probe2, path, threshold=0.9).collect()}
    assert out2[201]["keep"] is False and out2[201]["corpus_match"] == 103


def test_index_guards(spark, corpus, index_path, tmp_path):
    """Loud failures: non-index path, id column missing or mistyped,
    mode='error' on an existing index."""
    from ddsketchy_spark.pipeline.dedup_index import (
        minhash_pairs_against_index, read_minhash_index, write_minhash_index)

    with pytest.raises(FileNotFoundError, match="_minhash_index.json"):
        read_minhash_index(spark, str(tmp_path / "nope"))
    bad_type = spark.createDataFrame([("x", "text")],
                                     "doc_id string, text string")
    with pytest.raises(ValueError, match="id type"):
        minhash_pairs_against_index(bad_type, index_path)
    bad_col = spark.createDataFrame([(1, "text")], "id long, text string")
    with pytest.raises(ValueError, match="no 'doc_id'"):
        minhash_pairs_against_index(bad_col, index_path)
    with pytest.raises(Exception, match="already exists|LOCATION_ALREADY"):
        write_minhash_index(corpus, index_path, **KW)


def test_probe_max_bucket_size(spark, tmp_path):
    """The degenerate-bucket cap applies to the probe: a boilerplate
    clique shared by index and increment produces no pairs under the cap,
    while an ordinary duplicate still matches."""
    from ddsketchy_spark.pipeline.dedup_index import (
        minhash_pairs_against_index, write_minhash_index)

    boiler = "spam spam lorem ipsum dolor sit amet boilerplate forever"
    rows_a = [(i, boiler) for i in range(10)]
    rows_a += [(50, "a genuinely unique document about owls and rivers")]
    corpus = spark.createDataFrame(rows_a, "doc_id long, text string")
    path = str(tmp_path / "idx")
    write_minhash_index(corpus, path, **KW)
    inc = spark.createDataFrame(
        [(100, boiler),
         (101, "a genuinely unique document about owls and rivers")],
        "doc_id long, text string")
    capped = minhash_pairs_against_index(inc, path, max_bucket_size=5)
    got = {(r["id_inc"], r["id_corpus"]) for r in capped.collect()}
    assert got == {(101, 50)}
    uncapped = minhash_pairs_against_index(inc, path)
    assert {(r["id_inc"], r["id_corpus"]) for r in uncapped.collect()} == \
        {(100, i) for i in range(10)} | {(101, 50)}


# -- exact-digest index twin ----------------------------------------------


@pytest.fixture(scope="module")
def exact_index_path(spark, corpus, tmp_path_factory):
    from ddsketchy_spark.pipeline.dedup_index import write_exact_index

    path = str(tmp_path_factory.mktemp("exidx") / "index")
    meta = write_exact_index(corpus, path)
    assert meta["n_docs"] == 5 and meta["law"] == "md5(lower(trim(text)))"
    return path


def _exact_increment(spark):
    rows = [
        (101, A_TEXTS[0]),                  # byte-exact dup of corpus doc 1
        (102, "  " + A_TEXTS[2].upper()),   # normalized dup of corpus doc 3
        (103, "a brand new document the corpus has never seen before"),
        (104, "duplicated within the increment only"),
        (105, "duplicated within the increment only"),
        (106, None),                        # NULL text: never a duplicate
        (None, A_TEXTS[0]),                 # NULL id: passes through
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_matches_three_probe_plans(spark, corpus, exact_index_path):
    """Same matches from the pushed-IN, broadcast-join, and shuffle-join
    plans; the pushed plan shows the IN predicate at the parquet scan;
    normalization (trim/lower) matches the batch digest law; a re-probed
    indexed id never matches itself."""
    from ddsketchy_spark.pipeline.dedup_index import (
        exact_matches_against_index, read_exact_index)

    inc = _exact_increment(spark)
    expect = {101: 1, 102: 3}
    pushed = exact_matches_against_index(inc, exact_index_path)
    assert {r["id_inc"]: r["corpus_match"]
            for r in pushed.collect()} == expect
    plan = pushed._jdf.queryExecution().executedPlan().toString()
    assert "In(fingerprint" in plan or "in(fingerprint" in plan
    for kw in (dict(pushdown_digests=0, broadcast_increment=True),
               dict(pushdown_digests=0, broadcast_increment=False)):
        got = exact_matches_against_index(inc, exact_index_path, **kw)
        assert {r["id_inc"]: r["corpus_match"]
                for r in got.collect()} == expect
    # self-exclusion: corpus doc 1 re-probed does not match itself but
    # still matches a distinct twin if one exists (none here -> no row)
    self_probe = spark.createDataFrame([(1, A_TEXTS[0])],
                                       "doc_id long, text string")
    digests, meta = read_exact_index(spark, exact_index_path)
    got = exact_matches_against_index(self_probe, (digests, meta))
    assert got.collect() == []


def test_dedup_against_exact_index_and_append(spark, exact_index_path):
    """Composition law: corpus matches dropped, within-increment exact
    dedup keeps min id, NULL text/id pass through; appending survivors
    makes the next probe of the same docs match them."""
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_exact_index, dedup_against_exact_index,
        exact_matches_against_index)

    inc = _exact_increment(spark)
    out = dedup_against_exact_index(inc, exact_index_path)
    rows = {r["doc_id"]: (r["corpus_match"], r["keep"])
            for r in out.collect() if r["doc_id"] is not None}
    assert rows == {101: (1, False), 102: (3, False), 103: (None, True),
                    104: (None, True), 105: (None, False),
                    106: (None, True)}
    nid = [r for r in out.collect() if r["doc_id"] is None]
    assert len(nid) == 1 and nid[0]["keep"] and nid[0]["corpus_match"] is None
    # within=False keeps both internal copies
    out2 = dedup_against_exact_index(inc, exact_index_path, within=False)
    k2 = {r["doc_id"]: r["keep"] for r in out2.collect()
          if r["doc_id"] is not None}
    assert k2[104] and k2[105] and not k2[101]
    # append survivors (kept, non-null text) and re-probe
    kept_ids = [i for i, (_, k) in rows.items() if k and i != 106]
    surv = inc.where(F.col("doc_id").isin(kept_ids))
    meta = append_to_exact_index(surv, exact_index_path)
    assert meta["n_docs"] == 5 + len(kept_ids)
    reprobe = spark.createDataFrame(
        [(900, "a brand new document the corpus has never seen before"),
         (901, "duplicated within the increment only")],
        "doc_id long, text string")
    got = {r["id_inc"]: r["corpus_match"] for r in
           exact_matches_against_index(reprobe, exact_index_path).collect()}
    assert got == {900: 103, 901: 104}


def test_exact_index_guards(spark, corpus, index_path, exact_index_path,
                            tmp_path):
    from ddsketchy_spark.pipeline.dedup_index import (
        exact_matches_against_index, write_exact_index)

    # a minhash index is not an exact index
    with pytest.raises(FileNotFoundError, match="write_exact_index"):
        exact_matches_against_index(corpus, index_path)
    # id type mismatch
    bad = spark.createDataFrame([("x", "t")], "doc_id string, text string")
    with pytest.raises(ValueError, match="id type"):
        exact_matches_against_index(bad, exact_index_path)
    # refuses to overwrite by default
    with pytest.raises(Exception, match="[Aa]lready exists"):
        write_exact_index(corpus, exact_index_path)


def test_streaming_crawl_loop_against_index(spark, corpus, tmp_path):
    """The continuous-crawl loop on a STREAM: each micro-batch is
    near-deduped against the persistent index inside foreachBatch, its
    survivors are appended, and the next crawl — arriving AFTER the
    first stream run terminated — resumes through the same checkpoint
    (exactly-once: crawl 1 is not reprocessed) and is deduped against
    the UPDATED index. A doc duplicating a crawl-1 survivor is dropped
    in crawl 2 even though neither ever appeared in the original
    corpus. This is the deployment shape for incremental dedup of an
    arriving crawl feed at scale: the corpus index only ever streams
    through broadcast probes, and state between crawls lives entirely
    in the on-disk index + the stream checkpoint."""
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_minhash_index, dedup_against_index, read_minhash_index,
        write_minhash_index)

    path = str(tmp_path / "crawl_index")
    write_minhash_index(corpus, path, **KW)

    src = tmp_path / "crawl_src"
    src.mkdir()
    ck = str(tmp_path / "crawl_ck")
    schema = "doc_id long, text string"
    novel1 = "a freshly crawled page about tidal pools and barnacle clusters"
    novel2 = "another page covering alpine meadows and late summer snowfields"

    results, processed_ids = {}, []

    def process(batch_df, batch_id):
        labels = dedup_against_index(batch_df, path, threshold=0.9)
        rows = labels.collect()
        processed_ids.extend(r["doc_id"] for r in rows)
        results.update({r["doc_id"]: r for r in rows})
        kept_ids = [r["doc_id"] for r in rows
                    if r["keep"] and r["doc_id"] is not None]
        if kept_ids:
            kept = batch_df.join(F.broadcast(
                batch_df.sparkSession.createDataFrame(
                    [(i,) for i in kept_ids], "doc_id long")), "doc_id")
            append_to_minhash_index(kept, path)

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(str(src)))
        q = (stream.writeStream.foreachBatch(process)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    # crawl 1: one corpus dup, one novel page
    spark.createDataFrame(
        [(201, A_TEXTS[0]), (202, novel1)], schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    assert results[201]["keep"] is False and results[201]["corpus_match"] == 1
    assert results[202]["keep"] is True
    assert read_minhash_index(spark, path)[2]["n_docs"] == 5 + 1

    # crawl 2 arrives later: a dup of crawl 1's survivor + a novel page
    spark.createDataFrame(
        [(301, novel1), (302, novel2)], schema,
    ).coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    assert results[301]["keep"] is False and results[301]["corpus_match"] == 202
    assert results[302]["keep"] is True
    assert read_minhash_index(spark, path)[2]["n_docs"] == 5 + 2
    # exactly-once across the restart: crawl 1 was not reprocessed
    assert sorted(processed_ids) == [201, 202, 301, 302]


def test_exact_index_compaction(spark, tmp_path):
    """compact_exact_index restores the single-generation range-sorted
    layout: fewer files, identical digest rows, identical probe results,
    and the crash-between-renames state self-heals on the next call."""
    import os

    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_exact_index,
        compact_exact_index,
        exact_matches_against_index,
        read_exact_index,
        write_exact_index,
    )

    path = str(tmp_path / "cpidx")
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, f"compaction corpus document number {i}") for i in range(lo, hi)],
        "doc_id long, text string")
    write_exact_index(mk(0, 20), path, n_files=4)
    for g in range(3):
        append_to_exact_index(mk(20 + 20 * g, 40 + 20 * g), path)
    assert read_exact_index(spark, path)[1]["n_docs"] == 80

    def digest_rows():
        return sorted((r["doc_id"], r["fingerprint"]) for r in
                      spark.read.parquet(f"{path}/digests").collect())

    def n_files():
        return sum(f.startswith("part-")
                   for f in os.listdir(f"{path}/digests"))

    inc = mk(10, 12).union(mk(55, 57)).withColumn(
        "doc_id", F.col("doc_id") + 1000)
    before_rows = digest_rows()
    before_probe = sorted(map(tuple, exact_matches_against_index(
        inc, path).collect()))
    assert len(before_probe) == 4 and n_files() > 4

    meta = compact_exact_index(spark, path, n_files=4)
    assert meta["compactions"] == 1 and meta["n_docs"] == 80
    assert n_files() <= 4
    assert digest_rows() == before_rows
    assert sorted(map(tuple, exact_matches_against_index(
        inc, path).collect())) == before_probe

    # crash between the two swap renames: digests is gone, the backup
    # holds the data — the next compaction restores it first
    assert fsio.hadoop_rename(spark, f"{path}/digests",
                              f"{path}/digests_precompact")
    meta2 = compact_exact_index(spark, path, n_files=4)
    assert meta2["compactions"] == 2
    assert digest_rows() == before_rows
    assert sorted(map(tuple, exact_matches_against_index(
        inc, path).collect())) == before_probe


def test_minhash_probe_pushdown_parity(spark, corpus, index_path):
    """The pushed-IN bands-scan plan returns exactly the fallback plans'
    pairs (est_jaccard bit-identical), and the IN predicate reaches the
    parquet scan."""
    import io
    from contextlib import redirect_stdout

    from ddsketchy_spark.pipeline.dedup_index import (
        minhash_pairs_against_index,
    )

    inc = _increment(spark)
    runs = {}
    for name, kw in {
        "pushed": dict(pushdown_buckets=10_000),
        "broadcast": dict(pushdown_buckets=0, broadcast_increment=True),
        "shuffle": dict(pushdown_buckets=0, broadcast_increment=False),
    }.items():
        pairs = minhash_pairs_against_index(inc, index_path, **kw)
        runs[name] = sorted(map(tuple, pairs.collect()))
        if name == "pushed":
            buf = io.StringIO()
            with redirect_stdout(buf):
                pairs.explain("formatted")
            assert "PushedFilters: [In(bucket" in buf.getvalue()
    assert runs["pushed"] == runs["broadcast"] == runs["shuffle"]
    assert len(runs["pushed"]) > 0


def test_minhash_index_compaction(spark, tmp_path):
    """compact_minhash_index rewrites bands (range-sorted on
    (band, bucket)) and sigs (range-sorted on id) as single generations:
    fewer files, identical rows, identical probe results, and the
    crash-between-renames state self-heals on the next call."""
    import os

    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_minhash_index,
        compact_minhash_index,
        minhash_pairs_against_index,
        read_minhash_index,
        write_minhash_index,
    )

    path = str(tmp_path / "mhcpidx")
    # per-doc word salads share NO shingles across docs, so the only
    # probe pairs are the exact copies planted below
    mk = lambda lo, hi: spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12)))
         for i in range(lo, hi)],
        "doc_id long, text string")
    write_minhash_index(mk(0, 6), path, **KW)
    for g in range(3):
        append_to_minhash_index(mk(6 + 6 * g, 12 + 6 * g), path)
    assert read_minhash_index(spark, path)[2]["n_docs"] == 24

    def table_rows(name):
        return sorted(
            tuple(x if not isinstance(x, list) else tuple(x) for x in r)
            for r in spark.read.parquet(f"{path}/{name}").collect())

    def n_files(name):
        return sum(f.startswith("part-")
                   for f in os.listdir(f"{path}/{name}"))

    inc = mk(3, 5).union(mk(14, 16)).withColumn(
        "doc_id", F.col("doc_id") + 1000)
    before = {t: table_rows(t) for t in ("bands", "sigs")}
    before_probe = sorted(map(tuple, minhash_pairs_against_index(
        inc, path).collect()))
    assert len(before_probe) == 4 and n_files("bands") > 2

    meta = compact_minhash_index(spark, path, n_files=2)
    assert meta["compactions"] == 1 and meta["n_docs"] == 24
    assert n_files("bands") <= 2 and n_files("sigs") <= 2
    assert {t: table_rows(t) for t in ("bands", "sigs")} == before
    assert sorted(map(tuple, minhash_pairs_against_index(
        inc, path).collect())) == before_probe

    # crash between the swap renames of the bands table: self-heals
    assert fsio.hadoop_rename(spark, f"{path}/bands",
                              f"{path}/bands_precompact")
    meta2 = compact_minhash_index(spark, path, n_files=2)
    assert meta2["compactions"] == 2
    assert {t: table_rows(t) for t in ("bands", "sigs")} == before
    assert sorted(map(tuple, minhash_pairs_against_index(
        inc, path).collect())) == before_probe


def test_precompact_heal_on_probe_and_append(spark, tmp_path):
    """A crash between compaction's swap renames leaves the table under
    <table>_precompact; EVERY entry point self-heals — a probe restores
    instead of failing on the missing dir, and an append restores
    instead of silently creating a fresh table that orphans the backup
    (r5 review fix)."""
    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.pipeline.dedup_index import (
        append_to_exact_index,
        append_to_minhash_index,
        exact_matches_against_index,
        read_exact_index,
        read_minhash_index,
        write_exact_index,
        write_minhash_index,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(12)))
         for i in range(lo, hi)],
        "doc_id long, text string")

    # exact index: probe heals
    ep = str(tmp_path / "healexact")
    write_exact_index(mk(0, 10), ep)
    assert fsio.hadoop_rename(spark, f"{ep}/digests",
                              f"{ep}/digests_precompact")
    inc = mk(3, 5).withColumn("doc_id", F.col("doc_id") + 1000)
    assert exact_matches_against_index(inc, ep).count() == 2
    # crash again: append heals and folds into the RESTORED table
    assert fsio.hadoop_rename(spark, f"{ep}/digests",
                              f"{ep}/digests_precompact")
    append_to_exact_index(mk(10, 15), ep)
    assert read_exact_index(spark, ep)[0].count() == 15
    assert not fsio.hadoop_exists(spark, f"{ep}/digests_precompact")

    # minhash index: read and append heal both tables
    mp = str(tmp_path / "healmh")
    write_minhash_index(mk(0, 6), mp, **KW)
    for t in ("bands", "sigs"):
        assert fsio.hadoop_rename(spark, f"{mp}/{t}",
                                  f"{mp}/{t}_precompact")
    append_to_minhash_index(mk(6, 8), mp)
    bands_df, sigs_df, meta = read_minhash_index(spark, mp)
    assert meta["n_docs"] == 8 and sigs_df.count() == 8
