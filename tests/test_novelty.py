"""Bloom n-gram index: decontamination + novelty (pipeline/novelty.py).

Laws under test: gram/hash identity shared with text._gram_rows /
contamination_pairs; NO false negatives (every truly-seen gram reports
seen, every contaminated doc is dropped); sentinel contract for gramless
rows; append = bitwise-OR merge.
"""

import pytest

from pyspark.sql import functions as F

N = 3  # test-sized gram order (the operators default to 13)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "training data pipelines shuffle narrow rows never text"),
    (3, "a reference corpus sentence about owls and rivers tonight"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    from ddsketchy_spark.pipeline.novelty import write_ngram_bloom_index

    path = str(tmp_path_factory.mktemp("bloomidx") / "index")
    meta = write_ngram_bloom_index(corpus, path, n=N, fpr=0.001)
    assert meta["n"] == N and meta["n_grams"] > 0
    assert 0.0 < meta["fill_ratio"] < 0.5
    return path


def test_no_false_negatives_and_exact_parity(spark, corpus, index_path):
    """An exact copy of a corpus doc scores novel_frac 0.0 (every gram
    seen — Bloom never misses); per-doc n_seen >= the exact-join count
    on every row; a fresh doc's grams are (at this filter size) unseen."""
    from ddsketchy_spark.pipeline.novelty import (
        _gram_hashes, novelty_against_index)

    inc = spark.createDataFrame(
        [(101, CORPUS[0][1]),
         (102, "an entirely novel document with words the corpus lacks"),
         (103, CORPUS[1][1] + " plus a novel tail of extra words here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           novelty_against_index(inc, index_path, id_col="doc_id").collect()}
    assert out[101]["novel_frac"] == 0.0
    assert out[101]["n_seen"] == out[101]["n_grams"] > 0
    # exact ground truth by joining gram hashes
    corpus_g = _gram_hashes(corpus, "text", N).dropDuplicates()
    inc_g = _gram_hashes(inc, "text", N, F.col("doc_id"))
    exact = {r["doc_id"]: r["e"] for r in
             (inc_g.join(corpus_g, "gh", "left_semi")
              .groupBy("doc_id").agg(F.count(F.lit(1)).alias("e"))
              .collect())}
    for did, r in out.items():
        assert r["n_seen"] >= exact.get(did, 0), did  # no false negatives
    # the partially-contaminated doc saw at least its corpus-sourced grams
    assert out[103]["n_seen"] >= exact[103] > 0
    assert 0.0 < out[103]["novel_frac"] < 1.0
    # fresh doc: deterministic for this data/filter — fully novel
    assert out[102]["novel_frac"] == 1.0


def test_sentinels_for_gramless_rows(spark, index_path):
    from ddsketchy_spark.pipeline.novelty import novelty_against_index

    inc = spark.createDataFrame(
        [(201, None), (202, "too short"), (None, CORPUS[0][1])],
        "doc_id long, text string")
    rows = novelty_against_index(inc, index_path).collect()
    got = {r["doc_id"]: (r["n_grams"], r["n_seen"], r["novel_frac"])
           for r in rows}
    assert got[201] == (0, 0, -1.0)
    assert got[202] == (0, 0, -1.0)
    assert got[None] == (0, 0, -1.0)  # NULL key never joins back


def test_decontaminate_against_index(spark, index_path):
    """Any shared n-gram -> dropped (no false negatives = every
    contaminated doc goes); gramless docs are kept, matching
    text.decontaminate's law."""
    from ddsketchy_spark.pipeline.novelty import decontaminate_against_index

    inc = spark.createDataFrame(
        [(101, CORPUS[2][1]),                              # contaminated
         (102, "fresh words that never appeared anywhere before now"),
         (103, "tiny"), (104, None)],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  decontaminate_against_index(inc, index_path).collect())
    assert kept == [102, 103, 104]


def test_append_and_reprobe(spark, corpus, tmp_path):
    from ddsketchy_spark.pipeline.novelty import (
        append_to_ngram_bloom_index, novelty_against_index,
        write_ngram_bloom_index)

    path = str(tmp_path / "index")
    write_ngram_bloom_index(corpus, path, n=N, fpr=0.001)
    newdoc = spark.createDataFrame(
        [(500, "completely new benchmark sentence to fold into the index")],
        "doc_id long, text string")
    before = novelty_against_index(newdoc, path).collect()[0]
    assert before["novel_frac"] == 1.0
    meta = append_to_ngram_bloom_index(newdoc, path)
    assert meta["n_grams"] > 0
    after = novelty_against_index(newdoc, path).collect()[0]
    assert after["novel_frac"] == 0.0  # its own grams now all present


def test_bloom_index_guards(spark, corpus, tmp_path, index_path):
    from ddsketchy_spark.pipeline.novelty import (
        novelty_against_index, read_ngram_bloom_index)

    with pytest.raises(FileNotFoundError, match="write_ngram_bloom_index"):
        read_ngram_bloom_index(spark, str(tmp_path / "nothere"))
    no_text = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="text_col"):
        novelty_against_index(no_text, index_path)
    # r4 advice: a non-power-of-two n_bits fails at ENTRY with the real
    # reason, not at collect time deep inside _bloom_from_rows
    from ddsketchy_spark.pipeline.novelty import write_ngram_bloom_index
    with pytest.raises(ValueError, match="power of two"):
        write_ngram_bloom_index(corpus, str(tmp_path / "bad"), n=3,
                                n_bits=1000)
    # n_bits alone: n_hashes derives from the CALLER'S bit budget
    # (n_bits/n * ln 2), not from the auto-sized array's pair
    meta = write_ngram_bloom_index(corpus, str(tmp_path / "fixedbits"),
                                   n=3, n_bits=1 << 20)
    assert meta["n_bits"] == 1 << 20
    assert meta["n_hashes"] >= 8  # far more than the auto pairing would use


def test_clean_corpus_with_bloom_benchmark(spark, tmp_path):
    """clean_corpus accepts a Bloom index PATH as the benchmark: the
    contaminated doc drops with zero benchmark I/O at run time, NULL-id
    rows still pass through, and the index's own gram order applies.
    Also composes with the paragraph stage at broadcast size (the
    DeduplicateRelations/HOF outer-capture shape the exact-decontam path
    regression-tests)."""
    from ddsketchy_spark.pipeline.compose import clean_corpus
    from ddsketchy_spark.pipeline.novelty import write_ngram_bloom_index

    P = ("a long shared boilerplate paragraph that should be removed "
         "from every later document")
    rows = [(i, f"wholly distinct body number {i} with its own words "
             f"token{i}a token{i}b the of and to\n{P}", "t")
            for i in range(20)] + [(None, "null id survives the pipeline "
                                    "with the usual words intact", "t")]
    df = spark.createDataFrame(rows,
                               "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(900, "wholly distinct body number 7 with its own words")],
        "doc_id long, text string")
    path = str(tmp_path / "benchidx")
    write_ngram_bloom_index(bench, path, n=5, fpr=1e-6)
    out = clean_corpus(df, quality_kw={"min_words": 3},
                       para_dedup_kw={"min_chars": 20},
                       near_dedup_kw={"verify": "local", "num_perm": 32,
                                      "bands": 8, "threshold": 0.9},
                       benchmark=path)
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert 7 not in got
    assert None in got
    assert sum(P in t for t in got.values() if t) == 1


def test_streaming_novelty_foreachbatch(spark, corpus, index_path, tmp_path):
    """Novelty scoring on a STREAM: the index blob is static and the
    score is per-doc, so foreachBatch probes each micro-batch
    independently — the union of micro-batch results must equal the
    batch run row for row."""
    from ddsketchy_spark.pipeline.novelty import novelty_against_index

    rows = [(100 + i, CORPUS[i % 3][1] if i % 2 else
             f"novel body {i} with distinct words nobody indexed before")
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "nov_src")
    df.repartition(4).write.parquet(src)

    batch_rows = {r["doc_id"]: (r["n_grams"], r["n_seen"], r["novel_frac"])
                  for r in novelty_against_index(df, index_path).collect()}

    got = {}

    def probe(batch_df, batch_id):
        for r in novelty_against_index(batch_df, index_path).collect():
            got[r["doc_id"]] = (r["n_grams"], r["n_seen"], r["novel_frac"])

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (stream.writeStream.foreachBatch(probe)
         .option("checkpointLocation", str(tmp_path / "nov_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert got == batch_rows and len(got) == 12
