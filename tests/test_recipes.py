"""Incremental-crawl recipe (pipeline/recipes.py): two crawls through the
full composed pipeline — clean -> exact-index dedup -> minhash-index
dedup -> decontaminate -> split -> pack -> shards -> index append ->
rollup drift — with the persistent state accumulating under one workdir."""

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

SCHEMA = "doc_id long, text string, source string, n_tok long"
QKW = {"min_words": 3, "max_mean_word_len": 100.0}


def _doc(i, salt, words=8):
    import hashlib

    toks = [hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[:8]
            for j in range(words)]
    return " ".join(toks)


def _crawl1_rows():
    rows = [(i, _doc(i, "c1"), "srcA" if i % 2 else "srcB", 64 + i)
            for i in range(40)]
    rows += [(100 + i, rows[i][1], rows[i][2], rows[i][3])
             for i in range(6)]        # exact dups within crawl 1
    rows += [(None, _doc(999, "c1"), "srcA", 64)]  # NULL id passes through
    return rows


def test_incremental_crawl_two_rounds(spark, tmp_path):
    from ddsketchy_spark.pipeline.novelty import write_ngram_bloom_index
    from ddsketchy_spark.pipeline.recipes import incremental_crawl_update
    from ddsketchy_spark.pipeline.shards import read_training_shards

    work = str(tmp_path / "crawlwork")
    bench = spark.createDataFrame(
        [(90_000 + i, _doc(i, "bench"), "b", 64) for i in range(5)], SCHEMA)
    bench_idx = str(tmp_path / "bench_bloom")
    write_ngram_bloom_index(bench, bench_idx, n=3)

    c1 = spark.createDataFrame(_crawl1_rows(), SCHEMA)
    rep1 = incremental_crawl_update(
        c1, work, quality_kw=QKW, redact=False, num_perm=64, bands=16,
        benchmark_index=bench_idx, splits={"train": 0.75, "test": 0.25},
        seq_len=128, n_shards=2)
    assert rep1["n_input"] == 47
    assert rep1["n_after_quality"] == 47       # all pass the relaxed bar
    assert rep1["n_after_exact"] == 41         # 6 within-crawl exact dups
    assert rep1["n_after_near"] == 41          # md5-word docs: no near dups
    assert rep1["n_after_decontam"] == 41      # crawl shares nothing w/bench
    assert rep1["n_kept"] == 41
    assert rep1["rollup_version"] == 0 and "drift" not in rep1
    # shards hold every kept NON-NULL-id row; sequences cover all tokens
    got, _manifest = read_training_shards(spark, rep1["shards_path"])
    assert got.count() == 40
    tok_by_split = {r["split"]: r["s"] for r in
                    got.groupBy("split").agg(F.sum("n_tok").alias("s"))
                    .collect()}
    # NULL-id row packs (it has tokens) but cannot shard — account for it
    null_tok = 64
    for name, n in rep1["sequences_per_split"].items():
        expect_tokens = tok_by_split.get(name, 0)
        # the NULL-id doc went to SOME split's pack (split=NULL actually:
        # NULL-key rows get NULL split, excluded from both named packs)
        assert n == math.ceil(expect_tokens / 128), (name, n, expect_tokens)

    # crawl 2: 10 byte-copies of crawl-1 docs (exact index must drop),
    # 5 near-dups (one word changed of 8 -> est J ~ 0.78 at the 0.7
    # threshold of... use threshold 0.6 to catch), 10 fresh, 2 bench-
    # contaminated docs (decontamination must drop)
    c1_texts = {r[0]: r[1] for r in _crawl1_rows() if r[0] is not None}
    rows2 = [(1000 + i, c1_texts[i], "srcA", 70) for i in range(10)]
    rows2 += [(2000 + i,
               c1_texts[i].rsplit(" ", 1)[0] + " changedword" + str(i),
               "srcB", 70) for i in range(5)]
    rows2 += [(3000 + i, _doc(i, "c2fresh"), "srcA", 70) for i in range(10)]
    rows2 += [(4000 + i, _doc(i, "bench"), "srcB", 70) for i in range(2)]
    c2 = spark.createDataFrame(rows2, SCHEMA)
    rep2 = incremental_crawl_update(
        c2, work, quality_kw=QKW, redact=False, num_perm=64, bands=16,
        near_threshold=0.6, benchmark_index=bench_idx,
        splits={"train": 0.75, "test": 0.25}, seq_len=128, n_shards=2,
        compact_every=1)
    assert rep2["n_input"] == 27
    assert rep2["n_after_exact"] == 17         # 10 corpus byte-copies drop
    assert rep2["n_after_near"] == 12          # 5 near-dups drop vs index
    assert rep2["n_after_decontam"] == 10      # 2 contaminated drop
    assert rep2["rollup_version"] == 1
    drift = {d["source"]: d for d in rep2["drift"]}
    assert set(drift) == {"srcA", "srcB"}
    assert all(d["status"] == "both" for d in drift.values())
    assert all(d["delta_count"] < 0 or d["delta_count"] > -100
               for d in drift.values())
    # crawl-2 shards live in their own generation dir
    assert rep2["shards_path"].endswith("crawl=1")
    # crawl 2 compacted both persistent indexes (compact_every=1,
    # version 1) — crawl 3's all-duplicate drop below proves no digest
    # was lost, and the near-dedup stage proves the bands/sigs survived
    assert rep2["indexes_compacted"] == ["exact", "minhash"]
    assert read_training_shards(spark, rep2["shards_path"])[0].count() == 10

    # crawl 3 = crawl 2's fresh docs re-crawled under NEW ids (the same
    # id never matches itself in the index): the steady-state
    # all-duplicate increment — everything drops at the exact index
    c3 = (c2.where("doc_id < 3010 AND doc_id >= 3000")
          .withColumn("doc_id", F.col("doc_id") + 5000))
    rep3 = incremental_crawl_update(
        c3, work,
        quality_kw=QKW, redact=False, num_perm=64, bands=16,
        near_threshold=0.6, seq_len=128, n_shards=2)
    assert rep3["n_after_exact"] == 0
    assert rep3["n_kept"] == 0
    assert rep3["rollup_version"] == 2


def test_eval_picks_held_out_and_fenced(spark, tmp_path):
    """eval_picks_k holds a weighted sample OUT of the shards but INTO
    the dedup indexes: re-crawled copies of eval docs must drop, the
    picks are deterministic across reruns, and no pick reaches a shard."""
    from ddsketchy_spark.pipeline.recipes import incremental_crawl_update
    from ddsketchy_spark.pipeline.shards import read_training_shards

    rows = [(i, _doc(i, "ev"), "srcA" if i % 2 else "srcB", 64 + i)
            for i in range(30)]
    c1 = spark.createDataFrame(rows, SCHEMA)
    work = str(tmp_path / "evalwork")
    rep1 = incremental_crawl_update(
        c1, work, quality_kw=QKW, redact=False, num_perm=64, bands=16,
        eval_picks_k=5, seq_len=128, n_shards=2)
    assert rep1["n_eval_picks"] == 5
    assert rep1["n_after_eval_picks"] == 25
    assert rep1["n_kept"] == 25

    picks = spark.read.parquet(rep1["eval_picks_path"])
    pick_ids = sorted(r["doc_id"] for r in picks.select("doc_id").collect())
    assert len(pick_ids) == 5
    shard_df, _m = read_training_shards(spark, rep1["shards_path"])
    shard_ids = {r["doc_id"] for r in shard_df.select("doc_id").collect()}
    assert not set(pick_ids) & shard_ids
    assert len(shard_ids) == 25

    # deterministic: a fresh workdir picks the identical holdout
    rep1b = incremental_crawl_update(
        c1, str(tmp_path / "evalwork_b"), quality_kw=QKW, redact=False,
        num_perm=64, bands=16, eval_picks_k=5, seq_len=128, n_shards=2)
    picks_b = spark.read.parquet(rep1b["eval_picks_path"])
    assert sorted(r["doc_id"] for r in picks_b.select("doc_id").collect()) \
        == pick_ids

    # leakage fence: byte-copies of the eval docs under new ids drop at
    # the exact index even though the originals never trained
    texts = {r[0]: r[1] for r in rows}
    c2 = spark.createDataFrame(
        [(9000 + i, texts[i], "srcA", 70) for i in pick_ids], SCHEMA)
    rep2 = incremental_crawl_update(
        c2, work, quality_kw=QKW, redact=False, num_perm=64, bands=16,
        seq_len=128, n_shards=2)
    assert rep2["n_after_exact"] == 0
    assert rep2["n_kept"] == 0


def test_crash_rerun_preserves_shards(spark, tmp_path):
    """The stage-9-first ordering (r5 review fix): a crawl that crashed
    AFTER its shard write and index appends but BEFORE its rollup update
    re-runs under the SAME version, drops everything at the exact index,
    and the guard preserves the already-written shard generation instead
    of overwriting it with an empty one."""
    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.pipeline.recipes import incremental_crawl_update
    from ddsketchy_spark.pipeline.shards import read_training_shards

    work = str(tmp_path / "crashwork")
    c1 = spark.createDataFrame(
        [(i, _doc(i, "x1"), "srcA", 64) for i in range(12)], SCHEMA)
    rep1 = incremental_crawl_update(c1, work, quality_kw=QKW, redact=False,
                                    num_perm=64, bands=16, seq_len=128,
                                    n_shards=2)
    assert rep1["rollup_version"] == 0

    c2 = spark.createDataFrame(
        [(100 + i, _doc(i, "x2"), "srcA", 64) for i in range(7)], SCHEMA)
    rep2 = incremental_crawl_update(c2, work, quality_kw=QKW, redact=False,
                                    num_perm=64, bands=16, seq_len=128,
                                    n_shards=2)
    assert rep2["rollup_version"] == 1 and rep2["n_kept"] == 7
    before = sorted(r["doc_id"] for r in
                    read_training_shards(spark, rep2["shards_path"])[0]
                    .collect())
    assert len(before) == 7

    # simulate the crash window: shards written, indexes appended, but
    # the rollup never advanced — delete crawl 2's snapshot
    assert fsio.hadoop_delete(spark, f"{work}/rollup/v=1")

    # re-run crawl 2 as a scheduler would after a crash: the SAME pages
    # re-ingested under FRESH ids (the probe's self-id exclusion means a
    # same-id rerun instead keeps everything and overwrites the same
    # bytes — benign either way). Same version (1), everything drops at
    # the exact index, the guard refuses to clobber the durable shards,
    # and the rollup catches up.
    c2b = c2.withColumn("doc_id", F.col("doc_id") + 500)
    rep2b = incremental_crawl_update(c2b, work, quality_kw=QKW,
                                     redact=False, num_perm=64, bands=16,
                                     seq_len=128, n_shards=2)
    assert rep2b["n_kept"] == 0
    assert rep2b["rollup_version"] == 1
    assert rep2b["shards_preserved_from_prior_run"] is True
    assert rep2b["shards_path"] == rep2["shards_path"]
    after = sorted(r["doc_id"] for r in
                   read_training_shards(spark, rep2b["shards_path"])[0]
                   .collect())
    assert after == before

    # a genuinely all-duplicate LATER crawl still gets its own (empty)
    # fresh generation — the guard never fires across versions
    c3 = c2.withColumn("doc_id", F.col("doc_id") + 1000)
    rep3 = incremental_crawl_update(c3, work, quality_kw=QKW, redact=False,
                                    num_perm=64, bands=16, seq_len=128,
                                    n_shards=2)
    assert rep3["n_kept"] == 0 and rep3["rollup_version"] == 2
    assert "shards_preserved_from_prior_run" not in rep3
    assert rep3["shards_path"].endswith("crawl=2")
