"""Round-6 optimization probes: isolated per-query timings with noop-sink
stage splits (guide §1.4) for the hot bench queries. NOT the frozen
bench.py — this file exists so optimizations can be measured one operator
at a time without re-running the whole suite.

Usage: python tools/bench_r06.py [probe ...]   (default: all)
Each probe prints one line: {"probe": name, ...timings...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TOKEN_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_TOKEN_ROWS", "800000"))
TOKEN_DIR = f"/tmp/ddsketchy_bench/tokens_{TOKEN_ROWS}"


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def get_session():
    from ddsketchy_spark.spark.session import get_spark

    return get_spark("bench-r06", master=f"local[{CPUS}]",
                     shuffle_partitions=CPUS)


def corpus_50k(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = spark.range(10).select(F.col("id").alias("rep"))
    return (docs.crossJoin(rep)
            .select((F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
                    .alias("doc_id"),
                    F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                             F.lit("x"), F.col("rep").cast("string"),
                             F.lit(" "), F.col("text")).alias("text"))
            .repartition(CPUS).cache())


def dupdocs_5k(spark):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.unionByName(
        docs.filter("doc_id < 50")
        .withColumn("doc_id", F.col("doc_id") + 100000))


def probe_q15(spark, out):
    """Stage split of word_jaccard_allpairs at bench q15 shape."""
    from pyspark.sql import Window, functions as F

    from ddsketchy_spark.pipeline.dedup import word_jaccard_pairs

    dd = dupdocs_5k(spark)
    threshold = 0.95
    # warm
    word_jaccard_pairs(dd.limit(500), threshold=threshold,
                       method="allpairs").count()
    sets = dd.select(F.col("doc_id").alias("id"),
                     F.array_distinct(F.split(F.col("text"), " ")).alias("ws"))
    sets = sets.where(F.col("ws").isNotNull()).withColumn("sz", F.size("ws"))
    toks = sets.select("id", "sz", F.explode("ws").alias("tok"))
    out["toks_rows"] = toks.count()
    out["toks_noop"] = noop(toks)
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    out["dfreq_noop"] = noop(dfreq)
    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("tok"))
    need = F.ceil(F.round(F.col("sz") * F.lit(threshold), 9))
    pref = (toks.join(dfreq, "tok")
            .withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= F.col("sz") - need + 1)
            .select("tok", "id", "sz", "pos"))
    out["pref_rows"] = pref.count()
    out["pref_noop"] = noop(pref)
    a, b = pref.alias("a"), pref.alias("b")
    eps = 1e-9
    overlap_ub = (F.least(F.col("a.pos"), F.col("b.pos"))
                  + F.least(F.col("a.sz") - F.col("a.pos"),
                            F.col("b.sz") - F.col("b.pos")))
    overlap_need = F.ceil(F.round(
        (F.col("a.sz") + F.col("b.sz"))
        * F.lit(threshold / (1.0 + threshold)), 9))
    cond = ((F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") >= F.col("b.sz") * threshold - eps)
            & (F.col("b.sz") >= F.col("a.sz") * threshold - eps)
            & (overlap_ub >= overlap_need))
    cand_raw = a.join(b, cond).select(
        F.col("a.id").alias("id_a"), F.col("a.sz").alias("_sza"),
        F.col("b.id").alias("id_b"), F.col("b.sz").alias("_szb"))
    out["cand_raw_rows"] = cand_raw.count()
    cand = cand_raw.dropDuplicates(["id_a", "id_b"])
    out["cand_rows"] = cand.count()
    out["cand_noop"] = noop(cand)
    ta = toks.select(F.col("id").alias("id_a"), "tok")
    tb = toks.select(F.col("id").alias("id_b"), "tok")
    expand = cand.join(ta, "id_a")
    out["expand_rows"] = expand.count()
    verified = (expand.join(tb, ["id_b", "tok"])
                .groupBy("id_a", "id_b", "_sza", "_szb")
                .agg(F.count(F.lit(1)).alias("_inter"))
                .select("id_a", "id_b",
                        (F.col("_inter")
                         / (F.col("_sza") + F.col("_szb") - F.col("_inter")))
                        .alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))
    out["full_noop"] = noop(verified)
    t0 = time.perf_counter()
    out["pairs"] = word_jaccard_pairs(dd, threshold=threshold,
                                      method="allpairs").count()
    out["e2e"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    word_jaccard_pairs(dd, threshold=threshold, method="allpairs").count()
    out["e2e_2"] = round(time.perf_counter() - t0, 3)


def probe_q16(spark, out):
    """minhash_lsh_pairs verify=local stage split at the 50k corpus."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup import (
        minhash_lsh_pairs, minhash_signatures)

    corpus = corpus_50k(spark)
    out["corpus_docs"] = corpus.count()
    # warm
    lp = minhash_lsh_pairs(corpus.limit(2000), num_perm=128, bands=32,
                           verify="local")
    lp.count()
    release_cached_deps(lp)
    sigs = minhash_signatures(corpus, "text", "doc_id", 128, 3, 1)
    out["sigs_noop"] = noop(sigs)
    out["sigs_noop2"] = noop(sigs)
    for trial in range(2):
        t0 = time.perf_counter()
        lp = minhash_lsh_pairs(corpus, num_perm=128, bands=32,
                               verify="local")
        out["pairs"] = lp.count()
        out[f"e2e_{trial}"] = round(time.perf_counter() - t0, 3)
        release_cached_deps(lp)
    corpus.unpersist()


def probe_q17(spark, out):
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.pipeline.dedup import dedup_near_text

    corpus = corpus_50k(spark)
    out["corpus_docs"] = corpus.count()
    dn = dedup_near_text(corpus.limit(2000), threshold=0.8, num_perm=128,
                         bands=32, verify="local")
    dn.where("keep").count()
    release_cached_deps(dn)
    for trial in range(2):
        t0 = time.perf_counter()
        dn = dedup_near_text(corpus, threshold=0.8, num_perm=128, bands=32,
                             verify="local")
        out["kept"] = dn.where("keep").count()
        out[f"e2e_{trial}"] = round(time.perf_counter() - t0, 3)
        release_cached_deps(dn)
    corpus.unpersist()


def probe_q25(spark, out):
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.bpe import train_bpe_merges

    tdf = spark.read.parquet(TOKEN_DIR)
    bpe_in = tdf.where(F.col("doc_id") < "doc-000000050000")
    for trial in range(2):
        t0 = time.perf_counter()
        merges = train_bpe_merges(bpe_in, "tokens", n_merges=2,
                                  validate=False).collect()
        out[f"e2e_{trial}"] = round(time.perf_counter() - t0, 3)
    out["top_count"] = int(merges[0]["pair_count"])


def probe_q26(spark, out):
    import numpy as np
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.pq import (
        ann_query_ivf_pq, ivf_pq_index, pq_encode, read_ivf_pq_index,
        train_pq_codebooks, write_ivf_pq_index)

    def synth_vecs(ids, id_alias="vec_id", scale=1.0):
        comps = [
            ((F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(1 << 20))
              / F.lit(float(1 << 20))) - F.lit(0.5)) * F.lit(scale)
            for j in range(64)
        ]
        return ids.select(F.col("id").alias(id_alias),
                          F.array(*comps).alias("embedding"))

    corpus_v = synth_vecs(spark.range(45_000))
    t0 = time.perf_counter()
    books = train_pq_codebooks(corpus_v, m=8, nbits=8, kmeans_iters=10,
                               train_rows=10_000, seed=11)
    out["train_books"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out["encoded"] = pq_encode(corpus_v, books).count()
    out["encode"] = round(time.perf_counter() - t0, 3)
    qv = [r["embedding"] for r in
          corpus_v.where("vec_id < 64").orderBy("vec_id").collect()]
    tmpd = tempfile.mkdtemp(prefix="r06_ivfpq_")
    try:
        t0 = time.perf_counter()
        idx, cents, rbooks = ivf_pq_index(
            corpus_v, n_clusters=16, m=8, nbits=8, kmeans_iters=10,
            train_rows=10_000, seed=11)
        out["ivfpq_build_lazy"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        write_ivf_pq_index(idx, cents, rbooks, f"{tmpd}/idx")
        out["ivfpq_write"] = round(time.perf_counter() - t0, 3)
        stored, cd, rb, _m = read_ivf_pq_index(spark, f"{tmpd}/idx")
        t0 = time.perf_counter()
        out["probe_results"] = ann_query_ivf_pq(stored, cd, rb, qv,
                                                k=10, n_probe=4).count()
        out["probe_64q"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)


def probe_q27(spark, out):
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.ddsketch_agg import (
        _native_key_counts, ddsketch_quantiles, ddsketch_rollup)

    tdf = spark.read.parquet(TOKEN_DIR)
    t27 = tdf.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(8)))
    # warm
    ddsketch_quantiles(tdf.limit(1000), "tokens", quantiles=(0.5,))
    kc = _native_key_counts(t27, "tokens", ["source", "bucket"], 0.01)
    out["kc_rows"] = kc.count()
    out["kc_noop"] = noop(kc)
    for trial in range(2):
        t0 = time.perf_counter()
        roll = ddsketch_rollup(t27, "tokens", ["source", "bucket"],
                               alpha=0.01)
        out["rows"] = roll.count()
        out[f"e2e_{trial}"] = round(time.perf_counter() - t0, 3)
        release_cached_deps(roll)
    t0 = time.perf_counter()
    ddsketch_quantiles(t27, "tokens", by=["source", "bucket"],
                       alpha=0.01).count()
    out["ctrl_finest"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ddsketch_quantiles(t27, "tokens", by=["source"], alpha=0.01).count()
    ddsketch_quantiles(t27, "tokens", alpha=0.01)
    out["ctrl_rest"] = round(time.perf_counter() - t0, 3)


def probe_q7(spark, out):
    from ddsketchy_spark.spark.companions import hll_distinct

    tdf = spark.read.parquet(TOKEN_DIR)
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = hll_distinct(tdf, "tokens", p=14, engine="native")
        trials.append(round(time.perf_counter() - t0, 3))
    out["est"] = r["distinct_est"]
    out["trials"] = trials


def probe_q10(spark, out):
    from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet
    from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator

    dagg = DDSketchAggregator("tokens", alpha=0.01, quantiles=(0.5, 0.99))
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = sketch_aggregate_parquet(spark, TOKEN_DIR, dagg)
        trials.append(round(time.perf_counter() - t0, 3))
    out["count"] = r["count"]
    out["p50"] = r["p50"]
    out["p99"] = r["p99"]
    out["sum"] = r["sum"]
    out["trials"] = trials


def probe_q5(spark, out):
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    tdf = spark.read.parquet(TOKEN_DIR)
    ddsketch_quantiles(tdf.limit(1000), "n_tok", quantiles=(0.5,))
    trials_g, trials_by = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        ddsketch_quantiles(tdf, "n_tok", alpha=0.01,
                           quantiles=(0.5, 0.9, 0.99, 0.999))
        trials_g.append(round(time.perf_counter() - t0, 3))
        t0 = time.perf_counter()
        ddsketch_quantiles(tdf, "n_tok", by=["source"], alpha=0.01,
                           quantiles=(0.5, 0.99)).collect()
        trials_by.append(round(time.perf_counter() - t0, 3))
    out["global_trials"] = trials_g
    out["by_trials"] = trials_by


def probe_tokens(spark, out):
    """q6-probe twin: global array-column ddsketch on this session."""
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    tdf = spark.read.parquet(TOKEN_DIR)
    ddsketch_quantiles(tdf, "tokens", alpha=0.01, quantiles=(0.5,))
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = ddsketch_quantiles(tdf, "tokens", alpha=0.01,
                               quantiles=(0.5, 0.9, 0.99, 0.999))
        trials.append(round(time.perf_counter() - t0, 3))
    out["tokens"] = r["count"]
    out["trials"] = trials
    out["tokens_per_sec"] = round(r["count"] / min(trials))


PROBES = {
    "q15": probe_q15, "q16": probe_q16, "q17": probe_q17,
    "q25": probe_q25, "q26": probe_q26, "q27": probe_q27,
    "q7": probe_q7, "q10": probe_q10, "q5": probe_q5,
    "tokens": probe_tokens,
}


def main() -> None:
    names = sys.argv[1:] or list(PROBES)
    from bench import ensure_token_table

    ensure_token_table()
    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        out: dict = {"probe": name,
                     "load_1m": round(os.getloadavg()[0], 2)}
        spark.sparkContext.setJobDescription(f"r06 probe {name}")
        t0 = time.perf_counter()
        PROBES[name](spark, out)
        out["probe_wall"] = round(time.perf_counter() - t0, 3)
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
