"""Dump .explain('formatted') for the round-6-touched query shapes.

Usage: python tools/dump_plans_r06.py <repo_dir> <out_dir> <suffix>
Run once from the round-start worktree (suffix 'before') and once from
the optimized tree (suffix 'after'); writes plans/r06/<name>_<suffix>.txt.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = sys.argv[1]
OUT = sys.argv[2]
SUFFIX = sys.argv[3]
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def dump(name: str, df) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{SUFFIX}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print("wrote", path)


def main() -> None:
    from pyspark.sql import functions as F

    from ddsketchy_spark.spark.session import get_spark

    spark = get_spark("plans-r06", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dup = docs.unionByName(
        docs.filter("doc_id < 50")
        .withColumn("doc_id", F.col("doc_id") + 100000))

    # q15: AllPairs exact-Jaccard join
    from ddsketchy_spark.pipeline.dedup import word_jaccard_pairs

    dump("q15_word_jaccard", word_jaccard_pairs(dup, threshold=0.95))

    # q16 broadcast engine: candidate+score frame
    from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs

    dump("q16_minhash_broadcast",
         minhash_lsh_pairs(dup, num_perm=128, bands=32, verify="broadcast"))

    # q17 connected components: one propagation round over the q-shaped
    # edge list (sym join labels -> union -> aggregate)
    from pyspark.sql import DataFrame

    edges = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    sym = edges.union(edges.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if SUFFIX == "before":
            symp = sym.distinct().localCheckpoint()
            labels = (symp.select(F.col("a").alias("node")).distinct()
                      .withColumn("comp", F.col("node")))
        else:
            symp = (sym.repartition(n_parts, "a").dropDuplicates()
                    .localCheckpoint())
            labels = (symp.groupBy(F.col("a").alias("node"))
                      .agg(F.min("b").alias("_mn"))
                      .select("node",
                              F.least(F.col("node"),
                                      F.col("_mn")).alias("comp")))
        msgs = symp.join(labels, symp["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("comp"),
            F.lit(False).alias("_own"))
        own = labels.select("node", "comp", F.lit(True).alias("_own"))
        rnd = (own.unionByName(msgs).groupBy("node")
               .agg(F.min("comp").alias("comp"),
                    F.max(F.when(F.col("_own"), F.col("comp")))
                    .alias("_old")))
        dump("q17_cc_round", rnd)
    except Exception as exc:  # noqa: BLE001
        print("cc dump failed:", exc)

    # q25: BPE round-1 pair-count frame
    tdf = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.split(F.col("text"), " ").alias("tokens"))
    if SUFFIX == "before":
        from ddsketchy_spark.pipeline.bpe import SEP, _to_string_form
        from ddsketchy_spark.pipeline.text import array_pair_counts

        cur = _to_string_form(tdf, "tokens").repartition(8)
        toks = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP)
        dump("q25_bpe_round1",
             array_pair_counts(cur.select(toks.alias("t")), "t", top_k=1))
    else:
        arr = F.col("tokens")
        n = F.size(arr)
        prs = F.when(n >= 2, F.arrays_zip(
            F.slice(arr, 1, n - 1).alias("a"),
            F.slice(arr, 2, n - 1).alias("b")))
        base = (tdf.where(arr.isNotNull() & (n >= 2))
                .select(arr.alias("tokens")).repartition(8))
        dump("q25_bpe_round1",
             base.select(F.explode(prs).alias("p"))
             .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
             .groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.desc("cnt"), F.col("a").cast("string").asc(),
                      F.col("b").cast("string").asc()).limit(1))

    # profile_table: the sketch-pass aggregate (after) vs one per-column
    # HLL pass + one per-column DDSketch pass (before)
    if SUFFIX == "after":
        from ddsketchy_spark.spark.profile import _sketch_entries

        ent = [_sketch_entries("doc_id", 0, "numeric", 0.01, 14),
               _sketch_entries("text", 1, "string", 0.01, 14)]
        kc = (docs.select(F.explode(F.concat(*ent)).alias("e"))
              .select("e.*")
              .groupBy("cid", "kind", "k1", "k2")
              .agg(F.min("vl").alias("minu"), F.count("x").alias("c"),
                   F.sum("x").alias("s"), F.min("x").alias("mn"),
                   F.max("x").alias("mx")))
        dump("profile_sketch_pass", kc)
    else:
        from ddsketchy_spark.spark.companions import _hll_native
        from ddsketchy_spark.spark.ddsketch_agg import _native_key_counts

        dump("profile_sketch_pass_hll_one_col",
             _hll_native(docs, "doc_id", [], 14))
        dump("profile_sketch_pass_dds_one_col",
             _native_key_counts(docs, "doc_id", [], 0.01))

    # q26: IVF-PQ code-table write input (repartition-by-cluster after)
    import numpy as np

    from ddsketchy_spark.pipeline.pq import ivf_pq_index

    vecs = spark.range(2000).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.pmod(F.xxhash64(F.col("id"), F.lit(j)),
                          F.lit(1 << 20)) / F.lit(float(1 << 20)))
                  for j in range(16)]).alias("embedding"))
    idx, cents, books = ivf_pq_index(vecs, n_clusters=4, m=4, nbits=4,
                                     kmeans_iters=2, train_rows=500)
    if SUFFIX == "after":
        dump("q26_ivfpq_write_input", idx.repartition("cluster"))
    else:
        dump("q26_ivfpq_write_input", idx)

    spark.stop()


if __name__ == "__main__":
    main()
