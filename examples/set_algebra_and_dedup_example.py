"""Theta set algebra + semantic dedup + Bloom semi-join, end to end.

What the reference cannot do (it is a single-value quantile sketch) but a
training-data pipeline needs around it: cross-source overlap estimation
from KB-sized states, embedding near-duplicate clustering, and a
join-shuffle cut from a reusable Bloom filter.
Run: python examples/set_algebra_and_dedup_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from ddsketchy_spark.core.theta import ThetaSketch
from ddsketchy_spark.data.synth import write_token_table
from ddsketchy_spark.pipeline.dedup import dedup_semantic
from ddsketchy_spark.spark.companions import theta_state
from ddsketchy_spark.spark.joins import bloom_semi_join
from ddsketchy_spark.spark.session import get_spark


def main() -> None:
    spark = get_spark("set-algebra-example", master="local[8]",
                      shuffle_partitions=8)
    path = "/tmp/ddsketchy_example_tokens"
    write_token_table(path, n_rows=20_000, seed=42, rows_per_file=10_000)
    df = spark.read.parquet(path)

    print("=== 1. Theta set algebra: token-vocabulary overlap per source ===")
    states = {r["source"]: ThetaSketch.from_bytes(r["state"]) for r in
              theta_state(df, "tokens", by=["source"], k=4096,
                          engine="native").collect()}
    srcs = sorted(states)[:3]
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = states[srcs[i]], states[srcs[j]]
            print(f"  |{srcs[i]} ∩ {srcs[j]}| ≈ {a.intersect(b).estimate():8.0f}"
                  f"   jaccard ≈ {ThetaSketch.jaccard(a, b):.3f}")

    print("\n=== 2. Semantic dedup: embedding near-dup clusters ===")
    rng = np.random.default_rng(7)
    base = [(i, rng.standard_normal(16).tolist()) for i in range(50)]
    dups = [(i + 1000, base[i][1]) for i in range(8)]  # exact copies of 0..7
    emb = spark.createDataFrame(base + dups, "vec_id long, embedding array<double>")
    out = dedup_semantic(emb, threshold=0.95, method="exact")
    removed = out.where(~F.col("keep")).orderBy("vec_id").collect()
    print(f"  {len(base) + len(dups)} rows -> "
          f"{out.where('keep').count()} kept, {len(removed)} near-dups removed:")
    for r in removed[:4]:
        print(f"    vec {r['vec_id']} -> canonical {r['component']}")

    print("\n=== 3. Bloom semi-join: filter before the shuffle ===")
    big = df.select("doc_id", "n_tok")
    keys = df.where("n_tok > 2000").select(
        F.col("doc_id").alias("k")).distinct()
    j = bloom_semi_join(big, keys, ["doc_id", "k"], fpr=0.01)
    print(f"  {big.count()} fact rows, {keys.count()} build keys "
          f"-> {j.count()} joined rows (identical to the plain inner join; "
          f"non-members dropped before the shuffle)")

    spark.stop()


if __name__ == "__main__":
    main()
