"""q15 diagnostic: AllPairs exact-Jaccard join, PPJoin positional filter
on vs off, interleaved best-of-3 in one session (cancels load drift and
JIT warm-up asymmetry). Replicates bench.py's q15 corpus exactly.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (SparkSession.builder.master(f"local[{CPUS}]")
         .config("spark.sql.shuffle.partitions", CPUS)
         .config("spark.driver.memory", "48g")
         .config("spark.sql.adaptive.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from ddsketchy_spark.pipeline.dedup import word_jaccard_pairs  # noqa: E402

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
dupdocs = docs.unionByName(
    docs.filter("doc_id < 50").withColumn("doc_id", F.col("doc_id") + 100000))
word_jaccard_pairs(dupdocs.limit(500), threshold=0.95, method="allpairs").count()
res = {True: [], False: []}
for _ in range(3):
    for p in (False, True):
        t0 = time.perf_counter()
        n = word_jaccard_pairs(dupdocs, threshold=0.95, method="allpairs",
                               positional=p).count()
        res[p].append(round(time.perf_counter() - t0, 3))
print({"nopos": res[False], "pos": res[True],
       "best_nopos": min(res[False]), "best_pos": min(res[True]),
       "pairs": n, "load_1m": round(os.getloadavg()[0], 2)})
