"""Measure the interpreted-HOF stopword/marker counts (quality_scores /
lang_id) against a regexp_count rewrite on the q16 50k corpus (r3 verdict
item #3). Interleaved best-of-3 per variant.
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
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from ddsketchy_spark.pipeline.text import LANG_MARKERS, STOPWORDS  # noqa: E402

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
rep = spark.range(10).select(F.col("id").alias("rep"))
corpus = (docs.crossJoin(rep)
          .select((F.col("doc_id") + F.col("rep") * F.lit(10_000_000))
                  .alias("doc_id"),
                  F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                           F.lit("x"), F.col("rep").cast("string"),
                           F.lit(" "), F.col("text")).alias("text"))
          .repartition(int(CPUS)).cache())
n = corpus.count()
print("corpus docs:", n)

words = F.split(F.col("text"), " ")


def tok_regex(ws):
    alt = "|".join(ws)
    return f"(?:^| )(?:{alt})(?= |\\z)"


# variant A: current HOF filter lambda
stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
hof_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
# variant B: one regexp_count
re_stop = F.regexp_count(F.col("text"), F.lit(tok_regex(STOPWORDS)))

# sanity: identical counts doc-for-doc
mism = (corpus.select(hof_stop.alias("a"), re_stop.alias("b"))
        .where("a <> b").count())
print("stopword count mismatches:", mism)

# lang_id variants: 5 languages x 10 markers
hof_hits = {f"h_{lang}": F.size(F.filter(
    words, (lambda arr: lambda w: F.array_contains(arr, w))(
        F.array(*[F.lit(m) for m in ms]))))
    for lang, ms in LANG_MARKERS.items()}
re_hits = {f"h_{lang}": F.regexp_count(F.col("text"), F.lit(tok_regex(ms)))
           for lang, ms in LANG_MARKERS.items()}
mism2 = (corpus.select(
    *[hof_hits[k].alias(k + "_a") for k in hof_hits],
    *[re_hits[k].alias(k + "_b") for k in re_hits])
    .where(" OR ".join(f"{k}_a <> {k}_b" for k in hof_hits)).count())
print("lang marker mismatches:", mism2)


def timeit(cols):
    t0 = time.perf_counter()
    corpus.select([c.alias(f"c{i}") for i, c in enumerate(cols)]) \
          .agg(*[F.sum(f"c{i}") for i in range(len(cols))]).collect()
    return round(time.perf_counter() - t0, 3)


res = {"hof_stop": [], "re_stop": [], "hof_lang": [], "re_lang": []}
for name, cols in res.items():
    pass
for _ in range(3):
    res["hof_stop"].append(timeit([hof_stop]))
    res["re_stop"].append(timeit([re_stop]))
    res["hof_lang"].append(timeit(list(hof_hits.values())))
    res["re_lang"].append(timeit(list(re_hits.values())))
best = {k: min(v) for k, v in res.items()}
print({"trials": res, "best": best, "docs": n,
       "docs_per_sec": {k: round(n / v) for k, v in best.items()},
       "load_1m": os.getloadavg()[0]})
