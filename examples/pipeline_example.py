"""End-to-end training-data pipeline demo over the documents/embeddings
tables: quality filtering -> language ID -> exact + near dedup -> similarity
search -> per-source sequence-length sketches -> BPE tokenizer fit ->
BM25 search + TF-IDF keywords -> source drift distances -> FD spectrum ->
JL-reduced PQ codes.
Run: python examples/pipeline_example.py [sf_dir]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ddsketchy_spark.pipeline.dedup import dedup_exact, dedup_near_text, minhash_lsh_pairs
from ddsketchy_spark.pipeline.similarity import ann_query, lsh_cosine_topk
from ddsketchy_spark.pipeline.text import lang_id, ngram_counts, quality_filter, token_stats
from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles
from ddsketchy_spark.spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("pipeline-example", master="local[4]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. token counts + audited quality filtering (all native projections)
    enriched = quality_filter(token_stats(docs), min_words=10)
    enriched.groupBy("drop_reason").count().orderBy("drop_reason").show()
    kept = enriched.filter("keep")
    print(f"quality filter: {docs.count()} -> {kept.count()} docs")

    # 2. language ID distribution
    lang_id(kept).groupBy("pred_lang").count().orderBy("pred_lang").show()

    # 3. dedup: exact (hash-groupBy) then near-dup candidates (MinHash LSH)
    deduped = dedup_exact(kept)
    pairs = minhash_lsh_pairs(kept, num_perm=128, bands=32)
    near = pairs.filter("est_jaccard > 0.8").count()
    print(f"exact dedup kept {deduped.count()}; near-dup pairs (J>0.8): {near}")
    # ...or the composed one-call version through the fully distributed
    # verify='local' engine (LSH -> threshold -> connected components)
    survivors = dedup_near_text(kept, threshold=0.8, verify="local").filter("keep")
    print(f"dedup_near_text kept {survivors.count()} docs")
    ngram_counts(kept, n=2, top_k=5).show()

    # 4. similarity search over embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.first()["embedding"]
    print("nearest neighbors of vec 0:")
    ann_query(emb, qvec, k=4).show()
    print(f"LSH top-k pairs: {lsh_cosine_topk(emb, k=2).count()} rows")

    # 5. distribution sketch of document lengths per source
    ddsketch_quantiles(kept, "n_chars", by=["source"],
                       quantiles=(0.5, 0.99)).orderBy("source").show(5)

    # 6. tokenizer fit: train BPE merges on the survivors' word arrays,
    # then measure how a tiny vocab would cover each source
    from ddsketchy_spark.pipeline.bpe import train_bpe_merges
    from ddsketchy_spark.pipeline.text import vocab_coverage

    words = kept.select("source", F.split("text", " ").alias("w"))
    print("top BPE merges:")
    train_bpe_merges(words, "w", n_merges=3).show(truncate=False)
    print("OOV rate per source vs the top-200-word vocab:")
    vocab_coverage(words, "w", 200, by=["source"]).orderBy("source").show(5)

    # 7. weighted ingest: a pre-aggregated (value, count) frequency table
    # sketches EXACTLY like the expanded rows, shuffling only
    # O(distinct values) — the 10^12-token shape
    freq = kept.groupBy("n_chars").agg(F.count(F.lit(1)).alias("occurrences"))
    weighted = ddsketch_quantiles(freq, "n_chars", weight_col="occurrences",
                                  quantiles=(0.5, 0.99))
    print(f"weighted sketch over {freq.count()} frequency rows: "
          f"count={weighted['count']} p50={weighted['p50']:.1f} "
          f"p99={weighted['p99']:.1f}")

    # 8. rollup cube: per-(source, lang), per-source AND global quantiles
    # from ONE scan (coarser levels merge the finest bucket rows)
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_rollup

    cube = ddsketch_rollup(lang_id(kept), "n_chars",
                           ["source", "pred_lang"], quantiles=(0.5,))
    cube.orderBy("rollup_level", "source", "pred_lang").show(8)
    release_cached_deps(cube)

    # 9. compressed ANN: 8-byte PQ codes (64x smaller than the floats)
    # answer the same query via one broadcast lookup table
    from ddsketchy_spark.pipeline.pq import (
        ann_query_pq, pq_encode, train_pq_codebooks)

    books = train_pq_codebooks(emb, m=8, nbits=8, train_rows=10_000)
    enc = pq_encode(emb, books)
    print("PQ/ADC nearest neighbors of vec 0 (from 8-byte codes):")
    ann_query_pq(enc, books, [qvec], k=4).show()

    # 10. corpus retrieval + summarization: BM25 search for a probe query
    # (2 scans, zero token shuffle) and per-doc TF-IDF keywords
    from ddsketchy_spark.pipeline.search import bm25_topk, tfidf_keywords

    print("BM25 top-3 docs for 'spark scan merge':")
    bm25_topk(kept, "spark scan merge", k=3).show()
    print("TF-IDF keywords of the first docs:")
    tfidf_keywords(kept, k=2).orderBy("doc_id", "rank").show(6)

    # 11. distribution drift: how far apart are the sources' doc-length
    # distributions? (KS / Wasserstein from DDSketch bucket atoms alone)
    from ddsketchy_spark.spark.distance import ddsketch_distance

    print("pairwise KS/W1 between sources' n_chars distributions:")
    ddsketch_distance(kept, "n_chars", "source").show(5)

    # 12. embedding spectrum: Frequent Directions sketch of the whole
    # embedding matrix (vectors never shuffle; the certified err_bound
    # rides in the output) — calibrates PQ m / JL out_dim choices
    from ddsketchy_spark.spark.agg import sketch_aggregate
    from ddsketchy_spark.spark.matrix import FDAggregator

    spec = sketch_aggregate(emb.where(F.col("embedding").isNotNull()),
                            FDAggregator("embedding", dim=64, ell=32,
                                         k_out=3))
    print(f"FD spectrum: sv1={spec['sv_1']:.2f} sv2={spec['sv_2']:.2f} "
          f"sv3={spec['sv_3']:.2f} (err_bound={spec['err_bound']:.2f}, "
          f"n={spec['n_rows']})")

    # 13. JL reduction: 64 -> 16 dims before indexing (4x less shuffle
    # and index footprint; deterministic matrix, no sidecar)
    from ddsketchy_spark.pipeline.similarity import reduce_dim

    red = reduce_dim(emb, 16, 64, seed=5)
    books16 = train_pq_codebooks(red, m=4, nbits=8, train_rows=10_000)
    print(f"JL 64->16 + PQ: {pq_encode(red, books16).count()} vectors "
          f"at 4 bytes/code")
    spark.stop()


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
