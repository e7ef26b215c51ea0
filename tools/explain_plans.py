"""Physical-plan audit for the headline operators.

Prints `.explain("formatted")` for each and greps the properties that matter
at 100 TB: column pruning (ReadSchema), predicate pushdown (PushedFilters),
whole-stage codegen spans, join strategies (broadcast for small dims), and
that sketch plans shuffle bucket/state rows rather than input rows.

Usage: python tools/explain_plans.py [name ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(name: str, df, want: list[str], reject: list[str] = ()) -> bool:
    p = plan_of(df)
    ok = True
    print(f"== {name} ==")
    for w in want:
        hit = re.search(w, p) is not None
        print(f"  want {w!r}: {'OK' if hit else 'MISSING'}")
        ok &= hit
    for r in reject:
        hit = re.search(r, p) is not None
        print(f"  reject {r!r}: {'PRESENT (bad)' if hit else 'absent (good)'}")
        ok &= not hit
    if os.environ.get("EXPLAIN_FULL"):
        print(p)
    return ok


def main() -> None:
    from pyspark.sql import functions as F

    from ddsketchy_spark.spark.companions import _cms_native, _hll_native
    from ddsketchy_spark.spark.ddsketch_agg import _native_key_counts
    from ddsketchy_spark.spark.session import get_spark
    from ddsketchy_spark.pipeline.dedup import exact_dup_groups

    spark = get_spark("plans", master="local[4]", shuffle_partitions=4,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")

    results = {}

    # 1. native DDSketch build: pruned scan, codegen hash agg, no Python
    kc = _native_key_counts(events.filter("value > 1.0"), "value", ["event_type"], 0.01)
    results["dds_native_grouped"] = audit(
        "dds_native_grouped", kc,
        want=[r"ReadSchema: struct<event_type:string,value:double>",
              r"PushedFilters: .*GreaterThan\(value,1\.0\)",
              # partial agg -> exchange -> final agg == map-side combine
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"],
        reject=[r"BatchEvalPython", r"FlatMapGroupsInPandas", r"ArrowEvalPython"],
    )

    # 1b. weighted native DDSketch build (weight_col): the same pruned-
    # scan + codegen map-side-combine shape, now reading exactly the
    # value + weight + group columns — weights multiply inside the JVM
    # hash aggregate, never in Python
    kcw = _native_key_counts(lineitem, "l_extendedprice", ["l_returnflag"],
                             0.01, weight_col="l_quantity")
    results["dds_native_weighted"] = audit(
        "dds_native_weighted", kcw,
        want=[r"ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>",
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"],
        reject=[r"BatchEvalPython", r"FlatMapGroupsInPandas",
                r"ArrowEvalPython", r"(MapInArrow|PythonMapInArrow)"],
    )

    # 1c. rollup cube: every level re-aggregates the PERSISTED bucket-row
    # frame (InMemoryTableScan) — one scan of the data no matter how many
    # levels; the per-level assembly is the intended mapInArrow
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_rollup

    roll = ddsketch_rollup(events, "value", ["event_type"],
                           quantiles=(0.5,))
    results["dds_rollup_cube"] = audit(
        "dds_rollup_cube", roll,
        want=[r"InMemoryTableScan", r"Union"],
        reject=[r"BatchEvalPython", r"FlatMapGroupsInPandas",
                r"ArrowEvalPython"],
    )
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    release_cached_deps(roll)

    # 1d. generic blob rollup (any SketchAggregator): coarser levels merge
    # the PERSISTED finest-level blobs (InMemoryTableScan), one data scan
    # total; the blob merge is the intended mapInArrow
    from ddsketchy_spark.spark.agg import sketch_rollup
    from ddsketchy_spark.spark.companions import HLLAggregator

    sroll = sketch_rollup(events, HLLAggregator("user_id", p=12),
                          ["event_type"], levels=[["event_type"]])
    results["sketch_rollup_blob"] = audit(
        "sketch_rollup_blob", sroll,
        want=[r"InMemoryTableScan", r"(MapInArrow|PythonMapInArrow)"],
        reject=[r"BatchEvalPython", r"FlatMapGroupsInPandas",
                r"ArrowEvalPython", r"SortMergeJoin", r"CartesianProduct"],
    )
    release_cached_deps(sroll)

    # 2. native HLL: same properties over the exploded tokens path
    hll = _hll_native(events, "user_id", [], 14)
    results["hll_native"] = audit(
        "hll_native", hll,
        want=[r"ReadSchema: struct<user_id:bigint>", r"HashAggregate", r"xxhash64"],
        reject=[r"ArrowEvalPython", r"BatchEvalPython"],
    )

    # 3. native CMS
    cms = _cms_native(lineitem, "l_partkey", [], 5, 1 << 14)
    results["cms_native"] = audit(
        "cms_native", cms,
        want=[r"ReadSchema: struct<l_partkey:bigint>", r"HashAggregate"],
        reject=[r"ArrowEvalPython"],
    )

    # 4. exact dedup: only digest+id shuffle (text must not survive projection)
    dg = exact_dup_groups(docs)
    results["exact_dedup"] = audit(
        "exact_dedup", dg,
        want=[r"ReadSchema: struct<doc_id:bigint,text:string>",
              # partial object-hash agg before the exchange: the text column
              # never shuffles, only (digest, partial state)
              r"ObjectHashAggregate[\s\S]*Exchange[\s\S]*ObjectHashAggregate"],
        reject=[],
    )

    # 5. broadcast join: small dim side must broadcast, not shuffle
    j = (lineitem.join(F.broadcast(orders.filter("o_orderstatus = 'O'")),
                       lineitem.l_orderkey == orders.o_orderkey)
         .groupBy("o_custkey").agg(F.sum("l_extendedprice").alias("rev")))
    results["broadcast_join"] = audit(
        "broadcast_join", j,
        want=[r"BroadcastHashJoin", r"PushedFilters: .*EqualTo\(o_orderstatus,O\)"],
        reject=[r"SortMergeJoin"],
    )

    # theta native global: hash -> DISTINCT (partial agg both sides of the
    # exchange) -> unsigned top-(k+1) as TakeOrdered (never a full sort)
    from ddsketchy_spark.spark.companions import _theta_native_hashes

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    th = _theta_native_hashes(ev, "user_id", [], 4096)
    results["theta_native_global"] = audit(
        "theta_native_global", th,
        want=[r"ReadSchema: struct<user_id:bigint>", r"xxhash64",
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
              r"TakeOrderedAndProject"],
        reject=[r"\bSort\b.*global=true"],
    )

    # interval join must compile to an equi hash join on the bucket id —
    # never a nested-loop/cartesian theta join
    from ddsketchy_spark.spark.joins import asof_join, interval_join

    pts = ev.select("event_type", "value")
    bands = spark.createDataFrame(
        [(i, i * 15.0, i * 15.0 + 25.0) for i in range(20)],
        "band long, lo double, hi double")
    ij = interval_join(pts, bands, "value", "lo", "hi", bucket_width=25.0)
    results["interval_join"] = audit(
        "interval_join", ij,
        want=[r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)"],
        reject=[r"BroadcastNestedLoopJoin", r"CartesianProduct"],
    )

    # as-of join: one window over the union, no join node at all
    clicks = ev.where("event_type = 'click'").select("user_id", "ts", "value")
    purch = (ev.where("event_type = 'purchase'")
             .select("user_id", "ts", F.col("value").alias("px")))
    aj = asof_join(clicks, purch, "ts", ["user_id"], ["px"])
    results["asof_join"] = audit(
        "asof_join", aj,
        want=[r"Window", r"Union"],
        reject=[r"Join", r"CartesianProduct"],
    )

    # AllPairs word-Jaccard: equi hash/sort-merge joins only — the whole
    # point is replacing the cartesian with prefix-filtered candidates;
    # all native (no Python eval anywhere)
    from ddsketchy_spark.pipeline.dedup import word_jaccard_pairs

    wj = word_jaccard_pairs(docs, threshold=0.8, method="allpairs")
    results["word_jaccard_allpairs"] = audit(
        "word_jaccard_allpairs", wj,
        want=[r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)"],
        reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )

    # LSH local verify: candidate self-join + sig join-back must be equi
    # joins; the only Python is the mapInArrow signature pass (no per-group
    # applyInPandas, no cartesian)
    from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs

    ml = minhash_lsh_pairs(docs, num_perm=32, bands=8, verify="local")
    results["minhash_lsh_local"] = audit(
        "minhash_lsh_local", ml,
        want=[r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)",
              r"(MapInArrow|PythonMapInArrow|ArrowEvalPython)"],
        reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                r"FlatMapGroupsInPandas"],
    )

    # quality_filter: pure codegen projection — no shuffle, no Python, and
    # the doc scan prunes to (doc_id, text)-ish columns only
    from ddsketchy_spark.pipeline.text import ngram_counts, quality_filter

    qf = quality_filter(docs.select("doc_id", "text")).select(
        "doc_id", "keep", "drop_reason")
    results["quality_filter"] = audit(
        "quality_filter", qf,
        want=[r"ReadSchema: struct<doc_id:bigint,text:string>"],
        reject=[r"Exchange", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )

    # clean_lines (C4 line-level cleaning): pure row-wise projection —
    # the filter() HOF over split lines stays a projection expression
    # (interpreted per LINE, fine per-row), never an exchange or Python
    from ddsketchy_spark.pipeline.text import clean_lines

    cl = clean_lines(docs.select("doc_id", "text")).select(
        "doc_id", "n_kept_lines", "drop_reason", "keep")
    results["clean_lines"] = audit(
        "clean_lines", cl,
        want=[r"ReadSchema: struct<doc_id:bigint,text:string>"],
        reject=[r"Exchange", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )

    # URL domain gate: literal blocklist stays a pure codegen projection;
    # DataFrame blocklist must broadcast (corpus never shuffles)
    from ddsketchy_spark.pipeline.urls import filter_by_domain

    urls = docs.select(
        "doc_id",
        F.concat(F.lit("https://site"),
                 (F.col("doc_id") % 13).cast("string"),
                 F.lit(".com/p")).alias("url"))
    ud1 = filter_by_domain(urls, ["site3.com"]).select("doc_id", "keep")
    results["url_filter_literal"] = audit(
        "url_filter_literal", ud1,
        want=[],
        reject=[r"Exchange", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )
    bl = spark.createDataFrame([("site3.com",)], "d string")
    ud2 = filter_by_domain(urls, bl).select("doc_id", "keep")
    results["url_filter_broadcast"] = audit(
        "url_filter_broadcast", ud2,
        want=[r"BroadcastHashJoin"],
        reject=[r"SortMergeJoin", r"CartesianProduct", r"BatchEvalPython",
                r"ArrowEvalPython"],
    )

    # ngram counting: map-side-combining hash aggregate, TakeOrdered (no
    # global sort), no Python
    ng = ngram_counts(docs, n=2, top_k=20)
    results["ngram_counts"] = audit(
        "ngram_counts", ng,
        want=[r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
              r"TakeOrderedAndProject"],
        reject=[r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )

    # paragraph dedup: first-occurrence law via map-side-combining
    # min-struct aggregate (never a per-hash window — unsplittable hot
    # key); text rewrite is a native projection, no Python anywhere
    from ddsketchy_spark.pipeline.dedup import dedup_paragraphs

    dp = dedup_paragraphs(docs)
    results["dedup_paragraphs"] = audit(
        "dedup_paragraphs", dp,
        want=[r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"],
        reject=[r"Window", r"CartesianProduct", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # boilerplate removal: frequency law via distinct-then-count (two
    # map-side-combining aggregates, never countDistinct-per-group or a
    # window — a billion-occurrence cookie banner must stay splittable);
    # text rewrite is a native projection, no Python anywhere
    from ddsketchy_spark.pipeline.text import remove_boilerplate_lines

    bp = remove_boilerplate_lines(docs, min_docs=5, engine="join")
    results["remove_boilerplate_lines"] = audit(
        "remove_boilerplate_lines", bp,
        want=[r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"],
        reject=[r"Window", r"CartesianProduct", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # broadcast engine (the auto default at real boiler-set sizes): the
    # returned frame is ONE mapInArrow projection over the input — no
    # join, no shuffle, no HOF; the text column never moves. (The boiler
    # set itself was collected by a separate bounded probe action.)
    bpb = remove_boilerplate_lines(docs, min_docs=5, engine="broadcast")
    results["remove_boilerplate_broadcast"] = audit(
        "remove_boilerplate_broadcast", bpb,
        want=[r"(MapInArrow|PythonMapInArrow)"],
        reject=[r"Exchange", r"Join", r"Window", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas"],
    )

    # winnowing: pruned scan feeding one mapInArrow pass — no shuffle, no
    # per-row Python, the char-length guard is a pushable filter
    from ddsketchy_spark.pipeline.text import winnowing_fingerprints

    wf = winnowing_fingerprints(docs)
    results["winnowing_fingerprints"] = audit(
        "winnowing_fingerprints", wf,
        want=[r"ReadSchema: struct<doc_id:bigint,text:string>",
              r"(MapInArrow|PythonMapInArrow)"],
        reject=[r"Exchange", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )

    # substring-overlap pairs: winnowing mapInArrow feeding an fp-bucket
    # equi self-join + map-side-combining pair count — candidates confined
    # to fingerprint buckets, never a cartesian, no per-pair Python
    from ddsketchy_spark.pipeline.dedup import substring_overlap_pairs

    sop = substring_overlap_pairs(docs, min_len=64)
    results["substring_pairs"] = audit(
        "substring_pairs", sop,
        want=[r"(MapInArrow|PythonMapInArrow)",
              r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)",
              r"HashAggregate"],
        reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"Window"],
    )

    # time-bucketed as-of join (hot-key path): windows + equi joins on
    # (key, bucket) only — never a range/nested-loop join
    ajb = asof_join(clicks, purch, "ts", ["user_id"], ["px"], time_buckets=8)
    results["asof_join_time_buckets"] = audit(
        "asof_join_time_buckets", ajb,
        want=[r"Window", r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)"],
        reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin"],
    )

    # mixture sampling: one hash aggregate for totals, the per-source rate
    # side BROADCAST, then a pure projection/filter — no window, no Python,
    # no extra shuffle of the corpus
    from ddsketchy_spark.pipeline.mix import pack_sequences, sample_to_token_budget

    mx = sample_to_token_budget(docs, {"src0": 4000.0, "src1": 20000.0},
                                token_col="n_chars", seed=7)
    results["mixture_sample"] = audit(
        "mixture_sample", mx,
        want=[r"BroadcastHashJoin", r"HashAggregate"],
        reject=[r"Window", r"CartesianProduct", r"SortMergeJoin",
                r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # unigram LM quality score: word-count aggregate + deterministic
    # TakeOrdered vocab cut, vocab BROADCAST onto the exploded tokens,
    # map-side-collapsing per-doc aggregate — no window, no Python, no
    # cartesian (the 1-row total attach is a broadcast nested loop by
    # design, so only CartesianProduct is rejected)
    from ddsketchy_spark.pipeline.text import unigram_logprob_scores

    ug = unigram_logprob_scores(docs, vocab_size=500)
    results["unigram_logprob"] = audit(
        "unigram_logprob", ug,
        want=[r"TakeOrderedAndProject", r"BroadcastHashJoin",
              r"HashAggregate"],
        reject=[r"CartesianProduct", r"Window", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # sequence packing: distributed prefix sum — per-bucket totals
    # aggregate, broadcast of the tiny bucket-offset side, within-bucket
    # windows only; no Python, no cartesian
    pk = pack_sequences(docs, 2048, token_col="n_chars", seed=5)
    results["pack_sequences"] = audit(
        "pack_sequences", pk,
        want=[r"Window", r"HashAggregate", r"BroadcastHashJoin"],
        reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # sketch-guided range assignment: after the one-pass sketch build
    # (driver-side boundaries), assignment is a PURE PROJECTION — no
    # join, no window, no exchange, no Python; the scan stays pruned
    from ddsketchy_spark.pipeline.partition import assign_range_id

    ra = assign_range_id(docs.select("doc_id", "n_chars"), "n_chars",
                         [100.0, 500.0, 2000.0])
    results["range_assign"] = audit(
        "range_assign", ra,
        want=[r"ReadSchema: struct<doc_id:bigint,n_chars:bigint>",
              r"Project \[codegen id : \d+\]"],
        reject=[r"Exchange", r"Window", r"Join", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # KMV distinct sample, global: distinct reduces map-side (partial
    # HashAggregate before the exchange), bottom-k compiles to
    # TakeOrderedAndProject (per-partition top-k + driver k-row merge,
    # never a global Sort), zero Python
    from ddsketchy_spark.spark.sampling import (
        kmv_sample_native,
        weighted_sample_native,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    ks = kmv_sample_native(orders, "o_custkey", k=50)
    results["kmv_sample_global"] = audit(
        "kmv_sample_global", ks,
        want=[r"TakeOrderedAndProject",
              r"Keys \[1\]: \[key#",
              r"ReadSchema: struct<o_custkey:bigint>"],
        reject=[r"GlobalSort", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # weighted sample, grouped: ONE exchange keyed on the group column
    # carries both the distinct pre-reduce and the window top-k (AQE may
    # add its own read stages, but no second shuffle key appears)
    ws = weighted_sample_native(docs, "doc_id", "n_chars",
                                by=["source"], k=6)
    results["weighted_sample_grouped"] = audit(
        "weighted_sample_grouped", ws,
        want=[r"Window", r"hashpartitioning\(source",
              r"ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"],
        reject=[r"hashpartitioning\(key", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # token pairs: explode stays pipeline-local (Generate inside codegen),
    # the only exchange carries the PARTIALLY-combined distinct-pair
    # counts, and the scan prunes to the one used column
    from ddsketchy_spark.pipeline.text import array_pair_counts

    tp = array_pair_counts(
        docs.where(F.col("text").isNotNull())
            .select(F.split("text", " ").alias("w")), "w", top_k=25)
    results["token_pair_counts"] = audit(
        "token_pair_counts", tp,
        want=[r"Arguments: explode\(", r"partial_count",
              r"TakeOrderedAndProject",
              r"ReadSchema: struct<text:string>"],
        reject=[r"Window\b", r"Join", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # BPE training round (round 2's exact frame: string-form build, one
    # literal replace fusion, re-split, pair count): everything up to the
    # distinct-pair exchange is one codegen pipeline over a text-only
    # scan — zero Python, no join, no window
    from ddsketchy_spark.pipeline.bpe import JOIN, SEP, _to_string_form

    cur = _to_string_form(
        docs.where(F.col("text").isNotNull())
            .select(F.split("text", " ").alias("w")), "w")
    cur = cur.select(F.replace(
        F.col("s"), F.lit(SEP + "the" + SEP + SEP + "of" + SEP),
        F.lit(SEP + "the" + JOIN + "of" + SEP)).alias("s"))
    toks = F.split(F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP)
    r2 = array_pair_counts(cur.select(toks.alias("t")), "t")
    results["bpe_train_round"] = audit(
        "bpe_train_round", r2,
        want=[r"Arguments: explode\(", r"partial_count", r"replace\(",
              r"ReadSchema: struct<text:string>"],
        reject=[r"Window\b", r"Join", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # vocab coverage: exploded tokens stream through a BROADCAST join
    # against the bounded vocab and collapse in a map-side partial
    # aggregate — never a sort-merge join or row shuffle, zero Python
    from ddsketchy_spark.pipeline.text import vocab_coverage

    vc = vocab_coverage(
        docs.where(F.col("text").isNotNull() & F.col("source").isNotNull())
            .select("source", F.split("text", " ").alias("w")),
        "w", vocab=500, by=["source"])
    results["vocab_coverage"] = audit(
        "vocab_coverage", vc,
        want=[r"BroadcastHashJoin.*LeftOuter", r"partial_count",
              r"Arguments: explode\(",
              r"ReadSchema: struct<text:string,source:string>"],
        reject=[r"SortMergeJoin", r"CartesianProduct", r"Window\b",
                r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # BPE encode (explicit vocab): the whole tokenizer application is the
    # stacked literal-replace codegen projection plus ONE vectorized
    # mapInArrow id gather — the corpus side has NO exchange, no join, no
    # window, no per-row Python
    from ddsketchy_spark.pipeline.bpe import encode_bpe

    vocab_df = spark.createDataFrame(
        [(0, "the"), (1, "cat"), (2, "the\x1ecat")],
        "tok_id int, symbol string")
    enc = encode_bpe(
        docs.where(F.col("text").isNotNull())
            .select(F.split("text", " ").alias("w")),
        [("the", "cat")], arr_col="w", vocab=vocab_df, unk_id=0,
        validate=False)
    results["bpe_encode"] = audit(
        "bpe_encode", enc,
        want=[r"replace\(", r"(MapInArrow|PythonMapInArrow)",
              r"ReadSchema: struct<text:string>"],
        reject=[r"Exchange", r"Join", r"Window\b", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas"],
    )

    # stupid-backoff bigram LM scores: the bounded model tables broadcast
    # onto the exploded pair stream (BroadcastHashJoin), the per-doc
    # aggregate combines map-side — no window, no Python, no cartesian
    # (the 1-row total attach is a broadcast nested loop by design, like
    # the unigram scorer's)
    from ddsketchy_spark.pipeline.text import bigram_logprob_scores

    bg = bigram_logprob_scores(
        docs.where(F.col("doc_id").isNotNull()),
        vocab_size=300, bigram_size=400)
    results["bigram_scores"] = audit(
        "bigram_scores", bg,
        want=[r"BroadcastHashJoin.*LeftOuter", r"partial_count",
              r"Arguments: explode\("],
        reject=[r"CartesianProduct", r"Window\b", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # sessionize: map-side PARTIAL session aggregation before the single
    # user_id exchange, JVM-side MergingSessions — never a window over
    # raw event rows, zero Python
    from ddsketchy_spark.spark.sessions import sessionize

    sess = sessionize(events, "ts", 21600.0, by=["user_id"],
                      aggs=[F.sum("value").alias("vsum")])
    results["sessionize_agg"] = audit(
        "sessionize_agg", sess,
        want=[r"partial_min", r"MergingSessions",
              r"hashpartitioning\(user_id",
              r"ReadSchema: struct<ts:timestamp"],
        reject=[r"Window\b", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
    )

    # corpus split: a pure whole-stage-codegen projection — the md5
    # uniform + cumulative-weight CASE chain adds no exchange, no join,
    # no window, no Python, and the scan stays pruned to the used columns
    from ddsketchy_spark.pipeline.split import split_corpus

    sp = split_corpus(docs.select("doc_id", "source"),
                      {"train": 0.8, "val": 0.1, "test": 0.1},
                      group_col="source")
    results["corpus_split"] = audit(
        "corpus_split", sp,
        want=[r"ReadSchema: struct<doc_id:bigint,source:string>",
              r"Project \[codegen id : \d+\]"],
        reject=[r"Exchange", r"Window", r"Join", r"BatchEvalPython",
                r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                r"(MapInArrow|PythonMapInArrow)"],
    )

    # ExactSubstr span rewrite (r5): spans shuffle narrow (id, pos, fp)
    # and span-geometry rows; the document TEXT is scanned + joined ONCE
    # (both sides' regions come out of a single join against the binary
    # projection), and the rewrite joins only the tiny per-doc cut list
    # back. The Window runs over narrow match rows (diagonal chains),
    # never over documents. Verified structurally: at most ONE Exchange
    # node carries the binary text column.
    from ddsketchy_spark.pipeline.dedup import rewrite_shared_spans

    rsp = rewrite_shared_spans(docs.select("doc_id", "text"), min_len=40)
    ok_rsp = audit(
        "exactsubstr_rewrite", rsp,
        want=[r"(MapInArrow|PythonMapInArrow)",
              r"(ShuffledHashJoin|SortMergeJoin|BroadcastHashJoin)"],
        reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas"],
    )
    # structural text-shuffle claims, audited where they bind:
    # (1) span DISCOVERY with broadcast OFF (a 100-TB corpus cannot
    #     broadcast either side) — the binary text column crosses EXACTLY
    #     one Exchange (the union-side single extraction join);
    # (2) the full rewrite under normal planning — the per-doc cut list
    #     is tiny, so it broadcasts and text crosses at most one Exchange.
    from ddsketchy_spark.pipeline.dedup import substring_shared_spans

    def _bin_exchanges(plan: str) -> int:
        return len([m for m in re.findall(
            r"\(\d+\) Exchange[\s\S]*?Input \[\d+\]: \[([^\]]*)\]",
            plan) if "_bin" in m])

    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n_spans_ex = _bin_exchanges(plan_of(
            substring_shared_spans(docs.select("doc_id", "text"),
                                   min_len=40)))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
    n_rw_ex = _bin_exchanges(plan_of(rsp))
    ok_counts = n_spans_ex == 1 and n_rw_ex <= 1
    print(f"  discovery text exchanges (broadcast off): {n_spans_ex} "
          f"(want exactly 1); rewrite (default planning): {n_rw_ex} "
          f"(want <= 1) -> {'OK' if ok_counts else 'FAIL'}")
    results["exactsubstr_rewrite"] = ok_rsp and ok_counts

    # incremental dedup index probe: the corpus bands/sigs tables must
    # only be SCANNED and joined via broadcast (increment side broadcast,
    # no corpus shuffle before the bucket filter, no cartesian). The
    # mapInArrow scorer is the one intended Python node.
    import shutil
    import tempfile

    from ddsketchy_spark.pipeline.dedup_index import (
        minhash_pairs_against_index, write_minhash_index)

    tmpd = tempfile.mkdtemp(prefix="ddsketchy_planidx_")
    try:
        write_minhash_index(docs.limit(200), f"{tmpd}/idx",
                            num_perm=64, bands=16)
        inc = docs.limit(20).select(
            (F.col("doc_id") + 900000).alias("doc_id"), "text")
        probe = minhash_pairs_against_index(inc, f"{tmpd}/idx",
                                            broadcast_increment=True)
        results["dedup_index_probe"] = audit(
            "dedup_index_probe", probe,
            want=[r"BroadcastHashJoin", r"(MapInArrow|PythonMapInArrow)",
                  # r5: small increments push bucket IN onto the bands
                  # scan (min-max row-group skipping, like the exact
                  # index's fingerprint pushdown)
                  r"PushedFilters: \[In\(bucket"],
            reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                    r"BatchEvalPython", r"ArrowEvalPython",
                    r"FlatMapGroupsInPandas"],
        )

        # exact-digest index probe (small increment): the IN predicate
        # must reach the corpus digest scan (PushedFilters -> file/row-
        # group skipping on the range-sorted layout), the pruned corpus
        # side joins via broadcast hash, and nothing runs in Python
        from ddsketchy_spark.pipeline.dedup_index import (
            exact_matches_against_index, write_exact_index)

        write_exact_index(docs.limit(200), f"{tmpd}/exidx")
        eprobe = exact_matches_against_index(inc, f"{tmpd}/exidx")
        results["exact_index_probe"] = audit(
            "exact_index_probe", eprobe,
            want=[r"PushedFilters: \[In\(fingerprint", r"BroadcastHashJoin"],
            reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                    r"SortMergeJoin", r"BatchEvalPython", r"ArrowEvalPython",
                    r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)"],
        )

        # cosine (semantic) index probe: same contract as the minhash
        # probe — corpus bands/vecs tables only scanned, increment side
        # broadcast, no cartesian; the two mapInArrow nodes (enrichment +
        # einsum scorer) are the intended Python
        from ddsketchy_spark.pipeline.dedup_index import (
            cosine_pairs_against_index, write_cosine_index)

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        write_cosine_index(emb.limit(200), f"{tmpd}/cosidx",
                           n_planes=16, bands=4)
        cinc = emb.limit(20).select(
            (F.col("vec_id") + 900000).alias("vec_id"), "embedding")
        cprobe = cosine_pairs_against_index(cinc, f"{tmpd}/cosidx",
                                            broadcast_increment=True)
        results["cosine_index_probe"] = audit(
            "cosine_index_probe", cprobe,
            want=[r"BroadcastHashJoin", r"(MapInArrow|PythonMapInArrow)",
                  r"PushedFilters: \[In\(key"],
            reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                    r"BatchEvalPython", r"ArrowEvalPython",
                    r"FlatMapGroupsInPandas"],
        )

        # Bloom decontamination: the corpus scan must flow straight into
        # a broadcast LEFT-ANTI join on the tiny contaminated-id set —
        # corpus text never shuffles. The vectorized pandas bitmap probe
        # (ArrowEvalPython) on the gram side is the one intended Python.
        from ddsketchy_spark.pipeline.novelty import (
            decontaminate_against_index, write_ngram_bloom_index)

        write_ngram_bloom_index(docs.limit(5), f"{tmpd}/bloomidx", n=13)
        dec = decontaminate_against_index(docs, f"{tmpd}/bloomidx")
        results["bloom_decontam"] = audit(
            "bloom_decontam", dec,
            want=[r"BroadcastHashJoin.*LeftAnti"],
            reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                    r"SortMergeJoin", r"BatchEvalPython",
                    r"FlatMapGroupsInPandas"],
        )

        # PQ encode: one pruned scan (id + vector only, never the label
        # column) flowing straight into the mapInArrow encoder — no
        # shuffle, no join, no row-at-a-time Python
        from ddsketchy_spark.pipeline.pq import (
            ann_query_ivf_pq, ann_query_pq, ivf_pq_index, pq_encode,
            read_ivf_pq_index, train_pq_codebooks, write_ivf_pq_index)

        books = train_pq_codebooks(emb, m=8, nbits=4, train_rows=200)
        enc = pq_encode(emb, books)
        results["pq_encode"] = audit(
            "pq_encode", enc,
            want=[r"(MapInArrow|PythonMapInArrow)",
                  r"ReadSchema: struct<vec_id:bigint,embedding"],
            reject=[r"Exchange", r"label", r"BatchEvalPython",
                    r"ArrowEvalPython", r"FlatMapGroupsInPandas",
                    r"CartesianProduct"],
        )

        # ADC query: one scan of the CODE table (8-byte codes, never the
        # float vectors) + broadcast LUT scorer; the only shuffle is the
        # final per-query top-k window — joins would mean the engine
        # materialized pairs
        import numpy as np

        pqq = ann_query_pq(enc, books, np.zeros((2, 64)) + 1.0, k=5)
        results["pq_adc_query"] = audit(
            "pq_adc_query", pqq,
            want=[r"(MapInArrow|PythonMapInArrow)", r"RunningWindowFunction|Window"],
            reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                    r"SortMergeJoin", r"BroadcastHashJoin",
                    r"BatchEvalPython", r"FlatMapGroupsInPandas"],
        )

        # IVF-PQ probe from disk: the cluster IN (...) probe filter must
        # reach the scan as PARTITION pruning (the partitionBy("cluster")
        # layout), so a probe reads n_probe/n_clusters of the corpus
        idx, cents, rbooks = ivf_pq_index(emb.limit(300), n_clusters=4,
                                          m=8, nbits=4, train_rows=200)
        write_ivf_pq_index(idx, cents, rbooks, f"{tmpd}/ivfpq")
        stored, cents_d, books_d, _m = read_ivf_pq_index(
            spark, f"{tmpd}/ivfpq")
        ivfq = ann_query_ivf_pq(stored, cents_d, books_d,
                                np.zeros((2, 64)) + 1.0, k=5, n_probe=2)
        results["ivf_pq_probe"] = audit(
            "ivf_pq_probe", ivfq,
            want=[r"(MapInArrow|PythonMapInArrow)",
                  r"PartitionFilters: \[cluster.* IN \("],
            reject=[r"CartesianProduct", r"BroadcastNestedLoopJoin",
                    r"SortMergeJoin", r"BroadcastHashJoin",
                    r"BatchEvalPython", r"FlatMapGroupsInPandas"],
        )
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)

    # 26. BM25 scoring: tf via regexp_count in codegen over a 2-column
    # pruned scan; corpus stats are ONE 1-row aggregate broadcast back
    # (BroadcastNestedLoopJoin on a 1-row side is the intended scalar
    # attach); no Python, no explode-shuffle of tokens
    from ddsketchy_spark.pipeline.search import bm25_scores

    bm = bm25_scores(docs, "spark scan merge")
    results["bm25_scores"] = audit(
        "bm25_scores", bm,
        want=[r"ReadSchema: struct<doc_id:bigint,text:string>",
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
              r"BroadcastNestedLoopJoin"],
        reject=[r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)",
                r"Generate", r"SortMergeJoin", r"CartesianProduct"],
    )

    # 26b. TF-IDF keywords: per-doc top-k via collect_list + sort_array +
    # slice inside ONE ObjectHashAggregate — no Window ranking pass; the
    # df-side joins back as a broadcast at this vocabulary size; all
    # JVM-side
    from ddsketchy_spark.pipeline.search import tfidf_keywords

    tfk = tfidf_keywords(docs, k=3)
    results["tfidf_keywords"] = audit(
        "tfidf_keywords", tfk,
        want=[r"ReadSchema: struct<doc_id:bigint,text:string>",
              r"ObjectHashAggregate", r"Generate",
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"],
        reject=[r"Window", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)",
                r"SortMergeJoin", r"CartesianProduct"],
    )

    # 27. DDSketch distance matrix: the only data-sized stage is the
    # native bucket aggregate (map-side combine); pair fan-out joins are
    # broadcast equi-joins over O(groups x buckets) rows, the CDF sweep
    # is a window — no Python anywhere, no cartesian on data rows
    from ddsketchy_spark.spark.distance import ddsketch_distance

    dist = ddsketch_distance(events, "value", "event_type", 0.01)
    results["dds_distance"] = audit(
        "dds_distance", dist,
        want=[r"ReadSchema: struct<event_type:string,value:double>",
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate",
              r"BroadcastHashJoin", r"Window"],
        reject=[r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)",
                r"SortMergeJoin", r"CartesianProduct"],
    )

    # 28. Frequent-Directions partial build: vectors fold into ell x d
    # states INSIDE the scan pipeline (mapInArrow), no shuffle of vectors
    # — the only moving bytes are KB-scale state blobs
    from ddsketchy_spark.spark.agg import build_partials
    from ddsketchy_spark.spark.matrix import FDAggregator

    emb_t = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fdp = build_partials(emb_t, FDAggregator("embedding", dim=64, ell=16))
    results["fd_partial_build"] = audit(
        "fd_partial_build", fdp,
        want=[r"(MapInArrow|PythonMapInArrow)",
              r"ReadSchema: struct<embedding"],
        reject=[r"Exchange", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"SortMergeJoin",
                r"CartesianProduct"],
    )

    # 28b. pairwise correlations: every C(4,2) co-moment rides ONE
    # scalar aggregate over a pruned 4-column scan (map-side combine);
    # the long-format explode runs on the single result row
    from ddsketchy_spark.spark.profile import column_correlations

    cor = column_correlations(
        lineitem, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"])
    results["column_correlations"] = audit(
        "column_correlations", cor,
        want=[r"ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double>",
              r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"],
        reject=[r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"(MapInArrow|PythonMapInArrow)",
                r"SortMergeJoin", r"BroadcastHashJoin", r"CartesianProduct",
                r"Window"],
    )

    # 29. JL projection: a pure pipeline-local mapInArrow projection of
    # the scan — no shuffle, no join, nothing but the one Python stage
    from ddsketchy_spark.pipeline.similarity import reduce_dim

    jl = reduce_dim(emb_t, 16, 64, seed=5)
    results["jl_reduce_dim"] = audit(
        "jl_reduce_dim", jl,
        want=[r"(MapInArrow|PythonMapInArrow)"],
        reject=[r"Exchange", r"BatchEvalPython", r"ArrowEvalPython",
                r"FlatMapGroupsInPandas", r"SortMergeJoin",
                r"BroadcastHashJoin", r"CartesianProduct", r"Window"],
    )

    print("\nsummary:", {k: ("OK" if v else "FAIL") for k, v in results.items()})
    spark.stop()
    sys.exit(0 if all(results.values()) else 1)


if __name__ == "__main__":
    main()
