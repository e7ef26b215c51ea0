"""Spark-level tests for the companion sketch aggregators: distributed
two-phase aggregation equals a local build, and estimates validate against
exact Spark/DuckDB-computable oracles."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.core.bloom import BloomFilter
from ddsketchy_spark.core.cms import CountMinSketch
from ddsketchy_spark.core.hll import HyperLogLog
from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.companions import (
    bloom_state,
    cms_state,
    hll_distinct,
    kll_quantiles,
    tdigest_quantiles,
)
from ddsketchy_spark.spark.ddsketch_agg import quantile_label


def test_hll_global_matches_local_and_exact(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = hll_distinct(df, "doc_id", p=14)
    exact = df.select("doc_id").distinct().count()
    # distributed == local bitwise
    tbl = pq.read_table(token_table_path, columns=["doc_id"])
    local = HyperLogLog(14)
    local.add_batch(np.asarray(tbl.column("doc_id").to_pylist(), dtype=object))
    assert out["distinct_est"] == local.cardinality()
    assert abs(out["distinct_est"] - exact) / exact < 0.04


def test_hll_distinct_tokens_grouped(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    rows = {r["source"]: r["distinct_est"]
            for r in hll_distinct(df, "tokens", by=["source"], p=14).collect()}
    exact = {r["source"]: r["d"]
             for r in df.select("source", F.explode("tokens").alias("t"))
             .groupBy("source").agg(F.countDistinct("t").alias("d")).collect()}
    assert rows.keys() == exact.keys()
    for s in rows:
        assert abs(rows[s] - exact[s]) / exact[s] < 0.05, s


def test_hll_native_engine_bitwise_matches_arrow(spark, token_table_path):
    """Native (JVM xxhash64 + SQL rho cascade) and arrow (NumPy
    spark_xxhash64) engines land on IDENTICAL registers for integer keys."""
    df = read_tokens(spark, token_table_path)
    nat = hll_distinct(df, "tokens", p=12, engine="native", keep_state=True)
    arr = hll_distinct(df, "tokens", p=12, engine="arrow", hash_kind="spark",
                       keep_state=True)
    assert HyperLogLog.from_bytes(nat["state"]) == HyperLogLog.from_bytes(arr["state"])
    assert nat["distinct_est"] == arr["distinct_est"]
    exact = df.select(F.explode("tokens").alias("t")).select("t").distinct().count()
    assert abs(nat["distinct_est"] - exact) / exact < 0.06


def test_hll_native_grouped(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    nat = {r["source"]: r["distinct_est"] for r in
           hll_distinct(df, "n_tok", by=["source"], p=13, engine="native").collect()}
    exact = {r["source"]: r["d"] for r in
             df.groupBy("source").agg(F.countDistinct("n_tok").alias("d")).collect()}
    assert nat.keys() == exact.keys()
    for s in nat:
        assert abs(nat[s] - exact[s]) <= max(0.05 * exact[s], 3), s


def test_cms_point_queries_vs_exact(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = cms_state(df, "tokens", depth=5, width=1 << 14)
    cm = CountMinSketch.from_bytes(out["state"])
    exact = dict(
        df.select(F.explode("tokens").alias("t")).groupBy("t").count()
        .orderBy(F.desc("count")).limit(50).collect()
    )
    items = np.asarray(list(exact.keys()), dtype=np.int64)
    est = cm.query_batch(items)
    true = np.asarray([exact[i] for i in items])
    assert (est >= true).all()
    eps_n = (np.e / (1 << 14)) * cm.total
    assert (est - true <= eps_n).mean() > 0.98
    assert cm.total == int(df.select(F.sum(F.size("tokens"))).collect()[0][0])


def test_cms_native_engine_bitwise_matches_arrow(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    nat = cms_state(df, "tokens", depth=4, width=1 << 12, engine="native")
    arr = cms_state(df, "tokens", depth=4, width=1 << 12, engine="arrow",
                    hash_kind="spark")
    a = CountMinSketch.from_bytes(nat["state"])
    b = CountMinSketch.from_bytes(arr["state"])
    assert a == b
    assert nat["total"] == arr["total"]
    # point estimates still never underestimate
    exact = dict(
        df.select(F.explode("tokens").alias("t")).groupBy("t").count()
        .orderBy(F.desc("count")).limit(20).collect()
    )
    # NB: xxhash64 is type-sensitive (int != bigint), so queries must use
    # the stored key dtype — int32 here, matching the tokens column.
    items = np.asarray(list(exact.keys()), dtype=np.int32)
    assert (a.query_batch(items) >= np.asarray([exact[i] for i in items])).all()


def test_cms_native_grouped(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = {r["source"]: r for r in
           cms_state(df, "n_tok", by=["source"], depth=4, width=1 << 10,
                     engine="native").collect()}
    exact_tot = {r["source"]: r["c"] for r in
                 df.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    for s, r in out.items():
        assert r["total"] == exact_tot[s], s


def test_bloom_no_false_negatives_distributed(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = bloom_state(df, "doc_id", n_bits=1 << 19, n_hashes=7)
    bf = BloomFilter.from_bytes(out["state"])
    docs = [r["doc_id"] for r in df.select("doc_id").collect()]
    assert bf.contains_batch(np.asarray(docs, dtype=object)).all()
    absent = np.asarray([f"doc-x-{i}" for i in range(10_000)], dtype=object)
    assert float(bf.contains_batch(absent).mean()) < 0.05
    assert bf.n_added == len(docs)


def test_bloom_native_engine_bitwise_matches_arrow(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    nat = bloom_state(df, "n_tok", n_bits=1 << 16, n_hashes=5, engine="native")
    arr = bloom_state(df, "n_tok", n_bits=1 << 16, n_hashes=5, engine="arrow",
                      hash_kind="spark")
    a = BloomFilter.from_bytes(nat["state"])
    b = BloomFilter.from_bytes(arr["state"])
    assert a == b
    assert nat["n_added"] == arr["n_added"] == df.count()
    # membership with the stored key dtype (int32 n_tok)
    vals = np.unique(
        np.asarray([r["n_tok"] for r in df.select("n_tok").collect()], dtype=np.int32))
    assert a.contains_batch(vals).all()


def test_bloom_native_grouped(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = {r["source"]: r for r in
           bloom_state(df, "n_tok", by=["source"], n_bits=1 << 14, n_hashes=4,
                       engine="native").collect()}
    exact = {r["source"]: r["c"] for r in
             df.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    for s, r in out.items():
        assert r["n_added"] == exact[s], s
        bf = BloomFilter.from_bytes(r["state"])
        vals = np.asarray(
            [x["n_tok"] for x in df.filter(F.col("source") == s)
             .select("n_tok").collect()], dtype=np.int32)
        assert bf.contains_batch(vals).all(), s


def test_tdigest_spark_vs_exact(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = tdigest_quantiles(df, "n_tok", delta=200, quantiles=(0.5, 0.9, 0.99))
    vals = np.sort(pq.read_table(token_table_path, columns=["n_tok"])
                   .column("n_tok").to_numpy().astype(float))
    assert out["count"] == len(vals)
    for q in (0.5, 0.9, 0.99):
        est = out[quantile_label(q)]
        r = np.searchsorted(vals, est) / len(vals)
        assert abs(r - q) < 0.02, (q, est)


def test_kll_spark_vs_exact(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = kll_quantiles(df, "n_tok", k=200, quantiles=(0.5, 0.9, 0.99))
    vals = np.sort(pq.read_table(token_table_path, columns=["n_tok"])
                   .column("n_tok").to_numpy().astype(float))
    assert out["count"] == len(vals)
    for q in (0.5, 0.9, 0.99):
        est = out[quantile_label(q)]
        r = np.searchsorted(vals, est) / len(vals)
        assert abs(r - q) < 0.025, (q, est)


def test_companions_partitioning_invariance(spark, token_table_path):
    """HLL/t-digest/KLL estimates identical under repartitioning (exact
    merges for HLL; deterministic n-way merges for the quantile pair —
    note the n-way merge sees a different partial-state set per layout,
    so we require HLL bitwise-equality and quantile-estimate stability."""
    df = read_tokens(spark, token_table_path)
    h1 = hll_distinct(df.repartition(11), "doc_id", p=13)
    h2 = hll_distinct(df.coalesce(2), "doc_id", p=13)
    assert h1["distinct_est"] == h2["distinct_est"]

    t1 = tdigest_quantiles(df.repartition(7), "n_tok", quantiles=(0.5, 0.99))
    t2 = tdigest_quantiles(df.repartition(7), "n_tok", quantiles=(0.5, 0.99))
    assert t1 == t2  # same layout -> deterministic


def test_bloom_semi_join_equals_plain_join(spark, sf001_dir):
    """Bloom pre-filter must not change join results (no false negatives),
    and must actually drop non-matching rows before the shuffle."""
    from ddsketchy_spark.core.bloom import BloomFilter
    from ddsketchy_spark.spark.companions import bloom_state
    from ddsketchy_spark.spark.joins import bloom_probe_column, bloom_semi_join

    lineitem = spark.read.parquet(f"{sf001_dir}/lineitem.parquet")
    orders = (spark.read.parquet(f"{sf001_dir}/orders.parquet")
              .where("o_orderstatus = 'F'").select("o_orderkey", "o_totalprice"))

    plain = lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
    fast = bloom_semi_join(lineitem, orders, ["l_orderkey", "o_orderkey"],
                           fpr=0.01)
    assert fast.count() == plain.count()
    assert (fast.agg(F.sum("l_quantity")).first()[0]
            == plain.agg(F.sum("l_quantity")).first()[0])

    # the probe itself: every matching key passes; selectivity is real
    blob = bloom_state(orders, "o_orderkey")["state"]
    probed = lineitem.withColumn("hit", bloom_probe_column(
        lineitem, "l_orderkey", blob))
    n_match = (lineitem.join(orders.select("o_orderkey").distinct(),
                             lineitem["l_orderkey"] == F.col("o_orderkey"))
               .count())
    n_pass = probed.where("hit").count()
    n_all = lineitem.count()
    assert n_pass >= n_match               # no false negatives
    bf = BloomFilter.from_bytes(blob)
    assert n_pass - n_match <= max(50, 3 * bf.estimated_fpr() * n_all)
    assert n_pass < n_all                  # it does filter something


def test_bloom_probe_null_coerced_int_keys(spark, sf001_dir):
    """A NULL in an Arrow batch coerces the int key column to float64 in
    pandas; the probe must cast back and keep the no-false-negative
    guarantee (and the join must equal the plain inner join)."""
    from ddsketchy_spark.spark.companions import bloom_state
    from ddsketchy_spark.spark.joins import bloom_probe_column, bloom_semi_join

    small = spark.createDataFrame([(i,) for i in range(0, 2000, 2)], "k long")
    # large side: every key 0..3999 plus NULLs sprinkled in
    rows = [(i if i % 7 else None,) for i in range(4000)]
    large = spark.createDataFrame(rows, "k long").coalesce(1)  # one batch => coercion

    blob = bloom_state(small, "k")["state"]
    probed = large.withColumn("hit", bloom_probe_column(large, "k", blob))
    hits = {r["k"] for r in probed.where("hit").collect()}
    members = {i for i in range(0, 2000, 2) if i % 7}
    assert members <= hits          # every true member passed (no false negs)
    assert None not in hits

    fast = bloom_semi_join(large, small, ["k", "k"])
    plain = large.join(small, "k")
    assert fast.count() == plain.count()


def test_direct_checkpoint_lineage_mismatch(spark, token_table_path, tmp_path):
    """Resuming with a different aggregator config must fail loudly, not
    silently reuse stale blobs."""
    import pytest as _pytest

    from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet
    from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator

    ckpt = str(tmp_path / "lineage_ckpt")
    sketch_aggregate_parquet(spark, token_table_path,
                             DDSketchAggregator("n_tok", alpha=0.01),
                             ckpt_dir=ckpt)
    with _pytest.raises(Exception, match="lineage mismatch"):
        sketch_aggregate_parquet(spark, token_table_path,
                                 DDSketchAggregator("n_tok", alpha=0.02),
                                 ckpt_dir=ckpt)


def test_hll_grouped_vectorized_matches_state_path(spark, token_table_path):
    """Vectorized grouped HLL assembly == per-group applyInPandas path,
    estimate-identical."""
    from ddsketchy_spark.spark.companions import hll_distinct

    df = read_tokens(spark, token_table_path)
    fast = {r["source"]: r["distinct_est"] for r in
            hll_distinct(df, "doc_id", by=["source"], p=12,
                         engine="native").collect()}
    slow = {r["source"]: r["distinct_est"] for r in
            hll_distinct(df, "doc_id", by=["source"], p=12, engine="native",
                         keep_state=True).collect()}
    assert fast == slow and len(fast) >= 2


def test_hll_grouped_vectorized_high_cardinality(spark):
    from pyspark.sql import functions as F

    from ddsketchy_spark.spark.companions import hll_distinct

    df = (spark.range(200_000)
          .withColumn("k", (F.col("id") % 5_000).cast("long"))
          .select("k", ((F.col("id") / 5_000).cast("long") % 40).alias("u")))
    rows = hll_distinct(df, "u", by=["k"], p=12, engine="native").collect()
    assert len(rows) == 5_000
    assert all(abs(r["distinct_est"] - 40) <= 2 for r in rows)


def test_shuffle_strategy_matches_partial(spark, token_table_path):
    """strategy='shuffle' (one-pass shuffle-then-build) must reproduce the
    partial/merge engine's grouped outputs for both a merge-exact sketch
    (HLL) and an order-sensitive one (t-digest: tiny groups -> one partial
    each, so merge order cannot diverge), including NULL keys and
    keep_state blobs."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.core.hll import HyperLogLog
    from ddsketchy_spark.spark.agg import sketch_aggregate
    from ddsketchy_spark.spark.companions import HLLAggregator, TDigestAggregator

    df = (spark.read.parquet(token_table_path).limit(30_000)
          .withColumn("k", F.when(F.col("n_tok") % 11 == 0, None)
                      .otherwise(F.col("n_tok") % 500).cast("long")))
    hagg = HLLAggregator("doc_id", p=12)
    a = {r["k"]: r["distinct_est"] for r in
         sketch_aggregate(df, hagg, by=["k"]).collect()}
    b = {r["k"]: r["distinct_est"] for r in
         sketch_aggregate(df, hagg, by=["k"], strategy="shuffle").collect()}
    assert a == b and len(a) == 501  # 500 keys + the NULL group

    # keep_state blobs decode to the same registers
    sa = {r["k"]: bytes(r["state"]) for r in
          sketch_aggregate(df, hagg, by=["k"], keep_state=True).collect()}
    sb = {r["k"]: bytes(r["state"]) for r in
          sketch_aggregate(df, hagg, by=["k"], keep_state=True,
                           strategy="shuffle").collect()}
    for k in sa:
        assert (HyperLogLog.from_bytes(sa[k]).cardinality()
                == HyperLogLog.from_bytes(sb[k]).cardinality()), k

    # t-digest: counts must agree exactly; quantile estimates may differ
    # slightly between merge orders (a multi-partition group's digests
    # compress differently than one single-pass build) — both stay within
    # the digest's accuracy envelope
    tagg = TDigestAggregator("n_tok", 200.0, (0.5, 0.99))
    ta = {r["k"]: r for r in sketch_aggregate(df, tagg, by=["k"]).collect()}
    tb = {r["k"]: r for r in
          sketch_aggregate(df, tagg, by=["k"], strategy="shuffle").collect()}
    assert set(ta) == set(tb)
    for k, ra in ta.items():
        rb = tb[k]
        assert ra["count"] == rb["count"], k
        for col in ("p50", "p99"):
            assert rb[col] == pytest.approx(ra[col], rel=0.02), (k, col)

    with pytest.raises(ValueError, match="strategy"):
        sketch_aggregate(df, tagg, by=["k"], strategy="bogus")


def test_native_grouped_keepstate_blobs(spark, token_table_path):
    """Grouped keep_state=True (vectorized path): per-key blobs decode to
    sketches whose quantiles equal the emitted columns, and merging all
    blobs equals the global sketch."""
    from ddsketchy_spark.core.ddsketch import DDSketch
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles, quantile_label

    df = spark.read.parquet(token_table_path).limit(50_000)
    rows = ddsketch_quantiles(df, "n_tok", by=["source"], alpha=0.01,
                              quantiles=(0.5, 0.99), keep_state=True).collect()
    assert len(rows) > 1
    merged = None
    for r in rows:
        sk = DDSketch.from_bytes(bytes(r["state"]))
        assert sk.count == r["count"]
        assert sk.quantile_opt(0.5) == r[quantile_label(0.5)]
        assert sk.quantile_opt(0.99) == r[quantile_label(0.99)]
        merged = sk if merged is None else (merged.merge(sk) or merged)
    glob = ddsketch_quantiles(df, "n_tok", alpha=0.01, quantiles=(0.5,))
    assert merged.count == glob["count"]
    assert merged.quantile_opt(0.5) == glob[quantile_label(0.5)]


def test_asof_join_semantics(spark):
    """Backward-inclusive as-of: each left row gets the latest right value
    at or before its timestamp, per key; inner drops unmatched."""
    import datetime as dt

    from ddsketchy_spark.spark.joins import asof_join

    base = dt.datetime(2026, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    trades = spark.createDataFrame(
        [("A", t(5), 1.0), ("A", t(10), 2.0), ("A", t(3), 0.5),
         ("B", t(7), 9.0), ("B", t(1), 8.0)],
        "sym string, ts timestamp, qty double")
    quotes = spark.createDataFrame(
        [("A", t(4), 100.0), ("A", t(10), 105.0),   # exact-ts tie: inclusive
         ("B", t(2), 50.0)],
        "sym string, ts timestamp, px double")

    out = {(r["sym"], r["ts"].second): r["px"] for r in
           asof_join(trades, quotes, "ts", ["sym"], ["px"]).collect()}
    assert out == {("A", 5): 100.0, ("A", 10): 105.0, ("B", 7): 50.0}
    # left join keeps unmatched rows with NULL
    left = asof_join(trades, quotes, "ts", ["sym"], ["px"], how="left")
    nulls = {(r["sym"], r["ts"].second) for r in left.collect() if r["px"] is None}
    assert nulls == {("A", 3), ("B", 1)}


def test_interval_join_matches_theta_join(spark):
    """Bucketed range join == the plain BETWEEN theta-join, at any bucket
    width, including degenerate and overlapping intervals."""
    import numpy as np

    from ddsketchy_spark.spark.joins import interval_join

    rng = np.random.default_rng(13)
    points = spark.createDataFrame(
        [("g%d" % (i % 3), float(v)) for i, v in
         enumerate(rng.uniform(0, 100, 300))], "grp string, x double")
    ivs = []
    for i in range(40):
        lo = float(rng.uniform(0, 95))
        ivs.append(("g%d" % (i % 3), i, lo, lo + float(rng.uniform(0, 20))))
    ivs.append(("g0", 99, 50.0, 50.0))   # degenerate single-point interval
    intervals = spark.createDataFrame(ivs, "grp string, iv_id long, lo double, hi double")

    expected = (points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.grp") == F.col("i.grp"))
        & (F.col("p.x") >= F.col("i.lo")) & (F.col("p.x") <= F.col("i.hi")))
        .select(F.col("p.grp"), "x", "iv_id"))
    exp = {(r["grp"], round(r["x"], 9), r["iv_id"]) for r in expected.collect()}
    assert exp  # non-vacuous

    for width in (None, 3.0, 50.0):
        got = interval_join(points, intervals, "x", "lo", "hi",
                            by=["grp"], bucket_width=width)
        g = {(r["grp"], round(r["x"], 9), r["iv_id"]) for r in got.collect()}
        assert g == exp, width


def test_asof_join_null_seams(spark):
    """NULL handling: a matched right row whose value is NULL must be
    returned as NULL (not a stale older value, and inner must KEEP the
    row); NULL by-keys never match; right-right ts ties are deterministic."""
    import datetime as dt

    from ddsketchy_spark.spark.joins import asof_join

    base = dt.datetime(2026, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    trades = spark.createDataFrame(
        [("A", t(10), 1.0), (None, t(10), 2.0), ("T", t(5), 3.0)],
        "sym string, ts timestamp, qty double")
    quotes = spark.createDataFrame(
        [("A", t(4), 100.0), ("A", t(9), None),      # latest quote is NULL px
         (None, t(1), 7.0),                          # NULL key: never matches
         ("T", t(2), 50.0), ("T", t(2), 51.0)],      # ts tie
        "sym string, ts timestamp, px double")

    inner = asof_join(trades, quotes, "ts", ["sym"], ["px"]).collect()
    got = {r["sym"]: r["px"] for r in inner}
    # A matched (the t=9 quote) -> px NULL, but the row is KEPT by inner
    assert "A" in got and got["A"] is None
    assert None not in got                     # NULL-key trade: no match
    assert got["T"] == 51.0                    # tie -> greatest struct wins
    left = asof_join(trades, quotes, "ts", ["sym"], ["px"], how="left")
    assert {r["sym"] for r in left.collect()} == {"A", None, "T"}

    # reserved/collision guards
    import pytest as _pytest

    with _pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes.withColumnRenamed("px", "qty"),
                  "ts", ["sym"], ["qty"])


def test_asof_join_null_timestamps(spark):
    """NULL timestamps never match: a NULL-ts right row must not be carried
    into left rows (it would otherwise sort to the partition head and leak
    into every left row with no true preceding right row); a NULL-ts left
    row comes back unmatched."""
    import datetime as dt

    from ddsketchy_spark.spark.joins import asof_join

    base = dt.datetime(2026, 1, 1)
    t = lambda s: base + dt.timedelta(seconds=s)
    trades = spark.createDataFrame(
        [("A", t(5), 1.0), ("A", None, 2.0)],
        "sym string, ts timestamp, qty double")
    quotes = spark.createDataFrame(
        [("A", None, 99.0),                      # NULL ts: must never match
         ("A", t(7), 100.0)],                    # after t=5: must not match
        "sym string, ts timestamp, px double")

    inner = asof_join(trades, quotes, "ts", ["sym"], ["px"]).collect()
    assert inner == []                           # nothing precedes t=5
    left = asof_join(trades, quotes, "ts", ["sym"], ["px"], how="left").collect()
    assert {r["qty"]: r["px"] for r in left} == {1.0: None, 2.0: None}


def test_asof_join_time_buckets_parity(spark):
    """The hot-key time-bucketed path must reproduce the single-window path
    exactly — including ts ties, NULL right values, NULL keys/timestamps,
    and one key holding ~90% of the rows."""
    import numpy as np

    from ddsketchy_spark.spark.joins import asof_join

    rng = np.random.default_rng(5)
    n_hot, n_cold = 900, 100
    lrows = [("hot", float(t), i) for i, t in
             enumerate(rng.integers(0, 500, n_hot))]
    lrows += [(f"k{i % 7}", float(t), 10_000 + i) for i, t in
              enumerate(rng.integers(0, 500, n_cold))]
    lrows += [(None, 50.0, 99_990), ("hot", None, 99_991)]
    left = spark.createDataFrame(lrows, "sym string, ts double, lid long")
    rrows = [("hot", float(t), float(p) if p % 9 else None) for t, p in
             zip(rng.integers(0, 500, 300), rng.integers(1, 1000, 300))]
    rrows += [(f"k{i % 7}", float(t), float(i)) for i, t in
              enumerate(rng.integers(0, 500, 60))]
    rrows += [("hot", 123.0, 1.0), ("hot", 123.0, 2.0),  # right-right tie
              (None, 10.0, 77.0), ("hot", None, 88.0)]
    right = spark.createDataFrame(rrows, "sym string, ts double, px double")

    for how in ("inner", "left"):
        plain = {(r["sym"], r["lid"]): r["px"] for r in
                 asof_join(left, right, "ts", ["sym"], ["px"],
                           how=how).collect()}
        bucketed = {(r["sym"], r["lid"]): r["px"] for r in
                    asof_join(left, right, "ts", ["sym"], ["px"], how=how,
                              time_buckets=8).collect()}
        assert bucketed == plain, how
    assert len(plain) > 0

    # timestamp ts column (cannot cast to double in Spark 4): the bucketed
    # path must still work and agree with the single-window path
    lts = left.where(F.col("ts").isNotNull()).withColumn(
        "ts", F.timestamp_seconds(F.col("ts")))
    rts = right.where(F.col("ts").isNotNull()).withColumn(
        "ts", F.timestamp_seconds(F.col("ts")))
    plain_ts = {(r["sym"], r["lid"]): r["px"] for r in
                asof_join(lts, rts, "ts", ["sym"], ["px"]).collect()}
    buck_ts = {(r["sym"], r["lid"]): r["px"] for r in
               asof_join(lts, rts, "ts", ["sym"], ["px"],
                         time_buckets=8).collect()}
    assert buck_ts == plain_ts and len(buck_ts) > 0


def test_interval_join_point_intervals_auto_width(spark):
    """Auto bucket_width with an all-point-interval table (median span 0)
    must fall back to a range-derived width, not 1e-9."""
    from ddsketchy_spark.spark.joins import interval_join

    pts = spark.createDataFrame(
        [(float(v),) for v in (1.0, 2.5, 7.0, 4e9)], "x double")
    ivs = spark.createDataFrame(
        [(1.0, 1.0), (7.0, 7.0), (4e9, 4e9), (2.0, 3.0)],
        "lo double, hi double")
    got = {(r["x"], r["lo"], r["hi"]) for r in
           interval_join(pts, ivs, "x", "lo", "hi").collect()}
    assert got == {(1.0, 1.0, 1.0), (7.0, 7.0, 7.0),
                   (4e9, 4e9, 4e9), (2.5, 2.0, 3.0)}


def test_interval_join_guards(spark):
    from ddsketchy_spark.spark.joins import interval_join

    pts = spark.createDataFrame([(1.0,)], "x double")
    ivs = spark.createDataFrame([(0.0, 2.0)], "lo double, hi double")
    # shared non-key column rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="share non-key"):
        interval_join(pts.withColumn("lo", F.lit(0.0)), ivs, "x", "lo", "hi")
    # outlier interval fails loudly instead of exploding the shuffle
    wide = spark.createDataFrame([(0.0, 5e9)], "lo double, hi double")
    with _pytest.raises(Exception, match="too many buckets"):
        interval_join(pts, wide, "x", "lo", "hi", bucket_width=1.0).collect()


def test_auto_strategy_picks_and_matches(spark, token_table_path):
    """strategy='auto': tiny-group keys route to the shuffle engine,
    low-cardinality keys to partial/merge — and either way the results
    equal an explicit engine choice."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.spark.agg import sketch_aggregate
    from ddsketchy_spark.spark.companions import HLLAggregator

    df = (spark.read.parquet(token_table_path).limit(20_000)
          .withColumn("hk", F.pmod(F.xxhash64("doc_id"), F.lit(4)))      # 4 keys
          .withColumn("lk", F.pmod(F.xxhash64("doc_id"), F.lit(5000))))  # tiny groups
    hagg = HLLAggregator("doc_id", p=12)
    lo_auto = {r["hk"]: r["distinct_est"] for r in
               sketch_aggregate(df, hagg, by=["hk"], strategy="auto").collect()}
    lo_part = {r["hk"]: r["distinct_est"] for r in
               sketch_aggregate(df, hagg, by=["hk"], strategy="partial").collect()}
    assert lo_auto == lo_part and len(lo_auto) == 4
    hi_auto = {r["lk"]: r["distinct_est"] for r in
               sketch_aggregate(df, hagg, by=["lk"], strategy="auto").collect()}
    hi_shuf = {r["lk"]: r["distinct_est"] for r in
               sketch_aggregate(df, hagg, by=["lk"], strategy="shuffle").collect()}
    # ~e^-4 of 5000 hash buckets stay empty at 20k rows
    assert hi_auto == hi_shuf and len(hi_auto) > 4800
