"""Cross-checks against Spark's OWN sketch implementations — the built-in
oracles SURVEY.md §2.4 names: percentile_approx (quantiles),
approx_count_distinct + hll_sketch_agg/hll_sketch_estimate (HLL),
count_min_sketch (CMS point estimates via the JVM sketch reader)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.data.synth import read_tokens


def test_ddsketch_vs_percentile_approx_and_exact(spark, token_table_path):
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles, quantile_label

    df = read_tokens(spark, token_table_path)
    qs = [0.5, 0.9, 0.99]
    ours = ddsketch_quantiles(df, "n_tok", alpha=0.01, quantiles=qs)
    approx = df.agg(F.percentile_approx("n_tok", qs, 10_000).alias("pa")).first()["pa"]
    exact = df.agg(F.percentile("n_tok", qs).alias("pe")).first()["pe"]
    for q, pa_v, ex in zip(qs, approx, exact):
        est = ours[quantile_label(q)]
        # ours is within alpha of the exact quantile...
        assert abs(est - ex) <= 0.01 * abs(ex) + 1e-9, (q, est, ex)
        # ...and agrees with Spark's own approximation to combined tolerance
        assert abs(est - pa_v) <= 0.02 * abs(ex) + 1.0, (q, est, pa_v)


def test_hll_vs_spark_builtins(spark, token_table_path):
    from ddsketchy_spark.spark.companions import hll_distinct

    df = read_tokens(spark, token_table_path)
    ours = hll_distinct(df, "doc_id", p=14, engine="native")["distinct_est"]
    acd = df.agg(F.approx_count_distinct("doc_id", 0.02).alias("x")).first()["x"]
    hse = df.agg(F.hll_sketch_estimate(
        F.hll_sketch_agg("doc_id", F.lit(14))).alias("x")).first()["x"]
    exact = df.select("doc_id").distinct().count()
    assert exact == 20_000
    for name, est in (("ours", ours), ("approx_count_distinct", acd),
                      ("hll_sketch_estimate", hse)):
        assert abs(est - exact) <= 0.03 * exact, (name, est)


def test_theta_vs_approx_count_distinct(spark, token_table_path):
    from ddsketchy_spark.spark.companions import theta_state

    df = read_tokens(spark, token_table_path)
    ours = theta_state(df, "tokens", k=4096, engine="native")["distinct_est"]
    acd = (df.select(F.explode("tokens").alias("t"))
           .agg(F.approx_count_distinct("t", 0.02).alias("x")).first()["x"])
    exact = df.select(F.explode("tokens").alias("t")).distinct().count()
    assert abs(ours - exact) <= 4.0 / np.sqrt(4095) * exact
    assert abs(acd - exact) <= 0.05 * exact  # sanity on the oracle itself


def test_cms_vs_spark_count_min_sketch(spark, token_table_path):
    """Point-frequency estimates from our CMS vs Spark's own CountMinSketch
    (read back through the JVM sketch API): both must dominate the exact
    count and stay within their epsilon*N bounds."""
    from ddsketchy_spark.core.cms import CountMinSketch
    from ddsketchy_spark.spark.companions import cms_state

    df = read_tokens(spark, token_table_path)
    vals = df.select(F.explode("tokens").alias("t"))
    exact = {r["t"]: r["cnt"] for r in
             vals.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
             .orderBy(F.desc("cnt")).limit(20).collect()}
    n = vals.count()

    ours = CountMinSketch.from_bytes(
        cms_state(df, "tokens", depth=5, width=1 << 14)["state"])
    blob = vals.agg(F.count_min_sketch(
        F.col("t").cast("long"), F.lit(0.0005), F.lit(0.99), F.lit(1)
    ).alias("s")).first()["s"]
    jvm = df.sparkSession._jvm
    jcms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(blob))

    import numpy as _np

    keys = _np.array(sorted(exact), dtype=_np.int64)
    mine = ours.query_batch(keys)
    eps = 2.718281828 / ours.width  # CMS guarantee: overestimate <= e/width * N
    for t, m in zip(keys, mine):
        cnt = exact[int(t)]
        theirs = jcms.estimateCount(int(t))
        assert m >= cnt and m - cnt <= eps * n + 1, (int(t), int(m), cnt)
        assert theirs >= cnt, (int(t), theirs, cnt)
