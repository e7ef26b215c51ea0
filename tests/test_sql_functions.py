"""SQL-callable sketch functions over state blobs."""

import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.ddsketch_agg import ddsketch_state, quantile_label
from ddsketchy_spark.spark.functions import register_sql_functions


def test_sql_functions_over_states(spark, token_table_path):
    register_sql_functions(spark)
    df = read_tokens(spark, token_table_path)
    states = ddsketch_state(df, "n_tok", by=["source"])
    states.createOrReplaceTempView("per_source_states")
    rows = {r["source"]: r for r in spark.sql("""
        SELECT source,
               ddsketch_count(state) AS cnt,
               ddsketch_quantile(state, 0.5) AS p50,
               ddsketch_quantile(state, 0.99) AS p99,
               ddsketch_sum(state) AS s
        FROM per_source_states
    """).collect()}
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    direct = {r["source"]: r for r in
              ddsketch_quantiles(df, "n_tok", by=["source"],
                                 quantiles=(0.5, 0.99)).collect()}
    assert rows.keys() == direct.keys()
    for s in rows:
        assert rows[s]["cnt"] == direct[s]["count"]
        assert rows[s]["p50"] == direct[s]["p50"]
        assert rows[s]["p99"] == direct[s]["p99"]
        assert rows[s]["s"] == pytest.approx(direct[s]["sum"], rel=1e-12)


def test_sql_merge_pair(spark, token_table_path):
    register_sql_functions(spark)
    df = read_tokens(spark, token_table_path)
    a = ddsketch_state(df.filter("n_tok < 400"), "n_tok", by=["source"]) \
        .withColumnRenamed("state", "sa").select("source", "sa")
    b = ddsketch_state(df.filter("n_tok >= 400"), "n_tok", by=["source"]) \
        .withColumnRenamed("state", "sb").select("source", "sb")
    merged = a.join(b, "source").selectExpr(
        "source", "ddsketch_quantile(ddsketch_merge_pair(sa, sb), 0.5) AS p50",
        "ddsketch_count(ddsketch_merge_pair(sa, sb)) AS cnt")
    whole = {r["source"]: r for r in
             __import__("ddsketchy_spark.spark.ddsketch_agg", fromlist=["x"])
             .ddsketch_quantiles(df, "n_tok", by=["source"], quantiles=(0.5,)).collect()}
    for r in merged.collect():
        assert r["p50"] == whole[r["source"]]["p50"], r["source"]
        assert r["cnt"] == whole[r["source"]]["count"]


def test_sql_theta_set_algebra(spark, token_table_path):
    """SQL users can intersect/diff/jaccard per-source theta states without
    leaving SparkSQL."""
    from ddsketchy_spark.core.theta import ThetaSketch
    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.spark.companions import theta_state
    from ddsketchy_spark.spark.functions import register_sql_functions

    register_sql_functions(spark)
    df = read_tokens(spark, token_table_path)
    states = theta_state(df, "tokens", by=["source"], k=4096, engine="native")
    states.createOrReplaceTempView("theta_by_source")
    rows = spark.sql("""
        SELECT a.source AS sa, b.source AS sb,
               theta_estimate(a.state) AS est_a,
               theta_intersect_estimate(a.state, b.state) AS inter,
               theta_a_not_b_estimate(a.state, b.state) AS diff,
               theta_jaccard(a.state, b.state) AS jac
        FROM theta_by_source a JOIN theta_by_source b ON a.source < b.source
    """).collect()
    assert rows
    local = {r["source"]: ThetaSketch.from_bytes(r["state"])
             for r in states.collect()}
    for r in rows:
        a, b = local[r["sa"]], local[r["sb"]]
        assert r["est_a"] == a.estimate()
        assert r["inter"] == a.intersect(b).estimate()
        assert r["diff"] == a.a_not_b(b).estimate()
        assert r["jac"] == ThetaSketch.jaccard(a, b)
        # sanity: inter + diff ~= est_a when thetas align
        assert r["inter"] >= 0 and r["diff"] >= 0
