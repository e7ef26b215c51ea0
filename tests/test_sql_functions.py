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
