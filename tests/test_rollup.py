"""Incremental rollup tests: N incremental updates == one-shot build,
bit-identically; snapshots are immutable and versioned."""

import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator, quantile_label
from ddsketchy_spark.spark.rollup import (
    latest_version,
    read_rollup,
    update_rollup,
)

QS = (0.5, 0.9, 0.99)


def test_incremental_equals_oneshot(spark, token_table_path, tmp_path):
    from ddsketchy_spark.spark.agg import sketch_aggregate

    df = read_tokens(spark, token_table_path)
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    root = str(tmp_path / "rollup")

    # three incremental updates over disjoint slices
    slices = [df.where(F.col("doc_id") < "doc-000000006000"),
              df.where((F.col("doc_id") >= "doc-000000006000")
                       & (F.col("doc_id") < "doc-000000014000")),
              df.where(F.col("doc_id") >= "doc-000000014000")]
    for i, sl in enumerate(slices):
        v = update_rollup(spark, root, sl, agg, ["source"])
        assert v == i
    assert latest_version(spark, root) == 2

    rolled = {r["source"]: r for r in
              read_rollup(spark, root, agg, ["source"]).collect()}
    oneshot = {r["source"]: r for r in
               sketch_aggregate(df, agg, by=["source"]).collect()}
    assert rolled.keys() == oneshot.keys()
    total = 0
    for s in rolled:
        assert rolled[s]["count"] == oneshot[s]["count"], s
        total += rolled[s]["count"]
        for q in QS:
            assert rolled[s][quantile_label(q)] == oneshot[s][quantile_label(q)], (s, q)
    assert total == 20_000


def test_new_keys_appear_old_keys_survive(spark, tmp_path):
    agg = DDSketchAggregator("v", quantiles=(0.5,))
    root = str(tmp_path / "rollup2")
    d1 = spark.createDataFrame([("a", float(i)) for i in range(100)],
                               "k string, v double")
    d2 = spark.createDataFrame([("b", float(i)) for i in range(50)],
                               "k string, v double")
    update_rollup(spark, root, d1, agg, ["k"])
    update_rollup(spark, root, d2, agg, ["k"])
    out = {r["k"]: r for r in read_rollup(spark, root, agg, ["k"]).collect()}
    assert out["a"]["count"] == 100 and out["b"]["count"] == 50


def test_empty_rollup_returns_none(spark, tmp_path):
    agg = DDSketchAggregator("v")
    assert read_rollup(spark, str(tmp_path / "nope"), agg, ["k"]) is None
