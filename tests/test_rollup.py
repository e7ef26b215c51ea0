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


def test_rollup_drift_between_versions(spark, tmp_path):
    """Drift between two snapshots: counts/sums/deltas exact vs the raw
    halves, quantile estimates = the per-version read_rollup values,
    'added' status for a key the old snapshot lacks, defaults pick
    (latest-1, latest)."""
    from ddsketchy_spark.spark.rollup import rollup_drift

    agg = DDSketchAggregator("v", quantiles=(0.5,))
    root = str(tmp_path / "rollup3")
    d1 = spark.createDataFrame(
        [("a", float(i + 1)) for i in range(100)]
        + [("c", float(i + 1)) for i in range(40)], "k string, v double")
    d2 = spark.createDataFrame(
        [("a", float(i + 1)) for i in range(50)]
        + [("b", 7.0)], "k string, v double")
    update_rollup(spark, root, d1, agg, ["k"])
    update_rollup(spark, root, d2, agg, ["k"])
    drift = {r["k"]: r for r in
             rollup_drift(spark, root, agg, ["k"]).collect()}
    assert set(drift) == {"a", "b", "c"}
    a = drift["a"]
    assert a["status"] == "both"
    assert (a["count_old"], a["count_new"], a["delta_count"]) == (100, 150, 50)
    assert a["sum_new"] - a["sum_old"] == sum(range(1, 51))
    b = drift["b"]
    assert b["status"] == "added"
    assert b["count_old"] is None and b["count_new"] == 1
    assert b["delta_count"] is None and b["p50_new"] == 7.0
    c = drift["c"]
    assert c["status"] == "both" and c["delta_count"] == 0
    # quantile columns match the per-version finalize exactly
    old_est = {r["k"]: r for r in
               read_rollup(spark, root, agg, ["k"]).collect()}
    assert drift["a"]["p50_new"] == old_est["a"]["p50"]
    # guards
    import pytest

    with pytest.raises(ValueError, match="two snapshots"):
        rollup_drift(spark, root, agg, ["k"], v_old=-1, v_new=0)
    with pytest.raises(ValueError, match="nothing to compare"):
        rollup_drift(spark, root, agg, ["k"], v_old=1, v_new=1)
    with pytest.raises(FileNotFoundError, match="v=9"):
        rollup_drift(spark, root, agg, ["k"], v_old=0, v_new=9)


def test_rollup_drift_global(spark, tmp_path):
    """Empty `by`: one global row, deltas exact."""
    from ddsketchy_spark.spark.rollup import rollup_drift

    agg = DDSketchAggregator("v", quantiles=(0.5,))
    root = str(tmp_path / "rollup4")
    d1 = spark.createDataFrame([(float(i + 1),) for i in range(64)],
                               "v double")
    d2 = spark.createDataFrame([(1000.0,)], "v double")
    update_rollup(spark, root, d1, agg, [])
    update_rollup(spark, root, d2, agg, [])
    rows = rollup_drift(spark, root, agg, []).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["status"] == "both"
    assert (r["count_old"], r["count_new"], r["delta_count"]) == (64, 65, 1)
    assert r["max_new"] >= 990.0  # the spike is visible in the drift row


def test_theta_rollup_overlap(spark, tmp_path):
    """Set overlap between snapshots from Theta state algebra alone:
    exact-mode estimates equal true distinct counts; cross-root
    comparison and empty-side keys behave."""
    from ddsketchy_spark.spark.companions import ThetaAggregator
    from ddsketchy_spark.spark.rollup import theta_rollup_overlap

    agg = ThetaAggregator("u", k=4096)
    root = str(tmp_path / "theta_roll")
    # r4 advice: a non-Theta aggregator fails driver-side with the real
    # reason, not executor-side inside ThetaSketch.from_bytes
    from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator
    with pytest.raises(TypeError, match="ThetaAggregator"):
        theta_rollup_overlap(spark, root, DDSketchAggregator("u"), ["k"])
    d1 = spark.createDataFrame([("a", i) for i in range(1, 101)],
                               "k string, u long")
    d2 = spark.createDataFrame(
        [("a", i) for i in range(51, 151)] + [("b", 7)], "k string, u long")
    update_rollup(spark, root, d1, agg, ["k"])
    update_rollup(spark, root, d2, agg, ["k"])
    ov = {r["k"]: r for r in
          theta_rollup_overlap(spark, root, agg, ["k"]).collect()}
    a = ov["a"]
    assert a["exact_mode"]
    assert (a["est_old"], a["est_new"]) == (100.0, 150.0)
    assert a["est_intersection"] == 100.0  # v0 is a subset of v1
    assert a["est_new_only"] == 50.0 and a["est_union"] == 150.0
    assert abs(a["jaccard"] - 100.0 / 150.0) < 1e-12
    b = ov["b"]
    assert b["est_old"] == 0.0 and b["est_new"] == 1.0
    assert b["est_new_only"] == 1.0 and b["jaccard"] == 0.0
    # cross-root: a separate crawl's rollup as the old side
    root2 = str(tmp_path / "theta_roll2")
    d3 = spark.createDataFrame([("a", i) for i in range(100, 200)],
                               "k string, u long")
    update_rollup(spark, root2, d3, agg, ["k"])
    cross = {r["k"]: r for r in
             theta_rollup_overlap(spark, root, agg, ["k"],
                                  other_root=root2).collect()}
    ca = cross["a"]
    assert ca["est_old"] == 100.0 and ca["est_new"] == 150.0
    assert ca["est_intersection"] == 51.0  # {100..150}
    assert ca["est_new_only"] == 99.0 and ca["est_union"] == 199.0
