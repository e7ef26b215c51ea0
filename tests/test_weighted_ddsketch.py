"""Weighted DDSketch ingestion (core add_weighted_batch + the native
engine's weight_col): the expansion law — a (value, count) row sketches
exactly like count copies of the value — makes pre-aggregated frequency
tables (the 10^12-token shape: one row per distinct value) sketchable
with a shuffle of O(distinct values)."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _wdf(spark, seed=7, n=3000):
    """(grp, value, w) with NULL/zero/valid weights and edge values."""
    rng = np.random.default_rng(seed)
    vals = np.round(rng.lognormal(2, 1.5, n), 4) * np.where(
        rng.random(n) < 0.25, -1, 1)
    ws = rng.integers(0, 6, n).astype(object)
    ws[::17] = None  # NULL weights: contribute nothing
    grps = [f"g{i % 3}" for i in range(n)]
    rows = [(grps[i], float(vals[i]),
             None if ws[i] is None else int(ws[i])) for i in range(n)]
    rows += [(grps[0], float("nan"), 5), (grps[1], float("inf"), 5),
             (grps[2], None, 5), (grps[0], 0.0, 3), (grps[1], 1e-300, 2)]
    return spark.createDataFrame(rows, "grp string, value double, w long")


def _expanded(df):
    return df.where("w IS NOT NULL AND w > 0").select(
        "grp", F.explode(F.array_repeat("value", F.col("w").cast("int")))
        .alias("value"))


def test_core_weighted_expansion_law():
    from ddsketchy_spark.core.ddsketch import DDSketch

    rng = np.random.default_rng(0)
    vals = np.round(rng.lognormal(0, 2, 2000), 3) * np.where(
        rng.random(2000) < 0.3, -1, 1)
    vals[:5] = [0.0, 1e-300, -1e-300, np.nan, np.inf]
    cnts = rng.integers(0, 7, 2000)
    a = DDSketch(0.01)
    a.add_weighted_batch(vals, cnts)
    b = DDSketch(0.01)
    b.add_batch(np.repeat(vals, cnts))
    # everything discrete is identical; the float running sum may differ
    # in final ulps (association order), exactly like the reference's f64
    assert a.count == b.count and a.zero_count == b.zero_count
    assert a.min == b.min and a.max == b.max
    assert a.sum == pytest.approx(b.sum, rel=1e-12)
    for q in (0.0, 0.01, 0.5, 0.9, 0.999, 1.0):
        assert a.quantile(q) == b.quantile(q)
    # merge a weighted partial into an unweighted one: still the law
    c = DDSketch(0.01)
    c.add_weighted_batch(vals[:1000], cnts[:1000])
    d = DDSketch(0.01)
    d.add_batch(np.repeat(vals[1000:], cnts[1000:]))
    c.merge(d)
    for q in (0.01, 0.5, 0.999):
        assert c.quantile(q) == b.quantile(q)


def test_core_weighted_guards():
    from ddsketchy_spark.core.ddsketch import DDSketch

    sk = DDSketch(0.01)
    with pytest.raises(ValueError, match=">= 0"):
        sk.add_weighted_batch([1.0], [-1])
    with pytest.raises(ValueError, match="integral"):
        sk.add_weighted_batch([1.0], [1.5])
    with pytest.raises(ValueError, match="finite"):
        sk.add_weighted_batch([1.0], [float("nan")])
    with pytest.raises(ValueError, match="values but"):
        sk.add_weighted_batch([1.0, 2.0], [1])
    assert sk.is_empty()  # failed adds left no partial state
    sk.add_weighted(5.0, 3)
    ref = DDSketch(0.01)
    for _ in range(3):
        ref.add(5.0)
    assert sk.to_bytes() == ref.to_bytes()


def test_weighted_native_global_matches_expansion(spark):
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    df = _wdf(spark)
    w = ddsketch_quantiles(df, "value", weight_col="w")
    e = ddsketch_quantiles(_expanded(df), "value")
    assert w["count"] == e["count"]
    assert w["min"] == e["min"] and w["max"] == e["max"]
    assert w["sum"] == pytest.approx(e["sum"], rel=1e-9)
    for lab in ("p50", "p90", "p99", "p99_9"):
        assert w[lab] == e[lab], lab


def test_weighted_native_grouped_matches_expansion(spark):
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    df = _wdf(spark)
    w = {r["grp"]: r for r in
         ddsketch_quantiles(df, "value", by=["grp"],
                            weight_col="w").collect()}
    e = {r["grp"]: r for r in
         ddsketch_quantiles(_expanded(df), "value", by=["grp"]).collect()}
    assert set(w) == set(e) == {"g0", "g1", "g2"}
    for g in w:
        assert w[g]["count"] == e[g]["count"]
        assert w[g]["min"] == e[g]["min"] and w[g]["max"] == e[g]["max"]
        assert w[g]["sum"] == pytest.approx(e[g]["sum"], rel=1e-9)
        for lab in ("p50", "p90", "p99", "p99_9"):
            assert w[g][lab] == e[g][lab], (g, lab)


def test_weighted_array_column_and_state(spark):
    """Array value column: the row weight applies to every element; and
    ddsketch_state returns the weighted sketch whose estimates match the
    expansion's."""
    from ddsketchy_spark.spark.ddsketch_agg import (
        ddsketch_quantiles, ddsketch_state)

    rows = [([1.0, 10.0, 100.0], 3), ([5.0, 50.0], 2), ([7.0], 0),
            ([2.0, 20.0], None)]
    df = spark.createDataFrame(rows, "vals array<double>, w long")
    w = ddsketch_quantiles(df, "vals", weight_col="w")
    exp = spark.createDataFrame(
        [(v,) for v in [1.0, 10.0, 100.0] * 3 + [5.0, 50.0] * 2],
        "value double")
    e = ddsketch_quantiles(exp, "value")
    assert w["count"] == e["count"] == 13
    for lab in ("p50", "p90", "p99", "p99_9"):
        assert w[lab] == e[lab]
    sk = ddsketch_state(df, "vals", weight_col="w")
    assert sk.count == 13 and sk.quantile(0.5) == w["p50"]


def test_weighted_guards_spark(spark):
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    neg = spark.createDataFrame([(1.0, 2), (3.0, -1)], "value double, w long")
    with pytest.raises(Exception, match=">= 0"):
        ddsketch_quantiles(neg, "value", weight_col="w")
    frac = spark.createDataFrame([(1.0, 2.0), (3.0, 1.5)],
                                 "value double, w double")
    with pytest.raises(Exception, match="integral"):
        ddsketch_quantiles(frac, "value", weight_col="w")
    # grouped path validates inside the vectorized assembler
    negg = spark.createDataFrame([("a", 1.0, 2), ("a", 3.0, -1)],
                                 "grp string, value double, w long")
    with pytest.raises(Exception, match=">= 0"):
        ddsketch_quantiles(negg, "value", by=["grp"],
                           weight_col="w").collect()
    with pytest.raises(ValueError, match="engine='native'"):
        ddsketch_quantiles(neg, "value", weight_col="w", engine="arrow")
    # integral-valued DOUBLE weights are fine (the TPC-H l_quantity shape)
    okd = spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)],
                                "value double, w double")
    out = ddsketch_quantiles(okd, "value", weight_col="w")
    assert out["count"] == 6
