"""ddsketch_rollup: every rollup level from ONE scan — the finest
bucket-row frame persists and coarser levels re-aggregate it. The law
under test: sketch mergeability makes summing bucket counts identical
to merging sketches, so every level's estimates equal a direct
ddsketch_quantiles at that grouping."""

import numpy as np
import pytest

from pyspark.sql import functions as F


def _df(spark, n=4000, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(f"s{i % 4}", f"d{i % 3}", float(v), int(w)) for i, (v, w) in
            enumerate(zip(np.round(rng.lognormal(1, 1.5, n), 4),
                          rng.integers(1, 5, n)))]
    return spark.createDataFrame(
        rows, "src string, day string, value double, w long")


def _by_level(rows, dims):
    out = {}
    for r in rows:
        key = tuple(r[d] for d in dims if r[d] is not None)
        out.setdefault(r["rollup_level"], {})[key] = r
    return out


def test_rollup_matches_direct_at_every_level(spark):
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.ddsketch_agg import (
        ddsketch_quantiles, ddsketch_rollup)

    df = _df(spark)
    r = ddsketch_rollup(df, "value", ["src", "day"], quantiles=(0.5, 0.99))
    rows = r.collect()
    lv = _by_level(rows, ["src", "day"])
    assert set(lv) == {0, 1, 2}
    assert len(lv[2]) == 12 and len(lv[1]) == 4 and len(lv[0]) == 1
    d2 = {(x["src"], x["day"]): x for x in ddsketch_quantiles(
        df, "value", by=["src", "day"], quantiles=(0.5, 0.99)).collect()}
    d1 = {(x["src"],): x for x in ddsketch_quantiles(
        df, "value", by=["src"], quantiles=(0.5, 0.99)).collect()}
    d0 = ddsketch_quantiles(df, "value", quantiles=(0.5, 0.99))
    for key, x in lv[2].items():
        d = d2[key]
        assert (x["count"], x["p50"], x["p99"], x["min"], x["max"]) == \
            (d["count"], d["p50"], d["p99"], d["min"], d["max"])
        assert x["sum"] == pytest.approx(d["sum"], rel=1e-12)
    for key, x in lv[1].items():
        d = d1[key]
        assert x["day"] is None
        assert (x["count"], x["p50"], x["p99"]) == \
            (d["count"], d["p50"], d["p99"])
    g = lv[0][()]
    assert g["src"] is None and g["day"] is None
    assert (g["count"], g["p50"], g["p99"]) == \
        (d0["count"], d0["p50"], d0["p99"])
    # the bucket-row frame is persisted (single data scan) and releasable
    assert "InMemoryTableScan" in r._jdf.queryExecution().executedPlan().toString()
    assert release_cached_deps(r) == 1


def test_rollup_weighted_and_custom_levels(spark):
    """weight_col composes; explicit grouping-sets-style levels work
    (day alone is NOT a rollup prefix of [src, day])."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.ddsketch_agg import (
        ddsketch_quantiles, ddsketch_rollup)

    df = _df(spark)
    r = ddsketch_rollup(df, "value", ["src", "day"],
                        levels=[["src"], ["day"], []],
                        quantiles=(0.5, 0.9), weight_col="w")
    rows = r.collect()
    lv = _by_level(rows, ["src", "day"])
    assert set(lv) == {0, 1} and len(lv[1]) == 7  # 4 src + 3 day
    dsrc = {(x["src"],): x for x in ddsketch_quantiles(
        df, "value", by=["src"], quantiles=(0.5, 0.9),
        weight_col="w").collect()}
    dday = {(x["day"],): x for x in ddsketch_quantiles(
        df, "value", by=["day"], quantiles=(0.5, 0.9),
        weight_col="w").collect()}
    d0 = ddsketch_quantiles(df, "value", quantiles=(0.5, 0.9),
                            weight_col="w")
    for key, x in lv[1].items():
        d = (dsrc if x["src"] is not None else dday)[key]
        assert (x["count"], x["p50"], x["p90"]) == \
            (d["count"], d["p50"], d["p90"])
    g = lv[0][()]
    assert (g["count"], g["p50"], g["p90"]) == \
        (d0["count"], d0["p50"], d0["p90"])
    release_cached_deps(r)


def test_rollup_keep_state_and_guards(spark):
    from ddsketchy_spark.core.ddsketch import DDSketch
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.ddsketch_agg import (
        ddsketch_quantiles, ddsketch_rollup)

    df = _df(spark, n=500)
    r = ddsketch_rollup(df, "value", ["src"], quantiles=(0.5,),
                        keep_state=True, persist=False)
    rows = {(x["src"],) if x["src"] is not None else (): x
            for x in r.collect()}
    d0 = ddsketch_quantiles(df, "value", quantiles=(0.5,))
    for key, x in rows.items():
        sk = DDSketch.from_bytes(x["state"])
        assert sk.count == x["count"]
        assert sk.quantile_opt(0.5) == x["p50"]
    assert rows[()]["p50"] == d0["p50"]
    with pytest.raises(ValueError, match="non-empty"):
        ddsketch_rollup(df, "value", [])
    with pytest.raises(ValueError, match="not in"):
        ddsketch_rollup(df, "value", ["src"], levels=[["day"]])
    with pytest.raises(ValueError, match="duplicate"):
        ddsketch_rollup(df, "value", ["src"], levels=[["src"], ["src"]])
    # weighted guard still fires through the rollup path
    bad = spark.createDataFrame([("a", 1.0, -2)],
                                "src string, value double, w long")
    with pytest.raises(Exception, match=">= 0"):
        out = ddsketch_rollup(bad, "value", ["src"], weight_col="w",
                              persist=False)
        out.collect()
    release_cached_deps(r)
