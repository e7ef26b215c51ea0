"""sketch_rollup: the generic blob-level rollup cube — finest-level
state blobs built once, every coarser level merges THOSE. Mergeability
is the contract, so it must work for every SketchAggregator:

- register-max (HLL), count (CMS), and min-k (Theta) sketches give
  estimates IDENTICAL to a direct aggregate at the coarser grouping;
- history-dependent summaries (t-digest) stay within their published
  error bound (merge order reshapes centroids, never the guarantee)."""

import numpy as np
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def events2d(spark):
    return (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .withColumn("day", F.date_format("ts", "yyyy-MM-dd")))


def _by_level(rows):
    out = {}
    for r in rows:
        out.setdefault(r["rollup_level"], []).append(r)
    return out


def test_hll_rollup_exact_parity(spark, events2d):
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.agg import sketch_aggregate, sketch_rollup
    from ddsketchy_spark.spark.companions import HLLAggregator

    agg = HLLAggregator("user_id", p=14)
    r = sketch_rollup(events2d, agg, ["event_type", "day"])
    lv = _by_level(r.collect())
    assert set(lv) == {0, 1, 2}
    d2 = {(x["event_type"], x["day"]): x["distinct_est"] for x in
          sketch_aggregate(events2d, agg, by=["event_type", "day"]).collect()}
    d1 = {x["event_type"]: x["distinct_est"] for x in
          sketch_aggregate(events2d, agg, by=["event_type"]).collect()}
    d0 = sketch_aggregate(events2d, agg)["distinct_est"]
    # register-max merge: rolled-up registers == directly-built registers
    for x in lv[2]:
        assert x["distinct_est"] == d2[(x["event_type"], x["day"])]
    for x in lv[1]:
        assert x["day"] is None
        assert x["distinct_est"] == d1[x["event_type"]]
    assert lv[0][0]["distinct_est"] == d0
    assert release_cached_deps(r) == 1


def test_theta_and_cms_rollup_exact_parity(spark, events2d):
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.agg import sketch_aggregate, sketch_rollup
    from ddsketchy_spark.spark.companions import (CMSAggregator,
                                                  ThetaAggregator)

    tagg = ThetaAggregator("user_id", k=256)
    r = sketch_rollup(events2d, tagg, ["event_type"], persist=False)
    lv = _by_level(r.collect())
    d1 = {x["event_type"]: x["distinct_est"] for x in
          sketch_aggregate(events2d, tagg, by=["event_type"]).collect()}
    for x in lv[1]:
        # min-k law: the global k smallest hashes are a subset of the
        # union of per-group k smallest — merge loses nothing
        assert x["distinct_est"] == d1[x["event_type"]]
    assert lv[0][0]["distinct_est"] == \
        sketch_aggregate(events2d, tagg)["distinct_est"]

    cagg = CMSAggregator("event_type", width=256, depth=5)
    rc = sketch_rollup(events2d, cagg, ["day"], persist=False)
    lvc = _by_level(rc.collect())
    g = sketch_aggregate(events2d, cagg)
    # counter sums: rolled-up counters equal the direct global sketch
    assert lvc[0][0]["total"] == g["total"]
    release_cached_deps(r)
    release_cached_deps(rc)


def test_tdigest_rollup_within_bound(spark, events2d):
    """t-digest merge is history-dependent: rolled-up centroids need not
    equal a direct build, but the quantile estimates must stay within
    the sketch's practical accuracy of the exact values."""
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.companions import TDigestAggregator
    from ddsketchy_spark.spark.agg import sketch_rollup

    agg = TDigestAggregator("value", delta=200.0)
    r = sketch_rollup(events2d, agg, ["event_type"])
    lv = _by_level(r.collect())
    exact = {x["event_type"]: x["p"] for x in events2d.groupBy("event_type")
             .agg(F.expr("percentile(value, 0.5)").alias("p")).collect()}
    for x in lv[1]:
        assert x["p50"] == pytest.approx(exact[x["event_type"]], rel=0.05)
    gexact = events2d.agg(F.expr("percentile(value, 0.5)")).collect()[0][0]
    assert lv[0][0]["p50"] == pytest.approx(gexact, rel=0.05)
    release_cached_deps(r)


def test_sketch_rollup_levels_state_and_guards(spark, events2d):
    from ddsketchy_spark.core.hll import HyperLogLog
    from ddsketchy_spark.pipeline.cache import release_cached_deps
    from ddsketchy_spark.spark.agg import sketch_rollup
    from ddsketchy_spark.spark.companions import HLLAggregator

    agg = HLLAggregator("user_id", p=12)
    r = sketch_rollup(events2d, agg, ["event_type", "day"],
                      levels=[["day"], []], keep_state=True)
    rows = r.collect()
    lv = _by_level(rows)
    assert set(lv) == {0, 1}
    for x in lv[1]:
        assert x["event_type"] is None and x["day"] is not None
        # the state blob round-trips to the reported estimate
        assert HyperLogLog.from_bytes(x["state"]).cardinality() == x["distinct_est"]
    assert HyperLogLog.from_bytes(lv[0][0]["state"]).cardinality() == \
        lv[0][0]["distinct_est"]
    with pytest.raises(ValueError, match="non-empty"):
        sketch_rollup(events2d, agg, [])
    with pytest.raises(ValueError, match="not in"):
        sketch_rollup(events2d, agg, ["day"], levels=[["event_type"]])
    with pytest.raises(ValueError, match="duplicate"):
        sketch_rollup(events2d, agg, ["day"], levels=[["day"], ["day"]])
    release_cached_deps(r)
