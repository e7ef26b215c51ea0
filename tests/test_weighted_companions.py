"""Weighted ingestion for the frequency companions (CMS, Misra-Gries):
a pre-aggregated (key, count) table sketches like the expanded stream.
CMS adds are commutative integer adds, so the weighted state is
BIT-identical to the expansion under any batching; Misra-Gries counters
are exact sums while distincts <= k and bounded by err_bound after."""

import numpy as np
import pytest


def _freq_df(spark, seed=11, n=800):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.6, n).astype(int) % 50
    ws = rng.integers(0, 6, n).astype(object)
    ws[::13] = None
    rows = [(int(k), None if w is None else int(w), f"g{i % 2}")
            for i, (k, w) in enumerate(zip(keys, ws))]
    return spark.createDataFrame(rows, "key long, w long, grp string")


def _expanded(spark, df):
    from pyspark.sql import functions as F

    return df.where("w IS NOT NULL AND w > 0").select(
        "grp", F.explode(F.array_repeat("key", F.col("w").cast("int")))
        .alias("key"))


def test_cms_weighted_arrow_bit_identical(spark):
    from ddsketchy_spark.spark.companions import cms_state

    df = _freq_df(spark)
    exp = _expanded(spark, df)
    a = cms_state(df, "key", depth=5, width=256, weight_col="w")
    b = cms_state(exp, "key", depth=5, width=256)
    assert a["total"] == b["total"]
    assert a["state"] == b["state"]  # commutative integer adds


def test_cms_weighted_native_grouped(spark):
    from ddsketchy_spark.core.cms import CountMinSketch
    from ddsketchy_spark.spark.companions import cms_state

    df = _freq_df(spark)
    exp = _expanded(spark, df)
    a = {r["grp"]: r for r in cms_state(
        df, "key", by=["grp"], depth=5, width=256, engine="native",
        weight_col="w").collect()}
    b = {r["grp"]: r for r in cms_state(
        exp, "key", by=["grp"], depth=5, width=256,
        engine="native").collect()}
    assert set(a) == set(b)
    for g in a:
        assert a[g]["total"] == b[g]["total"]
        assert a[g]["state"] == b[g]["state"]
        # point queries round-trip
        cm = CountMinSketch.from_bytes(a[g]["state"])
        exact = {r["key"]: r["c"] for r in exp.where(f"grp = '{g}'")
                 .groupBy("key").count().withColumnRenamed("count", "c")
                 .collect()}
        for k, c in list(exact.items())[:10]:
            assert cm.query_batch(np.array([k]))[0] >= c


def test_mg_weighted_exact_below_k_and_bounded_above(spark):
    from ddsketchy_spark.core.misra_gries import MisraGries
    from ddsketchy_spark.spark.companions import misra_gries_state

    df = _freq_df(spark)
    exp = _expanded(spark, df)
    exact = {r["key"]: r["c"] for r in
             exp.groupBy("key").count().withColumnRenamed("count", "c")
             .collect()}
    total = sum(exact.values())
    # k >= distincts: counters are exact sums — weighted == truth
    big = misra_gries_state(df, "key", k=64, weight_col="w")
    mg = MisraGries.from_bytes(big["state"])
    assert mg.n == total
    assert dict(mg.counters) == exact
    # k < distincts: the classic MG bound holds for every key
    small = misra_gries_state(df, "key", k=8, weight_col="w")
    mgs = MisraGries.from_bytes(small["state"])
    assert mgs.n == total
    for k, c in exact.items():
        est = mgs.estimate(k)
        assert est <= c <= est + mgs.err_bound, (k, est, c)


def test_weighted_companion_guards(spark):
    from ddsketchy_spark.spark.companions import cms_state, misra_gries_state

    neg = spark.createDataFrame([(1, 2), (3, -1)], "key long, w long")
    with pytest.raises(Exception, match=">= 0"):
        cms_state(neg, "key", weight_col="w")
    with pytest.raises(Exception, match=">= 0"):
        cms_state(neg, "key", engine="native", weight_col="w")
    with pytest.raises(Exception, match=">= 0"):
        misra_gries_state(neg, "key", weight_col="w")
    frac = spark.createDataFrame([(1, 1.5)], "key long, w double")
    with pytest.raises(Exception, match="integral"):
        cms_state(frac, "key", weight_col="w")
    with pytest.raises(Exception, match="integral"):
        cms_state(frac, "key", engine="native", weight_col="w")
    # arrays: arrow engine refuses (alignment), native explodes per element
    arr = spark.createDataFrame([([1, 2], 3)], "key array<long>, w long")
    with pytest.raises(Exception, match="scalar value column"):
        cms_state(arr, "key", weight_col="w")
    out = cms_state(arr, "key", engine="native", weight_col="w")
    assert out["total"] == 6  # 2 elements x weight 3
    # string keys through the weighted pair path
    sdf = spark.createDataFrame([("a", 2), ("b", None), ("a", 0)],
                                "key string, w long")
    mg = misra_gries_state(sdf, "key", k=8, key_kind="str",
                           weight_col="w")
    from ddsketchy_spark.core.misra_gries import MisraGries

    assert dict(MisraGries.from_bytes(mg["state"]).counters) == {"a": 2}


def test_tdigest_weighted_core_and_spark(spark):
    """t-digest weighted add: count/min/max exact vs the expansion,
    quantiles within the sketch's accuracy; FRACTIONAL weights are
    accepted (importance weights are native to centroid sketches) and
    uniform scaling of all weights leaves quantiles unchanged."""
    from ddsketchy_spark.core.tdigest import TDigest
    from ddsketchy_spark.spark.companions import tdigest_quantiles

    rng = np.random.default_rng(2)
    vals = np.round(rng.lognormal(2, 1.0, 1500), 4)
    cnts = rng.integers(0, 5, 1500)
    a = TDigest(200.0)
    a.add_weighted_batch(vals, cnts.astype(float))
    b = TDigest(200.0)
    b.add_batch(np.repeat(vals, cnts))
    assert a.count == b.count
    expanded = np.sort(np.repeat(vals, cnts))
    n = len(expanded)

    def rank_err(est, q):
        # t-digest's guarantee is in RANK space (value-space error is
        # unbounded on heavy tails): the estimate's true rank fraction
        # must sit near q
        return abs(np.searchsorted(expanded, est) / n - q)

    for q in (0.1, 0.5, 0.9, 0.99):
        assert rank_err(a.quantile(q), q) < 0.02, q
        assert rank_err(b.quantile(q), q) < 0.02, q
    # fractional weights: scaling every weight by 0.5 changes nothing
    h = TDigest(200.0)
    h.add_weighted_batch(vals, cnts.astype(float) * 0.5)
    for q in (0.1, 0.5, 0.9):
        assert rank_err(h.quantile(q), q) < 0.02, q
    with pytest.raises(ValueError, match=">= 0"):
        TDigest().add_weighted_batch([1.0], [-1.0])
    with pytest.raises(ValueError, match="finite"):
        TDigest().add_weighted_batch([1.0], [float("inf")])
    with pytest.raises(ValueError, match="values but"):
        TDigest().add_weighted_batch([1.0, 2.0], [1.0])

    rows = [(float(v), int(c)) for v, c in zip(vals, cnts)]
    rows += [(None, 5), (float("nan"), 5), (1.0, None), (2.0, 0)]
    df = spark.createDataFrame(rows, "x double, w long")
    out = tdigest_quantiles(df, "x", weight_col="w",
                            quantiles=(0.5, 0.99))
    assert out["count"] == int(cnts.sum())
    for q, lab in ((0.5, "p50"), (0.99, "p99")):
        assert rank_err(out[lab], q) < 0.02, lab


def test_streaming_weighted_cms_matches_batch(spark, tmp_path):
    """Weighted aggregators flow through stream_sketch_by_key unchanged
    (the weight column rides in value_cols): the final streaming CMS
    state per key is bit-identical to the batch weighted build, even
    with NULL weights arriving mid-stream (the declared-Arrow-type
    rebuild keeps the int weight column int)."""
    from ddsketchy_spark.spark.companions import CMSAggregator, cms_state
    from ddsketchy_spark.streaming import stream_sketch_by_key

    df = _freq_df(spark)
    src = str(tmp_path / "wsrc")
    df.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    agg = CMSAggregator("key", depth=5, width=256, weight_col="w")
    out = stream_sketch_by_key(stream, agg, ["grp"])
    query = (out.writeStream.format("memory").queryName("wcms")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "wcmsck"))
             .trigger(availableNow=True).start())
    query.awaitTermination(120)
    rows = spark.sql(
        "SELECT grp, total FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY grp ORDER BY total DESC) rn"
        "  FROM wcms) WHERE rn = 1").collect()
    got = {r["grp"]: r["total"] for r in rows}
    batch = {r["grp"]: r for r in cms_state(
        spark.read.parquet(src), "key", by=["grp"], depth=5, width=256,
        weight_col="w").collect()}
    assert got.keys() == batch.keys()
    for g in got:
        assert got[g] == batch[g]["total"], g
