"""Misra-Gries heavy-hitters: guarantees, merge laws, Spark integration."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.core.misra_gries import MisraGries
from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.companions import misra_gries_state


def test_bounds_and_no_missed_heavy_hitter():
    rng = np.random.default_rng(1337)
    items = rng.zipf(1.3, size=300_000)
    items = items[items < 10_000]
    mg = MisraGries(k=128)
    for chunk in np.array_split(items, 20):
        mg.add_batch(chunk)
    uniq, true_counts = np.unique(items, return_counts=True)
    exact = dict(zip(uniq.tolist(), true_counts.tolist()))
    n = len(items)
    assert mg.n == n
    assert mg.err_bound <= n // (128 + 1)
    for key, est in mg.counters.items():
        f = exact[key]
        assert est <= f <= est + mg.err_bound, key
    # every key with frequency > n/(k+1) must be present
    for key, f in exact.items():
        if f > n // (128 + 1):
            assert key in mg.counters, (key, f)


def test_merge_guarantees_hold():
    rng = np.random.default_rng(7)
    parts = [rng.zipf(1.5, 50_000).clip(0, 5000) for _ in range(4)]
    sketches = []
    for p in parts:
        mg = MisraGries(k=64)
        mg.add_batch(p)
        sketches.append(mg)
    acc = MisraGries(k=64)
    for s in reversed(sketches):
        acc.merge(MisraGries.from_bytes(s.to_bytes()))
    allv = np.concatenate(parts)
    uniq, cnt = np.unique(allv, return_counts=True)
    exact = dict(zip(uniq.tolist(), cnt.tolist()))
    assert acc.n == len(allv)
    for key, est in acc.counters.items():
        f = exact[key]
        assert est <= f <= est + acc.err_bound
    for key, f in exact.items():
        if f > acc.n // (64 + 1):
            assert key in acc.counters


def test_codec_and_config():
    mg = MisraGries(k=16, key_kind="str")
    mg.add_batch(np.asarray(["a", "b", "a", "c"] * 100, dtype=object))
    back = MisraGries.from_bytes(mg.to_bytes())
    assert back == mg
    with pytest.raises(ValueError):
        MisraGries(16).merge(MisraGries(32))
    with pytest.raises(ValueError):
        MisraGries(0)


def test_spark_heavy_hitters_tokens(spark, token_table_path):
    """Distributed MG over the flattened tokens column: every true heavy
    hitter is found; estimates within err_bound of exact."""
    df = read_tokens(spark, token_table_path)
    out = misra_gries_state(df, "tokens", k=256)
    mg = MisraGries.from_bytes(out["state"])
    exact = dict(
        df.select(F.explode("tokens").alias("t")).groupBy("t").count()
        .orderBy(F.desc("count")).limit(100).collect()
    )
    n_tokens = int(df.select(F.sum(F.size("tokens"))).collect()[0][0])
    assert mg.n == n_tokens == out["total"]
    for key, f in exact.items():
        if f > n_tokens // 257:
            assert key in mg.counters, (key, f)
            assert mg.estimate(key) <= f <= mg.estimate(key) + mg.err_bound


def test_spark_grouped_heavy_hitters(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    rows = {r["source"]: r for r in
            misra_gries_state(df, "n_tok", by=["source"], k=64).collect()}
    exact_n = {r["source"]: r["c"] for r in
               df.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()}
    for s, r in rows.items():
        assert r["total"] == exact_n[s]
        mg = MisraGries.from_bytes(r["state"])
        assert mg.err_bound <= r["total"] // 65
