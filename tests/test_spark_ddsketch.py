"""Spark-level DDSketch aggregation tests.

Gate: the distributed two-phase aggregation (per-partition vectorized build
-> associative blob merge) must produce bit-identical estimates to a local
single-sketch build over the same rows, for scalar columns, array (token)
columns, grouped and global paths, with and without the salted tree
pre-round, at any partitioning.
"""

import math

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ddsketchy_spark import DDSketch
from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.ddsketch_agg import (
    ddsketch_quantiles,
    ddsketch_state,
    quantile_label,
)

QS = [0.5, 0.9, 0.99, 0.999]


def local_sketch_ntok(path, alpha=0.01):
    tbl = pq.read_table(path, columns=["n_tok"])
    sk = DDSketch(alpha)
    sk.add_batch(tbl.column("n_tok").to_numpy().astype(np.float64))
    return sk


def test_global_matches_local_bitwise(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    res = ddsketch_quantiles(df, "n_tok", quantiles=QS)
    local = local_sketch_ntok(token_table_path)
    assert res["count"] == local.count == 20_000
    for q in QS:
        assert res[quantile_label(q)] == local.quantile(q), q
    assert res["min"] == local.quantile(0.0)
    assert res["max"] == local.quantile(1.0)
    assert res["mean"] == pytest.approx(local.mean, rel=1e-12)


def test_partitioning_invariance(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    r1 = ddsketch_quantiles(df.repartition(13), "n_tok", quantiles=QS)
    r2 = ddsketch_quantiles(df.coalesce(1), "n_tok", quantiles=QS)
    for q in QS:
        assert r1[quantile_label(q)] == r2[quantile_label(q)]
    assert r1["count"] == r2["count"]


def test_grouped_matches_local(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    out = ddsketch_quantiles(df, "n_tok", by=["source"], quantiles=QS)
    rows = {r["source"]: r for r in out.collect()}

    tbl = pq.read_table(token_table_path, columns=["n_tok", "source"])
    src = np.asarray(tbl.column("source").to_pylist())
    vals = tbl.column("n_tok").to_numpy().astype(np.float64)
    for s in np.unique(src):
        local = DDSketch(0.01)
        local.add_batch(vals[src == s])
        row = rows[s]
        assert row["count"] == local.count
        for q in QS:
            assert row[quantile_label(q)] == local.quantile(q), (s, q)


def test_grouped_salted_tree_round_identical(spark, token_table_path):
    """merge_rounds=2 (salted pre-merge for skew) changes the plan, not the
    estimates — merge is associative & commutative."""
    df = read_tokens(spark, token_table_path)
    direct = {r["source"]: r for r in
              ddsketch_quantiles(df, "n_tok", by=["source"], quantiles=QS).collect()}
    salted = {r["source"]: r for r in
              ddsketch_quantiles(df, "n_tok", by=["source"], quantiles=QS,
                                 merge_rounds=2, fanout=8).collect()}
    assert direct.keys() == salted.keys()
    for s in direct:
        for q in QS:
            assert direct[s][quantile_label(q)] == salted[s][quantile_label(q)]
        assert direct[s]["count"] == salted[s]["count"]


def test_token_array_column(spark, token_table_path):
    """Sketching the tokens array column (flattened via Arrow offsets, no
    explode) matches a local flatten."""
    df = read_tokens(spark, token_table_path)
    res = ddsketch_quantiles(df, "tokens", quantiles=[0.5, 0.99])
    tbl = pq.read_table(token_table_path, columns=["tokens"])
    flat = tbl.column("tokens").combine_chunks().flatten().to_numpy().astype(np.float64)
    local = DDSketch(0.01)
    local.add_batch(flat)
    assert res["count"] == local.count == len(flat)
    assert res[quantile_label(0.5)] == local.quantile(0.5)
    assert res[quantile_label(0.99)] == local.quantile(0.99)


def test_accuracy_within_alpha_vs_exact(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    alpha = 0.01
    res = ddsketch_quantiles(df, "n_tok", alpha=alpha, quantiles=QS)
    tbl = pq.read_table(token_table_path, columns=["n_tok"])
    sv = np.sort(tbl.column("n_tok").to_numpy().astype(np.float64))
    for q in QS:
        lo = sv[math.floor(q * (len(sv) - 1))]
        hi = sv[math.ceil(q * (len(sv) - 1))]
        est = res[quantile_label(q)]
        assert (1 - alpha) * lo - 1e-9 <= est <= (1 + alpha) * hi + 1e-9, q


def test_state_roundtrip_through_spark(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    sk = ddsketch_state(df, "n_tok")
    local = local_sketch_ntok(token_table_path)
    assert sk.count == local.count
    for q in QS:
        assert sk.quantile(q) == local.quantile(q)


def test_native_engine_matches_arrow_global(spark, token_table_path):
    """Both engines implement the same bucketing law -> identical estimates."""
    df = read_tokens(spark, token_table_path)
    nat = ddsketch_quantiles(df, "n_tok", quantiles=QS, engine="native")
    arr = ddsketch_quantiles(df, "n_tok", quantiles=QS, engine="arrow")
    assert nat["count"] == arr["count"]
    assert nat["sum"] == pytest.approx(arr["sum"], rel=1e-12)
    for q in QS:
        assert nat[quantile_label(q)] == arr[quantile_label(q)], q
    assert nat["min"] == arr["min"] and nat["max"] == arr["max"]


def test_native_engine_matches_arrow_tokens_array(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    nat = ddsketch_quantiles(df, "tokens", quantiles=[0.5, 0.99], engine="native")
    arr = ddsketch_quantiles(df, "tokens", quantiles=[0.5, 0.99], engine="arrow")
    assert nat["count"] == arr["count"]
    for q in [0.5, 0.99]:
        assert nat[quantile_label(q)] == arr[quantile_label(q)]


def test_native_engine_grouped_matches_arrow(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    nat = {r["source"]: r for r in
           ddsketch_quantiles(df, "n_tok", by=["source"], quantiles=QS,
                              engine="native").collect()}
    arr = {r["source"]: r for r in
           ddsketch_quantiles(df, "n_tok", by=["source"], quantiles=QS,
                              engine="arrow").collect()}
    assert nat.keys() == arr.keys()
    for s in nat:
        assert nat[s]["count"] == arr[s]["count"]
        for q in QS:
            assert nat[s][quantile_label(q)] == arr[s][quantile_label(q)], (s, q)


def test_native_engine_mixed_sign_and_specials(spark):
    """Negative store, zero bucket, and non-finite filtering in the native
    engine match the local core sketch exactly."""
    vals = [-1000.0, -3.5, -1e-300, 0.0, 0.0, 1e-300, 2.5, 7.0, 7.0, 400.0]
    specials = [float("nan"), float("inf"), float("-inf")]
    df = spark.createDataFrame([(v,) for v in vals + specials], "x double")
    res = ddsketch_quantiles(df, "x", quantiles=[0.0, 0.25, 0.5, 0.75, 1.0],
                             engine="native")
    local = DDSketch.from_values(vals + specials)
    assert res["count"] == local.count == len(vals)
    for q in [0.0, 0.25, 0.5, 0.75, 1.0]:
        assert res[quantile_label(q)] == local.quantile(q), q
    assert res["sum"] == pytest.approx(local.sum, rel=1e-12)


def test_per_source_token_distribution(spark, token_table_path):
    """The BASELINE workload: per-source distributions of the token VALUES
    (array column, grouped) — native engine vs local flatten-and-filter."""
    df = read_tokens(spark, token_table_path)
    out = {r["source"]: r for r in
           ddsketch_quantiles(df, "tokens", by=["source"],
                              quantiles=[0.5, 0.999], engine="native").collect()}
    tbl = pq.read_table(token_table_path, columns=["tokens", "source"])
    src = np.asarray(tbl.column("source").to_pylist())
    toks = tbl.column("tokens").combine_chunks()
    for s in np.unique(src):
        mask = np.nonzero(src == s)[0]
        import pyarrow as pa

        flat = toks.take(pa.array(mask)).flatten().to_numpy().astype(np.float64)
        local = DDSketch(0.01)
        local.add_batch(flat)
        assert out[s]["count"] == local.count, s
        assert out[s][quantile_label(0.5)] == local.quantile(0.5), s
        assert out[s][quantile_label(0.999)] == local.quantile(0.999), s


def test_native_empty_input(spark):
    df = spark.createDataFrame([], "g string, x double")
    res = ddsketch_quantiles(df, "x", quantiles=[0.5], engine="native")
    assert res["count"] == 0
    assert res["p50"] is None and res["min"] is None
    grouped = ddsketch_quantiles(df, "x", by=["g"], quantiles=[0.5], engine="native")
    assert grouped.count() == 0


def test_native_singleton_group(spark):
    """count==1 returns the raw value exactly (reference singleton law)."""
    df = spark.createDataFrame([("a", 42.0), ("b", 7.0), ("b", 9.0)], "g string, x double")
    rows = {r["g"]: r for r in
            ddsketch_quantiles(df, "x", by=["g"], quantiles=[0.5], engine="native").collect()}
    assert rows["a"]["p50"] == 42.0
    assert rows["a"]["count"] == 1


def test_events_value_testdata(spark, sf001_dir):
    """Driver testdata smoke: p50/p99 of events.value within alpha of exact."""
    df = spark.read.parquet(f"{sf001_dir}/events.parquet")
    res = ddsketch_quantiles(df, "value", quantiles=[0.5, 0.99])
    vals = np.sort(np.asarray([r["value"] for r in df.select("value").collect()]))
    for q in [0.5, 0.99]:
        exact = vals[int(q * (len(vals) - 1))]
        est = res[quantile_label(q)]
        assert abs(est - exact) <= 0.011 * abs(exact) + 1e-9


def test_grouped_state_flush_cap(spark, token_table_path):
    """With a tiny max_open_states cap, grouped builds flush mid-stream and
    emit several partials per key — the merged result must be unchanged."""
    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.spark.agg import build_partials, merge_grouped
    from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator

    df = read_tokens(spark, token_table_path)
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    capped = merge_grouped(
        build_partials(df, agg, by=["source"], max_open_states=1),
        agg, ["source"])
    normal = merge_grouped(build_partials(df, agg, by=["source"]), agg, ["source"])
    a = {r["source"]: r for r in capped.collect()}
    b = {r["source"]: r for r in normal.collect()}
    assert a.keys() == b.keys()
    for s in a:
        assert a[s]["count"] == b[s]["count"], s
        for q in QS:
            assert a[s][quantile_label(q)] == b[s][quantile_label(q)], (s, q)


def test_grouped_vectorized_matches_state_path(spark, token_table_path):
    """The per-partition vectorized assembly must match the per-group
    applyInPandas path (keep_state=True) bit-for-bit on quantiles,
    including mixed-sign values and tiny max_bins (collapse emulation)."""
    from ddsketchy_spark.data.synth import read_tokens

    df = read_tokens(spark, token_table_path).withColumn(
        "v", F.col("n_tok") - 650.0)  # mixed sign + zero-ish region
    for mb in (4096, 8):
        fast = {r["source"]: r for r in ddsketch_quantiles(
            df, "v", by=["source"], max_bins=mb, quantiles=QS).collect()}
        slow = {r["source"]: r for r in ddsketch_quantiles(
            df, "v", by=["source"], max_bins=mb, quantiles=QS,
            keep_state=True).collect()}
        assert fast.keys() == slow.keys()
        for s in fast:
            assert fast[s]["count"] == slow[s]["count"], (mb, s)
            for q in QS:
                assert fast[s][quantile_label(q)] == slow[s][quantile_label(q)], (mb, s, q)
            assert fast[s]["min"] == slow[s]["min"], (mb, s)
            assert fast[s]["max"] == slow[s]["max"], (mb, s)
            assert fast[s]["mean"] == pytest.approx(slow[s]["mean"], rel=1e-12)


def test_grouped_vectorized_high_cardinality(spark):
    """Sanity at 10k group keys: counts exact, quantiles within alpha."""
    df = (spark.range(200_000)
          .withColumn("k", (F.col("id") % 10_000).cast("long"))
          .withColumn("v", (F.col("id") % 97).cast("double") + 1.0)
          .select("k", "v"))
    out = ddsketch_quantiles(df, "v", by=["k"], quantiles=(0.5,))
    rows = out.collect()
    assert len(rows) == 10_000
    assert all(r["count"] == 20 for r in rows)
    for r in rows[:50]:
        assert r["min"] >= 1.0 * (1 - 0.01) and r["max"] <= 97.0 * (1 + 0.01)


def test_grouped_vectorized_nan_key(spark):
    """A NaN group key must form ONE output row (Spark groupBy normalizes
    NaN; the Python-side final grouping must match)."""
    rows = ([(float("nan"), float(i)) for i in range(40)]
            + [(1.0, float(i)) for i in range(10)])
    df = spark.createDataFrame(rows, "k double, v double")
    out = ddsketch_quantiles(df, "v", by=["k"], quantiles=(0.5,))
    got = out.collect()
    assert len(got) == 2
    by_count = {r["count"]: r for r in got}
    assert 40 in by_count and 10 in by_count


def test_group_walk_fuzz_vs_ddsketch():
    """Randomized equivalence: the vectorized _group_walk must match
    DDSketch.quantile bit-for-bit on arbitrary bucket-row inputs,
    including mixed signs, zero-region mass, and tiny max_bins."""
    import numpy as np

    from ddsketchy_spark.core.ddsketch import DDSketch
    from ddsketchy_spark.core.mapping import LogMapping
    from ddsketchy_spark.spark.ddsketch_agg import (
        _group_walk,
        sketch_from_key_counts,
    )

    rng = np.random.default_rng(424242)
    m = LogMapping(0.01)
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    for trial in range(200):
        n = int(rng.integers(1, 60))
        regions = rng.choice([-1, 0, 1], size=n)
        keys = np.where(regions == 0, 0, rng.integers(-300, 300, size=n))
        # dedupe (region, key) like the native groupBy output
        _, idx = np.unique(regions * 100_000 + keys, return_index=True)
        regions, keys = regions[idx], keys[idx]
        counts = rng.integers(1, 50, size=len(keys))
        vals = np.where(regions == 0, 0.0,
                        np.sign(regions) * np.exp(keys / m.inv_ln_gamma))
        max_bins = int(rng.choice([1, 4, 4096]))
        sk = sketch_from_key_counts(regions, keys, counts, vals * counts,
                                    vals, vals, 0.01, max_bins)
        walked = _group_walk(m, regions.astype(np.int64), keys.astype(np.int64),
                             counts.astype(np.int64), vals.astype(np.float64),
                             qs, max_bins)
        for q, got in zip(qs, walked):
            assert got == sk.quantile(q), (trial, q, max_bins)
