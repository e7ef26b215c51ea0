"""Bottom-k samples (KMV-with-payload + Efraimidis-Spirakis weighted):
core laws, merge algebra, serde, and native==blob engine parity on Spark.
"""

import random

import numpy as np
import pytest

from ddsketchy_spark.core.sampling import (
    KMVSample,
    WeightedSample,
    _U_DENOM,
    md5_u52,
)


# ---------------------------------------------------------------------------
# core: KMV uniform distinct sample
# ---------------------------------------------------------------------------


def _brute_kmv(keys, k, seed=0):
    pairs = sorted({(md5_u52(str(x), seed), str(x)) for x in keys})
    return pairs[:k]


def test_kmv_bottom_k_law():
    rng = random.Random(7)
    keys = [f"key_{rng.randrange(500)}" for _ in range(3000)]
    sk = KMVSample(k=32, seed=3)
    for i in range(0, len(keys), 250):
        sk.add_batch(keys[i:i + 250])
    assert sk.entries == _brute_kmv(keys, 32, seed=3)


def test_kmv_merge_order_independent():
    rng = random.Random(11)
    keys = [rng.randrange(10_000) for _ in range(5000)]
    bulk = KMVSample(k=64)
    bulk.add_batch(keys)
    chunks = [keys[i::7] for i in range(7)]
    rng.shuffle(chunks)
    parts = []
    for c in chunks:
        p = KMVSample(k=64)
        p.add_batch(c)
        parts.append(p)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.entries == bulk.entries
    # idempotent: merging a copy of itself changes nothing
    again = KMVSample.from_bytes(acc.to_bytes())
    acc.merge(again)
    assert acc.entries == bulk.entries


def test_kmv_exact_below_k_and_estimator():
    sk = KMVSample(k=256)
    sk.add_batch([f"u{i}" for i in range(100)])
    assert sorted(sk.keys()) == sorted(f"u{i}" for i in range(100))
    assert sk.distinct_estimate() == 100.0
    big = KMVSample(k=256)
    big.add_batch([f"item{i}" for i in range(20_000)])
    est = big.distinct_estimate()
    assert abs(est - 20_000) / 20_000 < 0.25  # RSE ~ 1/sqrt(k-1) ~ 6%


def test_kmv_serde_roundtrip_and_guards():
    sk = KMVSample(k=8, seed=5)
    sk.add_batch(["a", "b", "c", None, "b"])
    back = KMVSample.from_bytes(sk.to_bytes())
    assert back.entries == sk.entries
    assert (back.k, back.seed, back.hash_kind) == (8, 5, "md5")
    with pytest.raises(ValueError):
        KMVSample.from_bytes(b"XXXX" + sk.to_bytes()[4:])
    with pytest.raises(ValueError):
        KMVSample(k=0)
    with pytest.raises(TypeError):
        sk.add_batch([1.5])
    with pytest.raises(TypeError):
        sk.add_batch([True])
    other = KMVSample(k=8, seed=6)
    with pytest.raises(ValueError):
        sk.merge(other)
    # spark hash kind: nonzero seed would be silently ignored -> reject
    # (mirrors ThetaSketch); non-integer keys need the md5 kind
    with pytest.raises(ValueError, match="seed=0"):
        KMVSample(k=8, seed=1, hash_kind="spark")
    with pytest.raises(TypeError, match="BIGINT"):
        KMVSample(k=8, hash_kind="spark").add_batch(["not-a-number"])


def test_kmv_spark_hash_kind_matches_xxhash64():
    from ddsketchy_spark.core.hashing import spark_xxhash64

    vals = list(range(50, 250))
    sk = KMVSample(k=16, hash_kind="spark")
    sk.add_batch(vals)
    h = spark_xxhash64(np.asarray(vals, dtype=np.int64))
    want = sorted((int(u), str(v)) for u, v in zip(h, vals))[:16]
    assert sk.entries == want
    # serde preserves unsigned comparison keys (> 2^63 values round-trip)
    back = KMVSample.from_bytes(sk.to_bytes())
    assert back.entries == sk.entries


# ---------------------------------------------------------------------------
# core: weighted (Efraimidis-Spirakis) sample
# ---------------------------------------------------------------------------


def test_weighted_rank_closed_form():
    r = WeightedSample.rank_of("doc9", 4.0, seed=2)
    u = (md5_u52("doc9", 2) + 0.5) / _U_DENOM
    assert r == -np.log(u) / 4.0
    with pytest.raises(ValueError):
        WeightedSample.rank_of("x", 0.0)
    with pytest.raises(ValueError):
        WeightedSample.rank_of("x", float("inf"))


def test_weighted_merge_matches_bulk():
    rng = random.Random(3)
    items = [(f"d{i}", 1.0 + rng.random() * 9) for i in range(4000)]
    bulk = WeightedSample(k=48, seed=1)
    bulk.add_batch([s for s, _ in items], [w for _, w in items])
    parts = []
    for j in range(5):
        p = WeightedSample(k=48, seed=1)
        chunk = items[j::5]
        p.add_batch([s for s, _ in chunk], [w for _, w in chunk])
        parts.append(p)
    rng.shuffle(parts)
    acc = parts[0]
    for p in parts[1:]:
        acc.merge(p)
    assert acc.entries == bulk.entries
    back = WeightedSample.from_bytes(acc.to_bytes())
    assert back.entries == acc.entries


def test_weighted_duplicate_key_keeps_max_weight():
    sk = WeightedSample(k=8)
    sk.add_batch(["a", "a"], [1.0, 5.0])
    assert sk.entries == [(WeightedSample.rank_of("a", 5.0), "a", 5.0)]


def test_weighted_inclusion_tracks_weight():
    """E-S law: P(include) increases with weight. One heavy item vs 99
    light ones, k=10 — across 300 seeds the heavy item must appear far
    more often than any light one would (10% baseline)."""
    keys = [f"i{j}" for j in range(100)]
    weights = [50.0] + [1.0] * 99
    hits = 0
    for seed in range(300):
        sk = WeightedSample(k=10, seed=seed)
        sk.add_batch(keys, weights)
        hits += "i0" in sk.keys()
    # P(i0 in sample) ~ 1 - prod(1 - 50/(50+rest)) >> 0.9 for k=10
    assert hits > 250


# ---------------------------------------------------------------------------
# Spark: native engine == blob aggregator (shared law)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def orders(spark, sf001_dir):
    return spark.read.parquet(f"{sf001_dir}/orders.parquet")


def test_native_matches_blob_global(spark, orders):
    from ddsketchy_spark.spark.sampling import (
        kmv_sample_native,
        kmv_sample_state,
    )

    native = kmv_sample_native(orders, "o_custkey", k=40, seed=9)
    rows = native.collect()
    assert len(rows) == 40
    assert [r["u"] for r in rows] == sorted(r["u"] for r in rows)
    res = kmv_sample_state(orders, "o_custkey", k=40, seed=9)
    assert res["sample"] == [r["key"] for r in rows]
    assert res["n_retained"] == 40


def test_native_matches_blob_grouped(spark, orders):
    from ddsketchy_spark.spark.sampling import (
        kmv_sample_native,
        kmv_sample_state,
    )

    native = kmv_sample_native(
        orders, "o_custkey", by=["o_orderstatus"], k=12, seed=1)
    got = {r["o_orderstatus"]: [] for r in native.collect()}
    for r in sorted(native.collect(), key=lambda r: (r["o_orderstatus"], r["u"])):
        got[r["o_orderstatus"]].append(r["key"])
    blob = kmv_sample_state(
        orders, "o_custkey", by=["o_orderstatus"], k=12, seed=1)
    for row in blob.collect():
        assert list(row["sample"]) == got[row["o_orderstatus"]]


def test_weighted_native_matches_blob(spark, sf001_dir):
    from ddsketchy_spark.spark.sampling import (
        weighted_sample_native,
        weighted_sample_state,
    )

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    native = weighted_sample_native(docs, "doc_id", "n_chars", k=25, seed=4)
    rows = native.collect()
    assert len(rows) == 25
    res = weighted_sample_state(docs, "doc_id", "n_chars", k=25, seed=4)
    assert res["sample"] == [r["key"] for r in rows]

    grouped_native = weighted_sample_native(
        docs, "doc_id", "n_chars", by=["source"], k=6, seed=4)
    want = {}
    for r in sorted(grouped_native.collect(),
                    key=lambda r: (r["source"], r["rank"])):
        want.setdefault(r["source"], []).append(r["key"])
    grouped_blob = weighted_sample_state(
        docs, "doc_id", "n_chars", by=["source"], k=6, seed=4)
    for row in grouped_blob.collect():
        assert list(row["sample"]) == want[row["source"]]


def test_weighted_ignores_nonpositive_and_null(spark):
    from ddsketchy_spark.spark.sampling import (
        weighted_sample_native,
        weighted_sample_state,
    )

    df = spark.createDataFrame(
        [("a", 2.0), ("b", 0.0), ("c", -1.0), ("d", None), (None, 3.0),
         ("e", 1.0), ("f", float("inf")), ("g", float("nan"))],
        "key string, w double")
    # non-finite weights never sample in EITHER engine (inf would pin
    # rank 0 in a naive native filter while the core raises — the r5
    # review parity fix)
    native = weighted_sample_native(df, "key", "w", k=10)
    assert sorted(r["key"] for r in native.collect()) == ["a", "e"]
    res = weighted_sample_state(df, "key", "w", k=10)
    assert sorted(res["sample"]) == ["a", "e"]


def test_kmv_array_column_flattens(spark):
    from ddsketchy_spark.spark.sampling import kmv_sample_state

    df = spark.createDataFrame(
        [([1, 2, 3],), ([2, 4],), (None,)], "toks array<int>")
    res = kmv_sample_state(df, "toks", k=16)
    assert sorted(res["sample"]) == ["1", "2", "3", "4"]
    assert res["n_retained"] == 4
