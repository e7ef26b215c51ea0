"""Core tests for the companion sketches (HLL, Count-Min, Bloom, t-digest,
KLL): accuracy vs exact oracles, merge laws (order independence), codec
round-trips. Published-paper semantics; see each module's docstring."""

import math

import numpy as np
import pytest

from ddsketchy_spark.core.bloom import BloomFilter
from ddsketchy_spark.core.cms import CountMinSketch
from ddsketchy_spark.core.hll import HyperLogLog
from ddsketchy_spark.core.kll import KLLSketch
from ddsketchy_spark.core.tdigest import TDigest


# -- HLL ----------------------------------------------------------------------


def test_hll_accuracy():
    rng = np.random.default_rng(1337)
    for true_n in [100, 1000, 50_000, 500_000]:
        h = HyperLogLog(p=14)
        keys = rng.choice(true_n * 10, size=true_n, replace=False)
        h.add_batch(keys)
        # add duplicates — idempotent
        h.add_batch(keys[: true_n // 2])
        est = h.estimate()
        rel = abs(est - true_n) / true_n
        assert rel < 0.04, (true_n, est, rel)  # ~3 sigma at p=14


def test_hll_merge_equals_whole_bitwise():
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 1 << 40, size=100_000)
    whole = HyperLogLog(p=12)
    whole.add_batch(keys)
    parts = np.array_split(keys, 7)
    merged = HyperLogLog(p=12)
    for p in reversed(parts):
        other = HyperLogLog(p=12)
        other.add_batch(p)
        merged.merge(HyperLogLog.from_bytes(other.to_bytes()))
    assert merged == whole
    assert merged.estimate() == whole.estimate()


def test_hll_string_keys():
    h = HyperLogLog(p=12)
    h.add_batch(np.asarray([f"user-{i}" for i in range(10_000)], dtype=object))
    assert abs(h.estimate() - 10_000) / 10_000 < 0.05


def test_hll_config_mismatch():
    with pytest.raises(ValueError):
        HyperLogLog(p=12).merge(HyperLogLog(p=13))
    with pytest.raises(ValueError):
        HyperLogLog(p=3)


# -- Count-Min ----------------------------------------------------------------


def test_cms_never_underestimates_and_eps_bound():
    rng = np.random.default_rng(1337)
    items = rng.zipf(1.5, size=200_000)
    items = items[items < 100_000]
    cm = CountMinSketch(depth=5, width=1 << 14)
    cm.add_batch(items)
    uniq, true_counts = np.unique(items, return_counts=True)
    est = cm.query_batch(uniq)
    assert (est >= true_counts).all()  # no underestimates, ever
    eps = math.e / (1 << 14)
    overshoot = est - true_counts
    # eps*N bound holds with prob 1-delta per query; allow a few outliers
    frac_bad = float((overshoot > eps * cm.total).mean())
    assert frac_bad < 0.01, frac_bad


def test_cms_merge_equals_whole_bitwise():
    rng = np.random.default_rng(3)
    items = rng.zipf(1.3, size=50_000)
    whole = CountMinSketch(depth=4, width=1 << 12)
    whole.add_batch(items)
    merged = CountMinSketch(depth=4, width=1 << 12)
    for p in reversed(np.array_split(items, 5)):
        part = CountMinSketch(depth=4, width=1 << 12)
        part.add_batch(p)
        merged.merge(CountMinSketch.from_bytes(part.to_bytes()))
    assert merged == whole


def test_cms_weighted_add():
    cm = CountMinSketch(depth=4, width=1 << 10)
    cm.add_batch([7, 8], counts=np.asarray([100, 1]))
    assert cm.query_batch([7])[0] >= 100
    assert cm.total == 101


# -- Bloom --------------------------------------------------------------------


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(1337)
    present = rng.choice(10**9, size=50_000, replace=False)
    bf = BloomFilter.for_capacity(50_000, fpr=0.01)
    bf.add_batch(present)
    assert bf.contains_batch(present).all()  # the hard guarantee


def test_bloom_fpr_near_configured():
    rng = np.random.default_rng(42)
    present = rng.choice(10**9, size=20_000, replace=False)
    absent = present + 10**10
    bf = BloomFilter.for_capacity(20_000, fpr=0.01)
    bf.add_batch(present)
    fpr = float(bf.contains_batch(absent).mean())
    assert fpr < 0.03, fpr


def test_bloom_merge_equals_whole_bitwise():
    rng = np.random.default_rng(9)
    keys = rng.integers(0, 1 << 50, size=30_000)
    whole = BloomFilter(1 << 18, 5)
    whole.add_batch(keys)
    merged = BloomFilter(1 << 18, 5)
    for p in reversed(np.array_split(keys, 4)):
        part = BloomFilter(1 << 18, 5)
        part.add_batch(p)
        merged.merge(BloomFilter.from_bytes(part.to_bytes()))
    assert merged == whole


def test_bloom_string_keys():
    docs = np.asarray([f"doc-{i:012d}" for i in range(5000)], dtype=object)
    bf = BloomFilter.for_capacity(5000, 0.01)
    bf.add_batch(docs)
    assert bf.contains_batch(docs).all()
    other = np.asarray([f"doc-x-{i}" for i in range(5000)], dtype=object)
    assert float(bf.contains_batch(other).mean()) < 0.05


# -- t-digest -----------------------------------------------------------------


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999]


def exact_q(sorted_vals, q):
    return sorted_vals[int(q * (len(sorted_vals) - 1))]


def test_tdigest_accuracy():
    rng = np.random.default_rng(1337)
    vals = rng.lognormal(0, 2, 100_000)
    td = TDigest(delta=200)
    for chunk in np.array_split(vals, 10):
        td.add_batch(chunk)
    sv = np.sort(vals)
    assert td.count == 100_000
    for q in QS:
        est = td.quantile(q)
        exact = exact_q(sv, q)
        # rank-space error: the estimate's true rank is near q
        r = np.searchsorted(sv, est) / len(sv)
        assert abs(r - q) < 0.01, (q, est, exact, r)
    assert td.quantile(0.0) == sv[0]
    assert td.quantile(1.0) == sv[-1]


def test_tdigest_bounded_size():
    rng = np.random.default_rng(5)
    td = TDigest(delta=100)
    for _ in range(20):
        td.add_batch(rng.normal(0, 1, 50_000))
    assert len(td.means) < 300  # ~2*delta bound


def test_tdigest_nway_merge_order_independent():
    rng = np.random.default_rng(11)
    parts = [rng.exponential(1.0, 20_000) for _ in range(6)]
    digests = [TDigest(200) for _ in parts]
    for d, p in zip(digests, parts):
        d.add_batch(p)
    base = TDigest.merge_all(digests)
    for perm in ([5, 4, 3, 2, 1, 0], [2, 0, 5, 1, 4, 3]):
        other = TDigest.merge_all([TDigest.from_bytes(digests[i].to_bytes()) for i in perm])
        assert other == base  # bit-identical state under permutation
    sv = np.sort(np.concatenate(parts))
    for q in QS:
        r = np.searchsorted(sv, base.quantile(q)) / len(sv)
        assert abs(r - q) < 0.015, q


def test_tdigest_codec_roundtrip():
    rng = np.random.default_rng(2)
    td = TDigest(150)
    td.add_batch(rng.normal(100, 20, 10_000))
    back = TDigest.from_bytes(td.to_bytes())
    assert back == td
    assert back.quantile(0.5) == td.quantile(0.5)


# -- KLL ----------------------------------------------------------------------


def test_kll_accuracy():
    rng = np.random.default_rng(1337)
    vals = rng.normal(50, 10, 100_000)
    sk = KLLSketch(k=200)
    for chunk in np.array_split(vals, 16):
        sk.add_batch(chunk)
    assert sk.n == 100_000
    sv = np.sort(vals)
    for q in QS:
        est = sk.quantile(q)
        r = np.searchsorted(sv, est) / len(sv)
        assert abs(r - q) < 0.015, (q, est, r)
    assert sk.quantile(0.0) == sv[0]
    assert sk.quantile(1.0) == sv[-1]


def test_kll_bounded_size():
    rng = np.random.default_rng(4)
    sk = KLLSketch(k=200)
    for _ in range(20):
        sk.add_batch(rng.uniform(0, 1, 50_000))
    stored = sum(len(l) for l in sk.levels)
    assert stored < 3 * 200 + 8 * len(sk.levels)


def test_kll_nway_merge_order_independent():
    rng = np.random.default_rng(13)
    parts = [rng.uniform(0, 1000, 30_000) for _ in range(5)]
    sketches = []
    for p in parts:
        s = KLLSketch(k=200)
        s.add_batch(p)
        sketches.append(s)
    base = KLLSketch.merge_all(sketches)
    for perm in ([4, 3, 2, 1, 0], [1, 3, 0, 4, 2]):
        other = KLLSketch.merge_all([KLLSketch.from_bytes(sketches[i].to_bytes()) for i in perm])
        assert other == base
    assert base.n == 150_000
    sv = np.sort(np.concatenate(parts))
    for q in QS:
        r = np.searchsorted(sv, base.quantile(q)) / len(sv)
        assert abs(r - q) < 0.02, q


def test_kll_pairwise_merge_weight_conserved():
    rng = np.random.default_rng(17)
    a = KLLSketch(k=64)
    a.add_batch(rng.uniform(0, 1, 10_001))  # odd sizes stress leftover logic
    b = KLLSketch(k=64)
    b.add_batch(rng.uniform(0, 1, 9_999))
    a.merge(b)
    v, w = a._weighted_items()
    assert int(w.sum()) == a.n == 20_000


def test_kll_rank_query():
    sk = KLLSketch(k=200)
    sk.add_batch(np.arange(10_000, dtype=np.float64))
    assert abs(sk.rank(5000.0) - 0.5) < 0.02


def test_kll_codec_roundtrip():
    rng = np.random.default_rng(8)
    sk = KLLSketch(k=128)
    sk.add_batch(rng.exponential(2.0, 25_000))
    back = KLLSketch.from_bytes(sk.to_bytes())
    assert back == sk
    assert back.quantile(0.9) == sk.quantile(0.9)
