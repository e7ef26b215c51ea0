"""Port of the reference's DataDog Java-suite replication
(/root/reference/src/datadog_reference_tests.rs, 1949 lines): the
21-quantile x 6-alpha validation matrix over the canonical distributions,
extreme-value/subnormal handling, 20-orders-of-magnitude range, mapping
round-trip and monotonicity laws, and the 100k mixed stress case."""

import math

import numpy as np
import pytest

from ddsketchy_spark import DDSketch

# /root/reference/src/datadog_reference_tests.rs:12-18
VALIDATION_QUANTILES = [i / 20 for i in range(21)]  # 0, .05, ..., 1.0
ALPHAS = [1e-1, 5e-2, 2e-2, 1e-2, 5e-3, 1e-3]


def assert_matrix(values, alphas=ALPHAS, tol_pad=1e-12):
    sv = np.sort(np.asarray(values, dtype=np.float64))
    n = len(sv)
    for alpha in alphas:
        sk = DDSketch.from_values(sv, alpha=alpha)
        for q in VALIDATION_QUANTILES:
            r = q * (n - 1)
            lo, hi = sv[math.floor(r)], sv[math.ceil(r)]
            est = sk.quantile(q)
            lo_b = (1 - alpha) * lo if lo >= 0 else (1 + alpha) * lo
            hi_b = (1 + alpha) * hi if hi >= 0 else (1 - alpha) * hi
            assert lo_b - tol_pad <= est <= hi_b + tol_pad, (alpha, q, est, lo, hi)


def test_constant_matrix():
    assert_matrix([42.0] * 100)


def test_linear_matrix():
    assert_matrix([float(i) for i in range(1, 1001)])


def test_exponential_sequence_matrix():
    """Powers of 2: 2^0 .. 2^10 (ref :171-241)."""
    assert_matrix([2.0**i for i in range(11)])


def test_mixed_sign_matrix():
    assert_matrix([-10.0, -1.0, 0.0, 0.0, 1.0, 10.0])
    assert_matrix([0.33, -7.0])
    rng = np.random.default_rng(1337)
    assert_matrix(rng.normal(0.0, 5.0, 2000))  # mixed-sign continuous


def test_negated_fixtures_matrix():
    rng = np.random.default_rng(1337)
    vals = -rng.exponential(2.0, 2000)
    # alpha=1e-3 over ~5 decades exceeds 4096 bins -> the negative store
    # collapses its LOW keys, which for all-negative data are the values
    # closest to zero, i.e. the TOP quantiles — faithful reference
    # behavior (collapse always eats low keys), so the full matrix only
    # holds at alphas that keep the store uncollapsed.
    assert_matrix(vals, alphas=[a for a in ALPHAS if a >= 5e-3])


def test_negated_collapse_sacrifices_top_quantiles_only():
    """The mirror of collapse-low behavior on negative data: bottom
    quantiles (most negative) stay within alpha, count preserved."""
    rng = np.random.default_rng(1337)
    vals = -rng.exponential(2.0, 2000)
    sk = DDSketch.from_values(vals, alpha=0.001)
    assert sk.negative_store.is_collapsed
    assert sk.count == 2000
    sv = np.sort(vals)
    for q in [0.0, 0.05, 0.1, 0.25, 0.5]:
        r = q * (len(sv) - 1)
        lo, hi = sv[math.floor(r)], sv[math.ceil(r)]
        est = sk.quantile(q)
        assert (1 + 0.001) * lo - 1e-12 <= est <= (1 - 0.001) * hi + 1e-12, q


def test_extreme_values_ignored_and_range():
    """+/-1e-15 .. +/-1e15 with specials interleaved (ref :402-551)."""
    vals = []
    for e in range(-15, 16):
        vals.extend([10.0**e, -(10.0**e)])
    sk = DDSketch(0.01)
    sk.add_batch(vals + [float("nan"), float("inf"), float("-inf")])
    assert sk.count == len(vals)
    assert_matrix(vals, alphas=[0.01])


def test_twenty_orders_of_magnitude():
    """Decades 1e-10..1e10 (ref :553-605)."""
    rng = np.random.default_rng(1337)
    vals = 10.0 ** rng.uniform(-10, 10, 20_000)
    sk = DDSketch.from_values(vals, alpha=0.01)
    assert sk.count == 20_000
    assert not sk.positive_store.is_collapsed  # 4096 bins cover ~20 decades at a=.01
    assert_matrix(vals, alphas=[0.01])


def test_mapping_roundtrip_all_alphas():
    """key(value(k)) == k across the key range for every alpha
    (ref :1299-1628)."""
    for alpha in ALPHAS:
        sk = DDSketch(alpha)
        step = max(1, int(1000 * alpha * 50))
        for k in range(-2000, 2001, step):
            assert sk.key(sk.value(k)) == k, (alpha, k)


def test_key_monotonicity_all_alphas():
    rng = np.random.default_rng(7)
    vals = np.sort(rng.lognormal(0, 5, 5000))
    for alpha in [0.1, 0.01, 0.001]:
        sk = DDSketch(alpha)
        keys = [sk.key(float(v)) for v in vals[:: max(1, len(vals) // 500)]]
        assert all(a <= b for a, b in zip(keys, keys[1:])), alpha


def test_stress_100k_mixed(tol=1e-12):
    """100k mixed values incl. negatives and zeros (ref :1630-1827)."""
    rng = np.random.default_rng(1337)
    vals = np.concatenate([
        rng.lognormal(2, 1.5, 40_000),
        -rng.lognormal(1, 1.0, 30_000),
        np.zeros(10_000),
        rng.uniform(-5, 5, 20_000),
    ])
    rng.shuffle(vals)
    sk = DDSketch.from_values(vals, alpha=0.01)
    assert sk.count == 100_000
    sv = np.sort(vals)
    for q in VALIDATION_QUANTILES:
        r = q * (len(sv) - 1)
        lo, hi = sv[math.floor(r)], sv[math.ceil(r)]
        est = sk.quantile(q)
        lo_b = (1 - 0.01) * lo if lo >= 0 else (1 + 0.01) * lo
        hi_b = (1 + 0.01) * hi if hi >= 0 else (1 - 0.01) * hi
        if abs(hi) < 1e-12 and abs(lo) < 1e-12:
            assert est == 0.0
        else:
            assert lo_b - tol <= est <= hi_b + tol, (q, est, lo, hi)


def test_five_way_merge_20k_each():
    """5 x 20k disjoint merge stress (ref :1829-1900)."""
    rng = np.random.default_rng(42)
    parts = [rng.normal(100 * (i + 1), 10, 20_000) for i in range(5)]
    acc = DDSketch(0.01)
    for p in parts:
        acc.merge(DDSketch.from_values(p, alpha=0.01))
    whole = DDSketch.from_values(np.concatenate(parts), alpha=0.01)
    assert acc.count == whole.count == 100_000
    for q in VALIDATION_QUANTILES:
        assert acc.quantile(q) == whole.quantile(q), q


def test_bounded_memory_high_diversity():
    """50k values over 20 orders of magnitude with a small bin cap: memory
    bounded, high quantiles stay accurate (ref :1902-1949)."""
    rng = np.random.default_rng(1337)
    vals = 10.0 ** rng.uniform(-10, 10, 50_000)
    sk = DDSketch.from_values(vals, alpha=0.01, max_bins=1024)
    assert sk.positive_store.length <= 1024
    assert sk.count == 50_000
    sv = np.sort(vals)
    for q in [0.8, 0.9, 0.99, 0.999, 1.0]:
        r = q * (len(sv) - 1)
        lo, hi = sv[math.floor(r)], sv[math.ceil(r)]
        est = sk.quantile(q)
        assert (1 - 0.011) * lo <= est <= (1 + 0.011) * hi, q
