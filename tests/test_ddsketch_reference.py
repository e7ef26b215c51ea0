"""Reference-parity tests for the core DDSketch.

Ports the reference's oracles (golden DataDog-Go floats, exact sorted-data
quantile bounds, zero-bucket boundary census, merge laws, serde round-trip):
  /root/reference/src/ddsketchy_test.rs
  /root/reference/src/datadog_reference_tests.rs
  /root/reference/tests/min_indexable_value.rs
  /root/reference/tests/error_bounds_validation.rs
  /root/reference/tests/test_python_bindings.py
  /root/reference/src/serde_tests.rs
"""

import math

import numpy as np
import pytest

from ddsketchy_spark import DDSketch

TEST_QUANTILES = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1.0]
TEST_SIZES = [3, 5, 10, 21, 100, 1000]
ALPHA = 0.01


def exact_bounds(sorted_vals, q):
    """Lower/upper exact quantiles at rank floor/ceil(q*(n-1)), matching the
    reference's Dataset oracle (/root/reference/src/ddsketchy_test.rs:57-73)."""
    n = len(sorted_vals)
    r = q * (n - 1)
    return sorted_vals[math.floor(r)], sorted_vals[math.ceil(r)]


def assert_quantiles_within_alpha(values, alpha=ALPHA, quantiles=TEST_QUANTILES):
    sk = DDSketch.from_values(values, alpha=alpha)
    sv = sorted(values)
    for q in quantiles:
        lo, hi = exact_bounds(sv, q)
        est = sk.quantile(q)
        lo_bound = (1 - alpha) * lo if lo >= 0 else (1 + alpha) * lo
        hi_bound = (1 + alpha) * hi if hi >= 0 else (1 - alpha) * hi
        assert lo_bound - 1e-12 <= est <= hi_bound + 1e-12, (
            f"q={q}: est {est} outside [{lo_bound}, {hi_bound}] (exact [{lo},{hi}])"
        )


# -- golden DataDog-Go floats -------------------------------------------------


def test_golden_small_set():
    sk = DDSketch.from_values([1.0, 2.0, 3.0, 4.0, 5.0], alpha=0.01)
    assert sk.quantile(0.5) == pytest.approx(2.9742334235, rel=1e-10)
    assert sk.quantile(0.9) == pytest.approx(4.0148353330, rel=1e-10)


def test_golden_reconstruction_table():
    """value(key(x)) is within alpha of x, and within 2% of the Go golden
    reconstruction (the reference's own tolerance,
    /root/reference/src/ddsketchy_test.rs:412-441)."""
    sk = DDSketch(0.01)
    table = {
        1.0: 1.0100000000,
        42.0: 41.6822066330,
        1000.0: 1002.4280085221,
        1000000.0: 994912.7844253893,
        1234.0: 1224.3764974385,
    }
    for x, go_val in table.items():
        got = sk.value(sk.key(x))
        assert abs(got - x) / x <= 0.01 + 1e-12, f"value(key({x}))={got} not within alpha"
        assert abs(got - go_val) / go_val < 0.02, f"value(key({x}))={got} vs Go {go_val}"
    # the bucket-index round-trip law: key(value(k)) == k
    for k in [-100, -1, 0, 1, 5, 187, 1000, 4000]:
        assert sk.key(sk.value(k)) == k


def test_golden_singleton_behavior():
    """quantile on a singleton returns the RAW value (count==1 special case)."""
    for x in [1.0, 42.0, 1000.0, 1e6, 1234.0]:
        sk = DDSketch(0.01)
        sk.add(x)
        assert sk.quantile(0.5) == x
        assert sk.quantile(0.0) == x
        assert sk.quantile(1.0) == x


def test_golden_near_zero():
    sk = DDSketch(0.01)
    sk.add(1e-10)
    sk.add(-1e-10)
    assert abs(sk.quantile(0.5) - (-9.9504552879e-11)) < 1e-20
    sk2 = DDSketch(0.01)
    sk2.add(1e-8)
    assert sk2.quantile(0.5) != 0.0


# -- construction / validation ------------------------------------------------


def test_invalid_alpha():
    for a in [0.0, 1.0, -1.0, 2.0, float("nan"), float("inf")]:
        with pytest.raises(ValueError):
            DDSketch(a)


def test_invalid_quantile():
    sk = DDSketch(0.01)
    sk.add(1.0)
    for q in [-0.1, 1.1, float("nan")]:
        with pytest.raises(ValueError):
            sk.quantile(q)
        with pytest.raises(ValueError):
            sk.quantile_opt(q)


def test_empty_sketch():
    sk = DDSketch(0.01)
    assert sk.count == 0
    assert len(sk) == 0
    assert sk.is_empty()
    assert sk.quantile(0.5) == 0.0
    assert sk.quantile_opt(0.5) is None
    assert sk.min == math.inf
    assert sk.max == -math.inf
    assert sk.mean == 0.0
    assert sk.sum == 0.0
    assert sk.percentiles() is None


def test_alpha_roundtrip():
    for a in [0.1, 0.05, 0.02, 0.01, 0.005, 0.001]:
        assert DDSketch(a).alpha == pytest.approx(a, rel=1e-12)


# -- edge semantics -----------------------------------------------------------


def test_nonfinite_ignored():
    sk = DDSketch(0.01)
    sk.add_batch([1.0, float("nan"), 2.0, float("inf"), 3.0, float("-inf")])
    assert sk.count == 3
    assert sk.sum == 6.0
    sk2 = DDSketch(0.01)
    for v in [1.0, float("nan"), 2.0, float("inf"), 3.0, float("-inf")]:
        sk2.add(v)
    assert sk2.count == 3
    assert sk2.sum == 6.0


def test_zero_bucket_boundary_census():
    """Strict `<` boundary: 2 below / 3 at-or-above min_indexable
    (/root/reference/tests/min_indexable_value.rs:22-53)."""
    sk = DDSketch(0.01)
    miv = sk.min_possible()
    vals = [0.0, miv / 2, miv, miv * 2, miv * 10]
    sk.add_batch(vals)
    assert sk.get_zero_count() == 2
    assert sk.positive_store_count() == 3
    assert sk.count == 5


def test_zero_and_negative():
    sk = DDSketch.from_values([-10.0, -1.0, 0.0, 0.0, 1.0, 10.0], alpha=0.01)
    assert sk.count == 6
    assert sk.get_zero_count() == 2
    assert sk.negative_store_count() == 2
    assert sk.positive_store_count() == 2
    # ranks 0..5 -> neg, neg, zero, zero, pos, pos
    assert sk.quantile(0.5) == 0.0  # rank 2 -> zero region
    assert sk.quantile(0.0) == pytest.approx(-10.0, rel=0.011)
    assert sk.quantile(1.0) == pytest.approx(10.0, rel=0.011)


def test_key_symmetry():
    sk = DDSketch(0.01)
    for v in [0.5, 1.0, 3.7, 42.0, 1e6, 1e-6]:
        assert sk.key(v) == sk.key(-v)


def test_batch_equals_sequential():
    rng = np.random.default_rng(1337)
    vals = rng.exponential(1.0, 5000)
    a = DDSketch(0.01)
    a.add_batch(vals)
    b = DDSketch(0.01)
    for v in vals:
        b.add(v)
    assert a.count == b.count
    assert np.array_equal(*_aligned(a, b))
    for q in TEST_QUANTILES:
        assert a.quantile(q) == b.quantile(q)


def _aligned(a, b):
    ka, ca = a.positive_store.nonzero_items()
    kb, cb = b.positive_store.nonzero_items()
    assert np.array_equal(ka, kb)
    return ca, cb


# -- statistical bounds -------------------------------------------------------


def test_constant_distribution():
    for n in TEST_SIZES:
        assert_quantiles_within_alpha([42.0] * n)


def test_linear_distribution():
    assert_quantiles_within_alpha([float(i) for i in range(1000)])


def test_linear_negated():
    assert_quantiles_within_alpha([-float(i) for i in range(1000)])


def test_normal_distribution():
    rng = np.random.default_rng(1337)
    assert_quantiles_within_alpha(rng.normal(100.0, 15.0, 2000))


def test_exponential_distribution():
    rng = np.random.default_rng(1337)
    assert_quantiles_within_alpha(rng.exponential(0.5, 2000))


def test_pareto_distribution():
    rng = np.random.default_rng(1337)
    assert_quantiles_within_alpha(rng.pareto(1.0, 10000) + 1.0, alpha=0.05)


def test_alpha_sweep_error_bounds():
    rng = np.random.default_rng(1337)
    vals = rng.exponential(1.0, 10000)
    sv = sorted(vals)
    for alpha in [0.1, 0.05, 0.02, 0.01, 0.005]:
        sk = DDSketch.from_values(vals, alpha=alpha)
        for q in [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999]:
            lo, hi = exact_bounds(sv, q)
            est = sk.quantile(q)
            assert (1 - alpha) * lo - 1e-12 <= est <= (1 + alpha) * hi + 1e-12


def test_wide_magnitude_range():
    vals = [10.0**e for e in range(-10, 11)]
    assert_quantiles_within_alpha(vals)


# -- merge laws ---------------------------------------------------------------


def test_merge_halves_equals_whole():
    a = DDSketch.from_values(range(1, 51), alpha=0.01)
    b = DDSketch.from_values(range(51, 101), alpha=0.01)
    whole = DDSketch.from_values(range(1, 101), alpha=0.01)
    a.merge(b)
    assert a.count == whole.count
    for q in TEST_QUANTILES:
        assert a.quantile(q) == whole.quantile(q)


def test_merge_alpha_mismatch():
    a = DDSketch(0.01)
    a.add(1.0)
    b = DDSketch(0.02)
    b.add(2.0)
    with pytest.raises(ValueError):
        a.merge(b)


def test_merge_empty_is_noop():
    a = DDSketch.from_values([1.0, 2.0, 3.0], alpha=0.01)
    before = a.to_bytes()
    a.merge(DDSketch(0.01))
    assert a.to_bytes() == before
    # empty.merge(nonempty) == copy
    e = DDSketch(0.01)
    e.merge(DDSketch.from_values([1.0, 2.0, 3.0], alpha=0.01))
    assert e.count == 3


def test_merge_order_independence():
    """Merging partition sketches in any order gives bit-identical estimates."""
    rng = np.random.default_rng(42)
    parts = [rng.lognormal(1.0, 1.0, 2000) for _ in range(5)]
    sketches = [DDSketch.from_values(p, alpha=0.01) for p in parts]

    def merged(order):
        acc = DDSketch(0.01)
        for i in order:
            acc.merge(DDSketch.from_bytes(sketches[i].to_bytes()))
        return acc

    base = merged(range(5))
    for order in [[4, 3, 2, 1, 0], [2, 0, 4, 1, 3], [1, 3, 0, 4, 2]]:
        other = merged(order)
        for q in TEST_QUANTILES:
            assert base.quantile(q) == other.quantile(q), f"order {order} q={q}"
        assert base.count == other.count


def test_merge_associativity_bitwise():
    rng = np.random.default_rng(7)
    xs = [DDSketch.from_values(rng.normal(50, 10, 1000), alpha=0.01) for _ in range(3)]

    def clone(s):
        return DDSketch.from_bytes(s.to_bytes())

    left = clone(xs[0]).merge(clone(xs[1])).merge(clone(xs[2]))
    right = clone(xs[0]).merge(clone(xs[1]).merge(clone(xs[2])))
    ka, ca = left.positive_store.nonzero_items()
    kb, cb = right.positive_store.nonzero_items()
    assert np.array_equal(ka, kb) and np.array_equal(ca, cb)
    for q in TEST_QUANTILES:
        assert left.quantile(q) == right.quantile(q)


def test_merge_five_disjoint_ranges():
    parts = [
        [float(v) for v in range(lo, lo + 20000)]
        for lo in [1, 20001, 40001, 60001, 80001]
    ]
    acc = DDSketch(0.01)
    for p in parts:
        acc.merge(DDSketch.from_values(p, alpha=0.01))
    whole = DDSketch.from_values([float(v) for v in range(1, 100001)], alpha=0.01)
    assert acc.count == whole.count == 100000
    for q in TEST_QUANTILES:
        assert acc.quantile(q) == whole.quantile(q)


# -- collapsing store ---------------------------------------------------------


def test_collapse_bounded_memory():
    """<= max_bins bins per store over 20 orders of magnitude
    (/root/reference/src/datadog_reference_tests.rs:1902-1949)."""
    rng = np.random.default_rng(1337)
    exponents = rng.uniform(-10, 10, 50000)
    vals = 10.0**exponents
    sk = DDSketch.from_values(vals, alpha=0.01, max_bins=512)
    assert sk.positive_store.length <= 512
    assert sk.count == 50000
    # High quantiles keep accuracy even when low bins collapsed
    sv = sorted(vals)
    for q in [0.9, 0.95, 0.99, 0.999, 1.0]:
        lo, hi = exact_bounds(sv, q)
        est = sk.quantile(q)
        assert (1 - 0.011) * lo <= est <= (1 + 0.011) * hi


def test_collapse_merge_parity_tiny_bins():
    """Merging collapsed stores matches building one collapsed store."""
    vals = [2.0**i for i in range(200)]
    whole = DDSketch.from_values(vals, alpha=0.05, max_bins=64)
    a = DDSketch.from_values(vals[:100], alpha=0.05, max_bins=64)
    b = DDSketch.from_values(vals[100:], alpha=0.05, max_bins=64)
    a.merge(b)
    assert a.count == whole.count
    # top quantiles must agree exactly (high keys preserved)
    for q in [0.9, 0.99, 1.0]:
        assert a.quantile(q) == whole.quantile(q)


def test_quadratic_collapse_accuracy():
    vals = [float(i * i) for i in range(1, 1001)]
    sk = DDSketch.from_values(vals, alpha=0.05, max_bins=128)
    sv = sorted(vals)
    for q in [0.5, 0.9, 0.99, 1.0]:
        lo, hi = exact_bounds(sv, q)
        est = sk.quantile(q)
        assert (1 - 0.051) * lo <= est <= (1 + 0.051) * hi


# -- serde --------------------------------------------------------------------


def test_binary_roundtrip():
    rng = np.random.default_rng(99)
    sk = DDSketch.from_values(rng.lognormal(0, 2, 10000), alpha=0.01)
    sk.add_batch([-5.0, 0.0, 1e-300])
    back = DDSketch.from_bytes(sk.to_bytes())
    assert back == sk
    for q in TEST_QUANTILES:
        assert back.quantile(q) == sk.quantile(q)


def test_json_roundtrip_and_shape():
    import json as _json

    sk = DDSketch(0.01)
    d = _json.loads(sk.to_json())
    assert d["min"] is None and d["max"] is None  # empty -> null min/max
    sk.add_batch([1.0, -2.0, 0.0])
    back = DDSketch.from_json(sk.to_json())
    assert back == sk


def test_json_deny_unknown_fields():
    import json as _json

    sk = DDSketch(0.01)
    sk.add(1.0)
    d = _json.loads(sk.to_json())
    d["bogus_field"] = 1
    with pytest.raises(ValueError, match="unknown fields"):
        DDSketch.from_json(_json.dumps(d))


def test_serialize_continue_adding():
    sk = DDSketch.from_values(range(1, 5001), alpha=0.01)
    back = DDSketch.from_bytes(sk.to_bytes())
    sk.add_batch(range(5001, 10001))
    back.add_batch(range(5001, 10001))
    for q in TEST_QUANTILES:
        assert sk.quantile(q) == back.quantile(q)


# -- API surface --------------------------------------------------------------


def test_python_binding_surface():
    sk = DDSketch()
    assert sk.alpha == pytest.approx(0.01)
    sk.add(1.0)
    sk.add_batch([2.0, 3.0])
    assert sk.count == 3 and len(sk) == 3
    assert sk.sum == 6.0
    assert sk.mean == 2.0
    assert not sk.is_empty()
    p = sk.percentiles()
    assert len(p) == 4
    r = repr(sk)
    assert r.startswith("DDSketch(count=3")
    sk.clear()
    assert sk.is_empty() and sk.alpha == pytest.approx(0.01)


def test_accuracy_10k_linear():
    vals = [float(i) for i in range(1, 10001)]
    sk = DDSketch.from_values(vals, alpha=0.01)
    for q in [0.5, 0.9, 0.95, 0.99]:
        exact = vals[int(q * (len(vals) - 1))]
        assert abs(sk.quantile(q) - exact) / exact <= 0.01


def test_add_batch_integer_fast_path_parity():
    """r6: the narrow-int bincount fast path is byte-identical to the
    float batch path (keys, counts, sum, min/max, zero bucket)."""
    import numpy as np

    from ddsketchy_spark.core.ddsketch import DDSketch

    rng = np.random.default_rng(11)
    cases = [
        rng.integers(-1000, 50000, size=30000).astype(np.int32),
        rng.zipf(1.5, size=50000).clip(1, 40000).astype(np.int32),
        np.zeros(100, dtype=np.int32),
        rng.integers(-3, 3, size=500).astype(np.int16),
        np.array([], dtype=np.int32),
        # span wider than _INT_FAST_SPAN -> generic fallback
        rng.integers(-2**30, 2**30, size=5000).astype(np.int32),
    ]
    for arr in cases:
        a = DDSketch(0.01)
        a.add_batch(arr)
        b = DDSketch(0.01)
        b.add_batch(arr.astype(np.float64))
        assert a.to_bytes() == b.to_bytes()
        assert a._sum == b._sum and a.count == b.count
