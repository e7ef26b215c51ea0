"""Direct port of the reference's Python-binding test suite
(`/root/reference/tests/test_python_bindings.py`, 198 lines) plus the
zero-bucket / subnormal suites from `/root/reference/tests/min_indexable_value.rs`.
Same assertions, same semantics; our pure-Python DDSketch must behave like
the PyO3 bindings."""

import math
import sys

import numpy as np
import pytest

from ddsketchy_spark import DDSketch


# -- construction / defaults (ref :6-23) --------------------------------------


def test_default_alpha():
    assert DDSketch().alpha == pytest.approx(0.01)
    assert DDSketch(0.05).alpha == pytest.approx(0.05)


def test_builder_pattern():
    sk = DDSketch.builder(0.02).max_bins(512).build()
    assert sk.alpha == pytest.approx(0.02)
    assert sk.max_bins == 512
    sk2 = DDSketch.with_max_bins(0.01, 1024)
    assert sk2.max_bins == 1024


def test_invalid_construction():
    for bad in (0.0, 1.0, -0.5, float("nan")):
        with pytest.raises(ValueError):
            DDSketch(bad)
    with pytest.raises(ValueError):
        DDSketch(0.01, max_bins=0)


# -- add / add_batch (ref :25-46) ---------------------------------------------


def test_add_and_len():
    sk = DDSketch()
    assert len(sk) == 0
    sk.add(1.5)
    sk.add(2.5)
    assert len(sk) == 2 and sk.count == 2


def test_add_batch_iterables():
    sk = DDSketch()
    sk.add_batch([1.0, 2.0, 3.0])
    sk.add_batch(range(4, 7))
    sk.add_batch(np.array([7.0, 8.0]))
    assert sk.count == 8
    sk.extend([9.0])
    assert sk.count == 9


# -- quantiles on 1..1000 (ref :48-86) ----------------------------------------


def test_quantiles_linear_1000():
    sk = DDSketch.from_values(float(i) for i in range(1, 1001))
    for q in (0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0):
        exact = float(int(q * 999) + 1)
        assert abs(sk.quantile(q) - exact) / exact <= 0.011, q


# -- min/max incl. negatives (ref :88-99) -------------------------------------


def test_min_max_negatives():
    sk = DDSketch.from_values([-5.0, -1.0, 3.0, 10.0])
    assert sk.min == pytest.approx(-5.0, rel=0.011)
    assert sk.max == pytest.approx(10.0, rel=0.011)
    assert sk.raw_min == -5.0 and sk.raw_max == 10.0


# -- merge + mismatch (ref :102-126) ------------------------------------------


def test_merge_and_mismatch():
    a = DDSketch.from_values([1.0, 2.0])
    b = DDSketch.from_values([3.0, 4.0])
    a.merge(b)
    assert a.count == 4
    assert b.count == 2  # other unchanged
    with pytest.raises(ValueError):
        a.merge(DDSketch(0.05))


# -- clear / len / repr / empty (ref :129-178) --------------------------------


def test_clear_repr_empty():
    sk = DDSketch.from_values([1.0, 2.0, 3.0])
    assert "count=3" in repr(sk)
    sk.clear()
    assert sk.is_empty() and sk.count == 0
    assert sk.quantile(0.5) == 0.0
    assert sk.mean == 0.0
    assert str(sk).startswith("DDSketch(")


def test_percentiles_tuple():
    sk = DDSketch.from_values(float(i) for i in range(1, 101))
    p50, p90, p95, p99 = sk.percentiles()
    assert p50 == sk.quantile(0.5)
    assert p99 == sk.quantile(0.99)
    assert DDSketch().percentiles() is None


# -- 10k relative accuracy (ref :181-194) -------------------------------------


def test_10k_relative_accuracy():
    vals = [float(i) for i in range(1, 10001)]
    sk = DDSketch.from_values(vals)
    for q in (0.5, 0.9, 0.95, 0.99):
        exact = vals[int(q * (len(vals) - 1))]
        assert abs(sk.quantile(q) - exact) / exact <= 0.01, q


# -- min_indexable_value suites (min_indexable_value.rs) ----------------------


def test_subnormals_to_zero_bucket():
    sk = DDSketch(0.01)
    sub = sys.float_info.min / 4  # subnormal
    sk.add_batch([sub, -sub, 5e-324, 0.0, -0.0])
    assert sk.get_zero_count() == 5
    assert sk.positive_store_count() == 0
    assert sk.negative_store_count() == 0
    assert sk.quantile(0.5) == 0.0


def test_boundary_strictness():
    """Exactly min_indexable_value -> positive store; one ulp below -> zero."""
    sk = DDSketch(0.01)
    miv = sk.min_possible()
    below = np.nextafter(miv, 0.0)
    sk.add(miv)
    sk.add(below)
    assert sk.positive_store_count() == 1
    assert sk.get_zero_count() == 1


def test_wide_range_key_monotonicity():
    sk = DDSketch(0.01)
    vals = [10.0**e for e in range(-300, 301, 10)]
    keys = [sk.key(v) for v in vals]
    assert keys == sorted(keys)
    assert all(keys[i] < keys[i + 1] for i in range(len(keys) - 1))


def test_quantile_monotonicity():
    rng = np.random.default_rng(1337)
    sk = DDSketch.from_values(rng.lognormal(0, 3, 20000))
    qs = [i / 100 for i in range(101)]
    ests = [sk.quantile(q) for q in qs]
    assert all(ests[i] <= ests[i + 1] + 1e-12 for i in range(100))


def test_zero_vs_tiny_distinction():
    sk = DDSketch(0.01)
    sk.add_batch([0.0] * 3 + [1e-310] * 2 + [1.0] * 5)
    assert sk.get_zero_count() == 5  # zeros + subnormals
    assert sk.positive_store_count() == 5
    assert sk.count == 10
