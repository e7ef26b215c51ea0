"""Property-based tests (hypothesis) for the core DDSketch invariants,
mirroring the reference's property methodology
(/root/reference/src/ddsketchy_test.rs Dataset oracle) over arbitrary
float inputs instead of fixed distributions."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from ddsketchy_spark import DDSketch

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e200, max_value=1e200
)
any_floats = st.floats(allow_nan=True, allow_infinity=True)


@settings(max_examples=80, deadline=None)
@given(st.lists(any_floats, max_size=200))
def test_count_tracks_finite_inputs(vals):
    sk = DDSketch(0.01)
    sk.add_batch(vals)
    finite = [v for v in vals if math.isfinite(v)]
    assert sk.count == len(finite)
    if finite:
        assert sk.raw_min == min(finite)
        assert sk.raw_max == max(finite)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite_floats, min_size=2, max_size=300), st.integers(1, 299))
def test_merge_split_equals_whole(vals, cut):
    cut = cut % len(vals) or 1
    whole = DDSketch.from_values(vals, alpha=0.02)
    a = DDSketch.from_values(vals[:cut], alpha=0.02)
    b = DDSketch.from_values(vals[cut:], alpha=0.02)
    a.merge(b)
    assert a.count == whole.count
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        qa, qw = a.quantile(q), whole.quantile(q)
        assert qa == qw or (math.isnan(qa) and math.isnan(qw)), q


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(min_value=1e-6, max_value=1e12,
                          allow_nan=False, allow_infinity=False),
                min_size=2, max_size=500))
def test_quantile_bounds_positive_uncollapsed(vals):
    alpha = 0.01
    sk = DDSketch.from_values(vals, alpha=alpha)
    if sk.positive_store.is_collapsed:
        return  # collapse sacrifices low quantiles by design
    sv = sorted(vals)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        r = q * (len(sv) - 1)
        lo, hi = sv[math.floor(r)], sv[math.ceil(r)]
        est = sk.quantile(q)
        assert (1 - alpha) * lo - 1e-12 <= est <= (1 + alpha) * hi + 1e-12, q


@settings(max_examples=60, deadline=None)
@given(st.lists(finite_floats, max_size=300))
def test_codec_roundtrip_identity(vals):
    sk = DDSketch.from_values(vals, alpha=0.01)
    back = DDSketch.from_bytes(sk.to_bytes())
    assert back == sk
    back2 = DDSketch.from_json(sk.to_json())
    assert back2 == sk


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.floats(min_value=1e-8, max_value=1e15,
                       allow_nan=False, allow_infinity=False),
             min_size=3, max_size=400),
    st.integers(8, 64),
    st.integers(1, 399),
)
def test_collapse_fuzz_invariants(vals, max_bins, cut):
    """Tiny bin limits force collapse constantly; invariants that must
    survive: exact count, preserved max-key mass (top quantile), bounded
    store size, and split-merge == whole (same collapse law both ways)."""
    cut = cut % len(vals) or 1
    whole = DDSketch.from_values(vals, alpha=0.05, max_bins=max_bins)
    assert whole.count == len(vals)
    assert whole.positive_store.length <= max_bins
    assert whole.quantile(1.0) == whole.value(whole.key(max(vals)))
    a = DDSketch.from_values(vals[:cut], alpha=0.05, max_bins=max_bins)
    b = DDSketch.from_values(vals[cut:], alpha=0.05, max_bins=max_bins)
    a.merge(b)
    assert a.count == whole.count
    # top-of-range agreement (collapse only sacrifices the LOW end)
    assert a.quantile(1.0) == whole.quantile(1.0)


@settings(max_examples=40, deadline=None)
@given(st.lists(finite_floats, min_size=1, max_size=200))
def test_quantiles_monotone(vals):
    sk = DDSketch.from_values(vals, alpha=0.01)
    qs = [i / 20 for i in range(21)]
    ests = sk.quantiles(qs)
    for a, b in zip(ests, ests[1:]):
        assert a <= b + 1e-9


# -- Theta/KMV properties ------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-2**40, 2**40), max_size=400), st.integers(0, 399))
def test_theta_split_merge_equals_whole(ids, cut):
    from ddsketchy_spark.core.theta import ThetaSketch

    cut = cut % (len(ids) or 1)
    whole = ThetaSketch(k=64)
    whole.add_batch(np.asarray(ids, dtype=np.int64))
    a = ThetaSketch(k=64)
    a.add_batch(np.asarray(ids[:cut], dtype=np.int64))
    b = ThetaSketch(k=64)
    b.add_batch(np.asarray(ids[cut:], dtype=np.int64))
    a.merge(b)
    assert a.theta == whole.theta
    assert np.array_equal(a.entries, whole.entries)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 500), max_size=300))
def test_theta_exact_mode_is_exact(ids):
    from ddsketchy_spark.core.theta import ThetaSketch

    sk = ThetaSketch(k=1024)  # domain <= 501 < k: never trims
    sk.add_batch(np.asarray(ids, dtype=np.int64))
    assert not sk.is_estimation_mode()
    assert sk.estimate() == len(set(ids))


@settings(max_examples=40, deadline=None)
@given(st.sets(st.integers(0, 10_000), max_size=150),
       st.sets(st.integers(0, 10_000), max_size=150))
def test_theta_set_algebra_exact_mode(sa, sb):
    from ddsketchy_spark.core.theta import ThetaSketch

    a = ThetaSketch(k=1024)
    a.add_batch(np.asarray(sorted(sa), dtype=np.int64))
    b = ThetaSketch(k=1024)
    b.add_batch(np.asarray(sorted(sb), dtype=np.int64))
    assert a.intersect(b).estimate() == len(sa & sb)
    assert a.a_not_b(b).estimate() == len(sa - sb)
    u = ThetaSketch(k=1024).merge(a).merge(b)
    assert u.estimate() == len(sa | sb)


# -- t-digest / KLL rank-error properties under arbitrary splits ---------------


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=20, max_size=500),
       st.integers(1, 7))
def test_tdigest_split_merge_rank_bound(vals, n_parts):
    from ddsketchy_spark.core.tdigest import TDigest

    arr = np.asarray(vals)
    parts = np.array_split(arr, n_parts)
    digs = []
    for p in parts:
        d = TDigest(delta=100.0)
        d.add_batch(p)
        digs.append(d)
    merged = TDigest.merge_all(digs)
    s = np.sort(arr)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        lo = np.searchsorted(s, est, side="left") / len(s)
        hi = np.searchsorted(s, est, side="right") / len(s)
        # est's true rank interval must be near q (ties widen the interval)
        assert lo - 0.15 <= q <= hi + 0.15, (q, est, lo, hi)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=20, max_size=500),
       st.integers(1, 7))
def test_kll_split_merge_rank_bound(vals, n_parts):
    from ddsketchy_spark.core.kll import KLLSketch

    arr = np.asarray(vals)
    parts = np.array_split(arr, n_parts)
    sks = []
    for p in parts:
        k = KLLSketch(200)
        k.add_batch(p)
        sks.append(k)
    merged = KLLSketch.merge_all(sks)
    s = np.sort(arr)
    for q in (0.1, 0.5, 0.9):
        est = merged.quantile(q)
        lo = np.searchsorted(s, est, side="left") / len(s)
        hi = np.searchsorted(s, est, side="right") / len(s)
        # est's true rank interval must be near q (ties widen the interval)
        assert lo - 0.15 <= q <= hi + 0.15, (q, est, lo, hi)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=10, max_size=300),
       st.integers(2, 5), st.integers(0, 1000))
def test_tdigest_kll_merge_permutation_bit_identity(vals, n_parts, seed):
    """Deterministic compaction: ANY permutation of the same partial
    sketches merges to bit-identical state (the north-rule requirement
    the docstrings claim)."""
    import random as _random

    from ddsketchy_spark.core.kll import KLLSketch
    from ddsketchy_spark.core.tdigest import TDigest

    arr = np.asarray(vals)
    parts = [p for p in np.array_split(arr, n_parts) if len(p)]
    tds, klls = [], []
    for p in parts:
        d = TDigest(delta=100.0); d.add_batch(p); tds.append(d.to_bytes())
        k = KLLSketch(200); k.add_batch(p); klls.append(k.to_bytes())
    rng = _random.Random(seed)
    order = list(range(len(parts)))
    rng.shuffle(order)
    td_a = TDigest.merge_all([TDigest.from_bytes(tds[i]) for i in range(len(parts))])
    td_b = TDigest.merge_all([TDigest.from_bytes(tds[i]) for i in order])
    assert td_a.to_bytes() == td_b.to_bytes()
    kll_a = KLLSketch.merge_all([KLLSketch.from_bytes(klls[i]) for i in range(len(parts))])
    kll_b = KLLSketch.merge_all([KLLSketch.from_bytes(klls[i]) for i in order])
    assert kll_a.to_bytes() == kll_b.to_bytes()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.sampled_from([0.0, -0.0, 1.0, -1.0, 1e-300, 42.0]),
                min_size=2, max_size=60),
       st.integers(2, 5), st.integers(0, 99))
def test_ddsketch_state_bytes_merge_order_independent(vals, n_parts, seed):
    """Serialized DDSketch state must be bit-identical under any merge
    order, including the +/-0.0 tie that min() resolves by argument order."""
    import random as _random

    parts = [p for p in np.array_split(np.asarray(vals), n_parts) if len(p)]
    blobs = []
    for p in parts:
        sk = DDSketch(0.01)
        sk.add_batch(p)
        blobs.append(sk.to_bytes())
    order = list(range(len(blobs)))
    _random.Random(seed).shuffle(order)

    def fold(idxs):
        acc = DDSketch.from_bytes(blobs[idxs[0]])
        for i in idxs[1:]:
            acc.merge(DDSketch.from_bytes(blobs[i]))
        return acc.to_bytes()

    assert fold(list(range(len(blobs)))) == fold(order)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 30), min_size=1, max_size=400),
       st.integers(1, 6), st.integers(0, 99))
def test_misra_gries_guarantees_under_splits(vals, n_parts, seed):
    """Merged Misra-Gries keeps both guarantees for ANY split/merge order:
    every heavy hitter (f > n/(k+1)) survives in the counters, and
    est <= f <= est + err_bound for every key."""
    import collections
    import random as _random

    from ddsketchy_spark.core.misra_gries import MisraGries

    K = 8
    arr = np.asarray(vals, dtype=np.int64)
    parts = [p for p in np.array_split(arr, n_parts) if len(p)]
    sks = []
    for p in parts:
        m = MisraGries(K)
        m.add_batch(p)
        sks.append(m.to_bytes())
    order = list(range(len(sks)))
    _random.Random(seed).shuffle(order)
    acc = MisraGries.from_bytes(sks[order[0]])
    for i in order[1:]:
        acc.merge(MisraGries.from_bytes(sks[i]))

    freq = collections.Counter(vals)
    n = len(vals)
    assert acc.err_bound <= n // (K + 1)
    for key, f in freq.items():
        est = acc.estimate(int(key))
        assert est <= f <= est + acc.err_bound, (key, f, est)
        if f > n // (K + 1):
            assert int(key) in acc.counters, (key, f)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-2**50, 2**50), min_size=1, max_size=300),
       st.integers(1, 6), st.integers(0, 99))
def test_hash_sketch_blobs_pure_functions_of_input(vals, n_parts, seed):
    """HLL/CMS/Bloom state bytes must be identical for ANY split and merge
    order AND equal to a single-shot build (max/add/or laws are exactly
    order-independent)."""
    import random as _random

    from ddsketchy_spark.core.bloom import BloomFilter
    from ddsketchy_spark.core.cms import CountMinSketch
    from ddsketchy_spark.core.hll import HyperLogLog

    arr = np.asarray(vals, dtype=np.int64)
    parts = [p for p in np.array_split(arr, n_parts) if len(p)]
    order = list(range(len(parts)))
    _random.Random(seed).shuffle(order)

    for make in (lambda: HyperLogLog(10),
                 lambda: CountMinSketch(3, 1 << 8),
                 lambda: BloomFilter(1 << 12, 5)):
        whole = make()
        whole.add_batch(arr)
        partials = []
        for p in parts:
            s = make()
            s.add_batch(p)
            partials.append(s)
        acc = partials[order[0]]
        for i in order[1:]:
            acc.merge(partials[i])
        assert acc.to_bytes() == whole.to_bytes(), type(whole).__name__
