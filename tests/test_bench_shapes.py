"""pytest-benchmark suite mirroring the reference's criterion benches
(`/root/reference/benches/ddsketchy_bench.rs`): insert throughput at
1k/10k/100k uniform(0,1) values seed 42, merge of two 100k-value sketches,
quantile queries q in {0, .25, .5, .75, .99, 1.0} on a 100k sketch — same
workloads, alpha=0.01, default 4096 bins.

The reference publishes no absolute numbers (CI compiles benches only), so
these pin the SHAPE of the comparison; our absolute numbers live in
BENCH/BASELINE.md. Runs fine without the pytest-benchmark plugin too
(falls back to a single call)."""

import numpy as np
import pytest

from ddsketchy_spark import DDSketch

ALPHA = 0.01


@pytest.fixture
def bench(request):
    """pytest-benchmark if installed, else a plain-call shim."""
    try:
        return request.getfixturevalue("benchmark")
    except pytest.FixtureLookupError:
        return lambda fn, *a, **k: fn(*a, **k)


def _uniform(n: int) -> np.ndarray:
    # same workload as the reference: uniform(0,1), seeded 42
    return np.random.default_rng(42).random(n)


@pytest.mark.parametrize("n", [1_000, 10_000, 100_000])
def test_insert_throughput(bench, n):
    vals = _uniform(n)

    def insert():
        sk = DDSketch(ALPHA)
        sk.add_batch(vals)
        return sk

    sk = bench(insert)
    assert sk.count == n


def test_merge_100k(bench):
    a_vals, b_vals = _uniform(100_000), _uniform(100_000) + 0.5
    a = DDSketch(ALPHA)
    a.add_batch(a_vals)
    b = DDSketch(ALPHA)
    b.add_batch(b_vals)
    a_blob = a.to_bytes()

    def merge():
        # clone + merge per iteration, like the reference bench
        acc = DDSketch.from_bytes(a_blob)
        acc.merge(b)
        return acc

    merged = bench(merge)
    assert merged.count == 200_000


def test_quantile_queries(bench):
    sk = DDSketch(ALPHA)
    sk.add_batch(_uniform(100_000))
    qs = (0.0, 0.25, 0.5, 0.75, 0.99, 1.0)

    def quantiles():
        return [sk.quantile(q) for q in qs]

    out = bench(quantiles)
    assert out == sorted(out)
    for q, est in zip(qs, out):
        if 0.0 < q < 1.0:
            assert abs(est - q) <= ALPHA * q + 1e-3, (q, est)
