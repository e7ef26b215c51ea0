"""DDSketch.rank/cdf — the inverse query of quantile, by the same
bucket law: the entire bucket containing x counts, so the estimate is a
monotone step function, exact at bucket boundaries, within one bucket's
mass of the true rank everywhere, and exactly re-derivable in SQL."""

import math

import numpy as np
import pytest

from ddsketchy_spark.core.ddsketch import DDSketch


def _mixed(seed=7, n=20_000):
    rng = np.random.default_rng(seed)
    vals = rng.lognormal(0, 2, n) * np.where(rng.random(n) < 0.3, -1, 1)
    vals[: n // 100] = 0.0          # zero bucket
    vals[n // 100: n // 50] = 1e-200  # sub-indexable -> zero bucket
    return vals


def test_rank_within_bucket_mass_and_monotone():
    vals = _mixed()
    sk = DDSketch(0.01)
    sk.add_batch(vals)
    sv = np.sort(vals)
    probes = np.concatenate([
        np.quantile(vals, [0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99]),
        [-1e9, -5.0, -1e-250, 0.0, 1e-250, 5.0, 1e9]])
    last = -1
    for x in np.sort(probes):
        r = sk.rank(float(x))
        assert last <= r <= sk.count  # monotone step function
        last = r
        true_r = int(np.searchsorted(sv, x, side="right"))
        # off by at most the mass of x's bucket: alpha-relative width,
        # bounded here by the count of values within 2*alpha of |x|
        if abs(x) > 1e-100:
            lo, hi = sorted((x * 0.975, x * 1.025))
            bucket_mass = int(((sv >= lo) & (sv <= hi)).sum())
        else:
            bucket_mass = int((np.abs(sv) < 1e-100).sum())
        assert abs(r - true_r) <= bucket_mass + 1, (x, r, true_r)
    # extremes are exact
    assert sk.rank(float(sv[-1]) * 2) == sk.count
    assert sk.rank(float(sv[0]) * 2) == 0


def test_cdf_inverts_quantile_and_regions():
    vals = _mixed()
    sk = DDSketch(0.01)
    sk.add_batch(vals)
    n = sk.count
    for q in (0.05, 0.25, 0.5, 0.75, 0.95, 0.999):
        # cdf(quantile(q)) covers q: the quantile's bucket is included
        # whole, so the estimated cdf can only land at-or-after q's rank
        assert sk.cdf(sk.quantile(q)) >= q - 1.0 / n
    # region semantics: zero bucket counts as exactly 0
    neg = sk.negative_store.count
    zero = sk.zero_count
    assert sk.rank(0.0) == neg + zero
    assert sk.rank(-1e-300) == neg          # x in (-miv, 0)
    assert sk.rank(1e-300) == neg + zero    # x in [0, miv)
    with pytest.raises(ValueError, match="finite"):
        sk.rank(float("nan"))
    with pytest.raises(ValueError, match="finite"):
        sk.rank(math.inf)
    empty = DDSketch(0.01)
    assert empty.cdf(5.0) == 0.0 and empty.rank(5.0) == 0


def test_rank_exact_at_bucket_level():
    """Against the bucket law directly: rank(x) must equal the total
    count of values whose (region, key) sorts at-or-before x's — the
    exact SQL re-derivation the oracle uses."""
    vals = _mixed(seed=3, n=5000)
    sk = DDSketch(0.01)
    sk.add_batch(vals)
    m = sk._m
    miv = m.min_indexable_value

    def bucket_pos(v):
        if v >= miv:
            return (1, m.key(v))
        if abs(v) < miv:
            return (0, 0)
        return (-1, -m.key(-v))

    for x in (-50.0, -2.5, -1e-250, 0.0, 0.7, 3.0, 41.0, 1e5):
        px = bucket_pos(x)
        expect = sum(1 for v in vals if bucket_pos(float(v)) <= px)
        assert sk.rank(x) == expect, x


def test_cdf_sql_function(spark):
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_state
    from ddsketchy_spark.spark.functions import register_sql_functions

    register_sql_functions(spark)
    df = spark.range(1, 1001).selectExpr("CAST(id AS DOUBLE) AS v")
    sk = ddsketch_state(df, "v")
    sdf = spark.createDataFrame([(sk.to_bytes(),)], "state binary")
    sdf.createOrReplaceTempView("skt")
    row = spark.sql(
        "SELECT ddsketch_cdf(state, 500.0) AS c, "
        "ddsketch_rank(state, 500.0) AS r, "
        "ddsketch_cdf(state, 0.5) AS lo, ddsketch_cdf(state, 2000.0) AS hi "
        "FROM skt").collect()[0]
    assert row["c"] == sk.cdf(500.0) and row["r"] == sk.rank(500.0)
    assert row["lo"] == 0.0 and row["hi"] == 1.0
    assert abs(row["c"] - 0.5) < 0.02
