"""Table-profiler tests: exact stats exact, sketch estimates within bounds,
type dispatch correct."""

import pyarrow.parquet as pq
import pytest

from ddsketchy_spark.spark.profile import profile_table


@pytest.fixture(scope="module")
def prof(spark, token_table_path):
    df = spark.read.parquet(token_table_path)
    return df, {r["column"]: r for r in profile_table(df).collect()}


def test_profile_covers_all_columns(prof):
    _, p = prof
    assert set(p) == {"doc_id", "tokens", "n_tok", "source"}


def test_profile_exact_stats(prof, token_table_path):
    _, p = prof
    tbl = pq.read_table(token_table_path, columns=["n_tok"])
    col = tbl.column("n_tok").to_numpy()
    r = p["n_tok"]
    assert r["count"] == len(col) == 20_000
    assert r["nulls"] == 0
    assert r["min"] == float(col.min())
    assert r["max"] == float(col.max())
    assert r["mean"] == pytest.approx(col.mean(), rel=1e-12)


def test_profile_distinct_and_quantiles(prof):
    df, p = prof
    exact_sources = df.select("source").distinct().count()
    assert p["source"]["distinct_est"] == exact_sources  # tiny: HLL exact
    # doc_id: 20k distinct, p=14 HLL -> within ~2%
    assert abs(p["doc_id"]["distinct_est"] - 20_000) <= 0.02 * 20_000
    # n_tok p50 within alpha of exact lower quantile
    import numpy as np

    vals = np.sort(np.array(
        [r["n_tok"] for r in df.select("n_tok").collect()], dtype=float))
    exact_p50 = vals[(len(vals) - 1) // 2]
    assert abs(p["n_tok"]["p50"] - exact_p50) <= 0.01 * exact_p50


def test_profile_array_and_string_columns(prof):
    _, p = prof
    assert p["tokens"]["avg_len"] is not None and p["tokens"]["avg_len"] > 0
    assert p["tokens"]["p50"] is not None        # element-level quantiles
    assert p["doc_id"]["avg_len"] is not None    # string length
    assert p["doc_id"]["p50"] is None            # strings have no quantiles


def test_column_correlations(spark):
    import numpy as np
    import pytest

    from ddsketchy_spark.spark.profile import column_correlations

    rng = np.random.default_rng(47)
    x = rng.normal(size=400)
    y = 2.0 * x + rng.normal(size=400) * 0.5   # strongly correlated
    z = rng.normal(size=400)                   # independent
    rows = [(float(x[i]), float(y[i]), float(z[i]), 1.0) for i in range(400)]
    rows += [(None, 1.0, 2.0, 1.0), (1.0, None, 3.0, 1.0)]  # pairwise-complete
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    out = {(r["col_a"], r["col_b"]): r for r in
           column_correlations(df, ["x", "y", "z", "c"]).collect()}
    assert set(out) == {("x", "y"), ("x", "z"), ("x", "c"),
                        ("y", "z"), ("y", "c"), ("z", "c")}
    # pairwise-complete references: each NULL row drops only from the
    # pairs it has a NULL in, so (x,z) includes the (1.0, 3.0) row and
    # (y,z) includes the (1.0, 2.0) row
    assert out[("x", "y")]["corr"] == pytest.approx(
        float(np.corrcoef(x, y)[0, 1]), abs=1e-6)
    assert out[("x", "z")]["corr"] == pytest.approx(
        float(np.corrcoef(np.append(x, 1.0), np.append(z, 3.0))[0, 1]),
        abs=1e-6)
    assert out[("y", "z")]["corr"] == pytest.approx(
        float(np.corrcoef(np.append(y, 1.0), np.append(z, 2.0))[0, 1]),
        abs=1e-6)
    # constant column: undefined -> -2.0 sentinel, never NULL
    assert out[("x", "c")]["corr"] == -2.0
    assert out[("y", "c")]["corr"] == -2.0
    assert all(r["n_rows"] == 402 for r in out.values())
    with pytest.raises(ValueError, match="at least 2"):
        column_correlations(df, ["x"])
    with pytest.raises(ValueError, match="duplicate"):
        column_correlations(df, ["x", "x"])


def test_profile_single_sketch_scan(spark, token_table_path):
    """Plan audit (r6): profiling any number of columns issues exactly two
    data passes — one fused exact aggregate, one fused sketch aggregate —
    never a per-column scan pair (2C+1 jobs previously)."""
    df = spark.read.parquet(token_table_path)
    sc = spark.sparkContext
    sc.setJobGroup("profile-scan-audit", "r6 audit", False)
    try:
        profile_table(df)  # eager: collects both aggregates internally
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("profile-scan-audit")
    # two logical passes (exact .first() + sketch .collect()); AQE may
    # split each into a couple of jobs, so allow slack — but a
    # per-column implementation issues >= 2 jobs per eligible column
    # (the token table has 5, so >= 10) and must fail here
    assert 1 <= len(jobs) <= 5, jobs


def test_profile_matches_per_column_engines(spark, token_table_path):
    """The one-pass profiler's estimates equal the dedicated per-column
    engines' (same register/bucket rows by construction)."""
    from ddsketchy_spark.spark.companions import hll_distinct
    from ddsketchy_spark.spark.ddsketch_agg import (ddsketch_quantiles,
                                                    quantile_label)

    df = spark.read.parquet(token_table_path)
    rows = {r["column"]: r for r in profile_table(df).collect()}
    for c in ("n_tok", "tokens"):
        assert rows[c]["distinct_est"] == int(round(hll_distinct(
            df, c, p=14, engine="native")["distinct_est"])), c
        est = ddsketch_quantiles(df, c, alpha=0.01,
                                 quantiles=(0.5, 0.9, 0.99),
                                 engine="native")
        for q in (0.5, 0.9, 0.99):
            lbl = quantile_label(q)
            assert rows[c][lbl] == est[lbl], (c, lbl)
    assert rows["source"]["distinct_est"] == int(round(hll_distinct(
        df, "source", p=14, engine="native")["distinct_est"]))
