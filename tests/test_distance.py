"""DDSketch distribution distances: NumPy twin vs an independent
reference computation, the SQL engine vs the NumPy twin, and the
accuracy law vs exact sample distances."""

import numpy as np
import pytest

from ddsketchy_spark.core.ddsketch import DDSketch
from ddsketchy_spark.core.mapping import LogMapping
from ddsketchy_spark.spark.distance import ddsketch_distance, sketch_distance

ALPHA = 0.01


def _exact_sample_distance(xa, xb):
    """Reference KS/W1 between two empirical samples (independent
    formulation: event-sweep over the merged sorted support)."""
    xa = np.sort(np.asarray(xa, dtype=float))
    xb = np.sort(np.asarray(xb, dtype=float))
    support = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(xa, support, side="right") / len(xa)
    fb = np.searchsorted(xb, support, side="right") / len(xb)
    diff = np.abs(fa - fb)
    ks = float(diff.max())
    w1 = float(np.sum(diff[:-1] * np.diff(support)))
    return ks, w1


def _sk(values):
    s = DDSketch(ALPHA)
    s.add_batch(np.asarray(values, dtype=float))
    return s


def test_numpy_twin_exact_on_atom_aligned_samples():
    """Values placed exactly at bucket reconstruction points make the
    sketch's atom representation IDENTICAL to the empirical sample, so
    sketch_distance must equal the exact sample distance to fp noise."""
    m = LogMapping(ALPHA)
    keys_a = [10, 20, 20, 35, 50, 50, 50, 80]
    keys_b = [10, 15, 35, 35, 60, 80, 80]
    xa = [m.value(k) for k in keys_a]
    xb = [m.value(k) for k in keys_b]
    ks, w1 = sketch_distance(_sk(xa), _sk(xb))
    eks, ew1 = _exact_sample_distance(xa, xb)
    assert ks == pytest.approx(eks, abs=1e-12)
    assert w1 == pytest.approx(ew1, rel=1e-12)


def test_numpy_twin_handles_signs_and_zeros():
    m = LogMapping(ALPHA)
    xa = [-m.value(30), -m.value(30), 0.0, m.value(10), m.value(40)]
    xb = [-m.value(50), 0.0, 0.0, m.value(10)]
    ks, w1 = sketch_distance(_sk(xa), _sk(xb))
    eks, ew1 = _exact_sample_distance(xa, xb)
    assert ks == pytest.approx(eks, abs=1e-12)
    assert w1 == pytest.approx(ew1, rel=1e-12)


def test_accuracy_law_vs_exact_on_random_data():
    """Each atom is within alpha-relative distance of its true value, so
    W1(sketch) differs from W1(exact) by at most alpha * (E|Xa| + E|Xb|)
    (mass transport moved by <= alpha*|x| per point)."""
    rng = np.random.default_rng(11)
    xa = rng.lognormal(3.0, 1.0, 4000)
    xb = rng.lognormal(3.2, 1.1, 3000)
    ks, w1 = sketch_distance(_sk(xa), _sk(xb))
    eks, ew1 = _exact_sample_distance(xa, xb)
    budget = ALPHA * (np.abs(xa).mean() + np.abs(xb).mean())
    assert abs(w1 - ew1) <= budget
    # KS can shift by at most the mass sharing a bucket boundary; on
    # continuous samples this is small
    assert abs(ks - eks) <= 0.05
    assert 0.0 < ks <= 1.0


def test_sketch_distance_identity_and_guards():
    xa = np.linspace(1, 100, 500)
    ks, w1 = sketch_distance(_sk(xa), _sk(xa))
    assert ks == 0.0 and w1 == 0.0
    with pytest.raises(ValueError, match="non-empty"):
        sketch_distance(_sk(xa), DDSketch(ALPHA))


# ---------------------------------------------------------------------------
# SQL engine
# ---------------------------------------------------------------------------


def _dist_df(spark, groups):
    rows = []
    for g, vals in groups.items():
        rows += [(g, float(v)) for v in vals]
    return spark.createDataFrame(rows, "grp string, value double")


def test_sql_engine_matches_numpy_twin(spark):
    rng = np.random.default_rng(13)
    groups = {
        "a": rng.lognormal(2.5, 0.8, 900),
        "b": rng.lognormal(2.8, 1.0, 700),
        "c": np.concatenate([-rng.lognormal(2.0, 0.5, 300),
                             np.zeros(50), rng.lognormal(2.2, 0.7, 400)]),
    }
    df = _dist_df(spark, groups).repartition(5)
    out = {(r["g_a"], r["g_b"]): r
           for r in ddsketch_distance(df, "value", "grp", ALPHA).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    for (ga, gb), r in out.items():
        ks, w1 = sketch_distance(_sk(groups[ga]), _sk(groups[gb]))
        assert r["ks"] == pytest.approx(round(ks, 6), abs=2e-6)
        assert r["w1"] == pytest.approx(round(w1, 6), abs=max(2e-6, 1e-9 * abs(w1)))
        assert r["n_a"] == len(groups[ga]) and r["n_b"] == len(groups[gb])


def test_sql_engine_ignores_nulls_and_nonfinite(spark):
    rows = [("a", 1.0), ("a", 2.0), ("a", float("nan")),
            ("a", float("inf")), ("b", 4.0), ("b", 8.0),
            (None, 9.0), ("b", None)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = ddsketch_distance(df, "value", "grp", ALPHA).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["g_a"], r["g_b"]) == ("a", "b")
    assert r["n_a"] == 2 and r["n_b"] == 2
    ks, w1 = sketch_distance(_sk([1.0, 2.0]), _sk([4.0, 8.0]))
    assert r["ks"] == pytest.approx(round(ks, 6), abs=1e-6)
    assert r["w1"] == pytest.approx(round(w1, 6), abs=1e-6)


# ---------------------------------------------------------------------------
# Rollup distance (blob-level drift between snapshot versions)
# ---------------------------------------------------------------------------


def test_rollup_distance_between_versions(spark, tmp_path):
    """Per-key KS/W1 between rollup v0 and v1 == sketch_distance between
    reference sketches built from the raw data (v1 folds d2 forward);
    added keys get sentinels; guards fire driver-side."""
    from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator
    from ddsketchy_spark.spark.distance import ddsketch_rollup_distance
    from ddsketchy_spark.spark.rollup import update_rollup

    rng = np.random.default_rng(17)
    d1 = {"a": rng.lognormal(2.0, 0.8, 500), "c": rng.lognormal(1.0, 0.3, 200)}
    d2 = {"a": rng.lognormal(3.0, 1.0, 400), "b": np.array([7.0, 9.0])}
    agg = DDSketchAggregator("v", alpha=ALPHA, quantiles=(0.5,))
    root = str(tmp_path / "roll_dist")
    for d in (d1, d2):
        df = spark.createDataFrame(
            [(k, float(x)) for k, vs in d.items() for x in vs],
            "k string, v double")
        update_rollup(spark, root, df, agg, ["k"])

    out = {r["k"]: r for r in
           ddsketch_rollup_distance(spark, root, agg, ["k"]).collect()}
    assert set(out) == {"a", "b", "c"}
    # key a: v0 = d1, v1 = d1 + d2 (rollup folds forward)
    ks, w1 = sketch_distance(_sk(d1["a"]),
                             _sk(np.concatenate([d1["a"], d2["a"]])))
    assert out["a"]["status"] == "both"
    assert out["a"]["ks"] == pytest.approx(round(ks, 6), abs=1e-9)
    assert out["a"]["w1"] == pytest.approx(round(w1, 6), abs=1e-9)
    assert (out["a"]["n_old"], out["a"]["n_new"]) == (500, 900)
    # key c: unchanged by d2 -> identical sketch -> zero distance
    assert out["c"]["status"] == "both"
    assert out["c"]["ks"] == 0.0 and out["c"]["w1"] == 0.0
    # key b: only in v1 -> sentinel distances, never NULL doubles
    assert out["b"]["status"] == "added"
    assert out["b"]["ks"] == -1.0 and out["b"]["w1"] == -1.0
    assert out["b"]["n_old"] == 0 and out["b"]["n_new"] == 2

    # guards
    from ddsketchy_spark.spark.companions import HLLAggregator

    with pytest.raises(TypeError, match="DDSketchAggregator"):
        ddsketch_rollup_distance(spark, root, HLLAggregator("v"), ["k"])
    with pytest.raises(ValueError, match="nothing to compare"):
        ddsketch_rollup_distance(spark, root, agg, ["k"], v_old=1, v_new=1)
    with pytest.raises(ValueError, match="two snapshots"):
        ddsketch_rollup_distance(spark, root, agg, ["k"], v_old=-1, v_new=0)


def test_rollup_distance_cross_root(spark, tmp_path):
    """other_root compares two independent rollup lineages (e.g. two
    crawls rolled up separately) at their latest versions."""
    from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator
    from ddsketchy_spark.spark.distance import ddsketch_rollup_distance
    from ddsketchy_spark.spark.rollup import update_rollup

    rng = np.random.default_rng(23)
    xa = rng.lognormal(2.0, 0.5, 300)
    xb = rng.lognormal(2.6, 0.7, 400)
    agg = DDSketchAggregator("v", alpha=ALPHA, quantiles=(0.5,))
    ra, rb = str(tmp_path / "lin_a"), str(tmp_path / "lin_b")
    update_rollup(spark, ra, spark.createDataFrame(
        [("k", float(x)) for x in xa], "k string, v double"), agg, ["k"])
    update_rollup(spark, rb, spark.createDataFrame(
        [("k", float(x)) for x in xb], "k string, v double"), agg, ["k"])
    out = ddsketch_rollup_distance(spark, rb, agg, ["k"],
                                   other_root=ra).collect()
    assert len(out) == 1
    ks, w1 = sketch_distance(_sk(xa), _sk(xb))
    assert out[0]["ks"] == pytest.approx(round(ks, 6), abs=1e-9)
    assert out[0]["w1"] == pytest.approx(round(w1, 6), abs=1e-9)


def test_distance_between_two_frames(spark):
    from ddsketchy_spark.spark.distance import ddsketch_distance_between

    rng = np.random.default_rng(29)
    xa = rng.lognormal(2.0, 0.6, 600)
    xb = rng.lognormal(2.4, 0.8, 500)
    da = spark.createDataFrame([(float(v),) for v in xa], "value double")
    db = spark.createDataFrame([(float(v),) for v in xb], "value double")
    out = ddsketch_distance_between(da, db, "value",
                                    labels=("old", "new")).collect()
    assert len(out) == 1
    r = out[0]
    assert {r["g_a"], r["g_b"]} == {"old", "new"}
    ks, w1 = sketch_distance(_sk(xa), _sk(xb))
    assert r["ks"] == pytest.approx(round(ks, 6), abs=2e-6)
    assert r["w1"] == pytest.approx(round(w1, 6), abs=2e-6)
    with pytest.raises(ValueError, match="labels must differ"):
        ddsketch_distance_between(da, db, "value", labels=("x", "x"))
