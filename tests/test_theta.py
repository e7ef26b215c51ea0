"""Theta/KMV sketch tests: distinct counting with set algebra.

Gates: exact below k; estimation error within ~4 RSE above k; merges
bit-for-bit order-independent (retained set is a pure function of the item
set); intersection / a-not-b / jaccard estimators accurate; Spark native
(JVM hash + distinct + unsigned top-k) == arrow harness, bit-identical."""

import itertools

import numpy as np
import pytest

from ddsketchy_spark.core.theta import ThetaSketch


def test_exact_below_k():
    sk = ThetaSketch(k=256)
    sk.add_batch(np.arange(200, dtype=np.int64))
    sk.add_batch(np.arange(100, dtype=np.int64))  # duplicates ignored
    assert not sk.is_estimation_mode()
    assert sk.estimate() == 200.0


def test_estimation_accuracy():
    for k in (256, 1024, 4096):
        sk = ThetaSketch(k=k)
        n = 100_000
        sk.add_batch(np.arange(n, dtype=np.int64))
        assert sk.is_estimation_mode()
        rel = abs(sk.estimate() - n) / n
        assert rel <= 4.0 / np.sqrt(k - 1), (k, rel)


def test_merge_permutation_bit_identity():
    rng = np.random.default_rng(7)
    parts = [rng.integers(0, 30_000, 20_000) for _ in range(4)]
    sketches = []
    for p in parts:
        s = ThetaSketch(k=512)
        s.add_batch(p)
        sketches.append(s.to_bytes())
    results = []
    for perm in itertools.permutations(range(4)):
        acc = ThetaSketch.from_bytes(sketches[perm[0]])
        for i in perm[1:]:
            acc.merge(ThetaSketch.from_bytes(sketches[i]))
        results.append((acc.theta, acc.entries.tobytes()))
    assert all(r == results[0] for r in results)
    # merged == single build over the concatenation, bit-for-bit
    direct = ThetaSketch(k=512)
    direct.add_batch(np.concatenate(parts))
    assert (direct.theta, direct.entries.tobytes()) == results[0]


def test_merge_idempotent():
    sk = ThetaSketch(k=128)
    sk.add_batch(np.arange(10_000, dtype=np.int64))
    before = (sk.theta, sk.entries.tobytes())
    sk.merge(ThetaSketch.from_bytes(sk.to_bytes()))
    assert (sk.theta, sk.entries.tobytes()) == before


def test_set_algebra_accuracy():
    k = 4096
    a = ThetaSketch(k=k)
    b = ThetaSketch(k=k)
    # |A|=60k, |B|=50k, |A&B|=20k
    a.add_batch(np.arange(0, 60_000, dtype=np.int64))
    b.add_batch(np.arange(40_000, 90_000, dtype=np.int64))
    tol = 5.0 / np.sqrt(k - 1)
    inter = a.intersect(b)
    assert abs(inter.estimate() - 20_000) / 20_000 <= tol
    diff = a.a_not_b(b)
    assert abs(diff.estimate() - 40_000) / 40_000 <= tol
    union = ThetaSketch(k=k).merge(a).merge(b)
    assert abs(union.estimate() - 90_000) / 90_000 <= tol
    jac = ThetaSketch.jaccard(a, b)
    assert abs(jac - 20_000 / 90_000) <= tol


def test_intersect_exact_mode():
    a = ThetaSketch(k=1024)
    b = ThetaSketch(k=1024)
    a.add_batch(np.arange(0, 500, dtype=np.int64))
    b.add_batch(np.arange(300, 800, dtype=np.int64))
    assert a.intersect(b).estimate() == 200.0
    assert a.a_not_b(b).estimate() == 300.0


def test_serialization_roundtrip():
    sk = ThetaSketch(k=64, seed=9)
    sk.add_batch(np.arange(5_000, dtype=np.int64))
    rt = ThetaSketch.from_bytes(sk.to_bytes())
    assert (rt.k, rt.seed, rt.hash_kind, rt.theta) == (sk.k, sk.seed, sk.hash_kind, sk.theta)
    assert np.array_equal(rt.entries, sk.entries)
    rt.add_batch(np.arange(5_000, 6_000, dtype=np.int64))  # usable after restore
    assert rt.estimate() >= sk.estimate()


def test_config_validation():
    with pytest.raises(ValueError):
        ThetaSketch(k=4)
    with pytest.raises(ValueError):
        ThetaSketch(hash_kind="nope")
    with pytest.raises(ValueError):
        ThetaSketch(seed=1, hash_kind="spark")
    a, b = ThetaSketch(k=64), ThetaSketch(k=128)
    with pytest.raises(ValueError):
        a.merge(b)


def test_string_keys():
    sk = ThetaSketch(k=256)
    sk.add_batch(np.array([f"doc-{i}" for i in range(100)], dtype=object))
    sk.add_batch(np.array([f"doc-{i}" for i in range(50)], dtype=object))
    assert sk.estimate() == 100.0


# -- Spark-level -------------------------------------------------------------


def test_spark_native_matches_arrow(spark, token_table_path):
    from ddsketchy_spark.core.theta import ThetaSketch as TS
    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.spark.companions import theta_state

    df = read_tokens(spark, token_table_path)
    nat = theta_state(df, "tokens", k=1024, engine="native")
    arr = theta_state(df, "tokens", k=1024, engine="arrow", hash_kind="spark")
    a, b = TS.from_bytes(nat["state"]), TS.from_bytes(arr["state"])
    assert a.theta == b.theta
    assert np.array_equal(a.entries, b.entries)
    assert nat["distinct_est"] == arr["distinct_est"]


def test_spark_grouped_native_and_exact(spark, token_table_path):
    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.spark.companions import theta_state

    df = read_tokens(spark, token_table_path)
    out = {r["source"]: r for r in
           theta_state(df, "doc_id", by=["source"], k=65536, engine="arrow").collect()}
    exact = {r["source"]: r["n"] for r in
             df.groupBy("source").agg(
                 __import__("pyspark.sql.functions", fromlist=["countDistinct"])
                 .countDistinct("doc_id").alias("n")).collect()}
    assert set(out) == set(exact)
    for src, row in out.items():
        assert row["exact_mode"]
        assert row["distinct_est"] == float(exact[src]), src


def test_spark_cross_source_overlap(spark, token_table_path):
    """The set-algebra use case: token-vocabulary overlap between sources,
    via per-source sketches intersected on the driver, vs exact."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.core.theta import ThetaSketch as TS
    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.spark.companions import theta_state

    df = read_tokens(spark, token_table_path)
    states = {r["source"]: TS.from_bytes(r["state"]) for r in
              theta_state(df, "tokens", by=["source"], k=4096,
                          engine="native").collect()}
    srcs = sorted(states)[:2]
    est = states[srcs[0]].intersect(states[srcs[1]]).estimate()
    exact = (df.where(F.col("source") == srcs[0]).select(F.explode("tokens").alias("t"))
             .intersect(df.where(F.col("source") == srcs[1])
                        .select(F.explode("tokens").alias("t"))).count())
    tol = 5.0 / np.sqrt(4096 - 1)
    assert abs(est - exact) <= max(tol * exact, 1.0), (est, exact)


def test_theta_group_overlap_matrix(spark):
    """Pairwise overlap matrix vs exact Python sets: constructed groups
    with known partial/zero/full overlaps, exact mode at this scale, all
    C(G,2) pairs present (including a zero-intersection pair), NULL
    groups excluded, max_groups guard."""
    from ddsketchy_spark.spark.companions import theta_group_overlap

    sets = {
        "a": set(range(0, 100)),        # a ^ b = 50..99 (50)
        "b": set(range(50, 150)),       # b ^ c = 140..149 (10)
        "c": set(range(140, 180)),      # a ^ c = {} (zero-overlap pair)
        "d": set(range(0, 100)),        # d == a (full overlap)
    }
    rows = [(g, v) for g, vs in sets.items() for v in vs]
    rows += [(None, 0), (None, 999_999)]  # NULL group: excluded
    df = spark.createDataFrame(rows, "grp string, v long")
    out = theta_group_overlap(df, "v", "grp", k=4096)
    got = {(r["group_a"], r["group_b"]): r for r in out.collect()}
    assert len(got) == 6  # C(4,2), zero-overlap pair included
    for (ga, gb), r in got.items():
        assert ga < gb
        A, B = sets[ga], sets[gb]
        assert r["exact_mode"] is True
        assert r["est_a"] == len(A) and r["est_b"] == len(B)
        assert r["est_union"] == len(A | B)
        assert r["est_intersection"] == len(A & B)
        assert r["jaccard"] == pytest.approx(len(A & B) / len(A | B))
        assert r["containment_a_in_b"] == pytest.approx(len(A & B) / len(A))
        assert r["containment_b_in_a"] == pytest.approx(len(A & B) / len(B))
    assert got[("a", "c")]["est_intersection"] == 0.0
    assert got[("a", "d")]["jaccard"] == 1.0

    with pytest.raises(ValueError, match="max_groups"):
        theta_group_overlap(df.where("grp is not null"), "v", "grp",
                            max_groups=3)
