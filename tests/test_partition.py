"""Sketch-guided range partitioning (pipeline/partition.py) and the
quantile_range shard mode."""

import numpy as np
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.2, 20_000)  # heavy right tail
    return spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)],
        "row_id long, v double")


def test_boundaries_balance_and_determinism(spark, skewed):
    """KLL boundaries hit the target ranks within the k=200 empirical
    rank error, per-range counts are quantile-balanced on a skewed
    column (where equal-width collapses), and a second pass returns the
    identical boundary list (order-independent merge)."""
    from ddsketchy_spark.pipeline.partition import (
        assign_range_id, sketch_range_boundaries)

    m = 8
    bounds = sketch_range_boundaries(skewed, "v", m)
    assert bounds == sketch_range_boundaries(skewed, "v", m)
    assert len(bounds) == m - 1 and bounds == sorted(bounds)
    n = skewed.count()
    for i, b in enumerate(bounds, start=1):
        true_rank = skewed.where(F.col("v") < b).count() / n
        assert abs(true_rank - i / m) < 0.03, (i, b, true_rank)
    counts = {r["range_id"]: r["count"] for r in
              assign_range_id(skewed, "v", bounds)
              .groupBy("range_id").count().collect()}
    assert set(counts) == set(range(m))
    for c in counts.values():
        assert abs(c - n / m) < 0.06 * n
    # equal-width over the same data: the tail squeezes nearly
    # everything into the first range — the motivation for this module
    lo, hi = skewed.agg(F.min("v"), F.max("v")).collect()[0]
    wid = skewed.withColumn(
        "w", F.least(F.lit(m - 1),
                     F.floor((F.col("v") - lo) * m / (hi - lo + 1))))
    top = wid.groupBy("w").count().orderBy(F.desc("count")).first()["count"]
    assert top > 0.8 * n


def test_assign_range_id_laws(spark):
    from ddsketchy_spark.pipeline.partition import (
        assign_range_id, sketch_range_boundaries)

    df = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 20.0), (5, 25.0), (6, None)],
        "id long, v double")
    got = {r["id"]: r["range_id"] for r in
           assign_range_id(df, "v", [10.0, 20.0]).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: None}
    all_zero = assign_range_id(df.where("v IS NOT NULL"), "v", [])
    assert {r["range_id"] for r in all_zero.collect()} == {0}
    with pytest.raises(ValueError, match="strictly increasing"):
        assign_range_id(df, "v", [20.0, 10.0])
    with pytest.raises(ValueError, match="n_ranges"):
        sketch_range_boundaries(df, "v", 10_000)
    with pytest.raises(ValueError, match="unknown sketch"):
        sketch_range_boundaries(df, "v", 4, sketch="nope")
    # single range / empty input degenerate cases
    assert sketch_range_boundaries(df, "v", 1) == []
    empty = spark.createDataFrame([], "id long, v double")
    assert sketch_range_boundaries(empty, "v", 4) == []


def test_boundary_ties_collapse(spark):
    """A point mass spanning several target quantiles collapses its
    duplicate boundaries instead of emitting a non-increasing list."""
    from ddsketchy_spark.pipeline.partition import sketch_range_boundaries

    rows = [(i, 42.0) for i in range(900)] + [(1000 + i, float(i))
                                              for i in range(100)]
    df = spark.createDataFrame(rows, "id long, v double")
    bounds = sketch_range_boundaries(df, "v", 8)
    assert bounds == sorted(set(bounds)) and len(bounds) < 7


def test_quantile_range_shards(spark, skewed, tmp_path):
    """The sink mode: balanced shards on the skewed column, boundaries
    recorded in the manifest, and explicit boundaries= reuse keeps an
    increment's membership consistent with the original run."""
    from ddsketchy_spark.pipeline.partition import assign_range_id
    from ddsketchy_spark.pipeline.shards import (
        read_training_shards, write_training_shards)

    path = str(tmp_path / "shards")
    man = write_training_shards(skewed, path, n_shards=4, id_col="row_id",
                                mode="quantile_range", range_col="v")
    assert man["mode"] == "quantile_range" and len(man["boundaries"]) == 3
    df, man2 = read_training_shards(spark, path)
    assert man2["boundaries"] == man["boundaries"]
    n = skewed.count()
    sizes = [s["bytes"] for s in man["shards"]]
    assert len(sizes) == 4 and max(sizes) < 2 * min(sizes)
    assert df.count() == n
    # shard column == assign_range_id under the manifest boundaries
    expect = assign_range_id(skewed, "v", man["boundaries"], "range_id")
    mismatch = (df.select("row_id", "shard")
                .join(expect.select("row_id", "range_id"), "row_id")
                .where("shard != range_id").count())
    assert mismatch == 0
    # increment written under the SAME boundaries shards consistently
    inc = skewed.where("row_id < 100")
    path2 = str(tmp_path / "shards_inc")
    man_inc = write_training_shards(inc, path2, n_shards=4, id_col="row_id",
                                    mode="quantile_range", range_col="v",
                                    boundaries=man["boundaries"])
    assert man_inc["boundaries"] == man["boundaries"]
    df2, _ = read_training_shards(spark, path2)
    moved = (df2.select("row_id", F.col("shard").alias("s2"))
             .join(df.select("row_id", "shard"), "row_id")
             .where("s2 != shard").count())
    assert moved == 0
