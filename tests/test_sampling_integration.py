"""The new sampler aggregators compose with the generic two-phase
machinery: checkpoint/resume (north-rule resumability) and incremental
rollups — the blobs are ordinary SketchAggregator states, so both must
work without any sampler-specific code."""

from ddsketchy_spark.core.sampling import KMVSample, WeightedSample


def test_kmv_sample_checkpointed_global(spark, sf001_dir, tmp_path):
    from ddsketchy_spark.spark.checkpoint import (
        checkpoint_summary,
        checkpointed_sketch_aggregate,
    )
    from ddsketchy_spark.spark.sampling import (
        KMVSampleAggregator,
        kmv_sample_native,
    )

    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    agg = KMVSampleAggregator("o_custkey", k=30, seed=2)
    out = checkpointed_sketch_aggregate(
        orders, agg, str(tmp_path / "ck"), validate=True)
    native = kmv_sample_native(orders, "o_custkey", k=30, seed=2).collect()
    assert out["sample"] == [r["key"] for r in native]
    # resume: a second run reuses the stage-1 blobs and lands identically
    out2 = checkpointed_sketch_aggregate(orders, agg, str(tmp_path / "ck"))
    assert out2["sample"] == out["sample"]
    s = checkpoint_summary(str(tmp_path / "ck"))
    assert s["rows"] == orders.count() and s["partitions"] >= 1


def test_kmv_sample_rollup_incremental(spark, sf001_dir, tmp_path):
    """Two incremental rollup updates (even/odd halves) must land on the
    same per-group sample as one batch build — bottom-k-by-hash is a pure
    function of the key SET, so snapshot merging cannot drift it."""
    from ddsketchy_spark.spark.rollup import read_rollup, update_rollup
    from ddsketchy_spark.spark.sampling import (
        KMVSampleAggregator,
        kmv_sample_state,
    )

    orders = spark.read.parquet(f"{sf001_dir}/orders.parquet")
    agg = KMVSampleAggregator("o_custkey", k=10, seed=1)
    root = str(tmp_path / "roll")
    v0 = update_rollup(spark, root, orders.where("o_orderkey % 2 = 0"),
                       agg, ["o_orderstatus"])
    v1 = update_rollup(spark, root, orders.where("o_orderkey % 2 = 1"),
                       agg, ["o_orderstatus"])
    assert (v0, v1) == (0, 1)
    rolled = {r["o_orderstatus"]: list(r["sample"])
              for r in read_rollup(spark, root, agg, ["o_orderstatus"]).collect()}
    batch = {r["o_orderstatus"]: list(r["sample"])
             for r in kmv_sample_state(orders, "o_custkey",
                                       by=["o_orderstatus"],
                                       k=10, seed=1).collect()}
    assert rolled == batch


def test_weighted_sample_state_blob_resumes(spark, sf001_dir, tmp_path):
    """Weighted-sample states checkpoint and merge across runs like any
    other sketch blob (continue-after-restore)."""
    from ddsketchy_spark.spark.sampling import (
        weighted_sample_native,
        weighted_sample_state,
    )

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    first = docs.where("doc_id % 2 = 0")
    second = docs.where("doc_id % 2 = 1")
    blob1 = weighted_sample_state(first, "doc_id", "n_chars",
                                  k=20, seed=6, keep_state=True)["state"]
    # restore from bytes, fold in the second half's state
    blob2 = weighted_sample_state(second, "doc_id", "n_chars",
                                  k=20, seed=6, keep_state=True)["state"]
    merged = WeightedSample.from_bytes(blob1).merge(
        WeightedSample.from_bytes(blob2))
    full = weighted_sample_native(docs, "doc_id", "n_chars",
                                  k=20, seed=6).collect()
    assert merged.keys() == [r["key"] for r in full]


def test_kmv_state_survives_serde_merge_chain(spark):
    """A long restore->add->serialize chain (the streaming crawl shape)
    equals the one-shot build."""
    keys = [f"k{i}" for i in range(5000)]
    acc = KMVSample(k=25, seed=0).to_bytes()
    for i in range(0, 5000, 500):
        sk = KMVSample.from_bytes(acc)
        sk.add_batch(keys[i:i + 500])
        acc = sk.to_bytes()
    bulk = KMVSample(k=25, seed=0)
    bulk.add_batch(keys)
    assert KMVSample.from_bytes(acc).entries == bulk.entries
