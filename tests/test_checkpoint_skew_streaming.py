"""Checkpoint/resume, skew utilities, and streaming tests."""

import json
import os
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from ddsketchy_spark.core.ddsketch import DDSketch
from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.checkpoint import (
    checkpoint_summary,
    checkpointed_sketch_aggregate,
    load_metrics,
)
from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator
from ddsketchy_spark.spark.skew import key_histogram, salted_repartition, suggest_merge_rounds


def test_checkpoint_build_and_resume(spark, token_table_path, tmp_path):
    ckpt = str(tmp_path / "ckpt1")
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=(0.5, 0.99))
    df = read_tokens(spark, token_table_path)

    out1 = checkpointed_sketch_aggregate(df, agg, ckpt)
    metrics = load_metrics(ckpt)
    assert len(metrics) >= 1
    assert sum(m["rows"] for m in metrics) == 20_000
    assert all(m["recomputed"] for m in metrics)
    summary = checkpoint_summary(ckpt)
    assert summary["rows"] == 20_000
    assert summary["blob_bytes"] > 0

    # resume: all partitions reused, estimates bit-identical
    mtimes = {f: os.path.getmtime(os.path.join(ckpt, f)) for f in os.listdir(ckpt)}
    out2 = checkpointed_sketch_aggregate(df, agg, ckpt)
    assert out2["count"] == out1["count"]
    assert out2["p50"] == out1["p50"] and out2["p99"] == out1["p99"]
    assert out2["state"] == out1["state"]
    mtimes2 = {f: os.path.getmtime(os.path.join(ckpt, f)) for f in os.listdir(ckpt)}
    assert mtimes == mtimes2  # nothing rewritten -> nothing recomputed


def test_checkpoint_partial_resume(spark, token_table_path, tmp_path):
    """Simulate a mid-job kill: drop half the checkpoint files; the rerun
    recomputes only those and converges to identical estimates."""
    ckpt = str(tmp_path / "ckpt2")
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=(0.5, 0.999))
    df = read_tokens(spark, token_table_path)
    full = checkpointed_sketch_aggregate(df, agg, ckpt)

    import json as _json
    manifests = sorted(f for f in os.listdir(ckpt) if f.endswith(".json"))
    assert len(manifests) >= 2
    for f in manifests[::2]:  # kill half the partitions (blob + manifest)
        blob = _json.load(open(os.path.join(ckpt, f)))["blob"]
        os.remove(os.path.join(ckpt, blob))
        os.remove(os.path.join(ckpt, f))

    resumed = checkpointed_sketch_aggregate(df, agg, ckpt)
    assert resumed["count"] == full["count"]
    assert resumed["state"] == full["state"]


def test_checkpoint_validate_detects_input_change(spark, token_table_path, tmp_path):
    ckpt = str(tmp_path / "ckpt3")
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=())
    df = read_tokens(spark, token_table_path)
    checkpointed_sketch_aggregate(df, agg, ckpt)
    # different input with the same partition ids -> lineage mismatch
    other = df.withColumn("n_tok", F.col("n_tok") + 1)
    with pytest.raises(Exception, match="lineage mismatch|input changed"):
        checkpointed_sketch_aggregate(other, agg, ckpt, validate=True)


def test_checkpoint_orphan_blob_cannot_poison_resume(
        spark, token_table_path, tmp_path):
    """Commit-protocol gate: the manifest names the exact blob its own
    attempt wrote, so a crash-orphaned blob — legacy fixed name or
    nonce-style, possibly from a run with DIFFERENT lineage — is simply
    never referenced. A fresh run over a dir pre-seeded with garbage
    orphans must produce the same state as a clean run, and every
    committed manifest's blob must exist and not be an orphan."""
    clean = str(tmp_path / "clean")
    dirty = str(tmp_path / "dirty")
    os.makedirs(dirty)
    orphans = {"part-00000.bin", "part-00000-dead-beef.bin"}
    for name in orphans:
        with open(os.path.join(dirty, name), "wb") as f:
            f.write(b"stale-lineage-garbage")

    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=(0.5, 0.99))
    df = read_tokens(spark, token_table_path)
    ref = checkpointed_sketch_aggregate(df, agg, clean)
    out = checkpointed_sketch_aggregate(df, agg, dirty)
    assert out["state"] == ref["state"] and out["p50"] == ref["p50"]
    for m in (f for f in os.listdir(dirty) if f.endswith(".json")):
        blob = json.load(open(os.path.join(dirty, m)))["blob"]
        assert blob not in orphans
        assert os.path.exists(os.path.join(dirty, blob)), blob
    # resume over the still-dirty dir reuses the committed pairs
    out2 = checkpointed_sketch_aggregate(df, agg, dirty)
    assert out2["state"] == ref["state"]


def test_checkpoint_manifest_without_blob_fails_loudly(
        spark, token_table_path, tmp_path):
    """A committed manifest whose blob is gone means the directory was
    externally modified — resume must fail with a clear message, never
    silently recompute against a half-deleted checkpoint."""
    ckpt = str(tmp_path / "ckpt_noblob")
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=())
    df = read_tokens(spark, token_table_path)
    checkpointed_sketch_aggregate(df, agg, ckpt)
    m = sorted(f for f in os.listdir(ckpt) if f.endswith(".json"))[0]
    os.remove(os.path.join(ckpt, json.load(open(os.path.join(ckpt, m)))["blob"]))
    with pytest.raises(Exception, match="checkpoint corrupted"):
        checkpointed_sketch_aggregate(df, agg, ckpt)


def test_skew_histogram_and_salting(spark, token_table_path):
    df = read_tokens(spark, token_table_path)
    hist = key_histogram(df, "source", topk=3).collect()
    assert hist[0]["source"] == "source_0"
    assert hist[0]["fraction"] > 0.5  # the planted 60% skew

    salted = salted_repartition(df, "source", n_salt=16, num_partitions=16)
    assert salted.count() == df.count()
    # without salting, one key -> one partition; with salting it spreads
    plain_parts = (df.repartition(16, F.col("source"))
                   .filter(F.col("source") == "source_0")
                   .select(F.spark_partition_id().alias("p")).distinct().count())
    salted_parts = (salted.filter(F.col("source") == "source_0")
                    .select(F.spark_partition_id().alias("p")).distinct().count())
    assert plain_parts == 1
    assert salted_parts > plain_parts


def test_suggest_merge_rounds():
    assert suggest_merge_rounds(32, 8) == (1, 64)
    rounds, fanout = suggest_merge_rounds(100_000, 8)
    assert rounds == 2 and fanout >= 100_000 // 512


def test_streaming_stateful_by_key(spark, token_table_path, tmp_path):
    """applyInPandasWithState per-key sketches converge to the batch result."""
    from ddsketchy_spark.streaming import stream_ddsketch_by_key
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    schema = spark.read.parquet(token_table_path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "2")
              .parquet(token_table_path))
    out = stream_ddsketch_by_key(stream, "n_tok", ["source"], quantiles=(0.5, 0.99))
    query = (out.writeStream.format("memory").queryName("bykey")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "skck"))
             .trigger(processingTime="1 seconds").start())
    try:
        deadline = time.time() + 120
        expected_total = 20_000
        while time.time() < deadline:
            # latest update per key
            rows = spark.sql(
                "SELECT source, count, p50, p99 FROM ("
                "  SELECT *, row_number() OVER (PARTITION BY source ORDER BY count DESC) rn"
                "  FROM bykey) WHERE rn = 1").collect()
            if rows and sum(r["count"] for r in rows) >= expected_total:
                break
            time.sleep(1)
    finally:
        query.stop()
    got = {r["source"]: r for r in rows}
    batch = {r["source"]: r for r in
             ddsketch_quantiles(spark.read.parquet(token_table_path), "n_tok",
                                by=["source"], quantiles=(0.5, 0.99)).collect()}
    assert got.keys() == batch.keys()
    for s in got:
        assert got[s]["count"] == batch[s]["count"], s
        assert got[s]["p50"] == batch[s]["p50"], s
        assert got[s]["p99"] == batch[s]["p99"], s


def test_streaming_ddsketch(spark, token_table_path, tmp_path):
    """File-source stream over the token table: the running sketch converges
    to the batch-built sketch once all files are processed."""
    from ddsketchy_spark.streaming import stream_ddsketch
    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles

    df_schema = spark.read.parquet(token_table_path).schema
    stream = (spark.readStream.schema(df_schema)
              .option("maxFilesPerTrigger", "2")
              .parquet(token_table_path))
    state_dir = str(tmp_path / "stream_state")
    ckpt_dir = str(tmp_path / "stream_ckpt")
    query, sk = stream_ddsketch(stream, "n_tok", state_dir, ckpt_dir,
                                trigger_seconds=1)
    try:
        deadline = time.time() + 120
        expected = 20_000
        while time.time() < deadline:
            blob = sk.current_blob()
            if blob is not None and DDSketch.from_bytes(blob).count >= expected:
                break
            time.sleep(1)
    finally:
        query.stop()
    final = DDSketch.from_bytes(sk.current_blob())
    assert final.count == expected
    batch = ddsketch_quantiles(spark.read.parquet(token_table_path), "n_tok",
                               quantiles=(0.5, 0.99), engine="arrow")
    assert final.quantile(0.5) == batch["p50"]
    assert final.quantile(0.99) == batch["p99"]


def test_streaming_windowed_watermark(spark, tmp_path):
    """Event-time tumbling windows with a watermark: closed windows emit
    exactly-once sketch rows that match the batch computation; the
    still-open sentinel window does not emit."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles
    from ddsketchy_spark.streaming import stream_ddsketch_windowed

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    rng = np.random.default_rng(11)
    for w in range(3):  # three 1-minute windows
        for src in ("a", "b"):
            for i in range(200):
                ts = base + dt.timedelta(seconds=w * 60 + int(rng.integers(0, 60)))
                rows.append((ts, src, float(rng.exponential(50.0) + w * 10)))
    # sentinel far in the future: advances the watermark past all 3 windows,
    # but its own window stays open (never emitted)
    sentinel = [(base + dt.timedelta(seconds=100_000), "a", 1.0)]

    in_dir = tmp_path / "win_in"
    in_dir.mkdir()
    df_all = spark.createDataFrame(rows, "ts timestamp, source string, value double")
    df_all.coalesce(1).write.mode("overwrite").parquet(str(in_dir / "f1"))
    spark.createDataFrame(sentinel, "ts timestamp, source string, value double") \
        .coalesce(1).write.mode("overwrite").parquet(str(in_dir / "f2"))

    schema = "ts timestamp, source string, value double"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(in_dir / "*")))
    out_dir = str(tmp_path / "win_out")
    query, _ = stream_ddsketch_windowed(
        stream, "value", "ts", out_dir, str(tmp_path / "win_ck"),
        window_duration="1 minute", watermark_delay="10 seconds",
        by=["source"], quantiles=(0.5, 0.99),
        trigger={"availableNow": True})
    query.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    rows_out = {(r["window_start"].minute, r["source"]): r for r in got.collect()}
    assert len(rows_out) == 6  # 3 closed windows x 2 sources; sentinel open

    batch = df_all.withColumn("wmin", F.minute(F.window("ts", "1 minute").start))
    for (minute, src), r in rows_out.items():
        ref = ddsketch_quantiles(
            batch.where((F.col("wmin") == minute) & (F.col("source") == src)),
            "value", quantiles=(0.5, 0.99))
        assert r["count"] == ref["count"], (minute, src)
        assert r["p50"] == ref["p50"], (minute, src)
        assert r["p99"] == ref["p99"], (minute, src)


def test_streaming_generic_sketch_by_key(spark, token_table_path, tmp_path):
    """The generic stateful operator works for non-DDSketch aggregators:
    per-source streaming HLL converges to the batch distinct count."""
    from ddsketchy_spark.spark.companions import HLLAggregator
    from ddsketchy_spark.streaming import stream_sketch_by_key

    schema = spark.read.parquet(token_table_path).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "2")
              .parquet(token_table_path))
    agg = HLLAggregator("doc_id", p=14)
    out = stream_sketch_by_key(stream, agg, ["source"])
    query = (out.writeStream.format("memory").queryName("ghll")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ghllck"))
             .trigger(availableNow=True).start())
    query.awaitTermination(120)
    rows = spark.sql(
        "SELECT source, distinct_est FROM ("
        "  SELECT *, row_number() OVER (PARTITION BY source ORDER BY distinct_est DESC) rn"
        "  FROM ghll) WHERE rn = 1").collect()
    got = {r["source"]: r["distinct_est"] for r in rows}
    df = spark.read.parquet(token_table_path)
    exact = {r["source"]: r["n"] for r in
             df.groupBy("source").agg(F.countDistinct("doc_id").alias("n")).collect()}
    assert got.keys() == exact.keys()
    for s in got:
        assert abs(got[s] - exact[s]) <= 0.05 * exact[s] + 2, s


def test_deterministic_sample(spark, token_table_path):
    from ddsketchy_spark.spark.skew import deterministic_sample

    df = spark.read.parquet(token_table_path)
    s1 = {r["doc_id"] for r in
          deterministic_sample(df, 100, "doc_id").select("doc_id").collect()}
    # same sample regardless of partitioning
    s2 = {r["doc_id"] for r in
          deterministic_sample(df.repartition(17), 100, "doc_id")
          .select("doc_id").collect()}
    assert s1 == s2 and len(s1) == 100
    # different salt -> different (mostly disjoint) sample
    s3 = {r["doc_id"] for r in
          deterministic_sample(df, 100, "doc_id", salt=1)
          .select("doc_id").collect()}
    assert len(s1 & s3) < 20
    # plan is TakeOrdered, not a global sort
    plan = (deterministic_sample(df, 100, "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_streaming_generic_sketch_null_keys(spark, tmp_path):
    """A NULL in a micro-batch coerces int keys to float64 in pandas; the
    generic stateful operator must hash them identically to null-free
    batches (same HLL registers), or distinct counts silently inflate."""
    from ddsketchy_spark.core.hll import HyperLogLog
    from ddsketchy_spark.spark.companions import HLLAggregator
    from ddsketchy_spark.streaming import stream_sketch_by_key

    in_dir = tmp_path / "nullkeys"
    in_dir.mkdir()
    rows = [("g", i % 500 if i % 11 else None) for i in range(5000)]
    spark.createDataFrame(rows, "grp string, uid long") \
        .coalesce(1).write.parquet(str(in_dir / "f1"))

    stream = (spark.readStream.schema("grp string, uid long")
              .parquet(str(in_dir / "*")))
    out = stream_sketch_by_key(stream, HLLAggregator("uid", p=12), ["grp"])
    q = (out.writeStream.format("memory").queryName("nullhll")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "nhck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT max(distinct_est) d FROM nullhll").first()["d"]
    # batch-build the same non-null uids locally: estimates must MATCH
    local = HyperLogLog(12)
    import numpy as np
    local.add_batch(np.array([u for _, u in rows if u is not None],
                             dtype=np.int64))
    assert got == local.cardinality()


def test_rebuild_at_arrow_types_2e53_guard():
    """Int values that survived a NULL-coerced float64 round-trip are
    rebuilt exactly below 2^53 and rejected loudly at/above it (the cast
    back would be silently lossy and corrupt hashed sketch state)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from ddsketchy_spark.streaming.stream_agg import _rebuild_at_arrow_types

    schema = pa.schema([pa.field("uid", pa.int64())])
    # below the cliff: exact rebuild, NaN -> null
    pdf = pd.DataFrame({"uid": [1.0, np.nan, float(2**53 - 1)]})
    tbl = _rebuild_at_arrow_types(pdf, schema, ["uid"])
    assert tbl.column("uid").to_pylist() == [1, None, 2**53 - 1]
    # at/above the cliff: loud failure, not a wrong key
    bad = pd.DataFrame({"uid": [np.nan, float(2**53)]})
    with pytest.raises(ValueError, match="2\\^53"):
        _rebuild_at_arrow_types(bad, schema, ["uid"])
    # a genuinely-float column at a float Arrow type is untouched
    fschema = pa.schema([pa.field("v", pa.float64())])
    fpdf = pd.DataFrame({"v": [1.5, float(2**60)]})
    assert _rebuild_at_arrow_types(fpdf, fschema, ["v"]).column(
        "v").to_pylist() == [1.5, float(2**60)]


def test_streaming_sliding_windows(spark, tmp_path):
    """Sliding windows (1 min window, 30 s slide): each event lands in two
    windows; closed-window counts must match the batch computation."""
    import datetime as dt

    from ddsketchy_spark.streaming import stream_ddsketch_windowed

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [(base + dt.timedelta(seconds=s), float(s % 50 + 1))
            for s in range(0, 120)]
    sentinel = [(base + dt.timedelta(seconds=100_000), 1.0)]
    in_dir = tmp_path / "slide_in"
    in_dir.mkdir()
    spark.createDataFrame(rows, "ts timestamp, value double") \
        .coalesce(1).write.parquet(str(in_dir / "f1"))
    spark.createDataFrame(sentinel, "ts timestamp, value double") \
        .coalesce(1).write.parquet(str(in_dir / "f2"))

    stream = (spark.readStream.schema("ts timestamp, value double")
              .option("maxFilesPerTrigger", "1").parquet(str(in_dir / "*")))
    out_dir = str(tmp_path / "slide_out")
    query, _ = stream_ddsketch_windowed(
        stream, "value", "ts", out_dir, str(tmp_path / "slide_ck"),
        window_duration="1 minute", slide_duration="30 seconds",
        watermark_delay="10 seconds", quantiles=(0.5,),
        trigger={"availableNow": True})
    query.awaitTermination(180)

    got = {(r["window_start"].minute, r["window_start"].second): r["count"]
           for r in spark.read.parquet(out_dir).collect()}
    # windows starting at :59:30(partial), :00:00, :00:30, :01:00, :01:30(partial)
    assert got[(0, 0)] == 60 and got[(0, 30)] == 60
    assert got[(59, 30)] == 30 and got[(1, 30)] == 30
    assert sum(got.values()) == 240  # every event counted twice


def test_streaming_sessions(spark, tmp_path):
    """Session windows: two bursts per key separated by > gap become two
    emitted sessions once the watermark passes; counts/quantiles match a
    batch DDSketch over each burst."""
    import datetime as dt

    import numpy as np

    from ddsketchy_spark import DDSketch
    from ddsketchy_spark.streaming import stream_ddsketch_sessions

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    rng = np.random.default_rng(5)
    bursts = {}
    for key in ("u1", "u2"):
        for b, offset in enumerate((0, 300)):   # two bursts, 5 min apart
            vs = rng.exponential(20.0, 50) + b * 5
            bursts[(key, b)] = vs
            for i, v in enumerate(vs):
                ts = base + dt.timedelta(seconds=offset + (i % 20))
                rows.append((ts, key, float(v)))
    sentinel = [(base + dt.timedelta(seconds=100_000), "u1", 1.0)]

    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    spark.createDataFrame(rows, "ts timestamp, user string, value double") \
        .coalesce(1).write.parquet(str(in_dir / "f1"))
    spark.createDataFrame(sentinel, "ts timestamp, user string, value double") \
        .coalesce(1).write.parquet(str(in_dir / "f2"))

    stream = (spark.readStream.schema("ts timestamp, user string, value double")
              .option("maxFilesPerTrigger", "1").parquet(str(in_dir / "*")))
    out = stream_ddsketch_sessions(stream, "value", "ts", ["user"],
                                   gap="60 seconds",
                                   watermark_delay="5 seconds",
                                   quantiles=(0.5, 0.99))
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.sql(
        "SELECT user, session_start, count, p50, p99 FROM sess "
        "ORDER BY user, session_start").collect()
    # 2 users x 2 closed sessions (sentinel's own session stays open)
    assert len(got) == 4
    for r in got:
        b = 0 if r["session_start"].minute == 0 else 1
        ref = DDSketch(0.01)
        ref.add_batch(bursts[(r["user"], b)])
        assert r["count"] == 50, (r["user"], b)
        assert r["p50"] == ref.quantile(0.5), (r["user"], b)
        assert r["p99"] == ref.quantile(0.99), (r["user"], b)


def test_streaming_sessions_bridge_and_timezone(spark, tmp_path):
    """A late-but-in-watermark event bridging two open sessions merges them
    into ONE emitted session; and a non-UTC session timezone must not skew
    the timeout/watermark arithmetic (epoch is computed JVM-side)."""
    import datetime as dt

    from ddsketchy_spark.streaming import stream_ddsketch_sessions

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        base = dt.datetime(2026, 1, 1, 0, 0, 0)
        mk = lambda s, v: (base + dt.timedelta(seconds=s), "k", float(v))
        burst_a = [mk(s, 10 + s) for s in range(0, 11)]       # ends t=10
        burst_b = [mk(s, 20 + s) for s in range(100, 111)]    # starts t=100
        bridge = [mk(60, 99.0)]                               # joins A and B
        sentinel = [mk(100_000, 1.0)]

        in_dir = tmp_path / "bridge_in"
        in_dir.mkdir()
        schema = "ts timestamp, user string, value double"
        for i, rows in enumerate((burst_a + burst_b, bridge, sentinel)):
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.parquet(str(in_dir / f"f{i}"))

        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(str(in_dir / "*")))
        out = stream_ddsketch_sessions(
            stream, "value", "ts", ["user"], gap="60 seconds",
            watermark_delay="600 seconds", quantiles=(0.5,))
        q = (out.writeStream.format("memory").queryName("bridge")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "bridge_ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

        rows = spark.sql(
            "SELECT count, session_start, session_end FROM bridge").collect()
        assert len(rows) == 1          # A + bridge + B merged, emitted once
        assert rows[0]["count"] == 23  # 11 + 11 + 1
        span = (rows[0]["session_end"] - rows[0]["session_start"]).total_seconds()
        assert span == 110.0
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_streaming_dedup_exact(spark, tmp_path):
    """File-source document stream with planted duplicates: exactly one
    row per distinct text survives (the first-seen), NULL-text rows all
    pass through; matches batch dedup_exact's digest law."""
    from ddsketchy_spark.pipeline.dedup import dedup_exact
    from ddsketchy_spark.streaming import stream_dedup_exact

    src = str(tmp_path / "docs_src")
    texts = [f"document number {i % 40} body text" for i in range(120)]
    rows = [(i, texts[i]) for i in range(120)]
    rows += [(1000, None), (1001, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.repartition(6).write.parquet(src)

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    out = stream_dedup_exact(stream)
    query = (out.writeStream.format("memory").queryName("sdedup")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "sdck"))
             .trigger(availableNow=True).start())
    query.awaitTermination(120)
    got = spark.sql("SELECT doc_id, text FROM sdedup").collect()
    kept_texts = [r["text"] for r in got if r["text"] is not None]
    assert sorted(kept_texts) == sorted({t for t in texts})
    assert sum(r["text"] is None for r in got) == 2
    # batch operator keeps the same distinct-text count
    assert dedup_exact(df).count() == 40 + 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """The bounded-state variant: duplicates within the watermark window
    are dropped; every distinct text still appears at least once."""
    from ddsketchy_spark.streaming import stream_dedup_exact

    src = str(tmp_path / "docs_ts_src")
    rows = [(i, f"2024-01-01 10:{i % 5:02d}:00", f"text body {i % 10}")
            for i in range(60)]
    from pyspark.sql import functions as F

    df = (spark.createDataFrame(rows, "doc_id long, ts_s string, text string")
          .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s"))
    df.repartition(4).write.parquet(src)

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_dedup_exact(stream, ts_col="ts", watermark_delay="1 hour")
    query = (out.writeStream.format("memory").queryName("sdedup_wm")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "sdwmck"))
             .trigger(availableNow=True).start())
    query.awaitTermination(120)
    got = spark.sql("SELECT text FROM sdedup_wm").collect()
    seen = [r["text"] for r in got]
    assert set(seen) == {f"text body {i}" for i in range(10)}
    # all events fall inside one watermark window -> exactly one row each
    assert len(seen) == 10


def test_sample_by_group(spark, sf001_dir):
    """Deterministic k-per-group sampling: exact per-group counts, same
    rows under any partitioning, equals the naive full-window reference,
    and the exact fallback path (forced via a tiny oversample) returns the
    identical sample."""
    from pyspark.sql import Window, functions as F

    from ddsketchy_spark.spark.skew import sample_by_group

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    k = 3
    s1 = sample_by_group(docs, ["source"], k, "doc_id")
    rows = s1.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    sizes = {r["source"]: r["cnt"] for r in
             docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    for src, n in sizes.items():
        assert len(by_src.get(src, set())) == min(k, n), src
    # reference: naive full window (test scale only)
    h = F.xxhash64(F.col("doc_id"), F.lit(0))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ref = {(r["source"], r["doc_id"]) for r in
           docs.withColumn("_rk", F.row_number().over(w))
               .where(F.col("_rk") <= k).collect()}
    got = {(r["source"], r["doc_id"]) for r in rows}
    assert got == ref
    # partitioning-independence
    again = {(r["source"], r["doc_id"]) for r in
             sample_by_group(docs.repartition(13), ["source"], k,
                             "doc_id").collect()}
    assert again == got
    # forced-fallback path (prefilter passes ~nothing) is still exact
    fb = {(r["source"], r["doc_id"]) for r in
          sample_by_group(docs, ["source"], k, "doc_id",
                          oversample=1e-6).collect()}
    assert fb == got


def test_streaming_dedup_near_state_ttl(spark, tmp_path):
    """state_ttl_ms evicts idle (band, bucket) state: a duplicate arriving
    after its bucket expired is no longer paired with pre-expiry members,
    intra-batch pairs still emit, and the state-store row count shrinks vs
    the NoTimeout regime. Three triggers: the middle (unrelated) batch
    advances processing time so the idle buckets' timeouts fire."""
    import time as _time

    from ddsketchy_spark.streaming import stream_dedup_near

    T = "the quick brown fox jumps over the lazy dog again and again"
    U = "completely unrelated words about quasars pulsars and nebulae"
    src = str(tmp_path / "ttl_src")
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, T), (2, T)], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame([(10, U)], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    _time.sleep(1.1)
    spark.createDataFrame([(3, T), (4, T)], schema).coalesce(1) \
        .write.mode("append").parquet(src)

    def run(name, **kw):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1")
                  .option("latestFirst", "false").parquet(src))
        out = stream_dedup_near(stream, threshold=0.5, num_perm=32,
                                bands=8, **kw)
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / f"{name}_ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        pairs = {(r["id_a"], r["id_b"]) for r in
                 spark.sql(f"SELECT * FROM {name}").collect()}
        return pairs, state_rows

    ttl_pairs, ttl_rows = run("near_ttl", state_ttl_ms=1)
    no_pairs, no_rows = run("near_nottl")
    # without TTL the batch-3 copies pair with the expired-batch members
    assert {(1, 2), (3, 4), (1, 3), (1, 4), (2, 3), (2, 4)} <= no_pairs
    # with TTL: intra-batch pairs survive, cross-expiry pairs are gone
    assert (1, 2) in ttl_pairs and (3, 4) in ttl_pairs
    assert not any(a in (1, 2) and b in (3, 4) for a, b in ttl_pairs)
    # and total state is strictly smaller (expired buckets removed)
    assert ttl_rows < no_rows, (ttl_rows, no_rows)


def test_streaming_dedup_near_matches_batch(spark, sf001_dir, tmp_path):
    """Stateful streaming LSH: the deduplicated emitted pair set equals the
    batch minhash_lsh_pairs candidates at the same threshold, across
    micro-batch boundaries (one file per trigger), with est_jaccard values
    matching bit-for-bit."""
    from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs
    from ddsketchy_spark.streaming import stream_dedup_near

    base = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    dup = (base.filter("doc_id < 20")
           .withColumn("doc_id", F.col("doc_id") + 100000))
    docs = base.unionByName(dup).select("doc_id", "text")
    src = str(tmp_path / "near_src")
    docs.repartition(5).write.parquet(src)

    kw = dict(num_perm=64, bands=16)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = stream_dedup_near(stream, threshold=0.5, **kw)
    query = (out.writeStream.format("memory").queryName("near_pairs")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "near_ck"))
             .trigger(availableNow=True).start())
    query.awaitTermination(180)
    got = {}
    for r in spark.sql("SELECT * FROM near_pairs").collect():
        got[(r["id_a"], r["id_b"])] = r["est_jaccard"]

    batch = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in
             minhash_lsh_pairs(docs, verify="local", **kw).collect()
             if r["est_jaccard"] >= 0.5}
    assert set(got) == set(batch)
    for k in batch:
        assert got[k] == batch[k], k
    # planted exact dups all present at est 1.0
    for i in range(20):
        assert got.get((i, i + 100000)) == 1.0, i


def test_streaming_quality_filter(spark, tmp_path):
    """Corpus cleaning on a STREAM: redact_pii + quality_filter are pure
    projections, so they run unchanged under Structured Streaming —
    file-source micro-batches must reproduce the batch result row for
    row (keep flags AND drop reasons)."""
    from pyspark.sql import functions as F

    from ddsketchy_spark.pipeline.text import quality_filter, redact_pii

    rows = [(i, ("good words flow nicely here with several extra tokens"
                 if i % 3 else "x y")) for i in range(60)]
    rows.append((100, None))
    rows.append((101, "mail me at a@b.co now or never says the dog"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "qf_src")
    df.repartition(4).write.parquet(src)

    def clean(frame):
        return quality_filter(redact_pii(frame),
                              text_col="text_redacted", min_words=5)

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (clean(stream)
         .select("doc_id", "keep", "drop_reason", "n_email")
         .writeStream.format("memory").queryName("sqf")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "qf_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["keep"], r["drop_reason"], r["n_email"])
           for r in spark.sql("SELECT * FROM sqf").collect()}
    batch = {r["doc_id"]: (r["keep"], r["drop_reason"], r["n_email"])
             for r in clean(df)
             .select("doc_id", "keep", "drop_reason", "n_email").collect()}
    assert got == batch and len(got) == 62
    assert not got[100][0] and got[100][1] == "null_text"
    assert not got[0][0] and got[0][1] == "too_few_words"
    assert got[101][2] == 1 and got[4][0]


def test_streaming_split_and_range_assign(spark, tmp_path):
    """split_corpus and assign_range_id are pure stateless projections,
    so they run unchanged under Structured Streaming: file-source
    micro-batches must reproduce the batch assignment row for row (the
    deterministic-law guarantee is exactly what makes a streaming
    increment's split/shard membership consistent with the batch run)."""
    from ddsketchy_spark.pipeline.partition import assign_range_id
    from ddsketchy_spark.pipeline.split import split_corpus

    rows = [(i, "s%d" % (i % 5), float(i * 7 % 101)) for i in range(80)]
    rows.append((None, None, None))
    df = spark.createDataFrame(rows, "doc_id long, grp string, v double")
    src = str(tmp_path / "sp_src")
    df.repartition(4).write.parquet(src)

    def xform(frame):
        out = split_corpus(frame, {"train": 0.8, "val": 0.1, "test": 0.1},
                           group_col="grp")
        return assign_range_id(out, "v", [25.0, 50.0, 75.0])

    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (xform(stream)
         .select("doc_id", "split", "range_id")
         .writeStream.format("memory").queryName("ssp")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sp_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["split"], r["range_id"])
           for r in spark.sql("SELECT * FROM ssp").collect()}
    batch = {r["doc_id"]: (r["split"], r["range_id"])
             for r in xform(df).select("doc_id", "split", "range_id")
             .collect()}
    assert got == batch and len(got) == 81
    assert got[None] == (None, None)
    splits_per_grp = {}
    for i in range(80):
        splits_per_grp.setdefault(i % 5, set()).add(got[i][0])
    assert all(len(s) == 1 for s in splits_per_grp.values())


def test_take_top_frac_by_group_sample_law(spark):
    """method='sample' row-for-row vs the pure-NumPy re-derivation of the
    full law (Spark-exact xxhash64 sample membership -> exact lower
    quantile of the sample -> >= threshold), partition-invariant, and
    exact on groups that fit in the sample."""
    import numpy as np

    from ddsketchy_spark.core.hashing import spark_xxhash64
    from ddsketchy_spark.spark.skew import take_top_frac_by_group

    rng = np.random.default_rng(11)
    rows = [(int(i), "s%d" % (i % 4), float(v))
            for i, v in enumerate(rng.normal(0.0, 1.0, 3000))]
    rows += [(9000 + j, "tiny", float(j)) for j in range(30)]
    rows += [(9900, None, 1.0), (9901, "s0", None)]  # excluded
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    frac, sk = 0.25, 64
    out = take_top_frac_by_group(df, frac, "v", "source",
                                 key_col="doc_id", sample_k=sk)
    got = {r["doc_id"] for r in out.collect()}

    byg = {}
    for i, s, v in rows:
        if s is not None and v is not None:
            byg.setdefault(s, []).append((i, v))
    expect = set()
    for s, members in byg.items():
        ids = np.array([i for i, _ in members], dtype=np.int64)
        h = spark_xxhash64(ids, (0,)).astype(np.int64)  # salt 0, signed order
        order = np.lexsort((ids, h))
        samp = sorted(members[j][1] for j in order[:min(sk, len(members))])
        idx = min(len(samp), int(np.floor((1 - frac) * len(samp))) + 1)
        t = samp[idx - 1]
        expect |= {i for i, v in members if v >= t}
    assert got == expect
    # tiny group (30 <= sample_k): exactly ceil(frac * n) survivors
    assert sum(1 for i in got if i >= 9000) == 8  # ceil(0.25*30)
    got2 = {r["doc_id"] for r in
            take_top_frac_by_group(df.repartition(13), frac, "v", "source",
                                   key_col="doc_id", sample_k=sk).collect()}
    assert got2 == got
    assert 9900 not in got and 9901 not in got


def test_take_top_frac_by_group_kll_and_guards(spark):
    """method='kll' (no key column): kept fraction within the k=200 rank
    error; keep_threshold exposes the cut; validation errors."""
    import numpy as np
    import pytest as pt

    from ddsketchy_spark.spark.skew import take_top_frac_by_group

    rng = np.random.default_rng(5)
    rows = [(int(i), "g%d" % (i % 2), float(v))
            for i, v in enumerate(rng.lognormal(1.0, 0.8, 20000))]
    df = spark.createDataFrame(rows, "doc_id long, source string, v double")
    out = take_top_frac_by_group(df, 0.1, "v", "source", method="kll",
                                 keep_threshold=True)
    per = {r["source"]: r["count"]
           for r in out.groupBy("source").count().collect()}
    for s, c in per.items():
        assert abs(c / 10000 - 0.1) < 0.03, (s, c)
    assert "_thr" in out.columns
    # thresholds really are per-group cuts: every kept row clears its own
    mn = out.where(F.col("v") < F.col("_thr")).count()
    assert mn == 0
    with pt.raises(ValueError, match="frac"):
        take_top_frac_by_group(df, 0.0, "v", "source", key_col="doc_id")
    with pt.raises(ValueError, match="method"):
        take_top_frac_by_group(df, 0.5, "v", "source", method="nope")
    with pt.raises(ValueError, match="key_col"):
        take_top_frac_by_group(df, 0.5, "v", "source")
    assert take_top_frac_by_group(df, 1.0, "v", "source",
                                  key_col="doc_id").count() == 20000


def test_checkpoint_file_uri_no_posix_io(spark, token_table_path, tmp_path):
    """Checkpoint dir given as a ``file:/`` URI: ``os.open``/``os.path``
    would choke on (or mis-resolve) the scheme, so a green run proves every
    read/write — executor blob writes included — goes through the
    fsio layer (pyarrow.fs), i.e. the same code path that serves
    hdfs:// and s3:// on a real cluster."""
    local = tmp_path / "ckpt_uri"
    ckpt = "file://" + str(local)
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=(0.5, 0.99))
    df = read_tokens(spark, token_table_path)
    out1 = checkpointed_sketch_aggregate(df, agg, ckpt)
    # blobs + manifests landed at the real local path behind the URI
    assert any(f.suffix == ".bin" for f in local.iterdir())
    assert checkpoint_summary(ckpt)["rows"] == 20_000
    # resume through the URI: bit-identical, nothing rewritten
    mtimes = {f.name: f.stat().st_mtime for f in local.iterdir()}
    out2 = checkpointed_sketch_aggregate(df, agg, ckpt)
    assert out2["state"] == out1["state"]
    assert {f.name: f.stat().st_mtime for f in local.iterdir()} == mtimes


def test_streaming_state_file_uri_and_generations(spark, token_table_path, tmp_path):
    """StreamingSketch over a ``file:/`` URI: generation-file commits are
    idempotent under replay, GC leaves exactly the newest generation, and
    a restarted instance resumes from it."""
    from ddsketchy_spark.streaming import StreamingSketch

    sdir = tmp_path / "stream_state_uri"
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=())
    sk = StreamingSketch(agg, "file://" + str(sdir))
    df = read_tokens(spark, token_table_path).limit(500)
    sk.process_batch(df, 0)
    sk.process_batch(df, 1)
    blob = sk.current_blob()
    assert DDSketch.from_bytes(blob).count == 1000
    sk.process_batch(df, 1)  # replayed micro-batch: no-op
    assert sk.current_blob() == blob
    gens = sorted(f.name for f in sdir.iterdir() if f.name.startswith("state-"))
    assert gens == ["state-%020d.bin" % 1]  # older generation GC'd
    # a fresh instance (restart) resumes from the surviving generation
    sk2 = StreamingSketch(agg, "file://" + str(sdir))
    assert sk2.current_blob() == blob
    sk2.process_batch(df, 2)
    assert DDSketch.from_bytes(sk2.current_blob()).count == 1500


def test_streaming_state_legacy_single_file_migration(spark, token_table_path,
                                                      tmp_path):
    """A stream upgraded from the pre-generation layout (single overwritten
    ``state.bin``, same 8-byte batch-id header) must RESUME from it — not
    silently restart from batch -1 — and the first new commit supersedes
    and GCs the legacy file."""
    from ddsketchy_spark.streaming import StreamingSketch

    sdir = tmp_path / "legacy_state"
    sdir.mkdir()
    agg = DDSketchAggregator("n_tok", alpha=0.01, quantiles=())
    df = read_tokens(spark, token_table_path).limit(500)

    # fabricate the legacy layout: state.bin at batch 5 holding 500 values
    tmp_sk = StreamingSketch(agg, str(tmp_path / "legacy_builder"))
    tmp_sk.process_batch(df, 5)
    legacy_payload = ((5).to_bytes(8, "little", signed=True)
                      + tmp_sk.current_blob())
    (sdir / "state.bin").write_bytes(legacy_payload)

    sk = StreamingSketch(agg, str(sdir))
    assert DDSketch.from_bytes(sk.current_blob()).count == 500
    sk.process_batch(df, 5)  # replay of the legacy batch: idempotent no-op
    assert DDSketch.from_bytes(sk.current_blob()).count == 500
    sk.process_batch(df, 6)  # new batch merges INTO the migrated state
    assert DDSketch.from_bytes(sk.current_blob()).count == 1000
    names = sorted(f.name for f in sdir.iterdir())
    assert names == ["state-%020d.bin" % 6]  # legacy file GC'd
