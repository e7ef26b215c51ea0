"""Gap-based sessionization: boundary law (split only at diff > gap,
exactly session_window's semantics), tie handling, engine parity
(session_window aggregate vs per-event labeling), and the streaming path.
"""

import datetime as dt

import pytest

from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp_ntz, user string, value double")


BASE = dt.datetime(2026, 3, 1, 0, 0, 0)


def _t(s):
    return BASE + dt.timedelta(seconds=s)


def test_session_boundary_exact_gap_splits(spark):
    from ddsketchy_spark.spark.sessions import sessionize

    df = _mk(spark, [
        (_t(0), "a", 1.0), (_t(60), "a", 2.0),    # diff == gap -> SAME session
        (_t(121), "a", 3.0),                      # 61 after 60 -> NEW session
        (_t(181), "a", 4.0),                      # 60 after 121 -> same
    ])
    got = sorted(sessionize(df, "ts", 60, by=["user"]).collect(),
                 key=lambda r: r["session_start"])
    assert [(r["session_start"], r["session_end"], r["n_events"]) for r in got] == [
        (_t(0), _t(60), 2), (_t(121), _t(181), 2)]


def test_session_ties_one_session(spark):
    from ddsketchy_spark.spark.sessions import label_sessions, sessionize

    df = _mk(spark, [
        (_t(0), "a", 1.0), (_t(0), "a", 2.0), (_t(0), "a", 3.0),
        (_t(200), "a", 4.0), (_t(200), "a", 5.0),
    ])
    got = sessionize(df, "ts", 60, by=["user"]).collect()
    assert sorted((r["session_start"], r["n_events"]) for r in got) == [
        (_t(0), 3), (_t(200), 2)]
    lab = label_sessions(df, "ts", 60, by=["user"]).collect()
    assert sorted((r["session_start"], r["value"]) for r in lab) == [
        (_t(0), 1.0), (_t(0), 2.0), (_t(0), 3.0),
        (_t(200), 4.0), (_t(200), 5.0)]


def test_session_null_rows_dropped_and_guards(spark):
    from ddsketchy_spark.spark.sessions import label_sessions, sessionize

    df = _mk(spark, [
        (_t(0), "a", 1.0), (None, "a", 2.0), (_t(10), None, 3.0)])
    assert sessionize(df, "ts", 60, by=["user"]).count() == 1
    assert label_sessions(df, "ts", 60, by=["user"]).count() == 1
    with pytest.raises(ValueError):
        sessionize(df, "ts", 0, by=["user"])
    with pytest.raises(ValueError):
        label_sessions(df, "ts", -1, by=["user"])


def test_sessionize_matches_label_sessions_on_events(spark, sf001_dir):
    from ddsketchy_spark.spark.sessions import label_sessions, sessionize

    ev = spark.read.parquet(f"{sf001_dir}/events.parquet")
    s = sessionize(ev, "ts", 21600, by=["user_id"],
                   aggs=[F.round(F.sum("value"), 6).alias("vsum")])
    lab = (label_sessions(ev, "ts", 21600, by=["user_id"])
           .groupBy("user_id", "session_start")
           .agg(F.max("ts").alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 6).alias("vsum")))
    a = set(map(tuple, s.collect()))
    b = set(map(tuple, lab.collect()))
    assert a == b and len(a) > 0
    # every event's session_start is the min ts of its session
    n_ev = ev.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull()).count()
    assert label_sessions(ev, "ts", 21600, by=["user_id"]).count() == n_ev


def test_sessionize_streaming_append(spark, tmp_path):
    """The same sessionize() call runs on a watermarked stream: closed
    sessions emit once (append mode), the sentinel's own session stays
    open."""
    from ddsketchy_spark.spark.sessions import sessionize

    def _mk_tz(rows):
        return spark.createDataFrame(
            rows, "ts timestamp, user string, value double")

    rows = [(_t(0), "u1", 1.0), (_t(30), "u1", 2.0),
            (_t(300), "u1", 3.0),
            (_t(0), "u2", 5.0)]
    sentinel = [(_t(100_000), "u1", 9.0)]
    in_dir = tmp_path / "sess_in"
    in_dir.mkdir()
    _mk_tz(rows).coalesce(1).write.parquet(str(in_dir / "f1"))
    _mk_tz(sentinel).coalesce(1).write.parquet(str(in_dir / "f2"))

    # watermarks require TIMESTAMP (NTZ is rejected) — batch sessionize
    # accepts both, the stream path needs the tz-aware type
    stream = (spark.readStream
              .schema("ts timestamp, user string, value double")
              .option("maxFilesPerTrigger", "1").parquet(str(in_dir / "*")))
    out = sessionize(stream.withWatermark("ts", "5 seconds"),
                     "ts", 60, by=["user"],
                     aggs=[F.sum("value").alias("vsum")])
    q = (out.writeStream.format("memory").queryName("sessionize_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = sorted(
        spark.sql("SELECT * FROM sessionize_stream").collect(),
        key=lambda r: (r["user"], r["session_start"]))
    assert [(r["user"], r["session_start"], r["n_events"], r["vsum"])
            for r in got] == [
        ("u1", _t(0), 2, 3.0), ("u1", _t(300), 1, 3.0),
        ("u2", _t(0), 1, 5.0)]
