"""Structured Streaming sketch aggregation.

Sketches are the natural streaming aggregate: bounded state, associative
merge, no retraction needed. The pattern here is ``foreachBatch``: each
micro-batch runs the SAME two-phase batch aggregation (vectorized build +
tree merge), and the resulting micro-batch state blob merges into a running
state persisted next to the stream's checkpoint dir. Because merge is
associative and order-independent, a restarted stream that replays a
micro-batch converges to the same estimates as an uninterrupted one,
provided batch ids are deduplicated — which we do by recording the last
merged ``batch_id`` (the standard idempotent-foreachBatch recipe).

For grouped/windowed streaming quantiles, compose with watermarked
``groupBy(window(...))`` upstream and apply the same per-batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..core.ddsketch import DDSketch
from ..pipeline import fsio
from ..spark.agg import SketchAggregator, merge_global, build_partials
from ..spark.ddsketch_agg import DDSketchAggregator


class StreamingSketch:
    """Running sketch state with idempotent micro-batch merges.

    ``state_dir`` is any Hadoop-addressable URI (``/path``, ``file:/``,
    ``hdfs://``, ``s3://``/``s3a://``) — all I/O goes through
    ``pipeline/fsio.py``, never ``os.*``."""

    _HDR_LEN = 8  # little-endian batch_id prefixed to the blob

    def __init__(self, agg: SketchAggregator, state_dir: str) -> None:
        self.agg = agg
        self.state_dir = state_dir.rstrip("/")
        # one-time legacy-layout migration probe (see process_batch): a
        # pre-generation ``state.bin`` can only predate the first commit,
        # so once seen absent the per-commit exists() RPC is skipped for
        # the stream's whole lifetime
        self._legacy_gone = False
        fsio.fs_mkdirs(state_dir)

    # batch_id and blob live in ONE file whose NAME is the generation
    # (``state-<batch_id>.bin``), committed by one tmp-file rename. A crash
    # can never leave the id and the state out of sync, and — unlike
    # rename-over-the-previous-file, which HDFS refuses and S3 can only
    # emulate with a delete window — committing to a fresh name then
    # garbage-collecting older generations is crash-safe on every store:
    # at least one complete generation exists at all times, and the loader
    # simply takes the newest.

    def _generation_names(self) -> list[str]:
        return [f for f in fsio.fs_list_names(self.state_dir)
                if f.startswith("state-") and f.endswith(".bin")]

    def _load(self) -> tuple[bytes | None, int]:
        gens = self._generation_names()
        if not gens:
            # legacy single-file layout (pre-generation ``state.bin``,
            # same 8-byte-header payload): load it rather than silently
            # restarting an upgraded stream from batch -1; the first new
            # commit supersedes it and GCs the legacy file
            if fsio.fs_exists(f"{self.state_dir}/state.bin"):
                raw = fsio.fs_read_bytes(f"{self.state_dir}/state.bin")
            else:
                return None, -1
        else:
            # zero-padded batch ids make lexicographic max the numeric max
            raw = fsio.fs_read_bytes(f"{self.state_dir}/{max(gens)}")
        last_batch = int.from_bytes(raw[: self._HDR_LEN], "little", signed=True)
        return raw[self._HDR_LEN:], last_batch

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        blob, last_batch = self._load()
        if batch_id <= last_batch:
            return  # replayed micro-batch: already merged (idempotence)
        partials = build_partials(batch_df, self.agg)
        batch_blob = merge_global(partials, self.agg, fanout=16)
        merged = (self.agg.merge_blobs([blob, batch_blob])
                  if blob is not None else batch_blob)
        name = f"state-{int(batch_id):020d}.bin"
        payload = (int(batch_id).to_bytes(self._HDR_LEN, "little", signed=True)
                   + merged)
        fsio.fs_write_atomic(f"{self.state_dir}/{name}", payload)
        gc = [g for g in self._generation_names() if g < name]
        if not self._legacy_gone:
            if fsio.fs_exists(f"{self.state_dir}/state.bin"):
                gc.append("state.bin")  # migrated legacy file, superseded
            self._legacy_gone = True  # one-time probe, never re-paid
        for g in gc:  # GC superseded generations (best-effort; a leftover
            try:      # older gen is never loaded)
                fsio.fs_delete_file(f"{self.state_dir}/{g}")
            except OSError:
                pass

    def current_blob(self) -> bytes | None:
        return self._load()[0]


def stream_ddsketch(
    stream_df: DataFrame,
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
    alpha: float = 0.01,
    trigger_seconds: int = 2,
):
    """Start a streaming DDSketch over ``value_col``. Returns
    (StreamingQuery, StreamingSketch); query the running state with
    ``DDSketch.from_bytes(sk.current_blob())`` at any time."""
    agg = DDSketchAggregator(value_col, alpha=alpha, quantiles=())
    sk = StreamingSketch(agg, state_dir)
    query = (
        stream_df.writeStream
        .foreachBatch(sk.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
    return query, sk


def current_ddsketch(sk: StreamingSketch) -> DDSketch | None:
    blob = sk.current_blob()
    return DDSketch.from_bytes(blob) if blob is not None else None


def stream_ddsketch_by_key(
    stream_df: DataFrame,
    value_col: str,
    key_cols: list[str],
    alpha: float = 0.01,
    quantiles: tuple[float, ...] = (0.5, 0.99),
):
    """Custom stateful streaming operator: per-key running DDSketches via
    ``applyInPandasWithState``. Each group's state is the serialized sketch
    blob; every micro-batch folds its rows in (vectorized add_batch) and
    emits the key's updated count + quantile estimates (Update mode).

    Because the sketch state is bounded (<= 2 x max_bins bins) this is safe
    for unbounded keys x unbounded time — the classic use: live p50/p99 of
    sequence lengths per source while an ingestion pipeline runs."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from ..spark.ddsketch_agg import quantile_label

    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = StructType(
        key_fields
        + [StructField("count", LongType())]
        + [StructField(quantile_label(q), DoubleType()) for q in quantiles]
    )
    state_schema = StructType([StructField("blob", BinaryType())])

    def update(key, pdf_iter, state):
        sk = (DDSketch.from_bytes(bytes(state.get[0]))
              if state.exists else DDSketch(alpha))
        for pdf in pdf_iter:
            sk.add_batch(pdf[value_col].to_numpy(dtype="float64", na_value=float("nan")))
        state.update((bytearray(sk.to_bytes()),))
        row = {k: [v] for k, v in zip(key_cols, key)}
        row["count"] = [sk.count]
        for q in quantiles:
            row[quantile_label(q)] = [sk.quantile(q)]
        yield pd.DataFrame(row)

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def _rebuild_at_arrow_types(pdf, in_arrow, cols):
    """Rebuild pandas columns at their declared Arrow types (NaN -> null).

    Guards the one silently-lossy case: pandas coerces a NULL-bearing int
    column to float64, and above 2^53 the cast back drops low bits while
    still looking integral — a wrong key would corrupt HLL/theta/Bloom
    state undetectably (same guard as ``joins.bloom_probe_column``)."""
    import pyarrow as pa

    arrays = []
    for c in cols:
        col, typ = pdf[c], in_arrow.field(c).type
        if pa.types.is_integer(typ) and col.dtype.kind == "f":
            finite = col.dropna()
            if len(finite) and finite.abs().max() >= 2.0**53:
                raise ValueError(
                    f"integer column {c!r} exceeds 2^53 after pandas "
                    "null-coercion to float64; sketch keys would be lossy")
        arrays.append(pa.Array.from_pandas(col, type=typ))
    return pa.Table.from_arrays(arrays, schema=in_arrow)


def stream_sketch_by_key(
    stream_df: DataFrame,
    agg: SketchAggregator,
    key_cols: list[str],
):
    """Per-key running sketches for ANY aggregator (HLL, theta, t-digest,
    KLL, CMS, Bloom, DDSketch) via ``applyInPandasWithState``: group state
    is the serialized blob; each micro-batch folds its rows in through the
    aggregator's vectorized ``add_arrow`` and emits the key's refreshed
    ``finalize()`` outputs (Update mode). State per key is bounded
    (KB-scale blob) for unbounded TIME; total state still grows with the
    number of distinct keys — for truly unbounded key spaces, window the
    stream or compact old keys into a rollup."""
    import pandas as pd

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import BinaryType, StructField, StructType

    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = StructType(key_fields + agg.output_fields())
    state_schema = StructType([StructField("blob", BinaryType())])
    # declared Arrow types for the value columns: pandas coerces an int
    # column to float64 whenever a micro-batch contains a NULL, and a
    # float-hashed key would land in different registers than the same key
    # int-hashed in a null-free batch (silent HLL/CMS/Bloom/theta
    # corruption). Arrays are rebuilt at the declared type, NaN -> null.
    in_arrow = to_arrow_schema(
        StructType([stream_df.schema[c] for c in agg.value_cols]))

    def update(key, pdf_iter, state):
        if state.exists:
            blob = bytes(state.get[0])
        else:
            blob = agg.state_bytes(agg.make())
        sk = None
        for pdf in pdf_iter:
            if sk is None:
                sk = agg.make()
            tbl = _rebuild_at_arrow_types(pdf, in_arrow, agg.value_cols)
            agg.add_arrow(sk, tbl)
        if sk is not None:
            blob = agg.merge_blobs([blob, agg.state_bytes(sk)])
        state.update((bytearray(blob),))
        row = {k: [v] for k, v in zip(key_cols, key)}
        for name, val in agg.finalize(blob).items():
            row[name] = [val]
        yield pd.DataFrame(row)

    return stream_df.groupBy(*key_cols).applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stream_ddsketch_windowed(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = "1 minute",
    slide_duration: str | None = None,
    watermark_delay: str = "30 seconds",
    by: list[str] | None = None,
    alpha: float = 0.01,
    max_bins: int = 4096,
    quantiles: tuple[float, ...] = (0.5, 0.99),
    trigger: dict | None = None,
):
    """Event-time tumbling (or sliding, via ``slide_duration``) window
    sketches with late-data handling.

    Plan shape (scale-first): the log-bucketing law runs as native streaming
    SQL — ``withWatermark`` + ``groupBy(window(ts), keys, region, key)`` —
    so streaming state is BOUNDED bucket counts (<= ~2*max_bins rows per
    open window x key), never raw values. Append mode emits a window's
    bucket rows exactly once, after the watermark passes; ``foreachBatch``
    assembles them into DDSketch estimate rows and writes one parquet
    partition per micro-batch (overwrite by batch_id => idempotent under
    replay). Late rows beyond ``watermark_delay`` are dropped by Spark —
    the documented streaming trade-off.

    Returns (StreamingQuery, out_dir); read results with
    ``spark.read.parquet(out_dir)`` — columns (window_start, window_end,
    by..., count, sum, mean, min, max, pXX...).
    """
    from pyspark.sql import functions as F

    from ..spark.ddsketch_agg import (
        _estimates,
        bucket_exprs,
        quantile_label,
        sketch_from_key_counts,
    )

    by = list(by or [])
    x = F.col(value_col).cast("double")
    finite_cond, region, key = bucket_exprs(x, alpha)
    bucketed = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .where(finite_cond)
        .groupBy(F.window(ts_col, window_duration,
                          slide_duration or window_duration).alias("window"),
                 *by,
                 region.alias("region"), key.alias("key"))
        .agg(F.count(F.lit(1)).alias("c"), F.sum(x).alias("s"),
             F.min(x).alias("mn"), F.max(x).alias("mx"))
    )

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        flat = batch_df.select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *by, "region", "key", "c", "s", "mn", "mx")
        key_fields = [StructField("window_start", TimestampType()),
                      StructField("window_end", TimestampType())] + [
            flat.schema[k] for k in by]
        schema = StructType(
            key_fields
            + [StructField("count", LongType()), StructField("sum", DoubleType()),
               StructField("mean", DoubleType()), StructField("min", DoubleType()),
               StructField("max", DoubleType())]
            + [StructField(quantile_label(q), DoubleType()) for q in quantiles])
        group_cols = ["window_start", "window_end", *by]

        def assemble(pdf):
            import pandas as pd

            sk = sketch_from_key_counts(
                pdf["region"].to_numpy(), pdf["key"].to_numpy(),
                pdf["c"].to_numpy(), pdf["s"].to_numpy(),
                pdf["mn"].to_numpy(), pdf["mx"].to_numpy(), alpha, max_bins)
            row = {k: [pdf[k].iloc[0]] for k in group_cols}
            for name, val in _estimates(sk, quantiles).items():
                row[name] = [val]
            return pd.DataFrame(row)

        out = flat.groupBy(*group_cols).applyInPandas(assemble, schema)
        # one finalized parquet dir per micro-batch; replays overwrite the
        # same path, so the sink is idempotent
        out.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    writer = (bucketed.writeStream.outputMode("append").foreachBatch(_sink)
              .option("checkpointLocation", checkpoint_dir))
    trigger = trigger or {"processingTime": "2 seconds"}
    query = writer.trigger(**trigger).start()
    return query, out_dir




def _duration_ms(s: str) -> int:
    """'30 seconds' / '2 minutes' / '1 day' -> milliseconds."""
    n, unit = s.strip().split()
    unit = unit.rstrip("s")
    factor = {"millisecond": 1, "second": 1000, "minute": 60_000,
              "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000}[unit]
    return int(float(n) * factor)


def _pack_sessions(sessions: list[tuple[int, int, bytes]]) -> bytearray:
    import struct

    out = bytearray(struct.pack("<I", len(sessions)))
    for start_ms, end_ms, blob in sessions:
        out += struct.pack("<qqI", start_ms, end_ms, len(blob))
        out += blob
    return out


def _unpack_sessions(buf: bytes) -> list[tuple[int, int, bytes]]:
    import struct

    n = struct.unpack_from("<I", buf, 0)[0]
    off = 4
    out = []
    for _ in range(n):
        start_ms, end_ms, blen = struct.unpack_from("<qqI", buf, off)
        off += 20
        out.append((start_ms, end_ms, bytes(buf[off:off + blen])))
        off += blen
    return out


def stream_ddsketch_sessions(
    stream_df: DataFrame,
    value_col: str,
    ts_col: str,
    key_cols: list[str],
    gap: str = "30 seconds",
    watermark_delay: str = "10 seconds",
    alpha: float = 0.01,
    quantiles: tuple[float, ...] = (0.5, 0.99),
):
    """Per-key SESSION windows: events closer than ``gap`` belong to one
    session; a session emits exactly once, after the event-time watermark
    passes its end + gap.

    This is the custom stateful shape Spark's native ``session_window``
    cannot express for sketches (a native session grouping would have to
    carry raw values; here each open session is one bounded sketch blob).
    Design points for correctness under out-of-order data:

    - group state holds a LIST of open sessions (a batch may open several;
      a late-but-in-watermark event may bridge two, which merges them —
      sketch merges are exact, so bridging loses nothing);
    - event time is converted to true epoch ms ON THE JVM (cast to double
      is timezone-independent), so session-timezone settings cannot skew
      timeout timestamps against the UTC watermark;
    - emission happens ONLY when the watermark has passed end + gap —
      checked against ``GroupState.getCurrentWatermarkMs()`` on the data
      path and via EventTimeTimeout when a key goes quiet. Append
      semantics: each session exactly once.
    """
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from ..spark.ddsketch_agg import quantile_label

    gap_ms = _duration_ms(gap)
    key_fields = [stream_df.schema[k] for k in key_cols]
    out_schema = StructType(
        key_fields
        + [StructField("session_start", TimestampType()),
           StructField("session_end", TimestampType()),
           StructField("count", LongType())]
        + [StructField(quantile_label(q), DoubleType()) for q in quantiles])
    state_schema = StructType([StructField("packed", BinaryType())])

    def _emit_df(key, closed):
        rows = {k: [] for k in key_cols}
        rows["session_start"] = []
        rows["session_end"] = []
        rows["count"] = []
        for q in quantiles:
            rows[quantile_label(q)] = []
        for start_ms, end_ms, blob in closed:
            sk = DDSketch.from_bytes(blob)
            for k, v in zip(key_cols, key):
                rows[k].append(v)
            rows["session_start"].append(
                pd.Timestamp(start_ms, unit="ms", tz="UTC"))
            rows["session_end"].append(
                pd.Timestamp(end_ms, unit="ms", tz="UTC"))
            rows["count"].append(sk.count)
            for q in quantiles:
                rows[quantile_label(q)].append(sk.quantile(q))
        return pd.DataFrame(rows)

    def _segments(ts_ms, vals):
        """Sorted in-batch events -> session segments (start, end, sketch)."""
        import numpy as np

        segs = []
        if len(ts_ms) == 0:
            return segs
        boundaries = np.nonzero(np.diff(ts_ms) > gap_ms)[0]
        bounds = np.concatenate(([0], boundaries + 1, [len(ts_ms)]))
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            sk = DDSketch(alpha)
            sk.add_batch(vals[lo:hi])
            segs.append((int(ts_ms[lo]), int(ts_ms[hi - 1]), sk.to_bytes()))
        return segs

    def _coalesce(sessions):
        """Merge sessions whose gaps touch (a bridging event may connect
        previously separate sessions). Input/output sorted by start."""
        sessions.sort(key=lambda s: s[0])
        out = []
        for s in sessions:
            if out and s[0] - out[-1][1] <= gap_ms:
                prev = out.pop()
                merged = DDSketch.from_bytes(prev[2]).merge(
                    DDSketch.from_bytes(s[2]))
                out.append((min(prev[0], s[0]), max(prev[1], s[1]),
                            merged.to_bytes()))
            else:
                out.append(s)
        return out

    def update(key, pdf_iter, state):
        sessions = (_unpack_sessions(bytes(state.get[0]))
                    if state.exists else [])
        frames = [p for p in pdf_iter]
        if frames and not state.hasTimedOut:
            pdf = (pd.concat(frames) if len(frames) > 1 else frames[0])
            ok = pdf["_ts_ms"].notna()
            pdf = pdf[ok].sort_values("_ts_ms")
            ts_ms = pdf["_ts_ms"].to_numpy(dtype="int64")
            vals = pdf[value_col].to_numpy(dtype="float64",
                                           na_value=float("nan"))
            sessions = _coalesce(sessions + _segments(ts_ms, vals))
        wm = state.getCurrentWatermarkMs()
        closed = [s for s in sessions if s[1] + gap_ms < wm]
        sessions = [s for s in sessions if s[1] + gap_ms >= wm]
        if sessions:
            state.update((_pack_sessions(sessions),))
            # fire when the earliest open session could close; must be
            # strictly later than the current watermark
            state.setTimeoutTimestamp(
                max(min(s[1] for s in sessions) + gap_ms, wm + 1))
        elif state.exists:
            state.remove()
        if closed:
            yield _emit_df(key, closed)

    # true epoch ms computed JVM-side and EXACT: unix_millis avoids both
    # pandas' session-tz-naive datetimes and the float round-trip of a
    # double cast (which could shift an event 1 ms and split a session)
    with_ms = stream_df.withWatermark(ts_col, watermark_delay).withColumn(
        "_ts_ms", F.unix_millis(F.col(ts_col)))
    return with_ms.groupBy(*key_cols).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)
