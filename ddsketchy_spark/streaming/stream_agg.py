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

import os
import time

from pyspark.sql import DataFrame

from ..core.ddsketch import DDSketch
from ..spark.agg import SketchAggregator, merge_global, build_partials
from ..spark.ddsketch_agg import DDSketchAggregator


class StreamingSketch:
    """Running sketch state with idempotent micro-batch merges."""

    _HDR_LEN = 8  # little-endian batch_id prefixed to the blob

    def __init__(self, agg: SketchAggregator, state_dir: str) -> None:
        self.agg = agg
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        # batch_id and blob live in ONE file committed by ONE atomic rename:
        # a crash can never leave the id and the state out of sync (two
        # separate files would double-merge a replayed batch if the process
        # died between the writes)
        self._state_path = os.path.join(state_dir, "state.bin")

    def _load(self) -> tuple[bytes | None, int]:
        if not os.path.exists(self._state_path):
            return None, -1
        with open(self._state_path, "rb") as f:
            raw = f.read()
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
        tmp = f"{self._state_path}.tmp-{time.time_ns()}"
        with open(tmp, "wb") as f:
            f.write(int(batch_id).to_bytes(self._HDR_LEN, "little", signed=True))
            f.write(merged)
        os.replace(tmp, self._state_path)

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


def stream_sketch_by_key(
    stream_df: DataFrame,
    agg: SketchAggregator,
    key_cols: list[str],
):
    """Per-key running sketches for ANY aggregator (HLL, theta, t-digest,
    KLL, CMS, Bloom, DDSketch) via ``applyInPandasWithState``: group state
    is the serialized blob; each micro-batch folds its rows in through the
    aggregator's vectorized ``add_arrow`` and emits the key's refreshed
    ``finalize()`` outputs (Update mode). Sketch state is bounded, so this
    is safe for unbounded keys x unbounded time."""
    import pandas as pd
    import pyarrow as pa

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
            arrays = [pa.Array.from_pandas(pdf[c], type=in_arrow.field(c).type)
                      for c in agg.value_cols]
            tbl = pa.Table.from_arrays(arrays, schema=in_arrow)
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
    session; a session closes when the event-time watermark passes its end
    + gap, emitting ONE row with the session's DDSketch quantile summary.

    This is the custom stateful operator shape Spark's native
    ``session_window`` cannot express for sketches (a native session
    grouping would have to carry raw values; here state per open session
    is one bounded sketch blob). ``applyInPandasWithState`` with
    EventTimeTimeout: data folds into the open session (vectorized
    add_batch); the timeout callback fires once the watermark passes and
    emits the closed session (Append semantics — each session exactly
    once). Late events beyond the watermark are dropped by Spark.
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
    state_schema = StructType([
        StructField("blob", BinaryType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
    ])

    def _emit(key, sk, start_ms, end_ms):
        import datetime as dt

        row = {k: [v] for k, v in zip(key_cols, key)}
        row["session_start"] = [dt.datetime.utcfromtimestamp(start_ms / 1000.0)]
        row["session_end"] = [dt.datetime.utcfromtimestamp(end_ms / 1000.0)]
        row["count"] = [sk.count]
        for q in quantiles:
            row[quantile_label(q)] = [sk.quantile(q)]
        return pd.DataFrame(row)

    def update(key, pdf_iter, state):
        if state.hasTimedOut:
            blob, start_ms, end_ms = state.get
            sk = DDSketch.from_bytes(bytes(blob))
            state.remove()
            yield _emit(key, sk, start_ms, end_ms)
            return
        if state.exists:
            blob, start_ms, end_ms = state.get
            sk = DDSketch.from_bytes(bytes(blob))
        else:
            sk, start_ms, end_ms = DDSketch(alpha), None, None
        import numpy as np

        frames = [p for p in pdf_iter]
        if frames:
            pdf = (pd.concat(frames) if len(frames) > 1 else frames[0]
                   ).sort_values(ts_col)
            ts_ms = (pdf[ts_col].astype("int64") // 1_000_000).to_numpy()
            vals = pdf[value_col].to_numpy(dtype="float64",
                                           na_value=float("nan"))
            # vectorized session split: a boundary wherever the time gap
            # between consecutive events exceeds gap_ms (the open session's
            # end acts as the predecessor of the first event)
            prev_end = ts_ms[0] - 1 if start_ms is None else end_ms
            prev = np.concatenate(([prev_end], ts_ms[:-1]))
            seg_start = np.nonzero((ts_ms - prev) > gap_ms)[0]
            bounds = np.concatenate(([0], seg_start, [len(ts_ms)]))
            if start_ms is None:
                start_ms, end_ms = int(ts_ms[0]), int(ts_ms[0])
            seg_start_set = {int(x) for x in seg_start}
            for i in range(len(bounds) - 1):
                lo, hi = int(bounds[i]), int(bounds[i + 1])
                if lo == hi:
                    continue
                if lo in seg_start_set:
                    # gap exceeded: close the open session, start fresh
                    yield _emit(key, sk, start_ms, end_ms)
                    sk = DDSketch(alpha)
                    start_ms = end_ms = int(ts_ms[lo])
                sk.add_batch(vals[lo:hi])
                end_ms = max(end_ms, int(ts_ms[hi - 1]))
        if start_ms is not None:
            state.update((bytearray(sk.to_bytes()), int(start_ms), int(end_ms)))
            state.setTimeoutTimestamp(int(end_ms) + gap_ms)

    watermarked = stream_df.withWatermark(ts_col, watermark_delay)
    return watermarked.groupBy(*key_cols).applyInPandasWithState(
        update, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout)


def _duration_ms(s: str) -> int:
    """'30 seconds' / '2 minutes' / '500 milliseconds' -> ms."""
    n, unit = s.strip().split()
    unit = unit.rstrip("s")
    factor = {"millisecond": 1, "second": 1000, "minute": 60_000,
              "hour": 3_600_000}[unit]
    return int(float(n) * factor)
