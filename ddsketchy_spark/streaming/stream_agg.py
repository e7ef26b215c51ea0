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

import json
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
