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

    def __init__(self, agg: SketchAggregator, state_dir: str) -> None:
        self.agg = agg
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._state_path = os.path.join(state_dir, "state.bin")
        self._meta_path = os.path.join(state_dir, "meta.json")

    def _load(self) -> tuple[bytes | None, int]:
        blob = None
        last_batch = -1
        if os.path.exists(self._state_path):
            with open(self._state_path, "rb") as f:
                blob = f.read()
        if os.path.exists(self._meta_path):
            last_batch = json.load(open(self._meta_path)).get("last_batch", -1)
        return blob, last_batch

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
            f.write(merged)
        os.replace(tmp, self._state_path)
        tmp = f"{self._meta_path}.tmp-{time.time_ns()}"
        with open(tmp, "w") as f:
            json.dump({"last_batch": batch_id, "updated_at": time.time()}, f)
        os.replace(tmp, self._meta_path)

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
