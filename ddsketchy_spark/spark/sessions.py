"""Gap-based sessionization: group events into sessions that close after
``gap`` seconds of inactivity per key.

Two engines, one law (consecutive events are in the same session iff
their timestamp difference is AT MOST ``gap`` — the semantics of Spark's
``session_window``, whose per-event window is [ts, ts+gap] at the merge
step: an event landing exactly ``gap`` after the previous one still
extends the session; only diff > gap splits):

- ``sessionize``: per-session aggregates via the built-in
  ``F.session_window`` groupBy — the idiomatic at-scale operator (one hash
  shuffle on the key, JVM-side session merge inside the aggregate, and the
  SAME call works on a watermarked stream: Structured Streaming evicts a
  session's state once the watermark passes its close).
- ``label_sessions``: per-event session assignment (each row gains its
  session's start timestamp as the session key) via lag + running-max of
  boundary timestamps over one window — for joining session context back
  onto events. Deterministic under timestamp ties: tied rows always land
  in the same session (their mutual gap is 0), and the boundary timestamp
  is the tie value whichever of them the window visits first.

The law is exactly SQL gaps-and-islands, so a DuckDB oracle re-derives
whole sessions (see ``sessionize_events`` in __spark_entry__.py).

Scale shape: one exchange keyed on the session key for either engine;
``sessionize`` keeps everything in the JVM aggregate (no window over raw
rows), ``label_sessions`` pays one window but never shuffles twice — both
audited (``sessionize_agg`` plan audit). Skewed keys (one bot user with
10^8 events) sessionize correctly but serially within the key — split
upstream by (key, day) when a single key's history outgrows a task.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def _gap_literal(gap_seconds: float) -> str:
    us = int(round(gap_seconds * 1_000_000))
    if us <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    return f"{us} microseconds"


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_seconds: float,
    by: Sequence[str] = ("user_id",),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """Per-session aggregates: (by..., session_start, session_end,
    n_events, *aggs). ``session_start``/``session_end`` are the first and
    last EVENT timestamps (not the gap-extended window end, which is an
    implementation detail of session_window). Rows with a NULL key or
    timestamp are dropped — they belong to no session.

    Works unchanged on a stream: pass a watermarked streaming DataFrame
    (``df.withWatermark(ts_col, ...)``) and Spark emits each session once
    its close passes the watermark, evicting its state."""
    by = list(by)
    base = df.where(F.col(ts_col).isNotNull())
    for k in by:
        base = base.where(F.col(k).isNotNull())
    win = F.session_window(F.col(ts_col), _gap_literal(gap_seconds))
    out = (base.groupBy(*by, win)
           .agg(F.min(ts_col).alias("session_start"),
                F.max(ts_col).alias("session_end"),
                F.count(F.lit(1)).alias("n_events"),
                *aggs))
    return out.drop("session_window")


def label_sessions(
    df: DataFrame,
    ts_col: str,
    gap_seconds: float,
    by: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Every input row (NULL key/ts rows excluded) plus ``session_start``
    — the timestamp of its session's first event, the join key back to
    ``sessionize`` output. One shuffle, one window pass."""
    by = list(by)
    base = df.where(F.col(ts_col).isNotNull())
    for k in by:
        base = base.where(F.col(k).isNotNull())
    gap_us = int(round(gap_seconds * 1_000_000))
    if gap_us <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    w = Window.partitionBy(*by).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # interval arithmetic works on TIMESTAMP and TIMESTAMP_NTZ alike
    # (unix_micros rejects NTZ) and needs no timezone interpretation
    new_session = prev.isNull() | (
        F.col(ts_col) > prev + F.expr(f"INTERVAL {gap_us} MICROSECOND"))
    running = Window.partitionBy(*by).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    boundary = F.max(F.when(new_session, F.col(ts_col))).over(running)
    return base.withColumn("session_start", boundary)
