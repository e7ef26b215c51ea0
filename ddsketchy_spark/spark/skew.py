"""Skew handling utilities.

The token table's ``source`` column is heavily skewed (one source ~60% of
rows — FIXTURES.md F1). The sketch harness is largely immune because stage 1
partially aggregates per (partition x key) before any shuffle, but these
helpers cover the remaining cases:

- ``key_histogram``: diagnose skew (top-k key frequencies + fractions).
- ``salted_repartition``: spread one hot key's ROWS across n_salt partitions
  (for row-level work such as per-source transforms, not sketch builds).
- ``suggest_merge_rounds``: pick merge_rounds/fanout for the grouped merge
  given partition and group counts — when #partials per key is large,
  a salted pre-round (merge_rounds=2) bounds any single task's merge work.

AQE's skew-join handling (enabled in get_spark) covers join-side skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_histogram(df: DataFrame, col: str, topk: int = 20) -> DataFrame:
    """Top-k key frequencies with fraction of total — the skew diagnosis."""
    total = df.count()
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("fraction", F.col("cnt") / F.lit(float(total)))
        .orderBy(F.desc("cnt"))
        .limit(topk)
    )


def salted_repartition(df: DataFrame, col: str, n_salt: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (col, salt) so a dominant key's rows spread over up to
    ``n_salt`` partitions instead of hot-spotting one. The salt derives from
    a row hash, so the layout is deterministic for a fixed input. The
    explicit partition count keeps AQE from coalescing the spread away on
    small inputs (at scale, size-based coalescing is what you want — pass
    None to let AQE decide)."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )
    if num_partitions is not None:
        out = salted.repartition(num_partitions, F.col(col), F.col("_salt"))
    else:
        out = salted.repartition(F.col(col), F.col("_salt"))
    return out.drop("_salt")


def suggest_merge_rounds(n_partitions: int, n_groups: int,
                         max_blobs_per_task: int = 512) -> tuple[int, int]:
    """(merge_rounds, fanout) so no merge task handles more than
    ``max_blobs_per_task`` state blobs. Stage 1 emits up to one blob per
    (partition x group); the grouped merge gets ~n_partitions blobs per
    group key."""
    if n_partitions <= max_blobs_per_task:
        return 1, 64
    fanout = max(2, (n_partitions + max_blobs_per_task - 1) // max_blobs_per_task)
    return 2, fanout


def deterministic_sample(df: DataFrame, n: int, key_col: str,
                         salt: int = 0) -> DataFrame:
    """Reproducible uniform sample of ~n rows: the n smallest
    xxhash64(key, salt) values. Unlike ``df.sample()`` the result is a pure
    function of the DATA (same rows on any partitioning, any cluster size,
    any day), so samples taken by different jobs agree — and it compiles to
    TakeOrdered (per-partition top-n, no global sort).

    Rows with duplicate keys hash identically: for row-level sampling use a
    unique id column. NULL keys are excluded."""
    # order by the expression directly (TakeOrdered still applies) — a
    # temp column could clobber a user column of the same name
    h = F.xxhash64(F.col(key_col), F.lit(salt)).bitwiseXOR(F.lit(-(1 << 63)))
    return df.where(F.col(key_col).isNotNull()).orderBy(h.asc()).limit(n)
