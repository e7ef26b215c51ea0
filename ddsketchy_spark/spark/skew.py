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


def sample_by_group(
    df: DataFrame,
    by,
    k: int,
    key_col: str,
    salt: int = 0,
    oversample: float = 2.0,
) -> DataFrame:
    """Deterministic uniform k-per-group sample: each group keeps the rows
    with the k smallest xxhash64(key, salt) values — a pure function of
    the data (same rows on any partitioning or cluster size), the grouped
    counterpart of ``deterministic_sample``.

    Scale shape — a naive per-group ``row_number`` window sorts every
    group in ONE task, which dies on a web-scale group (one source =
    billions of docs). Instead:

    1. One aggregate pass counts each group.
    2. Rows are PREFILTERED to hash-fraction ``p = min(1, oversample * (k
       + 3*sqrt(k) + 6) / n)`` of their group — the k smallest hashes are
       uniform, so all k pass with overwhelming probability, and only
       ~oversample*k rows per group reach the window sort.
    3. The window ranks the surviving rows; groups where fewer than
       min(k, n) rows passed (the k-th smallest hash landed above p —
       astronomically rare, but possible) are detected EXACTLY and rerun
       without the prefilter, so the result is always the true k smallest.

    Rows with NULL ``key_col`` or NULL group keys are excluded. Use a
    UNIQUE ``key_col`` (row id): duplicate keys hash identically, and
    which of several fully-tied rows wins is partition-order dependent."""
    from pyspark.sql import Window

    by = list(by)
    base = df.where(F.col(key_col).isNotNull())
    for g in by:
        base = base.where(F.col(g).isNotNull())
    counts = base.groupBy(*by).agg(F.count(F.lit(1)).alias("_gn"))
    joined = base.join(counts, by)
    # unsigned hash mapped to [0, 1)
    h = F.xxhash64(F.col(key_col), F.lit(salt))
    u = (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)
    budget = float(k + 3 * (k ** 0.5) + 6)
    p = F.least(F.lit(1.0), F.lit(oversample) * F.lit(budget) / F.col("_gn"))
    pre = joined.where(u < p)
    w = (Window.partitionBy(*by)
         .orderBy(h.asc(), F.col(key_col).asc()))
    ranked = pre.withColumn("_rk", F.row_number().over(w))
    # exact undersample detection: a group is complete iff it yielded
    # min(k, n) survivors — start from `counts`, not `ranked`: a group the
    # prefilter wiped out entirely has NO ranked rows to detect from
    surv = ranked.groupBy(*by).agg(F.max("_rk").alias("_m"))
    short = (counts.join(surv, by, "left")
             .where(F.coalesce(F.col("_m"), F.lit(0))
                    < F.least(F.lit(k), F.col("_gn")))
             .select(*by)
             # ~never non-empty; checkpoint freezes the (tiny) shortfall
             # set so the three consumers below don't recompute it — and
             # the redo stays JOIN-based end to end: no driver-side
             # condition list that an adversarial salt could blow up
             # (round-2 verdict #8)
             .localCheckpoint())
    out = ranked.where(F.col("_rk") <= k)
    if not short.isEmpty():
        redo = (joined.join(short, by, "leftsemi")
                .withColumn("_rk", F.row_number().over(w))
                .where(F.col("_rk") <= k))
        out = out.join(short, by, "left_anti").unionByName(redo)
    return out.drop("_rk", "_gn")


def take_top_frac_by_group(
    df: DataFrame,
    frac: float,
    rank_col: str,
    by,
    key_col: str | None = None,
    method: str = "sample",
    sample_k: int = 4096,
    k: int = 200,
    keep_threshold: bool = False,
    broadcast_thresholds="auto",
    auto_broadcast_groups: int = 1_000_000,
) -> DataFrame:
    """Keep approximately the top ``frac`` fraction of each group's rows
    by ``rank_col`` — the per-domain quality cut of corpus curation
    ("keep each source's best 10%"), the RANKED sibling of
    ``sample_by_group``.

    Law: every group keeps its rows with ``rank_col >= t_g``; ties at
    the threshold are all kept. How ``t_g`` is estimated is ``method``:

    - ``"sample"`` (default): ``t_g`` = the exact ``1 - frac`` lower
      quantile (the ``floor((1-frac)*s) + 1``-th smallest of ``s``
      values) of the group's deterministic ``sample_by_group`` hash
      sample of up to ``sample_k`` rows (needs a unique ``key_col``).
      A PURE FUNCTION OF THE DATA — same kept rows on any partitioning
      or cluster size — with kept-fraction error ~sqrt(frac(1-frac)/
      sample_k) (~0.5% at 4096), and EXACT for groups with at most
      ``sample_k`` rows (the sample is the whole group).
    - ``"kll"``: ``t_g`` = the group's derandomized-KLL ``1 - frac``
      quantile estimate from one mergeable sketch pass (no key column
      needed, no sampling window). Rank error ~1.5-2% of the group at
      k=200; deterministic for a fixed input partitioning, but partial
      compaction depends on row placement, so a REPARTITIONED input can
      shift thresholds within the error bound — persist the thresholds
      (``keep_threshold=True``) when increments must cut consistently.

    Scale shape — a per-group ``percent_rank`` window would sort every
    group in one task (dies on a web-scale source). Both methods reduce
    each group to one threshold row: "sample" via the hash-prefiltered
    sample (only ~sample_k rows per group ever reach a sort, inside a
    bounded ``collect_list``), "kll" via map-side sketch partials + blob
    merge (raw rows never shuffle). Then a join + filter:
    ``broadcast_thresholds`` True / False / "auto" (bounded
    ``limit(n+1).count()`` probe against ``auto_broadcast_groups``) —
    broadcast keeps the corpus scan shuffle-free; at extreme group
    cardinality the same plan runs as a hash join.

    Rows with a NULL group key or NULL ``rank_col`` are excluded, as in
    ``sample_by_group``."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    if method not in ("sample", "kll"):
        raise ValueError(f"unknown method {method!r} (sample|kll)")
    by = [by] if isinstance(by, str) else list(by)
    base = df.where(F.col(rank_col).isNotNull())
    for g in by:
        base = base.where(F.col(g).isNotNull())
    if frac == 1.0:
        # quantile(0) of a SAMPLE could exceed the group minimum and
        # wrongly drop rows; top-100% is the identity cut
        return (base.withColumn("_thr", F.lit(float("-inf")))
                if keep_threshold else base)

    if method == "sample":
        if not key_col:
            raise ValueError("method='sample' requires key_col (a unique "
                             "row id); use method='kll' without one")
        samp = sample_by_group(base.select(*by, key_col, rank_col),
                               by, sample_k, key_col)
        s = F.size(F.col("_vals"))
        idx = F.least(s, (F.floor(F.lit(1.0 - frac) * s) + 1).cast("int"))
        thresholds = (samp.groupBy(*by)
                      .agg(F.sort_array(F.collect_list(rank_col))
                           .alias("_vals"))
                      .select(*by, F.element_at(F.col("_vals"), idx)
                              .cast("double").alias("_thr")))
    else:
        thresholds = _kll_group_thresholds(base, rank_col, by, k,
                                           1.0 - frac)

    if broadcast_thresholds == "auto":
        small = (thresholds.limit(auto_broadcast_groups + 1).count()
                 <= auto_broadcast_groups)
    else:
        small = bool(broadcast_thresholds)
    maybe_bc = F.broadcast if small else (lambda d: d)
    out = (base.join(maybe_bc(thresholds), by)
           .where(F.col(rank_col) >= F.col("_thr")))
    return out if keep_threshold else out.drop("_thr")


def _kll_group_thresholds(base: DataFrame, rank_col: str, by: list,
                          k: int, q: float) -> DataFrame:
    """(by..., _thr): each group's derandomized-KLL ``q``-quantile from
    one mergeable grouped sketch pass; one O(k) decode per group row."""
    from typing import Iterator

    import pyarrow as pa

    from pyspark.sql.types import DoubleType, StructField, StructType

    from ..core.kll import KLLSketch
    from .agg import build_partials, merge_grouped, to_arrow_schema
    from .companions import KLLAggregator

    agg = KLLAggregator(rank_col, k=k, quantiles=())
    partials = build_partials(base.select(*by, rank_col), agg, by)
    states = merge_grouped(partials, agg, by, states_only=True)
    thr_schema = StructType([base.schema[g] for g in by]
                            + [StructField("_thr", DoubleType())])
    thr_arrow = to_arrow_schema(thr_schema)

    def extract(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            if b.num_rows == 0:
                continue
            thrs = [KLLSketch.from_bytes(s).quantile(q)
                    for s in b.column(b.schema.get_field_index("state"))
                    .to_pylist()]
            cols = [b.column(b.schema.get_field_index(g)).cast(
                        thr_arrow.field(i).type)
                    for i, g in enumerate(by)]
            yield pa.RecordBatch.from_arrays(
                cols + [pa.array(thrs, pa.float64())], schema=thr_arrow)

    return states.mapInArrow(extract, thr_schema)
