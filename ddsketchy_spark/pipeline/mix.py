"""Training-data mixture sampling: hit per-source token budgets.

The data-mixing stage of an LLM pipeline: given a target token budget per
source (web gets 500B, code 150B, a high-quality source upsampled 3x...),
produce the mixed corpus deterministically — the same rows (and the same
duplicate counts for upsampled sources) on any partitioning, cluster size
or run.

Law (fully SQL-re-derivable, DuckDB-oracled):
- one aggregate computes each source's total tokens ``tot``;
- ``rate = budget / tot`` (sources absent from ``budgets`` are dropped —
  the mixture spec is explicit);
- every doc draws a unit uniform from md5: the first 13 hex chars of
  ``md5(concat(id, ':', seed))`` as a 52-bit integer over 16^13 — 52 bits
  so the value is EXACT in both a BIGINT and a double, and md5 (unlike
  xxhash64) is bit-identical in every engine;
- ``n_copies = floor(rate) + (u < frac(rate))`` — Bernoulli rounding of
  the per-doc expected copy count, so E[tokens kept] = budget exactly,
  for downsampling (rate < 1) and upsampling (rate > 1) alike.

Scale shape: one map-side-combining aggregate over (source, n_tok) rows,
a broadcast of |sources| rates, then a pure projection+filter — no other
shuffle, no window, no Python. The achieved token count concentrates at
budget +- O(sqrt(n_docs) * max_doc_tokens) (per-doc Bernoulli); an exact
prefix-by-hash cut would need a per-source ordered scan (one task per
source — the web-scale-group trap ``sample_by_group`` documents), and no
production mixture needs token-exact budgets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# 13 hex chars = 52 bits: exact in double AND int64 (see module docstring)
_U_HEX_CHARS = 13
_U_DENOM = float(16 ** _U_HEX_CHARS)


def unit_uniform(id_col, seed: int = 0):
    """Deterministic per-row uniform in [0, 1): md5-based (cross-engine
    bit-identical), 52-bit resolution. ``id_col`` is a Column or name."""
    key = F.concat_ws(":", F.col(id_col) if isinstance(id_col, str) else id_col,
                      F.lit(str(seed)))
    v = F.conv(F.substring(F.md5(key), 1, _U_HEX_CHARS), 16, 10).cast("long")
    return v.cast("double") / F.lit(_U_DENOM)


def sample_to_token_budget(
    df: DataFrame,
    budgets: dict[str, float],
    token_col: str = "n_tok",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    explode_copies: bool = False,
) -> DataFrame:
    """Deterministic mixture sampling to per-source token budgets (module
    docstring has the law). Returns the kept rows of ``df`` with
    ``n_copies`` (>= 1); with ``explode_copies=True`` each kept row is
    repeated ``n_copies`` times with a ``copy`` index column (0-based) —
    the physical upsampled corpus.

    Rows with a NULL id, source, or token count are dropped (they can
    neither be budgeted nor deterministically sampled); sources missing
    from ``budgets`` are dropped (explicit mixture). A budget for a source
    with zero total tokens keeps nothing."""
    base = df.where(F.col(id_col).isNotNull()
                    & F.col(source_col).isNotNull()
                    & F.col(token_col).isNotNull())
    totals = base.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("double")).alias("_tot"))
    budget_expr = F.create_map(
        *[x for s, b in sorted(budgets.items())
          for x in (F.lit(s), F.lit(float(b)))])
    rates = (totals
             .withColumn("_budget", budget_expr[F.col(source_col)])
             .where(F.col("_budget").isNotNull() & (F.col("_tot") > 0))
             .select(source_col,
                     (F.col("_budget") / F.col("_tot")).alias("_rate")))
    u = unit_uniform(id_col, seed)
    out = (base.join(F.broadcast(rates), source_col)
           .withColumn("n_copies",
                       (F.floor("_rate")
                        + F.when(u < F.col("_rate") - F.floor("_rate"), 1)
                        .otherwise(0)).cast("long"))
           .where(F.col("n_copies") >= 1)
           .drop("_rate"))
    if explode_copies:
        out = out.select(
            "*", F.explode(F.sequence(F.lit(0),
                                      F.col("n_copies") - 1)).alias("copy"))
    return out


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    token_col: str = "n_tok",
    id_col: str = "doc_id",
    seed: int = 0,
    n_buckets: int = 4096,
) -> DataFrame:
    """GPT-style sequence packing WITH document splitting: shuffle the
    corpus deterministically, concatenate all documents into one token
    stream, and cut it into fixed ``seq_len`` training sequences —
    documents crossing a boundary continue in the next sequence (the
    EOD-token packing of GPT-2/3; zero padding except the final tail).

    Returns ``df``'s rows (NULL/empty-token rows dropped) plus
    ``start_seq`` (sequence index of the doc's first token), ``start_pos``
    (offset within that sequence) and ``n_seqs`` (sequences the doc
    spans) — the manifest a loader needs to materialize packed batches.

    Law (fully SQL-re-derivable): docs are ordered by (h, id) where h is
    the md5 52-bit integer of ``id:seed`` (``unit_uniform``'s hash — a
    deterministic corpus shuffle, identical in every engine);
    ``global_offset(doc) = sum of token counts of all docs before it``;
    ``start_seq = global_offset div seq_len`` etc. A pure function of the
    data — invariant to partitioning, cluster size, AND ``n_buckets``.

    Scale shape — a distributed prefix sum, not a global window: bucket =
    the top bits of h (bucketing by a PREFIX of the sort key keeps the
    global order), one map-side-combining aggregate for per-bucket token
    totals, an exclusive cumsum over the <= ``n_buckets`` totals (one tiny
    task on metadata, never data), broadcast back, and a within-bucket
    exclusive-cumsum window whose partitions hold ~n_docs/n_buckets rows.
    Size ``n_buckets`` so a bucket fits a task (~1M docs/bucket: 4096
    covers 4B docs; raise it at 10^12 scale)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from pyspark.sql import Window

    key = F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))
    h = F.conv(F.substring(F.md5(key), 1, _U_HEX_CHARS), 16, 10).cast("long")
    shift = max(4 * _U_HEX_CHARS - max(n_buckets - 1, 1).bit_length(), 0)
    base = (df.where(F.col(id_col).isNotNull()
                     & (F.col(token_col) > 0))  # NULL fails > too
            .withColumn("_h", h)
            .withColumn("_bkt", F.shiftright("_h", shift)))
    btot = base.groupBy("_bkt").agg(
        F.sum(F.col(token_col).cast("long")).alias("_btok"))
    wb = (Window.orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    bpre = btot.select("_bkt", F.coalesce(F.sum("_btok").over(wb),
                                          F.lit(0)).alias("_boff"))
    ww = (Window.partitionBy("_bkt").orderBy("_h", id_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    off = (F.col("_boff")
           + F.coalesce(F.sum(F.col(token_col).cast("long")).over(ww),
                        F.lit(0)))
    L = F.lit(int(seq_len))
    return (base.join(F.broadcast(bpre), "_bkt")
            .withColumn("_off", off)
            .withColumn("start_seq", F.floor(F.col("_off") / L))
            .withColumn("start_pos", F.col("_off") % L)
            .withColumn(
                "n_seqs",
                F.floor((F.col("_off") + F.col(token_col) - 1) / L)
                - F.floor(F.col("_off") / L) + 1)
            .drop("_h", "_bkt", "_boff", "_off"))
