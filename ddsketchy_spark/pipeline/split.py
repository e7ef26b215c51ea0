"""Leakage-safe train/validation/test corpus splits.

Splitting an LLM corpus by a per-document coin flip leaks: near-duplicate
documents (or pages from one domain) straddle the train/test boundary and
the held-out loss measures memorization, not generalization. The standard
fix is to split by a GROUP key — the near-dup cluster label
(``dedup_near_text``'s ``group`` column), a domain, or a source — so every
correlated document lands on the same side.

Law (fully SQL-re-derivable, DuckDB-oracled):

- the split key is ``'g:' || group_col`` when given (falling back to
  ``'i:' || id_col`` for NULL groups — an ungrouped row is its own
  group; the namespace prefixes keep a doc id that happens to EQUAL some
  group label from aliasing into that group's draw), else the bare
  ``id_col``;
- the key draws the same md5-based 52-bit unit uniform ``u`` as
  ``mix.unit_uniform`` (bit-identical in every engine, deterministic
  across runs / partitionings / cluster sizes);
- ``splits`` = ordered ``{name: weight}``; weights are normalized, and a
  row goes to the first name whose cumulative normalized weight exceeds
  ``u``. Every member of a group shares the key, hence the split.

Scale shape: a pure whole-stage-codegen projection — no shuffle, no join,
no window, no Python, nothing driver-side. The split fractions
concentrate at their weights +- O(sqrt(n_groups))/n_groups; an exact-count
split would need a global ordered partition (one task bottleneck) and no
training pipeline needs row-exact splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .mix import unit_uniform


def split_corpus(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    group_col: str | None = None,
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` naming each row's split (module docstring has the
    law). With ``group_col``, all rows sharing a non-NULL group value get
    the same split — the leakage-safe mode; a NULL group falls back to
    the row's own id. Rows where BOTH keys are NULL cannot be assigned
    deterministically and get a NULL ``out_col`` (callers that cannot
    tolerate that filter or fail loudly themselves, as the sinks do)."""
    if not splits:
        raise ValueError("splits must name at least one split")
    if any(w <= 0 for w in splits.values()):
        raise ValueError(f"split weights must be positive, got {splits}")
    total = float(sum(splits.values()))
    names = list(splits)
    # namespace prefixes (grouped mode only): concat propagates a NULL
    # group/id, so the coalesce fallback law is unchanged
    key = (F.coalesce(F.concat(F.lit("g:"), F.col(group_col).cast("string")),
                      F.concat(F.lit("i:"), F.col(id_col).cast("string")))
           if group_col is not None else F.col(id_col).cast("string"))
    u = unit_uniform(key, seed)
    expr = F.lit(names[-1])  # last split absorbs u in [c_{k-1}, 1)
    cum = 0.0
    arms = []
    for name in names[:-1]:
        cum += splits[name] / total
        arms.append((u < F.lit(cum), F.lit(name)))
    for cond, val in reversed(arms):
        expr = F.when(cond, val).otherwise(expr)
    return df.withColumn(
        out_col, F.when(key.isNull(), F.lit(None).cast("string"))
        .otherwise(expr))
