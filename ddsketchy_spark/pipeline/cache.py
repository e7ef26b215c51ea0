"""Deterministic release of pipeline-internal caches.

The distributed (``verify="local"``) dedup/ANN engines persist one
intermediate DataFrame (signatures / enriched vectors) because it feeds
two or three downstream joins. Their results are lazy, so the engine
itself can never unpersist — instead each engine tags its result with the
cached intermediates, and callers that run many corpora in one long-lived
driver can release them deterministically:

    pairs = minhash_lsh_pairs(df, verify="local")
    pairs.write.parquet(out)          # materialize first
    release_cached_deps(pairs)        # then drop the signature cache

Without an explicit release the caches remain until Spark's LRU eviction
(or ``spark.catalog.clearCache()``).

LIMITATION: the tag lives on the returned Python DataFrame OBJECT, not in
the plan — any further transformation (``.where(...)``, ``.select(...)``)
returns a fresh object WITHOUT the tag, so call ``release_cached_deps``
on the handle the pipeline function returned (or capture
``cached_deps(result)`` first and unpersist those later). A lost tag is
indistinguishable from "nothing was cached" (both return 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_ddsketchy_cached_deps"


def tag_cached_deps(result: DataFrame, deps: list[DataFrame]) -> DataFrame:
    """Attach the persisted intermediates backing ``result`` (internal)."""
    setattr(result, _ATTR, list(deps))
    return result


def cached_deps(result: DataFrame) -> list[DataFrame]:
    """The persisted intermediates backing a pipeline result (may be [])."""
    return list(getattr(result, _ATTR, []))


def release_cached_deps(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every cached intermediate backing ``result``; returns the
    number released. Call AFTER materializing the result — the plan is
    lazy, and an early release forces a full recompute on the next action."""
    deps = cached_deps(result)
    for d in deps:
        d.unpersist(blocking)
    if deps:
        setattr(result, _ATTR, [])
    return len(deps)
