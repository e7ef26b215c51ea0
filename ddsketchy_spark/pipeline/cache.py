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

Derived frames (round-3 ADVICE hardening): the tag lives on the returned
Python DataFrame OBJECT, so ``pairs.where(...)`` returns a fresh object
without it. ``release_cached_deps`` now falls back to a PLAN match: every
tagged dep is also kept in a module registry, and a derived frame's
logical plan still contains the dep's ``InMemoryRelation`` — walking the
plan (JVM ``sameResult``) recovers which registered deps back the frame.
So releasing a filtered/projected result works too. The fallback is
best-effort (it warns and returns 0 when nothing matches — e.g. the frame
was never backed by a tagged cache, or the walk fails on an exotic plan);
``release_all_cached_deps()`` is the blunt session-wide flush.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_ATTR = "_ddsketchy_cached_deps"

# Every dep handed to tag_cached_deps and not yet released. Strong refs on
# purpose: a persisted intermediate whose Python handle was dropped is
# exactly the frame a later release (or release_all_cached_deps) must
# still be able to unpersist.
_LIVE: list[DataFrame] = []


def tag_cached_deps(result: DataFrame, deps: list[DataFrame]) -> DataFrame:
    """Attach the persisted intermediates backing ``result`` (internal)."""
    setattr(result, _ATTR, list(deps))
    for d in deps:
        if not any(d is x for x in _LIVE):
            _LIVE.append(d)
    return result


def cached_deps(result: DataFrame) -> list[DataFrame]:
    """The persisted intermediates backing a pipeline result (may be []).

    Attribute tag only — for the plan-walk fallback on derived frames use
    ``release_cached_deps`` directly."""
    return list(getattr(result, _ATTR, []))


def _imr_nodes(jplan) -> list:
    """All InMemoryRelation nodes of a JVM logical plan (best-effort)."""
    out, stack = [], [jplan]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() == "InMemoryRelation":
            out.append(n)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def _deps_in_plan(result: DataFrame) -> list[DataFrame]:
    """Registered live deps whose cached relation appears in ``result``'s
    plan (the derived-frame fallback). Best-effort: [] on any JVM-walk
    surprise rather than raising."""
    try:
        targets = _imr_nodes(result._jdf.queryExecution().withCachedData())
        if not targets:
            return []
        hits = []
        for d in _LIVE:
            for node in _imr_nodes(d._jdf.queryExecution().withCachedData()):
                if any(t.sameResult(node) for t in targets):
                    hits.append(d)
                    break
        return hits
    except Exception:  # pragma: no cover - defensive: plan shapes vary
        return []


def release_cached_deps(result: DataFrame, blocking: bool = False) -> int:
    """Unpersist every cached intermediate backing ``result``; returns the
    number released. Call AFTER materializing the result — the plan is
    lazy, and an early release forces a full recompute on the next action.

    Works on the handle a pipeline function returned (attribute tag) AND
    on frames derived from it (``.where()``/``.select()`` — plan-walk
    fallback against the registry). Warns when neither finds anything:
    either nothing was cached for this frame, or it is not derived from
    any live tagged result."""
    deps = cached_deps(result)
    tagged = bool(deps)
    if not deps:
        deps = _deps_in_plan(result)
    if not deps:
        warnings.warn(
            "release_cached_deps: no cached intermediates found for this "
            "DataFrame — it carries no tag and its plan references no "
            "live tagged cache (already released, or never cached).",
            stacklevel=2)
        return 0
    for d in deps:
        d.unpersist(blocking)
        for i, x in enumerate(_LIVE):
            if x is d:
                del _LIVE[i]
                break
    if tagged:
        setattr(result, _ATTR, [])
    return len(deps)


def release_all_cached_deps(blocking: bool = False) -> int:
    """Unpersist EVERY live tagged intermediate in the session (the blunt
    flush for long-lived drivers); returns the number released."""
    n = len(_LIVE)
    for d in _LIVE:
        d.unpersist(blocking)
    _LIVE.clear()
    return n
