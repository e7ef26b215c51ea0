"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship DDSketch quantile query on sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness pairs; the driver
runs both at sf0.01 and compares row-count + schema + order-insensitive
value hashes.

Oracle strategy: DDSketch estimates are DETERMINISTIC given the input, so the
DuckDB oracle re-derives the same estimate independently in pure SQL
(key = ceil(ln(x) * inv_ln_gamma) bucketing, cumulative-rank walk,
value = exp(key*ln_gamma) * 2/(1+gamma)) with the mapping constants embedded
as exact float literals. Estimates are rounded half-away-from-zero to 6
decimals on BOTH sides to absorb last-ulp libm differences between NumPy and
DuckDB. Exact columns (counts) are compared unrounded.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

from ddsketchy_spark.core.mapping import LogMapping
from ddsketchy_spark.spark.ddsketch_agg import ddsketch_quantiles, quantile_label

ALPHA = 0.01
_QLABELS = {0.1: "p10", 0.25: "p25", 0.5: "p50", 0.75: "p75", 0.9: "p90",
            0.95: "p95", 0.99: "p99", 0.999: "p999"}


def _r6(c):
    """Round half-away-from-zero to 6 dp (matches DuckDB round() on doubles),
    sign-correct for negative values."""
    mag = F.floor(F.abs(c) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (F.when(c < 0, -mag).otherwise(mag)).cast("double")


_PARA_BOILERPLATE = ("shared boilerplate navigation footer paragraph "
                     "common to many pages of this synthetic corpus")


def _winnowing_ctes(k: int, window: int, relation: str = "documents",
                    lower: bool = True) -> str:
    """The CTE chain of the ``winnowing_fingerprints`` DuckDB
    re-derivation (see ``_winnowing_sql``) over ``relation`` (any table
    or CTE with doc_id, text) — ends with ``winmins``; append a final
    SELECT (and optionally more CTEs). ``lower=False`` mirrors the
    case-sensitive span-rewrite law (lowercase=False on the Spark
    side)."""
    B, MASK1 = 1000003, 1 << 61
    powers = [pow(B, k - 1 - j, MASK1) for j in range(k)]
    terms = " + ".join(
        f"CAST(ascii(substr(t, p+{j}, 1)) AS HUGEINT) * {powers[j]}::HUGEINT"
        for j in range(k))
    t_expr = "lower(text)" if lower else "text"
    return f"""docs AS (
  SELECT doc_id, {t_expr} AS t, length(text) - {k - 1} AS n
  FROM {relation} WHERE text IS NOT NULL AND length(text) >= {k}
),
hashes AS (
  SELECT doc_id, n, p - 1 AS pos0,
    CAST(({terms}) % {MASK1}::HUGEINT AS BIGINT) AS h
  FROM docs, LATERAL unnest(generate_series(1, n)) AS g(p)
),
winstarts AS (
  SELECT doc_id, unnest(generate_series(0, greatest(n - {window}, 0))) AS s
  FROM (SELECT DISTINCT doc_id, n FROM hashes)
),
winmins AS (
  SELECT w.doc_id, w.s, min(struct_pack(h := hh.h, p := hh.pos0)) AS m
  FROM winstarts w
  JOIN hashes hh ON hh.doc_id = w.doc_id
                AND hh.pos0 BETWEEN w.s AND w.s + {window - 1}
  GROUP BY w.doc_id, w.s
)"""


def _winnowing_sql(k: int, window: int) -> str:
    """DuckDB re-derivation of ``winnowing_fingerprints`` (pipeline/text.py):
    rolling polynomial k-gram hash mod 2^61 (exact in HUGEINT — the NumPy
    int64 wraparound is arithmetic mod 2^64 and 2^61 | 2^64, so the masked
    result equals the true mod), then the leftmost-min of every
    ``window``-wide hash window, deduplicated. ASCII text only (``ascii()``
    reads code points; the NumPy side reads UTF-8 bytes — equal for ASCII,
    which the synthetic documents table is)."""
    return f"""
WITH {_winnowing_ctes(k, window)}
SELECT DISTINCT doc_id, m.p AS pos, m.h AS fp FROM winmins
ORDER BY doc_id, pos
"""


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # The driver may create its own SparkSession from any cwd; make sure the
    # package reaches the executors (idempotent addPyFile shipping).
    from ddsketchy_spark.spark.session import _ship_package

    _ship_package(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# DDSketch queries (Spark side)
# ---------------------------------------------------------------------------


def _dds_wide(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    col: str,
    qs: tuple[float, ...],
    by: str | None = None,
    alpha: float = ALPHA,
    weight_col: str | None = None,
) -> DataFrame:
    df = _load(spark, sf_dir, table)
    labels = [_QLABELS[q] for q in qs]
    if by:
        res = ddsketch_quantiles(df, col, by=[by], alpha=alpha, quantiles=qs,
                                 weight_col=weight_col)
        sel = [F.col(by), F.col("count").alias("cnt")]
        sel += [_r6(F.col(quantile_label(q))).alias(lab) for q, lab in zip(qs, labels)]
        return res.select(*sel).orderBy(by)
    out = ddsketch_quantiles(df, col, alpha=alpha, quantiles=qs,
                             weight_col=weight_col)
    row = {"cnt": out["count"]}
    row.update({lab: out[quantile_label(q)] for q, lab in zip(qs, labels)})
    sdf = spark.createDataFrame([row], schema="cnt long, " + ", ".join(f"{l} double" for l in labels))
    return sdf.select(F.col("cnt"), *[_r6(F.col(l)).alias(l) for l in labels])


# ---------------------------------------------------------------------------
# DDSketch oracle (DuckDB SQL side) — independent re-derivation
# ---------------------------------------------------------------------------


def _dds_oracle(
    table: str,
    col: str,
    qs: tuple[float, ...],
    by: str | None = None,
    alpha: float = ALPHA,
    weight: str | None = None,
) -> str:
    m = LogMapping(alpha)
    ilg = repr(m.inv_ln_gamma)
    gl = repr(1.0 / m.inv_ln_gamma)  # reference recomputes ln(gamma) as 1/ilg
    coef = repr(2.0 / (1.0 + m.gamma))
    miv = repr(m.min_indexable_value)
    g = by
    gsel = f"{g}, " if g else ""
    gpart = f"PARTITION BY {g}" if g else ""
    gby = f"{g}," if g else ""
    qvals = ", ".join(f"({q!r})" for q in qs)
    # zero-bucket-aware estimate: rank below zero_n -> 0.0 (the sketch's
    # zero bucket), else the positive-store key walk offset by zero_n
    cases = ",\n  ".join(
        f"max(CASE WHEN q = {q!r} THEN CASE WHEN rank < zero_n THEN 0.0 "
        f"ELSE round(exp(CAST(key AS DOUBLE) * {gl}) * {coef}, 6) END END)"
        f" AS {_QLABELS[q]}"
        for q in qs
    )
    order = f"ORDER BY {g}" if g else ""
    jg = f"cum.{g} = r.{g} AND " if g else ""
    rg = f"r.{g}, " if g else ""
    # Non-negative-data oracle: total count INCLUDES the zero bucket
    # (|x| < min_indexable — the sketch counts those and returns 0.0 for
    # ranks inside it); negatives are excluded by construction because the
    # oracled tables have none (the full three-region walk incl. the
    # negative store is exercised by dds_mixed_sign_centered).
    # weighted: each row counts CAST(weight) times — the exact mirror of
    # the native engine's weight_col (NULL/zero weights contribute
    # nothing; the oracled tables have no negative/fractional weights,
    # whose refusal is regression-tested Spark-side)
    wsel = f", CAST({weight} AS BIGINT) AS w" if weight else ""
    wfin = " AND w IS NOT NULL AND w <> 0" if weight else ""
    cnt = "sum(w)" if weight else "count(*)"
    return f"""
WITH base AS (
  SELECT {gsel}CAST({col} AS DOUBLE) AS x{wsel} FROM {table}
),
fin AS (SELECT * FROM base WHERE isfinite(x) AND x > -{miv}{wfin}),
tot AS (
  SELECT {gsel}CAST({cnt} AS BIGINT) AS n,
         CAST(COALESCE({cnt} FILTER (WHERE x < {miv}), 0) AS BIGINT) AS zero_n
  FROM fin GROUP BY ALL
),
k AS (
  SELECT {gsel}CAST(ceil(ln(x) * {ilg}) AS BIGINT) AS key,
         CAST({cnt} AS BIGINT) AS c
  FROM fin WHERE x >= {miv}
  GROUP BY ALL
),
cum AS (
  SELECT {gsel}key, sum(c) OVER ({gpart} ORDER BY key) AS cum
  FROM k
),
ranks AS (
  SELECT {gsel}qs.q AS q,
         CAST(floor(qs.q * (n - 1)) AS BIGINT) AS rank, n, zero_n
  FROM tot CROSS JOIN (VALUES {qvals}) qs(q)
),
kq AS (
  SELECT {rg}r.q AS q, any_value(r.n) AS n, any_value(r.rank) AS rank,
         any_value(r.zero_n) AS zero_n, min(cum.key) AS key
  FROM ranks r LEFT JOIN cum ON {jg}cum.cum > r.rank - r.zero_n
  GROUP BY ALL
)
SELECT {gsel}CAST(any_value(n) AS BIGINT) AS cnt,
  {cases}
FROM kq GROUP BY ALL {order}
"""


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-event-type DDSketch quantiles of events.value, sf0.001."""
    return _dds_wide(spark, "/root/testdata/sf0.001", "events", "value",
                     (0.5, 0.9, 0.99, 0.999), by="event_type")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    q["dds_events_value_global"] = lambda spark, sf: _dds_wide(
        spark, sf, "events", "value", (0.5, 0.9, 0.99, 0.999))
    q["dds_events_value_by_type"] = lambda spark, sf: _dds_wide(
        spark, sf, "events", "value", (0.5, 0.9, 0.99), by="event_type")
    q["dds_lineitem_quantity_by_returnflag"] = lambda spark, sf: _dds_wide(
        spark, sf, "lineitem", "l_quantity", (0.5, 0.9, 0.99), by="l_returnflag")
    q["dds_lineitem_extendedprice_global"] = lambda spark, sf: _dds_wide(
        spark, sf, "lineitem", "l_extendedprice", (0.5, 0.99, 0.999))
    # weighted ingest: quantiles of unit price with each row counting
    # l_quantity times — the pre-aggregated (value, count) table law
    # (DDSketch.add_weighted_batch / ddsketch_quantiles weight_col);
    # full DuckDB re-derivation with sum(weight) bucket counts
    q["dds_weighted_price_by_returnflag"] = lambda spark, sf: _dds_wide(
        spark, sf, "lineitem", "l_extendedprice", (0.5, 0.9, 0.99),
        by="l_returnflag", weight_col="l_quantity")

    def dds_rollup_events(spark, sf):
        """Rollup cube from ONE scan (ddsketch_rollup): per-event-type AND
        global quantiles derived from the same persisted bucket-row frame
        — summing bucket counts IS merging the sketches. Both levels
        fully re-derived by the DuckDB bucket-law oracle."""
        from ddsketchy_spark.spark.ddsketch_agg import ddsketch_rollup

        ev = _load(spark, sf, "events")
        r = ddsketch_rollup(ev, "value", ["event_type"],
                            quantiles=(0.5, 0.9), persist=False)
        return (r.select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            "rollup_level", F.col("count").alias("cnt"),
            _r6(F.col("p50")).alias("p50"), _r6(F.col("p90")).alias("p90"))
            .orderBy("rollup_level", "event_type"))

    q["dds_rollup_events"] = dds_rollup_events

    def hll_rollup_events(spark, sf):
        """Generic blob rollup (sketch_rollup): distinct users per
        event_type AND globally, both levels derived from one pass's
        per-type HLL blobs. Register-max mergeability makes each level's
        estimate IDENTICAL to a direct HLL at that grouping (asserted
        in-query); DuckDB anchors the exact distinct counts, the 5%
        accuracy boolean rides per row."""
        from ddsketchy_spark.spark.agg import sketch_aggregate, sketch_rollup
        from ddsketchy_spark.spark.companions import HLLAggregator

        ev = _load(spark, sf, "events")
        agg = HLLAggregator("user_id", p=14)
        rows = sketch_rollup(ev, agg, ["event_type"],
                             persist=False).collect()
        d1 = {x["event_type"]: x["distinct_est"] for x in
              sketch_aggregate(ev, agg, by=["event_type"]).collect()}
        d0 = sketch_aggregate(ev, agg)["distinct_est"]
        parity = all(
            x["distinct_est"] == (d1[x["event_type"]]
                                  if x["rollup_level"] == 1 else d0)
            for x in rows)
        e1 = {x["event_type"]: x["n"] for x in
              ev.groupBy("event_type").agg(
                  F.countDistinct("user_id").alias("n")).collect()}
        e0 = ev.agg(F.countDistinct("user_id")).collect()[0][0]
        out = []
        for x in rows:
            exact = e1[x["event_type"]] if x["rollup_level"] == 1 else e0
            out.append((
                x["event_type"] if x["event_type"] is not None else "ALL",
                int(x["rollup_level"]), int(exact),
                bool(abs(x["distinct_est"] - exact) <= 0.05 * exact + 2),
                bool(parity)))
        return spark.createDataFrame(
            out, "event_type string, rollup_level int, users_exact long, "
            "hll_ok boolean, rollup_equals_direct boolean").orderBy(
            "rollup_level", "event_type")

    q["hll_rollup_events"] = hll_rollup_events

    def dds_cdf_events(spark, sf):
        """rank/cdf — the inverse sketch query — hash-matched EXACTLY:
        the bucket law makes rank(x) = count of rows whose bucket key
        <= key(x), which DuckDB re-derives with the same ceil(ln)
        arithmetic. Probes sit at bucket midpoints (LogMapping.value of
        their key) so both engines agree on key(probe) robustly. Runs
        through the ddsketch_rank/ddsketch_cdf SQL functions on the
        state blob, pinning those too."""
        from ddsketchy_spark.spark.ddsketch_agg import ddsketch_state
        from ddsketchy_spark.spark.functions import register_sql_functions

        register_sql_functions(spark)
        df = _load(spark, sf, "events")
        sk = ddsketch_state(df, "value")
        sdf = spark.createDataFrame([(sk.to_bytes(),)], "state binary")
        sdf.createOrReplaceTempView("_cdf_state")
        m = LogMapping(ALPHA)
        probes = [m.value(m.key(v)) for v in (5.0, 60.0, 240.0)]
        selects = ", ".join(
            f"ddsketch_rank(state, {p!r}) AS r{i}, "
            f"round(ddsketch_cdf(state, {p!r}), 6) AS c{i}"
            for i, p in enumerate(probes))
        return spark.sql(f"SELECT {selects} FROM _cdf_state")

    q["dds_cdf_events"] = dds_cdf_events

    def exact_counts(spark, sf):
        return (
            _load(spark, sf, "events")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.countDistinct("user_id").alias("users"),
            )
            .orderBy("event_type")
        )

    q["exact_events_count_by_type"] = exact_counts

    # -- companion sketches: exact columns cross-check DuckDB; the sketch's
    # -- error-bound guarantee is materialized as boolean columns (oracle
    # -- side asserts TRUE), so a bound violation shows up as a hash mismatch.

    def hll_users_by_type(spark, sf):
        from ddsketchy_spark.spark.companions import hll_distinct

        df = _load(spark, sf, "events")
        est = hll_distinct(df, "user_id", by=["event_type"], p=14)
        exact = df.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("users_exact"))
        joined = exact.join(est, "event_type")
        return joined.select(
            "event_type", "users_exact",
            (F.abs(F.col("distinct_est") - F.col("users_exact"))
             <= 0.05 * F.col("users_exact") + F.lit(2)).alias("hll_ok"),
        ).orderBy("event_type")

    q["hll_users_by_event_type"] = hll_users_by_type

    def cms_partkey_freq(spark, sf):
        from ddsketchy_spark.core.cms import CountMinSketch
        from ddsketchy_spark.spark.companions import cms_state

        df = _load(spark, sf, "lineitem")
        out = cms_state(df, "l_partkey", depth=5, width=1 << 14)
        cm = CountMinSketch.from_bytes(out["state"])
        exact = (df.filter(F.col("l_partkey") <= 20).groupBy("l_partkey")
                 .agg(F.count(F.lit(1)).alias("cnt")))
        import numpy as _np
        import math as _math

        rows = exact.collect()
        keys = _np.asarray([r["l_partkey"] for r in rows], dtype=_np.int64)
        est = cm.query_batch(keys)
        eps_n = (_math.e / cm.width) * cm.total
        data = [
            (int(k), int(c), bool(e >= c), bool(e - c <= eps_n))
            for k, c, e in zip(keys, (r["cnt"] for r in rows), est)
        ]
        return spark.createDataFrame(
            data, "l_partkey long, cnt long, cms_lower_ok boolean, cms_upper_ok boolean"
        ).orderBy("l_partkey")

    q["cms_partkey_freq"] = cms_partkey_freq

    def cms_weighted_partkey(spark, sf):
        """Weighted CMS ingest (weight_col): part frequencies weighted by
        l_quantity — the pre-aggregated (key, count) table law for the
        frequency companions. DuckDB anchors the exact weighted counts;
        the CMS lower/upper bounds hold against them, and the arrow
        (hash_kind='spark') and native weighted engines produce
        BIT-identical state blobs."""
        import math as _math

        import numpy as np

        from ddsketchy_spark.core.cms import CountMinSketch
        from ddsketchy_spark.spark.companions import cms_state

        df = _load(spark, sf, "lineitem")
        a = cms_state(df, "l_partkey", depth=5, width=1 << 14,
                      hash_kind="spark", weight_col="l_quantity")
        b = cms_state(df, "l_partkey", depth=5, width=1 << 14,
                      engine="native", weight_col="l_quantity")
        bit_same = a["state"] == b["state"] and a["total"] == b["total"]
        cm = CountMinSketch.from_bytes(b["state"])
        exact = (df.filter(F.col("l_partkey") <= 20).groupBy("l_partkey")
                 .agg(F.sum(F.col("l_quantity").cast("long")).alias("wcnt"))
                 .collect())
        keys = np.asarray([r["l_partkey"] for r in exact], dtype=np.int64)
        est = cm.query_batch(keys)
        eps_n = (_math.e / cm.width) * cm.total
        data = [
            (int(k), int(c), bool(e >= c), bool(e - c <= eps_n),
             bool(bit_same))
            for k, c, e in zip(keys, (r["wcnt"] for r in exact), est)
        ]
        return spark.createDataFrame(
            data, "l_partkey long, wcnt long, cms_lower_ok boolean, "
            "cms_upper_ok boolean, engines_bit_identical boolean"
        ).orderBy("l_partkey")

    q["cms_weighted_partkey"] = cms_weighted_partkey

    def tdigest_weighted_price(spark, sf):
        """Weighted t-digest quantiles of unit price (weight=l_quantity).
        The EXACT weighted quantile — value at rank floor(q*(n-1)) of
        the weight-expanded multiset, computed by cumulative weight —
        is re-derived on BOTH sides (driver-side NumPy cumsum here, a
        window cumsum in the DuckDB oracle) and hash-matched; the
        t-digest estimates are then held to the sketch's actual
        guarantee: their true RANK sits within 1% of q."""
        import numpy as np

        from ddsketchy_spark.spark.companions import tdigest_quantiles

        df = _load(spark, sf, "lineitem")
        out = tdigest_quantiles(df, "l_extendedprice",
                                weight_col="l_quantity",
                                quantiles=(0.5, 0.99))
        rows = (df.select(F.col("l_extendedprice").cast("double").alias("x"),
                          F.col("l_quantity").cast("long").alias("w"))
                .where("x IS NOT NULL AND w IS NOT NULL AND w > 0")
                .collect())
        x = np.asarray([r["x"] for r in rows])
        w = np.asarray([r["w"] for r in rows], dtype=np.int64)
        order = np.argsort(x, kind="stable")
        xs, cw = x[order], np.cumsum(w[order])
        n = int(cw[-1])
        exacts = {}
        for qv in (0.5, 0.99):
            rank = int(qv * (n - 1))
            exacts[qv] = float(xs[np.searchsorted(cw, rank, side="right")])

        def rank_of(est):
            i = np.searchsorted(xs, est)
            return (cw[i - 1] if i > 0 else 0) / n

        ok50 = abs(rank_of(out["p50"]) - 0.5) < 0.01
        ok99 = abs(rank_of(out["p99"]) - 0.99) < 0.01
        return spark.createDataFrame(
            [(int(n), round(exacts[0.5], 6), round(exacts[0.99], 6),
              bool(ok50), bool(ok99))],
            "wcnt long, p50_exact double, p99_exact double, "
            "td_p50_rank_ok boolean, td_p99_rank_ok boolean")

    q["tdigest_weighted_price"] = tdigest_weighted_price

    def bloom_orderkeys(spark, sf):
        from ddsketchy_spark.core.bloom import BloomFilter
        from ddsketchy_spark.spark.companions import bloom_state

        li = _load(spark, sf, "lineitem")
        out = bloom_state(li, "l_orderkey", n_bits=1 << 20, n_hashes=7)
        bf = BloomFilter.from_bytes(out["state"])
        import numpy as _np

        present = _np.asarray(
            [r["k"] for r in li.select(F.col("l_orderkey").alias("k")).distinct().collect()],
            dtype=_np.int64,
        )
        false_neg = int((~bf.contains_batch(present)).sum())
        return spark.createDataFrame(
            [(len(present), false_neg)], "distinct_keys long, false_negatives long")

    q["bloom_lineitem_orderkeys"] = bloom_orderkeys

    def quantile_companions_events(spark, sf):
        from ddsketchy_spark.spark.companions import kll_quantiles, tdigest_quantiles
        from ddsketchy_spark.spark.ddsketch_agg import quantile_label as _ql

        df = _load(spark, sf, "events")
        n = df.count()
        qs = (0.5, 0.9, 0.99)
        # exact lower quantiles via a global sort (test-scale oracle only)
        from pyspark.sql import Window

        ranked = df.select("value").withColumn(
            "rn", F.row_number().over(Window.orderBy("value")))
        targets = {q: 1 + int(q * (n - 1)) for q in qs}
        exact = {q: ranked.filter(F.col("rn") == t).collect()[0]["value"]
                 for q, t in targets.items()}
        td = tdigest_quantiles(df, "value", delta=200, quantiles=qs)
        kll = kll_quantiles(df, "value", k=200, quantiles=qs)
        vals = None  # rank-space check needs the sorted column once
        import numpy as _np

        vals = _np.sort(_np.asarray([r["value"] for r in df.select("value").collect()]))

        def rank_ok(est, q, tol):
            r = float(_np.searchsorted(vals, est) / len(vals))
            return bool(abs(r - q) <= tol)

        row = (
            int(n),
            float(exact[0.5]), float(exact[0.9]), float(exact[0.99]),
            all(rank_ok(td[_ql(q)], q, 0.02) for q in qs),
            all(rank_ok(kll[_ql(q)], q, 0.03) for q in qs),
        )
        return spark.createDataFrame(
            [row],
            "cnt long, p50_exact double, p90_exact double, p99_exact double, "
            "tdigest_ok boolean, kll_ok boolean",
        )

    q["quantile_companions_events"] = quantile_companions_events

    # -- training-data pipeline operators ----------------------------------

    def _docs_with_dups(spark, sf):
        base = _load(spark, sf, "documents")
        dup = (base.filter("doc_id < 50")
               .withColumn("doc_id", F.col("doc_id") + 100000))
        return base.unionByName(dup)

    def token_stats_documents(spark, sf):
        from ddsketchy_spark.pipeline.text import token_stats

        return (token_stats(_load(spark, sf, "documents"))
                .select("doc_id", "n_ws_tokens", "n_re_tokens", "n_chars_calc")
                .orderBy("doc_id"))

    q["token_stats_documents"] = token_stats_documents

    def quality_scores_documents(spark, sf):
        from ddsketchy_spark.pipeline.text import quality_scores

        return (quality_scores(_load(spark, sf, "documents"))
                .select("doc_id", "n_words",
                        _r6(F.col("mean_word_len")).alias("mean_word_len"),
                        _r6(F.col("stopword_ratio")).alias("stopword_ratio"))
                .orderBy("doc_id"))

    q["quality_scores_documents"] = quality_scores_documents

    def lang_id_distribution(spark, sf):
        from ddsketchy_spark.pipeline.text import lang_id

        return (lang_id(_load(spark, sf, "documents"))
                .groupBy("pred_lang").agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy("pred_lang"))

    q["lang_id_distribution"] = lang_id_distribution

    def quality_filter_documents(spark, sf):
        """Keep/drop decision + audited drop reason for every document —
        including the opt-in Gopher repetition rules (dup-bigram fraction
        > 0.06, dup-line fraction > 0.3) — hash-matched row-for-row
        against a DuckDB re-derivation of the same fixed-precedence rules
        (ratios compared at 6 dp on both sides)."""
        from ddsketchy_spark.pipeline.text import quality_filter

        return (quality_filter(_load(spark, sf, "documents"),
                               min_words=20, min_stopword_ratio=0.03,
                               max_dup_ngram_frac={2: 0.06},
                               max_dup_line_frac=0.3)
                .select("doc_id", "keep", "drop_reason")
                .orderBy("doc_id"))

    q["quality_filter_documents"] = quality_filter_documents

    def clean_lines_documents(spark, sf):
        """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2) over a
        deterministic multi-line derivation of the documents table (three
        substring lines; line 2 gets terminal punctuation only on even
        doc_ids, docs under 81 chars collapse to too_few_lines): every
        line rule, page rule, and the rewritten text itself (md5) are
        hash-matched row-for-row against a DuckDB list_filter
        re-derivation of the same law."""
        from ddsketchy_spark.pipeline.text import clean_lines

        synth = _load(spark, sf, "documents").withColumn(
            "text",
            F.concat(
                F.substring("text", 1, 40), F.lit(".\n"),
                F.substring("text", 41, 40),
                F.when(F.col("doc_id") % 2 == 0, F.lit(".")).otherwise(
                    F.lit("")),
                F.lit("\n"),
                F.expr("substring(text, 81)"), F.lit(" end.")))
        return (clean_lines(synth, min_kept_lines=2)
                .select("doc_id", "n_lines", "n_kept_lines", "drop_reason",
                        "keep", F.md5("clean_text").alias("clean_md5"))
                .orderBy("doc_id"))

    q["clean_lines_documents"] = clean_lines_documents

    def boilerplate_lines_documents(spark, sf):
        """Corpus-frequency boilerplate removal (pipeline/text.py
        remove_boilerplate_lines — the RefinedWeb/CCNet line-dedup
        stage) over a deterministic multi-line derivation of documents:
        a cookie banner on EVERY doc, a per-(doc_id%7) footer on ~1/7 of
        docs (both >= min_docs=30 distinct docs -> removed everywhere), a
        pair marker shared by exactly 2 docs and a unique body line
        (below threshold -> kept), plus a 'xx' line under min_chars
        (never a candidate). Removal counts and the rewritten text (md5)
        hash-matched row-for-row against a DuckDB re-derivation of the
        full law."""
        from ddsketchy_spark.pipeline.text import remove_boilerplate_lines

        d = F.col("doc_id")
        synth = _load(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.lit("Cookie notice: this site uses cookies\n"),
                F.substring("text", 1, 50), F.lit("\nxx\n"),
                F.lit("Copyright footer site"),
                (d % 7).cast("string"), F.lit("\n"),
                F.lit("pair marker "),
                F.floor(d / 2).cast("string")).alias("text"))
        out = remove_boilerplate_lines(synth, min_docs=30, min_chars=5)
        return (out.select(
            "doc_id",
            F.col("n_boiler_removed").cast("long").alias("n_boiler_removed"),
            F.coalesce(F.md5("text"), F.lit("n/a")).alias("text_md5"))
            .orderBy("doc_id"))

    q["boilerplate_lines_documents"] = boilerplate_lines_documents

    def theta_source_overlap_documents(spark, sf):
        """Cross-source duplication matrix (spark/companions.py
        theta_group_overlap): per-source Theta sketches of the documents
        word sets (split-on-single-space law), then all C(20,2)=190
        pairwise union/intersection/jaccard/containment reports from the
        20 state blobs alone. k=65536 keeps every sketch (and every
        pairwise union) in exact mode at this scale, so DuckDB re-derives
        each estimate as an exact distinct count."""
        from ddsketchy_spark.spark.companions import theta_group_overlap

        docs = _load(spark, sf, "documents").where(
            "text IS NOT NULL AND source IS NOT NULL")
        words = docs.select(
            "source", F.explode(F.split("text", " ")).alias("w"))
        m = theta_group_overlap(words, "w", "source", k=65536)
        return (m.select(
            "group_a", "group_b",
            _r6(F.col("est_a")).alias("est_a"),
            _r6(F.col("est_b")).alias("est_b"),
            _r6(F.col("est_union")).alias("est_union"),
            _r6(F.col("est_intersection")).alias("est_intersection"),
            _r6(F.col("jaccard")).alias("jaccard"),
            _r6(F.col("containment_a_in_b")).alias("containment_a_in_b"),
            _r6(F.col("containment_b_in_a")).alias("containment_b_in_a"),
            "exact_mode")
            .orderBy("group_a", "group_b"))

    q["theta_source_overlap_documents"] = theta_source_overlap_documents

    def url_domain_filter_documents(spark, sf):
        """URL gating (the C4/RefinedWeb first stage) over deterministic
        synthetic URLs derived from doc_id (www. on evens, .co.uk on
        multiples of 3, 13 rotating sites): host extraction,
        public-suffix registrable-domain reduction, and a blocklist
        keep/drop — hash-matched row-for-row against a DuckDB
        re-derivation of the same regex + label-slice law."""
        from ddsketchy_spark.pipeline.urls import filter_by_domain

        d = F.col("doc_id")
        synth = _load(spark, sf, "documents").select(
            "doc_id",
            F.concat(
                F.lit("https://"),
                F.when(d % 2 == 0, F.lit("www.")).otherwise(F.lit("")),
                F.lit("site"), (d % 13).cast("string"),
                F.when(d % 3 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
                F.lit("/page?id="), d.cast("string")).alias("url"))
        out = filter_by_domain(synth, ["site3.com", "site5.co.uk"])
        from ddsketchy_spark.pipeline.urls import url_host

        return (out.withColumn("host", url_host("url"))
                .select("doc_id", "host", "domain", "keep")
                .orderBy("doc_id"))

    q["url_domain_filter_documents"] = url_domain_filter_documents

    def top_bigrams_documents(spark, sf):
        """Top-20 corpus bigrams (codegen n-gram construction + map-side
        combining count + deterministic TakeOrdered), hash-matched against
        a DuckDB re-derivation."""
        from ddsketchy_spark.pipeline.text import ngram_counts

        return (ngram_counts(_load(spark, sf, "documents"), n=2, top_k=20)
                .orderBy(F.desc("cnt"), F.asc("ngram")))

    q["top_bigrams_documents"] = top_bigrams_documents

    def sample_by_group_documents(spark, sf):
        """Deterministic k-per-group downsampling (hash-threshold prefilter
        + exact fallback, no full per-group sort): per-source sampled
        counts must be exactly least(k, group size), and the sample must
        be a subset of the source rows (subset_ok boolean)."""
        from ddsketchy_spark.spark.skew import sample_by_group

        docs = _load(spark, sf, "documents")
        s = sample_by_group(docs, ["source"], 7, "doc_id")
        bad = (s.select("doc_id", "source")
               .exceptAll(docs.select("doc_id", "source")).count())
        return (s.groupBy("source")
                .agg(F.count(F.lit(1)).alias("n_sampled"))
                .withColumn("subset_ok", F.lit(bad == 0))
                .orderBy("source"))

    q["sample_by_group_documents"] = sample_by_group_documents

    def distinct_sample_orders(spark, sf):
        """KMV-with-payload uniform distinct sample (new r5,
        spark/sampling.py): bottom-50 distinct o_custkey by the md5-52-bit
        cross-engine hash — a mergeable sample of distinct KEYS a
        10^12-row table can't produce via ORDER BY random(). The native
        engine is pure codegen (distinct + TakeOrderedAndProject); DuckDB
        re-derives the IDENTICAL keys and hash values."""
        from ddsketchy_spark.spark.sampling import kmv_sample_native

        return (kmv_sample_native(_load(spark, sf, "orders"), "o_custkey",
                                  k=50, seed=0)
                .select("key", "u"))

    q["distinct_sample_orders"] = distinct_sample_orders

    def distinct_sample_by_status_orders(spark, sf):
        """Grouped KMV sample: bottom-20 distinct custkeys per order
        status — one hash shuffle over pre-reduced distinct rows, window
        top-k per group (never a per-group full sort of raw rows)."""
        from ddsketchy_spark.spark.sampling import kmv_sample_native

        return (kmv_sample_native(_load(spark, sf, "orders"), "o_custkey",
                                  by=["o_orderstatus"], k=20, seed=3)
                .select("o_orderstatus", "key", "u"))

    q["distinct_sample_by_status_orders"] = distinct_sample_by_status_orders

    def weighted_sample_documents(spark, sf):
        """Efraimidis-Spirakis weighted sample (new r5): 40 documents
        without replacement, inclusion probability ~ n_chars — rank =
        -ln(md5-uniform)/weight is a pure function of (doc_id, seed,
        n_chars), so any partitioning, the blob aggregator, and the DuckDB
        oracle select the IDENTICAL docs (ranks rounded to 6 dp per the
        float convention; selection compares full doubles, where the only
        cross-engine wiggle is the sub-ulp tail of ln)."""
        from ddsketchy_spark.spark.sampling import weighted_sample_native

        docs = _load(spark, sf, "documents")
        out = weighted_sample_native(docs, "doc_id", "n_chars", k=40, seed=0)
        return out.select("key", "weight",
                          _r6(F.col("rank")).alias("rank_r6"))

    q["weighted_sample_documents"] = weighted_sample_documents

    def sessionize_events(spark, sf):
        """Gap-based sessionization (new r5, spark/sessions.py): user
        activity sessions that close after 6 h of inactivity, via Spark's
        native session_window aggregate — map-side partial min/max/count/
        sum per micro-session, ONE exchange on user_id, JVM-side session
        merge (MergingSessions), no window over raw rows. DuckDB
        re-derives whole sessions with the gaps-and-islands law (split
        strictly at diff > gap, matching session_window's inclusive
        boundary)."""
        from ddsketchy_spark.spark.sessions import sessionize

        ev = _load(spark, sf, "events")
        return sessionize(
            ev, "ts", 21600.0, by=["user_id"],
            aggs=[_r6(F.sum("value")).alias("value_sum_r6")])

    q["sessionize_events"] = sessionize_events

    def token_pairs_documents(spark, sf):
        """Adjacent-pair frequencies (new r5, pipeline/text.py
        array_pair_counts): the BPE merge-candidate statistic — top-25
        adjacent word pairs, built as codegen zip-slices (no HOF lambda),
        exploded, counted with a map-side combine (shuffle = distinct
        pairs only). The same operator runs on the input_hint token
        table's array<int32> (brute-force parity in test_token_pairs);
        this oracle twin runs it on word arrays DuckDB can re-derive."""
        from ddsketchy_spark.pipeline.text import array_pair_counts

        docs = _load(spark, sf, "documents")
        return array_pair_counts(
            docs.where(F.col("text").isNotNull())
                .select(F.split("text", " ").alias("w")),
            "w", top_k=25)

    q["token_pairs_documents"] = token_pairs_documents

    def bpe_merges_documents(spark, sf):
        """Distributed BPE merge training (new r5, pipeline/bpe.py
        train_bpe_merges): 4 greedy merge rounds over the documents'
        word arrays — each round one codegen pair-count pass (shuffle =
        distinct pairs) + a LIMIT-1 argmax + one literal-replace codegen
        projection on the SEP-delimited string form. Returns the merge
        table (merge_round, left_tok, right_tok, pair_count); the DuckDB
        oracle unrolls the same four rounds with replace() — whose
        left-to-right non-overlapping scan is bit-for-bit the trainer's
        fusion law — so an ITERATIVE algorithm is still hash-matched."""
        from ddsketchy_spark.pipeline.bpe import train_bpe_merges

        docs = _load(spark, sf, "documents")
        return train_bpe_merges(
            docs.where(F.col("text").isNotNull())
                .select(F.split("text", " ").alias("w")),
            "w", n_merges=4, min_count=1)

    q["bpe_merges_documents"] = bpe_merges_documents

    def vocab_coverage_documents(spark, sf):
        """Vocabulary coverage / OOV-rate per source vs the corpus's own
        top-500 words (new r5, pipeline/text.py vocab_coverage — the
        tokenizer-fit statistic): tokens explode pipeline-locally,
        stream through one broadcast join against the bounded vocab,
        and collapse map-side — the only exchanges carry distinct words
        (vocab derivation) and one row per source (the report)."""
        from ddsketchy_spark.pipeline.text import vocab_coverage

        docs = _load(spark, sf, "documents")
        return vocab_coverage(
            docs.where(F.col("text").isNotNull()
                       & F.col("source").isNotNull())
                .select("source", F.split("text", " ").alias("w")),
            "w", vocab=500, by=["source"])

    q["vocab_coverage_documents"] = vocab_coverage_documents

    def encode_bpe_documents(spark, sf):
        """The tokenizer loop closed end-to-end (new r5, pipeline/bpe.py
        bpe_vocab + encode_bpe): train 2 BPE merges on the documents'
        word arrays, derive the deterministic vocabulary (base symbols
        in binary order, then merges by rank), and encode every document
        to array<int> ids — the north rule's own pre-tokenized input
        shape, produced by the engine itself. Encoding is the stacked
        codegen replace chain plus ONE vectorized mapInArrow id gather
        (bounded vocab broadcast as a dict; only each batch's DISTINCT
        symbols touch Python) — no shuffle, no join on the corpus side.
        The oracle re-derives the merges, the vocabulary numbering, the
        fusion, and every id sequence (as csv) row for row."""
        from ddsketchy_spark.pipeline.bpe import (bpe_vocab, encode_bpe,
                                                  train_bpe_merges)

        docs = _load(spark, sf, "documents").where(
            F.col("doc_id").isNotNull() & F.col("text").isNotNull())
        w = docs.select("doc_id", F.split("text", " ").alias("w"))
        merges = train_bpe_merges(w.select("w"), "w", n_merges=2,
                                  min_count=1)
        vocab = bpe_vocab(w, merges, "w", validate=False)
        enc = encode_bpe(w, merges, arr_col="w", out_col="ids",
                         vocab=vocab, validate=False)
        return enc.select(
            "doc_id",
            F.size("ids").cast("long").alias("n_bpe"),
            F.array_join(F.col("ids").cast("array<string>"), ",")
             .alias("ids_csv"))

    q["encode_bpe_documents"] = encode_bpe_documents

    def bigram_logprob_documents(spark, sf):
        """Stupid-backoff bigram LM quality scores (new r5,
        pipeline/text.py bigram_logprob_scores — Brants et al. 2007):
        top-400 bigram table scored c12/c1, everything else
        0.4 * p_uni(w2) under the vocab-300 unigram law (both fallback
        paths live at these cuts). Model tables are bounded and
        broadcast; the scoring pass is the exploded pair stream through
        two broadcast joins into a map-side-collapsing per-doc
        aggregate. DuckDB re-derives the whole law row for row."""
        from ddsketchy_spark.pipeline.text import bigram_logprob_scores

        docs = _load(spark, sf, "documents").where(
            F.col("doc_id").isNotNull())
        return bigram_logprob_scores(
            docs, vocab_size=300, bigram_size=400).select(
            "doc_id", "n_bigrams", "bigram_nll", "backoff_frac")

    q["bigram_logprob_documents"] = bigram_logprob_documents

    def mixture_sample_documents(spark, sf):
        """Training-data mixture sampling to per-source token budgets
        (new r4): src0 downsampled (~0.5x), src1 upsampled (~2.3x with
        duplicate copies), src2 ~1x, every other source dropped — the
        md5-uniform Bernoulli-copy law re-derived end-to-end by DuckDB
        (kept rows, copy counts, and mixed token mass all hash-matched)."""
        from ddsketchy_spark.pipeline.mix import sample_to_token_budget

        docs = _load(spark, sf, "documents")
        out = sample_to_token_budget(
            docs, {"src0": 4000.0, "src1": 20000.0, "src2": 7000.0},
            token_col="n_chars", seed=7)
        return (out.groupBy("source")
                .agg(F.count(F.lit(1)).alias("docs_kept"),
                     F.sum("n_copies").alias("copies"),
                     F.sum(F.col("n_chars") * F.col("n_copies"))
                     .alias("chars_mixed"))
                .orderBy("source"))

    q["mixture_sample_documents"] = mixture_sample_documents

    def split_corpus_documents(spark, sf):
        """Deterministic train/val/test corpus split (pipeline/split.py):
        per-doc md5-uniform assignment under cumulative normalized
        weights, a pure codegen projection — split membership, per-split
        doc counts and char mass re-derived end-to-end by DuckDB."""
        from ddsketchy_spark.pipeline.split import split_corpus

        docs = _load(spark, sf, "documents").where("doc_id IS NOT NULL")
        out = split_corpus(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
        return (out.groupBy("split")
                .agg(F.count(F.lit(1)).alias("docs"),
                     F.sum("n_chars").alias("chars"))
                .orderBy("split"))

    q["split_corpus_documents"] = split_corpus_documents

    def split_corpus_grouped_documents(spark, sf):
        """Leakage-safe grouped split: group_col='source' puts every
        document of a source on one side (the near-dup-cluster / domain
        pattern); DuckDB re-derives the group->split map and per-split
        rollup, and Spark asserts zero straddling groups."""
        from ddsketchy_spark.pipeline.split import split_corpus

        docs = (_load(spark, sf, "documents")
                .where("doc_id IS NOT NULL AND source IS NOT NULL"))
        out = split_corpus(docs, {"train": 0.7, "test": 0.3},
                           group_col="source", seed=3)
        straddle = (out.groupBy("source")
                    .agg(F.countDistinct("split").alias("k"))
                    .where("k > 1").count())
        return (out.groupBy("split")
                .agg(F.countDistinct("source").alias("n_sources"),
                     F.count(F.lit(1)).alias("docs"))
                .withColumn("no_straddle", F.lit(straddle == 0))
                .orderBy("split"))

    q["split_corpus_grouped_documents"] = split_corpus_grouped_documents

    def top_frac_by_group_documents(spark, sf):
        """Per-domain quality cut (spark/skew.py take_top_frac_by_group,
        method='sample'): keep each source's top 20% by n_chars. Every
        source group fits the deterministic hash sample (sample_k=4096 >>
        group sizes at gate scales), so the cut is EXACTLY the group's
        lower 0.8-quantile threshold — DuckDB re-derives per-source
        threshold and kept count from first principles."""
        from ddsketchy_spark.spark.skew import take_top_frac_by_group

        docs = (_load(spark, sf, "documents")
                .select("doc_id", "source", "n_chars")
                .where("doc_id IS NOT NULL"))
        out = take_top_frac_by_group(docs, 0.2, "n_chars", "source",
                                     key_col="doc_id", keep_threshold=True)
        return (out.groupBy("source")
                .agg(F.count(F.lit(1)).alias("kept"),
                     F.min(F.col("_thr").cast("long")).alias("thr"),
                     F.sum("n_chars").alias("chars_kept"))
                .orderBy("source"))

    q["top_frac_by_group_documents"] = top_frac_by_group_documents

    def mixture_pack_documents(spark, sf):
        """Composed pipeline stages (new r4): mixture sampling with
        EXPLODED upsample copies feeding sequence packing — the physical
        training stream's per-(doc, copy) packing manifest, re-derived
        end-to-end by DuckDB across BOTH operator laws (Bernoulli copy
        counts, then the (md5, id)-ordered prefix sum)."""
        from ddsketchy_spark.pipeline.mix import (
            pack_sequences,
            sample_to_token_budget,
        )

        docs = _load(spark, sf, "documents")
        mixed = sample_to_token_budget(
            docs, {"src0": 4000.0, "src1": 20000.0, "src2": 7000.0},
            token_col="n_chars", seed=7, explode_copies=True)
        packed = pack_sequences(
            mixed.withColumn("_pid", F.concat_ws("#", F.col("doc_id"),
                                                 F.col("copy"))),
            2048, token_col="n_chars", id_col="_pid", seed=11)
        return (packed.select("doc_id", F.col("copy").alias("copy_idx"),
                              "start_seq", "start_pos", "n_seqs")
                .orderBy("doc_id", "copy_idx"))

    q["mixture_pack_documents"] = mixture_pack_documents

    def quantile_shards_documents(spark, sf):
        """Sketch-guided range partitioning (pipeline/partition.py): KLL
        quantile boundaries over n_chars, codegen comparison-chain
        assignment. Spark asserts the rank law (each boundary's true
        rank within 0.03 of its i/m target — k=200 empirical error) and
        quantile balance (every range within 6% of n/m); DuckDB anchors
        the row count the law quantifies over."""
        from ddsketchy_spark.pipeline.partition import (
            assign_range_id, sketch_range_boundaries)

        m = 8
        docs = (_load(spark, sf, "documents")
                .select("doc_id", "n_chars").where("n_chars IS NOT NULL"))
        bounds = sketch_range_boundaries(docs, "n_chars", m)
        n = docs.count()
        rank_aggs = [F.sum((F.col("n_chars") < F.lit(b)).cast("long"))
                     .alias(f"r{i}") for i, b in enumerate(bounds, 1)]
        ranks = docs.agg(*rank_aggs).collect()[0]
        rank_ok = all(abs(ranks[f"r{i}"] / n - i / m) <= 0.03
                      for i in range(1, len(bounds) + 1))
        counts = [r["count"] for r in
                  assign_range_id(docs, "n_chars", bounds)
                  .groupBy("range_id").count().collect()]
        balance_ok = (len(counts) == m
                      and all(abs(c - n / m) <= 0.06 * n for c in counts)
                      and sum(counts) == n)
        return spark.createDataFrame(
            [(int(n), int(m), bool(len(bounds) == m - 1), bool(rank_ok),
              bool(balance_ok))],
            "total long, n_ranges long, full_boundary_set boolean, "
            "rank_err_le_3pct boolean, balance_6pct boolean")

    q["quantile_shards_documents"] = quantile_shards_documents

    def pack_sequences_documents(spark, sf):
        """GPT-style sequence packing with document splitting (new r4):
        the full per-document manifest (start_seq, start_pos, n_seqs) at
        seq_len=2048 chars, hash-matched row-for-row against DuckDB's
        single-window re-derivation of the distributed prefix-sum law."""
        from ddsketchy_spark.pipeline.mix import pack_sequences

        return (pack_sequences(_load(spark, sf, "documents"), 2048,
                               token_col="n_chars", seed=5)
                .select("doc_id", "start_seq", "start_pos", "n_seqs")
                .orderBy("doc_id"))

    q["pack_sequences_documents"] = pack_sequences_documents

    def decontaminate_documents(spark, sf):
        """GPT-3-style 13-gram benchmark decontamination: the first five
        documents act as the eval set; every corpus doc sharing a 13-gram
        with them is dropped. Counts hash-matched against a DuckDB string
        n-gram re-derivation (Spark joins on xxhash64(gram), DuckDB on the
        gram itself — equal absent a 64-bit collision)."""
        from ddsketchy_spark.pipeline.text import contamination_pairs

        docs = _load(spark, sf, "documents")
        bench = docs.filter("doc_id < 5")
        # one contamination join serves both numbers (decontaminate() would
        # recompute the same gram join for the anti-join)
        bad = (contamination_pairs(docs, bench, n=13)
               .select(F.col("corpus_id").alias("doc_id")).distinct())
        contaminated = bad.count()
        kept = docs.join(bad, "doc_id", "left_anti").count()
        return spark.createDataFrame(
            [(int(contaminated), int(kept))],
            "contaminated_docs long, docs_after_decontam long")

    q["decontaminate_documents"] = decontaminate_documents

    def redact_pii_documents(spark, sf):
        """PII scrubbing over the corpus plus planted PII rows (planted
        identically in the DuckDB oracle as VALUES literals): redacted
        text and per-type counts hash-matched row-for-row."""
        from ddsketchy_spark.pipeline.text import redact_pii

        docs = _load(spark, sf, "documents").select("doc_id", "text")
        planted = spark.createDataFrame(
            [(900001, "mail a@b.io or jane.doe+x@example.org now"),
             (900002, "host 10.0.0.1 peer 192.168.1.255"),
             (900003, "dial +1 555-123-4567 or +44 20 7946 0958")],
            "doc_id long, text string")
        return (redact_pii(docs.unionByName(planted))
                .select("doc_id", "n_email", "n_ip", "n_phone", "n_pii",
                        "text_redacted")
                .orderBy("doc_id"))

    q["redact_pii_documents"] = redact_pii_documents

    def dedup_exact_documents(spark, sf):
        from ddsketchy_spark.pipeline.dedup import dedup_exact, exact_dup_groups

        dfd = _docs_with_dups(spark, sf)
        groups = exact_dup_groups(dfd).count()
        kept = dedup_exact(dfd).count()
        return spark.createDataFrame([(int(groups), int(kept))],
                                     "dup_groups long, docs_after_dedup long")

    q["dedup_exact_documents"] = dedup_exact_documents

    def word_jaccard_near_dups(spark, sf):
        from ddsketchy_spark.pipeline.dedup import word_jaccard_pairs

        dfd = _docs_with_dups(spark, sf)
        pairs = word_jaccard_pairs(dfd, threshold=0.999)
        return pairs.agg(F.count(F.lit(1)).alias("pairs_999"))

    q["word_jaccard_near_dups"] = word_jaccard_near_dups


    def _exact_dup_pair_count(dfd):
        return (
            dfd.select(F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
            .groupBy("fp").count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).cast("long")
                    .alias("p"))
            .collect()[0]["p"]
        )

    def minhash_lsh_exact_dup_recall(spark, sf):
        from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs

        dfd = _docs_with_dups(spark, sf)
        md5_pairs = _exact_dup_pair_count(dfd)
        lsh = minhash_lsh_pairs(dfd, num_perm=128, bands=32)
        sigs_equal = lsh.filter(F.col("est_jaccard") == 1.0)
        fp = dfd.select(F.col("doc_id"), F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        found = (sigs_equal
                 .join(fp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("fp", "fp_a"), "id_a")
                 .join(fp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("fp", "fp_b"), "id_b")
                 .filter(F.col("fp_a") == F.col("fp_b")).count())
        return spark.createDataFrame(
            [(int(md5_pairs), bool(found == md5_pairs))],
            "exact_dup_pairs long, lsh_found_all boolean")

    q["minhash_lsh_exact_dup_recall"] = minhash_lsh_exact_dup_recall

    def simhash_exact_dup_recall(spark, sf):
        from ddsketchy_spark.pipeline.dedup import simhash_near_pairs

        dfd = _docs_with_dups(spark, sf)
        md5_pairs = _exact_dup_pair_count(dfd)
        zero = simhash_near_pairs(dfd, max_hamming=3).filter("hamming = 0")
        fp = dfd.select(F.col("doc_id"), F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        found = (zero
                 .join(fp.withColumnRenamed("doc_id", "id_a").withColumnRenamed("fp", "fp_a"), "id_a")
                 .join(fp.withColumnRenamed("doc_id", "id_b").withColumnRenamed("fp", "fp_b"), "id_b")
                 .filter(F.col("fp_a") == F.col("fp_b")).count())
        return spark.createDataFrame(
            [(int(md5_pairs), bool(found == md5_pairs))],
            "exact_dup_pairs long, simhash_found_all boolean")

    q["simhash_exact_dup_recall"] = simhash_exact_dup_recall

    def cosine_topk_embeddings(spark, sf):
        from ddsketchy_spark.pipeline.similarity import cosine_topk

        emb = _load(spark, sf, "embeddings").filter("vec_id < 40")
        out = cosine_topk(emb, k=3)
        return out.select(F.col("id").alias("vec_id"), "neighbor",
                          _r6(F.col("cos") + F.lit(1.0)).alias("cos1")).orderBy(
            "vec_id", "neighbor")

    q["cosine_topk_embeddings"] = cosine_topk_embeddings

    def ann_query_embeddings(spark, sf):
        from ddsketchy_spark.pipeline.similarity import ann_query

        emb = _load(spark, sf, "embeddings")
        qvec = emb.filter("vec_id = 0").select("embedding").first()[0]
        out = ann_query(emb, qvec, k=10)
        return out.select("vec_id", _r6(F.col("cos") + F.lit(1.0)).alias("cos1"))

    q["ann_query_embeddings"] = ann_query_embeddings

    def dds_mixed_sign_centered(spark, sf):
        """DDSketch over (value - 35): exercises the negative store and the
        three-region quantile walk end-to-end vs the SQL oracle."""
        df = _load(spark, sf, "events").withColumn("xc", F.col("value") - F.lit(35.0))
        qs = (0.1, 0.25, 0.5, 0.75, 0.9)
        out = ddsketch_quantiles(df, "xc", alpha=ALPHA, quantiles=qs)
        labels = [_QLABELS[x] for x in qs]
        row = {"cnt": out["count"]}
        row.update({lab: out[quantile_label(x)] for x, lab in zip(qs, labels)})
        sdf = spark.createDataFrame(
            [row], schema="cnt long, " + ", ".join(f"{l} double" for l in labels))
        return sdf.select(F.col("cnt"), *[_r6(F.col(l)).alias(l) for l in labels])

    q["dds_mixed_sign_centered"] = dds_mixed_sign_centered

    def dds_documents_nchars_by_source(spark, sf):
        return _dds_wide(spark, sf, "documents", "n_chars", (0.5, 0.9), by="source")

    q["dds_documents_nchars_by_source"] = dds_documents_nchars_by_source

    def tdigest_kll_quantity_by_returnflag(spark, sf):
        """Grouped t-digest + KLL vs Spark-exact per-group quantiles,
        materialized as boolean bound columns."""
        from ddsketchy_spark.spark.companions import kll_quantiles, tdigest_quantiles
        from ddsketchy_spark.spark.ddsketch_agg import quantile_label as _ql

        df = _load(spark, sf, "lineitem")
        qs = (0.5, 0.9)
        td = {r["l_returnflag"]: r for r in
              tdigest_quantiles(df, "l_quantity", by=["l_returnflag"],
                                quantiles=qs).collect()}
        kl = {r["l_returnflag"]: r for r in
              kll_quantiles(df, "l_quantity", by=["l_returnflag"],
                            quantiles=qs).collect()}
        import numpy as _np

        rows = []
        for flag in sorted(td):
            vals = _np.sort(_np.asarray(
                [r["l_quantity"] for r in
                 df.filter(F.col("l_returnflag") == flag).select("l_quantity").collect()]))

            def rank_ok(est, x, tol=0.02):
                return bool(abs(float(_np.searchsorted(vals, est) / len(vals)) - x) <= tol)

            rows.append((
                flag, int(td[flag]["count"]),
                all(rank_ok(td[flag][_ql(x)], x) for x in qs),
                all(rank_ok(kl[flag][_ql(x)], x, 0.03) for x in qs),
            ))
        return spark.createDataFrame(
            rows, "l_returnflag string, cnt long, tdigest_ok boolean, kll_ok boolean")

    q["tdigest_kll_quantity_by_returnflag"] = tdigest_kll_quantity_by_returnflag

    def repetition_scores_documents(spark, sf):
        """Gopher-style intra-doc repetition fractions over ALL documents,
        value-matched row-for-row against a DuckDB re-derivation."""
        from ddsketchy_spark.pipeline.text import repetition_scores

        return (repetition_scores(_load(spark, sf, "documents"))
                .select("doc_id", "dup_ngram_frac_2", "dup_ngram_frac_3",
                        "dup_line_frac")
                .orderBy("doc_id"))

    q["repetition_scores_documents"] = repetition_scores_documents

    def unigram_logprob_documents(spark, sf):
        """CCNet-style unigram-LM quality scores (new r4): the model is
        trained on the corpus itself (top-500 vocabulary so the OOV floor
        path is exercised), per-doc mean NLL + oov_frac value-matched
        row-for-row against a full DuckDB re-derivation."""
        from ddsketchy_spark.pipeline.text import unigram_logprob_scores

        return (unigram_logprob_scores(_load(spark, sf, "documents"),
                                       vocab_size=500)
                .select("doc_id", "n_scored_tokens", "unigram_nll",
                        "oov_frac")
                .orderBy("doc_id"))

    q["unigram_logprob_documents"] = unigram_logprob_documents

    def dedup_paragraphs_documents(spark, sf):
        """Corpus-wide paragraph dedup on a corpus with a planted shared
        boilerplate paragraph (appended to every doc_id % 3 == 0): the
        rewritten text of EVERY document is md5-matched against a full
        DuckDB re-derivation of the first-occurrence law."""
        from ddsketchy_spark.pipeline.dedup import dedup_paragraphs

        docs = _load(spark, sf, "documents").select("doc_id", "text")
        corpus = docs.withColumn(
            "text",
            F.when(F.col("doc_id") % 3 == 0,
                   F.concat(F.col("text"), F.lit("\n" + _PARA_BOILERPLATE)))
            .otherwise(F.col("text")))
        out = dedup_paragraphs(corpus, min_chars=20)
        return (out.select(
            "doc_id",
            F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("text_md5"),
            F.col("n_paras_removed").cast("long").alias("n_paras_removed"))
            .orderBy("doc_id"))

    q["dedup_paragraphs_documents"] = dedup_paragraphs_documents

    def winnowing_fingerprints_docs(spark, sf):
        """Winnowing over ALL documents, hash-matched row-for-row against a
        full DuckDB re-derivation of the rolling k-gram hash + window-min
        selection (the mod-2^61 arithmetic is exact in HUGEINT)."""
        from ddsketchy_spark.pipeline.text import winnowing_fingerprints

        docs = _load(spark, sf, "documents")
        return (winnowing_fingerprints(docs, k=5, window=4)
                .orderBy("doc_id", "pos"))

    q["winnowing_fingerprints_docs"] = winnowing_fingerprints_docs

    def lsh_cosine_topk_embeddings(spark, sf):
        """LSH top-k through the fully distributed verify='local' engine,
        asserted pair-for-pair/cosine-for-cosine against the broadcast
        engine, plus recall@1 vs the exact top-1 neighbor. The DuckDB
        oracle anchors n_vecs from the data; the booleans carry the
        non-SQL-expressible parts."""
        from ddsketchy_spark.pipeline.similarity import cosine_topk, lsh_cosine_topk

        emb = _load(spark, sf, "embeddings")
        kw = dict(k=3, n_planes=16, bands=8, dim=64)
        loc = {(r["id"], r["neighbor"]): round(r["cos"], 9)
               for r in lsh_cosine_topk(emb, verify="local", **kw).collect()}
        bro = {(r["id"], r["neighbor"]): round(r["cos"], 9)
               for r in lsh_cosine_topk(emb, verify="broadcast", **kw).collect()}
        exact1 = {(r["id"], r["neighbor"])
                  for r in cosine_topk(emb, k=1).collect()}
        hits = sum(1 for (i, nb) in exact1 if (i, nb) in loc)
        recall1 = hits / max(len(exact1), 1)
        return spark.createDataFrame(
            [(int(emb.count()), bool(loc == bro), bool(recall1 >= 0.6))],
            "n_vecs long, local_equals_broadcast boolean, recall1_ge_0_6 boolean")

    q["lsh_cosine_topk_embeddings"] = lsh_cosine_topk_embeddings

    def ivf_cosine_topk_embeddings(spark, sf):
        """Distributed IVF (sample-trained centroids, mapInArrow assignment,
        join-back verification): recall@1 of IVF top-3 vs exact top-1."""
        from ddsketchy_spark.pipeline.similarity import cosine_topk, ivf_cosine_topk

        emb = _load(spark, sf, "embeddings")
        topk = ivf_cosine_topk(emb, k=3, n_clusters=8, n_probe=3,
                               train_rows=200)
        by_id: dict = {}
        for r in topk.collect():
            by_id.setdefault(r["id"], set()).add(r["neighbor"])
        exact1 = {(r["id"], r["neighbor"])
                  for r in cosine_topk(emb, k=1).collect()}
        hits = sum(1 for (i, nn) in exact1 if nn in by_id.get(i, set()))
        recall1 = hits / max(len(exact1), 1)
        return spark.createDataFrame(
            [(int(emb.count()), bool(recall1 >= 0.5))],
            "n_vecs long, ivf_recall1_ge_0_5 boolean")

    q["ivf_cosine_topk_embeddings"] = ivf_cosine_topk_embeddings

    def ann_query_batch_embeddings(spark, sf):
        """Batched exact ANN (one scan for all queries, per-batch top-k
        pre-filter, window final): top-5 for three query vectors taken
        from the table itself, hash-matched against a DuckDB cross-join
        rank oracle."""
        from ddsketchy_spark.pipeline.similarity import ann_query_batch

        emb = _load(spark, sf, "embeddings")
        qrows = (emb.filter("vec_id IN (0, 1, 2)").orderBy("vec_id")
                 .select("vec_id", "embedding").collect())
        res = ann_query_batch(emb, [r["embedding"] for r in qrows], k=5,
                              query_ids=[r["vec_id"] for r in qrows])
        return (res.select("query_id", "vec_id",
                           _r6(F.col("cos") + 1.0).alias("cos1"))
                .orderBy("query_id", "vec_id"))

    q["ann_query_batch_embeddings"] = ann_query_batch_embeddings

    def ann_query_ivf_embeddings(spark, sf):
        """Sublinear IVF query path served ENTIRELY FROM DISK: the index is
        persisted with write_ivf_index (partitionBy(cluster) parquet +
        centroid sidecar via the Hadoop FS API), reloaded with
        read_ivf_index, and probed (n_probe inverted lists only, partition
        pruning at the scan). Every query drawn from the table finds
        itself at cos~1 and recall@1 vs the exact scan holds. The oracle
        anchors n_vecs; the booleans carry the index guarantees."""
        import shutil
        import tempfile

        from ddsketchy_spark.pipeline.similarity import (
            ann_query, ann_query_ivf, ivf_index, read_ivf_index,
            write_ivf_index)

        emb = _load(spark, sf, "embeddings")
        idx, cents = ivf_index(emb, n_clusters=8, train_rows=200)
        tmp = tempfile.mkdtemp(prefix="ddsketchy_ivf_")
        try:
            path = f"{tmp}/index"
            write_ivf_index(idx, cents, path)
            stored, cents_disk, _meta = read_ivf_index(spark, path)
            qrows = (emb.filter("vec_id IN (0, 1, 2)").orderBy("vec_id")
                     .select("vec_id", "embedding").collect())
            qvecs = [r["embedding"] for r in qrows]
            res = ann_query_ivf(stored, cents_disk, qvecs, k=5, n_probe=4,
                                query_ids=[0, 1, 2])
            by_q: dict = {}
            for r in res.collect():
                by_q.setdefault(r["query_id"], []).append(r)
            self_found = all(
                max(by_q.get(i, []), key=lambda r: r["cos"], default=None)
                is not None
                and max(by_q[i], key=lambda r: r["cos"])["id"] == i
                for i in (0, 1, 2))
            hits = 0
            for i, vec in zip((0, 1, 2), qvecs):
                exact = [r["vec_id"] for r in
                         ann_query(emb, vec, k=2).collect()
                         if r["vec_id"] != i][0]
                hits += exact in {r["id"] for r in by_q.get(i, [])}
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return spark.createDataFrame(
            [(int(emb.count()), bool(self_found), bool(hits >= 2))],
            "n_vecs long, self_found boolean, recall1_ge_2_of_3 boolean")

    q["ann_query_ivf_embeddings"] = ann_query_ivf_embeddings

    def pq_ann_embeddings(spark, sf):
        """Product-quantized ANN (pipeline/pq.py): 64-dim float vectors
        compressed to 8-byte codes (64x vs float64), queried via ADC
        (asymmetric distance computation — the query stays unquantized,
        scoring is m table lookups per row). The engine's (set, score)
        output is re-derived driver-side in NumPy from the collected
        code table — exact parity, not a recall threshold — plus the
        self-find and code-width guarantees. The oracle anchors n_vecs."""
        import numpy as np

        from ddsketchy_spark.pipeline.pq import (
            _adc_lut, _adc_scores, ann_query_pq, pq_encode,
            train_pq_codebooks)

        emb = _load(spark, sf, "embeddings")
        books = train_pq_codebooks(emb, m=8, nbits=8, train_rows=10_000,
                                   seed=11)
        enc = pq_encode(emb, books)
        code_rows = enc.collect()
        qrows = (emb.filter("vec_id IN (0, 1, 2)").orderBy("vec_id")
                 .select("vec_id", "embedding").collect())
        Q = np.asarray([r["embedding"] for r in qrows], dtype=np.float64)
        res = ann_query_pq(enc, books, Q, k=5, query_ids=[0, 1, 2])
        got = {(r["query_id"], r["id"]): r["score"] for r in res.collect()}
        codes_8 = all(len(r["codes"]) == 8 for r in code_rows)
        ids = np.asarray([r["id"] for r in code_rows])
        codes = np.stack([np.frombuffer(r["codes"], dtype=np.uint8)
                          for r in code_rows])
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        sims = _adc_scores(_adc_lut(Qn, books), codes)  # (n, 3)
        law = {}
        for qi in range(3):
            order = sorted(range(len(ids)),
                           key=lambda i: (-sims[i, qi], ids[i]))[:5]
            for i in order:
                law[(qi, int(ids[i]))] = sims[i, qi]
        matches = (set(got) == set(law) and
                   all(abs(got[k2] - law[k2]) < 1e-9 for k2 in law))
        self_found = all(
            (qi, qi) in got and
            got[(qi, qi)] >= max(v for k2, v in got.items()
                                 if k2[0] == qi) - 1e-9
            for qi in range(3))
        return spark.createDataFrame(
            [(int(len(code_rows)), bool(matches), bool(self_found),
              bool(codes_8))],
            "n_vecs long, engine_matches_law boolean, self_found boolean, "
            "codes_8_bytes boolean")

    q["pq_ann_embeddings"] = pq_ann_embeddings

    def ivf_pq_ann_embeddings(spark, sf):
        """IVFADC (Jégou 2011) served FROM DISK: coarse inverted lists
        (partitionBy(cluster) layout, cluster IN probe pruning) + PQ of
        the residual, centroids and codebooks in one sidecar. The probe
        (n_probe=4 of 8 lists) is re-derived driver-side in NumPy —
        same probed-cluster eligibility, same q·centroid + ADC(residual)
        score, exact (set, score) parity — plus self-find and the
        sidecar bit-round-trip. The oracle anchors n_vecs."""
        import shutil
        import tempfile

        import numpy as np

        from ddsketchy_spark.pipeline.pq import (
            _adc_lut, _adc_scores, ann_query_ivf_pq, ivf_pq_index,
            read_ivf_pq_index, write_ivf_pq_index)

        emb = _load(spark, sf, "embeddings")
        idx, cents, books = ivf_pq_index(emb, n_clusters=8, m=8, nbits=8,
                                         train_rows=10_000, seed=11)
        tmp = tempfile.mkdtemp(prefix="ddsketchy_ivfpq_")
        try:
            path = f"{tmp}/index"
            write_ivf_pq_index(idx, cents, books, path)
            stored, cents_d, books_d, _meta = read_ivf_pq_index(spark, path)
            sidecar_ok = (cents_d == cents).all() and (books_d == books).all()
            member_rows = stored.select("id", "cluster", "codes").collect()
            qrows = (emb.filter("vec_id IN (0, 1, 2)").orderBy("vec_id")
                     .select("vec_id", "embedding").collect())
            Q = np.asarray([r["embedding"] for r in qrows],
                           dtype=np.float64)
            res = ann_query_ivf_pq(stored, cents_d, books_d, Q, k=5,
                                   n_probe=4, query_ids=[0, 1, 2])
            got = {(r["query_id"], r["id"]): r["score"]
                   for r in res.collect()}
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        ids = np.asarray([r["id"] for r in member_rows])
        cl = np.asarray([r["cluster"] for r in member_rows], dtype=np.int64)
        codes = np.stack([np.frombuffer(r["codes"], dtype=np.uint8)
                          for r in member_rows])
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        coarse = Qn @ cents.T
        probes = np.argsort(-coarse, axis=1)[:, :4]
        sims = _adc_scores(_adc_lut(Qn, books), codes)
        sims += coarse.T[cl]
        law = {}
        for qi in range(3):
            elig = [i for i in range(len(ids)) if cl[i] in probes[qi]]
            order = sorted(elig, key=lambda i: (-sims[i, qi], ids[i]))[:5]
            for i in order:
                law[(qi, int(ids[i]))] = sims[i, qi]
        matches = (set(got) == set(law) and
                   all(abs(got[k2] - law[k2]) < 1e-9 for k2 in law))
        self_found = all(
            (qi, qi) in got and
            got[(qi, qi)] >= max(v for k2, v in got.items()
                                 if k2[0] == qi) - 1e-9
            for qi in range(3))
        return spark.createDataFrame(
            [(int(emb.count()), bool(matches), bool(self_found),
              bool(sidecar_ok))],
            "n_vecs long, engine_matches_law boolean, self_found boolean, "
            "sidecar_roundtrip boolean")

    q["ivf_pq_ann_embeddings"] = ivf_pq_ann_embeddings

    def minhash_lsh_bucketlocal_parity(spark, sf):
        """The scale-path LSH verification (verify='local': no driver
        collect, no broadcast matrix) must produce the exact pair set and
        est_jaccard values of the broadcast engine on the planted-duplicate
        corpus. exact_dup_pairs anchors the oracle to the data."""
        from ddsketchy_spark.pipeline.dedup import minhash_lsh_pairs

        dfd = _docs_with_dups(spark, sf)
        md5_pairs = _exact_dup_pair_count(dfd)
        kw = dict(num_perm=128, bands=32)
        loc = {(r["id_a"], r["id_b"]): r["est_jaccard"]
               for r in minhash_lsh_pairs(dfd, verify="local", **kw).collect()}
        bro = {(r["id_a"], r["id_b"]): r["est_jaccard"]
               for r in minhash_lsh_pairs(dfd, verify="broadcast", **kw).collect()}
        sym = len(set(loc) ^ set(bro))
        mism = sum(1 for p in loc if p in bro and loc[p] != bro[p])
        return spark.createDataFrame(
            [(int(md5_pairs), int(sym), int(mism))],
            "exact_dup_pairs long, pair_sym_diff long, est_mismatches long")

    q["minhash_lsh_bucketlocal_parity"] = minhash_lsh_bucketlocal_parity

    def dedup_near_text_documents(spark, sf):
        """End-to-end near-dup text dedup through the fully distributed
        pipeline (LSH verify='local' -> threshold -> connected components
        -> canonical keep). Invariants checked against the md5 ground
        truth: every exact-duplicate group lands in ONE component (LSH
        recall on Jaccard-1.0 pairs is structural), each component keeps
        exactly one doc, and the kept count can't exceed the md5-distinct
        count (at minimum, exact dups were removed)."""
        from ddsketchy_spark.pipeline.dedup import dedup_near_text

        dfd = _docs_with_dups(spark, sf)
        res = dedup_near_text(dfd, threshold=0.8, num_perm=128, bands=32,
                              verify="local")
        fp = dfd.select("doc_id",
                        F.md5(F.lower(F.trim(F.col("text")))).alias("fp"))
        labeled = res.join(fp, "doc_id")
        split_groups = (labeled.groupBy("fp")
                        .agg(F.countDistinct("component").alias("nc"))
                        .filter("nc > 1").count())
        bad_keeps = (labeled.groupBy("component")
                     .agg(F.sum(F.col("keep").cast("long")).alias("nk"))
                     .filter("nk != 1").count())
        n_docs = res.count()
        n_kept = res.filter("keep").count()
        md5_groups = fp.select("fp").distinct().count()
        return spark.createDataFrame(
            [(int(n_docs), bool(split_groups == 0), bool(bad_keeps == 0),
              bool(n_kept <= md5_groups))],
            "n_docs long, exact_groups_single_component boolean, "
            "one_keep_per_component boolean, kept_le_md5_groups boolean")

    q["dedup_near_text_documents"] = dedup_near_text_documents

    def dedup_incremental_documents(spark, sf):
        """Incremental dedup via the persistent MinHash-LSH index
        (pipeline/dedup_index.py): corpus indexed ONCE on disk, an
        increment of 50 exact corpus copies + 30 synthetic uniques + 10
        internal copies probed against it, corpus matches dropped,
        survivors deduped among themselves. The DuckDB oracle re-derives
        every count from text equality (exact dups are the only
        cross-threshold matches in this construction — est_jaccard 1.0 —
        which cross_exact_complete pins Spark-side)."""
        import shutil
        import tempfile

        from ddsketchy_spark.pipeline.cache import release_cached_deps
        from ddsketchy_spark.pipeline.dedup_index import (
            dedup_against_index, write_minhash_index)

        docs = (_load(spark, sf, "documents").select("doc_id", "text")
                .where("text IS NOT NULL"))
        uniq_text = F.concat(F.lit("unique document "),
                             F.md5(F.col("doc_id").cast("string")))
        b_exact = docs.where("doc_id < 50").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text")
        b_uniq = docs.where("doc_id >= 50 AND doc_id < 80").select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            uniq_text.alias("text"))
        b_intl = docs.where("doc_id >= 50 AND doc_id < 60").select(
            (F.col("doc_id") + 400000).alias("doc_id"),
            uniq_text.alias("text"))
        inc = b_exact.unionByName(b_uniq).unionByName(b_intl)
        tmp = tempfile.mkdtemp(prefix="ddsketchy_mhidx_")
        try:
            path = f"{tmp}/index"
            write_minhash_index(docs, path, num_perm=128, bands=32)
            out = dedup_against_index(inc, path, threshold=0.8)
            agg = out.agg(
                F.count(F.lit(1)).alias("inc_docs"),
                F.sum(F.col("corpus_match").isNotNull().cast("long"))
                .alias("cross_dropped"),
                F.sum((~F.col("keep") & F.col("corpus_match").isNull())
                      .cast("long")).alias("within_dropped"),
                F.sum(F.col("keep").cast("long")).alias("kept"),
            ).collect()[0]
            n_exact = b_exact.count()
            exact_dropped = (out.join(b_exact.select("doc_id"), "doc_id")
                             .where("NOT keep AND corpus_match IS NOT NULL")
                             .count())
            release_cached_deps(out)
            return spark.createDataFrame(
                [(int(agg["inc_docs"]), int(agg["cross_dropped"]),
                  int(agg["within_dropped"]), int(agg["kept"]),
                  bool(exact_dropped == n_exact))],
                "inc_docs long, cross_dropped long, within_dropped long, "
                "kept long, cross_exact_complete boolean")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["dedup_incremental_documents"] = dedup_incremental_documents

    def dedup_exact_incremental_documents(spark, sf):
        """Incremental EXACT dedup via the persistent digest index
        (pipeline/dedup_index.py write_exact_index /
        dedup_against_exact_index): the even-id half of documents is
        indexed once; an increment of byte-exact copies, whitespace-
        padded copies (the trim-normalization law), synthetic uniques and
        internal duplicates is probed against it. DuckDB re-derives EVERY
        per-row verdict — corpus_match (min matching corpus id under
        md5(lower(trim(text)))) and the within-increment min-id keep —
        from text equality alone."""
        import shutil
        import tempfile

        from ddsketchy_spark.pipeline.dedup_index import (
            dedup_against_exact_index, write_exact_index)

        docs = (_load(spark, sf, "documents").select("doc_id", "text")
                .where("doc_id IS NOT NULL AND text IS NOT NULL"))
        corpus = docs.where("doc_id % 2 = 0")
        uniq_text = F.concat(F.lit("unique exact doc "),
                             F.md5(F.col("doc_id").cast("string")))
        b_exact = docs.where("doc_id % 2 = 0 AND doc_id < 50").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text")
        b_norm = docs.where("doc_id % 2 = 0 AND doc_id >= 50 AND "
                            "doc_id < 70").select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.concat(F.lit("  "), F.col("text"), F.lit(" ")).alias("text"))
        b_uniq = docs.where("doc_id % 2 = 1 AND doc_id < 40").select(
            (F.col("doc_id") + 300000).alias("doc_id"),
            uniq_text.alias("text"))
        b_intl = docs.where("doc_id % 2 = 1 AND doc_id < 20").select(
            (F.col("doc_id") + 400000).alias("doc_id"),
            uniq_text.alias("text"))
        inc = (b_exact.unionByName(b_norm).unionByName(b_uniq)
               .unionByName(b_intl))
        tmp = tempfile.mkdtemp(prefix="ddsketchy_exidx_")
        try:
            path = f"{tmp}/index"
            write_exact_index(corpus, path)
            out = dedup_against_exact_index(inc, path)
            rows = (out.select(
                "doc_id",
                F.coalesce("corpus_match", F.lit(-1)).alias("corpus_match"),
                "keep").orderBy("doc_id").collect())
            # materialized before the index dir is deleted (lazy plans
            # would re-read it at driver-collect time)
            return spark.createDataFrame(
                rows, "doc_id long, corpus_match long, keep boolean")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["dedup_exact_incremental_documents"] = dedup_exact_incremental_documents

    def dedup_semantic_incremental_embeddings(spark, sf):
        """Incremental SEMANTIC dedup via the persistent cosine-LSH index
        (pipeline/dedup_index.py write_cosine_index /
        dedup_against_cosine_index): the embeddings table indexed ONCE on
        disk, an increment of 50 exact vector copies + 30 negated
        (cos = -1: never a match — the table's max off-diagonal cosine is
        ~0.51) + 10 internal copies of the negated block probed against
        it. The DuckDB oracle re-derives every count from vector equality
        (identical vectors are the only cross-threshold matches in this
        construction — cos 1.0 — which cross_exact_complete pins
        Spark-side)."""
        import shutil
        import tempfile

        from ddsketchy_spark.pipeline.cache import release_cached_deps
        from ddsketchy_spark.pipeline.dedup_index import (
            dedup_against_cosine_index, write_cosine_index)

        emb = (_load(spark, sf, "embeddings").select("vec_id", "embedding")
               .where("embedding IS NOT NULL"))
        # sign flip is exact in IEEE floats, so DuckDB's re-derivation by
        # list equality sees the same duplicate groups; the lambda
        # references only its own variable (safe on self-joining frames
        # per the package HOF rule)
        neg = F.transform("embedding", lambda x: -x)
        b_exact = emb.where("vec_id < 50").select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        b_uniq = emb.where("vec_id >= 50 AND vec_id < 80").select(
            (F.col("vec_id") + 200000).alias("vec_id"),
            neg.alias("embedding"))
        b_intl = emb.where("vec_id >= 50 AND vec_id < 60").select(
            (F.col("vec_id") + 400000).alias("vec_id"),
            neg.alias("embedding"))
        inc = b_exact.unionByName(b_uniq).unionByName(b_intl)
        tmp = tempfile.mkdtemp(prefix="ddsketchy_cosidx_")
        try:
            path = f"{tmp}/index"
            write_cosine_index(emb, path, n_planes=16, bands=4, seed=7)
            out = dedup_against_cosine_index(inc, path, threshold=0.9)
            agg = out.agg(
                F.count(F.lit(1)).alias("inc_docs"),
                F.sum(F.col("corpus_match").isNotNull().cast("long"))
                .alias("cross_dropped"),
                F.sum((~F.col("keep") & F.col("corpus_match").isNull())
                      .cast("long")).alias("within_dropped"),
                F.sum(F.col("keep").cast("long")).alias("kept"),
            ).collect()[0]
            n_exact = b_exact.count()
            exact_dropped = (out.join(b_exact.select("vec_id"), "vec_id")
                             .where("NOT keep AND corpus_match IS NOT NULL")
                             .count())
            release_cached_deps(out)
            return spark.createDataFrame(
                [(int(agg["inc_docs"]), int(agg["cross_dropped"]),
                  int(agg["within_dropped"]), int(agg["kept"]),
                  bool(exact_dropped == n_exact))],
                "inc_docs long, cross_dropped long, within_dropped long, "
                "kept long, cross_exact_complete boolean")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["dedup_semantic_incremental_embeddings"] = \
        dedup_semantic_incremental_embeddings

    def bloom_novelty_documents(spark, sf):
        """Bloom n-gram decontamination/novelty index
        (pipeline/novelty.py): the first five documents act as the
        benchmark, indexed ONCE as a Bloom blob (fpr 1e-9 — expected
        false positives over the whole corpus probe ~ 1e-4, i.e. none);
        every document then probes the broadcast bitmap with zero
        benchmark I/O. DuckDB re-derives docs / contaminated /
        seen-gram / fully-novel counts from the exact string-gram join;
        no_false_negatives is the Spark-side law assertion (per-doc
        bloom n_seen >= exact n_seen — Bloom can never miss)."""
        import shutil
        import tempfile

        from ddsketchy_spark.pipeline.novelty import (
            _gram_hashes, novelty_against_index, write_ngram_bloom_index)

        docs = _load(spark, sf, "documents").select("doc_id", "text")
        bench = docs.filter("doc_id < 5")
        tmp = tempfile.mkdtemp(prefix="ddsketchy_bloomidx_")
        try:
            path = f"{tmp}/index"
            write_ngram_bloom_index(bench, path, n=13, fpr=1e-9)
            scored = novelty_against_index(docs, path)
            bg = _gram_hashes(bench, "text", 13).dropDuplicates()
            ig = _gram_hashes(docs, "text", 13, F.col("doc_id"))
            exact = (ig.join(bg, "gh", "left_semi")
                     .groupBy("doc_id").agg(F.count(F.lit(1)).alias("_e")))
            j = (scored.join(exact, "doc_id", "left")
                 .withColumn("_e", F.coalesce("_e", F.lit(0))))
            agg = j.agg(
                F.count(F.lit(1)).alias("docs"),
                F.sum((F.col("n_seen") > 0).cast("long"))
                .alias("contaminated_docs"),
                F.sum("n_seen").alias("seen_grams"),
                F.sum(((F.col("n_grams") > 0) & (F.col("n_seen") == 0))
                      .cast("long")).alias("fully_novel_docs"),
                F.min((F.col("n_seen") >= F.col("_e")).cast("long"))
                .alias("_nfn"),
            ).collect()[0]
            return spark.createDataFrame(
                [(int(agg["docs"]), int(agg["contaminated_docs"]),
                  int(agg["seen_grams"]), int(agg["fully_novel_docs"]),
                  bool(agg["_nfn"] == 1))],
                "docs long, contaminated_docs long, seen_grams long, "
                "fully_novel_docs long, no_false_negatives boolean")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["bloom_novelty_documents"] = bloom_novelty_documents

    def rollup_drift_events(spark, sf):
        """Sketch-state drift between two rollup snapshots
        (spark/rollup.py rollup_drift): the even-event half is snapshot
        v0, the odd half folds in as v1 (one pass over the NEW rows
        only), then the drift report joins the two versions' finalized
        estimates per event_type — all from KB-scale state blobs, no
        data rescans. Uncollapsed DDSketch merges are bit-identical to
        one-shot builds, so DuckDB re-derives BOTH versions' p50 exactly
        (the zero-bucket-aware bucket walk) along with the exact
        count drift."""
        import shutil
        import tempfile

        from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator
        from ddsketchy_spark.spark.rollup import rollup_drift, update_rollup

        ev = _load(spark, sf, "events").select(
            "event_id", "event_type", "value")
        agg = DDSketchAggregator("value", alpha=ALPHA, quantiles=(0.5,))
        tmp = tempfile.mkdtemp(prefix="ddsketchy_drift_")
        try:
            root = f"{tmp}/rollup"
            update_rollup(spark, root,
                          ev.where("event_id % 2 = 0").drop("event_id"),
                          agg, ["event_type"])
            update_rollup(spark, root,
                          ev.where("event_id % 2 = 1").drop("event_id"),
                          agg, ["event_type"])
            d = rollup_drift(spark, root, agg, ["event_type"])
            rows = (d.select(
                "event_type", "status",
                F.col("count_old").alias("cnt_old"),
                F.col("count_new").alias("cnt_new"),
                F.col("delta_count").alias("delta_cnt"),
                _r6(F.col("p50_old")).alias("p50_old"),
                _r6(F.col("p50_new")).alias("p50_new"))
                .orderBy("event_type").collect())
            # materialized before the rollup dir is deleted
            return spark.createDataFrame(
                rows, "event_type string, status string, cnt_old long, "
                      "cnt_new long, delta_cnt long, p50_old double, "
                      "p50_new double")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["rollup_drift_events"] = rollup_drift_events

    def theta_overlap_events(spark, sf):
        """Per-key SET overlap between two Theta rollup snapshots
        (spark/rollup.py theta_rollup_overlap): distinct users by
        event_type, v0 = the even-event half, v1 folds in the odd half;
        the overlap report (old/new/union/intersection/new-only/jaccard)
        is computed from the two snapshots' state blobs ALONE via Theta
        set algebra. k=4096 keeps every sketch in exact mode at this
        scale (exact_mode=TRUE is part of the contract), so DuckDB
        re-derives every estimate as an exact distinct count."""
        import shutil
        import tempfile

        from ddsketchy_spark.spark.companions import ThetaAggregator
        from ddsketchy_spark.spark.rollup import (
            theta_rollup_overlap, update_rollup)

        ev = _load(spark, sf, "events").select(
            "event_id", "event_type", "user_id")
        agg = ThetaAggregator("user_id", k=4096)
        tmp = tempfile.mkdtemp(prefix="ddsketchy_thetaov_")
        try:
            root = f"{tmp}/rollup"
            update_rollup(spark, root,
                          ev.where("event_id % 2 = 0").drop("event_id"),
                          agg, ["event_type"])
            update_rollup(spark, root,
                          ev.where("event_id % 2 = 1").drop("event_id"),
                          agg, ["event_type"])
            ov = theta_rollup_overlap(spark, root, agg, ["event_type"])
            rows = (ov.select(
                "event_type",
                _r6(F.col("est_old")).alias("est_old"),
                _r6(F.col("est_new")).alias("est_new"),
                _r6(F.col("est_union")).alias("est_union"),
                _r6(F.col("est_intersection")).alias("est_intersection"),
                _r6(F.col("est_new_only")).alias("est_new_only"),
                _r6(F.col("jaccard")).alias("jaccard"),
                "exact_mode").orderBy("event_type").collect())
            return spark.createDataFrame(
                rows, "event_type string, est_old double, est_new double, "
                      "est_union double, est_intersection double, "
                      "est_new_only double, jaccard double, "
                      "exact_mode boolean")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    q["theta_overlap_events"] = theta_overlap_events

    def substring_pairs_documents(spark, sf):
        """Span-level dedup signal (pipeline/dedup.py
        substring_overlap_pairs): winnowing-backed candidate pairs
        sharing a verbatim >= 64-char run, over documents plus planted
        partners sharing each low-id doc's first 80 characters. DuckDB
        re-derives EVERY pair and its shared-fingerprint count from the
        same k=32/window=33 winnowing law (the guarantee: all planted
        pairs appear; any organic pairs appear identically on both
        sides)."""
        from ddsketchy_spark.pipeline.dedup import substring_overlap_pairs

        docs = (_load(spark, sf, "documents").select("doc_id", "text")
                .where("doc_id IS NOT NULL AND text IS NOT NULL"))
        planted = docs.where("doc_id < 30").select(
            (F.col("doc_id") + 500000).alias("doc_id"),
            F.concat(F.substring("text", 1, 80), F.lit(" planted tail "),
                     F.md5(F.col("doc_id").cast("string"))).alias("text"))
        corpus = docs.unionByName(planted)
        return (substring_overlap_pairs(corpus, min_len=64)
                .orderBy("id_a", "id_b"))

    q["substring_pairs_documents"] = substring_pairs_documents

    def exactsubstr_rewrite_documents(spark, sf):
        """ExactSubstr span REMOVAL (pipeline/dedup.py
        rewrite_shared_spans; Lee et al. 2021, arXiv:2107.06499): every
        verified maximal shared byte run >= 40 chars is CUT from the
        pair's later document, keep-first. Corpus = documents
        (doc_id < 120) plus planted partners embedding each low-id doc's
        first 120 characters between unique salts. DuckDB re-derives the
        ENTIRE law — case-sensitive winnowing, diagonal chains, region
        clamps, per-position equality runs, interval merge, and the
        rewrite itself — and md5-matches every rewritten text plus the
        cut counters."""
        from ddsketchy_spark.pipeline.dedup import rewrite_shared_spans

        docs = (_load(spark, sf, "documents").select("doc_id", "text")
                .where("doc_id IS NOT NULL AND text IS NOT NULL"))
        base = docs.where("doc_id < 120")
        planted = docs.where("doc_id < 25").select(
            (F.col("doc_id") + 800000).alias("doc_id"),
            F.concat(F.lit("planted intro "),
                     F.md5(F.col("doc_id").cast("string")), F.lit(" "),
                     F.substring("text", 1, 120), F.lit(" planted outro "),
                     F.md5((F.col("doc_id") + 7).cast("string"))
                     ).alias("text"))
        corpus = base.unionByName(planted)
        out = rewrite_shared_spans(corpus, min_len=40)
        return (out.select("doc_id", F.md5("text").alias("text_md5"),
                           "n_cut_spans", "n_cut_bytes")
                .orderBy("doc_id"))

    q["exactsubstr_rewrite_documents"] = exactsubstr_rewrite_documents

    def incremental_crawl_documents(spark, sf):
        """The composed incremental-crawl recipe (pipeline/recipes.py,
        r4 verdict #6): TWO crawls through clean -> exact-index dedup ->
        minhash-index dedup -> split -> pack -> shards -> index append ->
        rollup, state accumulating in one workdir. The corpus is built
        from md5-derived 8-word documents (pairwise-disjoint word sets,
        so the minhash stage provably drops nothing and every stage
        count is SQL-re-derivable): crawl 2 re-crawls 10 of crawl 1's
        documents byte-identically under new ids (the exact INDEX must
        drop them) plus 10 fresh ones. DuckDB re-derives every emitted
        count — quality, exact-dedup (within-crawl and cross-crawl via
        the index), split membership (the md5 split law), and packed
        sequence totals (ceil(sum(n_tok)/seq_len))."""
        import shutil
        import tempfile

        from ddsketchy_spark.pipeline.recipes import incremental_crawl_update

        def mdoc(prefix, idcol):
            parts = [F.substring(
                F.md5(F.concat(F.lit(prefix + ":"), idcol.cast("string"),
                               F.lit(f":{j}"))), 1, 8) for j in range(8)]
            return F.concat_ws(" ", *parts)

        ids = spark.range(40).select(F.col("id"))
        c1 = ids.select(
            F.col("id").alias("doc_id"), mdoc("c1", F.col("id")).alias("text"),
            F.when(F.col("id") % 2 == 1, F.lit("srcA"))
            .otherwise(F.lit("srcB")).alias("source"),
            (F.col("id") + 64).alias("n_tok"))
        dups = (ids.where("id < 6").select(
            (F.col("id") + 100).alias("doc_id"),
            mdoc("c1", F.col("id")).alias("text"),
            F.when(F.col("id") % 2 == 1, F.lit("srcA"))
            .otherwise(F.lit("srcB")).alias("source"),
            (F.col("id") + 64).alias("n_tok")))
        crawl1 = c1.unionByName(dups)
        recrawl = (ids.where("id < 10").select(
            (F.col("id") + 1000).alias("doc_id"),
            mdoc("c1", F.col("id")).alias("text"),
            F.lit("srcA").alias("source"), F.lit(70).alias("n_tok")))
        fresh = (ids.where("id < 10").select(
            (F.col("id") + 3000).alias("doc_id"),
            mdoc("c2", F.col("id")).alias("text"),
            F.lit("srcB").alias("source"), F.lit(70).alias("n_tok")))
        crawl2 = recrawl.unionByName(fresh)

        kw = dict(quality_kw={"min_words": 3, "max_mean_word_len": 100.0},
                  redact=False, num_perm=64, bands=16,
                  splits={"train": 0.75, "test": 0.25}, seq_len=128,
                  n_shards=2)
        tmpd = tempfile.mkdtemp(prefix="ddsketchy_crawl_contract_")
        try:
            rep1 = incremental_crawl_update(crawl1, f"{tmpd}/work", **kw)
            rep2 = incremental_crawl_update(crawl2, f"{tmpd}/work", **kw)
            rows = []
            for tag, rep in (("c1", rep1), ("c2", rep2)):
                rows += [
                    (f"{tag}_input", rep["n_input"]),
                    (f"{tag}_quality", rep["n_after_quality"]),
                    (f"{tag}_exact", rep["n_after_exact"]),
                    (f"{tag}_near", rep["n_after_near"]),
                    (f"{tag}_kept", rep["n_kept"]),
                    (f"{tag}_seq_train",
                     rep["sequences_per_split"]["train"]),
                    (f"{tag}_seq_test", rep["sequences_per_split"]["test"]),
                    (f"{tag}_rollup_version", rep["rollup_version"]),
                ]
            rows.append(("c2_drift_sources", len(rep2["drift"])))
            return (spark.createDataFrame(rows, "metric string, value long")
                    .orderBy("metric"))
        finally:
            shutil.rmtree(tmpd, ignore_errors=True)

    q["incremental_crawl_documents"] = incremental_crawl_documents



    # -- relational coverage: classic aggregations + broadcast joins --------

    def _r2(c):
        mag = F.floor(F.abs(c) * F.lit(1e2) + F.lit(0.5)) / F.lit(1e2)
        return (F.when(c < 0, -mag).otherwise(mag)).cast("double")

    def tpch_q1_pricing_summary(spark, sf):
        li = _load(spark, sf, "lineitem")
        return (
            li.filter(F.col("l_shipdate") <= F.lit("2002-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                _r2(F.sum("l_quantity")).alias("sum_qty"),
                _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
                _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("sum_disc_price"),
                _r6(F.avg("l_quantity")).alias("avg_qty"),
                _r6(F.avg("l_discount")).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    q["tpch_q1_pricing_summary"] = tpch_q1_pricing_summary

    def tpch_q6_forecast_revenue(spark, sf):
        """Pure filter+aggregate: every predicate must reach the parquet
        scan (PushedFilters) — the pushdown showcase."""
        li = _load(spark, sf, "lineitem")
        rev = (li.where((F.col("l_shipdate") >= "1996-01-01")
                        & (F.col("l_shipdate") < "1997-01-01")
                        & (F.col("l_discount") >= 0.05)
                        & (F.col("l_discount") <= 0.07)
                        & (F.col("l_quantity") < 24))
               .agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount")))
                    .alias("revenue"),
                    F.count(F.lit(1)).alias("cnt")))
        return rev

    q["tpch_q6_forecast_revenue"] = tpch_q6_forecast_revenue

    def tpch_q3_shipping_priority(spark, sf):
        """Join + aggregate + deterministic top-10 via TakeOrdered.
        orders/customer scale with the fact table at 100 TB, so no
        explicit broadcast hints — AQE picks broadcast at runtime when the
        filtered side is actually small."""
        li = _load(spark, sf, "lineitem")
        orders = _load(spark, sf, "orders")
        cust = _load(spark, sf, "customer")
        seg = cust.where(F.col("c_mktsegment") == "BUILDING") \
                  .select("c_custkey")
        op = orders.where(F.col("o_orderdate") < "1998-06-15") \
                   .select("o_orderkey", "o_custkey", "o_orderdate")
        return (
            li.where(F.col("l_shipdate") > "1998-06-15")
            .join(op, li.l_orderkey == op.o_orderkey)
            .join(seg, op.o_custkey == seg.c_custkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(_r2(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10)
            .select("l_orderkey", "revenue",
                    F.col("o_orderdate").cast("string").alias("o_orderdate"))
        )

    q["tpch_q3_shipping_priority"] = tpch_q3_shipping_priority

    def tpch_q5_local_supplier_volume(spark, sf):
        """Six-table star join (lineitem x orders x customer x supplier x
        nation x region) — revenue per nation where supplier and customer
        share the nation. orders scales WITH the fact table, so
        lineitem-orders is a shuffled key join; only the four true dims
        (customer/supplier/nation/region) broadcast."""
        li = _load(spark, sf, "lineitem")
        orders = _load(spark, sf, "orders").select("o_orderkey", "o_custkey")
        cust = _load(spark, sf, "customer").select("c_custkey", "c_nationkey")
        supp = _load(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
        nation = _load(spark, sf, "nation").select("n_nationkey", "n_name",
                                                   "n_regionkey")
        region = _load(spark, sf, "region").select("r_regionkey", "r_name")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(supp, li.l_suppkey == supp.s_suppkey)
            .where(F.col("c_nationkey") == F.col("s_nationkey"))
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == nation.n_nationkey)
            .join(F.broadcast(region),
                  nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(_r2(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy("n_name")
        )

    q["tpch_q5_local_supplier_volume"] = tpch_q5_local_supplier_volume

    def revenue_by_customer_broadcast(spark, sf):
        """lineitem JOIN orders JOIN customer with broadcast dims — the
        small sides broadcast (verified in tools/explain_plans.py), so the
        fact table never shuffles for the join. This is the explicit
        broadcast-strategy demonstrator; at an SF where orders no longer
        fits an executor, drop the hint and the q5-style shuffled key
        join (with AQE runtime upgrades) is the pattern — see
        tpch_q5_local_supplier_volume."""
        li = _load(spark, sf, "lineitem")
        orders = _load(spark, sf, "orders")
        cust = _load(spark, sf, "customer").filter(F.col("c_custkey") < 50)
        return (
            li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
            .groupBy("c_custkey", "c_name")
            .agg(
                _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                .alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
            .orderBy("c_custkey")
        )

    q["revenue_by_customer_broadcast"] = revenue_by_customer_broadcast

    def mg_heavy_users(spark, sf):
        """Misra-Gries heavy hitters over events.user_id: exact counts
        cross-check SQL; the no-missed-heavy-hitter guarantee and the
        underestimate bound are materialized as booleans."""
        from ddsketchy_spark.core.misra_gries import MisraGries
        from ddsketchy_spark.spark.companions import misra_gries_state

        df = _load(spark, sf, "events")
        out = misra_gries_state(df, "user_id", k=256)
        mg = MisraGries.from_bytes(out["state"])
        exact = {r["user_id"]: r["cnt"] for r in
                 df.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        n = sum(exact.values())
        thresh = n // 257
        rows = []
        for uid in sorted(exact):
            f = exact[uid]
            if f <= thresh:
                continue
            est = mg.estimate(uid)
            rows.append((int(uid), int(f),
                         bool(uid in mg.counters),
                         bool(est <= f <= est + mg.err_bound)))
        return spark.createDataFrame(
            rows, "user_id long, cnt long, found boolean, bound_ok boolean")

    q["mg_heavy_users"] = mg_heavy_users

    def theta_user_overlap(spark, sf):
        """Theta/KMV set algebra: distinct-user overlap between the click
        and view event streams. k=4096 keeps the sketches in exact mode at
        oracle scale, so estimates equal exact set cardinalities; the same
        code path handles 10^9 users in estimation mode (~1.6% RSE)."""
        from ddsketchy_spark.core.theta import ThetaSketch
        from ddsketchy_spark.spark.companions import theta_state

        df = _load(spark, sf, "events")
        states = {r["event_type"]: ThetaSketch.from_bytes(r["state"])
                  for r in theta_state(df, "user_id", by=["event_type"],
                                       k=4096, engine="native").collect()}
        a, b = states["click"], states["view"]
        union = ThetaSketch(a.k, a.seed, a.hash_kind).merge(a).merge(b)
        row = (float(a.estimate()), float(b.estimate()),
               float(a.intersect(b).estimate()),
               float(union.estimate()),
               float(a.a_not_b(b).estimate()))
        out = spark.createDataFrame(
            [row], "users_click double, users_view double, overlap double, "
                   "union_cnt double, click_not_view double")
        return out.select(*[_r6(F.col(c)).alias(c) for c in out.columns])

    q["theta_user_overlap_click_view"] = theta_user_overlap

    def theta_orderkeys_estimation(spark, sf):
        """Theta sketch in ESTIMATION mode (k=512 << distinct orderkeys):
        exact count cross-checks SQL; the KMV error bound (4x RSE) is
        materialized as a boolean the oracle asserts TRUE."""
        from ddsketchy_spark.spark.companions import theta_state

        df = _load(spark, sf, "lineitem")
        out = theta_state(df, "l_orderkey", k=512, engine="native")
        exact = df.select("l_orderkey").distinct().count()
        rse = 1.0 / (512 - 1) ** 0.5
        ok = (not out["exact_mode"]) and \
            abs(out["distinct_est"] - exact) <= 4.0 * rse * exact
        return spark.createDataFrame(
            [(int(exact), bool(ok))], "exact_cnt long, theta_ok boolean")

    q["theta_orderkeys_estimation"] = theta_orderkeys_estimation

    def dedup_semantic_embeddings(spark, sf):
        """Embedding-cosine near-dup dedup: threshold pairs -> connected
        components (distributed min-label propagation) -> canonical
        representative per cluster. Duplicates are planted deterministically
        (ids <20 copied once, <10 twice -> chained 3-clusters); the DuckDB
        oracle recomputes components with a recursive CTE."""
        from ddsketchy_spark.pipeline.dedup import dedup_semantic

        emb = _load(spark, sf, "embeddings").select("vec_id", "embedding")
        d1 = emb.filter("vec_id < 20").withColumn(
            "vec_id", F.col("vec_id") + 100000)
        d2 = emb.filter("vec_id < 10").withColumn(
            "vec_id", F.col("vec_id") + 200000)
        all_ = emb.unionByName(d1).unionByName(d2)
        return dedup_semantic(all_, threshold=0.9, method="exact").orderBy("vec_id")

    q["dedup_semantic_embeddings"] = dedup_semantic_embeddings

    def bloom_semi_join_revenue(spark, sf):
        """Bloom-filtered semi-join: lineitem probed against a Bloom of
        finished orders' keys before the join shuffle. No false negatives
        => identical result to the plain SQL join the oracle runs."""
        from ddsketchy_spark.spark.joins import bloom_semi_join

        lineitem = _load(spark, sf, "lineitem")
        orders_f = (_load(spark, sf, "orders")
                    .where(F.col("o_orderstatus") == "F")
                    .select("o_orderkey"))
        j = bloom_semi_join(lineitem, orders_f, ["l_orderkey", "o_orderkey"],
                            fpr=0.01)
        return (j.groupBy("l_returnflag")
                .agg(F.count(F.lit(1)).alias("n_items"),
                     F.round(F.sum("l_extendedprice"), 2).alias("gross"))
                .orderBy("l_returnflag"))

    q["bloom_semi_join_revenue"] = bloom_semi_join_revenue

    def profile_documents(spark, sf):
        """One-call table profiler over documents: exact columns the oracle
        recomputes; sketch estimates materialized as ok-booleans (HLL within
        2% + 2; DDSketch p50 within alpha of the exact lower quantile)."""
        from ddsketchy_spark.spark.profile import profile_table

        df = _load(spark, sf, "documents")
        prof = {r["column"]: r for r in profile_table(df).collect()}
        exact_distinct = {c: df.select(c).distinct().count()
                          for c in ("doc_id", "lang", "source", "n_chars")}
        import math as _math

        n = df.count()
        exact_p50 = df.selectExpr(
            f"sort_array(collect_list(CAST(n_chars AS DOUBLE)))[{(n - 1) // 2}] p50"
        ).first()["p50"]
        # sentinel -1.0 / 'n/a' instead of NULL: null booleans and NaN
        # doubles sort non-deterministically in order-insensitive
        # per-column comparisons
        rows = []
        for c in ("doc_id", "text", "lang", "source", "n_chars"):
            r = prof[c]
            hll_ok = "n/a"
            if r["distinct_est"] is not None and c != "text":
                e = exact_distinct[c]
                hll_ok = "ok" if abs(r["distinct_est"] - e) <= 0.02 * e + 2 else "bad"
            p50_ok = "n/a"
            if c == "n_chars":
                p50_ok = ("ok" if abs(r["p50"] - exact_p50) <= ALPHA * exact_p50
                          else "bad")
            avg_len = (-1.0 if r["avg_len"] is None
                       else float(_math.floor(r["avg_len"] * 1e6 + 0.5) / 1e6))
            mn = -1.0 if r["min"] is None else r["min"]
            mx = -1.0 if r["max"] is None else r["max"]
            rows.append((c, r["count"], r["nulls"], mn, mx,
                         avg_len, hll_ok, p50_ok))
        return spark.createDataFrame(
            rows, "column string, cnt long, nulls long, min double, "
                  "max double, avg_len double, hll_ok string, p50_ok string"
        ).orderBy("column")

    q["profile_documents_table"] = profile_documents

    def tdigest_direct_scan(spark, sf):
        """pyarrow-direct row-group scan driving a t-digest (the engine for
        sketches SQL cannot express): workers read l_quantity straight from
        parquet, bypassing the JVM Arrow writer. Exact count cross-checks
        SQL; rank accuracy is materialized as a boolean."""
        import numpy as _np

        from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet
        from ddsketchy_spark.spark.companions import TDigestAggregator
        from ddsketchy_spark.spark.ddsketch_agg import quantile_label as _ql

        qs = (0.5, 0.9, 0.99)
        agg = TDigestAggregator("l_quantity", delta=200.0, quantiles=qs)
        out = sketch_aggregate_parquet(spark, f"{sf}/lineitem.parquet", agg)
        df = _load(spark, sf, "lineitem")
        vals = _np.sort(_np.asarray(
            [r["l_quantity"] for r in df.select("l_quantity").collect()],
            dtype=float))

        def rank_ok(est, q, tol=0.02):
            # midpoint of the tie block: side='left' alone would report the
            # block's lower edge for an estimate landing on a tied value
            lo = float(_np.searchsorted(vals, est, side="left"))
            hi = float(_np.searchsorted(vals, est, side="right"))
            r = (lo + hi) / 2.0 / len(vals)
            return bool(abs(r - q) <= tol)

        row = (int(len(vals)),
               bool(all(rank_ok(out[_ql(q)], q) for q in qs)))
        return spark.createDataFrame([row], "cnt long, tdigest_ok boolean")

    q["tdigest_direct_scan_lineitem"] = tdigest_direct_scan

    def mg_heavy_langs_by_source(spark, sf):
        """GROUPED Misra-Gries: heavy languages per document source — a
        genuinely skewed column, so ~100 heavy rows exist at every scale
        factor (a uniform column would make the gate vacuous). Exact counts
        cross-check SQL; the no-missed-heavy-hitter and underestimate-bound
        guarantees are materialized per group."""
        from ddsketchy_spark.core.misra_gries import MisraGries
        from ddsketchy_spark.spark.companions import misra_gries_state

        K = 64
        df = _load(spark, sf, "documents")
        states = {r["source"]: MisraGries.from_bytes(r["state"])
                  for r in misra_gries_state(
                      df, "lang", by=["source"], k=K, key_kind="str").collect()}
        exact = {}
        for r in (df.groupBy("source", "lang")
                  .agg(F.count(F.lit(1)).alias("cnt")).collect()):
            exact.setdefault(r["source"], {})[r["lang"]] = r["cnt"]
        rows = []
        for src in sorted(exact):
            counts = exact[src]
            n = sum(counts.values())
            thresh = n // (K + 1)
            mg = states[src]
            for lang in sorted(counts):
                f = counts[lang]
                if f <= thresh:
                    continue
                est = mg.estimate(lang)
                rows.append((src, lang, int(f),
                             bool(lang in mg.counters),
                             bool(est <= f <= est + mg.err_bound)))
        assert rows, "gate must not be vacuous"
        return spark.createDataFrame(
            rows, "source string, lang string, cnt long, "
                  "found boolean, bound_ok boolean")

    q["mg_heavy_langs_by_source"] = mg_heavy_langs_by_source

    def asof_click_purchase(spark, sf):
        """AS-OF join (backward inclusive): each click matched to the
        user's latest preceding purchase. Oracle: DuckDB's native
        ASOF JOIN. Timestamps compared as exact epoch ms."""
        from ddsketchy_spark.spark.joins import asof_join

        ev = _load(spark, sf, "events")
        clicks = (ev.where(F.col("event_type") == "click")
                  .select("user_id", "ts", "value"))
        purchases = (ev.where(F.col("event_type") == "purchase")
                     .select("user_id", "ts", F.col("value").alias("px")))
        j = asof_join(clicks, purchases, "ts", ["user_id"], ["px"])
        # ts is TIMESTAMP_NTZ: compare as its wall-clock string (identical
        # on both engines, no timezone interpretation anywhere)
        return (j.select("user_id", F.col("ts").cast("string").alias("ts_s"),
                         _r6(F.col("value")).alias("click_value"),
                         _r6(F.col("px")).alias("last_purchase"))
                .orderBy("user_id", "ts_s"))

    q["asof_click_purchase"] = asof_click_purchase

    def interval_join_value_bands(spark, sf):
        """Range join via bucketed decomposition: events.value against 20
        overlapping value bands, counted per (event_type, band). Oracle:
        the plain SQL BETWEEN join."""
        from ddsketchy_spark.spark.joins import interval_join

        ev = _load(spark, sf, "events").select("event_type", "value")
        bands = spark.createDataFrame(
            [(i, i * 15.0, i * 15.0 + 25.0) for i in range(20)],
            "band long, lo double, hi double")
        j = interval_join(ev, bands, "value", "lo", "hi", bucket_width=25.0)
        return (j.groupBy("event_type", "band")
                .agg(F.count(F.lit(1)).alias("n_points"),
                     F.round(F.sum("value"), 2).alias("sum_value"))
                .orderBy("event_type", "band"))

    q["interval_join_value_bands"] = interval_join_value_bands

    def bm25_search_documents(spark, sf):
        """BM25 top-20 for the query "spark scan merge" over documents.
        Fixed-order arithmetic and the shared split-on-space token law
        make the double scores reproducible by an independent engine:
        the DuckDB oracle re-derives every score from scratch
        (list_filter tf, one stats row, the exact same expression tree)
        and must select the same 20 docs with hash-equal values."""
        from ddsketchy_spark.pipeline.search import bm25_topk

        docs = _load(spark, sf, "documents")
        out = bm25_topk(docs, "spark scan merge", k=20)
        return out.select(
            "doc_id", F.col("dl").cast("long").alias("dl"),
            F.col("matched_terms").cast("long").alias("matched_terms"),
            "bm25")

    q["bm25_search_documents"] = bm25_search_documents

    def dds_distance_events(spark, sf):
        """Pairwise KS / 1-Wasserstein distances between the five
        event-type value distributions, computed entirely from DDSketch
        bucket atoms (native SQL end to end). The DuckDB oracle rebuilds
        the atoms from raw values with the same bucket law and runs the
        same CDF event-sweep — full hash-match re-derivation."""
        from ddsketchy_spark.spark.distance import ddsketch_distance

        ev = _load(spark, sf, "events")
        return ddsketch_distance(ev, "value", "event_type", ALPHA)

    q["dds_distance_events"] = dds_distance_events

    def fd_embeddings_spectrum(spark, sf):
        """Frequent-Directions spectrum of the embeddings table: the
        matrix-sketch companion (Liberty 2013). The sketch's certified
        guarantee rides as booleans — each top-5 singular-value estimate
        must satisfy sv_ex^2 - err_bound <= sv_sk^2 <= sv_ex^2 against
        the EXACT spectrum from the distributed Gram, and the carried
        err_bound must respect frob_sq/ell. DuckDB anchors n_vecs; a
        guarantee violation flips a boolean into a hash mismatch."""
        from ddsketchy_spark.spark.agg import sketch_aggregate
        from ddsketchy_spark.spark.matrix import (
            FDAggregator, exact_gram, exact_singular_values)

        emb = (_load(spark, sf, "embeddings")
               .where(F.col("embedding").isNotNull()))
        ell = 32
        out = sketch_aggregate(emb, FDAggregator("embedding", dim=64,
                                                 ell=ell, k_out=5))
        gram, n = exact_gram(emb, "embedding", 64)
        sv = exact_singular_values(gram, 5)
        eps = 1e-9 * out["frob_sq"] + 1e-9
        sv_ok = [bool(out[f"sv_{i + 1}"] ** 2 <= sv[i] ** 2 + eps
                      and out[f"sv_{i + 1}"] ** 2
                      >= sv[i] ** 2 - out["err_bound"] - eps)
                 for i in range(5)]
        rows = [(int(out["n_rows"]), bool(out["n_rows"] == n),
                 bool(out["err_bound"] <= out["frob_sq"] / ell + eps),
                 *sv_ok)]
        return spark.createDataFrame(
            rows, "n_vecs long, counts_agree boolean, bound_ok boolean, "
                  "sv1_ok boolean, sv2_ok boolean, sv3_ok boolean, "
                  "sv4_ok boolean, sv5_ok boolean")

    q["fd_embeddings_spectrum"] = fd_embeddings_spectrum

    def tfidf_keywords_documents(spark, sf):
        """Top-3 TF-IDF keywords per document under the shared token law
        and the smoothed idf = ln((1+N)/(1+df))+1. The (score DESC,
        term ASC) total order makes the per-doc selection
        bit-reproducible; DuckDB re-derives every (rank, term, score)
        from scratch — full hash match on ~1500 rows."""
        from ddsketchy_spark.pipeline.search import tfidf_keywords

        docs = _load(spark, sf, "documents")
        out = tfidf_keywords(docs, k=3)
        return out.select("doc_id", "rank", "term",
                          _r6(F.col("score")).alias("score"))

    q["tfidf_keywords_documents"] = tfidf_keywords_documents

    def jl_reduce_embeddings(spark, sf):
        """JL random projection 64 -> 16 over the embeddings table. The
        engine's reduced vectors are re-derived driver-side with the
        same deterministic matrix and fixed-order kernel — exact parity
        boolean — plus the JL norm-preservation statistic; DuckDB
        anchors n_vecs."""
        import numpy as np

        from ddsketchy_spark.pipeline.similarity import (
            jl_project_rows, jl_projection, reduce_dim)

        emb = (_load(spark, sf, "embeddings")
               .where(F.col("embedding").isNotNull()))
        red = {r["vec_id"]: np.array(r["embedding"]) for r in
               reduce_dim(emb, 16, 64, seed=5).select(
                   "vec_id", "embedding").collect()}
        orig = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
                for r in emb.select("vec_id", "embedding").collect()}
        R = jl_projection(64, 16, seed=5)
        ids = sorted(orig)
        X = np.stack([orig[i] for i in ids])
        want = jl_project_rows(X, R)
        parity = (set(red) == set(ids) and all(
            np.array_equal(red[i], want[j]) for j, i in enumerate(ids)))
        norms_in = np.linalg.norm(X, axis=1)
        norms_out = np.linalg.norm(want, axis=1)
        ratio = float(np.mean(norms_out[norms_in > 0]
                              / norms_in[norms_in > 0]))
        rows = [(len(red), bool(parity), bool(abs(ratio - 1.0) < 0.15))]
        return spark.createDataFrame(
            rows, "n_vecs long, parity boolean, norms_ok boolean")

    q["jl_reduce_embeddings"] = jl_reduce_embeddings

    def tpch_q10_returned_items(spark, sf):
        """TPC-H Q10 shape (returned-item reporting): revenue lost to
        'R'-flag lineitems per customer over one quarter, 4-table join,
        deterministic top-20 via TakeOrdered. orders/customer scale with
        the fact table — no forced broadcasts; nation broadcasts."""
        li = _load(spark, sf, "lineitem")
        orders = _load(spark, sf, "orders")
        cust = _load(spark, sf, "customer")
        nation = _load(spark, sf, "nation").select("n_nationkey", "n_name")
        op = (orders
              .where((F.col("o_orderdate") >= "1996-01-01")
                     & (F.col("o_orderdate") < "1996-07-01"))
              .select("o_orderkey", "o_custkey"))
        return (
            li.where(F.col("l_returnflag") == "R")
            .join(op, li.l_orderkey == op.o_orderkey)
            .join(cust, op.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation),
                  cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(_r2(F.sum(F.col("l_extendedprice")
                           * (1 - F.col("l_discount")))).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name", "n_name", "revenue", "n_items"))

    q["tpch_q10_returned_items"] = tpch_q10_returned_items

    def tpch_q14_promo_effect(spark, sf):
        """TPC-H Q14 shape (promotion effect): the PROMO share of one
        month's revenue — a fact-dim key join folded into ONE scalar
        aggregate (conditional partial sums, map-side combined)."""
        li = _load(spark, sf, "lineitem")
        part = _load(spark, sf, "part").select("p_partkey", "p_type")
        rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        promo = F.when(F.col("p_type").startswith("PROMO"), rev) \
                 .otherwise(F.lit(0.0))
        out = (li.where((F.col("l_shipdate") >= "1996-03-01")
                        & (F.col("l_shipdate") < "1996-04-01"))
               .join(part, li.l_partkey == part.p_partkey)
               .agg((F.lit(100.0) * F.sum(promo) / F.sum(rev))
                    .alias("raw"),
                    F.count(F.lit(1)).alias("n_items")))
        return out.select(_r6(F.col("raw")).alias("promo_revenue_pct"),
                          "n_items")

    q["tpch_q14_promo_effect"] = tpch_q14_promo_effect

    def corr_lineitem_columns(spark, sf):
        """All pairwise Pearson correlations between four lineitem
        measures in ONE aggregate pass (profiler companion). DuckDB's
        native corr re-derives every value — full hash match."""
        from ddsketchy_spark.spark.profile import column_correlations

        li = _load(spark, sf, "lineitem")
        return column_correlations(
            li, ["l_discount", "l_extendedprice", "l_quantity", "l_tax"])

    q["corr_lineitem_columns"] = corr_lineitem_columns

    def tpch_q12_priority_by_status(spark, sf):
        """TPC-H Q12 shape (adapted to this schema: l_linestatus stands
        in for l_shipmode): per line status, how many urgent/high
        priority vs other orders shipped in one year — a fact-dim key
        join folded into conditional counts, map-side combined."""
        li = _load(spark, sf, "lineitem")
        orders = _load(spark, sf, "orders").select("o_orderkey",
                                                   "o_orderpriority")
        hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        return (li.where((F.col("l_shipdate") >= "1996-01-01")
                         & (F.col("l_shipdate") < "1997-01-01"))
                .join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("l_linestatus")
                .agg(F.sum(hi.cast("long")).alias("high_priority"),
                     F.sum((~hi).cast("long")).alias("low_priority"))
                .orderBy("l_linestatus"))

    q["tpch_q12_priority_by_status"] = tpch_q12_priority_by_status

    def tpch_q18_large_volume_orders(spark, sf):
        """TPC-H Q18 shape (large-volume customers): orders whose total
        lineitem quantity exceeds a threshold — a HAVING aggregate
        semi-joined back to orders/customer, deterministic top-20. The
        quantity aggregate shuffles (orderkey, qty) only."""
        li = _load(spark, sf, "lineitem")
        orders = _load(spark, sf, "orders")
        cust = _load(spark, sf, "customer").select("c_custkey", "c_name")
        big = (li.groupBy("l_orderkey")
               .agg(F.sum("l_quantity").alias("total_qty"))
               .where(F.col("total_qty") > 300))
        return (orders.join(big, orders.o_orderkey == big.l_orderkey)
                .join(cust, orders.o_custkey == cust.c_custkey)
                .select("c_custkey", "c_name", "o_orderkey",
                        F.col("o_orderdate").cast("string")
                        .alias("o_orderdate"),
                        _r2(F.col("o_totalprice")).alias("o_totalprice"),
                        _r2(F.col("total_qty")).alias("total_qty"))
                .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
                .limit(20))

    q["tpch_q18_large_volume_orders"] = tpch_q18_large_volume_orders
    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}
    o["dds_events_value_global"] = _dds_oracle("events", "value", (0.5, 0.9, 0.99, 0.999))
    o["dds_events_value_by_type"] = _dds_oracle(
        "events", "value", (0.5, 0.9, 0.99), by="event_type")
    o["dds_lineitem_quantity_by_returnflag"] = _dds_oracle(
        "lineitem", "l_quantity", (0.5, 0.9, 0.99), by="l_returnflag")
    o["dds_lineitem_extendedprice_global"] = _dds_oracle(
        "lineitem", "l_extendedprice", (0.5, 0.99, 0.999))
    o["dds_weighted_price_by_returnflag"] = _dds_oracle(
        "lineitem", "l_extendedprice", (0.5, 0.9, 0.99),
        by="l_returnflag", weight="l_quantity")
    _m_cdf = LogMapping(ALPHA)
    _cdf_parts = []
    for _i, _v in enumerate((5.0, 60.0, 240.0)):
        _k = _m_cdf.key(_v)
        _cnt = (f"(SELECT count(*) FROM fin WHERE x < "
                f"{_m_cdf.min_indexable_value!r} OR (x >= "
                f"{_m_cdf.min_indexable_value!r} AND CAST(ceil(ln(x) * "
                f"{_m_cdf.inv_ln_gamma!r}) AS BIGINT) <= {_k}))")
        _cdf_parts.append(
            f"CAST({_cnt} AS BIGINT) AS r{_i}, "
            f"round({_cnt} * 1.0 / (SELECT count(*) FROM fin), 6) AS c{_i}")
    o["dds_cdf_events"] = (
        "WITH fin AS (SELECT CAST(value AS DOUBLE) AS x FROM events "
        "WHERE isfinite(CAST(value AS DOUBLE)))\nSELECT "
        + ", ".join(_cdf_parts))
    o["hll_rollup_events"] = """
SELECT event_type, CAST(1 AS INTEGER) AS rollup_level,
       count(DISTINCT user_id) AS users_exact,
       TRUE AS hll_ok, TRUE AS rollup_equals_direct
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL', CAST(0 AS INTEGER), count(DISTINCT user_id), TRUE, TRUE
FROM events
ORDER BY rollup_level, event_type
"""
    o["dds_rollup_events"] = f"""
SELECT event_type, CAST(1 AS INTEGER) AS rollup_level, cnt, p50, p90
FROM ({_dds_oracle("events", "value", (0.5, 0.9), by="event_type")}) g
UNION ALL
SELECT 'ALL' AS event_type, CAST(0 AS INTEGER) AS rollup_level, cnt, p50, p90
FROM ({_dds_oracle("events", "value", (0.5, 0.9))}) t
ORDER BY rollup_level, event_type
"""
    o["exact_events_count_by_type"] = """
SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users
FROM events GROUP BY event_type ORDER BY event_type
"""
    o["hll_users_by_event_type"] = """
SELECT event_type, count(DISTINCT user_id) AS users_exact, TRUE AS hll_ok
FROM events GROUP BY event_type ORDER BY event_type
"""
    o["cms_partkey_freq"] = """
SELECT CAST(l_partkey AS BIGINT) AS l_partkey, count(*) AS cnt,
       TRUE AS cms_lower_ok, TRUE AS cms_upper_ok
FROM lineitem WHERE l_partkey <= 20 GROUP BY 1 ORDER BY 1
"""
    o["cms_weighted_partkey"] = """
SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wcnt,
       TRUE AS cms_lower_ok, TRUE AS cms_upper_ok,
       TRUE AS engines_bit_identical
FROM lineitem WHERE l_partkey <= 20 GROUP BY 1 ORDER BY 1
"""
    o["tdigest_weighted_price"] = """
WITH t AS (
  SELECT CAST(l_extendedprice AS DOUBLE) AS x,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL
    AND l_quantity > 0
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS n FROM t),
cum AS (SELECT x, sum(w) OVER (ORDER BY x) AS cw FROM t)
SELECT (SELECT n FROM tot) AS wcnt,
  round((SELECT min(x) FROM cum
         WHERE cw > CAST(floor(0.5 * ((SELECT n FROM tot) - 1)) AS BIGINT)),
        6) AS p50_exact,
  round((SELECT min(x) FROM cum
         WHERE cw > CAST(floor(0.99 * ((SELECT n FROM tot) - 1)) AS BIGINT)),
        6) AS p99_exact,
  TRUE AS td_p50_rank_ok, TRUE AS td_p99_rank_ok
"""
    o["bloom_lineitem_orderkeys"] = """
SELECT count(DISTINCT l_orderkey) AS distinct_keys,
       CAST(0 AS BIGINT) AS false_negatives
FROM lineitem
"""
    o["quantile_companions_events"] = """
WITH ranked AS (
  SELECT value, row_number() OVER (ORDER BY value) AS rn, count(*) OVER () AS n
  FROM events
)
SELECT any_value(n) AS cnt,
       max(CASE WHEN rn = 1 + CAST(floor(0.5  * (n - 1)) AS BIGINT) THEN value END) AS p50_exact,
       max(CASE WHEN rn = 1 + CAST(floor(0.9  * (n - 1)) AS BIGINT) THEN value END) AS p90_exact,
       max(CASE WHEN rn = 1 + CAST(floor(0.99 * (n - 1)) AS BIGINT) THEN value END) AS p99_exact,
       TRUE AS tdigest_ok, TRUE AS kll_ok
FROM ranked
"""

    # -- pipeline operators ------------------------------------------------
    from ddsketchy_spark.pipeline.text import LANG_MARKERS, STOPWORDS

    o["token_stats_documents"] = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS n_re_tokens,
       length(text) AS n_chars_calc
FROM documents ORDER BY doc_id
"""
    o["repetition_scores_documents"] = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws, text FROM documents
),
g2 AS (
  SELECT doc_id, round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6) AS f2
  FROM (SELECT doc_id, array_to_string(ws[p:p+1], ' ') AS g
        FROM w, LATERAL unnest(generate_series(1, len(ws) - 1)) AS t(p)
        WHERE len(ws) >= 2)
  GROUP BY doc_id
),
g3 AS (
  SELECT doc_id, round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6) AS f3
  FROM (SELECT doc_id, array_to_string(ws[p:p+2], ' ') AS g
        FROM w, LATERAL unnest(generate_series(1, len(ws) - 2)) AS t(p)
        WHERE len(ws) >= 3)
  GROUP BY doc_id
),
l AS (
  SELECT doc_id, round(1.0 - count(DISTINCT ln) * 1.0 / count(*), 6) AS fl
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM w)
  GROUP BY doc_id
)
SELECT w.doc_id,
       coalesce(g2.f2, 0.0) AS dup_ngram_frac_2,
       coalesce(g3.f3, 0.0) AS dup_ngram_frac_3,
       coalesce(l.fl, 0.0) AS dup_line_frac
FROM w LEFT JOIN g2 USING (doc_id) LEFT JOIN g3 USING (doc_id)
       LEFT JOIN l USING (doc_id)
ORDER BY doc_id
"""
    o["unigram_logprob_documents"] = """
WITH toks AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id IS NOT NULL)
  WHERE w <> ''
),
counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM counts),
vocab AS (SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 500),
lp AS (
  SELECT t.doc_id,
         ln(CAST(coalesce(v.c, 1) AS DOUBLE)) - ln((SELECT t FROM tot)) AS lp,
         CASE WHEN v.c IS NULL THEN 1.0 ELSE 0.0 END AS oov
  FROM toks t LEFT JOIN vocab v USING (w)
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored_tokens,
         round(-avg(lp), 6) AS unigram_nll,
         round(avg(oov), 6) AS oov_frac
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_scored_tokens, 0) AS n_scored_tokens,
       coalesce(p.unigram_nll, -1.0) AS unigram_nll,
       coalesce(p.oov_frac, -1.0) AS oov_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""
    o["dedup_paragraphs_documents"] = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || chr(10) || '{_PARA_BOILERPLATE}'
              ELSE text END AS text
  FROM documents
),
paras AS (
  SELECT doc_id, p - 1 AS pos, parts[p] AS part
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM corpus),
       LATERAL unnest(generate_series(1, len(parts))) AS t(p)
),
cand AS (
  SELECT doc_id, pos, md5(lower(trim(part))) AS h
  FROM paras WHERE length(trim(part)) >= 20
),
losers AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rk
    FROM cand)
  WHERE rk > 1
),
removed AS (SELECT doc_id, count(*) AS n_removed FROM losers GROUP BY doc_id),
kept AS (
  SELECT pr.doc_id, string_agg(pr.part, chr(10) ORDER BY pr.pos) AS new_text
  FROM paras pr LEFT JOIN losers lo
    ON pr.doc_id = lo.doc_id AND pr.pos = lo.pos
  WHERE lo.doc_id IS NULL
  GROUP BY pr.doc_id
)
SELECT c.doc_id, md5(coalesce(k.new_text, '')) AS text_md5,
       coalesce(r.n_removed, 0) AS n_paras_removed
FROM corpus c LEFT JOIN kept k USING (doc_id)
              LEFT JOIN removed r USING (doc_id)
ORDER BY c.doc_id
"""
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    o["quality_scores_documents"] = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS words, length(text) AS lc FROM documents
)
SELECT doc_id, len(words) AS n_words,
       round((lc - (len(words) - 1)) / CAST(len(words) AS DOUBLE), 6) AS mean_word_len,
       round(len(list_filter(words, x -> x IN ({stop_list})))
             / CAST(len(words) AS DOUBLE), 6) AS stopword_ratio
FROM w ORDER BY doc_id
"""
    _qf_case = """CASE WHEN text IS NULL THEN 'null_text'
            WHEN n_words < 20 THEN 'too_few_words'
            WHEN n_words > 50000 THEN 'too_many_words'
            WHEN mwl < 2.0 THEN 'short_words'
            WHEN mwl > 12.0 THEN 'long_words'
            WHEN swr < 0.03 THEN 'low_stopword'
            WHEN pr > 0.5 THEN 'high_punct'
            WHEN f2 > 0.06 THEN 'dup_ngram_2'
            WHEN fl > 0.3 THEN 'dup_line'
            ELSE 'kept' END"""
    o["quality_filter_documents"] = f"""
WITH w AS (
  SELECT doc_id, text, string_split(text, ' ') AS words, length(text) AS lc
  FROM documents
),
g2 AS (
  SELECT doc_id, round(1.0 - count(DISTINCT g) * 1.0 / count(*), 6) AS f2
  FROM (SELECT doc_id, array_to_string(words[p:p+1], ' ') AS g
        FROM w, LATERAL unnest(generate_series(1, len(words) - 1)) AS t(p)
        WHERE len(words) >= 2)
  GROUP BY doc_id
),
l AS (
  SELECT doc_id, round(1.0 - count(DISTINCT ln) * 1.0 / count(*), 6) AS fl
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM w)
  GROUP BY doc_id
),
feat AS (
  SELECT w.doc_id, text, len(words) AS n_words,
         round((lc - (len(words) - 1)) / CAST(len(words) AS DOUBLE), 6) AS mwl,
         round(len(list_filter(words, x -> x IN ({stop_list})))
               / CAST(len(words) AS DOUBLE), 6) AS swr,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
               / CAST(lc AS DOUBLE), 6) AS pr,
         coalesce(g2.f2, 0.0) AS f2,
         coalesce(l.fl, 0.0) AS fl
  FROM w LEFT JOIN g2 USING (doc_id) LEFT JOIN l USING (doc_id)
)
SELECT doc_id,
       {_qf_case} AS drop_reason,
       ({_qf_case}) = 'kept' AS keep
FROM feat ORDER BY doc_id
"""
    _cl_case = """CASE
            WHEN text IS NULL THEN 'null_text'
            WHEN contains(lower(text), 'lorem ipsum')
                 THEN 'page_blocklist:lorem ipsum'
            WHEN contains(lower(text), '{') THEN 'page_blocklist:{'
            WHEN coalesce(len(kept), 0) < 2 THEN 'too_few_lines'
            ELSE 'kept' END"""
    o["clean_lines_documents"] = f"""
WITH synth AS (
  SELECT doc_id,
         substr(text, 1, 40) || '.' || chr(10) ||
         substr(text, 41, 40) ||
         (CASE WHEN doc_id % 2 = 0 THEN '.' ELSE '' END) || chr(10) ||
         substr(text, 81) || ' end.' AS text
  FROM documents
),
base AS (
  SELECT doc_id, text,
         string_split(text, chr(10)) AS lines,
         list_filter(string_split(text, chr(10)),
           l -> regexp_matches(rtrim(l), '[.!?"]$')
                AND len(regexp_split_to_array(trim(l), ' +')) >= 5
                AND NOT contains(lower(l), 'javascript')) AS kept
  FROM synth
)
SELECT doc_id,
       coalesce(len(lines), 0) AS n_lines,
       coalesce(len(kept), 0) AS n_kept_lines,
       {_cl_case} AS drop_reason,
       ({_cl_case}) = 'kept' AS keep,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
FROM base ORDER BY doc_id
"""
    o["boilerplate_lines_documents"] = """
WITH corpus AS (
  SELECT doc_id,
         'Cookie notice: this site uses cookies' || chr(10) ||
         substr(text, 1, 50) || chr(10) || 'xx' || chr(10) ||
         'Copyright footer site' || CAST(doc_id % 7 AS VARCHAR) || chr(10)
         || 'pair marker ' || CAST(doc_id // 2 AS VARCHAR) AS text
  FROM documents
),
parts AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM corpus
          WHERE text IS NOT NULL AND doc_id IS NOT NULL),
lines AS (SELECT doc_id, t.p AS p, ls[t.p] AS l
          FROM parts, unnest(generate_series(1, len(ls))) AS t(p)),
elig AS (SELECT doc_id, p, md5(lower(trim(l))) AS h FROM lines
         WHERE length(trim(l)) >= 5),
boiler AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS c
                          FROM elig GROUP BY 1) WHERE c >= 30),
rem AS (SELECT e.doc_id, e.p FROM elig e JOIN boiler USING (h)),
nrem AS (SELECT doc_id, count(*) AS n FROM rem GROUP BY 1),
keptl AS (SELECT li.doc_id, li.p, li.l FROM lines li
          LEFT JOIN rem ON li.doc_id = rem.doc_id AND li.p = rem.p
          WHERE rem.doc_id IS NULL),
newtext AS (SELECT doc_id, string_agg(l, chr(10) ORDER BY p) AS t
            FROM keptl GROUP BY 1)
SELECT c.doc_id AS doc_id,
       CAST(coalesce(nrem.n, 0) AS BIGINT) AS n_boiler_removed,
       CASE WHEN c.text IS NULL THEN 'n/a'
            ELSE md5(coalesce(newtext.t, '')) END AS text_md5
FROM corpus c
LEFT JOIN nrem USING (doc_id)
LEFT JOIN newtext USING (doc_id)
ORDER BY doc_id
"""
    o["theta_source_overlap_documents"] = """
WITH g AS (SELECT DISTINCT source AS grp, u.w AS v
           FROM documents, unnest(string_split(text, ' ')) AS u(w)
           WHERE source IS NOT NULL AND text IS NOT NULL),
c AS (SELECT grp, count(*) AS cnt FROM g GROUP BY 1),
pairs AS (SELECT a.grp AS ga, a.cnt AS na, b.grp AS gb, b.cnt AS nb
          FROM c a JOIN c b ON a.grp < b.grp),
i AS (SELECT x.grp AS ga, y.grp AS gb, count(*) AS inter
      FROM g x JOIN g y ON x.v = y.v AND x.grp < y.grp GROUP BY 1, 2)
SELECT pairs.ga AS group_a, pairs.gb AS group_b,
       round(CAST(na AS DOUBLE), 6) AS est_a,
       round(CAST(nb AS DOUBLE), 6) AS est_b,
       round(CAST(na + nb - coalesce(inter, 0) AS DOUBLE), 6) AS est_union,
       round(CAST(coalesce(inter, 0) AS DOUBLE), 6) AS est_intersection,
       round(CAST(coalesce(inter, 0) AS DOUBLE)
             / (na + nb - coalesce(inter, 0)), 6) AS jaccard,
       round(CAST(coalesce(inter, 0) AS DOUBLE) / na, 6)
         AS containment_a_in_b,
       round(CAST(coalesce(inter, 0) AS DOUBLE) / nb, 6)
         AS containment_b_in_a,
       TRUE AS exact_mode
FROM pairs LEFT JOIN i ON pairs.ga = i.ga AND pairs.gb = i.gb
ORDER BY group_a, group_b
"""
    _url_multi = ("'co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',"
                  "'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',"
                  "'com.mx','co.in','co.nz','co.za','com.ar','com.tr',"
                  "'com.tw','com.sg'")
    o["url_domain_filter_documents"] = f"""
WITH synth AS (
  SELECT doc_id,
         'https://' || (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END)
         || 'site' || (doc_id % 13)
         || (CASE WHEN doc_id % 3 = 0 THEN '.co.uk' ELSE '.com' END)
         || '/page?id=' || doc_id AS url
  FROM documents
),
h AS (
  SELECT doc_id, lower(coalesce(regexp_extract(url,
    '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)', 1), ''))
    AS host
  FROM synth
),
d AS (
  SELECT doc_id, host, string_split(host, '.') AS labels,
         len(string_split(host, '.')) AS n
  FROM h
),
dom AS (
  SELECT doc_id, host,
         CASE WHEN n <= 2 THEN host
              WHEN array_to_string(labels[greatest(n-1,1):], '.')
                   IN ({_url_multi}) AND n >= 3
                   THEN array_to_string(labels[greatest(n-2,1):], '.')
              ELSE array_to_string(labels[greatest(n-1,1):], '.') END
           AS domain
  FROM d
)
SELECT doc_id, host, domain,
       domain NOT IN ('site3.com', 'site5.co.uk') AS keep
FROM dom ORDER BY doc_id
"""
    langs = list(LANG_MARKERS)
    hits_sql = ",\n  ".join(
        "len(list_filter(words, x -> x IN ({}))) AS hits_{}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang)
        for lang in langs
    )
    case_parts = []
    for lang in langs:
        conds = " AND ".join(f"hits_{lang} >= hits_{o2}" for o2 in langs if o2 != lang)
        case_parts.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(case_parts) + f" ELSE '{langs[0]}' END"
    o["lang_id_distribution"] = f"""
WITH w AS (SELECT string_split(text, ' ') AS words FROM documents),
h AS (SELECT {hits_sql} FROM w)
SELECT {case_sql} AS pred_lang, count(*) AS cnt
FROM h GROUP BY 1 ORDER BY 1
"""
    o["top_bigrams_documents"] = """
WITH w AS (SELECT string_split(text, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
i AS (SELECT words, unnest(generate_series(1, len(words) - 1)) AS p
      FROM w WHERE len(words) >= 2),
g AS (SELECT words[p] || ' ' || words[p + 1] AS ngram FROM i)
SELECT ngram, count(*) AS cnt FROM g GROUP BY 1
ORDER BY cnt DESC, ngram ASC LIMIT 20
"""
    o["decontaminate_documents"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
ci AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 12)) AS p
       FROM w WHERE len(words) >= 13),
cg AS (SELECT doc_id AS corpus_id, array_to_string(words[p:p+12], ' ') AS gram
       FROM ci),
bg AS (SELECT DISTINCT gram FROM cg WHERE corpus_id < 5),
bad AS (SELECT DISTINCT corpus_id FROM cg JOIN bg USING (gram))
SELECT CAST(count(*) AS BIGINT) AS contaminated_docs,
       (SELECT CAST(count(*) AS BIGINT) FROM documents)
         - CAST(count(*) AS BIGINT) AS docs_after_decontam
FROM bad
"""
    _pii_email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    _pii_ip = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    _pii_phone = r"\+\d[\d\- ]{7,}\d"
    o["redact_pii_documents"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT * FROM (VALUES
    (900001, 'mail a@b.io or jane.doe+x@example.org now'),
    (900002, 'host 10.0.0.1 peer 192.168.1.255'),
    (900003, 'dial +1 555-123-4567 or +44 20 7946 0958')
  ) AS v(doc_id, text)
),
s1 AS (
  SELECT doc_id, text,
         coalesce(len(regexp_extract_all(text, '{_pii_email}')), 0) AS n_email,
         regexp_replace(text, '{_pii_email}', '[EMAIL]', 'g') AS t1
  FROM corpus
),
s2 AS (
  SELECT *, coalesce(len(regexp_extract_all(t1, '{_pii_ip}')), 0) AS n_ip,
         regexp_replace(t1, '{_pii_ip}', '[IP]', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT *, coalesce(len(regexp_extract_all(t2, '{_pii_phone}')), 0) AS n_phone,
         regexp_replace(t2, '{_pii_phone}', '[PHONE]', 'g') AS text_redacted
  FROM s2
)
SELECT doc_id, n_email, n_ip, n_phone,
       n_email + n_ip + n_phone AS n_pii, text_redacted
FROM s3 ORDER BY doc_id
"""
    o["quantile_shards_documents"] = """
SELECT CAST(count(*) AS BIGINT) AS total,
       CAST(8 AS BIGINT) AS n_ranges,
       TRUE AS full_boundary_set,
       TRUE AS rank_err_le_3pct,
       TRUE AS balance_6pct
FROM documents WHERE n_chars IS NOT NULL
"""
    o["split_corpus_documents"] = """
WITH u AS (
  SELECT n_chars,
         CAST(('0x' || substring(md5(doc_id || ':0'), 1, 13)) AS BIGINT)
           / (16.0 ^ 13) AS u
  FROM documents WHERE doc_id IS NOT NULL
)
SELECT CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS chars
FROM u GROUP BY split ORDER BY split
"""
    o["split_corpus_grouped_documents"] = """
WITH u AS (
  SELECT source,
         CAST(('0x' || substring(md5('g:' || source || ':3'), 1, 13)) AS BIGINT)
           / (16.0 ^ 13) AS u
  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
)
SELECT CASE WHEN u < 0.7 THEN 'train' ELSE 'test' END AS split,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS docs,
       TRUE AS no_straddle
FROM u GROUP BY split ORDER BY split
"""
    o["top_frac_by_group_documents"] = """
WITH base AS (
  SELECT doc_id, source, n_chars FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
),
r AS (
  SELECT source, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM base
),
t AS (
  SELECT source, n_chars AS thr FROM r
  WHERE rn = LEAST(n, CAST(floor(0.8 * n) AS BIGINT) + 1)
)
SELECT b.source, CAST(count(*) AS BIGINT) AS kept,
       CAST(min(t.thr) AS BIGINT) AS thr,
       CAST(sum(b.n_chars) AS BIGINT) AS chars_kept
FROM base b JOIN t USING (source)
WHERE b.n_chars >= t.thr
GROUP BY b.source ORDER BY b.source
"""
    o["sample_by_group_documents"] = """
SELECT source,
       CAST(least(7, count(*)) AS BIGINT) AS n_sampled,
       TRUE AS subset_ok
FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
GROUP BY source ORDER BY source
"""
    o["distinct_sample_orders"] = """
SELECT key, u FROM (
  SELECT CAST(o_custkey AS VARCHAR) AS key,
         CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR) || ':0'),
                                 1, 13)) AS BIGINT) AS u
  FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
) ORDER BY u, key LIMIT 50
"""
    o["distinct_sample_by_status_orders"] = """
SELECT o_orderstatus, key, u FROM (
  SELECT o_orderstatus, key,
         CAST(('0x' || substring(md5(key || ':3'), 1, 13)) AS BIGINT) AS u,
         row_number() OVER (
           PARTITION BY o_orderstatus
           ORDER BY CAST(('0x' || substring(md5(key || ':3'), 1, 13))
                         AS BIGINT), key) AS rn
  FROM (SELECT DISTINCT o_orderstatus, CAST(o_custkey AS VARCHAR) AS key
        FROM orders WHERE o_custkey IS NOT NULL)
) WHERE rn <= 20
"""
    o["weighted_sample_documents"] = """
WITH dedup AS (
  SELECT CAST(doc_id AS VARCHAR) AS key,
         max(CAST(n_chars AS DOUBLE)) AS weight
  FROM documents
  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
  GROUP BY 1
),
scored AS (
  SELECT key, weight,
         -ln((CAST(('0x' || substring(md5(key || ':0'), 1, 13)) AS BIGINT)
              + 0.5) / 4503599627370496.0) / weight AS rank
  FROM dedup
)
SELECT key, weight, round(rank, 6) AS rank_r6
FROM scored ORDER BY rank, key LIMIT 40
"""
    o["sessionize_events"] = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
grp AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 6) AS value_sum_r6
FROM grp GROUP BY user_id, sid
"""
    o["token_pairs_documents"] = """
WITH toks AS (
  SELECT string_split(text, ' ') AS l FROM documents WHERE text IS NOT NULL
),
pairs AS (
  SELECT unnest(l[1:len(l)-1]) AS a, unnest(l[2:len(l)]) AS b
  FROM toks WHERE len(l) >= 2
)
SELECT a, b, count(*) AS cnt FROM pairs GROUP BY a, b
ORDER BY cnt DESC, a, b LIMIT 25
"""
    # Four unrolled BPE rounds: cK counts adjacent pairs of the current
    # string form, bK is the deterministic argmax (the merge), sK fuses
    # it everywhere via replace() — DuckDB's left-to-right non-
    # overlapping scan is exactly Spark F.replace's, which IS the BPE
    # fusion law. chr(31)=\x1f symbol boundary, chr(30)=\x1e fuse glue.
    _bpe_round = """
c{k} AS (
  SELECT a, b, count(*) AS cnt FROM (
    SELECT unnest(l[1:len(l)-1]) AS a, unnest(l[2:len(l)]) AS b
    FROM (SELECT string_split(substring(s, 2, length(s)-2),
                              chr(31)||chr(31)) AS l FROM s{p}) t
    WHERE len(l) >= 2
  ) pr GROUP BY a, b
),
b{k} AS (SELECT a, b, cnt FROM c{k} ORDER BY cnt DESC, a, b LIMIT 1),
s{k} AS (
  SELECT replace(s,
    chr(31)||(SELECT a FROM b{k})||chr(31)||chr(31)
            ||(SELECT b FROM b{k})||chr(31),
    chr(31)||(SELECT a FROM b{k})||chr(30)
            ||(SELECT b FROM b{k})||chr(31)) AS s
  FROM s{p}
)"""
    o["bpe_merges_documents"] = ("""
WITH s0 AS (
  SELECT chr(31) || array_to_string(string_split(text, ' '),
                                    chr(31)||chr(31)) || chr(31) AS s
  FROM documents
  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 2
),""" + ",".join(_bpe_round.format(k=k, p=k - 1) for k in (1, 2, 3, 4))
        + """
SELECT * FROM (
  SELECT 1 AS merge_round, a AS left_tok, b AS right_tok,
         cnt AS pair_count FROM b1
  UNION ALL SELECT 2, a, b, cnt FROM b2
  UNION ALL SELECT 3, a, b, cnt FROM b3
  UNION ALL SELECT 4, a, b, cnt FROM b4
) m ORDER BY merge_round
""")
    # Encode oracle: re-derive the 2 merges (same corpus-wide rounds as
    # the training oracle above, under the encode query's id+text filter),
    # the vocabulary numbering (base symbols by binary order via
    # row_number, then merges at B, B+1), the per-doc fusion (replace()
    # shares F.replace's left-to-right non-overlapping scan), and every
    # id sequence as csv.
    _enc_sd = """
sd{k} AS (
  SELECT doc_id, replace(s,
    chr(31)||(SELECT a FROM b{k})||chr(31)||chr(31)
            ||(SELECT b FROM b{k})||chr(31),
    chr(31)||(SELECT a FROM b{k})||chr(30)
            ||(SELECT b FROM b{k})||chr(31)) AS s
  FROM sd{p}
)"""
    o["encode_bpe_documents"] = ("""
WITH s0 AS (
  SELECT chr(31) || array_to_string(string_split(text, ' '),
                                    chr(31)||chr(31)) || chr(31) AS s
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
    AND len(string_split(text, ' ')) >= 2
),""" + ",".join(_bpe_round.format(k=k, p=k - 1) for k in (1, 2)) + """,
base AS (
  SELECT DISTINCT unnest(string_split(text, ' ')) AS symbol
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
nb AS (SELECT count(*) AS b FROM base),
vocab AS (
  SELECT symbol, row_number() OVER (ORDER BY symbol) - 1 AS tok_id
  FROM base
  UNION ALL
  SELECT (SELECT a FROM b1)||chr(30)||(SELECT b FROM b1), (SELECT b FROM nb)
  UNION ALL
  SELECT (SELECT a FROM b2)||chr(30)||(SELECT b FROM b2),
         (SELECT b FROM nb) + 1
),
sd0 AS (
  SELECT doc_id, chr(31) || array_to_string(string_split(text, ' '),
                                            chr(31)||chr(31)) || chr(31) AS s
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),""" + ",".join(_enc_sd.format(k=k, p=k - 1) for k in (1, 2)) + """,
toks AS (
  SELECT doc_id, unnest(l) AS symbol, unnest(range(1, len(l) + 1)) AS pos
  FROM (SELECT doc_id, string_split(substring(s, 2, length(s) - 2),
                                    chr(31)||chr(31)) AS l
        FROM sd2) t
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
       array_to_string(list(CAST(v.tok_id AS VARCHAR) ORDER BY t.pos),
                       ',') AS ids_csv
FROM toks t JOIN vocab v USING (symbol)
GROUP BY t.doc_id
""")
    o["bigram_logprob_documents"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
counts AS (SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY w),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM counts),
vocab AS (SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 300),
prs AS (
  SELECT doc_id, unnest(l[1:len(l)-1]) AS w1, unnest(l[2:len(l)]) AS w2
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL) t
  WHERE len(l) >= 2
),
pairs AS (SELECT doc_id, w1, w2 FROM prs WHERE w1 <> '' AND w2 <> ''),
bt AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY w1, w2
       ORDER BY c12 DESC, w1, w2 LIMIT 400),
model AS (
  SELECT bt.w1, bt.w2, CAST(bt.c12 AS DOUBLE) / counts.c AS s12
  FROM bt JOIN counts ON bt.w1 = counts.w
),
lp AS (
  SELECT p.doc_id,
         CASE WHEN m.s12 IS NOT NULL THEN ln(m.s12)
              ELSE ln(0.4) + ln(CAST(COALESCE(v.c, 1) AS DOUBLE))
                   - ln((SELECT tot FROM tot))
         END AS lp,
         CASE WHEN m.s12 IS NULL THEN 1.0 ELSE 0.0 END AS bo
  FROM pairs p
  LEFT JOIN model m ON p.w1 = m.w1 AND p.w2 = m.w2
  LEFT JOIN vocab v ON p.w2 = v.w
),
per AS (SELECT doc_id, count(*) AS n_bigrams,
               round(-avg(lp), 6) AS bigram_nll,
               round(avg(bo), 6) AS backoff_frac
        FROM lp GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       COALESCE(per.bigram_nll, -1.0) AS bigram_nll,
       COALESCE(per.backoff_frac, -1.0) AS backoff_frac
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.doc_id IS NOT NULL
"""
    o["vocab_coverage_documents"] = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS c FROM toks GROUP BY tok
  ) t ORDER BY c DESC, tok LIMIT 500
)
SELECT source, count(*) AS n_tokens,
       count(CASE WHEN v.tok IS NULL THEN 1 END) AS n_oov,
       round(count(CASE WHEN v.tok IS NULL THEN 1 END) / count(*),
             6) AS oov_rate_r6
FROM toks LEFT JOIN vocab v ON toks.tok = v.tok
GROUP BY source
"""
    o["mixture_sample_documents"] = """
WITH tot AS (
  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS tot FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY source
),
rate AS (
  SELECT source,
         (CASE source WHEN 'src0' THEN 4000.0 WHEN 'src1' THEN 20000.0
                      WHEN 'src2' THEN 7000.0 END) / tot AS rate
  FROM tot WHERE source IN ('src0', 'src1', 'src2') AND tot > 0
),
k AS (
  SELECT d.source, d.n_chars,
         CAST(floor(r.rate) AS BIGINT)
           + CASE WHEN CAST(('0x' || substring(md5(d.doc_id || ':7'), 1, 13))
                         AS BIGINT) / (16.0 ^ 13) < r.rate - floor(r.rate)
                  THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN rate r USING (source)
  WHERE d.doc_id IS NOT NULL AND d.n_chars IS NOT NULL
)
SELECT source, CAST(count(*) AS BIGINT) AS docs_kept,
       CAST(sum(n_copies) AS BIGINT) AS copies,
       CAST(sum(n_chars * n_copies) AS BIGINT) AS chars_mixed
FROM k WHERE n_copies >= 1 GROUP BY source ORDER BY source
"""
    o["mixture_pack_documents"] = """
WITH tot AS (
  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS tot FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY source
),
rate AS (
  SELECT source,
         (CASE source WHEN 'src0' THEN 4000.0 WHEN 'src1' THEN 20000.0
                      WHEN 'src2' THEN 7000.0 END) / tot AS rate
  FROM tot WHERE source IN ('src0', 'src1', 'src2') AND tot > 0
),
k AS (
  SELECT d.doc_id, d.n_chars,
         CAST(floor(r.rate) AS BIGINT)
           + CASE WHEN CAST(('0x' || substring(md5(d.doc_id || ':7'), 1, 13))
                         AS BIGINT) / (16.0 ^ 13) < r.rate - floor(r.rate)
                  THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN rate r USING (source)
  WHERE d.doc_id IS NOT NULL AND d.n_chars IS NOT NULL
),
e AS (
  SELECT doc_id, n_chars,
         unnest(generate_series(0, n_copies - 1)) AS cp
  FROM k WHERE n_copies >= 1
),
base AS (
  SELECT doc_id, cp, n_chars,
         CAST(doc_id AS VARCHAR) || '#' || CAST(cp AS VARCHAR) AS pid,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '#'
                                     || CAST(cp AS VARCHAR) || ':11'),
                                 1, 13)) AS BIGINT) AS h
  FROM e WHERE n_chars > 0
),
ord AS (
  SELECT doc_id, cp, n_chars,
         CAST(coalesce(sum(n_chars) OVER (
              ORDER BY h, pid
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM base
)
SELECT doc_id, cp AS copy_idx, o // 2048 AS start_seq, o % 2048 AS start_pos,
       ((o + n_chars - 1) // 2048) - (o // 2048) + 1 AS n_seqs
FROM ord ORDER BY doc_id, copy_idx
"""
    o["pack_sequences_documents"] = """
WITH base AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substring(md5(doc_id || ':5'), 1, 13)) AS BIGINT) AS h
  FROM documents WHERE doc_id IS NOT NULL AND n_chars > 0
),
ord AS (
  SELECT doc_id, n_chars,
         CAST(coalesce(sum(n_chars) OVER (
              ORDER BY h, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS o
  FROM base
)
SELECT doc_id, o // 2048 AS start_seq, o % 2048 AS start_pos,
       ((o + n_chars - 1) // 2048) - (o // 2048) + 1 AS n_seqs
FROM ord ORDER BY doc_id
"""
    o["dedup_exact_documents"] = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
),
g AS (
  SELECT md5(lower(trim(text))) AS fp, count(*) AS c FROM all_docs GROUP BY 1
)
SELECT CAST(count(*) FILTER (WHERE c > 1) AS BIGINT) AS dup_groups,
       CAST(count(*) AS BIGINT) AS docs_after_dedup
FROM g
"""
    o["word_jaccard_near_dups"] = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
),
s AS (SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS ws FROM all_docs)
SELECT CAST(count(*) AS BIGINT) AS pairs_999
FROM s a JOIN s b ON a.id < b.id
WHERE len(list_intersect(a.ws, b.ws))
      / CAST(len(list_distinct(list_concat(a.ws, b.ws))) AS DOUBLE) >= 0.999
"""
    _dup_pairs_sql = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
),
g AS (SELECT md5(lower(trim(text))) AS fp, count(*) AS c FROM all_docs GROUP BY 1)
SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS exact_dup_pairs, TRUE AS {flag}
FROM g WHERE c > 1
"""
    o["minhash_lsh_exact_dup_recall"] = _dup_pairs_sql.format(flag="lsh_found_all")
    o["simhash_exact_dup_recall"] = _dup_pairs_sql.format(flag="simhash_found_all")
    o["minhash_lsh_bucketlocal_parity"] = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
),
g AS (SELECT md5(lower(trim(text))) AS fp, count(*) AS c FROM all_docs GROUP BY 1)
SELECT CAST(sum(c * (c - 1) / 2) AS BIGINT) AS exact_dup_pairs,
       CAST(0 AS BIGINT) AS pair_sym_diff,
       CAST(0 AS BIGINT) AS est_mismatches
FROM g WHERE c > 1
"""
    o["dedup_near_text_documents"] = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 50
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       TRUE AS exact_groups_single_component,
       TRUE AS one_keep_per_component,
       TRUE AS kept_le_md5_groups
FROM all_docs
"""
    o["dedup_exact_incremental_documents"] = """
WITH base AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
corpus AS (
  SELECT doc_id, md5(lower(trim(text))) AS fp FROM base WHERE doc_id % 2 = 0
),
inc AS (
  SELECT doc_id + 100000 AS doc_id, text FROM base
  WHERE doc_id % 2 = 0 AND doc_id < 50
  UNION ALL
  SELECT doc_id + 200000, '  ' || text || ' ' FROM base
  WHERE doc_id % 2 = 0 AND doc_id >= 50 AND doc_id < 70
  UNION ALL
  SELECT doc_id + 300000, 'unique exact doc ' || md5(CAST(doc_id AS VARCHAR))
  FROM base WHERE doc_id % 2 = 1 AND doc_id < 40
  UNION ALL
  SELECT doc_id + 400000, 'unique exact doc ' || md5(CAST(doc_id AS VARCHAR))
  FROM base WHERE doc_id % 2 = 1 AND doc_id < 20
),
m AS (
  SELECT i.doc_id, md5(lower(trim(i.text))) AS fp,
         (SELECT min(c.doc_id) FROM corpus c
          WHERE c.fp = md5(lower(trim(i.text)))) AS corpus_match
  FROM inc i
),
keepmin AS (
  SELECT fp, min(doc_id) AS kid FROM m WHERE corpus_match IS NULL GROUP BY fp
)
SELECT m.doc_id, coalesce(m.corpus_match, -1) AS corpus_match,
       (m.corpus_match IS NULL AND m.doc_id = k.kid) AS keep
FROM m LEFT JOIN keepmin k USING (fp)
ORDER BY m.doc_id
"""


    o["incremental_crawl_documents"] = """
WITH ids AS (SELECT unnest(generate_series(0, 39)) AS i),
c1 AS (
  SELECT i AS doc_id, substr(md5('c1:' || CAST(i AS VARCHAR) || ':0'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':1'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':2'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':3'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':4'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':5'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':6'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':7'), 1, 8) AS text,
         CASE WHEN i % 2 = 1 THEN 'srcA' ELSE 'srcB' END AS source,
         i + 64 AS n_tok
  FROM ids
  UNION ALL
  SELECT i + 100, substr(md5('c1:' || CAST(i AS VARCHAR) || ':0'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':1'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':2'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':3'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':4'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':5'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':6'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':7'), 1, 8),
         CASE WHEN i % 2 = 1 THEN 'srcA' ELSE 'srcB' END, i + 64
  FROM ids WHERE i < 6
),
c2 AS (
  SELECT i + 1000 AS doc_id, substr(md5('c1:' || CAST(i AS VARCHAR) || ':0'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':1'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':2'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':3'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':4'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':5'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':6'), 1, 8) || ' ' || substr(md5('c1:' || CAST(i AS VARCHAR) || ':7'), 1, 8) AS text,
         'srcA' AS source, 70 AS n_tok FROM ids WHERE i < 10
  UNION ALL
  SELECT i + 3000, substr(md5('c2:' || CAST(i AS VARCHAR) || ':0'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':1'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':2'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':3'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':4'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':5'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':6'), 1, 8) || ' ' || substr(md5('c2:' || CAST(i AS VARCHAR) || ':7'), 1, 8), 'srcB', 70 FROM ids WHERE i < 10
),
-- exact dedup within crawl 1 (min id per text); the 8-word md5 docs are
-- pairwise word-disjoint, so quality and near stages drop nothing
k1 AS (
  SELECT min(doc_id) AS doc_id, any_value(n_tok) AS n_tok FROM c1
  GROUP BY text
),
-- crawl 2 vs the index (crawl-1 survivor texts), then within-crawl
k2 AS (
  SELECT min(doc_id) AS doc_id, any_value(n_tok) AS n_tok FROM c2
  WHERE text NOT IN (SELECT text FROM c1)
  GROUP BY text
),
-- the split law: md5 52-bit uniform of 'id:0', train < 0.75
s1 AS (
  SELECT *, CASE WHEN CAST(('0x' || substring(
           md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 13)) AS BIGINT)
           / (16.0 ^ 13) < 0.75 THEN 'train' ELSE 'test' END AS split
  FROM k1
),
s2 AS (
  SELECT *, CASE WHEN CAST(('0x' || substring(
           md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 13)) AS BIGINT)
           / (16.0 ^ 13) < 0.75 THEN 'train' ELSE 'test' END AS split
  FROM k2
)
SELECT metric, CAST(value AS BIGINT) AS value FROM (
  SELECT 'c1_input' AS metric, (SELECT count(*) FROM c1) AS value
  UNION ALL SELECT 'c1_quality', (SELECT count(*) FROM c1)
  UNION ALL SELECT 'c1_exact', (SELECT count(*) FROM k1)
  UNION ALL SELECT 'c1_near', (SELECT count(*) FROM k1)
  UNION ALL SELECT 'c1_kept', (SELECT count(*) FROM k1)
  UNION ALL SELECT 'c1_seq_train',
    (SELECT ceil(sum(n_tok) / 128.0) FROM s1 WHERE split = 'train')
  UNION ALL SELECT 'c1_seq_test',
    (SELECT ceil(sum(n_tok) / 128.0) FROM s1 WHERE split = 'test')
  UNION ALL SELECT 'c1_rollup_version', 0
  UNION ALL SELECT 'c2_input', (SELECT count(*) FROM c2)
  UNION ALL SELECT 'c2_quality', (SELECT count(*) FROM c2)
  UNION ALL SELECT 'c2_exact', (SELECT count(*) FROM k2)
  UNION ALL SELECT 'c2_near', (SELECT count(*) FROM k2)
  UNION ALL SELECT 'c2_kept', (SELECT count(*) FROM k2)
  UNION ALL SELECT 'c2_seq_train',
    (SELECT coalesce(ceil(sum(n_tok) / 128.0), 0) FROM s2
     WHERE split = 'train')
  UNION ALL SELECT 'c2_seq_test',
    (SELECT coalesce(ceil(sum(n_tok) / 128.0), 0) FROM s2
     WHERE split = 'test')
  UNION ALL SELECT 'c2_rollup_version', 1
  UNION ALL SELECT 'c2_drift_sources', 2
) ORDER BY metric
"""

    _K, _W, _ML = 20, 21, 40
    _E = 2 * (_W + _K)
    _G = _K + 2 * _E
    o["exactsubstr_rewrite_documents"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id < 120
  UNION ALL
  SELECT doc_id + 800000,
         'planted intro ' || md5(CAST(doc_id AS VARCHAR)) || ' ' ||
         substr(text, 1, 120) || ' planted outro ' ||
         md5(CAST(doc_id + 7 AS VARCHAR))
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id < 25
),
{_winnowing_ctes(_K, _W, "corpus", lower=False)},
fps AS (SELECT DISTINCT doc_id, m.p AS pos, m.h AS fp FROM winmins),
mt AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
         b.pos - a.pos AS diag
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
),
ch AS (
  SELECT id_a, id_b, diag, pa,
         SUM(CASE WHEN gap IS NULL OR gap <= {_G} THEN 0 ELSE 1 END)
           OVER (PARTITION BY id_a, id_b, diag ORDER BY pa
                 ROWS UNBOUNDED PRECEDING) AS chain
  FROM (SELECT *, pa - lag(pa) OVER (PARTITION BY id_a, id_b, diag
                                     ORDER BY pa) AS gap FROM mt)
),
spans0 AS (
  SELECT id_a, id_b, diag, min(pa) AS a_lo, max(pa) + {_K} AS a_hi
  FROM ch GROUP BY id_a, id_b, diag, chain
),
lens AS (SELECT doc_id, length(text) AS bl FROM corpus),
sp AS (
  SELECT DISTINCT id_a, id_b, diag,
         greatest(a_lo - {_E}, 0, -diag) AS reg_lo,
         least(a_hi + {_E}, la.bl, lb.bl - diag) AS reg_hi
  FROM spans0 JOIN lens la ON la.doc_id = id_a
              JOIN lens lb ON lb.doc_id = id_b
  WHERE least(a_hi + {_E}, la.bl, lb.bl - diag)
        - greatest(a_lo - {_E}, 0, -diag) >= {_ML}
),
posq AS (
  SELECT s.id_a, s.id_b, s.diag, s.reg_lo, g.p,
         substr(ta.text, CAST(g.p + 1 AS BIGINT), 1)
           = substr(tb.text, CAST(g.p + s.diag + 1 AS BIGINT), 1) AS eq
  FROM sp s
  JOIN corpus ta ON ta.doc_id = s.id_a
  JOIN corpus tb ON tb.doc_id = s.id_b,
  LATERAL unnest(generate_series(s.reg_lo, s.reg_hi - 1)) AS g(p)
),
runs AS (
  SELECT id_a, id_b, diag, min(p) AS a_start, count(*) AS run_len
  FROM (SELECT *, p - ROW_NUMBER() OVER (PARTITION BY id_a, id_b, diag,
                                         reg_lo ORDER BY p) AS island
        FROM posq WHERE eq)
  GROUP BY id_a, id_b, diag, reg_lo, island
  HAVING count(*) >= {_ML}
),
cut0 AS (SELECT id_b AS doc_id, a_start + diag AS s,
                a_start + diag + run_len AS e
         FROM runs),
mrg AS (
  SELECT doc_id, s, e,
         CASE WHEN s <= max(e) OVER (PARTITION BY doc_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS brk
  FROM cut0
),
cuts AS (
  SELECT doc_id, min(s) AS s, max(e) AS e
  FROM (SELECT doc_id, s, e,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS grp
        FROM mrg)
  GROUP BY doc_id, grp
),
segs AS (
  SELECT doc_id, lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY s) AS seg_s,
         s AS seg_e
  FROM cuts
  UNION ALL
  SELECT c.doc_id, max(c.e), any_value(l.bl)
  FROM cuts c JOIN lens l USING (doc_id) GROUP BY c.doc_id
),
rew AS (
  SELECT s.doc_id,
         string_agg(substr(t.text, seg_s + 1, seg_e - seg_s),
                    '' ORDER BY seg_s) AS new_text
  FROM segs s JOIN corpus t USING (doc_id)
  WHERE seg_e > seg_s
  GROUP BY s.doc_id
),
stats AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cut_spans,
         CAST(sum(e - s) AS BIGINT) AS n_cut_bytes
  FROM cuts GROUP BY doc_id
)
SELECT c.doc_id,
       md5(CASE WHEN st.doc_id IS NULL THEN c.text
                ELSE coalesce(r.new_text, '') END) AS text_md5,
       coalesce(st.n_cut_spans, 0) AS n_cut_spans,
       coalesce(st.n_cut_bytes, 0) AS n_cut_bytes
FROM corpus c
LEFT JOIN stats st ON st.doc_id = c.doc_id
LEFT JOIN rew r ON r.doc_id = c.doc_id
ORDER BY c.doc_id
"""

    o["substring_pairs_documents"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
  UNION ALL
  SELECT doc_id + 500000,
         substr(text, 1, 80) || ' planted tail '
           || md5(CAST(doc_id AS VARCHAR))
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND doc_id < 30
),
{_winnowing_ctes(32, 33, "corpus")},
fps AS (
  SELECT DISTINCT doc_id, m.h AS fp FROM winmins
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared_fps
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
ORDER BY id_a, id_b
"""
    o["dedup_incremental_documents"] = """
WITH a AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
inc AS (
  SELECT doc_id + 100000 AS doc_id, text FROM a WHERE doc_id < 50
  UNION ALL
  SELECT doc_id + 200000, 'unique document ' || md5(CAST(doc_id AS VARCHAR))
  FROM a WHERE doc_id >= 50 AND doc_id < 80
  UNION ALL
  SELECT doc_id + 400000, 'unique document ' || md5(CAST(doc_id AS VARCHAR))
  FROM a WHERE doc_id >= 50 AND doc_id < 60
),
cm AS (SELECT doc_id FROM inc WHERE text IN (SELECT text FROM a)),
surv AS (SELECT * FROM inc WHERE doc_id NOT IN (SELECT doc_id FROM cm)),
w AS (SELECT text, count(*) AS c FROM surv GROUP BY 1)
SELECT CAST((SELECT count(*) FROM inc) AS BIGINT) AS inc_docs,
       CAST((SELECT count(*) FROM cm) AS BIGINT) AS cross_dropped,
       CAST(COALESCE((SELECT sum(c - 1) FROM w WHERE c > 1), 0) AS BIGINT)
         AS within_dropped,
       CAST((SELECT count(*) FROM surv)
            - COALESCE((SELECT sum(c - 1) FROM w WHERE c > 1), 0) AS BIGINT)
         AS kept,
       TRUE AS cross_exact_complete
"""
    o["dedup_semantic_incremental_embeddings"] = """
WITH a AS (SELECT vec_id, embedding FROM embeddings
           WHERE embedding IS NOT NULL),
inc AS (
  SELECT vec_id + 100000 AS vec_id, embedding FROM a WHERE vec_id < 50
  UNION ALL
  SELECT vec_id + 200000, list_transform(embedding, x -> -x)
  FROM a WHERE vec_id >= 50 AND vec_id < 80
  UNION ALL
  SELECT vec_id + 400000, list_transform(embedding, x -> -x)
  FROM a WHERE vec_id >= 50 AND vec_id < 60
),
cm AS (SELECT vec_id FROM inc
       WHERE embedding IN (SELECT embedding FROM a)),
surv AS (SELECT * FROM inc WHERE vec_id NOT IN (SELECT vec_id FROM cm)),
w AS (SELECT embedding, count(*) AS c FROM surv GROUP BY 1)
SELECT CAST((SELECT count(*) FROM inc) AS BIGINT) AS inc_docs,
       CAST((SELECT count(*) FROM cm) AS BIGINT) AS cross_dropped,
       CAST(COALESCE((SELECT sum(c - 1) FROM w WHERE c > 1), 0) AS BIGINT)
         AS within_dropped,
       CAST((SELECT count(*) FROM surv)
            - COALESCE((SELECT sum(c - 1) FROM w WHERE c > 1), 0) AS BIGINT)
         AS kept,
       TRUE AS cross_exact_complete
"""
    _drift_old = _dds_oracle(
        "(SELECT event_type, value FROM events WHERE event_id % 2 = 0) eo",
        "value", (0.5,), by="event_type")
    _drift_new = _dds_oracle("events", "value", (0.5,), by="event_type")
    o["rollup_drift_events"] = f"""
WITH old_v AS ({_drift_old}),
new_v AS ({_drift_new})
SELECT o.event_type, 'both' AS status,
       o.cnt AS cnt_old, n.cnt AS cnt_new, n.cnt - o.cnt AS delta_cnt,
       o.p50 AS p50_old, n.p50 AS p50_new
FROM old_v o JOIN new_v n USING (event_type)
ORDER BY o.event_type
"""
    o["theta_overlap_events"] = """
WITH o AS (SELECT event_type, count(DISTINCT user_id) AS d_old
           FROM events WHERE event_id % 2 = 0 GROUP BY 1),
n AS (SELECT event_type, count(DISTINCT user_id) AS d_new
      FROM events GROUP BY 1)
SELECT event_type,
       round(CAST(d_old AS DOUBLE), 6) AS est_old,
       round(CAST(d_new AS DOUBLE), 6) AS est_new,
       round(CAST(d_new AS DOUBLE), 6) AS est_union,
       round(CAST(d_old AS DOUBLE), 6) AS est_intersection,
       round(CAST(d_new - d_old AS DOUBLE), 6) AS est_new_only,
       round(CAST(d_old AS DOUBLE) / d_new, 6) AS jaccard,
       TRUE AS exact_mode
FROM o JOIN n USING (event_type)
ORDER BY event_type
"""
    o["bloom_novelty_documents"] = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents
           WHERE text IS NOT NULL),
ci AS (SELECT doc_id, words, unnest(generate_series(1, len(words) - 12)) AS p
       FROM w WHERE len(words) >= 13),
cg AS (SELECT doc_id, array_to_string(words[p:p+12], ' ') AS gram FROM ci),
bg AS (SELECT DISTINCT gram FROM cg WHERE doc_id < 5),
seen AS (SELECT doc_id, count(*) AS s FROM cg JOIN bg USING (gram)
         GROUP BY 1),
pg AS (SELECT count(DISTINCT doc_id) AS with_grams FROM cg)
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS docs,
       CAST((SELECT count(*) FROM seen) AS BIGINT) AS contaminated_docs,
       CAST(COALESCE((SELECT sum(s) FROM seen), 0) AS BIGINT) AS seen_grams,
       CAST((SELECT with_grams FROM pg)
            - (SELECT count(*) FROM seen) AS BIGINT) AS fully_novel_docs,
       TRUE AS no_false_negatives
"""
    o["winnowing_fingerprints_docs"] = _winnowing_sql(k=5, window=4)
    o["lsh_cosine_topk_embeddings"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       TRUE AS local_equals_broadcast, TRUE AS recall1_ge_0_6
FROM embeddings
"""
    o["ivf_cosine_topk_embeddings"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS ivf_recall1_ge_0_5
FROM embeddings
"""
    o["ann_query_ivf_embeddings"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       TRUE AS self_found, TRUE AS recall1_ge_2_of_3
FROM embeddings
"""
    o["pq_ann_embeddings"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS engine_matches_law,
       TRUE AS self_found, TRUE AS codes_8_bytes
FROM embeddings
"""
    o["ivf_pq_ann_embeddings"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs, TRUE AS engine_matches_law,
       TRUE AS self_found, TRUE AS sidecar_roundtrip
FROM embeddings
"""
    o["ann_query_batch_embeddings"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN (0, 1, 2)),
ranked AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) + 1.0, 6) AS cos1,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv::DOUBLE[]) DESC,
                    e.vec_id ASC) AS rk
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, cos1 FROM ranked WHERE rk <= 5
ORDER BY query_id, vec_id
"""
    o["cosine_topk_embeddings"] = """
WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 40),
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) + 1.0, 6) AS cos1,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC, b.vec_id ASC
         ) AS rk
  FROM v a JOIN v b ON a.vec_id != b.vec_id
)
SELECT vec_id, neighbor, cos1 FROM pairs WHERE rk <= 3 ORDER BY vec_id, neighbor
"""
    o["ann_query_embeddings"] = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) + 1.0, 6) AS cos1
FROM embeddings, q
ORDER BY list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) DESC, vec_id ASC
LIMIT 10
"""
    o["dds_mixed_sign_centered"] = _dds_three_region_oracle(
        "events", "value - 35.0", (0.1, 0.25, 0.5, 0.75, 0.9))
    o["dds_documents_nchars_by_source"] = _dds_oracle(
        "documents", "n_chars", (0.5, 0.9), by="source")
    o["tdigest_kll_quantity_by_returnflag"] = """
SELECT l_returnflag, count(*) AS cnt, TRUE AS tdigest_ok, TRUE AS kll_ok
FROM lineitem GROUP BY 1 ORDER BY 1
"""
    o["tpch_q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2002-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
    o["tpch_q6_forecast_revenue"] = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS cnt
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""
    o["tpch_q3_shipping_priority"] = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(o.o_orderdate AS VARCHAR) AS o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < DATE '1998-06-15'
  AND l.l_shipdate > DATE '1998-06-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""
    o["tpch_q5_local_supplier_volume"] = """
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""
    o["revenue_by_customer_broadcast"] = """
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey < 50
GROUP BY c.c_custkey, c.c_name
ORDER BY c.c_custkey
"""
    o["mg_heavy_users"] = """
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
),
tot AS (SELECT sum(cnt) AS n FROM counts)
SELECT user_id, cnt, TRUE AS found, TRUE AS bound_ok
FROM counts, tot
WHERE cnt > n // 257
ORDER BY user_id
"""
    o["theta_user_overlap_click_view"] = """
WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
     v AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
SELECT round(CAST((SELECT count(*) FROM c) AS DOUBLE), 6) AS users_click,
       round(CAST((SELECT count(*) FROM v) AS DOUBLE), 6) AS users_view,
       round(CAST((SELECT count(*) FROM c WHERE user_id IN (SELECT user_id FROM v)) AS DOUBLE), 6) AS overlap,
       round(CAST((SELECT count(*) FROM (SELECT user_id FROM c UNION SELECT user_id FROM v)) AS DOUBLE), 6) AS union_cnt,
       round(CAST((SELECT count(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM v)) AS DOUBLE), 6) AS click_not_view
"""
    o["theta_orderkeys_estimation"] = """
SELECT count(DISTINCT l_orderkey) AS exact_cnt, TRUE AS theta_ok FROM lineitem
"""
    o["dedup_semantic_embeddings"] = """
WITH RECURSIVE base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 20
  UNION ALL SELECT vec_id + 200000, embedding FROM embeddings WHERE vec_id < 10
),
pairs AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM base a JOIN base b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
),
sym AS (SELECT src, dst FROM pairs UNION SELECT dst AS src, src AS dst FROM pairs),
r(node, comp) AS (
  SELECT vec_id, vec_id FROM base
  UNION
  SELECT s.dst, r.comp FROM r JOIN sym s ON s.src = r.node
)
SELECT b.vec_id, g.comp AS component, (g.comp = b.vec_id) AS keep
FROM base b
JOIN (SELECT node, min(comp) AS comp FROM r GROUP BY node) g ON g.node = b.vec_id
ORDER BY b.vec_id
"""
    o["bloom_semi_join_revenue"] = """
SELECT l.l_returnflag, count(*) AS n_items,
       round(sum(l.l_extendedprice), 2) AS gross
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""
    o["profile_documents_table"] = """
WITH stats AS (
  SELECT 'doc_id' AS "column", count(doc_id) AS cnt,
         count(*) - count(doc_id) AS nulls,
         round(CAST(min(doc_id) AS DOUBLE), 6) AS min,
         round(CAST(max(doc_id) AS DOUBLE), 6) AS max,
         -1.0 AS avg_len, 'ok' AS hll_ok, 'n/a' AS p50_ok
  FROM documents
  UNION ALL
  SELECT 'lang', count(lang), count(*) - count(lang), -1.0, -1.0,
         round(avg(length(lang)), 6), 'ok', 'n/a' FROM documents
  UNION ALL
  SELECT 'n_chars', count(n_chars), count(*) - count(n_chars),
         round(CAST(min(n_chars) AS DOUBLE), 6),
         round(CAST(max(n_chars) AS DOUBLE), 6),
         -1.0, 'ok', 'ok' FROM documents
  UNION ALL
  SELECT 'source', count(source), count(*) - count(source), -1.0, -1.0,
         round(avg(length(source)), 6), 'ok', 'n/a' FROM documents
  UNION ALL
  SELECT 'text', count(text), count(*) - count(text), -1.0, -1.0,
         round(avg(length(text)), 6), 'n/a', 'n/a' FROM documents
)
SELECT * FROM stats ORDER BY "column"
"""
    o["tdigest_direct_scan_lineitem"] = """
SELECT count(*) AS cnt, TRUE AS tdigest_ok FROM lineitem
"""
    o["mg_heavy_langs_by_source"] = """
WITH counts AS (
  SELECT source, lang, count(*) AS cnt
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT source, sum(cnt) AS n FROM counts GROUP BY source
)
SELECT c.source, c.lang, c.cnt, TRUE AS found, TRUE AS bound_ok
FROM counts c JOIN tot t ON c.source = t.source
WHERE c.cnt > t.n // 65
ORDER BY c.source, c.lang
"""
    o["asof_click_purchase"] = """
WITH clicks AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, value AS px FROM events WHERE event_type = 'purchase'
)
SELECT c.user_id, CAST(c.ts AS VARCHAR) AS ts_s,
       round(c.value, 6) AS click_value,
       round(p.px, 6) AS last_purchase
FROM clicks c ASOF JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.user_id, ts_s
"""
    o["interval_join_value_bands"] = """
WITH bands AS (
  SELECT i AS band, i * 15.0 AS lo, i * 15.0 + 25.0 AS hi
  FROM range(20) t(i)
)
SELECT e.event_type, b.band, count(*) AS n_points,
       round(sum(e.value), 2) AS sum_value
FROM events e JOIN bands b ON e.value BETWEEN b.lo AND b.hi
GROUP BY e.event_type, b.band
ORDER BY e.event_type, b.band
"""
    o["bm25_search_documents"] = _bm25_oracle(
        ["spark", "scan", "merge"], k=20)
    o["dds_distance_events"] = _dds_distance_oracle(
        "events", "value", "event_type")
    o["tfidf_keywords_documents"] = """
WITH d AS (
  SELECT doc_id, text FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
nn AS (SELECT count(*) AS n FROM d),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM d),
tf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tfc
  FROM tok WHERE t <> '' GROUP BY doc_id, t
),
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY t),
sc AS (
  SELECT tf.doc_id, tf.t,
         CAST(tf.tfc AS DOUBLE)
           * (ln((1.0 + nn.n) / (1.0 + dfc)) + 1.0) AS score
  FROM tf JOIN dfreq USING (t) CROSS JOIN nn
),
rk AS (
  SELECT doc_id, t, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, t ASC) AS rnk
  FROM sc
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rank, t AS term,
       round(score, 6) AS score
FROM rk WHERE rnk <= 3 ORDER BY doc_id, rank
"""
    o["tpch_q10_returned_items"] = """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
"""
    o["tpch_q14_promo_effect"] = """
SELECT round(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6)
         AS promo_revenue_pct,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate < TIMESTAMP '1996-04-01'
"""
    o["tpch_q12_priority_by_status"] = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_priority,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_priority
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus ORDER BY l.l_linestatus
"""
    o["tpch_q18_large_volume_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(b.total_qty, 2) AS total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
"""
    o["corr_lineitem_columns"] = _corr_oracle(
        "lineitem", ["l_discount", "l_extendedprice", "l_quantity", "l_tax"])
    o["jl_reduce_embeddings"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       TRUE AS parity, TRUE AS norms_ok
FROM embeddings WHERE embedding IS NOT NULL
"""
    o["fd_embeddings_spectrum"] = """
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       TRUE AS counts_agree, TRUE AS bound_ok,
       TRUE AS sv1_ok, TRUE AS sv2_ok, TRUE AS sv3_ok,
       TRUE AS sv4_ok, TRUE AS sv5_ok
FROM embeddings WHERE embedding IS NOT NULL
"""
    return o


def _bm25_oracle(terms: list[str], k1: float = 1.2, b: float = 0.75,
                 k: int = 20) -> str:
    """Full BM25 re-derivation: per-term tf under the split token law,
    one corpus-stats row, the exact fixed-order score expression the
    Spark engine evaluates (pipeline/search.py)."""
    tf_cols = ",\n         ".join(
        f"len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(terms))
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{i}"
        for i in range(len(terms)))
    score = " + ".join(
        f"ln(1.0 + (n - df{i} + 0.5) / (df{i} + 0.5)) * CAST(tf{i} AS DOUBLE)"
        f" * {k1 + 1.0!r} / (CAST(tf{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r}"
        f" + {b!r} * (CAST(dl AS DOUBLE) / avgdl)))"
        for i in range(len(terms)))
    matched = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END"
        for i in range(len(terms)))
    return f"""
WITH d AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl,
         {tf_cols}
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n, avg(dl) AS avgdl, {df_cols} FROM d
)
SELECT doc_id, CAST(dl AS BIGINT) AS dl,
       CAST({matched} AS BIGINT) AS matched_terms,
       round({score}, 6) AS bm25
FROM d, s
ORDER BY bm25 DESC, doc_id ASC
LIMIT {k}
"""


def _corr_oracle(table: str, cols: list[str]) -> str:
    """Long-format pairwise corr re-derivation via DuckDB's native
    corr() (sample Pearson, pairwise-complete — the same law the Spark
    engine assembles from covar_samp/stddev_samp); constant columns ->
    the -2.0 sentinel."""
    selects = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            selects.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,\n"
                f"  COALESCE(round(corr({a}, {b}), 6), -2.0) AS corr,\n"
                f"  (SELECT CAST(count(*) AS BIGINT) FROM {table}) AS n_rows\n"
                f"FROM {table}")
    return "\nUNION ALL\n".join(selects) + "\nORDER BY col_a, col_b"


def _dds_distance_oracle(table: str, col: str, by: str,
                         alpha: float = ALPHA) -> str:
    """KS / W1 between every two groups, re-derived from raw values: the
    same bucket-atom law (key = ceil(ln|x| * ilg), atom at
    exp(key*ln_gamma)*2/(1+gamma), zero bucket at 0.0) and the same CDF
    event-sweep as spark/distance.py."""
    m = LogMapping(alpha)
    ilg = repr(m.inv_ln_gamma)
    gl = repr(1.0 / m.inv_ln_gamma)
    coef = repr(2.0 / (1.0 + m.gamma))
    miv = repr(m.min_indexable_value)
    return f"""
WITH fin AS (
  SELECT {by} AS g, CAST({col} AS DOUBLE) AS x FROM {table}
  WHERE {by} IS NOT NULL AND {col} IS NOT NULL
    AND isfinite(CAST({col} AS DOUBLE))
),
vals AS (
  SELECT g,
    CASE WHEN x >= {miv}
           THEN exp(CAST(ceil(ln(x) * {ilg}) AS BIGINT) * {gl}) * {coef}
         WHEN x <= -{miv}
           THEN -(exp(CAST(ceil(ln(-x) * {ilg}) AS BIGINT) * {gl}) * {coef})
         ELSE 0.0 END AS v
  FROM fin
),
atoms AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM vals GROUP BY g, v),
tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM atoms GROUP BY g),
pairs AS (
  SELECT ta.g AS g_a, ta.n AS n_a, tb.g AS g_b, tb.n AS n_b
  FROM tot ta JOIN tot tb ON ta.g < tb.g
),
ev AS (
  SELECT p.g_a, p.g_b, any_value(p.n_a) AS n_a, any_value(p.n_b) AS n_b, a.v,
         sum(CASE WHEN a.g = p.g_a THEN a.c ELSE 0 END) AS da,
         sum(CASE WHEN a.g = p.g_b THEN a.c ELSE 0 END) AS db
  FROM pairs p JOIN atoms a ON a.g = p.g_a OR a.g = p.g_b
  GROUP BY p.g_a, p.g_b, a.v
),
st AS (
  SELECT g_a, g_b, n_a, n_b, v,
         CAST(sum(da) OVER w AS DOUBLE) / CAST(n_a AS DOUBLE) AS fa,
         CAST(sum(db) OVER w AS DOUBLE) / CAST(n_b AS DOUBLE) AS fb,
         lead(v) OVER (PARTITION BY g_a, g_b ORDER BY v) AS vn
  FROM ev
  WINDOW w AS (PARTITION BY g_a, g_b ORDER BY v ROWS UNBOUNDED PRECEDING)
)
SELECT g_a, g_b, CAST(any_value(n_a) AS BIGINT) AS n_a,
       CAST(any_value(n_b) AS BIGINT) AS n_b,
       round(max(abs(fa - fb)), 6) AS ks,
       round(sum(abs(fa - fb) * COALESCE(vn - v, 0.0)), 6) AS w1
FROM st GROUP BY g_a, g_b ORDER BY g_a, g_b
"""


def _dds_three_region_oracle(table: str, expr: str, qs: tuple[float, ...],
                             alpha: float = ALPHA) -> str:
    """Full reference quantile walk in SQL: negative store (reversed rank,
    negated reconstruction), zero bucket, positive store."""
    m = LogMapping(alpha)
    ilg = repr(m.inv_ln_gamma)
    gl = repr(1.0 / m.inv_ln_gamma)
    coef = repr(2.0 / (1.0 + m.gamma))
    miv = repr(m.min_indexable_value)
    qvals = ", ".join(f"({x!r})" for x in qs)
    cases = ",\n  ".join(
        f"max(CASE WHEN q = {x!r} THEN est END) AS {_QLABELS[x]}" for x in qs)
    return f"""
WITH base AS (SELECT CAST({expr} AS DOUBLE) AS x FROM {table}),
f AS (SELECT x FROM base WHERE isfinite(x)),
tot AS (SELECT count(*) AS n,
               count(*) FILTER (WHERE x <= -{miv}) AS neg_n,
               count(*) FILTER (WHERE abs(x) < {miv}) AS zero_n
        FROM f),
posk AS (SELECT CAST(ceil(ln(x) * {ilg}) AS BIGINT) AS key, count(*) AS c
         FROM f WHERE x >= {miv} GROUP BY 1),
negk AS (SELECT CAST(ceil(ln(-x) * {ilg}) AS BIGINT) AS key, count(*) AS c
         FROM f WHERE x <= -{miv} GROUP BY 1),
poscum AS (SELECT key, sum(c) OVER (ORDER BY key) AS cum FROM posk),
negcum AS (SELECT key, sum(c) OVER (ORDER BY key) AS cum FROM negk),
ranks AS (SELECT qs.q AS q, CAST(floor(qs.q * (n - 1)) AS BIGINT) AS rank,
                 n, neg_n, zero_n
          FROM tot CROSS JOIN (VALUES {qvals}) qs(q)),
est AS (
  SELECT r.q,
    CASE
      WHEN r.rank < r.neg_n THEN
        -(SELECT round(exp(CAST(min(key) AS DOUBLE) * {gl}) * {coef}, 6)
          FROM negcum WHERE cum > r.neg_n - 1 - r.rank)
      WHEN r.rank < r.neg_n + r.zero_n THEN 0.0
      ELSE
        (SELECT round(exp(CAST(min(key) AS DOUBLE) * {gl}) * {coef}, 6)
         FROM poscum WHERE cum > r.rank - r.neg_n - r.zero_n)
    END AS est
  FROM ranks r)
SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS cnt,
  {cases}
FROM est
"""
