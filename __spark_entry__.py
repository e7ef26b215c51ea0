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
_QLABELS = {0.5: "p50", 0.9: "p90", 0.95: "p95", 0.99: "p99", 0.999: "p999"}


def _r6(c):
    """Round half-away-from-zero to 6 dp (matches DuckDB round() on doubles);
    our estimates here are positive."""
    return (F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).cast("double")


def _load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
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
) -> DataFrame:
    df = _load(spark, sf_dir, table)
    labels = [_QLABELS[q] for q in qs]
    if by:
        res = ddsketch_quantiles(df, col, by=[by], alpha=alpha, quantiles=qs)
        sel = [F.col(by), F.col("count").alias("cnt")]
        sel += [_r6(F.col(quantile_label(q))).alias(lab) for q, lab in zip(qs, labels)]
        return res.select(*sel).orderBy(by)
    out = ddsketch_quantiles(df, col, alpha=alpha, quantiles=qs)
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
    cases = ",\n  ".join(
        f"max(CASE WHEN q = {q!r} THEN round(exp(CAST(key AS DOUBLE) * {gl}) * {coef}, 6) END)"
        f" AS {_QLABELS[q]}"
        for q in qs
    )
    order = f"ORDER BY {g}" if g else ""
    return f"""
WITH base AS (
  SELECT {gsel}CAST({col} AS DOUBLE) AS x FROM {table}
),
k AS (
  SELECT {gsel}CAST(ceil(ln(x) * {ilg}) AS BIGINT) AS key, count(*) AS c
  FROM base WHERE isfinite(x) AND x >= {miv}
  GROUP BY ALL
),
cum AS (
  SELECT {gsel}key,
         sum(c) OVER ({gpart} ORDER BY key) AS cum,
         sum(c) OVER ({gpart}) AS n
  FROM k
),
kq AS (
  SELECT {gsel}qs.q AS q, min(key) AS key, any_value(n) AS n
  FROM cum CROSS JOIN (VALUES {qvals}) qs(q)
  WHERE cum.cum > CAST(floor(qs.q * (n - 1)) AS BIGINT)
  GROUP BY {gby} qs.q
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
    o["exact_events_count_by_type"] = """
SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users
FROM events GROUP BY event_type ORDER BY event_type
"""
    return o
