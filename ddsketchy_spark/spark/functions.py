"""SQL-callable sketch functions over serialized state blobs.

``register_sql_functions(spark)`` registers vectorized pandas UDFs so plain
SQL users can query sketch states produced by the aggregates (keep_state=True)
or loaded from checkpoints:

    SELECT source, ddsketch_quantile(state, 0.99) AS p99,
           ddsketch_count(state) AS cnt
    FROM per_source_states

All UDFs are Arrow-batched (one deserialization per state blob per batch,
NumPy estimator inside) — states are ~KB, so these run at plan speed.
UDF objects are built lazily: Spark requires an active session to create a
pandas_udf, so use ``sketch_udfs()`` / ``register_sql_functions(spark)``
rather than importing decorated globals.
"""

from __future__ import annotations

from functools import lru_cache

from ..core.ddsketch import DDSketch
from ..core.hll import HyperLogLog
from ..core.kll import KLLSketch
from ..core.tdigest import TDigest
from ..core.theta import ThetaSketch


@lru_cache(maxsize=1)
def sketch_udfs() -> dict:
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _dds_quantile(state, q):
        out = []
        for blob, qq in zip(state, q):
            if blob is None:
                out.append(None)
                continue
            sk = DDSketch.from_bytes(bytes(blob))
            out.append(None if sk.count == 0 else sk.quantile(float(qq)))
        return pd.Series(out, dtype="float64")

    def _dds_cdf(state, x):
        out = []
        for blob, xx in zip(state, x):
            if blob is None or xx is None:
                out.append(None)
                continue
            sk = DDSketch.from_bytes(bytes(blob))
            out.append(None if sk.count == 0 else sk.cdf(float(xx)))
        return pd.Series(out, dtype="float64")

    def _dds_rank(state, x):
        out = []
        for blob, xx in zip(state, x):
            out.append(None if blob is None or xx is None else
                       DDSketch.from_bytes(bytes(blob)).rank(float(xx)))
        return pd.Series(out, dtype="Int64")

    def _dds_count(state):
        return pd.Series(
            [None if b is None else DDSketch.from_bytes(bytes(b)).count for b in state],
            dtype="Int64",
        )

    def _dds_sum(state):
        return pd.Series(
            [None if b is None else DDSketch.from_bytes(bytes(b)).sum for b in state],
            dtype="float64",
        )

    def _dds_merge_pair(a, b):
        out = []
        for x, y in zip(a, b):
            if x is None:
                out.append(None if y is None else bytes(y))
            elif y is None:
                out.append(bytes(x))
            else:
                out.append(DDSketch.from_bytes(bytes(x))
                           .merge(DDSketch.from_bytes(bytes(y))).to_bytes())
        return pd.Series(out)

    def _hll_card(state):
        return pd.Series(
            [None if b is None else HyperLogLog.from_bytes(bytes(b)).cardinality()
             for b in state],
            dtype="Int64",
        )

    def _td_quantile(state, q):
        return pd.Series(
            [None if b is None else TDigest.from_bytes(bytes(b)).quantile(float(qq))
             for b, qq in zip(state, q)],
            dtype="float64",
        )

    def _kll_quantile(state, q):
        return pd.Series(
            [None if b is None else KLLSketch.from_bytes(bytes(b)).quantile(float(qq))
             for b, qq in zip(state, q)],
            dtype="float64",
        )

    def _theta_estimate(state):
        return pd.Series(
            [None if b is None else ThetaSketch.from_bytes(bytes(b)).estimate()
             for b in state],
            dtype="float64",
        )

    def _theta_binop(op):
        def fn(a, b):
            out = []
            for x, y in zip(a, b):
                if x is None or y is None:
                    out.append(None)
                    continue
                sa = ThetaSketch.from_bytes(bytes(x))
                sb = ThetaSketch.from_bytes(bytes(y))
                out.append(op(sa, sb))
            return pd.Series(out, dtype="float64")
        return fn

    _theta_inter = _theta_binop(lambda a, b: a.intersect(b).estimate())
    _theta_anotb = _theta_binop(lambda a, b: a.a_not_b(b).estimate())
    _theta_jac = _theta_binop(ThetaSketch.jaccard)

    return {
        "ddsketch_quantile": pandas_udf(_dds_quantile, "double"),
        "ddsketch_cdf": pandas_udf(_dds_cdf, "double"),
        "ddsketch_rank": pandas_udf(_dds_rank, "long"),
        "ddsketch_count": pandas_udf(_dds_count, "long"),
        "ddsketch_sum": pandas_udf(_dds_sum, "double"),
        "ddsketch_merge_pair": pandas_udf(_dds_merge_pair, "binary"),
        "hll_cardinality": pandas_udf(_hll_card, "long"),
        "tdigest_quantile": pandas_udf(_td_quantile, "double"),
        "kll_quantile": pandas_udf(_kll_quantile, "double"),
        "theta_estimate": pandas_udf(_theta_estimate, "double"),
        "theta_intersect_estimate": pandas_udf(_theta_inter, "double"),
        "theta_a_not_b_estimate": pandas_udf(_theta_anotb, "double"),
        "theta_jaccard": pandas_udf(_theta_jac, "double"),
    }


def register_sql_functions(spark) -> None:
    for name, fn in sketch_udfs().items():
        spark.udf.register(name, fn)
