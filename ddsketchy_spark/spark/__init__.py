from .agg import SketchAggregator, build_partials, merge_global, merge_grouped, sketch_aggregate
from .arrow_scan import build_partials_direct, parquet_splits, sketch_aggregate_parquet
from .checkpoint import checkpointed_sketch_aggregate
from .companions import (
    bloom_state,
    cms_state,
    hll_distinct,
    kll_quantiles,
    misra_gries_state,
    tdigest_quantiles,
    theta_state,
)
from .ddsketch_agg import DDSketchAggregator, ddsketch_quantiles, ddsketch_state
from .functions import register_sql_functions
from .joins import asof_join, bloom_probe_column, bloom_semi_join, interval_join
from .profile import profile_table
from .rollup import read_rollup, read_rollup_states, update_rollup
from .sampling import (
    kmv_sample_native,
    kmv_sample_state,
    weighted_sample_native,
    weighted_sample_state,
)
from .sessions import label_sessions, sessionize
from .session import get_spark

__all__ = [
    "SketchAggregator",
    "build_partials",
    "merge_global",
    "merge_grouped",
    "sketch_aggregate",
    "sketch_aggregate_parquet",
    "build_partials_direct",
    "parquet_splits",
    "checkpointed_sketch_aggregate",
    "DDSketchAggregator",
    "ddsketch_quantiles",
    "ddsketch_state",
    "hll_distinct",
    "cms_state",
    "bloom_state",
    "tdigest_quantiles",
    "kll_quantiles",
    "misra_gries_state",
    "theta_state",
    "register_sql_functions",
    "bloom_semi_join",
    "asof_join",
    "interval_join",
    "profile_table",
    "update_rollup",
    "read_rollup",
    "read_rollup_states",
    "bloom_probe_column",
    "kmv_sample_native",
    "kmv_sample_state",
    "weighted_sample_native",
    "weighted_sample_state",
    "sessionize",
    "label_sessions",
    "get_spark",
]
