from .agg import SketchAggregator, build_partials, merge_global, merge_grouped, sketch_aggregate
from .ddsketch_agg import DDSketchAggregator, ddsketch_quantiles, ddsketch_state
from .session import get_spark

__all__ = [
    "SketchAggregator",
    "build_partials",
    "merge_global",
    "merge_grouped",
    "sketch_aggregate",
    "DDSketchAggregator",
    "ddsketch_quantiles",
    "ddsketch_state",
    "get_spark",
]
