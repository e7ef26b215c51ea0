"""ddsketchy_spark — a PySpark-native distributed sketch library.

Core sketches (DDSketch, HLL, Count-Min, t-digest, KLL, Bloom) implemented as
mergeable two-phase aggregates: vectorized NumPy/Arrow state building per
partition, associative tree-merge of serialized state blobs, driver- or
UDF-side estimators. Reference semantics: pmcgleenon/ddsketchy (DDSketch) and
the published papers for the companions.
"""

from .core.ddsketch import DDSketch
from .core.mapping import LogMapping

__all__ = ["DDSketch", "LogMapping"]
__version__ = "0.1.0"
