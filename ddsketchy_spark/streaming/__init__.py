from .stream_dedup import stream_dedup_exact, stream_dedup_near
from .stream_agg import (
    StreamingSketch,
    stream_ddsketch,
    stream_ddsketch_by_key,
    stream_ddsketch_sessions,
    stream_sketch_by_key,
    stream_ddsketch_windowed,
)

__all__ = [
    "StreamingSketch",
    "stream_ddsketch",
    "stream_ddsketch_by_key",
    "stream_ddsketch_sessions",
    "stream_sketch_by_key",
    "stream_ddsketch_windowed",
    "stream_dedup_exact",
    "stream_dedup_near",
]
