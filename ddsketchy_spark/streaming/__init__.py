from .stream_agg import StreamingSketch, stream_ddsketch

__all__ = ["StreamingSketch", "stream_ddsketch"]
