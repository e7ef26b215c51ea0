from .ddsketch import DDSketch
from .mapping import LogMapping
from .store import Store

__all__ = ["DDSketch", "LogMapping", "Store"]
