from .windows import sessionize_batch, sliding_agg, tumbling_agg
from .stream import stream_events_tumbling

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "sessionize_batch",
    "stream_events_tumbling",
]
