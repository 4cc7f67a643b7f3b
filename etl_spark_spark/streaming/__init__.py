from .dedup import run_stream_near_dup
from .quality import run_stream_quality_gate
from .stateful import stream_session_agg, stream_user_totals
from .stream import (
    run_foreach_batch_upsert,
    stream_dedup_events,
    stream_enrich_static,
    stream_events_tumbling,
    write_stream_files,
)
from .windows import sessionize_batch, sliding_agg, tumbling_agg

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "sessionize_batch",
    "stream_events_tumbling",
    "stream_session_agg",
    "stream_user_totals",
    "write_stream_files",
    "stream_dedup_events",
    "stream_enrich_static",
    "run_foreach_batch_upsert",
    "run_stream_quality_gate",
    "run_stream_near_dup",
]
