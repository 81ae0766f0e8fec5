from .ops import (  # noqa: F401
    events_stream,
    run_to_memory,
    tumbling_window_avg,
    sliding_window_avg,
    session_window_stats,
    dedup_within_watermark,
)
