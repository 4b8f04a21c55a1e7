from .events import (
    read_events,
    hourly_stats,
    sessionize,
    event_type_pivot,
    attribution_batch,
    hourly_stats_stream,
    session_window_stream,
    running_user_totals_stream,
    purchase_attribution_stream,
)

__all__ = [
    "read_events",
    "hourly_stats",
    "sessionize",
    "event_type_pivot",
    "attribution_batch",
    "hourly_stats_stream",
    "session_window_stream",
    "running_user_totals_stream",
    "purchase_attribution_stream",
]
