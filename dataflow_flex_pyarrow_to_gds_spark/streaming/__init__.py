from .events import (
    hourly_stats,
    sessionize,
    event_type_pivot,
    hourly_stats_stream,
    session_window_stream,
)

__all__ = [
    "hourly_stats",
    "sessionize",
    "event_type_pivot",
    "hourly_stats_stream",
    "session_window_stream",
]
