from filmdatawarehouse_spark.streaming.windows import (
    session_windows,
    sliding_window_counts,
    stream_events,
    tumbling_window_counts,
)

__all__ = [
    "tumbling_window_counts",
    "sliding_window_counts",
    "session_windows",
    "stream_events",
]
