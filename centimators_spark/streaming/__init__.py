from centimators_spark.streaming.events import (
    windowed_event_counts,
    sessionize,
    read_events_stream,
    stateful_running_counts,
)

__all__ = [
    "windowed_event_counts",
    "sessionize",
    "read_events_stream",
    "stateful_running_counts",
]
