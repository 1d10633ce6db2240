from centimators_spark.streaming.dedup import stream_exact_dedup
from centimators_spark.streaming.joins import enrich_stream_static, interval_join_events
from centimators_spark.streaming.sink import continuous_aggregate, grouped_overwrite_sink
from centimators_spark.streaming.anomaly import ewma_anomaly_stream
from centimators_spark.streaming.sketch import (
    cms_cells_stream,
    hll_registers_stream,
    read_documents_stream,
)
from centimators_spark.streaming.drift import reference_histogram, windowed_psi
from centimators_spark.streaming.events import (
    windowed_event_counts,
    sessionize,
    read_events_stream,
    stateful_running_counts,
    session_ids,
    session_ids_stateful,
    session_windows,
    flushed_session_windows,
)

__all__ = [
    "windowed_event_counts",
    "sessionize",
    "read_events_stream",
    "stateful_running_counts",
    "session_ids",
    "session_ids_stateful",
    "session_windows",
    "flushed_session_windows",
    "stream_exact_dedup",
    "interval_join_events",
    "enrich_stream_static",
    "continuous_aggregate",
    "grouped_overwrite_sink",
    "cms_cells_stream",
    "hll_registers_stream",
    "read_documents_stream",
    "ewma_anomaly_stream",
    "reference_histogram",
    "windowed_psi",
]
