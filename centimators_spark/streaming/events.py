"""Structured Streaming operators for the events table.

The transformations are written against the unified DataFrame model:
the SAME function works on a batch frame and on a ``readStream`` frame
(Spark's batch/streaming unification), so the DuckDB oracle checks the
batch semantics and the streaming tests check incremental execution
(availableNow trigger → memory sink) produces identical results.

Event-time correctness: ``withWatermark`` bounds state for late data;
tumbling windows via ``F.window``; session windows via
``F.session_window`` (gap-merged, end-exclusive); arbitrary stateful
processing via ``applyInPandasWithState``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events parquet as a file-source stream (schema pinned — streaming
    sources cannot infer). When the source file stores TIMESTAMP(NANOS),
    Spark only reads it via the session-wide legacy nanosAsLong conf —
    set ONLY in that case (it changes how every later parquet read in
    the session decodes nanos, and the lazy stream needs it at scan
    time, so it cannot be restored here); we convert the longs to µs."""
    from centimators_spark.io import _ts_unit_is_nanos

    path = f"{sf_dir}/events.parquet"
    if _ts_unit_is_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(path).schema
    # file stream source needs a directory; glob-filter to the events file
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # watermarks require TIMESTAMP (with local tz); the session tz is
        # pinned UTC so this cast is a pure type change, not a value shift
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window per event_type: count, sum(value).
    Works identically on batch and streaming inputs; on streams the
    watermark bounds window state."""
    e = events
    if watermark is not None and e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Session windows per user (gap-merged): session start/end epoch,
    event count, total value."""
    e = events
    if watermark is not None and e.isStreaming:
        e = e.withWatermark("ts", watermark)
    return (
        e.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("s.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def session_ids(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    by: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Row-level session labeling — the assignment sibling of the
    ``sessionize`` aggregate: a new session starts when the gap from the
    previous event (per ``by`` key, ordered by (ts, id)) exceeds
    ``gap_seconds``; ``session_idx`` is the 1-based running count of
    session starts. One window shuffle; same gap semantics as
    ``F.session_window`` (gap strictly greater ⇒ new session)."""
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(ts_col, id_col)
    prev = F.lag(F.unix_timestamp(F.col(ts_col))).over(w)
    is_new = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - prev) > gap_seconds)
    ).cast("long")
    run = Window.partitionBy(by).orderBy(ts_col, id_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.select(
        id_col,
        by,
        F.unix_timestamp(F.col(ts_col)).alias("ts_epoch"),
        F.sum(is_new).over(run).alias("session_idx"),
    )


# carried across micro-batches: last event time seen + current session index
_SESSION_IDS_STATE = StructType(
    [StructField("last_ts", LongType()), StructField("cur_idx", LongType())]
)


def session_ids_stateful(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    by: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming twin of ``session_ids`` — the row-level session labeler
    as an ``applyInPandasWithState`` operator: per user, state carries
    (last event epoch, current session index) across micro-batches, so
    incremental execution emits the same labels the batch window query
    computes. Rows are ordered (ts, id) within each batch — the same tie
    order as the batch sibling.

    Ordering contract: event time must be NON-DECREASING per key across
    micro-batches (the standard per-key-ordered source, e.g. a keyed
    Kafka partition) for exact batch parity. A late row that violates
    it is labeled into the CURRENT session and state never regresses
    (last_ts keeps its max), so one straggler cannot corrupt subsequent
    labels; exact late-data reordering would require buffering events in
    state until a watermark, which this operator deliberately does not
    do. State is one (long, long) pair per key; key cardinality bounds
    memory — add a timeout/TTL policy upstream for unbounded key spaces.
    """
    import numpy as np

    narrow = events.select(
        F.col(id_col).alias("event_id"),
        F.col(by).alias("user_id"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_epoch"),
    )
    # derive output schema from the actual key/id types (hardcoding
    # LongType would break string user/event ids at Arrow conversion)
    out_schema = StructType(
        [
            narrow.schema["event_id"],
            narrow.schema["user_id"],
            StructField("ts_epoch", LongType()),
            StructField("session_idx", LongType()),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, cur = state.get if state.exists else (None, 0)
        pdf = pd.concat(list(pdfs))
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["ts_epoch", "event_id"], kind="mergesort")
        ts = pdf["ts_epoch"].to_numpy(dtype=np.int64)
        gap_prev = np.empty(len(ts), dtype=np.int64)
        gap_prev[1:] = ts[1:] - ts[:-1]
        gap_prev[0] = gap_seconds + 1 if last_ts is None else ts[0] - last_ts
        idx = cur + np.cumsum(gap_prev > gap_seconds)
        # never regress on out-of-order micro-batches (see docstring)
        new_last = int(ts[-1]) if last_ts is None else max(int(ts[-1]), last_ts)
        state.update((new_last, int(idx[-1])))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "ts_epoch": ts,
                "session_idx": idx,
            }
        )

    return narrow.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_SESSION_IDS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RUNNING_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("total", LongType()),
    ]
)
_STATE_SCHEMA = StructType([StructField("total", LongType())])


def stateful_running_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    per-event-type totals across micro-batches — the engine's extension
    point for operators the built-ins can't express."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"event_type": [key[0]], "total": [total]})

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------- session windows

#: Key used for the watermark-flush sentinel event. Real user ids in the
#: synthetic corpus are >= 0; any pipeline adopting the flush pattern
#: must pick a key value outside its real domain.
SENTINEL_USER_ID = -1


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    by: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Native ``F.session_window`` aggregation (per-key gap-merged
    sessions with start/end and event count). Batch/streaming unified.

    Streaming contract (append mode): a session row is emitted exactly
    once, when the watermark passes its close time. Consequently a
    bounded replay (``availableNow``) HOLDS BACK every session whose
    close time lies within ``watermark`` of the stream's max event time
    — there is no later event to advance the watermark past them. For a
    complete drain, union the source with a far-future sentinel event
    (:func:`flushed_session_windows`); in production the same role is
    played by the continuous arrival of new events.
    """
    e = events
    if watermark is not None and e.isStreaming:
        e = e.withWatermark(ts_col, watermark)
    return (
        e.groupBy(by, F.session_window(ts_col, gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            by,
            F.col("session_window.start").alias("s"),
            F.col("session_window.end").alias("e"),
            "n_events",
        )
    )


def flushed_session_windows(
    spark: SparkSession,
    sf_dir: str,
    sentinel_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows over the events stream with a watermark-flush
    sentinel: a single synthetic event 30 days past the corpus horizon
    is written to ``sentinel_dir`` and unioned into the stream, so the
    final no-data micro-batch advances the watermark beyond every real
    session's close time and append mode emits ALL real sessions. The
    sentinel's own (held-back) session is excluded by key.

    This is the streaming-side twin of the batch ``session_window``
    query: incremental execution == batch aggregation, exactly.

    Append-mode contract: the sentinel's OWN session is never emitted —
    its close time (sentinel_ts + gap) always lies inside the final
    watermark hold-back (final watermark = sentinel_ts − watermark), so
    no explicit key filter is needed. Deliberately so: a
    ``user_id != SENTINEL`` predicate on the grouping key gets pushed
    by Catalyst below the EventTimeWatermark operator down to the file
    scan, which removes the sentinel row BEFORE watermark tracking sees
    it and silently defeats the flush (observed: the sentinel source
    reads 0 rows). Callers using update/complete output modes must
    filter ``user_id != SENTINEL_USER_ID`` on the SINK side instead.
    """
    from centimators_spark.io import load_table

    batch = load_table(spark, sf_dir, "events")
    horizon = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]
    sentinel = (
        batch.limit(1)
        .withColumn("event_id", F.lit(-1).cast("long"))
        .withColumn("user_id", F.lit(SENTINEL_USER_ID).cast("long"))
        .withColumn(
            "ts",
            F.lit(horizon).cast("timestamp") + F.expr("INTERVAL 30 DAYS"),
        )
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(sentinel_dir)

    stream = read_events_stream(spark, sf_dir)
    sent_stream = (
        spark.readStream.schema(stream.schema).parquet(sentinel_dir)
    )
    unioned = stream.unionByName(sent_stream)
    return session_windows(unioned, gap=gap, watermark=watermark)
