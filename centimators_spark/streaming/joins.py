"""Streaming joins: stream-stream event-time interval join and
stream-static broadcast enrichment.

Stream-stream joins are THE stateful streaming primitive Spark gives
for correlating two live feeds (clicks↔impressions, views↔purchases):
both sides buffer state, the event-time range condition + watermarks
bound how long each side is retained, and late rows beyond the
watermark are dropped deterministically. The same function applied to
two batch frames degenerates to a plain range-condition join — the
unified-model property every operator in streaming/ keeps, and what
lets the batch differential test (and a DuckDB oracle) pin the
semantics of the incremental execution.

State sizing at scale: each side keeps ``within`` + watermark-delay
worth of rows per key in the state store; the shuffle is on the join
key, so hot users skew state the same way they skew a batch join
(salt upstream or tighten ``within`` for such keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_events(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "rts",
    within: str = "30 minutes",
    watermark_delay: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows with the same ``key`` whose
    timestamp falls in ``[left_ts - within, left_ts]`` (right happens
    at-or-before left, within the horizon).

    Streaming inputs: both sides get event-time watermarks
    (``watermark_delay``); Spark derives state-eviction bounds from the
    range condition. Batch inputs: identical join, no state. The right
    frame must already use distinct column names (rename its timestamp
    to ``right_ts`` before calling; Spark stream-stream joins cannot
    alias conflicting columns post-hoc).

    how: 'inner' or 'leftOuter' (left rows with no partner emit once
    with nulls after the watermark passes — streaming outer joins
    REQUIRE the watermark to know a partner can no longer arrive).
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be inner|leftOuter, got {how!r}")
    l = left
    r = right
    if l.isStreaming or r.isStreaming:
        l = l.withWatermark(left_ts, watermark_delay)
        r = r.withWatermark(right_ts, watermark_delay)
    rkey = f"__r_{key}"
    r = r.withColumnRenamed(key, rkey)
    cond = (
        (l[key] == r[rkey])
        & (r[right_ts] >= l[left_ts] - F.expr(f"INTERVAL {within}"))
        & (r[right_ts] <= l[left_ts])
    )
    return l.join(r, cond, how).drop(rkey)


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: the static side is re-read per
    micro-batch (picking up dimension updates) and broadcast — the
    stream side never shuffles. The standard pattern for attaching
    user/account/config attributes to a live feed."""
    return stream.join(F.broadcast(dim), on, how)
