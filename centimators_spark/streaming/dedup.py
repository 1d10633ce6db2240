"""Streaming deduplication — the streaming face of dedup/exact.py.

``stream_exact_dedup`` keeps the first occurrence of each content
digest. With a watermark + ``dropDuplicatesWithinWatermark`` the
dedup state is BOUNDED (keys older than the watermark are evicted) —
the only formulation that survives an unbounded 100 TB stream; the
unbounded variant (exact across all time) is kept for bounded
backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_exact_dedup(
    events: DataFrame,
    content_cols: list[str],
    ts_col: str = "ts",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """Drop rows whose content digest was already seen (within the
    watermark horizon on streams; globally when watermark=None).

    The digest is md5 over ``to_json(struct(cols))``: concat_ws SKIPS
    null columns, so (NULL,'a') and ('a',NULL) would collide — JSON
    keeps the column names, making every null layout distinct."""
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in content_cols])))
    with_digest = events.withColumn("__digest", digest)
    if watermark is not None and events.isStreaming:
        return (
            with_digest.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["__digest"])
            .drop("__digest")
        )
    return with_digest.dropDuplicates(["__digest"]).drop("__digest")
