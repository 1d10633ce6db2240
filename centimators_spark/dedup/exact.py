"""Exact deduplication by content hash.

Plan: md5 the content column (JVM-side), hash-aggregate on the digest.
One shuffle on the 128-bit digest — uniform keys, no skew; map-side
partial aggregation halves the shuffle. At 100 TB this is the canonical
first dedup pass; the digest groupBy never needs the full text to move
(project doc_id + digest before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct content: kept (min) id and duplicate count."""
    return (
        df.select(F.md5(F.col(content_col)).alias("content_md5"), F.col(id_col))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )
