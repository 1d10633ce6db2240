"""Exact per-group embedding centroids — the mean-vector building
block behind class prototypes, IVF/k-means seeding, SemDeDup cluster
representatives, and nearest-centroid classification.

Spark shape (holds at 100 TB): one map-side ``posexplode`` turns each
vector into (group, pos, component) rows — no join, no driver collect —
and ONE grouped aggregation sums per (group, pos). The output is
LONG-form (group, pos, centroid, n): d rows per group, which is what a
broadcast-back scorer consumes anyway (and what keeps the driver
contract on scalar columns).

Exactness: components are quantized to integer micro-units
(round(v·10^q) → BIGINT) before summing, so the sums are exact and
partition-order independent — the float mean is ONE division at the
end, rounded identically in the DuckDB mirror. Max safe scale: 2^63 /
(n_rows · 10^q) per component; at q=6 that is ~9.2e12 unit-normalized
rows per group.

No reference counterpart — §2.3 similarity-surface extension beside
ann.py / pq.py (whose IVF centroids are driver-side KMeans; this is
the distributed exact form for KNOWN groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_centroids(
    df: DataFrame,
    group_col: str,
    *,
    vec_col: str = "embedding",
    quant_dp: int = 6,
    round_dp: int = 6,
) -> DataFrame:
    """Per-group exact mean vector, long-form output
    (group, pos, centroid, n) with ``pos`` 1-based. NULL vectors are
    excluded; ``n`` counts the vectors contributing to the group."""
    scale = float(10 ** quant_dp)
    exploded = df.where(F.col(vec_col).isNotNull()).select(
        F.col(group_col),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda v: F.round(v.cast("double") * scale).cast("long"),
            )
        ).alias("pos0", "q"),
    )
    agg = exploded.groupBy(group_col, (F.col("pos0") + 1).alias("pos")).agg(
        F.sum("q").alias("__s"), F.count(F.lit(1)).alias("n")
    )
    return agg.select(
        group_col,
        "pos",
        F.round(
            F.col("__s").cast("double") / F.col("n").cast("double") / scale,
            round_dp,
        ).alias("centroid"),
        "n",
    )


def group_centroids_oracle_sql(
    table_sql: str,
    group_sql: str,
    *,
    vec_sql: str = "embedding",
    quant_dp: int = 6,
    round_dp: int = 6,
    group_name: str = "grp",
) -> str:
    """DuckDB mirror of :func:`group_centroids` (identical micro-unit
    quantization, integer sums, single rounded division)."""
    scale = float(10 ** quant_dp)
    return f"""
        WITH e AS (
          SELECT {group_sql} AS {group_name},
                 generate_subscripts({vec_sql}, 1) AS pos,
                 CAST(round(CAST(unnest({vec_sql}) AS DOUBLE) * {scale!r})
                      AS BIGINT) AS q
          FROM {table_sql}
          WHERE {vec_sql} IS NOT NULL
        )
        SELECT {group_name}, CAST(pos AS INTEGER) AS pos,
               round(CAST(sum(q) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                     / {scale!r}, {round_dp}) AS centroid,
               CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY {group_name}, pos
    """
