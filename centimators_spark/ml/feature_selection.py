"""Feature selection by mutual information — rank features by
MI(binned feature; binned target), the standard nonlinear dependence
screen a training pipeline runs before fitting (catches relationships
Pearson/Spearman miss, e.g. V-shapes).

Exactness (the engine's micro-unit convention): cell/marginal counts
are exact integers from ONE aggregation per feature; each cell's
pointwise term ln(n·c_xy/(c_x·c_y)) — an ln of a ratio of exact
integers — rounds to 6dp micro-units and multiplies by its exact count,
so the MI sum is integer arithmetic until one final division and the
DuckDB mirror (mutual_information_oracle_sql) is bit-exact.

Binning reuses the pinned-edge convention: callers bin continuous
columns first (operators/encoding.quantile_bin, or any integer-valued
discretization); this module treats inputs as categorical codes.

Plan: per feature one (x_bin, y_bin) count aggregation (map-side
partial); marginals come from window sums over the tiny cell frame
(cells ≤ |X bins|·|Y bins|, never data-sized). Features are
independent — Spark runs their aggregations as one union job.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MI_SCALE = 1_000_000


def mutual_information(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    *,
    digits: int = 6,
) -> DataFrame:
    """MI in nats between each (integer-valued / categorical) feature
    and the target: returns (feature, n, mi) sorted by mi desc. Rows
    with a null feature or target are excluded per feature (standard
    pairwise-complete convention)."""
    if not feature_cols:
        raise ValueError("feature_cols must be non-empty")
    from pyspark.sql import Window

    outs = []
    for fc in feature_cols:
        cells = (
            df.where(F.col(fc).isNotNull() & F.col(target_col).isNotNull())
            .groupBy(
                F.col(fc).cast("string").alias("xb"),
                F.col(target_col).cast("string").alias("yb"),
            )
            .agg(F.count(F.lit(1)).alias("cxy"))
        )
        wx = Window.partitionBy("xb")
        wy = Window.partitionBy("yb")
        # marginals via windows over the CELL table (≤ bins², tiny);
        # the grand total joins back as a broadcast scalar — no
        # unpartitioned window anywhere, even if a caller passes an
        # unbinned high-cardinality pair
        n_total = cells.agg(F.sum("cxy").alias("n"))
        t = cells.select(
            "cxy",
            F.sum("cxy").over(wx).alias("cx"),
            F.sum("cxy").over(wy).alias("cy"),
        ).crossJoin(F.broadcast(n_total))
        term_u = (
            F.col("cxy")
            * F.round(
                F.log(
                    (F.col("n") * F.col("cxy")).cast("double")
                    / (F.col("cx") * F.col("cy")).cast("double")
                )
                * MI_SCALE
            ).cast("long")
        )
        outs.append(
            t.agg(
                F.first(F.col("n")).alias("n"),
                F.sum(term_u).alias("s"),
            ).select(
                F.lit(fc).alias("feature"),
                F.col("n"),
                F.round(
                    F.col("s").cast("double")
                    / F.col("n").cast("double")
                    / MI_SCALE,
                    digits,
                ).alias("mi"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy(F.col("mi").desc(), F.col("feature").asc())


def mutual_information_oracle_sql(
    table: str,
    feature_sqls: dict[str, str],
    target_sql: str,
) -> str:
    """DuckDB mirror of :func:`mutual_information`.
    ``feature_sqls`` maps output feature name → SQL expression."""
    parts = []
    for name, expr in feature_sqls.items():
        parts.append(f"""
        SELECT '{name}' AS feature, CAST(n AS BIGINT) AS n,
            round(CAST(s AS DOUBLE)
            / CAST(n AS DOUBLE) / {MI_SCALE}, 6) AS mi
        FROM (
          SELECT any_value(n) AS n, sum(cxy * CAST(round(ln(
                   CAST(n * cxy AS DOUBLE) / CAST(cx * cy AS DOUBLE))
                   * {MI_SCALE}) AS BIGINT)) AS s
          FROM (
            SELECT cxy,
                   sum(cxy) OVER (PARTITION BY xb) AS cx,
                   sum(cxy) OVER (PARTITION BY yb) AS cy,
                   sum(cxy) OVER () AS n
            FROM (
              SELECT CAST({expr} AS VARCHAR) AS xb,
                     CAST({target_sql} AS VARCHAR) AS yb,
                     count(*) AS cxy
              FROM {table}
              WHERE ({expr}) IS NOT NULL AND ({target_sql}) IS NOT NULL
              GROUP BY 1, 2
            )
          )
        )""")
    return " UNION ALL ".join(parts) + " ORDER BY mi DESC, feature ASC"
