"""Classical additive seasonal decomposition (trend / seasonal /
residual) for grouped panels — the moving-average flavor of
`statsmodels.tsa.seasonal_decompose`, re-expressed as one window plus
one broadcast-back aggregate, with carriers arranged so every shared
quantity is an exact integer sum:

* trend_t  = centered moving average over an odd ``window`` w
  (full frames only — edge rows get null, statsmodels parity);
* seasonal = per-(group, period) mean of the detrended series. The
  detrended value ``v − S/w`` is carried as the integer numerator
  ``num = w·v − S`` so the per-period mean is the single division
  ``Σnum / (w·n)`` — no averaging of already-divided floats, hence no
  summation-order sensitivity cross-engine;
* residual = num/w − seasonal (two fixed-order IEEE ops).

Scale shape: ONE WindowExec on the (group, order) sort for S and the
frame count; the per-(group, period) seasonal table is |groups|·|periods|
rows — broadcast back, no second shuffle of the panel. The reference
has no decomposition operator; this extends its ordered-transformer
family (`feature_transformers/time_series.py`) with the standard
seasonality screen run before fitting on calendar-driven panels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def seasonal_decompose(
    df: DataFrame,
    *,
    group_col: str,
    order_col: str,
    value_col: str,
    period: Column,
    window: int = 13,
) -> DataFrame:
    """Adds ``trend``, ``seasonal``, ``residual`` (and the period as
    ``__period``) to the panel. ``value_col`` must be integer-valued
    (whole units / cents carriers) for the cross-engine-exact seasonal
    mean; ``window`` must be odd so the moving average is centered.
    Rows whose centered frame is incomplete get null trend/residual;
    a period with no complete-frame rows gets null seasonal."""
    if window % 2 != 1:
        raise ValueError(f"window must be odd, got {window}")
    k = window // 2
    g, o, v = group_col, order_col, value_col
    w1 = Window.partitionBy(g).orderBy(o).rowsBetween(-k, k)
    full = F.count(v).over(w1) == window
    base = df.withColumn("__S", F.sum(v).over(w1)).withColumn(
        "__num", F.when(full, window * F.col(v) - F.col("__S"))
    ).withColumn("__period", period)
    # the windowed panel is aggregated-small (one row per group ×
    # order tick) but its lineage usually holds the full fact scan +
    # shuffle, and it feeds BOTH the seasonal aggregation and the
    # output join (measured: exchange reuse does not fire across the
    # two sides) — cut it once, the ic_decay/triangle_count
    # aggregated-small-table discipline
    base = base.localCheckpoint(eager=True)
    seas = base.groupBy(g, "__period").agg(
        F.sum("__num").alias("__sn"), F.count("__num").alias("__nn")
    )
    seasonal = F.when(
        F.col("__nn") > 0, F.col("__sn") / (window * F.col("__nn"))
    )
    out = base.join(
        F.broadcast(seas.withColumn("seasonal", seasonal).drop("__sn", "__nn")),
        [g, "__period"],
    )
    return (
        out.withColumn(
            "trend", F.when(F.col("__num").isNotNull(), F.col("__S") / window)
        )
        .withColumn(
            "residual",
            F.col("__num") / window - F.col("seasonal"),
        )
        .drop("__S", "__num")
    )


def seasonal_decompose_oracle_sql(
    table_sql: str,
    group_sql: str,
    order_sql: str,
    value_sql: str,
    period_sql: str,
    window: int = 13,
) -> str:
    """DuckDB twin of :func:`seasonal_decompose` — identical frame,
    integer numerator, and division order. Exposes (grp, ord, v,
    period, trend, seasonal, residual); callers project/round."""
    k = window // 2
    return f"""
        WITH base AS (
          SELECT {group_sql} AS grp, {order_sql} AS ord,
                 {value_sql} AS v, {period_sql} AS period,
                 sum({value_sql}) OVER w AS S,
                 CASE WHEN count({value_sql}) OVER w = {window}
                      THEN {window} * {value_sql} - sum({value_sql}) OVER w
                 END AS num
          FROM {table_sql}
          WINDOW w AS (PARTITION BY {group_sql} ORDER BY {order_sql}
                       ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING)
        ), seas AS (
          SELECT grp, period,
                 CASE WHEN count(num) > 0
                      THEN sum(num) / ({window} * count(num))
                 END AS seasonal
          FROM base GROUP BY grp, period
        )
        SELECT b.grp, b.ord, b.v, b.period,
               CASE WHEN b.num IS NOT NULL THEN b.S / {window} END AS trend,
               s.seasonal,
               b.num / {window} - s.seasonal AS residual
        FROM base b JOIN seas s ON b.grp = s.grp AND b.period = s.period
    """
