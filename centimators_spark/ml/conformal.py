"""Split conformal prediction intervals — distribution-free coverage
for any point predictor: calibrate the k-th order statistic of
absolute residuals (k = ⌈(n+1)(1−α)⌉, the finite-sample-corrected
conformal quantile), per era or globally, and attach ±q intervals to
new predictions. The standard post-hoc uncertainty wrapper for the
engine's regressors (LinearRegressor, KerasEstimator scoring).

Exactness: the conformal quantile is a pure ORDER STATISTIC — the
value at rank k of the residual multiset — which is
partition-order-independent by construction (ties share a value), so
the DuckDB oracle matches bit-for-bit on 6dp-rounded residuals with no
interpolation ambiguity (unlike interpolated `percentile`).

Plan: one window-rank pass over the calibration residuals (shuffled on
the era key), the k-th row per era kept (a tiny frame — one row per
era) and broadcast-joined onto the scoring frame. Calibration data
never touches the scoring scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RES_DP = 6  # residuals round to 6dp so both engines rank identical values


def conformal_quantiles(
    calib: DataFrame,
    pred_col: str,
    target_col: str,
    *,
    alpha: float = 0.1,
    era_col: str | None = None,
) -> DataFrame:
    """Per-era (or global) conformal radius: (era?, n_calib, q).

    q is the k-th smallest |target − pred| with k = ⌈(n+1)(1−α)⌉,
    clamped to n (small eras where the corrected rank exceeds n yield
    the max residual — the conservative choice)."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    res = F.round(
        F.abs(F.col(target_col) - F.col(pred_col)), RES_DP
    ).alias("__res")
    groups = [era_col] if era_col else []
    base = calib.where(
        F.col(target_col).isNotNull() & F.col(pred_col).isNotNull()
    ).select(*groups, res)
    w = Window.partitionBy(*groups).orderBy(F.col("__res").asc())
    cnt = Window.partitionBy(*groups)
    ranked = base.select(
        *groups,
        "__res",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(cnt).alias("n_calib"),
    )
    k = F.least(
        F.ceil((F.col("n_calib") + 1) * F.lit(1.0 - alpha)).cast("long"),
        F.col("n_calib"),
    )
    return ranked.where(F.col("__rn") == k).select(
        *groups, "n_calib", F.col("__res").alias("q")
    )


def conformal_interval(
    calib: DataFrame,
    score: DataFrame,
    pred_col: str,
    target_col: str,
    *,
    alpha: float = 0.1,
    era_col: str | None = None,
) -> DataFrame:
    """Attach [pred − q, pred + q] to ``score`` using radii calibrated
    on ``calib``. With ``era_col``, each scored row uses ITS era's
    radius (rows from eras absent in calibration get null bounds —
    surface them rather than silently reusing another era's radius)."""
    q = conformal_quantiles(
        calib, pred_col, target_col, alpha=alpha, era_col=era_col
    )
    if era_col:
        joined = score.join(F.broadcast(q), on=era_col, how="left")
    else:
        # LEFT join on a constant key, not crossJoin: an empty
        # calibration (no valid residuals yet) must surface null
        # bounds on every row, not silently drop the scoring output
        joined = score.withColumn("__k", F.lit(1)).join(
            F.broadcast(q.withColumn("__k", F.lit(1))), on="__k", how="left"
        ).drop("__k")
    return joined.select(
        *score.columns,
        "q",
        (F.col(pred_col) - F.col("q")).alias(f"{pred_col}_lo"),
        (F.col(pred_col) + F.col("q")).alias(f"{pred_col}_hi"),
    )


def conformal_quantiles_oracle_sql(
    table: str,
    pred_sql: str,
    target_sql: str,
    *,
    alpha: float = 0.1,
    era_sql: str | None = None,
) -> str:
    """DuckDB mirror of :func:`conformal_quantiles`."""
    part = f"PARTITION BY {era_sql}" if era_sql else ""
    era_out = f"{era_sql} AS era, " if era_sql else ""
    grp = f"{era_sql}, " if era_sql else ""
    return f"""
        WITH r AS (
          SELECT {grp}
                 round(abs(({target_sql}) - ({pred_sql})), {RES_DP}) AS res
          FROM {table}
          WHERE ({target_sql}) IS NOT NULL AND ({pred_sql}) IS NOT NULL
        ), ranked AS (
          SELECT {grp} res,
                 row_number() OVER ({part} ORDER BY res ASC) AS rn,
                 count(*) OVER ({part}) AS n_calib
          FROM r
        )
        SELECT {era_out} n_calib, res AS q
        FROM ranked
        WHERE rn = least(CAST(ceil((n_calib + 1) * {1.0 - alpha!r}) AS BIGINT),
                         n_calib)
    """
