"""EWMA-band anomaly flagging for panel series — the classic control-
chart rule: a point is anomalous when it leaves the ``k·σ`` band
around its exponentially-weighted moving average.

Composition of two existing bit-exact primitives (truncated EWMA +
rolling std over one shared window shuffle) plus a pure comparison
against the PRIOR row's band — the point under test must not inflate
its own center/width, or a large spike masks itself:

    flag_t = |x_t − ewma_{t-1}| > k · std_{t-1}     (+ signed z-score)

Both inputs are 6dp-rounded by their transformers, so the comparison —
and therefore the flag set — is bit-identical across engines; the
DuckDB oracle replays the same literal-weight EWMA and gated std with
the same one-row lag. Rows whose prior band is undefined (warm-up)
yield null flag (unknown, not false).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.operators.time_series import (
    EWMATransformer,
    RollingAggTransformer,
)


def ewma_anomaly_flags(
    df: DataFrame,
    feature: str,
    *,
    ticker_col: str,
    order_cols: Sequence[str],
    span: int = 4,
    window: int = 12,
    std_window: int = 12,
    k: float = 2.0,
    round_dp: int = 6,
) -> DataFrame:
    """Append ``{feature}_ewma{span}``, ``{feature}_rolling_std{w}``,
    ``{feature}_z`` (rounded signed distance in σ units) and
    ``{feature}_anomaly`` to ``df``. One shuffle: both window families
    share the (ticker, order) partitioning."""
    ewma = EWMATransformer(
        spans=[span],
        window=window,
        feature_names=[feature],
        ticker_col=ticker_col,
        order_cols=order_cols,
        output_mode="append",
        round_dp=round_dp,
    )
    std = RollingAggTransformer(
        windows=[std_window],
        feature_names=[feature],
        aggs=["std"],
        ticker_col=ticker_col,
        order_cols=order_cols,
        output_mode="append",
    )
    from pyspark.sql import Window

    out = std.transform(ewma.transform(df))
    w = Window.partitionBy(ticker_col).orderBy(*[F.col(c) for c in order_cols])
    s_cur = F.round(F.col(f"{feature}_rolling_std{std_window}"), round_dp)
    e_prev = F.lag(F.col(f"{feature}_ewma{span}")).over(w)
    s_prev = F.lag(s_cur).over(w)
    z = F.round(F.try_divide(F.col(feature) - e_prev, s_prev), round_dp)
    flag = F.when(
        e_prev.isNotNull() & s_prev.isNotNull(),
        (F.abs(F.col(feature) - e_prev) > F.lit(float(k)) * s_prev).cast(
            "int"
        ),
    )
    return (
        out.withColumn(f"{feature}_rolling_std{std_window}", s_cur)
        .withColumn(f"{feature}_z", z)
        .withColumn(f"{feature}_anomaly", flag)
    )


def page_hinkley(
    df: DataFrame,
    value_col: str,
    *,
    ticker_col: str,
    order_cols: Sequence[str],
    delta: float = 0.0,
    lam: float | None = None,
    lambda_sigmas: float = 5.0,
    scale: int = 100,
) -> DataFrame:
    """Page–Hinkley changepoint detection per series — the sequential
    test for an upward mean shift that, unlike the CUSUM recursion
    S⁺_t = max(0, S⁺_{t−1} + ...), IS window-expressible: with μ the
    series baseline mean,

        m_t  = Σ_{s≤t} (x_s − μ − δ)          (drift-tolerant cumsum)
        PH_t = m_t − min_{s≤t} m_s            (rise from running low)
        flag = PH_t > λ

    Exactness contract (bit-exact DuckDB oracle,
    :func:`page_hinkley_oracle_sql`): x rides the integer carrier
    u = round(x·scale); multiplying the test through by the per-series
    count n makes every accumulated quantity an exact integer —
    M_t = Σ (n·u_s − S − n·δ·scale) where S = Σu — so the cumulative
    sums, running minima, and threshold comparison (against
    n·λ·scale) are BIGINT arithmetic, partition-order independent.
    ``ph`` is reported back in original units (rounded 6dp).

    λ defaults to ``lambda_sigmas · σ`` of the series (population σ
    from the same exact sums — the usual tuning); pass ``lam`` to pin
    it. Set ``delta`` ≈ half the smallest shift you care about: with
    δ=0 the statistic is a cumsum bridge whose range grows like σ·√n,
    so ANY long stationary series eventually flags. Two windows + one pre-aggregation, all sharing the ticker
    shuffle. Returns input + (ph, changepoint).

    SCALE CAVEAT: n·u products need |n·u| < 2⁶³ — fine to ~10⁹ rows ×
    10⁹ carriers; beyond that lower ``scale``."""
    from pyspark.sql import Window

    u = F.round(F.col(value_col) * scale).cast("long")
    base = df.withColumn("__u", u)
    stats = base.groupBy(ticker_col).agg(
        F.sum("__u").alias("__S"),
        F.count(F.lit(1)).alias("__n"),
        F.sum((F.col("__u").cast("decimal(19,0)") * F.col("__u").cast("decimal(19,0)"))).alias("__SS"),
    )
    j = base.join(F.broadcast(stats), ticker_col)
    n = F.col("__n")
    # integer step: n·u − S − n·δ·scale  (δ·scale rounded to int once)
    dstep = F.lit(int(round(delta * scale)))
    step = n * F.col("__u") - F.col("__S") - n * dstep
    w = Window.partitionBy(ticker_col).orderBy(
        *[F.col(c) for c in order_cols]
    ).rowsBetween(Window.unboundedPreceding, 0)
    m = F.sum(step).over(w)
    ph_int = m - F.min(m).over(w)  # ≥ 0, exact BIGINT
    # threshold in the same n·scale-inflated integer domain
    if lam is not None:
        thr = (n.cast("double") * F.lit(float(lam) * scale))
    else:
        # population σ of u: sqrt(SS/n − (S/n)²); λ = k·σ/scale units.
        # Explicit multiply, not **2 — POWER is a libm/JVM 1-ULP hazard
        # the oracle's x*x spelling avoids
        mean_u = F.col("__S").cast("double") / n.cast("double")
        var_u = (
            F.col("__SS").cast("double") / n.cast("double") - mean_u * mean_u
        )
        thr = n.cast("double") * F.lit(float(lambda_sigmas)) * F.sqrt(
            F.greatest(var_u, F.lit(0.0))
        )
    # ph_int is the EXACT test statistic (BIGINT, inflated by n·scale —
    # comparable within a series, and the column a hash-exact contract
    # checks); ph is the display value in original units, whose 6dp
    # round can flip a half-boundary by 1 ulp across engines
    out = (
        j.withColumn("ph_int", ph_int)
        .withColumn(
            "ph",
            F.round(
                ph_int.cast("double") / n.cast("double") / scale, 6
            ),
        )
        .withColumn(
            "changepoint", (ph_int.cast("double") > thr).cast("int")
        )
    )
    return out.drop("__u", "__S", "__n", "__SS")


def page_hinkley_oracle_sql(
    table: str,
    value_sql: str,
    ticker_sql: str,
    order_sql: str,
    *,
    delta: float = 0.0,
    lambda_sigmas: float = 5.0,
    scale: int = 100,
    select_sql: str = "*",
    include_display: bool = True,
) -> str:
    """DuckDB mirror of :func:`page_hinkley` (σ-derived λ) — identical
    integer carriers, window arithmetic, and threshold comparison.
    ``include_display=False`` omits the rounded ``ph`` double (whose
    6dp half-boundary can flip 1 ulp across engines — hash contracts
    check ``ph_int``)."""
    dstep = int(round(delta * scale))
    ph_disp = (
        f"round(CAST(ph_int AS DOUBLE) / CAST(n AS DOUBLE) / {scale}, 6)"
        f" AS ph,"
        if include_display
        else ""
    )
    return f"""
        WITH base AS (
          SELECT *, {ticker_sql} AS __tk,
                 CAST(round(({value_sql}) * {scale}) AS BIGINT) AS u
          FROM {table}
        ), stats AS (
          SELECT __tk, sum(u) AS S, CAST(count(*) AS BIGINT) AS n,
                 sum(CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0))) AS SS
          FROM base GROUP BY __tk
        ), j AS (
          SELECT base.*, S, n, SS FROM base JOIN stats USING (__tk)
        ), cum AS (
          SELECT *,
                 sum(n * u - S - n * {dstep}) OVER (
                   PARTITION BY __tk ORDER BY {order_sql}
                   ROWS UNBOUNDED PRECEDING) AS m
          FROM j
        ), ph AS (
          SELECT *,
                 m - min(m) OVER (
                   PARTITION BY __tk ORDER BY {order_sql}
                   ROWS UNBOUNDED PRECEDING) AS ph_int
          FROM cum
        )
        SELECT {select_sql},
               CAST(ph_int AS BIGINT) AS ph_int,
               {ph_disp}
               CAST(CAST(ph_int AS DOUBLE) >
                    CAST(n AS DOUBLE) * {float(lambda_sigmas)!r}
                    * sqrt(greatest(CAST(SS AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(S AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(S AS DOUBLE) / CAST(n AS DOUBLE)), 0.0))
                 AS INTEGER) AS changepoint
        FROM ph
    """
