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
