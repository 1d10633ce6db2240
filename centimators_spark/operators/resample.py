"""Panel gap filling: densify each ticker's date axis onto a regular
spine and forward-fill observations — the step that makes irregular
market/panel data safe for the ordered transformers (lag/rolling/EWMA
assume one row per (ticker, period); a silent gap turns "lag 1" into
"lag k days").

Plan shape: per-ticker (min, max) date bounds from one tiny
aggregation; `sequence()` explodes each ticker's own spine (no global
calendar cross join — a ticker listed for one month costs one month of
rows); a left join attaches observations; `last(..., ignoreNulls)` over
the running frame carries values forward. Shuffles: the bounds
aggregation + the spine join + one window — all on the ticker key, so
pre-bucketing the panel by ticker makes the whole operator
shuffle-free except the explode.

The reference sidesteps this by assuming dense panels (its transformers
index by physical row order); a distributed engine must make density
explicit. Forward fill is the panel-standard choice (no lookahead);
``fill=None`` leaves gap rows null for explicit imputation downstream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_panel(
    df: DataFrame,
    *,
    ticker_col: str,
    date_col: str,
    value_cols: Sequence[str],
    step_days: int = 1,
    fill: str | None = "ffill",
) -> DataFrame:
    """One row per (ticker, date) on a ``step_days`` spine spanning each
    ticker's own [min, max] dates. Output: ticker, date, each value
    column (forward-filled when ``fill='ffill'``), and ``is_observed``
    (1 for original rows, 0 for spine-inserted gaps). Duplicate
    (ticker, date) observations must be pre-aggregated (the join would
    multiply spine rows). With ``step_days > 1`` observation dates must
    lie ON each ticker's grid (lo, lo+step, …) — off-grid observations
    would miss the equi-join and silently vanish into filled gaps; keep
    step_days=1 (and aggregate upstream) unless the data is known
    grid-aligned.

    ``fill='linear'`` interpolates gap rows between their bracketing
    observations, time-weighted by day distance:
    ``prev + ((next - prev) * (d - d_prev)) / (d_next - d_prev)``.
    Leading/trailing gaps (no bracket on one side) stay null — linear
    interpolation has no lookback/lookahead-free answer there; chain a
    ffill/bfill explicitly if you want one. The bracket lookups are the
    same running last-non-null as ffill plus its mirror over the
    REVERSED ordering — two O(n) window passes sharing one shuffle on
    the ticker key (never an unbounded-FOLLOWING frame, which Spark
    evaluates O(n²) per partition). On integer-valued doubles the only
    inexact op is the final division, a single IEEE rounding,
    identical cross-engine."""
    if fill not in (None, "ffill", "linear"):
        raise ValueError(f"fill must be None|'ffill'|'linear', got {fill!r}")
    vals = list(value_cols)
    t, d = ticker_col, date_col
    bounds = df.groupBy(t).agg(
        F.min(d).alias("__lo"), F.max(d).alias("__hi")
    )
    spine = bounds.select(
        t,
        F.explode(
            F.sequence(
                F.col("__lo"),
                F.col("__hi"),
                F.expr(f"INTERVAL {int(step_days)} DAYS"),
            )
        ).alias(d),
    )
    obs = df.select(t, d, *vals).withColumn("is_observed", F.lit(1))
    out = spine.join(obs, [t, d], "left").withColumn(
        "is_observed", F.coalesce(F.col("is_observed"), F.lit(0))
    )
    if fill == "ffill":
        w = (
            Window.partitionBy(t)
            .orderBy(d)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in vals:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    elif fill == "linear":
        wb = (
            Window.partitionBy(t)
            .orderBy(d)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        # the forward bracket is the same running last-non-null, taken
        # over the REVERSED ordering — never a [current, unbounded
        # following] frame: Spark evaluates unbounded-FOLLOWING frames
        # by rescanning to the partition end for EVERY row (O(n²) per
        # partition; measured 225 s on the sf0.1 supplier spine vs ~2 s
        # this way), while unbounded-preceding frames stream in O(n)
        wf = (
            Window.partitionBy(t)
            .orderBy(F.col(d).desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        for c in vals:
            obs_d = F.when(F.col(c).isNotNull(), F.col(d))
            prev_v = F.last(c, ignorenulls=True).over(wb)
            prev_d = F.last(obs_d, ignorenulls=True).over(wb)
            next_v = F.last(c, ignorenulls=True).over(wf)
            next_d = F.last(obs_d, ignorenulls=True).over(wf)
            span = F.datediff(next_d, prev_d)
            # span == 0 ⟺ the row itself is observed (prev == next ==
            # current); guard keeps 0/0 out of the division
            out = out.withColumn(
                c,
                F.when(span == 0, prev_v).otherwise(
                    prev_v
                    + ((next_v - prev_v) * F.datediff(F.col(d), prev_d))
                    / span
                ),
            )
    return out
