"""Streaming feature-drift monitoring: windowed PSI of a live value
stream against a STATIC reference histogram — the serving-time
companion of operators/drift.psi_drift (which compares two batch
slices). A model-serving pipeline points this at its feature firehose
and alerts when a window's PSI crosses the action level.

Spark shape: the reference boundaries are a tiny driver-side list
(computed ONCE from the training frame — exact or sketch percentiles),
injected as literals, so the streaming side is a pure map-side bin
expression + one watermarked tumbling-window groupBy — standard
streaming aggregation state, no joins, no custom state. The PSI
arithmetic runs on the window's closed counts.

Works identically on batch and streaming inputs (the
incremental==batch test pins it), like every operator in this package.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_histogram(
    df: DataFrame,
    value_col: str,
    *,
    n_bins: int = 10,
    exact: bool = True,
) -> tuple[list[float], list[int]]:
    """Driver-side reference spec for :func:`windowed_psi`: the
    (n_bins−1) interpolated percentile boundaries and the reference
    bin counts. One aggregation + one pass; both lists are a few
    numbers — literals, not data."""
    probs = [i / n_bins for i in range(1, n_bins)]
    fn = "percentile" if exact else "approx_percentile"
    probs_sql = ", ".join(repr(p) for p in probs)
    [row] = df.agg(
        F.expr(
            f"{fn}(CAST(`{value_col}` AS DOUBLE), array({probs_sql}))"
        ).alias("b")
    ).collect()
    bounds = [float(x) for x in row["b"]]
    bin_expr = _bin_expr(value_col, bounds)
    counts = (
        df.groupBy(bin_expr.alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    by_bin = {r["bin"]: r["c"] for r in counts}
    return bounds, [int(by_bin.get(i, 0)) for i in range(n_bins)]


def _bin_expr(value_col: str, bounds: Sequence[float]):
    v = F.col(f"`{value_col}`").cast("double")
    b = F.lit(0)
    for x in bounds:
        b = b + F.when(v > float(x), 1).otherwise(0)
    return b


def windowed_psi(
    stream: DataFrame,
    value_col: str,
    ts_col: str,
    bounds: Sequence[float],
    ref_counts: Sequence[int],
    *,
    window: str = "1 hour",
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """PSI of each event-time window against the reference histogram.

    Returns (window_start, n, psi) — one row per closed window; psi is
    the smoothed PSI (same 0.5-Laplace smoothing as the batch
    operator, so thresholds carry over: <0.1 stable, >0.25 action).
    Bin assignment is a literal codegen expression; the only state is
    the watermarked window aggregation (n_bins running counts per
    window)."""
    n_bins = len(ref_counts)
    if len(bounds) != n_bins - 1:
        raise ValueError(
            f"len(bounds)={len(bounds)} must be n_bins-1={n_bins - 1}"
        )
    s = stream
    if watermark is not None and s.isStreaming:
        s = s.withWatermark(ts_col, watermark)
    # ONE stateful aggregation: the bins ride as conditional-count
    # columns (n_bins is a small literal), not as grouping keys — a
    # second per-window groupBy would be a chained stateful operator,
    # which streaming rejects without a watermark and charges a second
    # state store with one
    b = _bin_expr(value_col, bounds)
    agged = s.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.when(b == i, 1).otherwise(0)).alias(f"__c{i}")
            for i in range(n_bins)
        ],
    )
    n_ref = sum(ref_counts)
    smooth = 0.5
    n = F.col("n").cast("double")
    psi = F.lit(0.0)
    for i, rc in enumerate(ref_counts):
        p_ref = (rc + smooth) / (n_ref + smooth * n_bins)
        p_cur = (F.col(f"__c{i}").cast("double") + smooth) / (
            n + smooth * n_bins
        )
        psi = psi + (p_cur - F.lit(p_ref)) * (
            F.log(p_cur) - F.lit(math.log(p_ref))
        )
    return agged.select(
        F.unix_timestamp(F.col("w.start")).alias("window_start"),
        F.col("n").cast("long").alias("n"),
        F.round(psi, 6).alias("psi"),
    )
