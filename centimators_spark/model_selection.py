"""Model-selection utilities: time-series cross-validation and grid
search over engine estimators.

Reference surface (docs/user-guide/advanced-pipelines.md:111-148):
sklearn ``TimeSeriesSplit`` + ``GridSearchCV`` wrap the pipeline. A
distributed engine replaces the INDEX-based splitter with TIME-based
boundaries — row indices are meaningless in a distributed frame, while
timestamp predicates push into the parquet scan (partition pruning when
the table is date-partitioned), so each fold reads only its slice.

Grid search stays a driver-side loop: each candidate's fit/score runs
the engine's distributed plans; candidates execute sequentially against
the shared SparkSession (model-parallel search would need one session
per candidate — out of scope, as in the reference where joblib handles
it on one machine).
"""

from __future__ import annotations

import itertools
from typing import Callable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_series_splits(
    df: DataFrame,
    time_col: str,
    n_splits: int = 5,
    embargo: float = 0.0,
) -> list[tuple[DataFrame, DataFrame]]:
    """Expanding-window CV folds on a time column (sklearn
    TimeSeriesSplit semantics, time-based instead of index-based):
    boundaries at the (i/(n_splits+1)) quantiles of ``time_col``; fold i
    trains on everything before boundary i and validates on
    [boundary_i, boundary_{i+1}). Train rows always precede validation
    rows — no leakage by construction.

    One tiny quantile aggregation plans the boundaries; each fold is a
    pair of filter predicates on the ORIGINAL frame (scan-pruned, no
    materialization).

    embargo: width of the gap (in ``time_col`` units after the
    double-cast — seconds for timestamps) EXCLUDED from the end of each
    training window. When labels are computed over a forward horizon
    (next-month return, 30-day churn), a train row just before the
    validation boundary sees validation-period outcomes; embargoing the
    label horizon removes that leakage (the embargoed walk-forward
    split standard in financial ML — set embargo ≥ the label horizon)."""
    if n_splits < 1:
        raise ValueError(f"n_splits must be >= 1, got {n_splits}")
    if embargo < 0:
        raise ValueError(f"embargo must be >= 0, got {embargo}")
    qs = [i / (n_splits + 1) for i in range(1, n_splits + 2)]
    t = F.col(time_col).cast("double")
    row = df.agg(
        *[
            F.expr(
                f"approx_percentile(CAST({time_col} AS DOUBLE), {q}, 10000)"
            ).alias(f"q{i}")
            for i, q in enumerate(qs)
        ]
    ).collect()[0]
    bounds = [row[f"q{i}"] for i in range(len(qs))]
    folds = []
    for i in range(n_splits):
        lo, hi = bounds[i], bounds[i + 1]
        train = df.where(t < F.lit(lo - embargo))
        if i + 1 == n_splits:  # last fold takes the tail inclusive
            val = df.where(t >= F.lit(lo))
        else:
            val = df.where((t >= F.lit(lo)) & (t < F.lit(hi)))
        folds.append((train, val))
    return folds


def grid_search(
    estimator_factory: Callable[..., object],
    param_grid: Mapping[str, Sequence],
    folds: Sequence[tuple[DataFrame, DataFrame]],
    scorer: Callable[[object, DataFrame], float] | None = None,
) -> dict:
    """Exhaustive grid search: for every parameter combination, fit on
    each fold's train frame and score on its validation frame (higher
    is better; default scorer calls ``estimator.score(val)``). Returns
    {'best_params', 'best_score', 'best_estimator', 'results'} with
    per-combination mean scores, sklearn-GridSearchCV-shaped."""
    keys = list(param_grid)
    results = []
    best = None
    for combo in itertools.product(*[param_grid[k] for k in keys]):
        params = dict(zip(keys, combo))
        scores = []
        fitted = None
        for train, val in folds:
            est = estimator_factory(**params)
            est.fit(train)
            s = scorer(est, val) if scorer else est.score(val)
            scores.append(float(s))
            fitted = est
        mean = sum(scores) / len(scores)
        results.append({"params": params, "scores": scores, "mean_score": mean})
        if best is None or mean > best[0]:
            best = (mean, params, fitted)
    return {
        "best_score": best[0],
        "best_params": best[1],
        "best_estimator": best[2],
        "results": results,
    }
