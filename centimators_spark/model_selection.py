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


def _epoch_double_sql(df: DataFrame, time_col: str) -> str:
    """SQL text for ``time_col`` as a DOUBLE (epoch seconds for
    temporal types). TIMESTAMP_NTZ/DATE cannot cast straight to DOUBLE
    in Spark — route through TIMESTAMP_LTZ (identity under the
    engine's pinned-UTC sessions, matching DuckDB's epoch())."""
    kind = df.selectExpr(f"({time_col}) AS __t").schema[0].dataType.simpleString()
    if kind in ("timestamp_ntz", "date"):
        return f"CAST(CAST(({time_col}) AS TIMESTAMP_LTZ) AS DOUBLE)"
    return f"CAST(({time_col}) AS DOUBLE)"


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
    t_sql = _epoch_double_sql(df, time_col)
    t = F.expr(t_sql)
    row = df.agg(
        *[
            F.expr(f"approx_percentile({t_sql}, {q}, 10000)").alias(f"q{i}")
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


def assign_folds(
    df: DataFrame,
    time_col: str,
    *,
    n_splits: int = 5,
    embargo: float = 0.0,
    out_col: str = "fold",
    flag_col: str | None = "embargoed",
    exact: bool = False,
) -> DataFrame:
    """Row-level companion of :func:`time_series_splits`: append the
    VALIDATION fold index each row belongs to (−1 for the seed block
    before the first boundary, which only ever trains) and — with
    ``flag_col`` — whether the row sits inside the embargo gap trailing
    its fold (rows a later fold's training must drop when labels look
    ``embargo`` units ahead).

    Same boundaries as time_series_splits: the (i/(n_splits+1))
    quantiles of ``time_col`` (cast to double — epoch seconds for
    timestamps). ``exact=True`` uses interpolated exact percentiles
    (sorts the column inside one aggregation buffer — oracle-parity
    mode with a bit-exact DuckDB mirror in
    :func:`assign_folds_oracle_sql`); the default approx sketch is the
    100 TB path. One tiny aggregation broadcast back; the fold label is
    a pure codegen expression on the scan."""
    if n_splits < 1:
        raise ValueError(f"n_splits must be >= 1, got {n_splits}")
    if embargo < 0:
        raise ValueError(f"embargo must be >= 0, got {embargo}")
    qs = [i / (n_splits + 1) for i in range(1, n_splits + 1)]
    probs_sql = ", ".join(repr(q) for q in qs)
    fn = "percentile" if exact else "approx_percentile"
    t_sql = _epoch_double_sql(df, time_col)
    bounds = df.agg(
        F.expr(f"{fn}({t_sql}, array({probs_sql}))").alias("__bounds")
    )
    t = F.expr(t_sql)
    fold = (
        F.aggregate(
            F.col("__bounds"),
            F.lit(0),
            lambda acc, b: acc + F.when(t >= b, 1).otherwise(0),
        )
        - 1
    )
    out = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(out_col, fold.cast("int"))
    )
    if flag_col is not None:
        # inside the embargo gap before the NEXT boundary: a training
        # set built "strictly before boundary i with embargo" excludes
        # exactly these rows (time_series_splits: t < lo − embargo)
        # F.get (0-based) returns NULL past the last boundary — ANSI
        # element_at would THROW for the final fold's rows
        nxt = F.get(F.col("__bounds"), F.col(out_col) + 1)
        out = out.withColumn(
            flag_col,
            F.when(
                (F.col(out_col) < n_splits - 1)
                & (t >= nxt - F.lit(float(embargo))),
                1,
            )
            .otherwise(0)
            .cast("int"),
        )
    return out.drop("__bounds")


def assign_folds_oracle_sql(
    table: str,
    time_sql: str,
    *,
    n_splits: int = 5,
    embargo: float = 0.0,
    select_sql: str = "*",
    fold_name: str = "fold",
    flag_name: str | None = "embargoed",
) -> str:
    """DuckDB mirror of :func:`assign_folds` (exact mode) — identical
    interpolated quantile boundaries and fold/embargo rules."""
    qs = [i / (n_splits + 1) for i in range(1, n_splits + 1)]
    probs_sql = ", ".join(repr(q) for q in qs)
    fold = (
        f"(len(list_filter(b.bounds, v -> CAST({time_sql} AS DOUBLE) >= v))"
        f" - 1)"
    )
    cols = f"{select_sql}, CAST({fold} AS INTEGER) AS {fold_name}"
    if flag_name is not None:
        flag = f"""CASE WHEN {fold} < {n_splits - 1}
            AND CAST({time_sql} AS DOUBLE)
                >= b.bounds[{fold} + 2] - {float(embargo)!r}
            THEN 1 ELSE 0 END"""
        cols += f", CAST({flag} AS INTEGER) AS {flag_name}"
    return f"""
        WITH b AS (
          SELECT quantile_cont(CAST({time_sql} AS DOUBLE), [{probs_sql}])
            AS bounds
          FROM {table}
        )
        SELECT {cols} FROM {table} CROSS JOIN b
    """


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


def purged_kfold_eras(
    df: DataFrame,
    era_col: str,
    *,
    k: int = 5,
    embargo_eras: int = 1,
) -> DataFrame:
    """Purged K-fold CV over ERAS (López de Prado 2018, "Advances in
    Financial Machine Learning" ch. 7 — PurgedKFold): unlike the
    walk-forward :func:`time_series_splits`, each fold validates on a
    CONTIGUOUS middle block of eras and trains on BOTH sides, with the
    ``embargo_eras`` eras adjacent to the validation block PURGED from
    training (overlapping label horizons leak both directions). The
    CV geometry behind backtest-overfitting checks (PBO/DSR).

    Era → fold assignment is the exact integer rule
    fold = ((rank−1)·k) // n over the era rank (1-based, era order),
    so folds are contiguous and sizes differ by at most one — both
    engines compute the identical map. Output: the (fold, era, role)
    assignment table, role ∈ {'val', 'purged', 'train'}, k rows per
    era; row-level application is one broadcast join on the era.

    Scale: ONE map-side-combined distinct-era aggregation is the only
    corpus-sized work; the rank window and the k-fold cross join run
    on the era table (calendar-bounded). NULL eras are excluded on
    both engines (they belong to no fold)."""
    from pyspark.sql import Window

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if embargo_eras < 0:
        raise ValueError(f"embargo_eras must be >= 0, got {embargo_eras}")
    eras = (
        df.where(F.col(era_col).isNotNull())
        .select(F.col(era_col).alias("era"))
        .distinct()
    )
    w = Window.orderBy("era")
    ranked = eras.withColumn("__r", F.row_number().over(w).cast("long"))
    folds = ranked.select(
        "era",
        "__r",
        F.explode(
            F.array(*[F.lit(f) for f in range(k)])
        ).alias("fold"),
    )
    n = eras.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    g = folds.crossJoin(F.broadcast(n))
    # fold f covers ranks [lo_f, hi_f]: lo = n*f//k + 1, hi = n*(f+1)//k
    lo = (F.floor(F.col("__n") * F.col("fold") / k) + 1).cast("long")
    hi = F.floor(F.col("__n") * (F.col("fold") + 1) / k).cast("long")
    e = F.lit(int(embargo_eras))
    role = (
        F.when((F.col("__r") >= lo) & (F.col("__r") <= hi), "val")
        .when(
            (F.col("__r") >= lo - e) & (F.col("__r") <= hi + e), "purged"
        )
        .otherwise("train")
    )
    return g.select("fold", "era", role.alias("role"))


def purged_kfold_eras_oracle_sql(
    table: str,
    era_sql: str,
    *,
    k: int = 5,
    embargo_eras: int = 1,
) -> str:
    """DuckDB mirror of :func:`purged_kfold_eras`."""
    e = int(embargo_eras)
    return f"""
        WITH eras AS (
          SELECT DISTINCT {era_sql} AS era FROM {table}
          WHERE {era_sql} IS NOT NULL
        ), ranked AS (
          SELECT era,
                 CAST(row_number() OVER (ORDER BY era) AS BIGINT) AS r,
                 CAST(count(*) OVER () AS BIGINT) AS n
          FROM eras
        ), g AS (
          SELECT era, r, n, CAST(f AS INTEGER) AS fold
          FROM ranked CROSS JOIN range({k}) t(f)
        )
        SELECT fold, era,
               CASE
                 WHEN r >= (n * fold) // {k} + 1
                  AND r <= (n * (fold + 1)) // {k} THEN 'val'
                 WHEN r >= (n * fold) // {k} + 1 - {e}
                  AND r <= (n * (fold + 1)) // {k} + {e} THEN 'purged'
                 ELSE 'train'
               END AS role
        FROM g
    """
