"""Model-evaluation metrics over era panels: the era-scoring report
(mean/std/Sharpe/max-drawdown of per-era correlation — the standard
Numerai-style diagnostic the reference's users compute on every
prediction file) and per-group autocorrelation (ACF at chosen lags).

Exactness convention (shared with operators/encoding.py and the era-OLS
oracle machinery): inputs ride EXACT integer carriers (fixed-decimal
scaling), per-group sums accumulate as DECIMAL(38,0) — partition-order
independent, unlike raw double sums — and both engines evaluate the
IDENTICAL closed-form correlation expression on those exact sums, so
the DuckDB oracles are bit-exact without tolerance.

Scale notes: the per-era aggregation is one map-side-partial shuffle on
the era key; the summary stage runs a window over ONE ROW PER ERA
(months of history — thousands of rows at most, never data-sized), so
its single-partition window is not a scale hazard. Autocorrelation is
one window (lag) plus one grouped aggregation on the same key — the
sort-and-shuffle is shared.

Reference scope: the reference evaluates per-era Spearman via its
training losses (src/centimators/model_estimators/losses.py:22-95) but
ships no batch scoring report; this is the §2.3-style extension of that
semantic to a distributed scoring surface.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CORR_SCALE = 1_000_000  # 6dp micro-units for the per-era corr carrier


def _corr_from_sums(n: Column, sx: Column, sy: Column, sxx: Column,
                    syy: Column, sxy: Column) -> Column:
    """Pearson corr from exact integer sums — the identical expression
    the DuckDB oracle evaluates (see _sql_corr_from_sums)."""
    nd = n.cast("double")
    sxd, syd = sx.cast("double"), sy.cast("double")
    num = nd * sxy.cast("double") - sxd * syd
    den = F.sqrt(
        (nd * sxx.cast("double") - sxd * sxd)
        * (nd * syy.cast("double") - syd * syd)
    )
    # explicit zero-variance guard: under ANSI (this engine's session
    # default) Spark's double x/0 THROWS, and DuckDB's yields ±inf —
    # the short-circuiting CASE keeps both engines at NULL
    return F.when(den > 0, num / den)


def _sql_corr_from_sums(n: str, sx: str, sy: str, sxx: str, syy: str,
                        sxy: str) -> str:
    nd = f"CAST({n} AS DOUBLE)"
    sxd, syd = f"CAST({sx} AS DOUBLE)", f"CAST({sy} AS DOUBLE)"
    den = (
        f"sqrt(({nd} * CAST({sxx} AS DOUBLE) - {sxd} * {sxd})"
        f" * ({nd} * CAST({syy} AS DOUBLE) - {syd} * {syd}))"
    )
    return (
        f"(CASE WHEN {den} > 0 THEN "
        f"({nd} * CAST({sxy} AS DOUBLE) - {sxd} * {syd}) / {den} END)"
    )


def _exact_sums(x: Column, y: Column) -> list[Column]:
    """The six DECIMAL(38,0) moment sums (x, y must be integer-valued).

    Products cast each OPERAND to DECIMAL(19,0) first — (19,0)×(19,0)
    multiplies exactly into DECIMAL(38,0) in both engines. Multiplying
    in LONG and casting after would overflow (ANSI ARITHMETIC_OVERFLOW)
    for any carrier ≥ ~3.04e9, i.e. a 6dp micro-unit scaling of values
    over ~3036 — a bound real panels exceed. Exactness now holds for
    |x| < 1e19 with |x·y| < 1e38."""
    d = "decimal(38,0)"
    d19 = "decimal(19,0)"
    x19, y19 = x.cast(d19), y.cast(d19)
    return [
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(d)).alias("sx"),
        F.sum(y.cast(d)).alias("sy"),
        F.sum(x19 * x19).alias("sxx"),
        F.sum(y19 * y19).alias("syy"),
        F.sum(x19 * y19).alias("sxy"),
    ]


def era_corr(
    df: DataFrame,
    x: str,
    y: str,
    era_col: str,
    *,
    digits: int = 6,
) -> DataFrame:
    """Per-era Pearson correlation of two INTEGER-VALUED columns (scale
    fixed-decimal inputs to integers first), bit-exact: DECIMAL moment
    sums + the shared closed-form expression, rounded to ``digits``.
    Returns (era, n, corr)."""
    sums = df.groupBy(F.col(era_col).alias("era")).agg(
        *_exact_sums(F.col(x), F.col(y))
    )
    corr = _corr_from_sums(
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxx"), F.col("syy"), F.col("sxy"),
    )
    return sums.select("era", "n", F.round(corr, digits).alias("corr"))


def era_report(
    df: DataFrame,
    x: str,
    y: str,
    era_col: str,
) -> DataFrame:
    """The era-scoring report: one row with the count, mean, sample std,
    Sharpe (mean/std), min/max, and max drawdown of the cumulative
    per-era correlation series (eras in ascending order).

    All summary stats ride the 6dp micro-unit carrier of the per-era
    corr — integer cumulative sums make the drawdown exact, and the
    mean/std/Sharpe expressions are evaluated identically by the DuckDB
    oracle (era_report_oracle_sql)."""
    per_era = era_corr(df, x, y, era_col).where(F.col("corr").isNotNull())
    u = per_era.select(
        "era",
        F.round(F.col("corr") * CORR_SCALE).cast("long").alias("cu"),
    )
    # one row per era: a global ordered window here is bounded by the
    # era count (months), not the data size
    w = Window.orderBy("era").rowsBetween(Window.unboundedPreceding, 0)
    cum = u.select(
        "era",
        "cu",
        F.sum("cu").over(w).alias("cum"),
    ).select(
        "cu",
        "cum",
        F.max("cum").over(w).alias("peak"),
    )
    nd = F.col("n_eras").cast("double")
    su = F.col("su").cast("double")
    ssq = F.col("ssq").cast("double")
    mean = su / CORR_SCALE / nd
    # degenerate-input guards mirror _corr_from_sums: a single era
    # (n-1 == 0) or an all-identical corr series (variance 0) must be
    # NULL in BOTH engines — ANSI Spark THROWS on double x/0 and DuckDB
    # yields inf/NaN, so the CASE is load-bearing for the contract
    std = F.when(
        F.col("n_eras") > 1,
        F.sqrt((nd * ssq - su * su) / (nd * (nd - 1))) / CORR_SCALE,
    )
    return (
        cum.agg(
            F.count(F.lit(1)).alias("n_eras"),
            F.sum("cu").alias("su"),
            F.sum(F.col("cu") * F.col("cu")).alias("ssq"),
            F.min("cu").alias("mn"),
            F.max("cu").alias("mx"),
            F.max(F.col("peak") - F.col("cum")).alias("dd"),
        )
        .select(
            F.col("n_eras"),
            F.round(mean, 6).alias("mean_corr"),
            F.round(std, 6).alias("std_corr"),
            F.round(F.when(std > 0, mean / std), 6).alias("sharpe"),
            (F.col("mn").cast("double") / CORR_SCALE).alias("min_corr"),
            (F.col("mx").cast("double") / CORR_SCALE).alias("max_corr"),
            (F.col("dd").cast("double") / CORR_SCALE).alias("max_drawdown"),
        )
    )


def era_report_oracle_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    era_sql: str,
) -> str:
    """DuckDB mirror of :func:`era_report` — identical DECIMAL moment
    sums, corr expression, micro-unit carrier, and running-peak
    drawdown."""
    corr = _sql_corr_from_sums("n", "sx", "sy", "sxx", "syy", "sxy")
    return f"""
        WITH sums AS (
          SELECT {era_sql} AS era,
                 count(*) AS n,
                 sum(CAST({x_sql} AS DECIMAL(38,0))) AS sx,
                 sum(CAST({y_sql} AS DECIMAL(38,0))) AS sy,
                 -- operands cast BEFORE multiplying, mirroring
                 -- _exact_sums: BIGINT products overflow at ~3e9 in
                 -- both engines, which the differential gate can't see
                 sum(CAST({x_sql} AS DECIMAL(19,0))
                   * CAST({x_sql} AS DECIMAL(19,0))) AS sxx,
                 sum(CAST({y_sql} AS DECIMAL(19,0))
                   * CAST({y_sql} AS DECIMAL(19,0))) AS syy,
                 sum(CAST({x_sql} AS DECIMAL(19,0))
                   * CAST({y_sql} AS DECIMAL(19,0))) AS sxy
          FROM {table} GROUP BY 1
        ), per_era AS (
          SELECT era, round({corr}, 6) AS corr FROM sums
          WHERE {corr} IS NOT NULL
        ), u AS (
          SELECT era, CAST(round(corr * {CORR_SCALE}) AS BIGINT) AS cu
          FROM per_era
        ), c1 AS (
          SELECT era, cu,
                 sum(cu) OVER (ORDER BY era
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM u
        ), c AS (
          SELECT cu, cum,
                 max(cum) OVER (ORDER BY era
                   ROWS UNBOUNDED PRECEDING) AS peak
          FROM c1
        ), agg AS (
          SELECT count(*) AS n_eras, sum(cu) AS su, sum(cu * cu) AS ssq,
                 min(cu) AS mn, max(cu) AS mx, max(peak - cum) AS dd
          FROM c
        )
        SELECT n_eras,
               round(CAST(su AS DOUBLE) / {CORR_SCALE}
                 / CAST(n_eras AS DOUBLE), 6) AS mean_corr,
               round(CASE WHEN n_eras > 1 THEN
                 sqrt((CAST(n_eras AS DOUBLE) * CAST(ssq AS DOUBLE)
                   - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                 / (CAST(n_eras AS DOUBLE) * (CAST(n_eras AS DOUBLE) - 1)))
                 / {CORR_SCALE} END, 6) AS std_corr,
               round(CASE WHEN n_eras > 1
                   AND (CAST(n_eras AS DOUBLE) * CAST(ssq AS DOUBLE)
                     - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)) > 0 THEN
                 (CAST(su AS DOUBLE) / {CORR_SCALE}
                   / CAST(n_eras AS DOUBLE))
                 / (sqrt((CAST(n_eras AS DOUBLE) * CAST(ssq AS DOUBLE)
                     - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                   / (CAST(n_eras AS DOUBLE) * (CAST(n_eras AS DOUBLE) - 1)))
                 / {CORR_SCALE}) END, 6) AS sharpe,
               CAST(mn AS DOUBLE) / {CORR_SCALE} AS min_corr,
               CAST(mx AS DOUBLE) / {CORR_SCALE} AS max_corr,
               CAST(dd AS DOUBLE) / {CORR_SCALE} AS max_drawdown
        FROM agg
    """


def autocorr(
    df: DataFrame,
    value_col: str,
    *,
    group_col: str,
    order_cols: Sequence[str],
    lags: Sequence[int] = (1,),
    digits: int = 6,
) -> DataFrame:
    """Per-group autocorrelation of an INTEGER-VALUED series at the
    given lags: Pearson corr of (x_t, x_{t-k}) over the rows where both
    exist. One shared window sort + one grouped aggregation (same key —
    the group column keeps its NAME through the aggregation so Catalyst
    reuses the window's hash partitioning: one exchange total, the agg
    runs exchange-free on the window output). Bit-exact via DECIMAL
    moment sums + the shared corr expression. Returns
    (group_col, n, acf{k}...)."""
    w = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order_cols])
    x = F.col("__x")
    lagged = df.select(
        F.col(group_col),
        F.col(value_col).alias("__x"),
        *[F.lag(value_col, k).over(w).alias(f"__l{k}") for k in lags],
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("n")]
    d = "decimal(38,0)"
    d19 = "decimal(19,0)"
    for k in lags:
        lk = F.col(f"__l{k}")
        # a pair contributes only when BOTH ends are non-null — counting
        # on the lag alone would inflate n{k} for rows whose current
        # value is null while adding nothing to the moment sums
        pair = lk.isNotNull() & x.isNotNull()
        x19, l19 = x.cast(d19), lk.cast(d19)
        aggs += [
            F.count(F.when(pair, 1)).alias(f"n{k}"),
            F.sum(F.when(pair, x).cast(d)).alias(f"sx{k}"),
            F.sum(F.when(pair, lk).cast(d)).alias(f"sy{k}"),
            # operands cast before multiplying (same overflow bound as
            # _exact_sums: exact for carriers < 1e19)
            F.sum(F.when(pair, x19 * x19)).alias(f"sxx{k}"),
            F.sum(F.when(pair, l19 * l19)).alias(f"syy{k}"),
            F.sum(F.when(pair, x19 * l19)).alias(f"sxy{k}"),
        ]
    sums = lagged.groupBy(group_col).agg(*aggs)
    out_cols: list[Column] = [F.col(group_col), F.col("n")]
    for k in lags:
        corr = _corr_from_sums(
            F.col(f"n{k}"), F.col(f"sx{k}"), F.col(f"sy{k}"),
            F.col(f"sxx{k}"), F.col(f"syy{k}"), F.col(f"sxy{k}"),
        )
        out_cols.append(F.round(corr, digits).alias(f"acf{k}"))
    return sums.select(*out_cols)


def autocorr_oracle_sql(
    table: str,
    value_sql: str,
    *,
    group_sql: str,
    order_sql: str,
    lags: Sequence[int] = (1,),
    group_alias: str = "g",
) -> str:
    """DuckDB mirror of :func:`autocorr`."""
    lag_cols = ", ".join(
        f"lag({value_sql}, {k}) OVER "
        f"(PARTITION BY {group_sql} ORDER BY {order_sql}) AS l{k}"
        for k in lags
    )
    sum_cols = []
    for k in lags:
        # both-ends-non-null pair condition + operand-first DECIMAL
        # casts, mirroring autocorr() exactly
        p = f"l{k} IS NOT NULL AND x IS NOT NULL"
        sum_cols += [
            f"count(CASE WHEN {p} THEN 1 END) AS n{k}",
            f"sum(CASE WHEN {p} THEN CAST(x AS DECIMAL(38,0)) END) AS sx{k}",
            f"sum(CASE WHEN {p} THEN CAST(l{k} AS DECIMAL(38,0)) END) AS sy{k}",
            f"sum(CASE WHEN {p} THEN CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) END) AS sxx{k}",
            f"sum(CASE WHEN {p} THEN CAST(l{k} AS DECIMAL(19,0)) * CAST(l{k} AS DECIMAL(19,0)) END) AS syy{k}",
            f"sum(CASE WHEN {p} THEN CAST(x AS DECIMAL(19,0)) * CAST(l{k} AS DECIMAL(19,0)) END) AS sxy{k}",
        ]
    corr_cols = ", ".join(
        f"round({_sql_corr_from_sums(f'n{k}', f'sx{k}', f'sy{k}', f'sxx{k}', f'syy{k}', f'sxy{k}')}, 6)"
        f" AS acf{k}"
        for k in lags
    )
    return f"""
        WITH lagged AS (
          SELECT {group_sql} AS g, {value_sql} AS x, {lag_cols}
          FROM {table}
        ), sums AS (
          SELECT g, count(*) AS n, {", ".join(sum_cols)}
          FROM lagged GROUP BY g
        )
        SELECT g AS {group_alias}, n, {corr_cols} FROM sums
    """


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    by: str,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per group, in
    INTEGER arithmetic: for samples A (``flag_col`` false) and B
    (true) with sizes n_a, n_b,

        D = max_x |F_A(x) − F_B(x)|
          = max_x |n_b·C_A(x) − n_a·C_B(x)| / (n_a·n_b)

    where C are cumulative counts at each distinct value. Returning
    the integer numerator plus sizes (and D rounded to 6dp) makes the
    contract hash-exact — no float CDF subtraction anywhere.

    Plan: distinct-value counts (one shuffle on (group, value)), one
    cumulative window per group ordered by value, one closing max per
    group — the window and the final agg share the group partitioning.
    Drift monitoring at 100 TB runs this per feature on the distinct
    value stream, which is bounded by cardinality, not row count.
    """
    per_val = (
        df.groupBy(by, F.col(value_col).alias("__x"))
        .agg(
            F.sum(
                F.when(~F.col(flag_col).cast("boolean"), 1).otherwise(0)
            ).alias("__na"),
            F.sum(
                F.when(F.col(flag_col).cast("boolean"), 1).otherwise(0)
            ).alias("__nb"),
        )
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(by)
    cum = per_val.select(
        by,
        F.sum("__na").over(w).alias("__ca"),
        F.sum("__nb").over(w).alias("__cb"),
        F.sum("__na").over(tot).alias("n_a"),
        F.sum("__nb").over(tot).alias("n_b"),
    )
    return (
        cum.groupBy(by, "n_a", "n_b")
        .agg(
            F.max(
                F.abs(
                    F.col("n_b") * F.col("__ca")
                    - F.col("n_a") * F.col("__cb")
                )
            ).alias("ks_num")
        )
        .select(
            by,
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("ks_num").cast("long").alias("ks_num"),
            # one sample empty → KS undefined (NULL), never a division
            # error (ANSI mode)
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.round(
                    F.col("ks_num") / (F.col("n_a") * F.col("n_b")), 6
                ),
            ).alias("ks"),
        )
    )


def ks_two_sample_oracle_sql(
    table_sql: str,
    value_sql: str,
    flag_sql: str,
    by_sql: str,
    *,
    out_by: str = "g",
) -> str:
    """DuckDB twin of :func:`ks_two_sample` — same integer carriers."""
    return f"""
        WITH per_val AS (
          SELECT {by_sql} AS g, {value_sql} AS x,
                 sum(CASE WHEN NOT ({flag_sql}) THEN 1 ELSE 0 END) AS na,
                 sum(CASE WHEN {flag_sql} THEN 1 ELSE 0 END) AS nb
          FROM {table_sql} GROUP BY 1, 2
        ), cum AS (
          SELECT g,
                 sum(na) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca,
                 sum(nb) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb,
                 sum(na) OVER (PARTITION BY g) AS n_a,
                 sum(nb) OVER (PARTITION BY g) AS n_b
          FROM per_val
        )
        SELECT g AS {out_by},
               CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               CAST(max(abs(n_b * ca - n_a * cb)) AS BIGINT) AS ks_num,
               CASE WHEN n_a > 0 AND n_b > 0 THEN
                 round(CAST(max(abs(n_b * ca - n_a * cb)) AS DOUBLE)
                       / (n_a * n_b), 6)
               END AS ks
        FROM cum GROUP BY g, n_a, n_b
    """


def ic_decay(
    df: DataFrame,
    era_col: str,
    item_col: str,
    metric,
    horizons=(1, 2, 3),
    round_dp: int = 6,
):
    """Information-coefficient decay curve — how fast a cross-sectional
    signal's predictive rank correlation dies with horizon: for each
    month t and horizon h, the exact Spearman correlation between the
    per-item metric at t and at t+h (over items present in BOTH
    months), then the mean IC per horizon. The Numerai/quant staple
    behind "how long is my alpha good for".

    Exactness: per-(h, era) ICs use average-tie ranks + corr rounded
    to ``round_dp`` (the spearman_by_month discipline), then ride
    BIGINT micro-units into the per-horizon mean so the cross-month
    sum is order-independent. Returns (horizon, n_months, mean_ic).

    Plan: one (era, item) aggregation; per horizon an equi-join of
    that table against its era-shifted image (the monthly table is
    aggregated-small — broadcast); rank windows partitioned by
    (horizon, era); two small aggregations. Calendar holes produce no
    pair (same rule as topk_turnover).
    """
    from pyspark.sql import Window

    per = df.groupBy(
        F.col(era_col).alias("__era"), F.col(item_col).alias("__item")
    ).agg(F.sum(metric).alias("__m"))
    # the monthly table is aggregated-small (eras × items) but its
    # lineage is the full-table scan+shuffle, and it feeds 2·|horizons|
    # join sides — cut it once (measured 12.3x at 10x data without the
    # cut, 2.9x with it; the triangle_count edge-list discipline)
    per = per.localCheckpoint(eager=True)
    pairs = None
    for h in horizons:
        # cast back to the era column's own type: add_months yields
        # DateType, and a TimestampType era with any time component
        # would silently miss the join under date->timestamp coercion
        nxt = per.select(
            F.add_months(F.col("__era"), -int(h))
            .cast(df.schema[era_col].dataType)
            .alias("__era"),
            F.col("__item"),
            F.col("__m").alias("__mf"),
        )
        p = (
            per.join(nxt, ["__era", "__item"])
            .select(
                F.lit(int(h)).alias("horizon"), "__era", "__m", "__mf"
            )
        )
        pairs = p if pairs is None else pairs.unionByName(p)

    def _avg_rank(c):
        w = Window.partitionBy("horizon", "__era").orderBy(c)
        wt = Window.partitionBy("horizon", "__era", c)
        return (
            F.rank().over(w).cast("double")
            + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2
        )

    ranked = pairs.select(
        "horizon",
        "__era",
        _avg_rank(F.col("__m")).alias("__rx"),
        _avg_rank(F.col("__mf")).alias("__ry"),
    )
    per_era = ranked.groupBy("horizon", "__era").agg(
        F.round(F.corr("__rx", "__ry"), round_dp).alias("__ic")
    )
    return (
        per_era.where(F.col("__ic").isNotNull())
        .groupBy("horizon")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_months"),
            F.sum(F.round(F.col("__ic") * 1e6).cast("long")).alias("__s"),
        )
        .select(
            "horizon",
            "n_months",
            F.round(
                F.col("__s").cast("double") / F.col("n_months") / 1e6,
                round_dp,
            ).alias("mean_ic"),
        )
    )


def ic_decay_oracle_sql(
    table_sql: str,
    era_sql: str,
    item_sql: str,
    metric_sql: str,
    horizons=(1, 2, 3),
    round_dp: int = 6,
) -> str:
    """DuckDB twin of :func:`ic_decay` (identical rank/corr/micro-unit
    arithmetic)."""
    arms = " UNION ALL ".join(
        f"SELECT {int(h)} AS horizon, a.__era, a.__m, b.__m AS __mf"
        f" FROM per a JOIN per b"
        f" ON b.__era = a.__era + INTERVAL {int(h)} MONTH"
        f" AND b.__item = a.__item"
        for h in horizons
    )
    return f"""
        WITH per AS (
          SELECT {era_sql} AS __era, {item_sql} AS __item,
                 sum({metric_sql}) AS __m
          FROM {table_sql} GROUP BY 1, 2
        ), pairs AS ({arms}),
        ranked AS (
          SELECT horizon, __era,
                 (rank() OVER (PARTITION BY horizon, __era ORDER BY __m)
                  + (count(*) OVER (PARTITION BY horizon, __era, __m) - 1)
                    / 2.0) AS rx,
                 (rank() OVER (PARTITION BY horizon, __era ORDER BY __mf)
                  + (count(*) OVER (PARTITION BY horizon, __era, __mf) - 1)
                    / 2.0) AS ry
          FROM pairs
        ), per_era AS (
          SELECT horizon, __era, round(corr(rx, ry), {round_dp}) AS ic
          FROM ranked GROUP BY horizon, __era
        )
        SELECT horizon, CAST(count(*) AS BIGINT) AS n_months,
               round(CAST(sum(CAST(round(ic * 1e6) AS BIGINT)) AS DOUBLE)
                     / count(*) / 1e6, {round_dp}) AS mean_ic
        FROM per_era WHERE ic IS NOT NULL GROUP BY horizon
    """


def xicor(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
    order_tiebreaks: Sequence[str],
) -> DataFrame:
    """Chatterjee's ξ rank correlation per group (Chatterjee, JASA
    2021) — the modern dependence screen: ≈0 when y ⟂ x, →1 when y is
    any measurable FUNCTION of x (monotone or not), which Pearson/
    Spearman both miss. Tie-aware form:

        ξ = 1 − n·Σᵢ|r_{i+1} − r_i|  /  2·Σᵢ lᵢ(n − lᵢ)

    with rows ordered by x, r_i = #{j: y_j ≤ y_i}, l_i = #{j: y_j ≥
    y_i}. Every quantity is an integer: the two rank counts are
    value-based RANGE-frame counts (peers share a rank — exact under
    ties), the Δr stream is one lag over the x ordering, and both sums
    accumulate as DECIMAL(38,0) (n·Σ|Δr| reaches n³ ≈ 2e29 at 6e9-row
    groups — past BIGINT, inside DECIMAL38). The single division is the
    only IEEE op. ξ depends on the x-order among TIED x values;
    ``order_tiebreaks`` pins that order deterministically (pass stable
    key columns) so the statistic is reproducible cross-engine.

    Scale shape: three windows + one aggregation, ALL partitioned by
    the group key — two value-RANGE sorts on y (asc/desc) and one row
    sort on x, no global window at any scale. Returns (group, n, xi);
    xi is null for constant-y groups (denominator 0).
    """
    g = group_col
    b = df.select(
        F.col(g), x.alias("__x"), y.alias("__y"), *order_tiebreaks
    )
    w_le = (
        Window.partitionBy(g)
        .orderBy("__y")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_ge = (
        Window.partitionBy(g)
        .orderBy(F.col("__y").desc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_x = Window.partitionBy(g).orderBy("__x", *order_tiebreaks)
    d38 = "decimal(38,0)"
    b = (
        b.withColumn("__r", F.count(F.lit(1)).over(w_le))
        .withColumn("__l", F.count(F.lit(1)).over(w_ge))
        .withColumn("__dr", F.abs(F.col("__r") - F.lag("__r").over(w_x)))
    )
    # Σ l(n−l) decomposes to n·Σl − Σl², so the denominator needs no
    # per-row knowledge of n — the group size stays a plain aggregate
    d19 = "decimal(19,0)"  # cast BEFORE the square: long·long clips at ~3e9-row groups
    l19 = F.col("__l").cast(d19)
    agg = b.groupBy(g).agg(
        F.count(F.lit(1)).cast(d38).alias("__n"),
        F.sum(F.col("__dr").cast(d38)).alias("__sdr"),
        F.sum(F.col("__l").cast(d38)).alias("__sl"),
        F.sum(l19 * l19).alias("__sl2"),
    )
    sl = F.col("__n") * F.col("__sl") - F.col("__sl2")
    num = (F.col("__n") * F.col("__sdr")).cast("double")
    den = (F.lit(2).cast(d38) * sl).cast("double")
    return agg.select(
        F.col(g),
        F.col("__n").cast("bigint").alias("n"),
        F.when(sl > 0, F.lit(1.0) - num / den).alias("xi"),
    )


def xicor_oracle_sql(
    table_sql: str,
    group_sql: str,
    x_sql: str,
    y_sql: str,
    tiebreak_sqls: Sequence[str],
) -> str:
    """DuckDB twin of :func:`xicor` — identical RANGE-frame rank
    counts, lag stream, HUGEINT-exact sums (mirror of the Spark
    DECIMAL(38,0) carriers), single division."""
    tb = ", ".join(tiebreak_sqls)
    return f"""
        WITH b AS (
          SELECT {group_sql} AS grp, {x_sql} AS xv, {y_sql} AS yv, {tb}
          FROM {table_sql}
        ), ranked AS (
          SELECT grp, xv, yv, {tb},
                 count(*) OVER (PARTITION BY grp ORDER BY yv
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS r,
                 count(*) OVER (PARTITION BY grp ORDER BY yv DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS l
          FROM b
        ), lagged AS (
          SELECT grp, l,
                 abs(r - lag(r) OVER (PARTITION BY grp
                                      ORDER BY xv, {tb})) AS dr
          FROM ranked
        ), agg AS (
          SELECT grp, CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(CAST(dr AS HUGEINT)) AS HUGEINT) AS sdr,
                 CAST(sum(CAST(l AS HUGEINT)) AS HUGEINT) AS sl1,
                 CAST(sum(CAST(l AS HUGEINT) * CAST(l AS HUGEINT))
                      AS HUGEINT) AS sl2
          FROM lagged GROUP BY grp
        )
        SELECT grp, CAST(n AS BIGINT) AS n,
               CASE WHEN n * sl1 - sl2 > 0
                    THEN 1.0 - CAST(n * sdr AS DOUBLE)
                             / CAST(2 * (n * sl1 - sl2) AS DOUBLE)
               END AS xi
        FROM agg
    """
