"""Per-era long-short decile backtest of a cross-sectional signal —
the standard "does this factor pay" readout for the reference's panel
workflow (rank/lag features → signal → per-era evaluation; the
reference evaluates with per-era Spearman, `ml/losses.py` /
`spearman_by_month` — this adds the portfolio-return view).

Semantics per era: rank tickers by (signal desc, ticker asc); map
ranks to ``n_bins`` equal-population bins with the integer rank cut
bin = ((rank−1)·n_bins) // n_era + 1 (bin 1 = TOP of the signal);
long return = mean forward return of bin 1, short = of bin n_bins,
spread = long − short; plus the running cumulative spread over eras.
Eras with fewer than ``n_bins`` observed rows are DROPPED (with
n ≥ n_bins the bottom bin is provably non-empty: (n−1)·B//n ≥ B−1
iff n ≥ B — so no leg can be degenerate).

Exactness: forward returns enter as BIGINT micro-units; each bin
mean is rounded to integer micro-units via the half-up formula
floor((2·s + n) / (2·n)), computed as a TRUE integer floor division
(pmod-adjusted numerator, quotient through an exact decimal carrier;
DuckDB mirror uses ``//`` on the same adjusted numerator) — no double
carrier anywhere, so the result is exact for ANY representable BIGINT
sums, with no 2^53 bound.  This avoids both the
double-round-at-representable-boundary divergence (Spark BigDecimal
HALF_UP vs C round) that a round(sum/1e6/n, 6) formulation hits and
the large-carrier drift a floor-of-double-division formulation has.

Scale: one rank window per era (the era exchange), one map-side
partially-aggregated (era, bin) sum, and a final ordered window over
ONE ROW PER ERA — never data-sized. Eras at 100 TB are months/days:
thousands of window groups, each aggregated before the tiny cumsum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["long_short_backtest", "long_short_backtest_oracle_sql"]


def long_short_backtest(
    df: DataFrame,
    era_col: str,
    ticker_col: str,
    signal_col: str,
    ret_u_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Backtest ``signal_col`` against exact micro-unit forward
    returns ``ret_u_col``. Rows with a null signal or null return are
    excluded from both ranking and returns (an era's population is
    its fully-observed rows). Returns one row per era:
    (era, n, long_ret, short_ret, spread, cum_spread)."""
    base = df.where(
        F.col(signal_col).isNotNull() & F.col(ret_u_col).isNotNull()
    ).select(
        F.col(era_col).alias("era"),
        F.col(ticker_col).alias("tkr"),
        F.col(signal_col).alias("sig"),
        F.col(ret_u_col).cast("long").alias("ret_u"),
    )
    w = Window.partitionBy("era").orderBy(
        F.col("sig").desc(), F.col("tkr").asc()
    )
    n_era = Window.partitionBy("era")
    binned = base.select(
        "era",
        "ret_u",
        # explicit floor: Spark's long-cast of a fractional division
        # TRUNCATES while DuckDB's CAST ROUNDS — floor() agrees (and is
        # the intended integer rank cut; operands are non-negative)
        F.floor(
            ((F.row_number().over(w) - 1) * n_bins)
            / F.count(F.lit(1)).over(n_era)
        ).cast("long").alias("bin0"),
    )
    per_bin = (
        binned.where((F.col("bin0") == 0) | (F.col("bin0") == n_bins - 1))
        .groupBy("era")
        .agg(
            F.count(F.lit(1)).alias("n_ls"),
            F.sum(F.when(F.col("bin0") == 0, F.col("ret_u"))).alias("l_u"),
            F.count(F.when(F.col("bin0") == 0, 1)).alias("l_n"),
            F.sum(
                F.when(F.col("bin0") == n_bins - 1, F.col("ret_u"))
            ).alias("s_u"),
            F.count(F.when(F.col("bin0") == n_bins - 1, 1)).alias("s_n"),
        )
    )
    n_tot = binned.groupBy("era").agg(F.count(F.lit(1)).alias("n"))

    def mean_u(s, n):
        # half-up integer rounding of s/n in micro-units: the TRUE
        # integer floor of (2s+n)/(2n), computed without a double
        # carrier — subtract the non-negative pmod remainder, then the
        # now-exactly-divisible quotient through DECIMAL(38,0) (exact
        # for any BIGINT operands; a double division would drift past
        # 2^53). DuckDB mirror: ((a - ((a%b)+b)%b) // b).
        a = 2 * F.col(s) + F.col(n)
        b = 2 * F.col(n)
        adj = (a - F.pmod(a, b)).cast("decimal(38,0)")
        return (adj / b.cast("decimal(38,0)")).cast("long")

    eras = (
        n_tot.where(F.col("n") >= n_bins).join(per_bin, "era")
        .withColumn("__l_mu", mean_u("l_u", "l_n"))
        .withColumn("__s_mu", mean_u("s_u", "s_n"))
        .select(
            "era",
            F.col("n").cast("long").alias("n"),
            (F.col("__l_mu").cast("double") / 1e6).alias("long_ret"),
            (F.col("__s_mu").cast("double") / 1e6).alias("short_ret"),
            (
                (F.col("__l_mu") - F.col("__s_mu")).cast("double") / 1e6
            ).alias("spread"),
            (F.col("__l_mu") - F.col("__s_mu")).alias("__sp_u"),
        )
    )
    cum = Window.orderBy("era").rowsBetween(Window.unboundedPreceding, 0)
    # the ordered window runs over ONE ROW PER ERA (bounded, never
    # data-sized) — the accepted tiny-summary-window pattern
    return eras.select(
        "era",
        "n",
        "long_ret",
        "short_ret",
        "spread",
        (F.sum("__sp_u").over(cum).cast("double") / 1e6).alias(
            "cum_spread"
        ),
    )


def long_short_backtest_oracle_sql(
    panel_sql: str,
    era_sql: str = "era",
    ticker_sql: str = "tkr",
    signal_sql: str = "sig",
    ret_u_sql: str = "ret_u",
    n_bins: int = 10,
) -> str:
    """DuckDB twin of :func:`long_short_backtest` over ``panel_sql``
    (a table expression with era/ticker/signal/micro-unit-return
    columns) — identical rank cuts, division order, 6dp roundings,
    and micro-unit cumulative sum."""
    return f"""
        WITH base AS (
          SELECT {era_sql} AS era, {ticker_sql} AS tkr, {signal_sql} AS sig,
                 CAST({ret_u_sql} AS BIGINT) AS ret_u
          FROM {panel_sql}
          WHERE {signal_sql} IS NOT NULL AND {ret_u_sql} IS NOT NULL
        ), binned AS (
          SELECT era, ret_u,
                 CAST(floor(((row_number() OVER (PARTITION BY era
                          ORDER BY sig DESC, tkr ASC) - 1) * {n_bins})
                      / count(*) OVER (PARTITION BY era)) AS BIGINT) AS bin0
          FROM base
        ), per_bin AS (
          SELECT era,
                 sum(CASE WHEN bin0 = 0 THEN ret_u END) AS l_u,
                 count(CASE WHEN bin0 = 0 THEN 1 END) AS l_n,
                 sum(CASE WHEN bin0 = {n_bins - 1} THEN ret_u END) AS s_u,
                 count(CASE WHEN bin0 = {n_bins - 1} THEN 1 END) AS s_n
          FROM binned WHERE bin0 = 0 OR bin0 = {n_bins - 1}
          GROUP BY era
        ), n_tot AS (
          SELECT era, count(*) AS n FROM binned GROUP BY era
          HAVING count(*) >= {n_bins}
        ), eras AS (
          SELECT n_tot.era, CAST(n AS BIGINT) AS n,
                 CAST(((2 * l_u + l_n)
                       - (((2 * l_u + l_n) % (2 * l_n)) + 2 * l_n)
                         % (2 * l_n)) // (2 * l_n) AS BIGINT) AS l_mu,
                 CAST(((2 * s_u + s_n)
                       - (((2 * s_u + s_n) % (2 * s_n)) + 2 * s_n)
                         % (2 * s_n)) // (2 * s_n) AS BIGINT) AS s_mu
          FROM n_tot JOIN per_bin ON n_tot.era = per_bin.era
        )
        SELECT era, n,
               CAST(l_mu AS DOUBLE) / 1e6 AS long_ret,
               CAST(s_mu AS DOUBLE) / 1e6 AS short_ret,
               CAST(l_mu - s_mu AS DOUBLE) / 1e6 AS spread,
               CAST(sum(l_mu - s_mu) OVER (ORDER BY era
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE) / 1e6 AS cum_spread
        FROM eras
    """
