"""Table profiling — the warehouse `SUMMARIZE`/`ANALYZE` utility: one
aggregation pass producing per-column statistics (row/null/distinct
counts, min/max, numeric moments) in long format.

Two distinct-count modes, the engine's standard duality:

- ``exact=False`` (scale default): ``approx_count_distinct`` — one HLL
  sketch per column, mergeable map-side, one pass over 100 TB with no
  per-column EXPAND blowup.
- ``exact=True`` (oracle/verification mode): ``count(DISTINCT col)`` —
  Spark plans the multi-column distinct via EXPAND (one row copy per
  profiled column), exact but data-multiplying; right for bounded
  verification scans, wrong as the default at scale.

The wide→long unpivot happens on the SINGLE aggregated row (driver-side
cost zero), never on the data.

Reference scope: the reference has no profiling surface; this is
engine tooling in the SURVEY.md §2.3 spirit (DuckDB's SUMMARIZE is the
model).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    exact: bool = False,
) -> DataFrame:
    """Profile columns in ONE aggregation pass. Returns long-format
    rows (column, n, n_null, n_distinct, min_value, max_value, mean)
    — min/max as strings (type-uniform across columns), mean only for
    numeric columns."""
    names = list(cols) if cols is not None else list(df.columns)
    numeric = {
        f.name
        for f in df.schema
        if f.dataType.typeName()
        in ("integer", "long", "short", "byte", "double", "float", "decimal")
    }
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__nn_{c}"),
            (
                F.countDistinct(col)
                if exact
                else F.approx_count_distinct(col)
            ).alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
            (
                F.avg(col.cast("double"))
                if c in numeric
                else F.lit(None).cast("double")
            ).alias(f"__av_{c}"),
        ]
    wide = df.agg(*aggs)
    # unpivot the single aggregated row — a stack() over literals
    parts = ", ".join(
        f"'{c}', __n - __nn_{c}, __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}, __av_{c}"
        for c in names
    )
    return wide.selectExpr(
        "__n AS n",
        f"stack({len(names)}, {parts}) AS "
        "(column, n_null, n_non_null, n_distinct, min_value, max_value, mean)",
    ).select(
        "column", "n", "n_null", "n_non_null", "n_distinct",
        "min_value", "max_value", F.round("mean", 6).alias("mean"),
    )


def table_profile_oracle_sql(
    table: str, cols: Sequence[str], numeric_cols: Sequence[str]
) -> str:
    """DuckDB mirror of :func:`table_profile(exact=True)` (UNION ALL of
    per-column rows over one aggregated CTE)."""
    aggs = ["count(*) AS n"]
    for c in cols:
        aggs += [
            f"count({c}) AS nn_{c}",
            f"count(DISTINCT {c}) AS nd_{c}",
            f"CAST(min({c}) AS VARCHAR) AS mn_{c}",
            f"CAST(max({c}) AS VARCHAR) AS mx_{c}",
        ]
        if c in set(numeric_cols):
            aggs.append(f"avg(CAST({c} AS DOUBLE)) AS av_{c}")
    rows = []
    for c in cols:
        av = f"round(av_{c}, 6)" if c in set(numeric_cols) else "CAST(NULL AS DOUBLE)"
        rows.append(
            f"SELECT '{c}' AS column, n, n - nn_{c} AS n_null,"
            f" nn_{c} AS n_non_null, nd_{c} AS n_distinct,"
            f" mn_{c} AS min_value, mx_{c} AS max_value, {av} AS mean FROM g"
        )
    return (
        f"WITH g AS (SELECT {', '.join(aggs)} FROM {table}) "
        + " UNION ALL ".join(rows)
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    *,
    min_share: float = 0.01,
    exact: bool = True,
    support: float | None = None,
) -> DataFrame:
    """Values of ``col`` occurring in at least ``min_share`` of rows —
    the heavy-hitters / frequent-items profile (skew diagnosis: the
    keys that need salting; vocabulary heads; bot traffic).

    exact=True (default): one full groupBy count + a total-count
    scalar, returns (value, n, share) with exact counts — the right
    mode whenever the distinct-value count fits a shuffle, which a
    count aggregation handles at any corpus scale.

    exact=False: Spark's built-in Misra-Gries sketch
    (``df.stat.freqItems``) — one pass, bounded memory, NO exact
    counts (returns candidate values only, share/n null), may include
    false positives just under the threshold; right when distinct
    values are data-scale (user ids). ``support`` overrides the MG
    support parameter (defaults to min_share)."""
    if not 0 < min_share <= 1:
        raise ValueError(f"min_share must be in (0, 1], got {min_share}")
    spark = df.sparkSession
    if exact:
        counts = df.groupBy(F.col(col).alias("value")).agg(
            F.count(F.lit(1)).alias("n")
        )
        # total as a broadcast scalar cross-join (the oracle's one-row
        # CTE): one scan of the data (the counts shuffle is reused by
        # both consumers), and — unlike an unpartitioned window over
        # the counts frame — no single-task pass over what can be a
        # data-scale distinct-value set (user ids)
        total = counts.agg(F.sum("n").alias("__total"))
        return (
            counts.crossJoin(F.broadcast(total))
            .where(F.col("n") >= F.col("__total") * min_share)
            .select(
                "value",
                "n",
                F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            )
            .orderBy(F.col("n").desc(), F.col("value").asc())
        )
    [row] = df.stat.freqItems([col], support or min_share).collect()
    values = row[f"{col}_freqItems"]
    return spark.createDataFrame(
        [(v, None, None) for v in values],
        schema=(
            df.select(F.col(col).alias("value")).schema
            .add("n", "long").add("share", "double")
        ),
    )


def heavy_hitters_oracle_sql(
    table: str, col_sql: str, *, min_share: float = 0.01
) -> str:
    """DuckDB mirror of :func:`heavy_hitters(exact=True)`."""
    return f"""
        WITH __tot AS (SELECT count(*) AS total FROM {table}),
        __cnt AS (
          SELECT {col_sql} AS value, count(*) AS n
          FROM {table} GROUP BY 1
        )
        SELECT value, n, round(CAST(n AS DOUBLE) / total, 6) AS share
        FROM __cnt CROSS JOIN __tot
        WHERE n >= total * {min_share!r}
        ORDER BY n DESC, value ASC
    """


def join_skew_audit(
    df: DataFrame,
    key_cols: list,
) -> DataFrame:
    """Pre-join key-skew audit — the numbers that decide a 100 TB
    join strategy BEFORE it runs: per candidate join key, exact row /
    NULL / distinct-key counts, the hottest key and its share, the
    max-to-average skew ratio, and the p50/p99 of the per-key count
    distribution. top1_share_milli ≳ a few hundred means one key owns
    the join (salt it or broadcast the other side); skew_milli is
    max_cnt/avg_cnt in milli-units (1000 = perfectly uniform); NULL
    keys never match a join and are reported separately, excluded
    from the skew stats.

    Exactness: every output is an integer decided by counts and
    integer cross-multiplication (type-1 quantiles via the
    weighted_quantiles rule; shares via nonnegative floor division —
    floor == trunc here).

    Scale: ONE scan of the fact table — the keys are exploded into
    (key_name, value) pairs (|key_cols|× the rows, map-side) and
    counted with one map-side-combined groupBy; everything after
    runs on the per-key count table and its value-frequency rollup
    (distinct count VALUES — tiny). The hottest-key lookup joins the
    count table against the per-key max (broadcast, key_cols rows).
    No window ever spans an unpartitioned data-scale frame. Output:
    one row per audited key, (key_name, n_rows, n_null, n_keys,
    max_cnt, p50_cnt, p99_cnt, top_key, top1_share_milli,
    skew_milli)."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.col(k).cast("string").alias("v"),
                    )
                    for k in key_cols
                ]
            )
        ).alias("p")
    ).select("p.k", "p.v")
    # the count table feeds FIVE consumers (nulls / per-key aggs /
    # hottest key / value-frequency rollup); without a lineage cut
    # each one re-executes the corpus scan (measured: 6 FileScans in
    # the plan). Checkpoint it: the table is key-cardinality, and the
    # corpus is scanned exactly once to build it.
    counts = (
        pairs.groupBy("k", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    nulls = counts.where(F.col("v").isNull()).select(
        "k", F.col("cnt").alias("n_null")
    )
    nonnull = counts.where(F.col("v").isNotNull())
    per_key = nonnull.groupBy("k").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    # hottest key: deterministic max-value tiebreak among keys at
    # max_cnt (the count table is per-key-cardinality, the join side
    # `per_key` is |key_cols| rows — broadcast)
    top = (
        nonnull.join(
            F.broadcast(per_key.select("k", "max_cnt")), "k"
        )
        .where(F.col("cnt") == F.col("max_cnt"))
        .groupBy("k")
        .agg(F.max("v").alias("top_key"))
    )
    # count-distribution quantiles over the VALUE-FREQUENCY rollup:
    # distinct per-key counts are few even when keys are data-scale
    freq = nonnull.groupBy("k", "cnt").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    from pyspark.sql import Window

    w_cum = Window.partitionBy("k").orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = freq.withColumn("c", F.sum("f").over(w_cum)).join(
        F.broadcast(per_key.select("k", "n_keys")), "k"
    )
    quants = cum.groupBy("k").agg(
        F.min(
            F.when(F.col("c") * 2 >= F.col("n_keys"), F.col("cnt"))
        ).cast("long").alias("p50_cnt"),
        F.min(
            F.when(F.col("c") * 100 >= 99 * F.col("n_keys"), F.col("cnt"))
        ).cast("long").alias("p99_cnt"),
    )
    out = (
        per_key.join(nulls, "k", "left")
        .join(top, "k", "left")
        .join(quants, "k", "left")
    )
    # exact nonnegative floor division (floor == trunc) in decimal —
    # a double quotient would round above 2^53 at data-scale counts
    d38 = "decimal(38,0)"

    def _fdiv(num, den):
        num = num.cast(d38)
        den = den.cast(d38)
        return ((num - F.pmod(num, den)) / den).cast("long")

    share = _fdiv(
        F.lit(1000).cast(d38) * F.col("max_cnt").cast(d38), F.col("n_rows")
    )
    skew = _fdiv(
        F.lit(1000).cast(d38)
        * F.col("max_cnt").cast(d38)
        * F.col("n_keys").cast(d38),
        F.col("n_rows"),
    )
    return out.select(
        F.col("k").alias("key_name"),
        "n_rows",
        F.coalesce(F.col("n_null"), F.lit(0)).cast("long").alias("n_null"),
        "n_keys",
        "max_cnt",
        "p50_cnt",
        "p99_cnt",
        "top_key",
        share.alias("top1_share_milli"),
        skew.alias("skew_milli"),
    )


def join_skew_audit_oracle_sql(table: str, key_cols: list) -> str:
    """DuckDB mirror of :func:`join_skew_audit`."""
    unions = " UNION ALL ".join(
        f"SELECT '{k}' AS k, CAST({k} AS VARCHAR) AS v FROM {table}"
        for k in key_cols
    )
    return f"""
        WITH pairs AS ({unions}),
        counts AS (
          SELECT k, v, CAST(count(*) AS BIGINT) AS cnt
          FROM pairs GROUP BY k, v
        ), nulls AS (
          SELECT k, cnt AS n_null FROM counts WHERE v IS NULL
        ), nonnull AS (
          SELECT * FROM counts WHERE v IS NOT NULL
        ), per_key AS (
          SELECT k,
                 CAST(sum(cnt) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_keys,
                 CAST(max(cnt) AS BIGINT) AS max_cnt
          FROM nonnull GROUP BY k
        ), top AS (
          SELECT n.k, max(n.v) AS top_key
          FROM nonnull n JOIN per_key p
            ON n.k = p.k AND n.cnt = p.max_cnt
          GROUP BY n.k
        ), freq AS (
          SELECT k, cnt, CAST(count(*) AS BIGINT) AS f
          FROM nonnull GROUP BY k, cnt
        ), cum AS (
          SELECT f.k, f.cnt,
                 sum(f.f) OVER (PARTITION BY f.k ORDER BY f.cnt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS c,
                 p.n_keys
          FROM freq f JOIN per_key p ON f.k = p.k
        ), quants AS (
          SELECT k,
                 CAST(min(CASE WHEN c * 2 >= n_keys THEN cnt END)
                      AS BIGINT) AS p50_cnt,
                 CAST(min(CASE WHEN c * 100 >= 99 * n_keys THEN cnt END)
                      AS BIGINT) AS p99_cnt
          FROM cum GROUP BY k
        )
        SELECT p.k AS key_name, p.n_rows,
               CAST(coalesce(nu.n_null, 0) AS BIGINT) AS n_null,
               p.n_keys, p.max_cnt, q.p50_cnt, q.p99_cnt, t.top_key,
               CAST((1000 * CAST(p.max_cnt AS HUGEINT)) // p.n_rows
                    AS BIGINT) AS top1_share_milli,
               CAST((1000 * CAST(p.max_cnt AS HUGEINT) * p.n_keys)
                    // p.n_rows AS BIGINT) AS skew_milli
        FROM per_key p
        LEFT JOIN nulls nu ON p.k = nu.k
        LEFT JOIN top t ON p.k = t.k
        LEFT JOIN quants q ON p.k = q.k
    """


def benford_check(
    df: DataFrame,
    value_col: str,
    *,
    round_dp: int = 6,
) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881 / Benford 1938;
    Nigrini's fraud screen): observed leading-digit distribution of
    |value| vs the expected log10(1 + 1/d), with the chi-square
    statistic contribution per digit. Values with no leading nonzero
    digit (0 / NULL) are excluded.

    One grouped count over a map-side digit extraction + broadcast
    totals — the scan is touched once. Digit extraction is string-based
    (first nonzero char of the integer rendering of |value| scaled to
    an integer) — exact, no float log tricks; expected shares and
    chi² terms are IEEE arithmetic rounded to ``round_dp``, identical
    in the DuckDB mirror. Returns
    (digit, n, share, expected, chi2_term)."""
    import math

    v = F.abs(F.col(value_col).cast("double"))
    # leading digit of a positive double: strip '0.'/'.'/zeros from the
    # plain-decimal rendering. format_number avoids scientific notation.
    s = F.regexp_replace(
        F.format_number(v, 10), "[.,0]*", ""
    )
    # a sub-1e-10 value renders as all zeros -> '' -> excluded via the
    # rlike guard (ANSI cast of '' would throw; Column.try_cast only
    # exists from PySpark 4.0 and pyproject declares >=3.5 — ADVICE r5)
    first = F.substring(s, 1, 1)
    digit = F.when((v > 0) & first.rlike("^[0-9]$"), first.cast("int"))
    counts = (
        df.select(digit.alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    j = counts.crossJoin(F.broadcast(tot))
    share = F.col("n").cast("double") / F.col("__t").cast("double")
    expected_map = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(math.log10(1 + 1 / d)))
        ]
    )
    expected = expected_map[F.col("digit")]
    chi2 = (
        (share - expected) * (share - expected) / expected
        * F.col("__t").cast("double")
    )
    return j.select(
        "digit",
        "n",
        F.round(share, round_dp).alias("share"),
        F.round(expected, round_dp).alias("expected"),
        F.round(chi2, round_dp).alias("chi2_term"),
    )


def benford_check_oracle_sql(
    table_sql: str,
    value_sql: str,
    *,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`benford_check`: identical string-based
    digit extraction (format '%.10f' rendering == format_number up to
    the stripped characters) and literal expected shares."""
    import math

    exp_case = " ".join(
        f"WHEN {d} THEN {math.log10(1 + 1 / d)!r}" for d in range(1, 10)
    )
    v = f"abs(CAST({value_sql} AS DOUBLE))"
    s = f"regexp_replace(format('{{:.10f}}', {v}), '[.,0]*', '', 'g')"
    return f"""
        WITH digits AS (
          SELECT TRY_CAST(substr({s}, 1, 1) AS INTEGER) AS digit
          FROM {table_sql} WHERE {v} > 0
        ), counts AS (
          SELECT digit, CAST(count(*) AS BIGINT) AS n
          FROM digits WHERE digit IS NOT NULL GROUP BY digit
        ), tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t FROM counts)
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / t, {round_dp}) AS share,
               round(CASE digit {exp_case} END, {round_dp}) AS expected,
               round((CAST(n AS DOUBLE) / t - CASE digit {exp_case} END)
                     * (CAST(n AS DOUBLE) / t - CASE digit {exp_case} END)
                     / (CASE digit {exp_case} END) * t,
                     {round_dp}) AS chi2_term
        FROM counts CROSS JOIN tot
    """


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the "are these two labelings related" audit (language ×
    source drift, segment × priority mix, …). Null categories are
    first-class levels (kept as their own row/column).

    Distributed shape: ONE (row, col) count aggregation (map-side
    partial) collapses the data to r·c cells; margins and the full
    r×c grid (zero cells included — a chi-square over observed cells
    only would be wrong) are computed FROM the cell table, so nothing
    after the first aggregation is data-sized.

    Exactness: O, margins, N are exact BIGINTs; each cell's
    (O−E)²/E evaluates in one fixed IEEE order and rounds to 6dp
    micro-units, so the statistic is an exact integer sum
    (order-independent). Returns one row:
    (n, r_levels, c_levels, dof, chi2).
    """
    cells = (
        df.select(
            # null levels become an explicit sentinel so the grid join
            # (an equality join) keeps them as first-class cells
            F.coalesce(F.col(row_col).cast("string"), F.lit("<NULL>")).alias(
                "r"
            ),
            F.coalesce(F.col(col_col).cast("string"), F.lit("<NULL>")).alias(
                "c"
            ),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rm = cells.groupBy("r").agg(F.sum("o").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("o").alias("cn"))
    tot = cells.agg(F.sum("o").alias("n"))
    grid = (
        rm.crossJoin(cm)
        .join(cells, ["r", "c"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (
                F.col("rn").cast("double")
                * F.col("cn").cast("double")
                / F.col("n").cast("double")
            ).alias("e"),
        )
    )
    terms = grid.select(
        "n",
        F.round(
            (F.col("o").cast("double") - F.col("e"))
            * (F.col("o").cast("double") - F.col("e"))
            / F.col("e")
            * 1e6
        ).cast("long").alias("t_u"),
    )
    out = terms.groupBy("n").agg(F.sum("t_u").alias("chi_u"))
    shape = rm.agg(F.count(F.lit(1)).alias("rl")).crossJoin(
        cm.agg(F.count(F.lit(1)).alias("cl"))
    )
    return out.crossJoin(F.broadcast(shape)).select(
        F.col("n").cast("long").alias("n"),
        F.col("rl").cast("long").alias("r_levels"),
        F.col("cl").cast("long").alias("c_levels"),
        ((F.col("rl") - 1) * (F.col("cl") - 1)).cast("long").alias("dof"),
        (F.col("chi_u").cast("double") / 1e6).alias("chi2"),
    )


def chi2_independence_oracle_sql(
    table_sql: str,
    row_sql: str,
    col_sql: str,
) -> str:
    """DuckDB mirror of :func:`chi2_independence` — identical grid
    construction (zero cells included), IEEE evaluation order, and
    6dp micro-unit term carriers."""
    return f"""
        WITH cells AS (
          SELECT coalesce(CAST({row_sql} AS VARCHAR), '<NULL>') AS r,
                 coalesce(CAST({col_sql} AS VARCHAR), '<NULL>') AS c,
                 count(*) AS o
          FROM {table_sql} GROUP BY 1, 2
        ), rm AS (SELECT r, sum(o) AS rn FROM cells GROUP BY r),
        cm AS (SELECT c, sum(o) AS cn FROM cells GROUP BY c),
        tot AS (SELECT sum(o) AS n FROM cells),
        grid AS (
          SELECT rm.r, cm.c, tot.n,
                 coalesce(cells.o, 0) AS o,
                 CAST(rn AS DOUBLE) * CAST(cn AS DOUBLE)
                   / CAST(tot.n AS DOUBLE) AS e
          FROM rm CROSS JOIN cm
          LEFT JOIN cells ON cells.r = rm.r AND cells.c = cm.c
          CROSS JOIN tot
        ), terms AS (
          SELECT n,
                 CAST(round((CAST(o AS DOUBLE) - e)
                   * (CAST(o AS DOUBLE) - e) / e * 1e6) AS BIGINT) AS t_u
          FROM grid
        )
        SELECT CAST(n AS BIGINT) AS n,
               (SELECT CAST(count(*) AS BIGINT) FROM rm) AS r_levels,
               (SELECT CAST(count(*) AS BIGINT) FROM cm) AS c_levels,
               (SELECT CAST((count(*) - 1) AS BIGINT) FROM rm)
                 * (SELECT CAST((count(*) - 1) AS BIGINT) FROM cm) AS dof,
               CAST(sum(t_u) AS DOUBLE) / 1e6 AS chi2
        FROM terms GROUP BY n
    """


# ------------------------------------------------------------- benford

# floor(1e6 * log10(1 + 1/d)) for d = 1..9 — shared integer literals
# (the AS241/DCT discipline: the irrational constants enter BOTH
# engines as the same fixed-point table, so nothing transcendental is
# ever evaluated at query time)
BENFORD_MICRO = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


def benford_audit(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Benford first-digit conformance audit per group — the classic
    fabricated-data / data-quality screen (Benford 1938; Nigrini's
    forensic use): compare each group's first-significant-digit
    distribution of a positive amount column against Benford's law
    and report the exact per-digit chi-square contributions.

    Exactness: the amount becomes the proven centi-unit integer
    round(v*100); its first digit is the first character of the
    INTEGER's decimal string (both engines render integers
    identically — no float log10, whose 1-ulp error at powers of ten
    would flip digits). Expected counts use the shared
    ``BENFORD_MICRO`` fixed-point table; the per-digit statistic
    floor((c_d*1e6 - p_d*n)^2 / (p_d*n)) is a deterministic integer
    (micro-units of the chi-square term). Rows with round(v*100) <= 0
    are excluded (no first significant digit).

    Output: one row per (grp, digit 1..9) — n (group total), c
    (observed), e_micro (expected count, micro-units),
    chi2_term_micro. Digits a group never produced still appear
    (c = 0), so the statistic is complete.

    Scale: one map-side-combined (group, digit) count, then a
    broadcast fan-out of the 9-digit universe per group — the only
    data-sized operation is the first aggregation."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"), cents.alias("__m")
    ).where(F.col("__m") > 0)
    digits = base.select(
        "grp",
        F.substring(F.col("__m").cast("string"), 1, 1)
        .cast("int")
        .alias("digit"),
    )
    counts = digits.groupBy("grp", "digit").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = counts.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n")
    )
    universe = totals.select(
        "grp",
        "n",
        F.explode(
            F.array(*[F.lit(d) for d in range(1, 10)])
        ).alias("digit"),
    )
    p_micro = F.element_at(
        F.array(*[F.lit(BENFORD_MICRO[d]) for d in range(1, 10)]),
        F.col("digit"),
    ).cast("long")
    d38 = "decimal(38,0)"
    e = (p_micro.cast(d38) * F.col("n").cast(d38)).cast(d38)
    joined = universe.join(counts, ["grp", "digit"], "left").select(
        "grp",
        "digit",
        "n",
        F.coalesce("c", F.lit(0).cast("long")).alias("c"),
        e.alias("__e"),
    )
    dev = (
        F.col("c").cast(d38) * F.lit(1_000_000).cast(d38) - F.col("__e")
    ).cast(d38)
    num = (dev * dev).cast(d38)
    term = ((num - F.pmod(num, F.col("__e"))) / F.col("__e")).cast(
        "long"
    )
    return joined.select(
        "grp",
        "digit",
        "n",
        "c",
        F.col("__e").cast("long").alias("e_micro"),
        term.alias("chi2_term_micro"),
    )


def benford_audit_oracle_sql(
    table: str,
    group_sql: str,
    value_sql: str,
) -> str:
    """DuckDB mirror of :func:`benford_audit` (HUGEINT; same
    fixed-point Benford table, same string first digit)."""
    vals = ", ".join(
        f"({d}, {BENFORD_MICRO[d]})" for d in range(1, 10)
    )
    return f"""
        WITH benford(digit, p_micro) AS (VALUES {vals}),
        base AS (
          SELECT {group_sql} AS grp,
                 CAST(round({value_sql} * 100) AS BIGINT) AS m
          FROM {table}
          WHERE CAST(round({value_sql} * 100) AS BIGINT) > 0
        ), counts AS (
          SELECT grp,
                 CAST(substring(CAST(m AS VARCHAR), 1, 1) AS INTEGER)
                   AS digit,
                 CAST(count(*) AS BIGINT) AS c
          FROM base GROUP BY 1, 2
        ), totals AS (
          SELECT grp, CAST(sum(c) AS BIGINT) AS n
          FROM counts GROUP BY grp
        ), universe AS (
          SELECT t.grp, t.n, b.digit, b.p_micro
          FROM totals t CROSS JOIN benford b
        )
        SELECT u.grp, u.digit, u.n,
               CAST(coalesce(c.c, 0) AS BIGINT) AS c,
               CAST(CAST(u.p_micro AS HUGEINT) * u.n AS BIGINT)
                 AS e_micro,
               CAST(
                 (CAST(coalesce(c.c, 0) AS HUGEINT) * 1000000
                  - CAST(u.p_micro AS HUGEINT) * u.n)
                 * (CAST(coalesce(c.c, 0) AS HUGEINT) * 1000000
                    - CAST(u.p_micro AS HUGEINT) * u.n)
                 // (CAST(u.p_micro AS HUGEINT) * u.n)
               AS BIGINT) AS chi2_term_micro
        FROM universe u
        LEFT JOIN counts c ON c.grp = u.grp AND c.digit = u.digit
    """
