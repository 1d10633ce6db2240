"""Mann-Whitney U two-sample test with EXACT integer statistics —
the classic nonparametric "did the distribution shift" test (Mann &
Whitney 1947) beside the drift family's PSI / KS / Page-Hinkley
(reference scope: the engine's evaluation surface, e.g.
/root/reference/src/centimators/ — drift diagnostics).

Exactness (hash-proven contract): with average-tie ranks, 2×rank is
the integer 2·minrank + t − 1 (t = tie-block size), so twice the
rank sum R2, the statistic U2 = R2_A − n_A(n_A+1) (= 2·U), the mean
numerator mu2 = n_A·n_B (= 2·E[U]) and the tie-corrected variance
carriers

    var_num = n_A·n_B·((n+1)·n·(n−1) − Σ(t³−t)),  var_den = 12·n·(n−1)

are all plain integers both engines compute identically (z and
p-values need a sqrt — callers derive them; the CONTRACT carries the
exact rationals). var_num ships as a decimal-exact STRING;
var_den = 12n(n-1) is the BIGINT-limiting carrier, guarded by an
ANSI-independent assert_true at n = 876e6 rows per group (the
decimal→long cast alone errors only under ANSI; a non-ANSI session
would NULL it silently while the DuckDB oracle raises — the same
cross-engine divergence the isotonic lcm guard closes).

Scale: one rank window per group over the combined sample (the only
data-sized shuffle — same key as the group-by that follows), one
tie aggregation on (group, value), then group-cardinality outputs.
No pair join, no cross product."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_D38 = "decimal(38,0)"

# largest per-group n with 12n(n-1) <= 2^63 - 1 (var_den BIGINT-safe)
MWU_MAX_N = 876_000_000


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    side_col: str,
    value_col: str,
) -> DataFrame:
    """Per group: exact Mann-Whitney carriers comparing the two
    sides of boolean/numeric ``side_col`` (side A = truthy — any
    nonzero value counts as side A, normalized as (side <> 0) on the
    UNTRUNCATED double-cast column on BOTH engines: an int-first cast
    would truncate fractional sides on Spark but round them in
    DuckDB, classifying e.g. 0.5 to opposite sides cross-engine —
    round-11 advice).
    Values are compared as centi-unit integers round(v*100) (the
    proven portable carrier). Output: (grp, n_a, n_b, u2, mu2,
    var_num, var_den) — groups missing a side are omitted (no test
    to run)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    truthy = (F.col(side_col).cast("double") != 0).cast("int")
    base = df.select(
        F.col(group_col).alias("grp"),
        truthy.alias("__a"),
        cents.alias("__v"),
    ).where(F.col("__v").isNotNull() & F.col("__a").isNotNull())
    # NULL values carry no rank information and the two engines order
    # NULLs differently (Spark nulls-first, DuckDB nulls-last) — they
    # are excluded from the test on BOTH engines
    w_rank = Window.partitionBy("grp").orderBy("__v")
    ranked = base.withColumn("__minr", F.rank().over(w_rank)).withColumn(
        "__t",
        F.count(F.lit(1)).over(Window.partitionBy("grp", "__v")),
    )
    # 2 x average tie rank = 2*minrank + t - 1 (integer)
    r2 = (2 * F.col("__minr") + F.col("__t") - 1).cast("long")
    stats = ranked.groupBy("grp").agg(
        F.sum(F.col("__a").cast("long")).cast("long").alias("n_a"),
        F.sum(1 - F.col("__a").cast("long")).cast("long").alias("n_b"),
        F.sum(F.when(F.col("__a") == 1, r2).otherwise(F.lit(0)))
        .cast("long")
        .alias("r2_a"),
    )
    ties = (
        base.groupBy("grp", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .groupBy("grp")
        .agg(
            F.sum(
                (
                    F.col("t").cast(_D38)
                    * F.col("t").cast(_D38)
                    * F.col("t").cast(_D38)
                    - F.col("t").cast(_D38)
                )
            )
            .cast(_D38)
            .alias("tie_cube")
        )
    )
    j = stats.join(ties, "grp").where(
        (F.col("n_a") > 0) & (F.col("n_b") > 0)
    )
    # BIGINT-safe bound for var_den = 12n(n-1): raises at execution in
    # BOTH ANSI and non-ANSI sessions (the decimal->long cast alone
    # NULLs silently under non-ANSI while DuckDB raises on HUGEINT ->
    # BIGINT overflow — a silent cross-engine divergence otherwise)
    j = j.where(
        F.assert_true(
            (F.col("n_a") + F.col("n_b")) <= MWU_MAX_N,
            F.lit("mann_whitney_u: group exceeds MWU_MAX_N rows"),
        ).isNull()
    )
    na = F.col("n_a").cast(_D38)
    nb = F.col("n_b").cast(_D38)
    n = (na + nb).cast(_D38)
    u2 = (
        F.col("r2_a").cast(_D38) - na * (na + F.lit(1).cast(_D38))
    ).cast(_D38)
    var_num = (
        na
        * nb
        * (
            (n + F.lit(1).cast(_D38)) * n * (n - F.lit(1).cast(_D38))
            - F.col("tie_cube")
        )
    ).cast(_D38)
    var_den = (
        F.lit(12).cast(_D38) * n * (n - F.lit(1).cast(_D38))
    ).cast(_D38)
    return j.select(
        "grp",
        "n_a",
        "n_b",
        u2.cast("long").alias("u2"),
        (na * nb).cast("long").alias("mu2"),
        var_num.cast("decimal(38,0)").cast("string").alias("var_num"),
        var_den.cast("long").alias("var_den"),
    )


def mann_whitney_u_oracle_sql(
    table: str,
    group_sql: str,
    side_sql: str,
    value_sql: str,
) -> str:
    """DuckDB mirror of :func:`mann_whitney_u` (HUGEINT; var_num as
    VARCHAR on both sides — it exceeds BIGINT at scale)."""
    return f"""
        WITH base AS (
          SELECT {group_sql} AS grp,
                 CAST(CAST({side_sql} AS DOUBLE) <> 0 AS INTEGER) AS a,
                 CAST(round({value_sql} * 100) AS BIGINT) AS v
          FROM {table}
          WHERE {value_sql} IS NOT NULL AND {side_sql} IS NOT NULL
        ), ranked AS (
          SELECT grp, a, v,
                 rank() OVER (PARTITION BY grp ORDER BY v) AS minr,
                 count(*) OVER (PARTITION BY grp, v) AS t
          FROM base
        ), stats AS (
          SELECT grp,
                 CAST(sum(a) AS BIGINT) AS n_a,
                 CAST(sum(1 - a) AS BIGINT) AS n_b,
                 CAST(sum(CASE WHEN a = 1
                          THEN 2 * minr + t - 1 ELSE 0 END)
                      AS BIGINT) AS r2_a
          FROM ranked GROUP BY grp
        ), ties AS (
          SELECT grp,
                 sum(CAST(t AS HUGEINT) * t * t - t) AS tie_cube
          FROM (SELECT grp, v, CAST(count(*) AS BIGINT) AS t
                FROM base GROUP BY grp, v)
          GROUP BY grp
        )
        SELECT s.grp, s.n_a, s.n_b,
               CAST(s.r2_a - s.n_a * (CAST(s.n_a AS HUGEINT) + 1)
                    AS BIGINT) AS u2,
               CAST(CAST(s.n_a AS HUGEINT) * s.n_b AS BIGINT) AS mu2,
               CAST(CAST(s.n_a AS HUGEINT) * s.n_b
                    * ((CAST(s.n_a + s.n_b AS HUGEINT) + 1)
                       * (s.n_a + s.n_b)
                       * (CAST(s.n_a + s.n_b AS HUGEINT) - 1)
                       - t.tie_cube) AS VARCHAR) AS var_num,
               CAST(12 * CAST(s.n_a + s.n_b AS HUGEINT)
                    * (CAST(s.n_a + s.n_b AS HUGEINT) - 1)
                    AS BIGINT) AS var_den
        FROM stats s JOIN ties t ON s.grp = t.grp
        WHERE s.n_a > 0 AND s.n_b > 0
    """


# ----------------------------------------------------- Brown-Forsythe

def brown_forsythe(
    df: DataFrame,
    group_col: str,
    class_col: str,
    value_col: str,
) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Brown & Forsythe
    1974 — Levene's test with the MEDIAN center, the robust variant)
    per ``group_col``: do the ``class_col`` populations have equal
    spread in ``value_col``? The spread change that PSI/KS may miss
    when means stay put.

    Exactness (hash-proven, floor-as-spec): values are centi-unit
    integers; per class the EXACT median enters as the integer
    med2 = x_((n+1)//2) + x_((n+2)//2) (2x median — a sum of two
    order statistics, no .5), deviations z = |2v - med2| are
    integers, and the ANOVA sums over z use the computational
    identities with per-class floor division:

        ssw = sum_j floor((n_j*Q_j - S_j^2) / n_j)
        ssb = sum_j floor(S_j^2 / n_j) - floor(G^2 / N)

    (S_j = sum z, Q_j = sum z^2, G = sum S_j). ssb/ssw ship as
    decimal-exact STRINGS (they exceed BIGINT at 10^9-row scale);
    f_milli = floor(1000 * ssb * (N-k) / (ssw * (k-1))) is the
    integer F-statistic carrier (null when ssw = 0 or k < 2).

    Scale: one sort-window per (group, class) for the order
    statistics — the only data-sized shuffle; everything after is
    class-cardinality aggregation."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(class_col).alias("cls"),
        cents.alias("__v"),
    ).where(F.col("__v").isNotNull())
    # NULL values excluded on BOTH engines (engine null-order differs)
    w_rank = Window.partitionBy("grp", "cls").orderBy("__v")
    w_cnt = Window.partitionBy("grp", "cls")
    ranked = base.withColumn(
        "__rn", F.row_number().over(w_rank)
    ).withColumn("__n", F.count(F.lit(1)).over(w_cnt))
    lo = F.floor((F.col("__n") + 1) / 2)
    hi = F.floor((F.col("__n") + 2) / 2)
    # med2 via a second window over the SAME partition (reuses the
    # sort — no join, no second scan of the fact): middle rows carry
    # their value (the single middle row twice when n is odd)
    mid = F.when(
        (F.col("__rn") == lo) & (F.col("__rn") == hi),
        2 * F.col("__v"),
    ).when(
        (F.col("__rn") == lo) | (F.col("__rn") == hi), F.col("__v")
    ).otherwise(F.lit(0))
    med2 = ranked.withColumn(
        "__med2", F.sum(mid).over(w_cnt).cast("long")
    )
    z = F.abs(2 * F.col("__v") - F.col("__med2")).cast("long")
    per_class = med2.groupBy("grp", "cls").agg(
        F.count(F.lit(1)).cast("long").alias("n_j"),
        F.sum(z.cast(d38)).cast(d38).alias("S_j"),
        F.sum((z.cast(d38) * z.cast(d38)).cast(d38)).cast(d38).alias("Q_j"),
    )

    def fdiv(num, den):
        return ((num - F.pmod(num, den)) / den).cast(d38)

    nj = F.col("n_j").cast(d38)
    ssw_j = fdiv((nj * F.col("Q_j") - F.col("S_j") * F.col("S_j")).cast(d38), nj)
    ssb_j = fdiv((F.col("S_j") * F.col("S_j")).cast(d38), nj)
    per_group = per_class.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_j").cast("long").alias("n"),
        F.sum(F.col("S_j")).cast(d38).alias("G"),
        F.sum(ssw_j).cast(d38).alias("ssw"),
        F.sum(ssb_j).cast(d38).alias("ssb_part"),
    )
    gN = F.col("n").cast(d38)
    # true SSB >= 0; the floored composition can go NEGATIVE by < k
    # units, and there Spark's floor and DuckDB's truncating // would
    # diverge — clamping at 0 (both engines) removes that regime and
    # keeps every later division nonnegative (floor == trunc)
    ssb = F.greatest(
        (
            F.col("ssb_part")
            - fdiv((F.col("G") * F.col("G")).cast(d38), gN)
        ).cast(d38),
        F.lit(0).cast(d38),
    )
    f_num = (ssb * (gN - F.col("k").cast(d38)) * F.lit(1000).cast(d38)).cast(
        d38
    )
    f_den = (
        F.col("ssw") * (F.col("k").cast(d38) - F.lit(1).cast(d38))
    ).cast(d38)
    f_milli = F.when(
        (F.col("ssw") > 0) & (F.col("k") > 1), fdiv(f_num, f_den)
    ).cast("long")
    return per_group.select(
        "grp",
        "k",
        "n",
        ssb.cast("string").alias("ssb"),
        F.col("ssw").cast("string").alias("ssw"),
        f_milli.alias("f_milli"),
    )


def brown_forsythe_oracle_sql(
    table: str,
    group_sql: str,
    class_sql: str,
    value_sql: str,
) -> str:
    """DuckDB mirror of :func:`brown_forsythe` (HUGEINT)."""
    return f"""
        WITH base AS (
          SELECT {group_sql} AS grp, {class_sql} AS cls,
                 CAST(round({value_sql} * 100) AS BIGINT) AS v
          FROM {table}
          WHERE {value_sql} IS NOT NULL
        ), ranked AS (
          SELECT grp, cls, v,
                 row_number() OVER (PARTITION BY grp, cls
                                    ORDER BY v) AS rn,
                 count(*) OVER (PARTITION BY grp, cls) AS n
          FROM base
        ), med AS (
          SELECT grp, cls,
                 CAST(sum(v * CASE WHEN (n + 1) // 2 = (n + 2) // 2
                          THEN 2 ELSE 1 END) AS BIGINT) AS med2
          FROM ranked
          WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
          GROUP BY grp, cls
        ), per_class AS (
          SELECT b.grp, b.cls,
                 CAST(count(*) AS BIGINT) AS n_j,
                 sum(CAST(abs(2 * b.v - m.med2) AS HUGEINT)) AS S_j,
                 sum(CAST(abs(2 * b.v - m.med2) AS HUGEINT)
                     * abs(2 * b.v - m.med2)) AS Q_j
          FROM base b JOIN med m ON b.grp = m.grp AND b.cls = m.cls
          GROUP BY b.grp, b.cls
        ), per_group AS (
          SELECT grp,
                 CAST(count(*) AS BIGINT) AS k,
                 CAST(sum(n_j) AS BIGINT) AS n,
                 sum(S_j) AS G,
                 sum((n_j * Q_j - S_j * S_j) // n_j) AS ssw,
                 sum((S_j * S_j) // n_j) AS ssb_part
          FROM per_class GROUP BY grp
        )
        SELECT grp, k, n,
               CAST(greatest(ssb_part - (G * G) // n,
                             CAST(0 AS HUGEINT)) AS VARCHAR) AS ssb,
               CAST(ssw AS VARCHAR) AS ssw,
               CASE WHEN ssw > 0 AND k > 1 THEN
                 CAST((greatest(ssb_part - (G * G) // n,
                                CAST(0 AS HUGEINT)) * (n - k) * 1000)
                      // (ssw * (k - 1)) AS BIGINT)
               END AS f_milli
        FROM per_group
    """
