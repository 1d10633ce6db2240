"""Isotonic calibration (pool-adjacent-violators) with an EXACT
integer contract — the classic probability-calibration step (Zadrozny
& Elkan 2002; Robertson et al. 1988) for model scores: bucket the
score, compute the per-bucket positive rate, and fit the best
monotone nondecreasing sequence to those rates (reference scope: the
engine's model-evaluation surface, e.g.
/root/reference/src/centimators/model_estimators/ — scoring
diagnostics generalized to calibration).

Exactness discipline (the cms/theta discipline — hash-proven, not
tolerance-banded): rates are floor micro-units v = floor(1e6*pos/cnt);
the UNWEIGHTED isotonic fit over the ordered bucket rates uses the
minimax closed form (Robertson-Wright-Dykstra)

    fit_i = max_{j<=i} min_{k>=i} mean(v_j..v_k)

and every candidate mean is scaled to the common denominator
L = lcm(1..B): A(j,k) = (S_k - S_{j-1}) * (L / (k-j+1)) is a plain
integer (<= B*1e6*L < 10^38, exact in decimal(38,0)/HUGEINT), so min,
max, and the final floor back to micro-units are deterministic on
both engines.

Scale: the ONLY corpus-sized operation is the (group, bucket) count
aggregation (map-side combined). Everything after runs on <= B rows
per group: the (j,k) pair fan-out is B(B+1)/2 tiny rows, the suffix
min and the prefix max are windows over those, and the per-bucket
join is broadcast-able. At 100 TB the plan is one shuffle on the
(group, bucket) key plus KB-sized follow-up stages.
"""

from __future__ import annotations

from decimal import Decimal
from math import gcd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ISO_MICRO = 1_000_000
ISO_MAX_BUCKETS = 50


def _lcm_upto(n: int) -> int:
    out = 1
    for i in range(1, n + 1):
        out = out * i // gcd(out, i)
    return out


ISO_LCM = _lcm_upto(ISO_MAX_BUCKETS)  # 3099044504245996706400

_D38 = "decimal(38,0)"


def isotonic_calibration(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    label_col: str,
) -> DataFrame:
    """Per ``group_col``, isotonic (monotone nondecreasing) fit of the
    per-``bucket_col`` positive rate of binary ``label_col``.

    The caller provides the integer bucket column (binning is
    operators/encoding.quantile_bin's job); at most
    ``ISO_MAX_BUCKETS`` distinct buckets per group are supported (the
    lcm scaling bound) — more raises at execution via assert_true
    (ANSI-independent).

    Returns one row per (grp, bucket): n_rows, n_pos, v_micro (raw
    rate, floor micro-units), fit_micro (isotonic fit, floor
    micro-units; nondecreasing in bucket within every group)."""
    pts = (
        df.groupBy(
            F.col(group_col).alias("grp"),
            F.col(bucket_col).cast("long").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col(label_col).cast("long"))
            .cast("long")
            .alias("n_pos"),
        )
    )
    num = F.col("n_pos").cast(_D38) * F.lit(ISO_MICRO).cast(_D38)
    cnt = F.col("n_rows").cast(_D38)
    pts = pts.withColumn(
        "v", ((num - F.pmod(num, cnt)) / cnt).cast(_D38)
    )
    w_rank = Window.partitionBy("grp").orderBy("bucket")
    pts = pts.withColumn("i", F.row_number().over(w_rank)).withColumn(
        "S", F.sum("v").over(w_rank).cast(_D38)
    )
    # lcm bound guard: assert_true raises at execution in BOTH ANSI
    # and non-ANSI sessions if a group exceeds the supported bucket
    # count (loud failure, never a wrong fit; a division-based guard
    # would yield Infinity, not an error, under non-ANSI)
    pts = pts.withColumn(
        "__nb", F.max("i").over(Window.partitionBy("grp"))
    ).where(
        F.assert_true(
            F.col("__nb") <= ISO_MAX_BUCKETS,
            F.lit("isotonic_calibration: group exceeds ISO_MAX_BUCKETS"),
        ).isNull()
    ).drop("__nb")
    # small-side pair fan-out: (j, k) with j <= k, at most B(B+1)/2
    # rows per group
    left = pts.select(
        "grp",
        F.col("i").alias("j"),
        (F.col("S") - F.col("v")).alias("S_jm1"),
    )
    right = pts.select("grp", F.col("i").alias("k"), F.col("S").alias("S_k"))
    pairs = left.join(right, "grp").where(F.col("j") <= F.col("k"))
    length = (F.col("k") - F.col("j") + 1).cast(_D38)
    lcm_lit = F.lit(Decimal(ISO_LCM)).cast(_D38)
    scale = ((lcm_lit - F.pmod(lcm_lit, length)) / length).cast(_D38)
    pairs = pairs.withColumn(
        "A", ((F.col("S_k") - F.col("S_jm1")) * scale).cast(_D38)
    )
    # suffix min over k for each start j, read at k = i ...
    w_suffix = (
        Window.partitionBy("grp", "j")
        .orderBy(F.col("k").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = pairs.withColumn("M", F.min("A").over(w_suffix))
    # ... then the max over j <= i gives the minimax isotonic value
    fit = (
        m.groupBy("grp", F.col("k").alias("i"))
        .agg(F.max("M").cast(_D38).alias("fit_scaled"))
    )
    lcm_d = F.lit(Decimal(ISO_LCM)).cast(_D38)
    fit = fit.withColumn(
        "fit_micro",
        (
            (F.col("fit_scaled") - F.pmod(F.col("fit_scaled"), lcm_d))
            / lcm_d
        ).cast("long"),
    )
    return (
        pts.join(fit, ["grp", "i"])
        .select(
            "grp",
            "bucket",
            "n_rows",
            "n_pos",
            F.col("v").cast("long").alias("v_micro"),
            "fit_micro",
        )
    )


def isotonic_calibration_oracle_sql(
    table: str,
    group_sql: str,
    bucket_sql: str,
    label_sql: str,
) -> str:
    """DuckDB mirror of :func:`isotonic_calibration`: identical floor
    micro-rates, identical lcm-scaled integer minimax (HUGEINT), same
    suffix-min / prefix-max windows."""
    return f"""
        WITH pts0 AS (
          SELECT {group_sql} AS grp,
                 CAST({bucket_sql} AS BIGINT) AS bucket,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(sum(CAST({label_sql} AS BIGINT)) AS BIGINT)
                   AS n_pos
          FROM {table}
          GROUP BY 1, 2
        ), pts AS (
          SELECT *,
                 (CAST(n_pos AS HUGEINT) * {ISO_MICRO}) // n_rows AS v,
                 row_number() OVER w AS i,
                 sum((CAST(n_pos AS HUGEINT) * {ISO_MICRO}) // n_rows)
                   OVER (PARTITION BY grp ORDER BY bucket
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS S
          FROM pts0
          WINDOW w AS (PARTITION BY grp ORDER BY bucket)
        ), pairs AS (
          SELECT a.grp, a.i AS j, b.i AS k,
                 (b.S - (a.S - a.v))
                   * (CAST({ISO_LCM} AS HUGEINT) // (b.i - a.i + 1))
                   AS A
          FROM pts a JOIN pts b ON a.grp = b.grp AND a.i <= b.i
        ), m AS (
          SELECT grp, j, k,
                 min(A) OVER (PARTITION BY grp, j ORDER BY k DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS M
          FROM pairs
        ), fit AS (
          SELECT grp, k AS i, max(M) AS fit_scaled
          FROM m GROUP BY grp, k
        )
        SELECT p.grp, p.bucket, p.n_rows, p.n_pos,
               CAST(p.v AS BIGINT) AS v_micro,
               CAST(f.fit_scaled // CAST({ISO_LCM} AS HUGEINT)
                    AS BIGINT) AS fit_micro
        FROM pts p JOIN fit f ON p.grp = f.grp AND p.i = f.i
    """
