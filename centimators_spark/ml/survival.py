"""Kaplan–Meier survival estimation per cohort — the
time-to-event/churn/retention curve (Kaplan & Meier 1958) over
(subject, duration, event) rows with right-censoring.

Spark shape: one grouped count per (cohort, duration), then THREE
window expressions sharing ONE (cohort, duration) sort — at-risk
counts (reverse cumulative), the cumulative log-survival, and the
absorbing zero flag — i.e. a single shuffle keyed on cohort. The
window always partitions by the cohort column, so no data-derived
frame feeds an unpartitioned WindowExec (pass a constant cohort for a
single population ONLY on dimension-sized inputs).

Cross-engine exactness (the unigram_lm discipline): each factor
ln(1 − d/n) is computed from the identical IEEE division of exact
integers, rounded to 9 decimals, and carried as a BIGINT nano-unit —
cumulative sums are then exact integer arithmetic in any order; the
final exp is one call on an identical input, rounded to ``round_dp``.
The absorbing state S(t)=0 (every remaining subject fails, d = n) is
a flag column, not a −inf log.

Reference scope: no reference counterpart — §2.3 analytics extension
beside retention_cohorts (which counts returns per week; this
estimates the survival FUNCTION with censoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LN_SCALE = 10**9


def kaplan_meier(
    df: DataFrame,
    *,
    duration_col: str = "duration",
    event_col: str = "event",
    group_col: str = "cohort",
    round_dp: int = 6,
) -> DataFrame:
    """KM estimate per cohort: returns
    (cohort, duration, at_risk, events, survival) at every duration
    where ≥1 event occurs, ordered semantics per cohort. ``event_col``
    is 1 (observed) / 0 (right-censored)."""
    from pyspark.sql import Window

    per = df.groupBy(
        F.col(group_col).alias("cohort"),
        F.col(duration_col).cast("long").alias("duration"),
    ).agg(
        F.sum(F.col(event_col).cast("long")).alias("events"),
        F.count(F.lit(1)).alias("__c"),
    )
    w = Window.partitionBy("cohort").orderBy("duration")
    at_risk = F.sum("__c").over(w.rowsBetween(0, Window.unboundedFollowing))
    stepped = per.withColumn("at_risk", at_risk)
    # nano-unit log factor; NULL when the factor is 0 (d == n)
    frac = (
        F.col("at_risk") - F.col("events")
    ).cast("double") / F.col("at_risk").cast("double")
    li = F.when(
        F.col("events") < F.col("at_risk"),
        F.round(F.log(frac) * _LN_SCALE).cast("long"),
    ).otherwise(F.lit(None))
    stepped = stepped.withColumn(
        "__li", F.when(F.col("events") > 0, li).otherwise(F.lit(0).cast("long"))
    )
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    ln_sum = F.sum("__li").over(cum)
    dead = F.max(
        F.when(
            (F.col("events") > 0) & (F.col("events") == F.col("at_risk")), 1
        ).otherwise(0)
    ).over(cum)
    out = stepped.withColumn(
        "survival",
        F.when(dead == 1, F.lit(0.0)).otherwise(
            F.round(
                F.exp(ln_sum.cast("double") / F.lit(float(_LN_SCALE))),
                round_dp,
            )
        ),
    )
    return out.where(F.col("events") > 0).select(
        "cohort", "duration", "at_risk", "events", "survival"
    )


def kaplan_meier_oracle_sql(
    table_sql: str,
    *,
    duration_sql: str = "duration",
    event_sql: str = "event",
    group_sql: str = "cohort",
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`kaplan_meier` (identical nano-unit log
    carriers and absorbing-zero flag)."""
    return f"""
        WITH per AS (
          SELECT {group_sql} AS cohort,
                 CAST({duration_sql} AS BIGINT) AS duration,
                 CAST(sum(CAST({event_sql} AS BIGINT)) AS BIGINT) AS events,
                 CAST(count(*) AS BIGINT) AS c
          FROM {table_sql}
          GROUP BY 1, 2
        ), stepped AS (
          SELECT *,
                 -- DuckDB windowed sum over BIGINT is HUGEINT -> pandas
                 -- float64; CAST keeps the driver hash dtype-identical
                 CAST(sum(c) OVER (PARTITION BY cohort ORDER BY duration
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS at_risk
          FROM per
        ), logs AS (
          SELECT *,
                 CASE WHEN events = 0 THEN 0
                      WHEN events < at_risk THEN
                        CAST(round(ln(CAST(at_risk - events AS DOUBLE)
                                      / CAST(at_risk AS DOUBLE))
                                   * {_LN_SCALE}) AS BIGINT)
                 END AS li
          FROM stepped
        ), cums AS (
          SELECT *,
                 sum(li) OVER (PARTITION BY cohort ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS ln_sum,
                 max(CASE WHEN events > 0 AND events = at_risk
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY cohort ORDER BY duration
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS dead
          FROM logs
        )
        SELECT cohort, duration, at_risk, events,
               CASE WHEN dead = 1 THEN 0.0
                    ELSE round(exp(CAST(ln_sum AS DOUBLE) / {_LN_SCALE}),
                               {round_dp}) END AS survival
        FROM cums WHERE events > 0
    """
