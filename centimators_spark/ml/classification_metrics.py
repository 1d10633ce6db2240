"""Binary-classification evaluation metrics — the model-scoring
family beside ml/metrics.py's regression-side era report:

- ``auc_score``: exact ROC-AUC via the Mann–Whitney U / average-rank
  identity, AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻). Average ranks
  are rank() + (ties−1)/2 — integer-plus-half rationals, so the sums
  are exact in doubles and the single division is identical IEEE in
  both engines (no trapezoids, no thresholds sweep).
- ``log_loss``: −mean(y·ln p + (1−y)·ln(1−p)) with each row's log
  term rounded to nano-units and carried as BIGINT (the unigram_lm
  discipline) — the cumulative sum is exact integer arithmetic, so
  cross-libm ln ULPs cannot drift the total.
- ``calibration_bins``: value-based probability bins (floor(p·K),
  deterministic — never ntile, whose tie handling is order-dependent)
  with exact count/positive-count ratios and micro-unit mean-p.

Spark shape: AUC is one (optional group) window + one aggregation;
log-loss one aggregation; calibration one grouped count — no UDFs,
no collects. All three carry bit-exact DuckDB mirrors.

Reference scope: the reference evaluates with Keras losses only; this
is the §2.3 evaluation extension its users need for classifiers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LN_SCALE = 10**9


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    *,
    group_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Exact AUC per group (or one global row with ``group = 'all'``).
    Returns (group, n_pos, n_neg, auc); AUC is NULL when a class is
    empty. NULL scores/labels are excluded."""
    from pyspark.sql import Window

    g = F.col(group_col) if group_col else F.lit("all")
    base = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        g.alias("group"),
        F.col(score_col).cast("double").alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    )
    w = Window.partitionBy("group").orderBy("__s")
    wt = Window.partitionBy("group", "__s")
    avg_rank = (
        F.rank().over(w).cast("double")
        + (F.count(F.lit(1)).over(wt).cast("double") - 1) / 2
    )
    ranked = base.withColumn("__r", avg_rank)
    agg = ranked.groupBy("group").agg(
        F.sum("__y").cast("long").alias("n_pos"),
        F.sum(1 - F.col("__y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__r"))).alias("__rsum"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = (F.col("__rsum") - np_ * (np_ + 1) / 2) / (np_ * nn)
    return agg.select(
        "group",
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(auc, round_dp),
        ).alias("auc"),
    )


def auc_score_oracle_sql(
    table_sql: str,
    score_sql: str,
    label_sql: str,
    *,
    group_sql: str | None = None,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`auc_score`."""
    g = group_sql if group_sql else "'all'"
    return f"""
        WITH base AS (
          SELECT {g} AS grp, CAST({score_sql} AS DOUBLE) AS s,
                 CAST({label_sql} AS INTEGER) AS y
          FROM {table_sql}
          WHERE {score_sql} IS NOT NULL AND {label_sql} IS NOT NULL
        ), ranked AS (
          SELECT *,
                 CAST(rank() OVER (PARTITION BY grp ORDER BY s) AS DOUBLE)
                 + (CAST(count(*) OVER (PARTITION BY grp, s) AS DOUBLE) - 1)
                   / 2 AS r
          FROM base
        ), agg AS (
          SELECT grp AS "group",
                 CAST(sum(y) AS BIGINT) AS n_pos,
                 CAST(sum(1 - y) AS BIGINT) AS n_neg,
                 sum(CASE WHEN y = 1 THEN r END) AS rsum
          FROM ranked GROUP BY grp
        )
        SELECT "group", n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                 round((rsum - CAST(n_pos AS DOUBLE)
                               * (CAST(n_pos AS DOUBLE) + 1) / 2)
                       / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)),
                       {round_dp}) END AS auc
        FROM agg
    """


def log_loss(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    eps: float = 1e-7,
    round_dp: int = 6,
) -> DataFrame:
    """One-row (n, logloss): −mean of the per-row log term, each term
    rounded to nano-units and summed as exact BIGINT. Probabilities
    clip to [eps, 1−eps] (identically in the oracle)."""
    p = F.least(
        F.greatest(F.col(prob_col).cast("double"), F.lit(eps)),
        F.lit(1.0 - eps),
    )
    y = F.col(label_col).cast("int")
    term = F.when(y == 1, F.log(p)).otherwise(F.log(1 - p))
    li = F.round(term * _LN_SCALE).cast("long")
    agg = df.where(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum(li).alias("__s")
    )
    return agg.select(
        "n",
        F.round(
            -F.col("__s").cast("double")
            / F.lit(float(_LN_SCALE))
            / F.col("n").cast("double"),
            round_dp,
        ).alias("logloss"),
    )


def log_loss_oracle_sql(
    table_sql: str,
    prob_sql: str,
    label_sql: str,
    *,
    eps: float = 1e-7,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`log_loss`."""
    p = f"least(greatest(CAST({prob_sql} AS DOUBLE), {eps!r}), {1.0 - eps!r})"
    term = (
        f"CASE WHEN CAST({label_sql} AS INTEGER) = 1 THEN ln({p}) "
        f"ELSE ln(1 - {p}) END"
    )
    return f"""
        SELECT CAST(count(*) AS BIGINT) AS n,
               round(-CAST(sum(CAST(round(({term}) * {_LN_SCALE})
                                    AS BIGINT)) AS DOUBLE)
                     / {_LN_SCALE} / CAST(count(*) AS DOUBLE),
                     {round_dp}) AS logloss
        FROM {table_sql}
        WHERE {prob_sql} IS NOT NULL AND {label_sql} IS NOT NULL
    """


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    *,
    n_bins: int = 10,
    metric_dp: int = 6,
    round_dp: int = 6,
) -> DataFrame:
    """Reliability table: value-based probability bins
    (bin = min(floor(p·K), K−1) — deterministic under ties, unlike
    ntile) with (bin, n, mean_p, frac_pos). mean_p sums micro-unit
    integers; frac_pos is an exact integer ratio."""
    scale = float(10 ** metric_dp)
    p = F.col(prob_col).cast("double")
    b = F.least(
        F.floor(p * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    q = F.round(p * scale).cast("long")
    agg = (
        df.where(F.col(prob_col).isNotNull() & F.col(label_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("__ps"),
            F.sum(F.col(label_col).cast("long")).alias("__pos"),
        )
    )
    return agg.select(
        "bin",
        "n",
        F.round(
            F.col("__ps").cast("double") / scale / F.col("n").cast("double"),
            round_dp,
        ).alias("mean_p"),
        F.round(
            F.col("__pos").cast("double") / F.col("n").cast("double"),
            round_dp,
        ).alias("frac_pos"),
    )


def calibration_bins_oracle_sql(
    table_sql: str,
    prob_sql: str,
    label_sql: str,
    *,
    n_bins: int = 10,
    metric_dp: int = 6,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`calibration_bins`."""
    scale = float(10 ** metric_dp)
    p = f"CAST({prob_sql} AS DOUBLE)"
    return f"""
        WITH base AS (
          SELECT least(CAST(floor({p} * {n_bins}) AS INTEGER), {n_bins - 1})
                   AS bin,
                 CAST(round({p} * {scale!r}) AS BIGINT) AS q,
                 CAST({label_sql} AS BIGINT) AS y
          FROM {table_sql}
          WHERE {prob_sql} IS NOT NULL AND {label_sql} IS NOT NULL
        )
        SELECT bin, CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(q) AS DOUBLE) / {scale!r}
                     / CAST(count(*) AS DOUBLE), {round_dp}) AS mean_p,
               round(CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE),
                     {round_dp}) AS frac_pos
        FROM base GROUP BY bin
    """
