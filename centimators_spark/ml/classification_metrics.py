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


def gains_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    *,
    n_cells: int | None = 4096,
) -> DataFrame:
    """Exact gains/lift table WITHOUT a global row sort: rows enter by
    descending score (industry gains-chart order), bucket d of
    ``n_buckets`` holds global ranks r with floor((r−1)·nb/n) = d, and
    every count is derived from the DISTINCT (score, label) stream —
    a group occupying exclusive-start s, size c lands in buckets
    floor(s·nb/n) … floor((s+c−1)·nb/n) with an integer interval
    overlap per bucket. The heavy input collapses to its score/label
    cardinality before any ordered window (the anti-ntile discipline
    of this module: ntile's tie handling is order-dependent; interval
    arithmetic over homogeneous groups is not — rows tied on
    (score, label) are interchangeable, so no row-id tiebreak is
    needed and the result is partition-order exact).

    The global cumulative start is computed in TWO PHASES so no task
    ever sorts the whole distinct stream (continuous scores have
    distinct ≈ N): each distinct row is mapped to one of ``n_cells``
    score cells by the monotone map floor((s − min)/(max − min) ·
    n_cells) — IEEE subtraction/division/multiplication by positive
    constants are weakly monotone, so cell order is consistent with
    score order and equal scores always share a cell — then (phase 1)
    a cell-partitioned window cumulates within each cell while
    (phase 2) an ordered window over the ≤ n_cells+1 cell subtotals
    produces per-cell offsets that broadcast-join back. Every ordered
    window is therefore bounded: by the per-cell distinct count
    (phase 1, hash-parallel) or by n_cells (phase 2, one tiny task).
    The arithmetic is exact integers, so the result is bit-identical
    to the single-window formulation (``n_cells=None`` keeps that
    reference path for value-cardinality-bounded scores).

    Returns per bucket: n_rows, n_pos, cum_rows, cum_pos (BIGINT,
    exact) plus gain = cum_pos/total_pos and lift =
    (cum_pos/cum_rows)/(total_pos/n), both rounded to 6dp.
    """
    nb = int(n_buckets)
    groups = df.groupBy(
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("boolean").alias("__y"),
    ).agg(F.count(F.lit(1)).cast("long").alias("__c"))
    totals = groups.agg(
        F.sum("__c").alias("__n"),
        F.sum(F.when(F.col("__y"), F.col("__c")).otherwise(0)).alias("__np"),
        F.min(F.col("__s").cast("double")).alias("__smin"),
        F.max(F.col("__s").cast("double")).alias("__smax"),
    )
    from pyspark.sql import Window

    if n_cells is None:
        # reference path: ONE ordered window over the distinct
        # (score, label) stream — bounded by value cardinality only,
        # appropriate for discrete scores
        w = Window.orderBy(
            F.col("__s").desc(), F.col("__y").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cum = groups.select(
            "__y",
            "__c",
            (F.sum("__c").over(w) - F.col("__c")).alias("__start"),
        ).crossJoin(F.broadcast(totals.select("__n", "__np")))
    else:
        nc = int(n_cells)
        g = groups.crossJoin(F.broadcast(totals))
        s = F.col("__s").cast("double")
        # cell must be order-consistent with __s DESC: nulls sort LAST
        # under desc → cell −1 (below every real score); NaN sorts
        # FIRST (Spark: NaN > any double) and least() skips down to
        # nc−1 → the top cell. Both stay exact.
        cell = (
            F.when(s.isNull(), F.lit(-1))
            .when(
                F.col("__smax") > F.col("__smin"),
                F.least(
                    F.floor(
                        (s - F.col("__smin"))
                        / (F.col("__smax") - F.col("__smin"))
                        * nc
                    ),
                    F.lit(nc - 1),
                ),
            )
            .otherwise(F.lit(0))
        )
        g = g.withColumn("__cell", cell)
        w_in = Window.partitionBy("__cell").orderBy(
            F.col("__s").desc(), F.col("__y").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        within = g.select(
            "__y",
            "__c",
            "__n",
            "__np",
            "__cell",
            (F.sum("__c").over(w_in) - F.col("__c")).alias("__within"),
        )
        cell_totals = g.groupBy("__cell").agg(F.sum("__c").alias("__ct"))
        w_cells = Window.orderBy(F.col("__cell").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = cell_totals.select(
            "__cell",
            F.coalesce(F.sum("__ct").over(w_cells), F.lit(0)).alias(
                "__off"
            ),
        )
        cum = within.join(F.broadcast(offsets), "__cell").select(
            "__y",
            "__c",
            (F.col("__within") + F.col("__off")).alias("__start"),
            "__n",
            "__np",
        )
    spread = cum.select(
        "__y",
        "__c",
        "__start",
        "__n",
        "__np",
        F.explode(
            F.sequence(
                F.expr(f"__start * {nb} div __n"),
                F.expr(f"(__start + __c - 1) * {nb} div __n"),
            )
        ).alias("bucket"),
    ).select(
        "__y",
        "__n",
        "__np",
        "bucket",
        (
            F.least(
                F.expr(f"((bucket + 1) * __n + {nb} - 1) div {nb}"),
                F.col("__start") + F.col("__c"),
            )
            - F.greatest(
                F.expr(f"(bucket * __n + {nb} - 1) div {nb} + 1"),
                F.col("__start") + 1,
            )
            + 1
        ).alias("__overlap"),
    )
    per_bucket = spread.groupBy("bucket", "__n", "__np").agg(
        F.sum("__overlap").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__y"), F.col("__overlap")).otherwise(0))
        .cast("long")
        .alias("n_pos"),
    )
    wb = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_rows",
        "n_pos",
        F.sum("n_rows").over(wb).cast("long").alias("cum_rows"),
        F.sum("n_pos").over(wb).cast("long").alias("cum_pos"),
        "__n",
        "__np",
    ).select(
        "bucket",
        "n_rows",
        "n_pos",
        "cum_rows",
        "cum_pos",
        # no positives at all → gain/lift undefined (NULL), never a
        # division error (ANSI mode; found by the hypothesis sweep)
        F.when(
            F.col("__np") > 0,
            F.round(F.col("cum_pos") / F.col("__np"), 6),
        ).alias("gain"),
        F.when(
            F.col("__np") > 0,
            F.round(
                (F.col("cum_pos") / F.col("cum_rows"))
                / (F.col("__np") / F.col("__n")),
                6,
            ),
        ).alias("lift"),
    )


def gains_table_oracle_sql(
    table_sql: str,
    score_sql: str,
    label_sql: str,
    n_buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`gains_table` — identical integer interval
    arithmetic over the distinct (score, label) stream."""
    nb = int(n_buckets)
    return f"""
        WITH groups AS (
          SELECT {score_sql} AS s, CAST({label_sql} AS BOOLEAN) AS y,
                 CAST(count(*) AS BIGINT) AS c
          FROM {table_sql} GROUP BY 1, 2
        ), totals AS (
          SELECT CAST(sum(c) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN y THEN c ELSE 0 END) AS BIGINT) AS np
          FROM groups
        ), cum AS (
          SELECT y, c,
                 CAST(sum(c) OVER (ORDER BY s DESC, y ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
                   AS BIGINT) AS start, n, np
          FROM groups CROSS JOIN totals
        ), spread AS (
          SELECT y, n, np, bucket,
                 least(((bucket + 1) * n + {nb} - 1) // {nb}, start + c)
                 - greatest((bucket * n + {nb} - 1) // {nb} + 1, start + 1)
                 + 1 AS overlap
          FROM cum,
               unnest(generate_series(start * {nb} // n,
                                      (start + c - 1) * {nb} // n))
                 AS t(bucket)
        ), per_bucket AS (
          SELECT bucket, n, np,
                 CAST(sum(overlap) AS BIGINT) AS n_rows,
                 CAST(sum(CASE WHEN y THEN overlap ELSE 0 END) AS BIGINT)
                   AS n_pos
          FROM spread GROUP BY bucket, n, np
        )
        SELECT CAST(bucket AS INTEGER) AS bucket, n_rows, n_pos,
               CAST(sum(n_rows) OVER wb AS BIGINT) AS cum_rows,
               CAST(sum(n_pos) OVER wb AS BIGINT) AS cum_pos,
               CASE WHEN np > 0 THEN
                 round(CAST(sum(n_pos) OVER wb AS DOUBLE) / np, 6)
               END AS gain,
               CASE WHEN np > 0 THEN
                 round((CAST(sum(n_pos) OVER wb AS DOUBLE)
                        / sum(n_rows) OVER wb)
                       / (CAST(np AS DOUBLE) / n), 6)
               END AS lift
        FROM per_bucket
        WINDOW wb AS (ORDER BY bucket
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """
