"""Decision-stump split search — the best single-feature threshold by
Gini impurity decrease, exactly.

The classic C4.5/CART first step (and the filter-method feature scorer
it implies): for each feature, over its DISTINCT values v, score the
split x ≤ v by the weighted Gini impurity of the two sides and keep
the argmin. The suite's distinct-value-stream discipline (KS, gains)
applies directly: per-value label counts collapse the table to its
value cardinality, one feature-partitioned ordered window produces
the left-side cumulative counts, and the score

    N·gini_w(v) = N − (pos_L² + neg_L²)/n_L − (pos_R² + neg_R²)/n_R

is two IEEE divisions and a subtraction over EXACT BIGINT counts — no
transcendentals, so the score (and therefore the argmin) is
bit-identical across engines; minimizing it maximizes impurity
decrease since parent impurity is split-independent. Argmin per
feature via one ``min(struct(score, v))`` aggregation (deterministic
value-ascending tiebreak).

Scale: one shuffle to (feature, value) counts, one window bounded by
per-feature value cardinality, one tiny aggregation. Continuous
features should be pre-quantized (the operator scores the quantized
values — standard histogram-split practice, cf. LightGBM bins).

Reference scope: the reference has no tree surface; this is a §2.3
evaluation/feature-selection extension beside ml/classification_metrics.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def best_split(
    df: DataFrame,
    features: Mapping[str, Column],
    label: Column,
    round_dp: int = 9,
) -> DataFrame:
    """Per feature: the threshold minimizing weighted Gini and its
    score. ``features`` maps output feature names to integer-valued
    Columns; ``label`` is a boolean Column. Returns (feature,
    threshold, n_left, pos_left, score) with score = round(N·gini_w,
    round_dp); splits with an empty side are excluded (score would be
    the parent's — never optimal unless degenerate)."""
    melted = df.select(
        F.explode(
            F.create_map(
                *[
                    x
                    for name, col in features.items()
                    for x in (F.lit(name), col.cast("long"))
                ]
            )
        ).alias("feature", "v"),
        label.cast("int").alias("y"),
    ).where(F.col("v").isNotNull() & F.col("y").isNotNull())
    counts = melted.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.partitionBy("feature").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "feature",
        "v",
        F.sum("n").over(w).alias("n_l"),
        F.sum("pos").over(w).alias("pos_l"),
    )
    totals = counts.groupBy("feature").agg(
        F.sum("n").alias("__n"), F.sum("pos").alias("__pos")
    )
    j = cum.join(F.broadcast(totals), "feature").where(
        F.col("n_l") < F.col("__n")  # right side non-empty
    )
    neg_l = F.col("n_l") - F.col("pos_l")
    n_r = F.col("__n") - F.col("n_l")
    pos_r = F.col("__pos") - F.col("pos_l")
    neg_r = n_r - pos_r
    score = (
        F.col("__n").cast("double")
        - (
            F.col("pos_l") * F.col("pos_l") + neg_l * neg_l
        ).cast("double")
        / F.col("n_l").cast("double")
        - (pos_r * pos_r + neg_r * neg_r).cast("double")
        / n_r.cast("double")
    )
    scored = j.select(
        "feature",
        F.struct(
            F.round(score, round_dp).alias("score"),
            F.col("v").alias("threshold"),
            F.col("n_l").alias("n_left"),
            F.col("pos_l").alias("pos_left"),
        ).alias("s"),
    )
    return scored.groupBy("feature").agg(F.min("s").alias("s")).select(
        "feature",
        F.col("s.threshold").alias("threshold"),
        F.col("s.n_left").alias("n_left"),
        F.col("s.pos_left").alias("pos_left"),
        F.col("s.score").alias("score"),
    )


def best_split_oracle_sql(
    table_sql: str,
    features: Mapping[str, str],
    label_sql: str,
    round_dp: int = 9,
) -> str:
    """DuckDB twin: identical exact-count arithmetic; argmin via
    min-struct with the same (score, threshold) ordering."""
    arms = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, CAST({expr} AS BIGINT) AS v,"
        f" CAST({label_sql} AS INTEGER) AS y FROM {table_sql}"
        f" WHERE {expr} IS NOT NULL AND {label_sql} IS NOT NULL"
        for name, expr in features.items()
    )
    return f"""
        WITH melted AS ({arms}),
        counts AS (
          SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS pos
          FROM melted GROUP BY feature, v
        ), cum AS (
          SELECT feature, v,
                 CAST(sum(n) OVER (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS n_l,
                 CAST(sum(pos) OVER (PARTITION BY feature ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS pos_l
          FROM counts
        ), totals AS (
          SELECT feature, CAST(sum(n) AS BIGINT) AS nt,
                 CAST(sum(pos) AS BIGINT) AS post
          FROM counts GROUP BY feature
        ), scored AS (
          SELECT c.feature, c.v, c.n_l, c.pos_l,
                 round(CAST(nt AS DOUBLE)
                   - CAST(pos_l * pos_l + (n_l - pos_l) * (n_l - pos_l)
                          AS DOUBLE) / CAST(n_l AS DOUBLE)
                   - CAST((post - pos_l) * (post - pos_l)
                          + ((nt - n_l) - (post - pos_l))
                            * ((nt - n_l) - (post - pos_l))
                          AS DOUBLE) / CAST(nt - n_l AS DOUBLE),
                   {round_dp}) AS score
          FROM cum c JOIN totals t ON c.feature = t.feature
          WHERE c.n_l < t.nt
        )
        SELECT feature,
               min({{'score': score, 'threshold': v,
                    'n_left': n_l, 'pos_left': pos_l}}).threshold
                 AS threshold,
               min({{'score': score, 'threshold': v,
                    'n_left': n_l, 'pos_left': pos_l}}).n_left AS n_left,
               min({{'score': score, 'threshold': v,
                    'n_left': n_l, 'pos_left': pos_l}}).pos_left
                 AS pos_left,
               min({{'score': score, 'threshold': v,
                    'n_left': n_l, 'pos_left': pos_l}}).score AS score
        FROM scored GROUP BY feature
    """
