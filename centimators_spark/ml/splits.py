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


# ------------------------------------------------------- boosted stumps


def _floor_div(a: Column, b: Column) -> Column:
    """TRUE floor division of integer expressions (negative-safe): the
    pmod-adjusted numerator through an exact DECIMAL(38,0) carrier
    (the ml/backtest.py discipline — a double quotient would drift
    past 2^53). DuckDB mirror: ``(a - ((a%b)+b)%b) // b``."""
    adj = (a - F.pmod(a, b)).cast("decimal(38,0)")
    return (adj / b.cast("decimal(38,0)")).cast("decimal(38,0)")


def boosted_stumps(
    df: DataFrame,
    features: Mapping[str, Column],
    target: Column,
    rounds: int = 2,
) -> DataFrame:
    """Gradient-boosted regression stumps with EXACT integer
    arithmetic — the iterative-ML sibling of :func:`best_split`
    (boosting: Friedman 2001, squared loss, learning rate ½, depth-1
    trees). Round r fits a variance-reduction stump to the CURRENT
    residual, contributes half the leaf mean, and the next round fits
    what is left.

    Everything is integers so the oracle is bit-exact: ``target``
    must be integer-valued (fixed-decimal scaled); residuals live in
    DOUBLED target units (y₂ = 2·y) so the ½-learning-rate leaf
    contribution floor(Σy₂ / 2n) is itself an exact integer; the
    split score max_v (S_L²·n_R + S_R²·n_L) DIV (n_L·n_R·10⁶) —
    the variance-reduction argmax cleared of divisions, floored into
    a BIGINT-sized carrier — uses only DECIMAL(38,0) products (never
    overflows for |Σy₂| < 10¹⁶). All divisions are negative-safe
    floor divisions (pmod-adjusted decimal carriers).

    Per round at scale: one melt scan + one per-(feature, value)
    count aggregation + one feature-partitioned cumulative window +
    a TakeOrdered(1) argmax collect (the literal-centroid
    discipline: ONE row per round drives the next residual
    expression as literals). Returns one row per round:
    (round, feature, threshold, left_value, right_value, score) with
    leaf values in doubled target units."""
    names = list(features)
    base = df.select(
        *[col.cast("long").alias(n) for n, col in features.items()],
        (target.cast("long") * 2).alias("__y2"),
    )
    resid = F.col("__y2")
    model: list[tuple] = []
    for r in range(int(rounds)):
        melted = base.select(
            F.explode(
                F.create_map(
                    *[x for n in names for x in (F.lit(n), F.col(n))]
                )
            ).alias("feature", "v"),
            resid.alias("y"),
        ).where(F.col("v").isNotNull() & F.col("y").isNotNull())
        counts = melted.groupBy("feature", "v").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("long").alias("s"),
        )
        w = (
            Window.partitionBy("feature")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = counts.select(
            "feature",
            "v",
            F.sum("n").over(w).cast("long").alias("n_l"),
            F.sum("s").over(w).cast("long").alias("s_l"),
        )
        totals = counts.groupBy("feature").agg(
            F.sum("n").cast("long").alias("__n"),
            F.sum("s").cast("long").alias("__s"),
        )
        d = "decimal(38,0)"
        cand = cum.join(F.broadcast(totals), "feature").where(
            F.col("n_l") < F.col("__n")
        )
        s_l = F.col("s_l").cast(d)
        n_l = F.col("n_l").cast(d)
        s_r = (F.col("__s") - F.col("s_l")).cast(d)
        n_r = (F.col("__n") - F.col("n_l")).cast(d)
        num = s_l * s_l * n_r + s_r * s_r * n_l
        den = n_l * n_r * F.lit(1_000_000).cast(d)
        scored = cand.select(
            "feature",
            "v",
            "n_l",
            "s_l",
            "__n",
            "__s",
            _floor_div(num, den).cast("long").alias("score"),
        )
        # nulls FIRST in the argmax sort: a decimal(38,0) overflow past
        # the documented |sum y²·n| bound yields NULL under non-ANSI
        # Spark — sorting it first makes the overflow surface as a loud
        # error below instead of silently excluding that candidate
        top = (
            scored.orderBy(
                F.col("score").desc_nulls_first(),
                F.col("feature"),
                F.col("v"),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        t = top[0]
        if t.score is None:
            raise ValueError(
                "boosted_stumps: split-score overflow (decimal(38,0) "
                "carrier) — |residual sums| exceed the documented "
                "~1e16 bound; rescale the target"
            )
        c_left = _int_floor(t.s_l, 2 * t.n_l)
        c_right = _int_floor(t["__s"] - t.s_l, 2 * (t["__n"] - t.n_l))
        model.append(
            (r + 1, t.feature, int(t.v), c_left, c_right, int(t.score))
        )
        resid = resid - F.when(
            F.col(t.feature) <= F.lit(int(t.v)), F.lit(c_left)
        ).otherwise(F.lit(c_right))
    spark = df.sparkSession
    return spark.createDataFrame(
        model,
        "round long, feature string, threshold long,"
        " left_value long, right_value long, score long",
    )


def _int_floor(a: int, b: int) -> int:
    """Python floor division matches the engines' pmod-adjusted floor
    (Python // already floors toward -inf)."""
    return int(a // b)


def boosted_stumps_oracle_sql(
    table: str,
    feature_sqls: Mapping[str, str],
    target_sql: str,
    rounds: int = 2,
) -> str:
    """DuckDB mirror of :func:`boosted_stumps`: rounds unroll as
    chained CTEs; each round's residual dispatches on the previous
    round's argmax row via scalar subqueries. Integer arithmetic is
    identical (HUGEINT products, floor divisions)."""
    names = list(feature_sqls)
    cols = ", ".join(
        f"CAST({sql} AS BIGINT) AS {n}" for n, sql in feature_sqls.items()
    )
    fd = "((({a}) - (((({a}) % ({b})) + ({b})) % ({b}))) // ({b}))"

    def melt(src: str, ycol: str) -> str:
        return " UNION ALL ".join(
            f"SELECT '{n}' AS feature, {n} AS v, {ycol} AS y FROM {src}"
            f" WHERE {n} IS NOT NULL AND {ycol} IS NOT NULL"
            for n in names
        )

    def round_ctes(r: int, src: str) -> str:
        num = (
            f"CAST(s_l AS HUGEINT) * s_l * (__n - n_l)"
            f" + CAST(__s - s_l AS HUGEINT) * (__s - s_l) * n_l"
        )
        den = "CAST(n_l AS HUGEINT) * (__n - n_l) * 1000000"
        return f"""
        m{r} AS ({melt(src, "__y2")}),
        c{r} AS (
          SELECT feature, v, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS s
          FROM m{r} GROUP BY feature, v
        ),
        cum{r} AS (
          SELECT feature, v,
                 CAST(sum(n) OVER win AS BIGINT) AS n_l,
                 CAST(sum(s) OVER win AS BIGINT) AS s_l,
                 CAST(sum(n) OVER (PARTITION BY feature) AS BIGINT) AS __n,
                 CAST(sum(s) OVER (PARTITION BY feature) AS BIGINT) AS __s
          FROM c{r}
          WINDOW win AS (PARTITION BY feature ORDER BY v
                         ROWS UNBOUNDED PRECEDING)
        ),
        top{r} AS (
          SELECT feature, v, n_l, s_l, __n, __s,
                 CAST({fd.format(a=num, b=den)} AS BIGINT) AS score,
                 CAST({fd.format(a="CAST(s_l AS HUGEINT)",
                                 b="2 * CAST(n_l AS HUGEINT)")}
                      AS BIGINT) AS c_left,
                 CAST({fd.format(a="CAST(__s - s_l AS HUGEINT)",
                                 b="2 * CAST(__n - n_l AS HUGEINT)")}
                      AS BIGINT) AS c_right
          FROM cum{r} WHERE n_l < __n
          ORDER BY score DESC, feature, v LIMIT 1
        )"""

    ctes = [
        f"""base0 AS (
          SELECT {cols}, CAST(({target_sql}) AS BIGINT) * 2 AS __y2
          FROM {table}
        )""",
        round_ctes(0, "base0"),
    ]
    for r in range(1, int(rounds)):
        p = r - 1
        dispatch = " ".join(
            f"WHEN (SELECT feature FROM top{p}) = '{n}' THEN"
            f" CASE WHEN {n} <= (SELECT v FROM top{p})"
            f" THEN (SELECT c_left FROM top{p})"
            f" ELSE (SELECT c_right FROM top{p}) END"
            for n in names
        )
        ctes.append(
            f"""base{r} AS (
          SELECT * REPLACE (__y2 - (CASE {dispatch} END) AS __y2)
          FROM base{p}
        )"""
        )
        ctes.append(round_ctes(r, f"base{r}"))
    selects = " UNION ALL ".join(
        f"SELECT CAST({r + 1} AS BIGINT) AS round, feature,"
        f" CAST(v AS BIGINT) AS threshold, c_left AS left_value,"
        f" c_right AS right_value, score FROM top{r}"
        for r in range(int(rounds))
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects
