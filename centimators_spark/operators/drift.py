"""Feature-drift monitoring: Population Stability Index between a
reference and a current slice of a panel — the standard production
check that a served feature's distribution still looks like training.

Spark shape (holds at 100 TB): ONE filtered exact/approx percentile
aggregation over the reference slice plans the bin boundaries per
feature (ONE tiny collected row, inlined as literal comparisons so the
bin math stays in whole-stage codegen), one melt (Expand, map-side)
turns the wide feature columns into (feature, side, bin) rows, and one
grouped aggregation counts them — two small shuffles total, no per-row
Python, no driver loop over features.

Exactness: boundaries are interpolated percentiles (Spark
``percentile`` == DuckDB ``quantile_cont`` — the parity
operators/encoding.quantile_bin already pins), counts are exact
integers, and the PSI expression over smoothed proportions is shared
text rounded to ``digits`` — hash-exact DuckDB oracle
(:func:`psi_drift_oracle_sql`).

Reference scope: the reference ships no drift monitor; this is the
§2.3-style extension a training platform needs next to era_report
(scores drifting) — PSI over the same fixed-decimal carriers.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _psi_expr(p_ref: Column, p_cur: Column) -> Column:
    return (p_cur - p_ref) * (F.log(p_cur) - F.log(p_ref))


def psi_drift(
    df: DataFrame,
    feature_cols: Sequence[str],
    ref_cond: Column,
    *,
    n_bins: int = 10,
    exact: bool = False,
    digits: int = 6,
) -> DataFrame:
    """PSI per feature between the ``ref_cond`` slice (reference /
    training period) and its complement (current period).

    Bins are equal-population on the REFERENCE side (n_bins−1 interior
    interpolated percentiles; bin = number of boundaries strictly below
    the value, same rule as quantile_bin); both sides' bin counts are
    Laplace-smoothed by 0.5 so empty bins contribute finitely:
    p = (c + 0.5) / (n + 0.5·n_bins). NULL feature values are excluded
    from that feature's bins and totals (a missing value is not drift
    evidence), so n_ref/n_cur are per-feature NON-NULL counts. Returns
    one row per feature: (feature, n_ref, n_cur, psi) with psi rounded
    to ``digits``.

    Rule of thumb: psi < 0.1 stable, 0.1–0.25 moderate shift, > 0.25
    action. The default boundary aggregation is the mergeable
    ``approx_percentile`` sketch — the 100 TB path (exact mode sorts
    each feature's reference values inside ONE aggregation buffer:
    executor-OOM bait on a real table; it exists for oracle parity and
    is pinned to the sketch by the psi_sketch_contract query)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    feats = list(feature_cols)
    probs = [i / n_bins for i in range(1, n_bins)]
    probs_sql = ", ".join(repr(p) for p in probs)
    fn = "percentile" if exact else "approx_percentile"
    sided = df.withColumn("__ref", ref_cond)
    # boundaries collected as ONE tiny row and inlined as literals: the
    # bin count is then plain when/+ arithmetic in whole-stage codegen.
    # Keeping the bounds as an array COLUMN forces F.aggregate — a
    # higher-order function, CodegenFallback/interpreted per row —
    # which profiling showed costing ~10x the rest of the query
    # combined (see psi_drift_dual).
    brow = sided.select("__ref", *feats).agg(
        *[
            F.expr(
                f"{fn}(CASE WHEN __ref THEN CAST(`{c}` AS DOUBLE) END,"
                f" array({probs_sql}))"
            ).alias(f"__b_{i}")
            for i, c in enumerate(feats)
        ]
    ).collect()[0]

    def _bin_expr(i: int, c: str):
        v = F.col(f"`{c}`").cast("double")
        blist = brow[f"__b_{i}"]
        if blist is None:  # empty reference slice: no boundaries
            return F.lit(None).cast("int")
        bins = F.lit(0)
        for b in blist:
            bins = bins + F.when(v > F.lit(float(b)), 1).otherwise(0)
        # NULL value -> NULL bin (filtered below): without the guard a
        # NULL falls into bin 0 (every v > b is NULL -> otherwise(0))
        # and silently inflates the lowest bin of sparse features
        return F.when(v.isNotNull(), bins)

    melted = sided.select(
        "__ref",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        _bin_expr(i, c).alias("bin"),
                    )
                    for i, c in enumerate(feats)
                ]
            )
        ).alias("fb"),
    )
    melted = melted.where(F.col("fb.bin").isNotNull())
    counts = melted.groupBy(
        F.col("fb.feature").alias("feature"), F.col("fb.bin").alias("bin")
    ).agg(
        F.sum(F.when(F.col("__ref"), 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("__ref"), 0).otherwise(1)).alias("c_cur"),
    )
    # per-feature totals as window sums over the TINY counts frame
    # (features × bins rows) — a separate groupBy+join here would make
    # Spark recompute the whole melt lineage (a second full scan)
    from pyspark.sql import Window

    wtot = Window.partitionBy("feature")
    smooth = 0.5
    j = counts.withColumn("n_ref", F.sum("c_ref").over(wtot)).withColumn(
        "n_cur", F.sum("c_cur").over(wtot)
    )
    p_ref = (F.col("c_ref") + smooth) / (
        F.col("n_ref") + F.lit(smooth * n_bins)
    )
    p_cur = (F.col("c_cur") + smooth) / (
        F.col("n_cur") + F.lit(smooth * n_bins)
    )
    return (
        j.withColumn("__t", _psi_expr(p_ref, p_cur))
        .groupBy("feature")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.round(F.sum("__t"), digits).alias("psi"),
        )
    )


def psi_drift_dual(
    df: DataFrame,
    feature_cols: Sequence[str],
    ref_cond: Column,
    *,
    n_bins: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Exact-mode AND sketch-mode PSI in ONE pass — the shape the
    sketch contract wants: running :func:`psi_drift` twice costs two
    boundary aggregations plus two melt scans of the fact table (4 full
    scans); here both boundary sets come out of a single aggregation
    (``percentile`` and ``approx_percentile`` side by side) and a
    single melt emits (feature, mode, bin) rows for both modes, so the
    fact table is scanned twice total and shuffled once. Returns one
    row per feature: (feature, n_ref, n_cur, psi_exact, psi_sketch) —
    bin rule, NULL exclusion, smoothing, and rounding identical to
    :func:`psi_drift` in each mode.

    The n_bins−1 boundaries per (feature, mode) are collected to the
    driver (a single tiny row — the literal-centroid discipline the
    k-means scans use) and inlined as LITERAL comparisons, so the bin
    expression is plain when/+ arithmetic inside whole-stage codegen.
    The array-column alternative (F.aggregate over a broadcast bounds
    row) is a higher-order function — CodegenFallback, interpreted
    per row — which profiling showed dominating the whole query
    (~5.1 s of 5.4 s at sf0.1)."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    from pyspark.sql import Window

    feats = list(feature_cols)
    probs = [i / n_bins for i in range(1, n_bins)]
    probs_sql = ", ".join(repr(p) for p in probs)
    sided = df.withColumn("__ref", ref_cond)
    aggs = []
    for i, c in enumerate(feats):
        case = (
            f"CASE WHEN __ref THEN CAST(`{c}` AS DOUBLE) END,"
            f" array({probs_sql})"
        )
        aggs.append(F.expr(f"percentile({case})").alias(f"__be_{i}"))
        aggs.append(F.expr(f"approx_percentile({case})").alias(f"__bs_{i}"))
    brow = sided.select("__ref", *feats).agg(*aggs).collect()[0]

    def _bin_expr(blist, c: str):
        v = F.col(f"`{c}`").cast("double")
        if blist is None:
            return F.lit(None).cast("int")
        bins = F.lit(0)
        for b in blist:
            bins = bins + F.when(v > F.lit(float(b)), 1).otherwise(0)
        return F.when(v.isNotNull(), bins)

    structs = []
    for i, c in enumerate(feats):
        for mode, prefix in (("exact", "__be_"), ("sketch", "__bs_")):
            structs.append(
                F.struct(
                    F.lit(c).alias("feature"),
                    F.lit(mode).alias("mode"),
                    _bin_expr(brow[f"{prefix}{i}"], c).alias("bin"),
                )
            )
    melted = (
        sided.select("__ref", F.explode(F.array(*structs)).alias("fb"))
        .where(F.col("fb.bin").isNotNull())
    )
    counts = melted.groupBy(
        F.col("fb.feature").alias("feature"),
        F.col("fb.mode").alias("mode"),
        F.col("fb.bin").alias("bin"),
    ).agg(
        F.sum(F.when(F.col("__ref"), 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("__ref"), 0).otherwise(1)).alias("c_cur"),
    )
    wtot = Window.partitionBy("feature", "mode")
    smooth = 0.5
    j = counts.withColumn("n_ref", F.sum("c_ref").over(wtot)).withColumn(
        "n_cur", F.sum("c_cur").over(wtot)
    )
    p_ref = (F.col("c_ref") + smooth) / (
        F.col("n_ref") + F.lit(smooth * n_bins)
    )
    p_cur = (F.col("c_cur") + smooth) / (
        F.col("n_cur") + F.lit(smooth * n_bins)
    )
    per_mode = (
        j.withColumn("__t", _psi_expr(p_ref, p_cur))
        .groupBy("feature", "mode")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.round(F.sum("__t"), digits).alias("psi"),
        )
    )
    exact_is = F.col("mode") == "exact"
    return per_mode.groupBy("feature").agg(
        F.max(F.when(exact_is, F.col("n_ref"))).alias("n_ref"),
        F.max(F.when(exact_is, F.col("n_cur"))).alias("n_cur"),
        F.max(F.when(exact_is, F.col("psi"))).alias("psi_exact"),
        F.max(F.when(~exact_is, F.col("psi"))).alias("psi_sketch"),
    )


def psi_drift_oracle_sql(
    table: str,
    feature_sqls: dict[str, str],
    ref_cond_sql: str,
    *,
    n_bins: int = 10,
    digits: int = 6,
) -> str:
    """DuckDB mirror of :func:`psi_drift` (exact mode): identical
    interpolated boundaries, bin rule, NULL exclusion, smoothing, and
    PSI expression. ``feature_sqls`` maps output feature name → SQL
    expression."""
    probs = [i / n_bins for i in range(1, n_bins)]
    probs_sql = ", ".join(repr(p) for p in probs)
    smooth = 0.5
    branches = []
    for name, expr in feature_sqls.items():
        branches.append(f"""
          SELECT '{name}' AS feature, __ref,
                 len(list_filter(
                   (SELECT quantile_cont(CASE WHEN {ref_cond_sql}
                             THEN CAST({expr} AS DOUBLE) END, [{probs_sql}])
                    FROM {table}),
                   b -> CAST({expr} AS DOUBLE) > b)) AS bin
          FROM (SELECT *, ({ref_cond_sql}) AS __ref FROM {table})
          WHERE {expr} IS NOT NULL
        """)
    union = " UNION ALL ".join(branches)
    return f"""
        WITH melted AS ({union}),
        counts AS (
          SELECT feature, bin,
                 sum(CASE WHEN __ref THEN 1 ELSE 0 END) AS c_ref,
                 sum(CASE WHEN __ref THEN 0 ELSE 1 END) AS c_cur
          FROM melted GROUP BY feature, bin
        ), tot AS (
          SELECT feature, sum(c_ref) AS n_ref, sum(c_cur) AS n_cur
          FROM counts GROUP BY feature
        ), terms AS (
          SELECT c.feature, t.n_ref, t.n_cur,
                 ((c.c_cur + {smooth!r}) / (t.n_cur + {smooth * n_bins!r})
                  - (c.c_ref + {smooth!r}) / (t.n_ref + {smooth * n_bins!r}))
                 * (ln((c.c_cur + {smooth!r}) / (t.n_cur + {smooth * n_bins!r}))
                    - ln((c.c_ref + {smooth!r}) / (t.n_ref + {smooth * n_bins!r})))
                   AS term
          FROM counts c JOIN tot t USING (feature)
        )
        SELECT feature,
               CAST(max(n_ref) AS BIGINT) AS n_ref,
               CAST(max(n_cur) AS BIGINT) AS n_cur,
               round(sum(term), {digits}) AS psi
        FROM terms GROUP BY feature
    """


def psi_drift_categorical(
    df: DataFrame,
    cat_cols: Sequence[str],
    ref_cond: Column,
    *,
    digits: int = 6,
) -> DataFrame:
    """Categorical PSI per column between the ``ref_cond`` slice and
    its complement — the sibling of :func:`psi_drift` for discrete
    features (each observed category is its own bin; no quantile
    boundaries, so no percentile aggregation at all).

    Smoothing matches the numeric operator: p = (c + 0.5) /
    (n + 0.5·K) with K the column's observed category count (both
    sides pooled — a category unseen in one side still contributes
    via its smoothed zero). NULL is a category. Returns
    (feature, n_ref, n_cur, n_categories, psi).

    Plan: one Generate-explode melt + one grouped count + window-sum
    totals over the tiny counts frame — same two-small-shuffle shape
    as the numeric PSI, no driver collect."""
    from pyspark.sql import Window

    feats = list(cat_cols)
    sided = df.withColumn("__ref", ref_cond)
    melted = sided.select(
        "__ref",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("feature"),
                        F.col(f"`{c}`").cast("string").alias("cat"),
                    )
                    for c in feats
                ]
            )
        ).alias("fc"),
    )
    counts = melted.groupBy(
        F.col("fc.feature").alias("feature"), F.col("fc.cat").alias("cat")
    ).agg(
        F.sum(F.when(F.col("__ref"), 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("__ref"), 0).otherwise(1)).alias("c_cur"),
    )
    wtot = Window.partitionBy("feature")
    smooth = 0.5
    j = (
        counts.withColumn("n_ref", F.sum("c_ref").over(wtot))
        .withColumn("n_cur", F.sum("c_cur").over(wtot))
        .withColumn("k", F.count(F.lit(1)).over(wtot))
    )
    p_ref = (F.col("c_ref") + smooth) / (
        F.col("n_ref") + smooth * F.col("k")
    )
    p_cur = (F.col("c_cur") + smooth) / (
        F.col("n_cur") + smooth * F.col("k")
    )
    return (
        j.withColumn("__t", _psi_expr(p_ref, p_cur))
        .groupBy("feature")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("k").alias("n_categories"),
            F.round(F.sum("__t"), digits).alias("psi"),
        )
    )


def psi_drift_categorical_oracle_sql(
    table: str,
    feature_sqls: dict[str, str],
    ref_cond_sql: str,
    *,
    digits: int = 6,
) -> str:
    """DuckDB mirror of :func:`psi_drift_categorical`."""
    smooth = 0.5
    branches = []
    for name, expr in feature_sqls.items():
        branches.append(f"""
          SELECT '{name}' AS feature, ({ref_cond_sql}) AS __ref,
                 CAST({expr} AS VARCHAR) AS cat
          FROM {table}
        """)
    union = " UNION ALL ".join(branches)
    return f"""
        WITH melted AS ({union}),
        counts AS (
          SELECT feature, cat,
                 sum(CASE WHEN __ref THEN 1 ELSE 0 END) AS c_ref,
                 sum(CASE WHEN __ref THEN 0 ELSE 1 END) AS c_cur
          FROM melted GROUP BY feature, cat
        ), tot AS (
          SELECT *,
                 sum(c_ref) OVER (PARTITION BY feature) AS n_ref,
                 sum(c_cur) OVER (PARTITION BY feature) AS n_cur,
                 count(*) OVER (PARTITION BY feature) AS k
          FROM counts
        ), terms AS (
          SELECT feature, n_ref, n_cur, k,
                 ((c_cur + {smooth!r}) / (n_cur + {smooth!r} * k)
                  - (c_ref + {smooth!r}) / (n_ref + {smooth!r} * k))
                 * (ln((c_cur + {smooth!r}) / (n_cur + {smooth!r} * k))
                    - ln((c_ref + {smooth!r}) / (n_ref + {smooth!r} * k)))
                   AS term
          FROM tot
        )
        SELECT feature,
               CAST(max(n_ref) AS BIGINT) AS n_ref,
               CAST(max(n_cur) AS BIGINT) AS n_cur,
               CAST(max(k) AS BIGINT) AS n_categories,
               round(sum(term), {digits}) AS psi
        FROM terms GROUP BY feature
    """


# ------------------------------------------------------------ changepoint

def single_changepoint(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Exact single mean-shift changepoint per group (binary
    segmentation's first split — the CUSUM/least-squares criterion of
    Hinkley 1970 / the first step of PELT): over the series ordered by
    ``order_cols``, find the split index t (1 <= t < n) that maximizes
    the between-segment criterion

        D(t) = S1^2/n1 + S2^2/n2   (equivalently minimizes total SSE)

    — the drift-localization question ("WHEN did the level shift")
    after windowed_psi / page_hinkley answer "did it drift".

    Exactness (hash-proven contract): values are centi-unit integers
    round(v*100); the criterion is evaluated as the exact integer
    floor D_scaled(t) = floor(1e6 * (S1^2*n2 + S2^2*n1) / (n1*n2))
    in decimal(38,0)/HUGEINT (bounded: |S| <= n*100*|v|max keeps the
    numerator under 10^38 up to ~10^7-row groups at |v| <= 10^3), and
    the argmax tie-breaks on the smaller t — deterministic on both
    engines. Output per group: n, cp_index (1-based last index of the
    left segment), d_max (the scaled criterion at the split), d_base
    (the no-split criterion floor(1e6*T^2/n)); d_max >= d_base always.

    Scale: one sort-window per group (the single data-sized shuffle),
    a broadcast of the tiny per-group totals, then the argmax — no
    pair join, no quadratic stage; every split candidate is evaluated
    from the prefix sums alone."""
    from pyspark.sql import Window

    d38 = "decimal(38,0)"
    g = F.col(group_col)
    vm = F.round(F.col(value_col) * 100).cast("long")
    pts = df.select(
        g.alias("grp"), vm.alias("__vm"), *[F.col(c) for c in order_cols]
    ).select(
        "grp",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(
                *[F.col(c) for c in order_cols]
            )
        ).alias("rn"),
        F.sum("__vm")
        .over(
            Window.partitionBy("grp")
            .orderBy(*[F.col(c) for c in order_cols])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast(d38)
        .alias("S"),
    )
    tot = pts.groupBy("grp").agg(
        F.max("rn").cast("long").alias("n"),
        F.max_by("S", "rn").cast(d38).alias("T"),
    )
    j = pts.join(F.broadcast(tot), "grp").where(F.col("rn") < F.col("n"))
    n1 = F.col("rn").cast(d38)
    n2 = (F.col("n") - F.col("rn")).cast(d38)
    s1 = F.col("S")
    s2 = (F.col("T") - F.col("S")).cast(d38)
    num = (s1 * s1 * n2 + s2 * s2 * n1).cast(d38)
    den = (n1 * n2).cast(d38)
    scored = j.withColumn(
        "D", ((num - F.pmod(num, den)) / den).cast(d38)
    )
    w_arg = Window.partitionBy("grp").orderBy(
        F.col("D").desc(), F.col("rn").asc()
    )
    best = (
        scored.withColumn("__r", F.row_number().over(w_arg))
        .where(F.col("__r") == 1)
        .select("grp", "n", F.col("rn").alias("cp_index"), "D")
    )
    base_num = (F.col("T") * F.col("T")).cast(d38)
    base_den = F.col("n").cast(d38)
    base = tot.select(
        "grp",
        ((base_num - F.pmod(base_num, base_den)) / base_den)
        .cast(d38)
        .alias("d_base"),
    )
    return best.join(F.broadcast(base), "grp").select(
        "grp",
        "n",
        "cp_index",
        F.col("D").cast("long").alias("d_max"),
        F.col("d_base").cast("long").alias("d_base"),
    )


def single_changepoint_oracle_sql(
    table: str,
    group_sql: str,
    order_sqls: Sequence[str],
    value_sql: str,
) -> str:
    """DuckDB mirror of :func:`single_changepoint` (HUGEINT)."""
    order = ", ".join(order_sqls)
    return f"""
        WITH pts AS (
          SELECT {group_sql} AS grp,
                 row_number() OVER w AS rn,
                 sum(CAST(round({value_sql} * 100) AS BIGINT))
                   OVER (PARTITION BY {group_sql} ORDER BY {order}
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS S
          FROM {table}
          WINDOW w AS (PARTITION BY {group_sql} ORDER BY {order})
        ), tot AS (
          SELECT grp, CAST(max(rn) AS BIGINT) AS n,
                 max_by(S, rn) AS T
          FROM pts GROUP BY grp
        ), scored AS (
          SELECT p.grp, t.n, p.rn,
                 (CAST(p.S AS HUGEINT) * p.S * (t.n - p.rn)
                  + CAST(t.T - p.S AS HUGEINT) * (t.T - p.S) * p.rn)
                 // (CAST(p.rn AS HUGEINT) * (t.n - p.rn)) AS D
          FROM pts p JOIN tot t ON p.grp = t.grp
          WHERE p.rn < t.n
        ), best AS (
          SELECT grp, n, rn AS cp_index, D,
                 row_number() OVER (PARTITION BY grp
                                    ORDER BY D DESC, rn ASC) AS r
          FROM scored
        )
        SELECT b.grp, b.n, b.cp_index,
               CAST(b.D AS BIGINT) AS d_max,
               CAST(CAST(t.T AS HUGEINT) * t.T // t.n AS BIGINT)
                 AS d_base
        FROM best b JOIN tot t ON b.grp = t.grp
        WHERE b.r = 1
    """
