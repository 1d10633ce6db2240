"""A/B experiment readout — per-variant conversion and metric
statistics with two-proportion / Welch two-mean z-scores against a
control variant.

Spark shape: ONE grouped aggregation over the assignment table (exact
integer conversion counts + DECIMAL(38,0) micro-unit metric sums →
partition-order independent), then a broadcast join of the one-row
control slice back onto the tiny per-variant frame — the data-sized
input is touched exactly once.

Cross-engine exactness: every post-aggregation operation is +,−,×,÷,
sqrt — all IEEE correctly-rounded, so identical double inputs give
bit-identical z-scores in Spark and DuckDB; outputs are still rounded
to ``round_dp`` as belt-and-braces. (No transcendentals anywhere: we
report z, not p-values — the monotone map to p is presentation, not
analysis, and erf differs across libms.)

Reference scope: no reference counterpart — §2.3 analytics extension;
the experiment-analysis sibling of era_report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ab_test_report(
    df: DataFrame,
    *,
    variant_col: str = "variant",
    converted_col: str = "converted",
    metric_col: str = "metric",
    control: str = "control",
    metric_dp: int = 6,
    round_dp: int = 6,
) -> DataFrame:
    """Per-variant experiment stats + z-scores vs ``control``:

    (variant, n, conversions, conv_rate, z_conv, mean_metric, z_mean)

    ``converted_col`` is 0/1 per subject; ``metric_col`` is the
    per-subject outcome (quantized to ``metric_dp`` decimals for exact
    sums). z_conv is the pooled two-proportion z; z_mean the
    unpooled (Welch) two-mean z. The control row carries NULL z."""
    scale = float(10 ** metric_dp)
    q = F.round(F.col(metric_col).cast("double") * scale).cast(
        "decimal(38,0)"
    )
    per = df.groupBy(F.col(variant_col).alias("variant")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(converted_col).cast("long")).alias("conversions"),
        F.sum(q).alias("__s1"),
        F.sum(q * q).alias("__s2"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("__s1").cast("double") / scale
    s2 = F.col("__s2").cast("double") / (scale * scale)
    stats = per.select(
        "variant",
        "n",
        "conversions",
        (F.col("conversions").cast("double") / nd).alias("__p"),
        s1.alias("__sum"),
        ((s2 - s1 * s1 / nd) / (nd - 1)).alias("__var"),
    )
    # materialize the one-row control slice: validates the control
    # variant EXISTS (ADVICE r5 — a misspelled control= used to
    # crossJoin an empty frame and silently return an empty report)
    # and replaces the crossJoin with literal columns, so the final
    # plan aggregates the assignment table exactly once
    ctrl_rows = stats.where(F.col("variant") == control).select(
        "n", "conversions", "__p", "__sum", "__var"
    ).collect()
    if not ctrl_rows:
        variants = sorted(
            r.variant for r in stats.select("variant").collect()
        )
        raise ValueError(
            f"ab_test_report: control variant {control!r} not present; "
            f"observed variants: {variants}"
        )
    c = ctrl_rows[0]
    j = (
        stats.withColumn("__cn", F.lit(c["n"]))
        .withColumn("__cc", F.lit(c["conversions"]))
        .withColumn("__cp", F.lit(c["__p"]))
        .withColumn("__csum", F.lit(c["__sum"]))
        .withColumn("__cvar", F.lit(c["__var"]))
    )
    nd_c = F.col("__cn").cast("double")
    pooled = (
        F.col("conversions") + F.col("__cc")
    ).cast("double") / (nd + nd_c)
    se_p = F.sqrt(pooled * (1 - pooled) * (1 / nd + 1 / nd_c))
    mean = F.col("__sum") / nd
    cmean = F.col("__csum") / nd_c
    se_m = F.sqrt(F.col("__var") / nd + F.col("__cvar") / nd_c)
    is_ctrl = F.col("variant") == control
    # degenerate arms (everyone converts / zero variance) have no
    # defined z — emit NULL, never a divide-by-zero (ANSI session)
    z_conv = F.when(
        ~is_ctrl & (se_p > 0), (F.col("__p") - F.col("__cp")) / se_p
    )
    z_mean = F.when(~is_ctrl & (se_m > 0), (mean - cmean) / se_m)
    return j.select(
        "variant",
        "n",
        "conversions",
        F.round(F.col("__p"), round_dp).alias("conv_rate"),
        F.round(z_conv, round_dp).alias("z_conv"),
        F.round(mean, round_dp).alias("mean_metric"),
        F.round(z_mean, round_dp).alias("z_mean"),
    )


def cuped_adjust(
    df: DataFrame,
    *,
    metric_col: str = "metric",
    covariate_col: str = "pre_metric",
    out_col: str = "metric_cuped",
    metric_dp: int = 6,
    round_dp: int = 6,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): adjust the outcome
    metric by its pre-experiment covariate,

        y' = y − θ·(x − x̄),   θ = cov(x, y) / var(x)

    so the A/B z-test on ``y'`` gains power without bias (E[y'] =
    E[y]). θ and x̄ come from ONE aggregation of exact DECIMAL(38,0)
    micro-unit carriers broadcast back — partition-order independent,
    so θ is bit-identical cross-engine; the adjusted metric rounds to
    ``round_dp``. Feed the output to :func:`ab_test_report` with
    ``metric_col=out_col``."""
    scale = float(10 ** metric_dp)
    qx = F.round(F.col(covariate_col).cast("double") * scale).cast(
        "decimal(38,0)"
    )
    qy = F.round(F.col(metric_col).cast("double") * scale).cast(
        "decimal(38,0)"
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(qx).alias("__sx"),
        F.sum(qy).alias("__sy"),
        F.sum(qx * qx).alias("__sxx"),
        F.sum(qx * qy).alias("__sxy"),
    )
    j = df.crossJoin(F.broadcast(stats))
    nd = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double") / scale
    sy = F.col("__sy").cast("double") / scale
    sxx = F.col("__sxx").cast("double") / (scale * scale)
    sxy = F.col("__sxy").cast("double") / (scale * scale)
    var_x = sxx - sx * sx / nd
    cov_xy = sxy - sx * sy / nd
    theta = F.when(var_x > 0, cov_xy / var_x).otherwise(F.lit(0.0))
    adj = F.col(metric_col).cast("double") - theta * (
        F.col(covariate_col).cast("double") - sx / nd
    )
    return j.withColumn(out_col, F.round(adj, round_dp)).drop(
        "__n", "__sx", "__sy", "__sxx", "__sxy"
    )


def cuped_adjust_oracle_sql(
    table_sql: str,
    *,
    metric_sql: str = "metric",
    covariate_sql: str = "pre_metric",
    select_sql: str = "*",
    out_name: str = "metric_cuped",
    metric_dp: int = 6,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`cuped_adjust` (identical carriers and
    expression order)."""
    scale = float(10 ** metric_dp)
    qx = f"CAST(round(CAST({covariate_sql} AS DOUBLE) * {scale!r}) AS HUGEINT)"
    qy = f"CAST(round(CAST({metric_sql} AS DOUBLE) * {scale!r}) AS HUGEINT)"
    return f"""
        WITH s AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum({qx}) AS DOUBLE) / {scale!r} AS sx,
                 CAST(sum({qy}) AS DOUBLE) / {scale!r} AS sy,
                 CAST(sum({qx} * {qx}) AS DOUBLE) / ({scale!r} * {scale!r})
                   AS sxx,
                 CAST(sum({qx} * {qy}) AS DOUBLE) / ({scale!r} * {scale!r})
                   AS sxy
          FROM {table_sql}
        )
        SELECT {select_sql},
               round(CAST({metric_sql} AS DOUBLE)
                 - (CASE WHEN sxx - sx * sx / n > 0
                         THEN (sxy - sx * sy / n) / (sxx - sx * sx / n)
                         ELSE 0.0 END)
                   * (CAST({covariate_sql} AS DOUBLE) - sx / n),
                 {round_dp}) AS {out_name}
        FROM {table_sql} CROSS JOIN s
    """


def ab_test_report_oracle_sql(
    table_sql: str,
    *,
    variant_sql: str = "variant",
    converted_sql: str = "converted",
    metric_sql: str = "metric",
    control: str = "control",
    metric_dp: int = 6,
    round_dp: int = 6,
) -> str:
    """DuckDB mirror of :func:`ab_test_report` (identical carrier
    quantization and IEEE expression order)."""
    scale = float(10 ** metric_dp)
    return f"""
        WITH per AS (
          SELECT {variant_sql} AS variant,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST({converted_sql} AS BIGINT)) AS BIGINT)
                   AS conversions,
                 sum(CAST(round(CAST({metric_sql} AS DOUBLE) * {scale!r})
                          AS HUGEINT)) AS s1,
                 sum(CAST(round(CAST({metric_sql} AS DOUBLE) * {scale!r})
                          AS HUGEINT)
                     * CAST(round(CAST({metric_sql} AS DOUBLE) * {scale!r})
                            AS HUGEINT)) AS s2
          FROM {table_sql} GROUP BY 1
        ), stats AS (
          SELECT variant, n, conversions,
                 CAST(conversions AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                 CAST(s1 AS DOUBLE) / {scale!r} AS sm,
                 (CAST(s2 AS DOUBLE) / ({scale!r} * {scale!r})
                  - (CAST(s1 AS DOUBLE) / {scale!r})
                    * (CAST(s1 AS DOUBLE) / {scale!r})
                    / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1) AS v
          FROM per
        ), ctrl AS (
          SELECT n AS cn, conversions AS cc, p AS cp, sm AS csum, v AS cv
          FROM stats WHERE variant = '{control}'
        ), ses AS (
          SELECT *,
            sqrt((CAST(conversions + cc AS DOUBLE)
                  / (CAST(n AS DOUBLE) + CAST(cn AS DOUBLE)))
                 * (1 - CAST(conversions + cc AS DOUBLE)
                    / (CAST(n AS DOUBLE) + CAST(cn AS DOUBLE)))
                 * (1 / CAST(n AS DOUBLE) + 1 / CAST(cn AS DOUBLE)))
              AS se_p,
            sqrt(v / CAST(n AS DOUBLE) + cv / CAST(cn AS DOUBLE)) AS se_m
          FROM stats CROSS JOIN ctrl
        )
        SELECT variant, n, conversions,
               round(p, {round_dp}) AS conv_rate,
               CASE WHEN variant <> '{control}' AND se_p > 0 THEN round(
                 (p - cp) / se_p, {round_dp}) END AS z_conv,
               round(sm / CAST(n AS DOUBLE), {round_dp}) AS mean_metric,
               CASE WHEN variant <> '{control}' AND se_m > 0 THEN round(
                 (sm / CAST(n AS DOUBLE) - csum / CAST(cn AS DOUBLE))
                 / se_m, {round_dp}) END AS z_mean
        FROM ses
    """


# --------------------------------------------------------------- SPRT

def sprt_bernoulli(
    df: DataFrame,
    group_col: str,
    success_col: str,
    *,
    p0_pct: int = 30,
    p1_pct: int = 35,
    llr_pos_micro: int | None = None,
    llr_neg_micro: int | None = None,
    ln_a_micro: int = 2_944_438,   # floor(1e6*ln((1-b)/a)), a=b=0.05
    ln_b_micro: int = -2_944_439,  # floor(1e6*ln(b/(1-a)))
) -> DataFrame:
    """Wald's sequential probability ratio test (Wald 1945) for a
    Bernoulli rate, per group — the sequential sibling of the
    fixed-horizon :func:`ab_test_report`: after n observations with k
    successes the log-likelihood ratio for H1: p = p1 vs H0: p = p0
    is LLR = k*ln(p1/p0) + (n-k)*ln((1-p1)/(1-p0)); cross ln A and
    accept H1, cross ln B and accept H0, otherwise keep sampling.

    Exactness (hash-proven): the two per-observation increments and
    both thresholds enter BOTH engines as fixed-point micro literals
    (the Benford/HLL discipline — no transcendental at query time),
    so llr_micro = k*l1 + (n-k)*l0 and the three-way decision are
    deterministic integers. Defaults are computed from (p0_pct,
    p1_pct) at import time via ``math.log`` and floored — pass
    explicit ``llr_*_micro`` to pin custom designs.

    Scale: one map-side-combined (group) count aggregation; output is
    group-cardinality. The statistic is ADDITIVE, so the same plan
    runs under Structured Streaming for a live sequential monitor
    (the cms_cells_stream argument)."""
    import math

    if llr_pos_micro is None:
        llr_pos_micro = math.floor(1e6 * math.log(p1_pct / p0_pct))
    if llr_neg_micro is None:
        llr_neg_micro = math.floor(
            1e6 * math.log((100 - p1_pct) / (100 - p0_pct))
        )
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(success_col).cast("long")).cast("long").alias("k"),
    )
    llr = (
        F.col("k") * F.lit(int(llr_pos_micro))
        + (F.col("n") - F.col("k")) * F.lit(int(llr_neg_micro))
    ).cast("long")
    decision = (
        F.when(llr >= F.lit(int(ln_a_micro)), F.lit("accept_h1"))
        .when(llr <= F.lit(int(ln_b_micro)), F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
    )
    return agg.select(
        "grp", "n", "k", llr.alias("llr_micro"), decision.alias("decision")
    )


def sprt_bernoulli_oracle_sql(
    table: str,
    group_sql: str,
    success_sql: str,
    *,
    p0_pct: int = 30,
    p1_pct: int = 35,
    llr_pos_micro: int | None = None,
    llr_neg_micro: int | None = None,
    ln_a_micro: int = 2_944_438,
    ln_b_micro: int = -2_944_439,
) -> str:
    """DuckDB mirror of :func:`sprt_bernoulli` (same micro literals;
    accepts the same explicit llr overrides so pinned custom designs
    stay mirrorable)."""
    import math

    l1 = (
        llr_pos_micro
        if llr_pos_micro is not None
        else math.floor(1e6 * math.log(p1_pct / p0_pct))
    )
    l0 = (
        llr_neg_micro
        if llr_neg_micro is not None
        else math.floor(1e6 * math.log((100 - p1_pct) / (100 - p0_pct)))
    )
    return f"""
        WITH agg AS (
          SELECT {group_sql} AS grp,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST({success_sql} AS BIGINT)) AS BIGINT)
                   AS k
          FROM {table} GROUP BY 1
        )
        SELECT grp, n, k,
               CAST(k * {l1} + (n - k) * {l0} AS BIGINT) AS llr_micro,
               CASE WHEN k * {l1} + (n - k) * {l0} >= {ln_a_micro}
                      THEN 'accept_h1'
                    WHEN k * {l1} + (n - k) * {l0} <= {ln_b_micro}
                      THEN 'accept_h0'
                    ELSE 'continue' END AS decision
        FROM agg
    """


def benjamini_hochberg(
    tests: DataFrame,
    group_col: str,
    p_col: str,
    *,
    q_milli: int = 100,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg
    1995) over a table of per-hypothesis p-values — the
    multiple-comparisons step every experimentation platform needs
    after fanning a test across segments: at FDR level q, find the
    largest rank k with p_(k) ≤ (k/m)·q and reject every hypothesis
    with p ≤ p_(k) (threshold form — tie-inclusive, the statsmodels
    convention, identical on both engines).

    Exactness: p-values arrive as integer milli-units (the
    permutation/SPRT carrier), so the step-up condition is the exact
    integer cross-multiplication p_milli·m ≤ rank·q_milli — no float
    anywhere. Ranks order by (p, group) — deterministic under ties.
    NULL p-values are excluded on both engines (no test to adjust).

    Scale: the input is one row per HYPOTHESIS (group-cardinality —
    the output of a grouped test kernel, inherently small); the one
    unpartitioned rank window spans m hypothesis rows, never data
    (same class as budget_select's ≤n_cells offsets window). The
    hypothesis table is localCheckpointed: the step-up threshold is
    an aggregate OVER the ranked rows joined back AGAINST them, and
    without the lineage cut both consumers would re-execute the
    upstream test kernel — a second corpus scan (caught by the plan
    audit). Output: (grp, p_milli, p_rank, m_tests, rejected).

    ``p_col`` MUST be integral milli-units already: a conventional
    fractional p-value (0.05) would silently truncate to 0 under the
    long cast and be rejected at any q, so a fractional-typed column
    is refused loudly here (r12 advice item 4)."""
    from pyspark.sql import Window

    p_dtype = dict(tests.dtypes).get(p_col, "")
    if p_dtype.startswith(("float", "double")) or (
        p_dtype.startswith("decimal") and not p_dtype.endswith(",0)")
    ):
        raise ValueError(
            f"benjamini_hochberg expects integral milli-unit p-values; "
            f"{p_col!r} has fractional dtype {p_dtype!r} — a 0.05 "
            f"p-value would truncate to 0 and always be rejected. "
            f"Convert with round(p * 1000) first."
        )
    base = (
        tests.select(
            F.col(group_col).alias("grp"),
            F.col(p_col).cast("long").alias("p_milli"),
        )
        .where(F.col(p_col).isNotNull())
        .localCheckpoint(eager=True)
    )
    # explicit NULLS LAST on the grp tiebreak: a NULL hypothesis key
    # (e.g. a NULL segment column flowing into a concat) with a TIED
    # p_milli would otherwise rank NULLS FIRST on Spark but NULLS
    # LAST in DuckDB (the event_paths ordering-parity class)
    w_rank = Window.orderBy(
        F.col("p_milli").asc_nulls_last(), F.col("grp").asc_nulls_last()
    )
    w_all = Window.partitionBy()
    ranked = base.withColumn(
        "p_rank", F.row_number().over(w_rank).cast("long")
    ).withColumn("m_tests", F.count(F.lit(1)).over(w_all).cast("long"))
    sel = ranked.agg(
        F.max(
            F.when(
                F.col("p_milli") * F.col("m_tests")
                <= F.col("p_rank") * F.lit(int(q_milli)),
                F.col("p_milli"),
            )
        ).alias("__p_star")
    )
    return ranked.crossJoin(F.broadcast(sel)).select(
        "grp",
        "p_milli",
        "p_rank",
        "m_tests",
        F.when(
            F.col("__p_star").isNotNull()
            & (F.col("p_milli") <= F.col("__p_star")),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("rejected"),
    )


def benjamini_hochberg_oracle_sql(
    tests_sql: str,
    group_sql: str = "grp",
    p_sql: str = "p_milli",
    *,
    q_milli: int = 100,
) -> str:
    """DuckDB mirror of :func:`benjamini_hochberg`."""
    return f"""
        WITH base AS (
          SELECT {group_sql} AS grp,
                 CAST({p_sql} AS BIGINT) AS p_milli
          FROM {tests_sql}
          WHERE {p_sql} IS NOT NULL
        ), ranked AS (
          SELECT grp, p_milli,
                 CAST(row_number() OVER (ORDER BY p_milli NULLS LAST,
                                         grp NULLS LAST)
                      AS BIGINT) AS p_rank,
                 CAST(count(*) OVER () AS BIGINT) AS m_tests
          FROM base
        ), sel AS (
          SELECT max(CASE WHEN p_milli * m_tests
                            <= p_rank * {int(q_milli)}
                     THEN p_milli END) AS p_star
          FROM ranked
        )
        SELECT grp, p_milli, p_rank, m_tests,
               CAST(CASE WHEN p_star IS NOT NULL
                          AND p_milli <= p_star
                    THEN 1 ELSE 0 END AS INTEGER) AS rejected
        FROM ranked CROSS JOIN sel
    """
