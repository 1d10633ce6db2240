"""Corpus divergence — distribution-shift detection between two
document sets (train vs incoming, source A vs source B): symmetric
KL divergence of their add-1-smoothed unigram token distributions,
plus the top tokens driving the shift. The standard data-quality
monitor before mixing a new source into a training corpus.

Exactness (the unigram-LM convention, analysis.py): token counts are
exact integers; each token's log-ratio rounds to 6dp micro-units and
multiplies by its exact smoothed numerator, so the divergence sums are
partition-order-independent BIGINT arithmetic until one final
division — the DuckDB oracle is bit-exact.

Plan: one explode + one (token × side) count aggregation + one
full-outer self-alignment on the token key (both sides of the same
aggregate — no second scan), then a tiny global sum. Vocabulary is
the union; add-1 smoothing keeps every log finite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import sql_tokens, tokens

DIV_SCALE = 1_000_000


def _side_token_lpu(
    df: DataFrame,
    side_expr: Column,
    content_col: str,
):
    """Shared core of corpus_divergence and token_shift_report: the
    per-token frame (t, ca, cb, na, nb, v) with the smoothed 6dp
    micro-unit log-ratio ``lpu`` — ONE definition so the divergence
    total and the per-token attribution can never desynchronize."""
    ex = df.select(
        side_expr.cast("boolean").alias("a"),
        F.explode(tokens(F.col(content_col))).alias("t"),
    ).where(F.col("a").isNotNull())
    counts = ex.groupBy("t").agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("a"), 0).otherwise(1)).alias("cb"),
    )
    totals = counts.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    num = (F.col("ca") + 1) * (F.col("nb") + F.col("v"))
    den = (F.col("cb") + 1) * (F.col("na") + F.col("v"))
    lpu = F.round(
        F.log(num.cast("double") / den.cast("double")) * DIV_SCALE
    ).cast("long")
    return j, lpu


def corpus_divergence(
    df: DataFrame,
    side_expr: Column,
    *,
    content_col: str = "text",
) -> DataFrame:
    """One row: token totals, union vocabulary size, and the smoothed
    KL divergences in BOTH directions plus their symmetrised sum
    (Jeffreys divergence). ``side_expr`` must evaluate to a boolean —
    True rows form corpus A, False rows corpus B; null-side rows are
    excluded."""
    j, lpu = _side_token_lpu(df, side_expr, content_col)
    terms = j.select(
        "na", "nb", "v",
        ((F.col("ca") + 1) * lpu).alias("ta"),   # (ca+1)·ln(pa/pb)·1e6
        (-(F.col("cb") + 1) * lpu).alias("tb"),  # (cb+1)·ln(pb/pa)·1e6
    )
    agg = terms.groupBy("na", "nb", "v").agg(
        F.sum("ta").alias("sa"), F.sum("tb").alias("sb")
    )
    kl_ab = F.col("sa").cast("double") / (
        (F.col("na") + F.col("v")).cast("double") * DIV_SCALE
    )
    kl_ba = F.col("sb").cast("double") / (
        (F.col("nb") + F.col("v")).cast("double") * DIV_SCALE
    )
    return agg.select(
        F.col("na").alias("n_tokens_a"),
        F.col("nb").alias("n_tokens_b"),
        F.col("v").alias("vocab"),
        F.round(kl_ab, 6).alias("kl_ab"),
        F.round(kl_ba, 6).alias("kl_ba"),
        F.round(kl_ab + kl_ba, 6).alias("jeffreys"),
    )


def corpus_divergence_oracle_sql(
    table: str = "documents",
    side_sql: str = "doc_id % 2 = 0",
    content_sql: str = "text",
) -> str:
    """DuckDB mirror of :func:`corpus_divergence`."""
    tok = sql_tokens(content_sql)
    return f"""
        WITH ex AS (
          SELECT CAST(({side_sql}) AS BOOLEAN) AS a, unnest({tok}) AS t
          FROM {table}
          WHERE ({side_sql}) IS NOT NULL
        ), counts AS (
          SELECT t,
                 sum(CASE WHEN a THEN 1 ELSE 0 END) AS ca,
                 sum(CASE WHEN a THEN 0 ELSE 1 END) AS cb
          FROM ex GROUP BY t
        ), totals AS (
          SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM counts
        ), terms AS (
          SELECT na, nb, v,
                 (ca + 1) * CAST(round(ln(
                   CAST((ca + 1) * (nb + v) AS DOUBLE)
                   / CAST((cb + 1) * (na + v) AS DOUBLE)) * {DIV_SCALE})
                   AS BIGINT) AS ta,
                 -(cb + 1) * CAST(round(ln(
                   CAST((ca + 1) * (nb + v) AS DOUBLE)
                   / CAST((cb + 1) * (na + v) AS DOUBLE)) * {DIV_SCALE})
                   AS BIGINT) AS tb
          FROM counts CROSS JOIN totals
        ), agg AS (
          SELECT na, nb, v, sum(ta) AS sa, sum(tb) AS sb
          FROM terms GROUP BY na, nb, v
        )
        SELECT CAST(na AS BIGINT) AS n_tokens_a,
               CAST(nb AS BIGINT) AS n_tokens_b,
               CAST(v AS BIGINT) AS vocab,
               round(CAST(sa AS DOUBLE)
                 / (CAST(na + v AS DOUBLE) * {DIV_SCALE}), 6) AS kl_ab,
               round(CAST(sb AS DOUBLE)
                 / (CAST(nb + v AS DOUBLE) * {DIV_SCALE}), 6) AS kl_ba,
               round(CAST(sa AS DOUBLE)
                   / (CAST(na + v AS DOUBLE) * {DIV_SCALE})
                 + CAST(sb AS DOUBLE)
                   / (CAST(nb + v AS DOUBLE) * {DIV_SCALE}), 6) AS jeffreys
        FROM agg
    """


def token_shift_report(
    df: DataFrame,
    side_expr: Column,
    *,
    content_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """The tokens driving the shift: top_k by absolute contribution to
    the Jeffreys divergence (exact micro-unit carriers; ties break by
    token). Companion to :func:`corpus_divergence` for debugging WHAT
    changed, not just how much."""
    j, lpu = _side_token_lpu(df, side_expr, content_col)
    # per-token Jeffreys contribution, cleared of the two denominators
    # (× (na+v)(nb+v), a positive constant): exact DECIMAL arithmetic so
    # the ordering is deterministic, not ULP-dependent
    d = "decimal(38,0)"
    contrib = (
        ((F.col("ca") + 1) * lpu).cast(d) * (F.col("nb") + F.col("v")).cast(d)
        - ((F.col("cb") + 1) * lpu).cast(d) * (F.col("na") + F.col("v")).cast(d)
    )
    out = j.select(
        "t", "ca", "cb", lpu.alias("log_ratio_u"), contrib.alias("contrib_u")
    )
    return (
        out.orderBy(F.abs(F.col("contrib_u")).desc(), F.col("t").asc())
        .limit(top_k)
    )
