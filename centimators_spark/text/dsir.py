"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS) — the model-free way to pick pretraining documents that LOOK
like a target domain: estimate hashed-n-gram bag-of-words models for
the target and the raw (proposal) pool, weight each raw document by
its importance log-ratio, and resample via Gumbel top-k (reference
scope: the engine's corpus-selection surface beside
selection.token_budget_select and the quality filters, e.g.
/root/reference/src/centimators/).

Portability (the unigram_lm discipline): n-gram features hash into
``n_buckets`` via the portable md5 (both engines build the identical
bucket table); per-bucket add-α log-probs round to 6dp and ride EXACT
integer micro-unit carriers through the per-doc sums, so document
log-weights are plain integers. The Gumbel perturbation is
deterministic too — u = (md5(id)+1)/2^60, g = round(−ln(−ln u), 6) —
making the whole selection (weights, keys, chosen set) hash-provable.

Scale: ONE corpus-sized shuffle builds the bucket table (map-side
combined conditional sums — target and proposal counted in the same
pass), which then BROADCASTS (n_buckets rows); the per-doc weight is
a second map-side-combined aggregation; selection is a global top-k
(TakeOrdered — never a full sort). No pair join, no Python. At 100 TB
the bucket table is still KBs: the importance model is the sketch."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import (
    md5_long,
    sql_md5_long,
    sql_tokens,
    token_ngrams_all,
    tokens,
)

DSIR_BUCKETS = 1024
DSIR_N = 2  # hashed bigrams (the paper's feature space)
DSIR_K = 50
DSIR_ALPHA = 1.0
_P60 = 1 << 60


def dsir_scores(
    df: DataFrame,
    target_expr: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    n: int = DSIR_N,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """The DSIR SCORING stage: every proposal (non-target) document's
    exact integer micro-unit importance log-weight — (doc_id,
    n_grams, logw_micro), unordered, no truncation. This is the
    composable surface: :func:`dsir_select` adds the Gumbel top-k on
    top, and the pipeline consumers (e.g. the token-budget composed
    query) feed logw_micro straight into selection.token_budget_select
    as the quality column. Docs with no n-grams (short/empty/null
    text) cannot be scored and never appear, on both engines."""
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        # coalesce matches the oracle's CASE WHEN semantics: a NULL
        # predicate result (e.g. a NULL source column) counts as
        # proposal on BOTH engines — a bare cast would silently drop
        # the doc from both corpora only on the Spark side
        F.coalesce(F.expr(target_expr).cast("int"), F.lit(0)).alias(
            "__it"
        ),
        tokens(F.col(content_col)).alias("__tok"),
    )
    grams = docs.select(
        "doc_id",
        "__it",
        F.explode(token_ngrams_all(F.col("__tok"), n)).alias("g"),
    ).select(
        "doc_id",
        "__it",
        F.pmod(md5_long(F.col("g")), F.lit(n_buckets)).alias("b"),
    )
    # (doc, side, bucket) gram counts — the ONE corpus-sized
    # aggregation, pinned: both downstream consumers (bucket totals,
    # per-doc log-weights) previously re-ran the whole
    # tokenize→explode→md5 derivation, and the per-doc side shuffled
    # RAW gram rows; the cell table is the standard two-phase shape
    # (≤ docs × distinct-buckets-per-doc rows) and every derived sum
    # is exact integer arithmetic over it (r13 optimization — at
    # cluster scale persist/write the cells instead of the local
    # checkpoint).
    cells = (
        grams.groupBy("doc_id", "__it", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    buckets = cells.groupBy("b").agg(
        F.sum(F.when(F.col("__it") == 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("c_t"),
        F.sum(F.when(F.col("__it") == 0, F.col("c")).otherwise(0))
        .cast("long")
        .alias("c_q"),
    )
    totals = buckets.agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_q").cast("long").alias("n_q"),
    )
    a = float(alpha)
    lw = buckets.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            F.round(
                F.log(
                    (F.col("c_t").cast("double") + F.lit(a))
                    / (
                        F.col("n_t").cast("double")
                        + F.lit(a * n_buckets)
                    )
                ),
                6,
            )
            * 1e6
        ).cast("long").alias("lp_t_u"),
        F.round(
            F.round(
                F.log(
                    (F.col("c_q").cast("double") + F.lit(a))
                    / (
                        F.col("n_q").cast("double")
                        + F.lit(a * n_buckets)
                    )
                ),
                6,
            )
            * 1e6
        ).cast("long").alias("lp_q_u"),
    )
    return (
        cells.where(F.col("__it") == 0)
        .join(F.broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * (F.col("lp_t_u") - F.col("lp_q_u")))
            .cast("long")
            .alias("logw_micro"),
        )
    )


def dsir_select(
    df: DataFrame,
    target_expr: str,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    n: int = DSIR_N,
    alpha: float = DSIR_ALPHA,
    k: int = DSIR_K,
) -> DataFrame:
    """Select the ``k`` raw documents most target-like by hashed
    n-gram importance resampling.

    ``target_expr`` is a shared ANSI boolean over the input columns
    (the sql_frontend discipline — the oracle runs the identical
    text). Target docs define the target distribution; NON-target
    docs are the proposal pool being resampled. Output (one row per
    selected doc): (doc_id, n_grams, logw_micro, key_micro), ordered
    by key_micro desc / doc_id asc — logw_micro is the exact integer
    micro-unit importance log-weight Σ[lp_target − lp_proposal],
    key_micro adds the deterministic Gumbel perturbation."""
    scored = dsir_scores(
        df,
        target_expr,
        content_col=content_col,
        id_col=id_col,
        n_buckets=n_buckets,
        n=n,
        alpha=alpha,
    )
    # denominator 2^60 + 2^12: the largest ratio (2^60)/(2^60 + 2^12)
    # = 1 - 2^-48 stays STRICTLY below 1.0 after double rounding (a
    # bare /2^60 rounds to exactly 1.0 for hashes within ~2^9 of the
    # top, where Spark's log(0) yields NULL but DuckDB's ln(0) RAISES
    # — a silent cross-engine divergence); both 2^60 + 2^12 and the
    # ratio are exactly representable doubles, so both engines divide
    # identically. u > 0 always (h + 1 >= 1).
    u = (
        md5_long(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string")))
        + 1
    ).cast("double") / F.lit(float(_P60 + 4096))
    g_u = F.round(F.round(-F.log(-F.log(u)), 6) * 1e6).cast("long")
    keyed = scored.withColumn(
        "key_micro", (F.col("logw_micro") + g_u).cast("long")
    )
    return keyed.orderBy(
        F.col("key_micro").desc(), F.col("doc_id").asc()
    ).limit(k)


def dsir_scores_oracle_sql(
    table: str = "documents",
    target_sql: str = "source IN ('src0', 'src1', 'src2', 'src3')",
    *,
    content_sql: str = "text",
    id_sql: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    n: int = DSIR_N,
    alpha: float = DSIR_ALPHA,
) -> str:
    """DuckDB mirror of :func:`dsir_scores` — a self-contained SELECT
    of (doc_id, n_grams, logw_micro) that callers may nest."""
    tk = sql_tokens(content_sql)
    joined = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n)).replace(
        "[i+0]", "[i]"
    )
    a = repr(float(alpha))
    an = repr(float(alpha) * n_buckets)
    return f"""
        WITH docs AS (
          SELECT {id_sql} AS doc_id,
                 CASE WHEN {target_sql} THEN 1 ELSE 0 END AS it,
                 {tk} AS tk
          FROM {table}
        ), grams AS (
          SELECT doc_id, it,
                 {sql_md5_long(joined)} % {n_buckets} AS b
          FROM docs
          CROSS JOIN unnest(range(1, len(tk) - {n - 2})) AS t(i)
        ), buckets AS (
          SELECT b,
                 CAST(sum(it) AS BIGINT) AS c_t,
                 CAST(sum(1 - it) AS BIGINT) AS c_q
          FROM grams GROUP BY b
        ), totals AS (
          SELECT CAST(sum(c_t) AS BIGINT) AS n_t,
                 CAST(sum(c_q) AS BIGINT) AS n_q
          FROM buckets
        ), lw AS (
          SELECT b,
                 CAST(round(round(ln((c_t + {a}) / (n_t + {an})), 6)
                            * 1e6) AS BIGINT) AS lp_t_u,
                 CAST(round(round(ln((c_q + {a}) / (n_q + {an})), 6)
                            * 1e6) AS BIGINT) AS lp_q_u
          FROM buckets CROSS JOIN totals
        )
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(lp_t_u - lp_q_u) AS BIGINT) AS logw_micro
        FROM grams g JOIN lw USING (b)
        WHERE g.it = 0
        GROUP BY g.doc_id
    """


def dsir_select_oracle_sql(
    table: str = "documents",
    target_sql: str = "source IN ('src0', 'src1', 'src2', 'src3')",
    *,
    content_sql: str = "text",
    id_sql: str = "doc_id",
    n_buckets: int = DSIR_BUCKETS,
    n: int = DSIR_N,
    alpha: float = DSIR_ALPHA,
    k: int = DSIR_K,
) -> str:
    """DuckDB mirror of :func:`dsir_select` — identical bucket hash,
    add-α log-probs rounded at the same points, identical Gumbel
    keys."""
    scores = dsir_scores_oracle_sql(
        table,
        target_sql,
        content_sql=content_sql,
        id_sql=id_sql,
        n_buckets=n_buckets,
        n=n,
        alpha=alpha,
    )
    uh = sql_md5_long("('dsir:' || CAST(doc_id AS VARCHAR))")
    return f"""
        WITH scored AS ({scores})
        SELECT doc_id, n_grams, logw_micro,
               CAST(logw_micro
                    + CAST(round(round(-ln(-ln(({uh} + 1)
                          / CAST({_P60 + 4096} AS DOUBLE))), 6) * 1e6)
                        AS BIGINT)
                    AS BIGINT) AS key_micro
        FROM scored
        ORDER BY key_micro DESC, doc_id ASC
        LIMIT {k}
    """
