"""Token-budget corpus selection — keep the highest-quality documents
whose cumulative token count fits a budget.

The canonical training-data curation step: given per-document quality
scores and token counts, take documents in descending quality order
until the token budget is spent (the greedy prefix of the global
quality ordering). The budget is a fraction of the corpus's total
tokens, so the operator is self-scaling across corpus sizes.

Scale shape — the same two-phase global-cumsum template as
ml/classification_metrics.gains_table: a global ordered prefix sum
over N documents must not sort N rows on one task, so documents map to
≤ ``n_cells`` score cells via the monotone map
``floor((s − min)/(max − min) · n_cells)`` (order-consistent with the
score; equal scores share a cell), the within-cell running token sum
runs under a cell-partitioned window, and per-cell token subtotals —
≤ n_cells rows — get one tiny ordered window whose prefix sums
broadcast back as offsets. Exact integer arithmetic throughout, so
the selection is bit-identical to a single global window.

Skew note: rows TIED on the score must share a cell (correctness), so
a score column with very few distinct values concentrates the
within-cell window onto few tasks. Use a high-resolution carrier
(micro-unit scores, as text/classifier emits) — with realistic score
spread the cells are balanced by construction.

Reference scope: the reference has no corpus surface; this is a §2.3
LLM-data-pipeline extension beside text/classifier (which supplies the
quality score) and sampling.py's mixture/temperature samplers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_budget_select(
    scored: DataFrame,
    budget_frac: float = 0.4,
    *,
    score_col: str = "score_micro",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_cells: int = 4096,
) -> DataFrame:
    """Select documents by descending (``score_col``, then ``id_col``
    ascending as the deterministic tiebreak) while the running token
    sum stays within ``floor(total_tokens · budget_frac)``. Returns
    (doc_id, score, n_tokens, cum_tokens) for the selected prefix."""
    nc = int(n_cells)
    # PIN the narrow (doc_id, score, tokens) selection input: THREE
    # lazy consumers read it (the totals agg, the within-cell window,
    # the cell-totals agg) and `scored` is usually an expensive
    # upstream plan (dsir_budget_select measured 64 exchanges from the
    # re-evaluation; r13 optimization, guide §2.4). Values unchanged;
    # at cluster scale this is the staged selection table a pipeline
    # writes before the budget pass.
    base = scored.select(
        F.col(id_col).alias("doc_id"),
        F.col(score_col).cast("long").alias("__s"),
        F.col(token_col).cast("long").alias("__t"),
    ).localCheckpoint(eager=True)
    totals = base.agg(
        F.sum("__t").alias("__tot"),
        F.min(F.col("__s").cast("double")).alias("__smin"),
        F.max(F.col("__s").cast("double")).alias("__smax"),
    )
    g = base.crossJoin(F.broadcast(totals))
    s = F.col("__s").cast("double")
    # Null scores must sort below every real score (the oracle's ORDER BY
    # score DESC NULLS LAST): without this guard, F.floor(null)=null and
    # F.least(null, nc-1)=nc-1 would drop a null-score doc in the TOP
    # cell, inflating every lower cell's offset.  Cell -1 is processed
    # after all real cells under the DESC cell ordering.
    cell = F.when(s.isNull(), F.lit(-1)).when(
        F.col("__smax") > F.col("__smin"),
        F.least(
            F.floor(
                (s - F.col("__smin"))
                / (F.col("__smax") - F.col("__smin"))
                * nc
            ),
            F.lit(nc - 1),
        ),
    ).otherwise(F.lit(0))
    g = g.withColumn("__cell", cell)
    w_in = Window.partitionBy("__cell").orderBy(
        F.col("__s").desc(), F.col("doc_id").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    within = g.select(
        "doc_id",
        "__s",
        "__t",
        "__tot",
        "__cell",
        F.sum("__t").over(w_in).alias("__cum_in"),
    )
    cell_totals = g.groupBy("__cell").agg(F.sum("__t").alias("__ct"))
    w_cells = Window.orderBy(F.col("__cell").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = cell_totals.select(
        "__cell",
        F.coalesce(F.sum("__ct").over(w_cells), F.lit(0)).alias("__off"),
    )
    budget = F.floor(F.col("__tot").cast("double") * float(budget_frac))
    return (
        within.join(F.broadcast(offsets), "__cell")
        .select(
            "doc_id",
            F.col("__s").alias("score"),
            F.col("__t").alias("n_tokens"),
            (F.col("__cum_in") + F.col("__off")).alias("cum_tokens"),
            "__tot",
        )
        .where(F.col("cum_tokens") <= budget)
        .select("doc_id", "score", "n_tokens", "cum_tokens")
    )


def token_budget_select_oracle_sql(
    scored_sql: str,
    budget_frac: float = 0.4,
    *,
    score_sql: str = "score_micro",
    token_sql: str = "n_tokens",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB twin: one global window cumsum (the oracle may sort
    globally; the Spark plan must not)."""
    return f"""
        WITH s AS (
          SELECT {id_sql} AS doc_id,
                 CAST({score_sql} AS BIGINT) AS score,
                 CAST({token_sql} AS BIGINT) AS n_tokens
          FROM {scored_sql}
        ), tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM s),
        c AS (
          SELECT doc_id, score, n_tokens,
                 CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_tokens
          FROM s
        )
        SELECT doc_id, score, n_tokens, cum_tokens
        FROM c, tot
        WHERE cum_tokens <= floor(CAST(t AS DOUBLE) * {budget_frac!r})
    """
