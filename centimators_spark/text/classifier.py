"""Linear bag-of-words text classifier scoring — the fastText-style
quality-filter pass every pretraining pipeline runs (score each
document with a trained linear model over token features, keep above
threshold). Training happens offline; SERVING the model over 100 TB
of text is the engine's job, and it compiles to a pure whole-stage-
codegen expression: a literal token→weight map folded over the token
array. Zero shuffles, zero Python, zero joins — the scan itself is
the entire plan.

Weights are INTEGER micro-units (weight·1e6 as BIGINT), so the score
sum is exact under any evaluation order and the DuckDB oracle
(:func:`linear_text_score_oracle_sql`) is bit-identical. Token
multiplicity counts (bag, not set), matching fastText's sum-of-
embeddings with a linear head.

At real vocabulary sizes (fastText quality filters: 10⁵–10⁶ buckets)
the literal map gives way to a broadcast join on token — same
semantics, one extra broadcast; the literal form is right for
distilled filter vocabularies (≤ a few thousand terms) and keeps the
hot path join-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import sql_tokens, tokens


def linear_text_score(
    df: DataFrame,
    weights_micro: dict[str, int],
    bias_micro: int = 0,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per document: exact integer score and keep decision.

    score_micro = bias + Σ_{tokens t} weights.get(t, 0) (with
    multiplicity); keep = score_micro > 0. Returns
    (doc_id, n_tokens, score_micro, keep).
    """
    if not weights_micro:
        raise ValueError("weights_micro must be non-empty")
    pairs: list = []
    for term, wt in sorted(weights_micro.items()):
        pairs.append(F.lit(term))
        pairs.append(F.lit(int(wt)).cast("long"))
    wmap = F.create_map(*pairs)
    tk = tokens(F.col(content_col))
    score = F.lit(int(bias_micro)).cast("long") + F.aggregate(
        F.transform(tk, lambda t: F.coalesce(wmap[t], F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tk).cast("long").alias("n_tokens"),
        score.alias("score_micro"),
        (score > 0).alias("keep"),
    )


def linear_text_score_oracle_sql(
    weights_micro: dict[str, int],
    bias_micro: int = 0,
    *,
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB twin: identical integer fold via a CASE-per-term lookup."""
    cases = " ".join(
        f"WHEN '{t}' THEN CAST({int(w)} AS BIGINT)"
        for t, w in sorted(weights_micro.items())
    )
    lookup = f"(CASE t {cases} ELSE CAST(0 AS BIGINT) END)"
    return f"""
        WITH toks AS (
          SELECT {id_sql} AS doc_id, {sql_tokens(content_sql)} AS tk
          FROM {table}
        )
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST({int(bias_micro)}
                 + coalesce(list_sum(list_transform(tk, t -> {lookup})), 0)
                 AS BIGINT) AS score_micro,
               ({int(bias_micro)}
                 + coalesce(list_sum(list_transform(tk, t -> {lookup})), 0))
                 > 0 AS keep
        FROM toks
    """
