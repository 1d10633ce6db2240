"""Record-linkage scoring — blocked multi-field candidate comparison
with weighted agreement scores (the deterministic rule-based core of
Fellegi–Sunter / Splink-style entity resolution, before any EM weight
fitting).

Spark shape: candidate pairs come ONLY from a self-join on the
blocking key (never all-pairs — the same pigeonhole discipline as
dedup/fuzzy.py); the comparison vector is a row of boolean columns,
and the score is an integer weighted sum — whole-stage codegen, no
UDF. At 100 TB the blocking key IS the partitioning: a skewed block
can be salted with operators/skew.salted_join, and the comparison
fields ride the shuffle as a narrow projection.

Weights are caller-supplied integers (log-odds rounded to ints is the
standard operational shortcut); scores and flags are exact, so the
DuckDB oracle (:func:`record_linkage_oracle_sql`) hash-matches.

Reference scope: no reference counterpart — §2.3 extension beside
fuzzy_self_join (which verifies bounded edit distance; this scores
multi-field agreement).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def record_linkage(
    df: DataFrame,
    id_col: str,
    block_col: str,
    field_weights: Mapping[str, int],
    *,
    threshold: int = 0,
) -> DataFrame:
    """Score within-block record pairs by weighted field agreement.

    Returns (id_a, id_b, agree_<field>… , score) for pairs with
    ``score >= threshold``; ``id_a < id_b``. A field agrees only when
    both sides are non-null and equal (NULL never agrees — an unknown
    value is no evidence of a match)."""
    fields = list(field_weights)
    cols = [id_col, block_col] + fields
    a = df.select(*cols)
    b = df.select(*cols)
    for c in cols:
        a = a.withColumnRenamed(c, f"a_{c}")
        b = b.withColumnRenamed(c, f"b_{c}")
    pairs = a.join(
        b,
        (F.col(f"a_{block_col}") == F.col(f"b_{block_col}"))
        & (F.col(f"a_{id_col}") < F.col(f"b_{id_col}")),
    )
    agree_cols: list[Column] = []
    score: Column = F.lit(0)
    for f in fields:
        ag = (
            F.col(f"a_{f}").isNotNull()
            & F.col(f"b_{f}").isNotNull()
            & (F.col(f"a_{f}") == F.col(f"b_{f}"))
        )
        agree_cols.append(ag.alias(f"agree_{f}"))
        score = score + F.when(ag, F.lit(int(field_weights[f]))).otherwise(0)
    out = pairs.select(
        F.col(f"a_{id_col}").alias("id_a"),
        F.col(f"b_{id_col}").alias("id_b"),
        *agree_cols,
        score.cast("int").alias("score"),
    )
    return out.where(F.col("score") >= threshold)


def record_linkage_oracle_sql(
    table_sql: str,
    id_sql: str,
    block_sql: str,
    field_weights: Mapping[str, int],
    *,
    threshold: int = 0,
) -> str:
    """DuckDB mirror of :func:`record_linkage` (identical agreement
    rule and integer score)."""
    fields = list(field_weights)
    agree_exprs = ",\n               ".join(
        f"(a.{f} IS NOT NULL AND b.{f} IS NOT NULL AND a.{f} = b.{f})"
        f" AS agree_{f}"
        for f in fields
    )
    score = " + ".join(
        f"CASE WHEN a.{f} IS NOT NULL AND b.{f} IS NOT NULL"
        f" AND a.{f} = b.{f} THEN {int(field_weights[f])} ELSE 0 END"
        for f in fields
    )
    return f"""
        SELECT a.{id_sql} AS id_a, b.{id_sql} AS id_b,
               {agree_exprs},
               CAST({score} AS INTEGER) AS score
        FROM {table_sql} a JOIN {table_sql} b
          ON a.{block_sql} = b.{block_sql} AND a.{id_sql} < b.{id_sql}
        WHERE {score} >= {threshold}
    """
