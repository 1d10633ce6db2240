"""k-NN classification over an embedding column: exact cosine top-k
neighbors (the `brute_force_topk` reference path, `similarity/ann.py`)
followed by a majority vote on the neighbors' labels — the standard
"label a new item from its nearest corpus members" serving shape.

Vote semantics: neighbors are the exact top-``k`` by (cos desc,
vec_id asc); the predicted label maximizes (vote count, −label) —
i.e. ties break to the SMALLEST label — via the min-struct argmin
idiom, so the result is deterministic and integer-exact (counts only;
the cosine doubles order the neighbor set exactly as the hash-green
`ann_cosine_topk` contract already pins).

Scale: the brute-force scan is the exactness baseline (queries
broadcast, one pass over the corpus, per-query top-k heap =
TakeOrdered inside the window); at corpus scale generate the
neighbor candidates with the IVF/RP-LSH/PQ paths in this package and
vote over their verified shortlist instead — the vote aggregation
(this module) is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.similarity.ann import brute_force_topk

__all__ = ["knn_classify", "knn_classify_oracle_sql"]


def knn_classify(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Classify each query row by majority vote of its exact top-k
    cosine neighbors. Returns (query_id, pred_label, votes)."""
    topk = brute_force_topk(
        vectors, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col,
    )
    labels = vectors.select(
        F.col(id_col), F.col(label_col).cast("long").alias("__lbl")
    )
    votes = (
        topk.join(labels, id_col)
        .groupBy(query_id_col, "__lbl")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    best = votes.groupBy(query_id_col).agg(
        F.min(
            F.struct(
                (-F.col("votes")).alias("nv"), F.col("__lbl").alias("l")
            )
        ).alias("b")
    )
    return best.select(
        query_id_col,
        F.col("b.l").alias("pred_label"),
        (-F.col("b.nv")).cast("long").alias("votes"),
    )


def knn_classify_oracle_sql(
    table: str = "embeddings",
    n_queries: int = 5,
    k: int = 10,
    id_sql: str = "vec_id",
    vec_sql: str = "embedding",
    label_sql: str = "label",
) -> str:
    """DuckDB twin: same left-to-right cosine reduction as the
    ann_cosine_topk oracle, same (cos desc, id asc) neighbor ranking,
    same (votes desc, label asc) vote tie-break."""
    dot = (
        "list_reduce(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i] * {b}[i]), (u, v) -> u + v)"
    )
    cos = (
        f"({dot.format(a='q.qv', b='e.v')}) / "
        f"(sqrt({dot.format(a='q.qv', b='q.qv')})"
        f" * sqrt({dot.format(a='e.v', b='e.v')}))"
    )
    return f"""
        WITH e AS (
          SELECT {id_sql} AS vec_id,
                 CAST({label_sql} AS BIGINT) AS lbl,
                 list_transform({vec_sql}, x -> CAST(x AS DOUBLE)) AS v
          FROM {table}
        ), q AS (
          SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id < {n_queries}
        ), ranked AS (
          SELECT q.query_id, e.vec_id, e.lbl,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY {cos} DESC, e.vec_id ASC) AS rank
          FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
        ), votes AS (
          SELECT query_id, lbl, count(*) AS votes
          FROM ranked WHERE rank <= {k}
          GROUP BY query_id, lbl
        ), best AS (
          SELECT query_id, lbl, votes,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY votes DESC, lbl ASC) AS rn
          FROM votes
        )
        SELECT query_id, lbl AS pred_label, CAST(votes AS BIGINT) AS votes
        FROM best WHERE rn = 1
    """
