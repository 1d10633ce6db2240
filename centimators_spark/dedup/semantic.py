"""SemDeDup-style semantic deduplication over an embedding column:
bucket vectors by random-hyperplane signs, compute exact cosine only
within buckets, and drop every vector dominated by a more-similar-
than-τ neighbor with a smaller id.

This is the embedding-space sibling of MinHash-LSH text dedup (the
published SemDeDup recipe clusters with k-means and prunes within
clusters; sign-LSH buckets play the cluster role here because they are
DETERMINISTIC and cross-engine reproducible — the hyperplanes are
literal doubles injected into both the Spark expressions and the DuckDB
oracle, so buckets, cosines, and the kept set are all bit-identical).

Scale shape: bucket assignment is map-side codegen (p dot products per
row); the only shuffle is the per-bucket self-join, sub-quadratic as
long as buckets stay small (n_planes tunes bucket count = 2^p; at web
scale feed buckets from IVF/k-means centroids instead and keep the same
within-bucket prune). The keep rule ("no same-bucket neighbor with
cosine ≥ τ and smaller id") is one anti-join — no iterative
connected-components pass, matching SemDeDup's keep-one-per-cluster
intent with a deterministic, SQL-expressible rule.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from centimators_spark.similarity.ann import _as_double, cosine


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic 6dp-rounded hyperplanes — rounding makes the
    literals short AND identical in both engines' SQL texts."""
    rng = np.random.default_rng(seed)
    return [
        [round(float(x), 6) for x in row]
        for row in rng.standard_normal((n_planes, dim))
    ]


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bucket id: bit i set iff vec · plane_i >= 0 (dimension-
    ordered left-to-right sum — the same fold the oracle evaluates)."""
    b = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in p]),
                lambda x, w: x * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        b = b + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return b


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.35,
    n_planes: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Kept rows after semantic pruning: ``(id, bucket)`` for every
    vector with NO same-bucket neighbor of smaller id and cosine ≥
    ``threshold``. Bucketing is recall-lossy across bucket boundaries
    (like any LSH dedup) — raise recall by lowering ``n_planes`` or
    unioning several seeds' prunes."""
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    planes = hyperplanes(n_planes, dim, seed)
    bucketed = base.withColumn("bucket", _bucket_expr(F.col("v"), planes))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.id") < F.col("a.id")),
        )
        .where(cosine(F.col("a.v"), F.col("b.v")) >= threshold)
        .select(F.col("a.id").alias("id"))
        .distinct()
    )
    return (
        bucketed.join(dominated, "id", "left_anti")
        .select(F.col("id").alias(id_col), "bucket")
    )


def semantic_dedup_oracle_sql(
    table: str,
    *,
    id_sql: str = "vec_id",
    vec_sql: str = "embedding",
    dim: int,
    threshold: float = 0.35,
    n_planes: int = 6,
    seed: int = 7,
    out_id: str = "vec_id",
) -> str:
    """DuckDB mirror: identical plane literals, identical dimension-
    ordered dot-product folds, identical keep rule. The norm-product
    guard mirrors Spark's try_divide: a zero-norm vector's cosine is
    NULL (never >= threshold), not NaN (which DuckDB sorts above every
    threshold)."""
    planes = hyperplanes(n_planes, dim, seed)

    def dot(vec: str, ws: list[float]) -> str:
        lst = ", ".join(repr(w) for w in ws)
        return (
            f"list_reduce(list_transform(range(1, {dim} + 1), "
            f"k -> {vec}[k] * ([{lst}])[k]), (x, y) -> x + y)"
        )

    bucket = " + ".join(
        f"(CASE WHEN {dot('v', p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    dotab = (
        f"list_reduce(list_transform(range(1, {dim} + 1), "
        f"k -> a.v[k] * b.v[k]), (x, y) -> x + y)"
    )
    na = (
        f"sqrt(list_reduce(list_transform(range(1, {dim} + 1), "
        f"k -> a.v[k] * a.v[k]), (x, y) -> x + y))"
    )
    nb = (
        f"sqrt(list_reduce(list_transform(range(1, {dim} + 1), "
        f"k -> b.v[k] * b.v[k]), (x, y) -> x + y))"
    )
    return f"""
        WITH base AS (
          SELECT {id_sql} AS id,
                 list_transform({vec_sql}, x -> CAST(x AS DOUBLE)) AS v
          FROM {table}
        ), bucketed AS (
          SELECT id, v, ({bucket}) AS bucket FROM base
        ), dominated AS (
          SELECT DISTINCT a.id
          FROM bucketed a JOIN bucketed b
            ON a.bucket = b.bucket AND b.id < a.id
          WHERE ({na} * {nb}) <> 0 AND ({dotab}) / ({na} * {nb}) >= {threshold!r}
        )
        SELECT id AS {out_id}, bucket
        FROM bucketed
        WHERE id NOT IN (SELECT id FROM dominated)
    """
