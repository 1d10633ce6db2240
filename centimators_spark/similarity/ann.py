"""Similarity search over embedding columns (array<float>).

- ``cosine``: pure-expression cosine similarity (zip_with + aggregate,
  sequential left-to-right sums → bit-identical to the DuckDB oracle's
  list_reduce; no UDF, no shuffle).
- ``brute_force_topk``: exact top-k neighbors for a (small) query set —
  broadcast the queries, score every row, per-query window top-k.
  This is the correctness baseline: one scan, one shuffle (by query for
  the top-k window).
- ``rp_lsh_topk``: random-hyperplane LSH bucketed search — the 100 TB
  path. Vectors hash to sign-pattern buckets; only bucket-mates (across
  a few probe permutations) are scored. Recall < 1 by construction;
  verified against the brute-force baseline in tests.
"""

from __future__ import annotations

import random

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cos, rank). Excludes
    self-matches when ids coincide. Ties broken by vec_id ascending."""
    q = queries.select(
        F.col(query_id_col), _as_double(F.col(vec_col)).alias("qv")
    )
    v = vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("vv"))
    scored = v.crossJoin(F.broadcast(q)).where(
        F.col(id_col) != F.col(query_id_col)
    ).select(
        query_id_col,
        id_col,
        cosine(F.col("qv"), F.col("vv")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _unit(col: Column) -> Column:
    """Pre-normalize to unit length so the pair scan is a single dot
    product (3x less per-pair work than cosine; same bits — each
    element divides by the same IEEE-exact norm)."""
    n = _norm(col)
    return F.transform(col, lambda x: x / n)


def embedding_cosine_pairs(
    vectors: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "blocked",
) -> DataFrame:
    """All pairs (i < j) with cosine ≥ threshold (exact).

    method='blocked' (default): broadcast the normalized matrix to the
    workers and score row-blocks against it with numpy, accumulating
    **dimension-by-dimension** — vectorized across pairs yet bit-identical
    to a scalar left-to-right sum (and therefore to the DuckDB oracle).
    O(n²/workers) compute, O(n·d) broadcast — the right shape while one
    side fits in memory; beyond that, LSH-bucket first (rp_lsh_topk).

    method='expr': pure Column-expression crossJoin scan (no Python),
    kept as the semantic reference."""
    if method == "expr":
        a = vectors.select(
            F.col(id_col).alias("i"), _unit(_as_double(F.col(vec_col))).alias("va")
        )
        b = vectors.select(
            F.col(id_col).alias("j"), _unit(_as_double(F.col(vec_col))).alias("vb")
        )
        return (
            a.crossJoin(b)
            .where(F.col("i") < F.col("j"))
            .select("i", "j", _dot(F.col("va"), F.col("vb")).alias("cos"))
            .where(F.col("cos") >= threshold)
        )

    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = vectors.sparkSession
    narrow = vectors.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
    local = narrow.toPandas()
    ids = local["i"].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in local["v"]])

    def _seq_norms(m: np.ndarray) -> np.ndarray:
        acc = np.zeros(m.shape[0])
        for d in range(m.shape[1]):  # dim order == scalar left-to-right
            acc = acc + m[:, d] * m[:, d]
        return np.sqrt(acc)

    mat = mat / _seq_norms(mat)[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    id_type = narrow.schema["i"].dataType
    schema = StructType(
        [
            StructField("i", id_type),
            StructField("j", id_type),
            StructField("cos", DoubleType()),
        ]
    )

    def compute(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            block = np.array([np.asarray(v, dtype=np.float64) for v in pdf["v"]])
            block = block / _seq_norms(block)[:, None]
            bids = pdf["i"].to_numpy()
            acc = np.zeros((block.shape[0], all_mat.shape[0]))
            for d in range(block.shape[1]):
                acc = acc + block[:, d : d + 1] * all_mat[:, d]
            ii, jj = np.nonzero((acc >= threshold) & (bids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {"i": bids[ii], "j": all_ids[jj], "cos": acc[ii, jj]}
            )

    return narrow.mapInPandas(compute, schema)


def rp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane sign buckets, n_tables
    independent tables; candidates = bucket collisions in any table."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))

    def _with_buckets(df: DataFrame, key: str, vec_alias: str) -> DataFrame:
        """Sign-pattern buckets via numpy over Arrow batches (the
        hyperplane literals as expressions dominate plan compile time)."""
        import pandas as pd
        from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

        narrow = df.select(F.col(key), _as_double(F.col(vec_col)).alias(vec_alias))
        schema = StructType(
            list(narrow.schema)
            + [StructField(f"bucket_{t}", LongType()) for t in range(n_tables)]
        )
        pl = planes  # capture

        def compute(batches):
            for pdf in batches:
                mat = np.array([np.asarray(v) for v in pdf[vec_alias]])
                out = pdf.copy()
                for t in range(n_tables):
                    proj = mat @ pl[t].T  # (rows, n_planes)
                    bits = ((proj > 0) << np.arange(n_planes)).sum(axis=1)
                    out[f"bucket_{t}"] = bits.astype(np.int64)
                yield out

        return narrow.mapInPandas(compute, schema)

    vb = _with_buckets(vectors, id_col, "vv")
    qb = _with_buckets(queries, query_id_col, "qv")

    v_long = vb.select(
        id_col,
        "vv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("bkt"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(id_col, "vv", "tb.t", "tb.bkt")
    q_long = qb.select(
        query_id_col,
        "qv",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("t"), F.col(f"bucket_{t}").alias("bkt"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select(query_id_col, "qv", "tb.t", "tb.bkt")

    cand = (
        v_long.join(F.broadcast(q_long), ["t", "bkt"])
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, "qv", "vv")
        .distinct()
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col("qv"), F.col("vv")).alias("cos")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
