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

from centimators_spark.similarity.ann import _as_double


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
    ordered left-to-right sum — the same fold the oracle evaluates).

    Deliberately the zip_with+aggregate HOF form, NOT a statically
    unrolled literal chain: the unrolled variant is whole-stage
    codegen but costs ~2-3 s of janino COMPILATION per freshly built
    plan (6 planes × 64 dims ≈ 384 terms — measured 1.4 s → 4.2 s per
    bench execution at sf0.1, where the scan itself is milliseconds).
    The HOF is interpreted per ROW but compiles instantly; per-row
    work is p·d multiplies — fine for a map-side scan. At production
    scale (plan compiled once, hours of scan) flip the trade: unroll
    (see ann._dot(dim=)) or feed buckets from the IVF/k-means
    centroid path. Bit-compat either way: a flat chain equals the
    oracle's seedless list_reduce; the fold's 0.0 seed can only flip
    an exact zero's sign, and -0.0 >= 0 compares identically."""
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


def derive_n_planes(n_rows: int, target_bucket_rows: int = 10_000) -> int:
    """Plane count such that a UNIFORM spread of ``n_rows`` over 2^p
    sign-buckets targets ≤ ``target_bucket_rows`` rows/bucket. Real
    embedding distributions are far from uniform (that is what
    ``max_bucket_rows`` chunking is for), but this keeps the DEFAULT
    geometry from collapsing a billion vectors into 64 buckets."""
    import math

    if n_rows <= target_bucket_rows:
        return 1
    return max(1, math.ceil(math.log2(n_rows / target_bucket_rows)))


def _flat_dot(a: Column, b: Column, dim: int) -> Column:
    """Σ a[i]·b[i] as a flat left-associated add chain (whole-stage
    codegen-able, unlike the HOF fold) — the same evaluation order as
    the DuckDB oracle's list_reduce, so identical bits."""
    out = a.getItem(0) * b.getItem(0)
    for i in range(1, dim):
        out = out + a.getItem(i) * b.getItem(i)
    return out


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.35,
    n_planes: int | str = 6,
    seed: int = 7,
    target_bucket_rows: int = 10_000,
    max_bucket_rows: int | None = None,
    verify: str = "kernel",
) -> DataFrame:
    """Kept rows after semantic pruning: ``(id, bucket)`` for every
    vector with NO same-bucket neighbor of smaller id and cosine ≥
    ``threshold``. Bucketing is recall-lossy across bucket boundaries
    (like any LSH dedup) — raise recall by lowering ``n_planes`` or
    unioning several seeds' prunes.

    Scale controls (the within-bucket join is O(Σ bucket²) — with the
    historical default of 6 planes = 64 global buckets, 10⁹ vectors
    would mean ~10¹⁴ comparisons landing on 64 shuffle tasks):

    - ``n_planes="auto"`` derives the plane count from a count() of the
      input via :func:`derive_n_planes` (one extra cheap action;
      targets ``target_bucket_rows`` rows/bucket under a uniform
      spread). Explicit ints stay pinned — required for the bit-exact
      oracle, whose plane literals depend on the count.
    - ``max_bucket_rows`` bounds the SKEW: rows get a deterministic
      chunk index within their bucket (``ceil(bucket_rows /
      max_bucket_rows)`` chunks, keyed md5 of the id), the b-side is
      replicated to every chunk, and the join runs on (bucket, chunk) —
      a fat bucket becomes m bounded tasks of ≤ max_bucket_rows·n_b
      comparisons instead of one O(n²) straggler. Result set is
      IDENTICAL to the unchunked plan (property-tested); cost is an
      m× replication of fat-bucket rows through the shuffle, the
      standard block-pair trade (similarity/ann.py block kernel).
    - ``verify`` selects the within-bucket domination check:
      ``"kernel"`` (default) runs an Arrow-batched numpy kernel per
      (bucket, chunk) group — dimension-ordered accumulation
      (`_seq_dots`/`_seq_norms`), bit-identical to the oracle's fold
      and ~100× cheaper per pair than expression evaluation inside a
      join residual (the 10x sweep measured 71s for 3.8M interpreted
      pair-cosines vs seconds in numpy); ``"expr"`` keeps the pure
      Column-expression join as the semantic reference, exactly the
      embedding_cosine_pairs blocked/expr split.
    """
    base = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    if n_planes == "auto":
        n_planes = derive_n_planes(base.count(), target_bucket_rows)
    elif not isinstance(n_planes, int):
        raise ValueError(f"n_planes must be an int or 'auto', got {n_planes!r}")
    planes = hyperplanes(n_planes, dim, seed)
    bucketed = base.withColumn("bucket", _bucket_expr(F.col("v"), planes))

    if max_bucket_rows is not None:
        if max_bucket_rows < 1:
            raise ValueError(f"max_bucket_rows must be >= 1, got {max_bucket_rows}")
        # tiny agg (≤ 2^p rows) broadcast back: chunks per bucket
        sizes = bucketed.groupBy("bucket").agg(
            F.ceil(F.count(F.lit(1)) / F.lit(max_bucket_rows))
            .cast("int")
            .alias("__m")
        )
        chunked = bucketed.join(F.broadcast(sizes), "bucket").withColumn(
            "__chunk",
            F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(seed)), F.col("__m"))
            .cast("int"),
        )
        probe = chunked.select("id", "v", "bucket", "__chunk")
        # pool side: every row visits every chunk of its bucket
        pool = chunked.select(
            "id", "v", "bucket",
            F.explode(F.sequence(F.lit(0), F.col("__m") - 1)).alias("__chunk"),
        )
    else:
        probe = bucketed.select(
            "id", "v", "bucket", F.lit(0).alias("__chunk")
        )
        pool = probe

    if verify == "kernel":
        dominated = _dominated_kernel(probe, pool, float(threshold))
    elif verify == "expr":
        # norms are per-row columns; the flat left-to-right add chain
        # matches the oracle's list_reduce fold bit-for-bit (the HOF
        # cosine is CodegenFallback — interpreted per PAIR, ruinous)
        nrm = F.sqrt(_flat_dot(F.col("v"), F.col("v"), dim))
        a = probe.withColumn("nrm", nrm).alias("a")
        b = pool.withColumn("nrm", nrm).alias("b")
        pair_cond = (
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.__chunk") == F.col("b.__chunk"))
            & (F.col("b.id") < F.col("a.id"))
        )
        dominated = (
            a.join(b, pair_cond)
            .where(
                F.try_divide(
                    _flat_dot(F.col("a.v"), F.col("b.v"), dim),
                    F.col("a.nrm") * F.col("b.nrm"),
                )
                >= threshold
            )
            .select(F.col("a.id").alias("id"))
            .distinct()
        )
    else:
        raise ValueError(f"verify must be 'kernel' or 'expr', got {verify!r}")
    return (
        bucketed.join(dominated, "id", "left_anti")
        .select(F.col("id").alias(id_col), "bucket")
    )


def _dominated_kernel(
    probe: DataFrame, pool: DataFrame, threshold: float
) -> DataFrame:
    """Dominated probe ids via an Arrow-batched numpy kernel per
    (bucket, chunk) group: dots and norms accumulate dimension-by-
    dimension (`similarity/ann.py:_seq_dots` — bit-identical to the
    scalar left-to-right oracle fold); each pair's cosine is ONE
    division of those exact values; zero-norm pairs become NaN
    (never ≥ threshold), mirroring try_divide's NULL."""
    import pandas as pd

    from centimators_spark.similarity.ann import _seq_dots, _seq_norms

    id_type = probe.schema["id"].dataType.simpleString()
    tagged = probe.withColumn("__p", F.lit(1)).unionByName(
        pool.withColumn("__p", F.lit(0))
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        probes = pdf[pdf["__p"] == 1]
        rest = pdf[pdf["__p"] == 0]
        if probes.empty or rest.empty:
            return pd.DataFrame({"id": probes["id"].iloc[:0]})
        am = np.array(probes["v"].tolist(), dtype=np.float64)
        bm = np.array(rest["v"].tolist(), dtype=np.float64)
        na, nb = _seq_norms(am), _seq_norms(bm)
        denom = na[:, None] * nb[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom != 0.0, _seq_dots(am, bm) / denom, np.nan)
            hit = cos >= threshold  # NaN compares False, like NULL
        ids_a = probes["id"].to_numpy()
        ids_b = rest["id"].to_numpy()
        dom = (hit & (ids_b[None, :] < ids_a[:, None])).any(axis=1)
        return pd.DataFrame({"id": ids_a[dom]})

    return tagged.groupBy("bucket", "__chunk").applyInPandas(
        kern, f"id {id_type}"
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
