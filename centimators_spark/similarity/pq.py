"""Product quantization (PQ) — the memory-compressed ANN path that
complements `ann.rp_lsh_topk` (hash buckets) and `ann.ivf_topk`
(cluster-then-probe): each d-dim vector becomes ``m`` one-byte codes
(one per subspace), a 32×-plus compression that lets a 100 TB embedding
corpus's index fit in executor memory; queries score against the codes
with an asymmetric-distance lookup table (ADC) in PURE JVM expressions
— no Python in the scoring hot path.

Pipeline (the standard Jégou et al. 2011 decomposition, re-expressed
Spark-first):

1. ``train_pq_codebooks`` — driver-side numpy Lloyd k-means per
   subspace over a bounded deterministic sample (codebooks are
   m·k·(d/m) floats — kilobytes — the classic driver-side model the
   IVF centroids already use; ann.py:280).
2. ``pq_encode`` — one Arrow-batched mapInPandas pass: argmin codeword
   per subspace → ``array<int>`` codes (store alongside or instead of
   the raw vectors; at scale write the coded table bucketed by any
   downstream join key).
3. ``pq_topk`` — per query, the m×k table of partial squared distances
   becomes ONE literal lookup-array column; the corpus side computes
   distance = Σ_sub lut[sub·k + code_sub] via transform+aggregate
   (whole-stage codegen), then a per-query top-k window. Compute is
   O(n·m) lookups instead of O(n·d) multiplies, on 1/32nd the bytes.

Vectors are unit-normalized before encoding, so the ADC squared
distance is 2 − 2·cos and the ranking approximates cosine ranking; the
returned ``approx_cos`` makes the approximation explicit (exact cos of
the SURVIVORS can be re-scored against raw vectors — the standard
re-rank step — shown in tests).

Reference scope: the reference has no similarity search; this extends
SURVEY.md §2.3 / BASELINE.json's north-star similarity inventory.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unitize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-12)


def _sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Pairwise squared L2 via the matmul expansion — O(n·k) memory
    instead of the (n, k, dsub) broadcast temporary (which at the
    defaults would churn ~300 MB per Lloyd step)."""
    x2 = (X * X).sum(axis=1)[:, None]
    c2 = (C * C).sum(axis=1)[None, :]
    return np.maximum(x2 + c2 - 2.0 * (X @ C.T), 0.0)


def train_pq_codebooks(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 256,
    sample: int = 20_000,
    iters: int = 20,
) -> np.ndarray:
    """Learn per-subspace codebooks: returns float64 array (m, k, d/m).

    Deterministic by construction: the training sample is the first
    ``sample`` vectors by ``id_col`` order (partition-invariant), init
    takes every (n_sample // k)-th sorted sample row (spread, not
    clumped), and Lloyd iterations are plain numpy argmin/mean — no
    RNG anywhere, so retraining reproduces identical codebooks."""
    pdf = (
        vectors.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(sample)
        .toPandas()
    )
    if len(pdf) == 0:
        raise ValueError("no vectors to train on")
    X = _unitize(np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]))
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    dsub = d // m
    kk = min(k, len(X))
    books = np.empty((m, kk, dsub))
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        # deterministic spread init over rows sorted by first component
        order = np.lexsort(Xs.T[::-1])
        cent = Xs[order[:: max(1, len(Xs) // kk)]][:kk].copy()
        for _ in range(iters):
            d2 = _sq_dists(Xs, cent)
            a = d2.argmin(axis=1)
            # deterministic reseeds for empty clusters: DISTINCT points,
            # farthest-first (a shared reseed point would leave duplicate
            # centroids dead for all remaining iterations)
            far_order = iter(np.argsort(-d2.min(axis=1)))
            for c in range(kk):
                mask = a == c
                if mask.any():
                    cent[c] = Xs[mask].mean(axis=0)
                else:
                    cent[c] = Xs[next(far_order)]
        books[s] = cent
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pq_code",
) -> DataFrame:
    """Encode each vector as m subspace code indices (array<int>).

    One Arrow-batched mapInPandas pass; the codebooks (kilobytes)
    serialize into the UDF closure — the same broadcast-small-model
    shape as distributed Keras scoring."""
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    m, kk, dsub = codebooks.shape
    schema = StructType(
        [vectors.schema[id_col], StructField(out_col, ArrayType(IntegerType()))]
    )
    books = codebooks.copy()

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            X = _unitize(
                np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            ) if len(pdf) else np.empty((0, m * dsub))
            codes = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = _sq_dists(Xs, books[s]).argmin(axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: [list(map(int, c)) for c in codes]}
            )

    return vectors.select(id_col, vec_col).mapInPandas(encode, schema)


def _adc_dist2(lut_col, code_col, m: int, kk: int):
    """ADC distance: Σ_s lut[s·k + code_s] as a STATICALLY UNROLLED
    add chain of m element_at lookups — plain whole-stage-codegen
    arithmetic. The transform+aggregate HOF form computed the same
    fold but as CodegenFallback, interpreted once per (corpus row ×
    probed query) pair — the scoring hot path. LUT entries are
    squared distances ≥ 0, so dropping the fold's 0.0 seed cannot even
    flip a zero sign."""
    out = F.element_at(lut_col, (code_col.getItem(0) + 1).cast("int"))
    for s in range(1, m):
        out = out + F.element_at(
            lut_col, (code_col.getItem(s) + F.lit(s * kk + 1)).cast("int")
        )
    return out


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k: per query one literal m·k lookup array; corpus-side
    distance is transform+aggregate over the code array — whole-stage
    codegen, zero Python, one broadcast join + one top-k window.

    Returns (query_id, vec_id, approx_cos, rank); approx_cos =
    1 − dist²/2 under unit-normalized training, monotone in the true
    cosine up to quantization error (re-rank survivors against raw
    vectors for exact scores).

    ``exclude_self`` assumes the query-id space IS the corpus-id space
    (queries drawn from the corpus) and drops the id-equal pair. Pass
    False when query ids are unrelated to ``id_col`` — otherwise a
    corpus vector whose id coincidentally equals a query id would be
    silently excluded from that query's top-k."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    m, kk, dsub = codebooks.shape
    # id types come from the INPUT schemas (string doc ids are as valid
    # as bigint vec ids)
    out_schema = StructType(
        [
            queries.schema[query_id_col],
            encoded.schema[id_col],
            StructField("approx_cos", DoubleType()),
            StructField("rank", IntegerType()),
        ]
    )
    qpd = queries.select(F.col(query_id_col), F.col(vec_col)).toPandas()
    if len(qpd) == 0:
        return encoded.sparkSession.createDataFrame([], out_schema)
    Q = _unitize(np.vstack([np.asarray(v, dtype=np.float64) for v in qpd[vec_col]]))
    # per-query LUT: partial squared distance of query subvector to every
    # codeword, flattened subspace-major — m·k floats, kilobytes/query
    luts = []
    for qv in Q:
        lut = np.empty(m * kk)
        for s in range(m):
            qs = qv[s * dsub : (s + 1) * dsub]
            lut[s * kk : s * kk + kk] = ((codebooks[s] - qs) ** 2).sum(axis=1)
        luts.append([float(x) for x in lut])
    spark = encoded.sparkSession
    qdf = spark.createDataFrame(
        list(zip(qpd[query_id_col].tolist(), luts)),
        StructType(
            [
                queries.schema[query_id_col],
                StructField("__lut", ArrayType(DoubleType())),
            ]
        ),
    )
    dist2 = _adc_dist2(F.col("__lut"), F.col(code_col), m, kk)
    scored = encoded.crossJoin(F.broadcast(qdf))
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = (
        scored
        .select(
            query_id_col,
            id_col,
            (F.lit(1.0) - dist2 / 2).alias("approx_cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def train_ivf_centroids(
    vectors: DataFrame,
    *,
    n_lists: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Spherical-KMeans coarse quantizer for the IVF paths: distributed
    pyspark.ml KMeans over UNIT-normalized vectors, returning the
    (n_lists, d) float64 centroid matrix. Factored out of
    :func:`ivfpq_topk` so callers can train ONCE and share the
    quantizer across index builds/queries (faiss's ``IndexIVF`` takes
    the trained quantizer the same way) — or supply domain-known
    centroids directly and skip training entirely."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from centimators_spark.similarity.ann import _as_double, _norm

    v = vectors.select(_as_double(F.col(vec_col)).alias("vv"))
    with_vec = (
        v.withColumn("__nrm", F.greatest(_norm(F.col("vv")), F.lit(1e-12)))
        .withColumn(
            "__vec",
            array_to_vector(
                F.transform(F.col("vv"), lambda x: x / F.col("__nrm"))
            ),
        )
        .drop("__nrm")
    )
    km = KMeans(
        k=n_lists, seed=seed, featuresCol="__vec", predictionCol="cell"
    )
    model = km.fit(with_vec)
    return np.vstack(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )


def _assign_cells(vv: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Nearest-centroid cell assignment as a pure JVM expression:
    argmin_j ‖x̂ − c_j‖² = argmin_j (‖c_j‖² − 2·x̂·c_j) over the
    unit-normalized vector, lowest cell index on ties
    (array_position returns the FIRST minimum). Whole-stage-codegen
    — no MLlib model broadcast, no Python — so assignment runs at
    scan speed on a 100 TB vector table. Expects column ``vv``
    (array<double>); adds ``cell`` (int)."""
    from centimators_spark.similarity.ann import _norm

    centroids = np.asarray(centroids, dtype=np.float64)
    d = centroids.shape[1]
    # stage the norm as a real column (evaluated once per row); both
    # the norm and the per-centroid dots are statically unrolled
    # literal add chains — whole-stage codegen, no interpreted HOF on
    # the assignment scan (same hazard class as _adc_dist2)
    staged = vv.withColumn(
        "__nrm", F.greatest(_norm(F.col("vv"), d), F.lit(1e-12))
    )
    dists = []
    for c in centroids:
        dot = F.col("vv").getItem(0) * F.lit(float(c[0]))
        for i in range(1, d):
            dot = dot + F.col("vv").getItem(i) * F.lit(float(c[i]))
        dists.append(
            F.lit(float((c * c).sum())) - 2.0 * dot / F.col("__nrm")
        )
    darr = F.array(*dists)
    return staged.withColumn(
        "cell", (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    ).drop("__nrm")


def ivfpq_build(
    vectors: DataFrame,
    codebooks: np.ndarray,
    *,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Build the IVF-PQ index table: (id, pq_code, cell) — the faiss
    ``index.add()`` step factored out of :func:`ivfpq_topk` so the
    coded table is built ONCE and served to every query batch (persist
    or, at scale, write it bucketed by ``cell`` for scan-time pruning).
    Deterministic given (vectors, codebooks, centroids), so a
    localCheckpoint/materialized copy is hash-safe."""
    from centimators_spark.similarity.ann import _as_double

    v = vectors.select(F.col(id_col), _as_double(F.col(vec_col)).alias("vv"))
    if centroids is None:
        centroids = train_ivf_centroids(
            vectors, n_lists=n_lists, vec_col=vec_col, seed=seed
        )
    centroids = np.asarray(centroids, dtype=np.float64)
    listed = _assign_cells(v, centroids).select(id_col, "vv", "cell")
    return pq_encode(
        listed.select(F.col(id_col), F.col("vv").alias(vec_col)),
        codebooks,
        vec_col=vec_col,
        id_col=id_col,
    ).join(listed.select(id_col, "cell"), id_col)


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    *,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    exclude_self: bool = True,
    centroids: np.ndarray | None = None,
    coded: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the faiss-standard composition of the engine's two ANN
    scale mechanisms: IVF cell pruning bounds WHICH vectors are scored
    (n_probe/n_lists of the corpus), PQ codes bound the BYTES per
    scored vector (m instead of 4·d) and keep scoring in pure JVM
    expressions. At 100 TB: the coded table written bucketed by
    ``cell`` gives scan-time pruning over an index 32× smaller than
    the raw vectors.

    Pipeline: coarse-quantizer cells (``centroids`` if supplied, else
    :func:`train_ivf_centroids`'s spherical KMeans), JVM argmin cell
    assignment, pq_encode over the listed vectors, then the ADC lookup
    join restricted to each query's probed cells. Returns
    (query_id, vec_id, approx_cos, rank) — re-rank survivors against
    raw vectors for exact scores (see tests). ``exclude_self`` as in
    :func:`pq_topk` — pass False when query ids are not corpus ids.
    ``centroids`` is the faiss ``IndexIVF(quantizer, ...)`` shape: a
    pre-trained or domain-known (n_lists, d) matrix shared across
    calls instead of refitting KMeans per query batch. ``coded`` is
    the faiss ``index.add()``-output shape: a pre-built
    :func:`ivfpq_build` table (id, pq_code, cell) — pass it (with the
    matching ``centroids``) to serve many query batches off one built
    index instead of re-encoding the corpus per call."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    m, kk, dsub = codebooks.shape
    if coded is None:
        if centroids is None:
            centroids = train_ivf_centroids(
                vectors, n_lists=n_lists, vec_col=vec_col, seed=seed
            )
        centroids = np.asarray(centroids, dtype=np.float64)
        coded = ivfpq_build(
            vectors,
            codebooks,
            id_col=id_col,
            vec_col=vec_col,
            centroids=centroids,
        )
    elif centroids is None:
        raise ValueError(
            "coded= requires the matching centroids= (probe selection "
            "must use the same coarse quantizer the index was built with)"
        )
    else:
        centroids = np.asarray(centroids, dtype=np.float64)
    n_lists = centroids.shape[0]

    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    qpd = queries.select(F.col(query_id_col), F.col(vec_col)).toPandas()
    if len(qpd) == 0:
        return pq_topk(coded.drop("cell"), queries, codebooks, k=k,
                       id_col=id_col, query_id_col=query_id_col,
                       vec_col=vec_col, exclude_self=exclude_self)
    Q = _unitize(
        np.vstack([np.asarray(x, dtype=np.float64) for x in qpd[vec_col]])
    )
    probe_cells = np.argsort(-(Q @ cnorm.T), axis=1)[:, :n_probe]
    luts = []
    for qv in Q:
        lut = np.empty(m * kk)
        for s in range(m):
            qs = qv[s * dsub : (s + 1) * dsub]
            lut[s * kk : s * kk + kk] = ((codebooks[s] - qs) ** 2).sum(axis=1)
        luts.append([float(x) for x in lut])
    spark = vectors.sparkSession
    probe_df = spark.createDataFrame(
        [
            (qid, int(c), lut)
            for qid, lut, cells in zip(qpd[query_id_col], luts, probe_cells)
            for c in cells
        ],
        StructType(
            [
                queries.schema[query_id_col],
                StructField("cell", IntegerType()),
                StructField("__lut", ArrayType(DoubleType())),
            ]
        ),
    )
    dist2 = _adc_dist2(F.col("__lut"), F.col("pq_code"), m, kk)
    scored = coded.join(F.broadcast(probe_df), "cell")
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = (
        scored
        .select(
            query_id_col,
            id_col,
            (F.lit(1.0) - dist2 / 2).alias("approx_cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("approx_cos").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def sq8_encode(
    vectors: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "sq_code",
) -> DataFrame:
    """Int8 scalar quantization (faiss ``SQ8`` shape) of
    unit-normalized vectors: q_i = round(x̂_i · 127) ∈ [−127, 127] —
    4× compression with NO trained codebook (the unit norm bounds
    every component, so the scale is the constant 127). The encode is
    a statically unrolled pure-JVM expression (one norm chain + dim
    rounded divisions — whole-stage codegen), so at 100 TB encoding
    runs at scan speed with zero Python and zero driver state; the
    mirrored DuckDB text makes the codes bit-identical (F.round and
    DuckDB round are both HALF_UP away from zero on doubles).

    Complements the PQ path: SQ8 keeps per-dimension resolution
    (better recall, 4× not 32× compression); PQ compresses harder.
    Scoring: integer dot of codes, monotone in cosine up to
    quantization error — see :func:`sq8_topk`."""
    from centimators_spark.similarity.ann import _as_double, _norm

    v = vectors.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("vv")
    ).withColumn("__nrm", F.greatest(_norm(F.col("vv"), dim), F.lit(1e-12)))
    code = F.array(
        *[
            F.round(F.col("vv").getItem(i) / F.col("__nrm") * 127.0)
            .cast("int")
            for i in range(dim)
        ]
    )
    return v.select(id_col, code.alias(out_col))


def sq8_topk(
    encoded: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "sq_code",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k by INTEGER dot product of SQ8 codes — exact
    long arithmetic (no float accumulation at all), one broadcast of
    the quantized queries, one statically unrolled multiply-add chain
    per pair in whole-stage codegen, one per-query top-k window.
    Returns (query_id, vec_id, dot_q, rank); re-rank survivors against
    raw vectors for exact cosine (the standard ANN re-rank)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        StructField,
        StructType,
    )

    qpd = queries.select(F.col(query_id_col), F.col(vec_col)).toPandas()
    spark = encoded.sparkSession
    Q = _unitize(
        np.vstack([np.asarray(x, dtype=np.float64) for x in qpd[vec_col]])
    ) if len(qpd) else np.empty((0, dim))
    # same HALF_UP rounding as the JVM encode (floor(x+0.5) == HALF_UP
    # for positives; for negatives use sign-symmetric away-from-zero)
    Qq = (np.sign(Q) * np.floor(np.abs(Q) * 127.0 + 0.5)).astype(np.int64)
    qdf = spark.createDataFrame(
        [
            (qid, [int(x) for x in row])
            for qid, row in zip(qpd[query_id_col].tolist(), Qq)
        ],
        StructType(
            [
                queries.schema[query_id_col],
                StructField("__qq", ArrayType(IntegerType())),
            ]
        ),
    )
    # integer zip_with fold: interpreted per pair but compiles
    # instantly — a 64-term unrolled chain costs ~2 s of janino
    # compilation per freshly built plan (see _bucket_expr note);
    # integer addition is associative, so bits are identical either way
    dot = F.aggregate(
        F.zip_with(
            F.col(code_col),
            F.col("__qq"),
            lambda a, b: a.cast("long") * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = encoded.crossJoin(F.broadcast(qdf))
    if exclude_self:
        scored = scored.where(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(query_id_col, id_col, dot.alias("dot_q"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dot_q").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
