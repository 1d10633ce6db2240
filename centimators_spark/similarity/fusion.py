"""Rank fusion for hybrid retrieval — combine lexical (BM25) and
vector (cosine ANN) result lists into one ranking.

Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
``score(d) = Σ_lists 1/(K + rank_d(list))`` with the conventional
K = 60. RRF is the standard hybrid-search combiner because it needs no
score calibration across heterogeneous retrievers — only ranks.

Exactness discipline: each contribution is carried as
``round(1e9 / (K + rank))`` BIGINT parts-per-billion — ONE double
division then one round, bit-identical across engines — so the fused
sum is exact integer arithmetic regardless of Spark's aggregation
order (doubles would make Σ over 3+ lists order-dependent).

Scale shape: the input lists are top-n results (tiny by construction);
fusion is a union + one small aggregation + an ordered limit. The
heavy work lives in the retrievers (bm25_topk's broadcast-stats scan,
ann's bucketed probes), not here.

Reference scope: the reference has no retrieval surface; this is the
§2.3 similarity-search extension (hybrid RAG-corpus retrieval) beside
text/features.bm25_topk and similarity/ann.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_SCALE = 10**9


def rrf_fuse(
    lists: Sequence[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists by reciprocal-rank: returns the top ``k``
    (doc_id, rrf_ppb, n_lists) by descending fused score (exact BIGINT
    parts-per-billion), ties broken by doc_id. A document missing from
    a list simply contributes nothing for it."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        d.select(
            F.col(id_col).alias("doc_id"),
            F.round(F.lit(float(RRF_SCALE)) / (rrf_k + F.col(rank_col)))
            .cast("long")
            .alias("__c"),
        )
        for d in lists
    ]
    u = reduce(DataFrame.unionByName, contribs)
    return (
        u.groupBy("doc_id")
        .agg(
            F.sum("__c").cast("long").alias("rrf_ppb"),
            F.count(F.lit(1)).cast("long").alias("n_lists"),
        )
        .orderBy(F.col("rrf_ppb").desc(), F.col("doc_id").asc())
        .limit(k)
    )
