from centimators_spark.similarity.ann import (
    brute_force_topk,
    cosine,
    embedding_cosine_pairs,
    ivf_topk,
    rp_lsh_topk,
)
from centimators_spark.similarity.mmr import mmr_diversify
from centimators_spark.similarity.pq import (
    ivfpq_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)

__all__ = [
    "brute_force_topk",
    "cosine",
    "embedding_cosine_pairs",
    "ivf_topk",
    "mmr_diversify",
    "ivfpq_topk",
    "pq_encode",
    "pq_topk",
    "rp_lsh_topk",
    "train_pq_codebooks",
]
