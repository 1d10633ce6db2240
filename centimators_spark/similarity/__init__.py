from centimators_spark.similarity.ann import (
    brute_force_topk,
    cosine,
    embedding_cosine_pairs,
    ivf_topk,
    rp_lsh_topk,
)

__all__ = [
    "brute_force_topk",
    "cosine",
    "embedding_cosine_pairs",
    "ivf_topk",
    "rp_lsh_topk",
]
