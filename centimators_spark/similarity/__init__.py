from centimators_spark.similarity.ann import (
    cosine,
    brute_force_topk,
    rp_lsh_topk,
)

__all__ = ["cosine", "brute_force_topk", "rp_lsh_topk"]
