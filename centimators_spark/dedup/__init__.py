from centimators_spark.dedup.exact import exact_dedup
from centimators_spark.dedup.jaccard import (
    gram_inverted_index,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from centimators_spark.dedup.minhash import minhash_lsh_pairs, minhash_signatures
from centimators_spark.dedup.simhash import simhash_fingerprints
from centimators_spark.dedup.embedding_dup import embedding_cosine_pairs
from centimators_spark.dedup.contamination import ngram_contamination
from centimators_spark.dedup.semantic import semantic_dedup
from centimators_spark.dedup.cluster import (
    connected_components,
    connected_components_star,
)
from centimators_spark.dedup.winnowing import (
    winnowing_fingerprints,
    winnowing_overlap_pairs,
)
from centimators_spark.dedup.substring import (
    duplicated_spans,
    duplicated_spans_multi,
)

__all__ = [
    "exact_dedup",
    "gram_inverted_index",
    "ngram_containment_pairs",
    "connected_components",
    "connected_components_star",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "simhash_fingerprints",
    "embedding_cosine_pairs",
    "ngram_contamination",
    "semantic_dedup",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "duplicated_spans",
    "duplicated_spans_multi",
]
