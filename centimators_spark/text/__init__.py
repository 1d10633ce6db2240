from centimators_spark.text.analysis import (
    char_entropy,
    document_fingerprint,
    language_id,
    normalize_text,
    quality_score,
    token_counts,
    unigram_lm_score,
    bigram_lm_score,
)
from centimators_spark.text.chunking import chunk_documents
from centimators_spark.text.cooccur import (
    bpe_apply,
    bpe_pair_merges,
    bpe_train,
    bpe_train_apply,
    pmi_pairs,
)
from centimators_spark.text.divergence import corpus_divergence, token_shift_report
from centimators_spark.text.dsir import dsir_select
from centimators_spark.text.line_filters import c4_line_filters, corpus_line_dedup
from centimators_spark.text.pii import mask_pii
from centimators_spark.text.repetition import repetition_signals

__all__ = [
    "dsir_select",
    "c4_line_filters",
    "bigram_lm_score",
    "bpe_apply",
    "bpe_pair_merges",
    "bpe_train",
    "bpe_train_apply",
    "char_entropy",
    "chunk_documents",
    "corpus_divergence",
    "corpus_line_dedup",
    "document_fingerprint",
    "language_id",
    "mask_pii",
    "normalize_text",
    "quality_score",
    "repetition_signals",
    "token_counts",
    "token_shift_report",
    "unigram_lm_score",
]
