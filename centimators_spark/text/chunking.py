"""Document chunking for LLM training pipelines: split each document
into overlapping token-window chunks (size W, stride S) — the standard
pre-tokenization step before sequence packing (sampling.pack_sequences
consumes fixed-budget pieces; this produces them from long documents).

Pure JVM expressions end-to-end: tokenize → sequence of chunk starts →
slice per start → posexplode. No Python, no shuffle (map-side explode);
the output is at most ceil(n_tokens / stride) rows per document. The
DuckDB oracle mirrors the identical tokenization (text/portable.py) and
start grid, so results are bit-exact.

Reference scope: the reference has no chunking surface (its
EmbeddingTransformer embeds whole values, embedding.py:137-158); this
extends SURVEY.md §2.3's training-data inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import sql_tokens, tokens


def chunk_documents(
    df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping token chunks: starts at 0, S, 2S, … while < n_tokens;
    each chunk is the next ``chunk_tokens`` tokens (the last chunks are
    shorter). Documents with zero tokens (or null text) produce no
    rows. Returns (doc_id, chunk_idx, start_token, n_chunk_tokens,
    chunk_text)."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    tok = tokens(F.col(content_col))
    staged = df.select(
        F.col(id_col).alias("doc_id"), tok.alias("__tok")
    ).withColumn("__n", F.size("__tok"))
    starts = F.when(
        F.col("__n") > 0,
        F.sequence(F.lit(0), F.col("__n") - 1, F.lit(stride)),
    )
    exploded = staged.select(
        "doc_id",
        "__tok",
        F.posexplode(starts).alias("chunk_idx", "start_token"),
    )
    piece = F.slice(F.col("__tok"), F.col("start_token") + 1, chunk_tokens)
    return exploded.select(
        "doc_id",
        "chunk_idx",
        "start_token",
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_oracle_sql(
    table: str = "documents",
    *,
    content_sql: str = "text",
    id_sql: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> str:
    """DuckDB mirror of :func:`chunk_documents` — same tokenization,
    start grid (0, S, 2S, … < n), and slice bounds."""
    tok = sql_tokens(content_sql)
    return f"""
        WITH t AS (
          SELECT {id_sql} AS doc_id, {tok} AS tok FROM {table}
        ), s AS (
          SELECT doc_id, tok,
                 unnest(range(0, len(tok), {stride})) AS start_token
          FROM t WHERE len(tok) > 0
        )
        SELECT doc_id,
               CAST(start_token // {stride} AS INTEGER) AS chunk_idx,
               CAST(start_token AS INTEGER) AS start_token,
               CAST(len(tok[start_token + 1 : start_token + {chunk_tokens}])
                 AS INTEGER) AS n_chunk_tokens,
               array_to_string(
                 tok[start_token + 1 : start_token + {chunk_tokens}], ' ')
                 AS chunk_text
        FROM s
    """


# sentence rule shared by both engines: runs of non-terminators plus
# their trailing terminator run. NO lookaround — DuckDB's RE2 has none,
# so the portable split is an EXTRACT, not a split-on-boundary.
SENTENCE_RE = "[^.!?]+[.!?]*"


def doc_sentences(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_chars: int = 1,
) -> DataFrame:
    """Sentence segmentation: one row per (doc, sentence_no, sentence)
    — the unit the chunkers, line filters, and PII scans often want
    instead of raw lines. Sentences are maximal runs of
    non-``[.!?]`` characters with their trailing terminators, trimmed;
    empty/whitespace results are dropped (``min_chars`` on the trimmed
    text). Map-side posexplode — zero shuffle, same shape as
    chunk_documents. Bit-exact oracle: :func:`doc_sentences_oracle_sql`
    (shared RE2-safe pattern — no lookbehind, which DuckDB lacks)."""
    sents = F.expr(
        f"filter(transform(regexp_extract_all(`{content_col}`,"
        f" '{SENTENCE_RE}', 0), x -> trim(x)),"
        f" x -> length(x) >= {min_chars})"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sents).alias("sentence_no", "sentence"),
    )


def doc_sentences_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    *,
    min_chars: int = 1,
) -> str:
    """DuckDB mirror of :func:`doc_sentences`."""
    return f"""
        WITH ex AS (
          SELECT {id_sql} AS doc_id,
                 list_filter(
                   list_transform(
                     regexp_extract_all({content_sql}, '{SENTENCE_RE}'),
                     x -> trim(x)),
                   x -> length(x) >= {min_chars}) AS sents
          FROM {table}
        )
        SELECT doc_id,
               CAST(generate_subscripts(sents, 1) - 1 AS INTEGER)
                 AS sentence_no,
               unnest(sents) AS sentence
        FROM ex
    """
