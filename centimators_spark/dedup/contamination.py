"""Benchmark decontamination: token-n-gram overlap of a training corpus
against a held-out benchmark/test set.

The standard LLM-pipeline contamination check (as published for GPT-3,
PaLM, Llama: 8-13-gram collision tests) reduces to: per corpus
document, what fraction of its distinct token n-grams also occur
anywhere in the benchmark set. Documents above a threshold are dropped
or flagged before training.

Scale design: the benchmark side is orders of magnitude smaller than
the corpus (MBs of eval sets vs TBs of corpus), so its distinct-gram
set is collected into a broadcast hash join — the corpus side streams
ONE scan map-side through explode_outer → broadcast-join → per-doc
partial-count; the only shuffle carries the per-doc (doc_id, counts)
partials (one row per document after map-side combine, ~1e-3 of the
gram volume). No benchmark×corpus shuffle ever happens. Gram identity
uses the shared portable tokenization, so the DuckDB oracle computes
identical integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import sql_token_ngrams, sql_tokens, token_ngrams, tokens


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per corpus document: ``n_grams`` (distinct token n-grams),
    ``n_hits`` (those also present anywhere in ``benchmark``), and
    ``contamination`` = hits/grams (0.0 for gram-less docs).

    ``benchmark`` only needs ``content_col``; its gram set is globally
    deduplicated and broadcast."""
    # stage token arrays before the n-gram lambda (an inlined split()
    # re-evaluates per element access — measured ~10× slower)
    bench_grams = (
        benchmark.select(tokens(F.col(content_col)).alias("__tok"))
        .select(F.explode(token_ngrams(F.col("__tok"), n)).alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # explode_outer keeps gram-less docs as a single null-gram row, so
    # ONE scan + ONE per-doc aggregation covers every corpus document —
    # no second corpus scan / corpus-cardinality re-join to restore them
    corpus_grams = corpus.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(content_col)).alias("__tok")
    ).select("doc_id", F.explode_outer(token_ngrams(F.col("__tok"), n)).alias("g"))
    per_doc = (
        corpus_grams.join(F.broadcast(bench_grams), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.col("g")).alias("n_grams"),  # null gram rows don't count
            F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        "n_hits",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_hits").cast("double") / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination"),
    )


def contamination_oracle_sql(
    corpus_sql: str,
    benchmark_sql: str,
    n: int = 5,
    content_sql: str = "text",
    id_sql: str = "doc_id",
) -> str:
    """Same integers via unnest + IN-set (implementation-independent).

    ``corpus_sql`` / ``benchmark_sql`` are FROM-able fragments (table
    name or parenthesized subquery)."""
    grams = sql_token_ngrams("tk", n)
    return f"""
      WITH corpus AS (
        SELECT {id_sql} AS doc_id, {sql_tokens(content_sql)} AS tk
        FROM {corpus_sql}
      ), bench_grams AS (
        SELECT DISTINCT unnest({sql_token_ngrams(sql_tokens(content_sql), n)}) AS g
        FROM {benchmark_sql}
      ), cg AS (
        SELECT doc_id, unnest({grams}) AS g FROM corpus
      ), per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hits
        FROM cg LEFT JOIN bench_grams b USING (g)
        GROUP BY doc_id
      )
      SELECT c.doc_id,
             coalesce(p.n_grams, 0) AS n_grams,
             coalesce(p.n_hits, 0) AS n_hits,
             CASE WHEN coalesce(p.n_grams, 0) > 0
                  THEN CAST(p.n_hits AS DOUBLE) / CAST(p.n_grams AS DOUBLE)
                  ELSE 0.0 END AS contamination
      FROM corpus c LEFT JOIN per_doc p USING (doc_id)
    """
