"""Text featurization: TF-IDF over whitespace tokens.

Portable formulation (smoothed idf, sklearn-style):
    tfidf(t, d) = tf(t, d) · (ln((N + 1)/(df(t) + 1)) + 1)

Plan: explode tokens → (doc, term) counts (one shuffle) → document
frequencies (aggregation on term) → broadcast-joined idf → per-doc
top-k by tfidf (window). No UDFs; the idf table is small (vocabulary)
and broadcasts; the heavy (doc, term) stream is touched once.
Deterministic: ranking on the ROUNDED score with lexicographic term
tiebreak, so the DuckDB oracle orders identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.text.portable import tokens


def tfidf_topk(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(doc_id, term, tf, tfidf, rank ≤ k) — top-k terms per document."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(content_col)).alias("tk")
    )
    terms = toks.select("doc_id", F.explode("tk").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
