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


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval of one term-set query against the corpus
    (Robertson/Sparck-Jones with Lucene's non-negative idf):

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))
        idf(t)   = ln(1 + (N − df + 0.5)/(df + 0.5))

    Plan shape mirrors :func:`tfidf_topk`: tokenize once, keep only the
    query's terms BEFORE the (doc, term) aggregation (the filter
    reaches the explode, so the heavy stream carries query terms only),
    broadcast the tiny per-term df/corpus stats back, score, global
    top-k via one ordered limit (TakeOrderedAndProject at scale).
    Scores round to 6dp (the ln-ULP idiom); ties break on doc_id, so
    the DuckDB oracle orders identically.
    """
    qt = [t.lower() for t in query_terms]
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(content_col)).alias("tk")
    )
    lens = toks.select("doc_id", F.size("tk").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    hits = (
        toks.select("doc_id", F.explode("tk").alias("term"))
        .where(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = hits.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            (
                F.log(
                    1.0
                    + (F.col("__n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("__s"), 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "bm25")
    )


def bm25_topk_oracle_sql(
    query_terms: list[str],
    *,
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same formula text, same
    tokenizer (portable.sql_tokens), same 6dp rounding."""
    from centimators_spark.text.portable import sql_tokens

    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
        WITH toks AS (
          SELECT {id_sql} AS doc_id, {sql_tokens(content_sql)} AS tk
          FROM {table}
        ), lens AS (
          SELECT doc_id, len(tk) AS dl FROM toks
        ), stats AS (
          SELECT count(*) AS n, avg(dl) AS avgdl FROM lens
        ), hits AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
          WHERE term IN ({terms})
          GROUP BY doc_id, term
        ), dfreq AS (
          SELECT term, count(*) AS df FROM hits GROUP BY term
        ), scored AS (
          SELECT h.doc_id,
                 round(sum(
                   ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
                   * (h.tf * ({k1} + 1.0))
                   / (h.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl))
                 ), 6) AS bm25
          FROM hits h
          JOIN dfreq d USING (term)
          JOIN lens l USING (doc_id)
          CROSS JOIN stats s
          GROUP BY h.doc_id
        )
        SELECT doc_id, bm25 FROM scored
        ORDER BY bm25 DESC, doc_id ASC LIMIT {k}
    """
