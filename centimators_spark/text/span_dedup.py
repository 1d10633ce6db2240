"""Cross-document SPAN dedup — the token-window sibling of
line_filters.corpus_line_dedup: any w-token window that appears in
≥ ``min_docs`` distinct documents is a duplicated span, and every
token position it covers is removed from the rewritten text. This is
the DataFrame re-expression of exact-substring training-data dedup
(Lee et al. 2022's suffix-array pass): suffix arrays don't
distribute, but w-gram windows do — a duplicated substring of length
≥ w necessarily duplicates one of its w-grams, so gram-level removal
is a superset of substring-level removal at span granularity w.

Plan shape (all JVM expressions, two shuffles):
1. tokenize once; posexplode the per-doc w-gram windows;
2. grams seen in ≥ min_docs distinct docs (one grouped agg on the
   gram key) joined back onto the gram stream (same key — the
   aggregation's partitioning is reused, so the join adds no
   exchange);
3. covered token positions per doc (explode+distinct), rewritten
   text via an index-filter over the original token array.

Grouping joins on the literal gram STRING — exact, collision-free,
and what the DuckDB oracle mirrors. At 100 TB, pre-hash the gram key
(xxhash64) to shrink shuffle bytes ~5×; the 2⁻⁶⁴ collision rate then
trades a vanishing false-dedup probability for bandwidth — the same
trade minhash.py documents for its signatures.

Skew note: boilerplate grams (headers, license blocks) are hot keys,
but they carry only (doc_id, pos) pairs — the distinct-doc count is
a partial aggregation, and the join-back fans hot grams out to the
docs that contain them, which is exactly the work the rewrite must do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import sql_tokens, tokens


def corpus_span_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per document: token counts before/after span dedup and the
    rewritten text with every duplicated-span position dropped.

    Returns (doc_id, n_tokens, n_dup_tokens, clean_text), where
    clean_text keeps the original token order minus covered positions
    (RefinedWeb-style order-preserving rewrite).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(content_col)).alias("tk"),
    )
    # pinned ONCE (r13): the duplicated-gram count and the coverage
    # join each re-ran the tokenize + positional-gram explode (the
    # string grams are the dominant bytes of this plan)
    grams = (
        toks.where(F.size("tk") >= w)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("tk") - w),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("tk"), i + 1, w)
                    ),
                )
            ).alias("pos", "gram"),
        )
        .localCheckpoint(eager=True)
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("gram")
    )
    covered = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (w - 1))
            ).alias("tpos"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("tpos").alias("__cov"))
    )
    return (
        toks.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tk").cast("long").alias("n_tokens"),
            F.coalesce(F.size("__cov"), F.lit(0))
            .cast("long")
            .alias("n_dup_tokens"),
            # concat_ws swallows a NULL array into '' — preserve NULL
            # for NULL text so both engines agree on degenerate docs
            F.when(F.col("tk").isNull(), F.lit(None).cast("string"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.filter(
                        F.col("tk"),
                        lambda x, i: ~F.coalesce(
                            F.array_contains("__cov", i), F.lit(False)
                        ),
                    ),
                )
            )
            .alias("clean_text"),
        )
    )


def corpus_span_dedup_oracle_sql(
    *,
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    w: int = 8,
    min_docs: int = 2,
) -> str:
    """DuckDB twin: identical string grams, covered positions, and
    order-preserving index filter (DuckDB lambda index is 1-based)."""
    return f"""
        WITH toks AS (
          SELECT {id_sql} AS doc_id, {sql_tokens(content_sql)} AS tk
          FROM {table}
        ), grams AS (
          SELECT doc_id, t.i AS pos,
                 array_to_string(tk[t.i + 1 : t.i + {w}], ' ') AS gram
          FROM toks, unnest(range(0, len(tk) - {w} + 1)) AS t(i)
          WHERE len(tk) >= {w}
        ), dup AS (
          SELECT gram FROM grams
          GROUP BY gram HAVING count(DISTINCT doc_id) >= {min_docs}
        ), covered AS (
          SELECT doc_id, list(DISTINCT tpos) AS cov
          FROM (
            SELECT DISTINCT g.doc_id, u.tpos
            FROM grams g JOIN dup USING (gram),
                 unnest(range(g.pos, g.pos + {w})) AS u(tpos)
          )
          GROUP BY doc_id
        )
        SELECT t.doc_id,
               CAST(len(t.tk) AS BIGINT) AS n_tokens,
               CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_dup_tokens,
               -- array_to_string of an EMPTY list is NULL in DuckDB;
               -- normalize fully-deduped docs to '' (Spark's concat_ws
               -- result), keeping NULL only for NULL text
               CASE WHEN t.tk IS NULL THEN NULL
                    ELSE coalesce(array_to_string(
                      list_filter(t.tk,
                        (x, i) -> NOT coalesce(list_contains(c.cov, i - 1),
                                               false)),
                      ' '), '') END AS clean_text
        FROM toks t LEFT JOIN covered c USING (doc_id)
    """
