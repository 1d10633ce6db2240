"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
— the MOSS algorithm) and cross-document overlap detection (reference
scope: the engine's dedup surface, e.g.
/root/reference/src/centimators/ — text dedup generalized to
position-robust partial-overlap fingerprints).

Unlike set-based n-gram Jaccard (whole-document similarity) or the
bottom-2 extrema sketch (text/hashing_udf.gram_hash_extrema_udf),
winnowing guarantees: any shared token run of at least w + k - 1
tokens between two documents produces at least one SHARED fingerprint
— while selecting only ~2/(w+1) of all gram hashes. That makes it the
canonical partial-plagiarism / boilerplate-overlap detector.

Pipeline (pure relational — zero Python):

1. positional k-grams per doc (posexplode over the joined token
   n-gram array) -> portable 60-bit md5 hash per gram;
2. sliding-window minimum over each run of w consecutive hashes
   (a rows-between window frame ordered by gram position; only FULL
   windows count — docs shorter than w + k - 1 tokens yield no
   fingerprints, the documented convention);
3. the doc's fingerprint set = DISTINCT selected hashes (robust
   winnowing keeps the value set; position bookkeeping is not needed
   for overlap detection);
4. overlap: self-join fingerprints on the hash, count shared prints
   per pair. A document-frequency cap drops boilerplate fingerprints
   appearing in more than ``df_cap`` docs BEFORE the pair join (the
   jaccard stop-gram discipline — the cap is mirrored in the oracle,
   so the contract stays exact).

Scale: the explode and window are per-doc (one shuffle on the doc
key); fingerprints are ~2/(w+1) of gram count; the pair stage joins
the capped fingerprint table against itself on the hash key — linear
in corpus size, never all-pairs."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.text.portable import (
    md5_long,
    sql_md5_long,
    sql_tokens,
    tokens,
)

WINNOW_K = 3  # gram size
WINNOW_W = 4  # window: guarantee threshold w + k - 1 = 6 tokens
WINNOW_DF_CAP = 100
WINNOW_MIN_SHARED = 2


def winnowing_fingerprints(
    df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, fp): the doc's DISTINCT winnowing-selected gram
    hashes — min of every full w-run of consecutive k-gram hashes."""
    # stage the token array so the splitter runs once per row, and
    # build positional grams with the pushdown-robust zipped-slices
    # form (portable.token_ngrams_all — the element_at-in-lambda form
    # measured 60x slower when Catalyst re-inlines under a pushed
    # filter)
    from centimators_spark.text.portable import token_ngrams_all

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(content_col)).alias("__tok"),
    )
    grams = staged.select(
        "doc_id",
        F.posexplode(
            token_ngrams_all(F.col("__tok"), k)
        ).alias("pos", "gram"),
    ).select("doc_id", "pos", md5_long(F.col("gram")).alias("h"))
    w_cnt = Window.partitionBy("doc_id")
    w_min = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        grams.withColumn("__g", F.count(F.lit(1)).over(w_cnt))
        .withColumn("__m", F.min("h").over(w_min))
        .where(F.col("pos") <= F.col("__g") - w)  # full windows only
        .select("doc_id", F.col("__m").alias("fp"))
        .distinct()
    )


def winnowing_overlap_pairs(
    df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    df_cap: int = WINNOW_DF_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """(d1, d2, n_shared): doc pairs sharing >= min_shared winnowing
    fingerprints, after dropping fingerprints present in more than
    df_cap docs (boilerplate guard, applied before the pair join)."""
    # r13 optimization: the lazy fps frame fed FOUR consumers (the df
    # count, the cap join, both pair-join sides), re-running the
    # posexplode + two-window fingerprint derivation each time; and
    # the pair stage self-joined the fingerprint table on fp. One
    # groupBy now collects each fingerprint's sorted doc set (≤ df_cap
    # docs by construction of the cap), applies the cap as a size
    # filter (fps is distinct per (doc, fp), so set size == the old
    # count), and explodes the d1<d2 pairs map-side — identical pair
    # multiset, one fingerprint-key shuffle instead of four.
    fps = winnowing_fingerprints(
        df, content_col=content_col, id_col=id_col, k=k, w=w
    )
    doc_sets = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("__ds"))
        .where(F.size("__ds") <= df_cap)
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("__ds"),
            lambda x, i: F.transform(
                F.slice(F.col("__ds"), i + F.lit(2), F.size(F.col("__ds"))),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )
    return (
        doc_sets.select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def winnowing_overlap_oracle_sql(
    table: str = "documents",
    *,
    content_sql: str = "text",
    id_sql: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    df_cap: int = WINNOW_DF_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> str:
    """DuckDB mirror: identical positional grams, identical md5
    hashes, identical full-window min frame, identical df cap."""
    joined = " || ' ' || ".join(f"tk[i+{j}]" for j in range(k)).replace(
        "[i+0]", "[i]"
    )
    return f"""
        WITH grams AS (
          SELECT {id_sql} AS doc_id, i - 1 AS pos,
                 {sql_md5_long(joined)} AS h
          FROM (SELECT {id_sql}, {sql_tokens(content_sql)} AS tk
                FROM {table})
          CROSS JOIN unnest(range(1, len(tk) - {k - 2})) AS t(i)
        ), mins AS (
          SELECT doc_id, pos,
                 min(h) OVER (PARTITION BY doc_id ORDER BY pos
                              ROWS BETWEEN CURRENT ROW
                              AND {w - 1} FOLLOWING) AS m,
                 count(*) OVER (PARTITION BY doc_id) AS g
          FROM grams
        ), fps AS (
          SELECT DISTINCT doc_id, m AS fp
          FROM mins WHERE pos <= g - {w}
        ), rare AS (
          SELECT fp FROM fps GROUP BY fp
          HAVING count(*) <= {df_cap}
        ), capped AS (
          SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)
        )
        SELECT a.doc_id AS d1, b.doc_id AS d2,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM capped a JOIN capped b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= {min_shared}
    """
