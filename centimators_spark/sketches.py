"""Count-min sketch over token streams — the point-frequency sketch
(Cormode & Muthukrishnan 2005) beside the suite's cardinality
(approx_distinct HLL contract) and quantile (psi_sketch) families.

Portability: the d row-hashes are the engine's stable 60-bit md5 hash
of ``"{i}:" || token`` mod w — no engine-native hash — so every cell
count, every estimate, and every overcount is a deterministic INTEGER
both engines compute identically: the whole sketch is hash-provable,
not just its error bound.

Scale: building the sketch is ONE pass — explode tokens, fan each out
to its d (row, bucket) cells (a d-element posexplode), one
map-side-combined count into d·w cells (a few KB regardless of corpus
size — the point of a sketch). Estimation joins the d·w cell table
(broadcast) against the query keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import md5_long, sql_md5_long, tokens

CMS_D = 4
CMS_W = 512


def _bucket(tok: Column, i: int, w: int) -> Column:
    return F.pmod(md5_long(F.concat(F.lit(f"{i}:"), tok)), F.lit(w))


def cms_build(
    df: DataFrame,
    *,
    content_col: str = "text",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(row, bucket, c): the d×w cell counts of the corpus token
    stream (whitespace tokens, with multiplicity)."""
    tok = df.select(F.explode(tokens(F.col(content_col))).alias("tok"))
    cells = tok.select(
        F.posexplode(
            F.array(*[_bucket(F.col("tok"), i, w) for i in range(d)])
        ).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def cms_heavy_hitter_contract(
    df: DataFrame,
    *,
    content_col: str = "text",
    k: int = 30,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """For the k most frequent tokens (exact count, ties by token):
    (token, true_n, cms_est, overcount) where cms_est = min over the d
    rows of the cell count and overcount = cms_est − true_n. The CMS
    guarantee est ≥ true means overcount ≥ 0 ALWAYS — and because the
    hashes are portable, the exact overcount values hash-match the SQL
    twin, proving the sketch itself, not a tolerance band."""
    tok = df.select(
        F.explode(tokens(F.col(content_col))).alias("tok")
    ).localCheckpoint(eager=True)
    true_c = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("true_n")
    )
    keys = true_c.orderBy(
        F.col("true_n").desc(), F.col("tok").asc()
    ).limit(k)
    cells = tok.select(
        F.posexplode(
            F.array(*[_bucket(F.col("tok"), i, w) for i in range(d)])
        ).alias("row", "bucket")
    ).groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    kb = keys.select(
        "tok",
        "true_n",
        F.posexplode(
            F.array(*[_bucket(F.col("tok"), i, w) for i in range(d)])
        ).alias("row", "bucket"),
    )
    est = (
        kb.join(F.broadcast(cells), ["row", "bucket"])
        .groupBy("tok", "true_n")
        .agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        F.col("tok").alias("token"),
        "true_n",
        "cms_est",
        (F.col("cms_est") - F.col("true_n")).alias("overcount"),
    )


def cms_heavy_hitter_oracle_sql(
    table: str = "documents",
    *,
    content_sql: str = "text",
    k: int = 30,
    d: int = CMS_D,
    w: int = CMS_W,
) -> str:
    """DuckDB mirror: identical md5 row-hashes, identical cells,
    identical min-estimate."""
    from centimators_spark.text.portable import sql_tokens

    tk = sql_tokens(content_sql)
    h = sql_md5_long("(CAST(i AS VARCHAR) || ':' || tok)")
    return f"""
        WITH toks AS (
          SELECT unnest({tk}) AS tok FROM {table}
        ), true_c AS (
          SELECT tok, CAST(count(*) AS BIGINT) AS true_n
          FROM toks GROUP BY tok
        ), keys AS (
          SELECT tok, true_n FROM true_c
          ORDER BY true_n DESC, tok LIMIT {k}
        ), fan AS (
          SELECT tok, i, {h} % {w} AS bucket
          FROM toks CROSS JOIN range({d}) t(i)
        ), cells AS (
          SELECT i, bucket, CAST(count(*) AS BIGINT) AS c
          FROM fan GROUP BY i, bucket
        ), kb AS (
          SELECT k.tok, k.true_n, t.i, {sql_md5_long(
              "(CAST(t.i AS VARCHAR) || ':' || k.tok)")} % {w} AS bucket
          FROM keys k CROSS JOIN range({d}) t(i)
        )
        SELECT kb.tok AS token, kb.true_n,
               min(c.c) AS cms_est,
               min(c.c) - kb.true_n AS overcount
        FROM kb JOIN cells c ON c.i = kb.i AND c.bucket = kb.bucket
        GROUP BY kb.tok, kb.true_n
    """
