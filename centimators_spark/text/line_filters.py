"""C4-style line filtering (Raffel et al. 2020, the public C4 cleaning
rules): keep only lines that end in terminal punctuation and have
enough words; drop boilerplate lines; flag documents containing policy
phrases or code debris.

Per-row array expressions over the '\n'-split lines — whole-stage
codegen, map-side only, zero shuffle (the same scale shape as the
repetition signals). The DuckDB oracle applies identical rules via
list_filter, so every count and the reassembled text hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import nonempty_lines

TERMINAL = [".", "!", "?", '"']
DROP_SUBSTRING = "javascript"  # C4 drops lines mentioning javascript
LOREM = "lorem ipsum"
MIN_WORDS = 3


def _line_ok(line: Column, min_words: int) -> Column:
    lo = F.lower(line)
    words = F.size(F.filter(F.split(line, " +"), lambda t: t != ""))
    ends_ok = F.substring(line, -1, 1).isin(*TERMINAL)
    return ends_ok & (words >= min_words) & (~lo.contains(DROP_SUBSTRING))


def c4_line_filters(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = MIN_WORDS,
) -> DataFrame:
    """Per document: ``n_lines``/``n_kept`` line counts under the C4
    rules, the reassembled ``text_clean`` (kept lines joined by '\\n'),
    and document flags ``has_lorem`` / ``has_brace`` (the C4
    page-level discard signals, reported rather than applied so callers
    choose the policy)."""
    # NULL text ≡ empty text (the NULL-propagating array chain would
    # emit size=-1 / NULL text_clean while the oracle coalesces to '')
    content = F.coalesce(F.col(content_col), F.lit(""))
    lines = nonempty_lines(content)
    kept = F.filter(lines, lambda l: _line_ok(l, min_words))
    lo = F.lower(content)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
        lo.contains(LOREM).cast("int").alias("has_lorem"),
        content.contains("{").cast("int").alias("has_brace"),
    )


def c4_line_filters_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    min_words: int = MIN_WORDS,
) -> str:
    terminals = ", ".join(f"'{t}'" if t != '"' else "'\"'" for t in TERMINAL)
    line_ok = (
        f"right(l, 1) IN ({terminals}) "
        f"AND len(list_filter(string_split_regex(l, ' +'), t -> t <> ''))"
        f" >= {min_words} "
        f"AND NOT contains(lower(l), '{DROP_SUBSTRING}')"
    )
    return f"""
      WITH base AS (
        SELECT {id_sql} AS doc_id, coalesce({content_sql}, '') AS t,
               list_filter(string_split(coalesce({content_sql}, ''), chr(10)),
                           x -> x <> '') AS lines
        FROM {table}
      ), k AS (
        SELECT doc_id, t, lines,
               list_filter(lines, l -> {line_ok}) AS kept
        FROM base
      )
      SELECT doc_id,
             len(lines) AS n_lines,
             len(kept) AS n_kept,
             coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
             CAST(contains(lower(t), '{LOREM}') AS INT) AS has_lorem,
             CAST(contains(t, '{{') AS INT) AS has_brace
      FROM k
    """


def corpus_line_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_dup_docs: int = 2,
    rewrite: bool = False,
) -> DataFrame:
    """CROSS-document line deduplication — the RefinedWeb/CCNet recipe
    step the within-doc signals (repetition.py) and per-line rules
    (c4_line_filters) don't cover: a line counts as duplicated when it
    appears in ≥ ``min_dup_docs`` DISTINCT documents (boilerplate,
    navigation, license banners).

    Returns per doc: ``n_lines``, ``n_dup_lines`` (lines whose text is
    corpus-duplicated), ``dup_line_frac``, and — with
    ``rewrite=True`` — ``text_clean`` with those lines removed
    (ORDER-PRESERVING; repeated occurrences inside one doc count once
    per position).

    Plan (stats mode): ONE explode+hash scan of the corpus →
    (doc, line-hash) occurrence counts (map-side partial) → per-hash
    distinct-doc count as a window over that already-collapsed frame →
    per-doc rollup. The earlier two-branch shape (dup-hash set
    broadcast back onto a second per-line pass) re-executed the
    explode+md5 scan — the expensive step — twice; the window shape
    scans once and shuffles only the collapsed (doc, lh) frame. The
    rewrite mode below still uses the broadcast-dup-set shape (it must
    revisit the raw line positions anyway)."""
    from pyspark.sql import Window

    from centimators_spark.text.portable import md5_long

    content = F.coalesce(F.col(content_col), F.lit(""))
    base = df.select(F.col(id_col).alias("doc_id"), content.alias("__text"))
    per_line = base.select(
        "doc_id", F.explode(nonempty_lines(F.col("__text"))).alias("line")
    ).withColumn("lh", md5_long(F.col("line")))
    occ = per_line.groupBy("doc_id", "lh").agg(
        F.count(F.lit(1)).alias("__c")
    )
    # each (doc_id, lh) row is one distinct doc for that hash
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("lh"))
    per_doc = (
        occ.withColumn("__nd", n_docs)
        .groupBy("doc_id")
        .agg(
            F.sum("__c").alias("n_lines"),
            F.sum(
                F.when(F.col("__nd") >= min_dup_docs, F.col("__c")).otherwise(
                    0
                )
            ).alias("n_dup_lines"),
        )
    )
    out = base.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
        F.coalesce(F.col("n_dup_lines"), F.lit(0)).alias("n_dup_lines"),
        F.when(
            F.col("n_lines") > 0,
            F.round(F.col("n_dup_lines") / F.col("n_lines"), 6),
        ).alias("dup_line_frac"),
    )
    if not rewrite:
        return out
    # order-preserving rewrite via posexplode + anti-join + positional
    # re-assembly — a JOIN, not a literal array in the plan (a pathological
    # corpus could have a huge duplicated-line set; a thousands-element
    # literal would bloat every task's plan and scan O(|dup|) per line)
    dup_lines = (
        occ.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_dup_docs)
        .select("lh")
    )
    pos_lines = base.select(
        "doc_id",
        F.posexplode(nonempty_lines(F.col("__text"))).alias("pos", "line"),
    ).withColumn("lh", md5_long(F.col("line")))
    kept = pos_lines.join(F.broadcast(dup_lines), "lh", "left_anti")
    rewritten = (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "line"))
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("text_clean")
        )
    )
    return out.join(rewritten, "doc_id", "left").select(
        out["*"], F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean")
    )


def corpus_line_dedup_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    *,
    min_dup_docs: int = 2,
) -> str:
    """DuckDB mirror of :func:`corpus_line_dedup` (stats mode)."""
    from centimators_spark.text.portable import sql_md5_long

    lines = (
        f"list_filter(string_split(coalesce({content_sql}, ''), chr(10)),"
        " x -> x <> '')"
    )
    return f"""
        WITH per_line AS (
          SELECT {id_sql} AS doc_id, unnest({lines}) AS line
          FROM {table}
        ), hashed AS (
          SELECT doc_id, {sql_md5_long('line')} AS lh FROM per_line
        ), dup AS (
          SELECT lh FROM (
            SELECT lh, count(DISTINCT doc_id) AS n_docs
            FROM hashed GROUP BY lh
          ) WHERE n_docs >= {min_dup_docs}
        ), per_doc AS (
          SELECT h.doc_id,
                 count(*) AS n_lines,
                 sum(CASE WHEN d.lh IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_dup_lines
          FROM hashed h LEFT JOIN dup d USING (lh)
          GROUP BY h.doc_id
        )
        SELECT b.doc_id,
               CAST(coalesce(p.n_lines, 0) AS BIGINT) AS n_lines,
               CAST(coalesce(p.n_dup_lines, 0) AS BIGINT) AS n_dup_lines,
               CASE WHEN p.n_lines > 0
                 THEN round(CAST(p.n_dup_lines AS DOUBLE) / p.n_lines, 6) END
                 AS dup_line_frac
        FROM (SELECT {id_sql} AS doc_id FROM {table}) b
        LEFT JOIN per_doc p USING (doc_id)
    """
