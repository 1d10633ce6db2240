"""Repetition-based quality signals (Gopher-style rules).

The published Gopher / MassiveText filtering rules (Rae et al. 2021,
"Scaling Language Models", table A1) remove documents dominated by
repeated content: high duplicate-line fraction, high fraction of
characters inside the most common n-gram, high fraction of characters
inside duplicated n-grams. This module computes those signals per
document so a corpus pipeline can threshold them.

Scale design: everything is a per-row array expression over the sorted
line/gram arrays — a single linear pass per document after an
O(T log T) in-row sort, fully whole-stage-codegen, ZERO shuffle (the
map-side equivalent of the per-doc Counter pass a single-node pipeline
would run). Duplicate counts fall out of sorted-adjacent equality:
in a sorted array every occurrence beyond the first equals its left
neighbor. The most-frequent-gram stat is a run-length scan with a
struct accumulator (F.aggregate), ties broken toward the
lexicographically smallest gram (= first maximal run in sorted order),
so results are deterministic under any partitioning.

All counts are exact integers; ratios are single IEEE divisions of
those integers — bit-reproducible against the DuckDB oracle, which
computes the same integers via unnest/GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import (
    nonempty_lines,
    token_ngrams_all,
    tokens,
)


def _dup_char_sum(sorted_arr: Column) -> Column:
    """Σ length over occurrences beyond the first (sorted-adjacent
    trick: zip the array against its 1-shifted self; every equal pair
    marks a repeat occurrence). Lambdas reference only their own
    elements — see token_ngrams_all on pushdown robustness."""
    win = F.greatest(F.size(sorted_arr) - 1, F.lit(0))
    pair_lens = F.zip_with(
        F.slice(sorted_arr, 2, win),
        F.slice(sorted_arr, 1, win),
        lambda x, y: F.when(x == y, F.length(x).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(pair_lens, F.lit(0).cast("long"), lambda acc, v: acc + v)


def _top_run(sorted_arr: Column) -> Column:
    """struct(cnt, gram) of the most frequent element of a sorted array;
    ties -> lexicographically smallest (first maximal run)."""
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
        F.lit("").alias("gram"),
    )

    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        better = run > acc["best"]
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, g).otherwise(acc["gram"]).alias("gram"),
        )

    return F.aggregate(
        sorted_arr,
        zero,
        step,
        lambda acc: F.struct(acc["best"].alias("cnt"), acc["gram"].alias("gram")),
    )


def _frac(num: Column, den: Column) -> Column:
    """num/den as double, 0.0 when the denominator is 0 (empty doc)."""
    return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )


def dup_char_frac_expr(sorted_arr: Column, chars: Column) -> Column:
    """Fraction of ``chars`` covered by repeated occurrences (beyond
    each element's first) of a SORTED array — the duplicated-character
    kernel, shared by :func:`repetition_signals` and the fused
    corpus_clean signal projection so the two can never drift."""
    return _frac(_dup_char_sum(sorted_arr), chars)


def repetition_signals(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
) -> DataFrame:
    """Per-document repetition signals:

    - ``n_lines`` / ``dup_line_frac``: non-empty '\\n'-lines; fraction
      that are repeats of an earlier line.
    - ``dup_line_char_frac``: characters in repeated line occurrences
      (beyond each line's first) over all line characters.
    - ``top_ngram_cnt`` / ``top_ngram_char_frac``: occurrence count of
      the most frequent token ``top_n``-gram and the fraction of the
      document's characters its occurrences cover.
    - ``dup_ngram_char_frac``: characters inside ``dup_n``-gram
      occurrences beyond the first, over all document characters.

    Gopher's published thresholds (dup_line_frac > 0.30,
    top_2gram_char_frac > 0.20, dup_ngram char fractions ...) apply
    directly to these columns.
    """
    # NULL text ≡ empty text (a null would NULL-poison the array chain
    # while the oracle's per-group aggregation coalesces to 0 — the two
    # engines would diverge exactly on scraped-corpus null rows)
    content = F.coalesce(F.col(content_col), F.lit(""))
    # stage the token array FIRST: n-gram lambdas reference it per
    # element, and an inlined split()+filter() re-evaluates per access
    # (measured 10× slower); a bound column reference evaluates once
    tokenized = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(content).cast("long").alias("__chars"),
        F.array_sort(nonempty_lines(content)).alias("__lines"),
        tokens(content).alias("__tok"),
    )
    staged = tokenized.select(
        "doc_id",
        "__chars",
        "__lines",
        F.array_sort(token_ngrams_all(F.col("__tok"), top_n)).alias("__topg"),
        F.array_sort(token_ngrams_all(F.col("__tok"), dup_n)).alias("__dupg"),
    )
    lines = F.col("__lines")
    n_lines = F.size(lines).cast("long")
    n_distinct_lines = F.size(F.array_distinct(lines)).cast("long")
    line_chars = F.aggregate(
        lines, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
    )
    top = _top_run(F.col("__topg"))
    top_cnt = top["cnt"]
    top_covered = top_cnt * F.length(top["gram"]).cast("long")
    return staged.select(
        "doc_id",
        n_lines.alias("n_lines"),
        _frac(n_lines - n_distinct_lines, n_lines).alias("dup_line_frac"),
        dup_char_frac_expr(lines, line_chars).alias("dup_line_char_frac"),
        top_cnt.alias("top_ngram_cnt"),
        _frac(top_covered, F.col("__chars")).alias("top_ngram_char_frac"),
        dup_char_frac_expr(F.col("__dupg"), F.col("__chars")).alias(
            "dup_ngram_char_frac"
        ),
    )


# ------------------------------------------------------------ DuckDB side

def repetition_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    top_n: int = 2,
    dup_n: int = 3,
) -> str:
    """Same integers via unnest/GROUP BY (implementation-independent)."""
    from centimators_spark.text.portable import sql_tokens

    tok = sql_tokens(content_sql)

    def grams_all(n: int) -> str:
        joined = " || ' ' || ".join(
            f"tk[i+{j}]" for j in range(n)
        ).replace("[i+0]", "[i]")
        return (
            f"CASE WHEN len(tk) >= {n} THEN "
            f"list_transform(range(1, len(tk) - {n - 2}), i -> {joined}) "
            f"ELSE [] END"
        )

    return f"""
      WITH base AS (
        SELECT {id_sql} AS doc_id,
               CAST(length({content_sql}) AS BIGINT) AS n_chars,
               list_filter(string_split({content_sql}, chr(10)), x -> x <> '')
                 AS lines,
               {tok} AS tk
        FROM {table}
      ), g AS (
        SELECT doc_id, n_chars, lines,
               {grams_all(top_n)} AS topg, {grams_all(dup_n)} AS dupg
        FROM base
      ),
      line_stats AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_lines,
               CAST(count(DISTINCT l) AS BIGINT) AS n_distinct,
               CAST(sum(length(l)) AS BIGINT) AS line_chars,
               CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(l) ELSE 0 END)
                    AS BIGINT) AS dup_line_chars
        FROM (
          SELECT doc_id, l, count(*) AS cnt
          FROM (SELECT doc_id, unnest(lines) AS l FROM g) GROUP BY doc_id, l
        ) t
        GROUP BY doc_id
      ),
      top_stats AS (
        SELECT doc_id, CAST(cnt AS BIGINT) AS top_cnt,
               CAST(cnt * length(gram) AS BIGINT) AS top_covered
        FROM (
          SELECT doc_id, gram, cnt,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY cnt DESC, gram ASC) AS rn
          FROM (
            SELECT doc_id, gr AS gram, count(*) AS cnt
            FROM (SELECT doc_id, unnest(topg) AS gr FROM g) GROUP BY doc_id, gr
          )
        ) WHERE rn = 1
      ),
      dup_stats AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN cnt > 1 THEN (cnt - 1) * length(gr) ELSE 0 END)
                    AS BIGINT) AS dup_gram_chars
        FROM (
          SELECT doc_id, gr, count(*) AS cnt
          FROM (SELECT doc_id, unnest(dupg) AS gr FROM g) GROUP BY doc_id, gr
        ) t
        GROUP BY doc_id
      )
      SELECT g.doc_id,
        coalesce(ls.n_lines, 0) AS n_lines,
        CASE WHEN coalesce(ls.n_lines, 0) > 0
             THEN CAST(ls.n_lines - ls.n_distinct AS DOUBLE)
                  / CAST(ls.n_lines AS DOUBLE) ELSE 0.0 END AS dup_line_frac,
        CASE WHEN coalesce(ls.line_chars, 0) > 0
             THEN CAST(ls.dup_line_chars AS DOUBLE)
                  / CAST(ls.line_chars AS DOUBLE) ELSE 0.0 END
          AS dup_line_char_frac,
        coalesce(ts.top_cnt, 0) AS top_ngram_cnt,
        CASE WHEN g.n_chars > 0
             THEN CAST(coalesce(ts.top_covered, 0) AS DOUBLE)
                  / CAST(g.n_chars AS DOUBLE) ELSE 0.0 END
          AS top_ngram_char_frac,
        CASE WHEN g.n_chars > 0
             THEN CAST(coalesce(ds.dup_gram_chars, 0) AS DOUBLE)
                  / CAST(g.n_chars AS DOUBLE) ELSE 0.0 END
          AS dup_ngram_char_frac
      FROM g
      LEFT JOIN line_stats ls USING (doc_id)
      LEFT JOIN top_stats ts USING (doc_id)
      LEFT JOIN dup_stats ds USING (doc_id)
    """
