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
