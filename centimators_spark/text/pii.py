"""PII scrubbing: regex masking of emails / IPv4 addresses / phone
numbers — the pre-release redaction stage of public-corpus pipelines
(C4, Dolma, RefinedWeb all document a variant of it).

Pure regexp_replace/regexp_extract_all chains — whole-stage codegen,
map-side only, zero shuffle. The patterns are deliberately restricted
to the regex subset with identical semantics in Java (Spark) and RE2
(DuckDB) — character classes, bounded repetition, word boundaries, no
backreferences or lookaround — so the DuckDB oracle masks
bit-identically and parity is driver-verifiable.

Masking order is email → ipv4 → phone on the ORIGINAL text's matches
(counts are computed before masking; each stage rewrites the previous
stage's output, same order both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (kind, pattern, replacement) — order matters: emails first so the
# phone rule never eats an address's digits
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"(\+\d{1,3}[- ]?)?\b\d{3}[- ]?\d{3,4}[- ]?\d{4}\b", "[PHONE]"),
]


def mask_pii(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per document: ``n_email``/``n_ipv4``/``n_phone`` match counts
    (on the original text) and ``text_masked`` with every match replaced
    by its ``[KIND]`` token."""
    # NULL text ≡ empty text (F.size of a null match array is -1 while
    # the oracle's len(NULL) is NULL — both wrong; 0 matches is right)
    text = F.coalesce(F.col(content_col), F.lit(""))
    counts = [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(f"n_{kind}")
        for kind, pat, _ in PII_RULES
    ]
    masked = text
    for _, pat, repl in PII_RULES:
        masked = F.regexp_replace(masked, pat, repl)
    return df.select(
        F.col(id_col).alias("doc_id"), *counts, masked.alias("text_masked")
    )


def mask_pii_oracle_sql(
    table: str = "documents", content_sql: str = "text", id_sql: str = "doc_id"
) -> str:
    """DuckDB mirror: same patterns, same order, global replacement."""
    safe = f"coalesce({content_sql}, '')"
    counts = ", ".join(
        f"len(regexp_extract_all({safe}, '{pat}')) AS n_{kind}"
        for kind, pat, _ in PII_RULES
    )
    masked = safe
    for _, pat, repl in PII_RULES:
        masked = f"regexp_replace({masked}, '{pat}', '{repl}', 'g')"
    return f"""
      SELECT {id_sql} AS doc_id, {counts}, {masked} AS text_masked
      FROM {table}
    """
