"""URL canonicalization — the FIRST dedup key of every web-scale corpus
(CommonCrawl-derived pipelines dedup by normalized URL before any
content hashing touches the payload).

Pure codegen expressions: lowercase scheme/host, strip the scheme,
``www.`` prefix, query string, fragment, default ports, and the
trailing slash — so ``https://WWW.Example.com:443/a/?utm=x#f`` and
``http://example.com/a`` canonicalize identically. Zero shuffle; the
dedup itself is one hash-groupBy on the canonical key (the same plan
shape as dedup/exact.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL column (see module docstring). NULL in →
    NULL out; non-URL strings pass through the same string surgery
    unchanged where rules don't match."""
    u = F.trim(col)
    # scheme off (case-insensitive), rest untouched yet
    u = F.regexp_replace(u, r"(?i)^[a-z][a-z0-9+.-]*://", "")
    # split host[:port] from path at the first '/'
    host = F.lower(F.regexp_extract(u, r"^([^/]*)", 1))
    path = F.regexp_replace(u, r"^[^/]*", "")
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    # drop query + fragment, then the trailing slash
    path = F.regexp_replace(path, r"[?#].*$", "")
    path = F.regexp_replace(path, r"/$", "")
    return F.concat(host, path)


def sql_canonical_url(expr: str) -> str:
    """DuckDB mirror of :func:`canonical_url` — the same anchored regex
    steps over the same input expression; every pattern is in the
    Java-regex ∩ RE2 common subset (the pii.py portability rule), so the
    two engines transform identically."""
    u = f"regexp_replace(trim({expr}), '(?i)^[a-z][a-z0-9+.-]*://', '')"
    host = (
        f"regexp_replace(regexp_replace(lower(regexp_extract({u}, '^([^/]*)', 1)),"
        " '^www\\.', ''), ':(80|443)$', '')"
    )
    path = (
        f"regexp_replace(regexp_replace(regexp_replace({u}, '^[^/]*', ''),"
        " '[?#].*$', ''), '/$', '')"
    )
    return f"({host} || {path})"


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """One row per canonical URL: ``canonical_url``, ``keep_id`` (min
    id), ``n_dups`` — the exact-dedup plan keyed on the canonical form
    (single hash-groupBy shuffle, map-side partial)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), canonical_url(F.col(url_col)).alias("cu"))
        .groupBy("cu")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
        .select(F.col("cu").alias("canonical_url"), "keep_id", "n_dups")
    )
