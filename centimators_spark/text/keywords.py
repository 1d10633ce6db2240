"""RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010) — the
unsupervised keyphrase step corpora pipelines run before topic
labeling or index building.

Algorithm: candidate phrases are maximal runs of non-stopword tokens;
word score = degree/frequency where degree sums the lengths of every
phrase the word appears in; a phrase scores the sum of its words'
scores.

Spark shape: pure expression phrase splitting (lowercase → non-alnum
collapse → stopwords become '|' delimiters in TWO regexp passes —
adjacent stopwords share a boundary space the first pass consumes, RE2
has no lookahead, so the second pass is load-bearing in BOTH engines),
one explode to word stats, one broadcast join of the word-score table
back onto distinct phrases, grouped integer sums. Word scores ride as
micro-unit integers ((degree·10⁶) DIV freq), so every downstream sum
is exact in any order — bit-exact DuckDB oracle.

Scale: the word-score table is vocabulary-sized (broadcast); phrases
explode map-side; the only data-sized shuffles are the two grouped
counts. top-k is sort+limit → TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.analysis import LANG_PROFILES

_SCORE_SCALE = 10**6


def _stop_re(stopwords) -> str:
    return "(" + "|".join(stopwords) + ")"


def rake_keywords(
    df: DataFrame,
    *,
    content_col: str = "text",
    stopwords=None,
    max_phrase_len: int = 3,
    min_occurrences: int = 2,
    top_k: int = 50,
) -> DataFrame:
    """Corpus-level top-``top_k`` RAKE keyphrases:
    (phrase, n_occurrences, n_words, score). Ordered
    (score desc, phrase asc) — a total order, deterministic cut."""
    stops = list(stopwords) if stopwords is not None else LANG_PROFILES["en"]
    sr = _stop_re(stops)
    txt = F.regexp_replace(F.lower(F.col(content_col)), "[^a-z0-9]+", " ")
    s = F.concat(F.lit(" "), txt, F.lit(" "))
    p1 = F.regexp_replace(s, f" {sr} ", " | ")
    p2 = F.regexp_replace(p1, f" {sr} ", " | ")
    phrases = (
        df.where(F.col(content_col).isNotNull())
        .select(F.explode(F.split(p2, "\\|")).alias("__raw"))
        .select(F.trim(F.col("__raw")).alias("phrase"))
        .where(F.col("phrase") != "")
        .select("phrase", F.split(F.col("phrase"), " ").alias("__toks"))
        .where(F.size("__toks") <= max_phrase_len)
    )
    # word stats over ALL phrase instances
    words = phrases.select(
        F.explode("__toks").alias("word"), F.size("__toks").alias("__len")
    )
    wstats = words.groupBy("word").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__len").alias("__deg"),
    )
    wscore = wstats.select(
        "word",
        F.expr(f"(__deg * {_SCORE_SCALE}) DIV __freq").alias("__ws"),
    )
    pcounts = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.first("__toks").alias("__toks"),
    )
    pscore = (
        pcounts.select(
            "phrase", "n_occurrences", F.explode("__toks").alias("word")
        )
        .join(F.broadcast(wscore), "word")
        .groupBy("phrase", "n_occurrences")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__ws").alias("__s"),
        )
    )
    return (
        pscore.where(F.col("n_occurrences") >= min_occurrences)
        .select(
            "phrase",
            "n_occurrences",
            F.col("n_words").cast("int").alias("n_words"),
            (F.col("__s").cast("double") / _SCORE_SCALE).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("phrase"))
        .limit(top_k)
    )


def rake_keywords_oracle_sql(
    table: str = "documents",
    *,
    content_sql: str = "text",
    stopwords=None,
    max_phrase_len: int = 3,
    min_occurrences: int = 2,
    top_k: int = 50,
) -> str:
    """DuckDB mirror of :func:`rake_keywords` (identical two-pass
    stopword delimiting and micro-unit word scores)."""
    stops = list(stopwords) if stopwords is not None else LANG_PROFILES["en"]
    sr = _stop_re(stops)
    base = (
        f"regexp_replace(regexp_replace("
        f"' ' || regexp_replace(lower({content_sql}), '[^a-z0-9]+', ' ', 'g')"
        f" || ' ', ' {sr} ', ' | ', 'g'), ' {sr} ', ' | ', 'g')"
    )
    return f"""
        WITH phr AS (
          SELECT trim(p) AS phrase
          FROM {table}, unnest(string_split({base}, '|')) AS u(p)
          WHERE {content_sql} IS NOT NULL AND trim(p) <> ''
        ), tok AS (
          SELECT phrase, string_split(phrase, ' ') AS toks
          FROM phr
        ), bounded AS (
          SELECT * FROM tok WHERE len(toks) <= {max_phrase_len}
        ), words AS (
          SELECT unnest(toks) AS word, len(toks) AS l FROM bounded
        ), wstats AS (
          SELECT word,
                 (sum(l) * {_SCORE_SCALE}) // count(*) AS ws
          FROM words GROUP BY word
        ), pcounts AS (
          SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
                 any_value(toks) AS toks
          FROM bounded GROUP BY phrase
        ), pscore AS (
          SELECT p.phrase, p.n_occurrences,
                 CAST(count(*) AS INTEGER) AS n_words,
                 CAST(sum(w.ws) AS DOUBLE) / {_SCORE_SCALE} AS score
          FROM pcounts p, unnest(p.toks) AS t(word)
          JOIN wstats w ON t.word = w.word
          GROUP BY p.phrase, p.n_occurrences
        )
        SELECT phrase, n_occurrences, n_words, score
        FROM pscore WHERE n_occurrences >= {min_occurrences}
        ORDER BY score DESC, phrase LIMIT {top_k}
    """
