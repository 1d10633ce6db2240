"""Text analysis operators: language ID, quality scoring, token counts,
document fingerprinting. All pure JVM expressions (codegen, no shuffle)
with DuckDB-portable semantics; constants shared with the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from centimators_spark.text.portable import tokens

# small stopword profiles for the n-gram/stopword-hit language heuristic;
# fixed order = deterministic argmax tie-breaking
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "es": ["el", "la", "y", "los", "las", "un", "una", "es"],
    "zh": ["的", "了", "是", "在", "我", "有", "和", "就"],
}

PUNCT_RE = "[^a-z0-9 ]"
WORD_RE = "[a-z]+|[0-9]+"  # BPE-ish: letter runs and digit runs


def _hits(tok: Column, words: list[str]) -> Column:
    return F.size(F.array_intersect(tok, F.array(*[F.lit(w) for w in words])))


def lang_pred_exprs(dtok: Column) -> tuple[Column, Column, dict[str, Column]]:
    """(best_lang, best_score, per-language scores) over a DISTINCT
    token array — the language-ID kernel, shared by
    :func:`language_id` and the fused corpus_clean signal projection
    so the two can never drift. Argmax with first-wins tie-break in
    fixed profile order."""
    scores = {lang: _hits(dtok, words) for lang, words in LANG_PROFILES.items()}
    best_lang, best_score = None, None
    for lang, score in scores.items():  # first-wins tie-break (fixed order)
        if best_lang is None:
            best_lang, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, score).otherwise(best_score)
    return best_lang, best_score, scores


def language_id(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: per-language stopword hit counts over the
    distinct token set; argmax with fixed language order on ties."""
    tok = F.array_distinct(tokens(F.col(content_col)))
    best_lang, best_score, scores = lang_pred_exprs(tok)
    return df.select(
        F.col(id_col).alias("doc_id"),
        best_lang.alias("lang_pred"),
        best_score.alias("lang_hits"),
        *[scores[lang].alias(f"hits_{lang}") for lang in LANG_PROFILES],
    )


def quality_exprs(
    text_c: Column, lo_c: Column, tok: Column, dtok: Column
) -> dict[str, Column]:
    """The quality-feature expression kernel over STAGED columns
    (raw text, lowered text, token array, distinct token array) —
    shared by :func:`quality_score` and the fused corpus_clean signal
    projection so the two can never drift. Callers must pass bound
    column references (staged once per row), never inline expression
    trees (those re-tokenize at every reference site)."""
    n_chars = F.length(text_c).cast("double")
    n_tokens = F.size(tok).cast("double")
    punct_chars = n_chars - F.length(F.regexp_replace(lo_c, PUNCT_RE, ""))
    # empty/whitespace-only docs have zero tokens/chars: every ratio is
    # guarded (under ANSI — this engine's session default — an
    # unguarded x/0 THROWS, it does not return NULL; a corrupt-doc row
    # must degrade to null scores, never fail the job)
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(tok, F.lit(0.0), lambda acc, t: acc + F.length(t))
        / n_tokens,
    )
    stop_ratio = F.when(
        F.size(dtok) > 0,
        _hits(dtok, LANG_PROFILES["en"]).cast("double") / F.size(dtok),
    )
    punct_ratio = F.when(n_chars > 0, punct_chars / n_chars)
    # composite: favor texts with some stopwords, low punctuation noise,
    # moderate token length (pure arithmetic — portable); EXPLICITLY
    # null for empty docs — both engines' least() skip nulls
    # differently, so the undefined case must not reach them
    score = F.when(
        (n_tokens > 0) & (n_chars > 0),
        F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0)))
        + F.lit(0.3) * F.least(n_tokens / 100, F.lit(1.0)),
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "mean_token_len": mean_tok_len,
        "stopword_ratio": stop_ratio,
        "quality": score,
    }


def quality_score(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features + composite score in [0,1]:
    length, token stats, punctuation ratio, stopword ratio."""
    # stage the token arrays so they evaluate once per row (inlined
    # expression trees re-tokenize at every reference site)
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(content_col).alias("__text"),
        F.lower(F.col(content_col)).alias("__lo"),
        tokens(F.col(content_col)).alias("__tok"),
        F.array_distinct(tokens(F.col(content_col))).alias("__dtok"),
    )
    q = quality_exprs(
        F.col("__text"), F.col("__lo"), F.col("__tok"), F.col("__dtok")
    )
    return staged.select(
        "doc_id",
        q["n_chars"].alias("n_chars"),
        q["n_tokens"].alias("n_tokens"),
        q["punct_ratio"].alias("punct_ratio"),
        q["mean_token_len"].alias("mean_token_len"),
        q["stopword_ratio"].alias("stopword_ratio"),
        q["quality"].alias("quality"),
    )


def token_counts(df: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + regex (BPE-ish letter/digit-run) count +
    distinct token count."""
    tok = tokens(F.col(content_col))
    words = F.regexp_extract_all(F.lower(F.col(content_col)), F.lit(WORD_RE), 0)
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tok).alias("n_ws_tokens"),
        F.size(words).alias("n_re_tokens"),
        F.size(F.array_distinct(tok)).alias("n_distinct_tokens"),
    )


def normalize_text(
    df: DataFrame,
    content_col: str = "text",
    out_col: str | None = None,
    form: str = "NFC",
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
    ascii_whitespace: bool = True,
) -> DataFrame:
    """Corpus text normalization — the standard pre-dedup/pre-tokenize
    cleanup: Unicode normal form (NFC default), optional lowercasing,
    control-character strip, whitespace collapse. Pure stdlib
    (unicodedata) over Arrow batches — vectorized pandas `.str` ops, no
    external package, map-side only.

    ascii_whitespace=True (default) collapses/strips the explicit ASCII
    class ``[ \\t\\n\\r\\f\\v]`` — the portable subset the DuckDB/RE2
    oracle evaluates identically (Python's ``\\s`` additionally matches
    Unicode spaces like U+00A0, which RE2's does not). Pass False for
    full Unicode whitespace collapse when cross-engine parity doesn't
    matter."""
    import unicodedata

    from pyspark.sql.types import StringType, StructField, StructType

    out = out_col or content_col
    schema = StructType(
        [f for f in df.schema if f.name != out] + [StructField(out, StringType())]
    )
    passthrough = [f.name for f in df.schema if f.name != out]
    ws = r"[ \t\n\r\f\v]+" if ascii_whitespace else r"\s+"
    strip_chars = " \t\n\r\f\v" if ascii_whitespace else None

    def compute(batches):
        for pdf in batches:
            s = pdf[content_col].map(
                lambda t: unicodedata.normalize(form, t) if t is not None else None
            )
            if strip_control:
                s = s.str.replace(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", regex=True)
            if lowercase:
                s = s.str.lower()
            if collapse_whitespace:
                s = s.str.replace(ws, " ", regex=True).str.strip(strip_chars)
            res = pdf[passthrough].copy()
            res[out] = s
            yield res

    return df.mapInPandas(compute, schema)


def unigram_lm_score(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 65_536,
    alpha: float = 1.0,
) -> DataFrame:
    """LM-based quality score: mean per-token log-probability under the
    corpus's OWN add-α-smoothed unigram model (perplexity =
    exp(−lm_logprob)) — the standard model-based quality filter one rung
    above the heuristic ``quality_score``.

    Distributed plan: one token-count aggregation (map-side partial),
    vocabulary capped to the top ``vocab_cap`` tokens by (count desc,
    token asc) so the log-prob table always broadcasts; OOV tokens take
    the smoothed floor α/(N + α(V+1)). Per-token log-probs round to 6dp
    and ride EXACT integer micro-unit carriers through the per-doc sum,
    so the mean is partition-order independent (the same
    decimal-carrier convention as the era-OLS oracle machinery).

    Output: (doc_id, n_tokens, lm_logprob); empty docs → null score."""
    tok = tokens(F.col(content_col))
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tok).alias("t")
    )
    counts = exploded.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(vocab_cap)
    # N (total corpus tokens) and V (kept vocab) are tiny exact scalars
    totals = counts.agg(F.sum("c").alias("n_corpus")).crossJoin(
        top.agg(F.count(F.lit(1)).alias("v"))
    )
    denom = F.col("n_corpus").cast("double") + F.lit(alpha) * (
        F.col("v").cast("double") + 1.0
    )
    lp = top.crossJoin(F.broadcast(totals)).select(
        "t",
        F.round(F.log((F.col("c").cast("double") + F.lit(alpha)) / denom), 6).alias(
            "lp"
        ),
    )
    oov = totals.select(
        F.round(F.log(F.lit(alpha) / denom), 6).alias("lp_oov")
    )
    scored = (
        exploded.join(F.broadcast(lp), "t", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            "doc_id",
            F.coalesce(F.col("lp"), F.col("lp_oov")).alias("lp"),
        )
        # 6dp log-probs scale to exact integer micro-units: the per-doc
        # sum is order-independent, unlike a raw double sum
        .withColumn("lp_u", F.expr("CAST(round(lp * 1e6) AS BIGINT)"))
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.sum("lp_u").alias("s")
    )
    out = per_doc.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.col("s").cast("double") / 1e6 / F.col("n_tokens").cast("double"), 6
        ).alias("lm_logprob"),
    )
    # docs with zero tokens never appear in `exploded` — re-attach with null
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "lm_logprob",
        )
    )


def unigram_lm_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    vocab_cap: int = 65_536,
    alpha: float = 1.0,
) -> str:
    """DuckDB mirror of :func:`unigram_lm_score` — identical capped
    vocabulary order, add-α smoothing, 6dp log-probs on exact
    micro-unit carriers."""
    from centimators_spark.text.portable import sql_tokens

    tok = sql_tokens(content_sql)
    a = repr(float(alpha))
    return f"""
        WITH ex AS (
          SELECT {id_sql} AS doc_id, unnest({tok}) AS t FROM {table}
        ), counts AS (
          SELECT t, count(*) AS c FROM ex GROUP BY t
        ), top AS (
          SELECT t, c FROM counts ORDER BY c DESC, t ASC LIMIT {vocab_cap}
        ), totals AS (
          SELECT (SELECT sum(c) FROM counts) AS n_corpus,
                 (SELECT count(*) FROM top) AS v
        ), lp AS (
          SELECT t, round(ln((CAST(c AS DOUBLE) + {a})
            / (CAST(n_corpus AS DOUBLE) + {a} * (CAST(v AS DOUBLE) + 1.0))), 6)
            AS lp
          FROM top CROSS JOIN totals
        ), oov AS (
          SELECT round(ln({a}
            / (CAST(n_corpus AS DOUBLE) + {a} * (CAST(v AS DOUBLE) + 1.0))), 6)
            AS lp_oov
          FROM totals
        ), scored AS (
          SELECT ex.doc_id,
            CAST(round(coalesce(lp.lp, oov.lp_oov) * 1e6) AS BIGINT) AS lp_u
          FROM ex LEFT JOIN lp ON ex.t = lp.t CROSS JOIN oov
        ), per_doc AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 round(CAST(sum(lp_u) AS DOUBLE) / 1e6 / count(*), 6)
                   AS lm_logprob
          FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens, p.lm_logprob
        FROM (SELECT {id_sql} AS doc_id FROM {table}) d
        LEFT JOIN per_doc p USING (doc_id)
    """


def normalize_text_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_control: bool = True,
) -> str:
    """DuckDB mirror of :func:`normalize_text` (NFC form) — DuckDB's
    ``nfc_normalize`` implements the same Unicode normal form as
    Python's ``unicodedata.normalize('NFC', …)``; the control-strip and
    whitespace-collapse regexes are the identical patterns (ASCII
    classes, portable across RE2/Java/Python regex)."""
    s = f"nfc_normalize({content_sql})"
    if strip_control:
        s = (
            f"regexp_replace({s}, "
            "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')"
        )
    if lowercase:
        s = f"lower({s})"
    if collapse_whitespace:
        # the explicit ASCII class (not RE2's '\s', which lacks \x0b)
        # mirrors normalize_text's ascii_whitespace=True contract
        s = f"trim(regexp_replace({s}, '[ \\t\\n\\r\\f\\x0b]+', ' ', 'g'))"
    return f"SELECT {id_sql} AS doc_id, {s} AS text FROM {table}"


ENTROPY_CHAR_RE = "[a-z0-9]"  # portable char class (Java/RE2/Python identical)
ENTROPY_SCALE = 1_000_000


def char_entropy(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character-level Shannon entropy (nats) over lowercase [a-z0-9] —
    the classic gibberish/boilerplate signal: natural text sits near the
    language's character entropy, keyboard mash and repeated filler
    fall well below or above.

    Exactness: per-(doc, char) counts are exact integers; each char's
    log-probability rounds to 6dp micro-units, multiplies by its exact
    count, and sums as integers (partition-order independent), so the
    DuckDB oracle (char_entropy_oracle_sql) is bit-exact. Plan: one
    explode + two aggregations sharing the doc_id key; the alphabet is
    ≤36 so per-doc state is tiny. Returns (doc_id, n_alpha_chars,
    n_distinct_chars, entropy) with nulls for docs with no matching
    characters."""
    from pyspark.sql import Window

    counts = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(content_col)), F.lit(ENTROPY_CHAR_RE), 0
                )
            ).alias("ch"),
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    terms = counts.select(
        "doc_id",
        "c",
        (
            F.col("c")
            * F.round(
                F.log(F.col("c").cast("double") / n.cast("double"))
                * ENTROPY_SCALE
            ).cast("long")
        ).alias("term_u"),
    )
    per_doc = terms.groupBy("doc_id").agg(
        F.sum("c").alias("n_alpha_chars"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.sum("term_u").alias("s"),
    )
    scored = per_doc.select(
        "doc_id",
        "n_alpha_chars",
        "n_distinct_chars",
        F.round(
            -F.col("s").cast("double")
            / F.col("n_alpha_chars").cast("double")
            / ENTROPY_SCALE,
            6,
        ).alias("entropy"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_alpha_chars"), F.lit(0)).alias("n_alpha_chars"),
            F.coalesce(F.col("n_distinct_chars"), F.lit(0)).alias(
                "n_distinct_chars"
            ),
            "entropy",
        )
    )


def char_entropy_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`char_entropy` — identical char class,
    6dp micro-unit log-prob carrier, and integer term sums."""
    return f"""
        WITH ex AS (
          SELECT {id_sql} AS doc_id,
                 unnest(regexp_extract_all(lower({content_sql}),
                        '{ENTROPY_CHAR_RE}')) AS ch
          FROM {table}
        ), counts AS (
          SELECT doc_id, ch, count(*) AS c FROM ex GROUP BY 1, 2
        ), terms AS (
          SELECT doc_id, c,
                 c * CAST(round(ln(CAST(c AS DOUBLE)
                   / CAST(sum(c) OVER (PARTITION BY doc_id) AS DOUBLE))
                   * {ENTROPY_SCALE}) AS BIGINT) AS term_u
          FROM counts
        ), per_doc AS (
          SELECT doc_id, sum(c) AS n_alpha_chars,
                 count(*) AS n_distinct_chars, sum(term_u) AS s
          FROM terms GROUP BY 1
        )
        SELECT d.doc_id,
               CAST(coalesce(p.n_alpha_chars, 0) AS BIGINT) AS n_alpha_chars,
               CAST(coalesce(p.n_distinct_chars, 0) AS BIGINT)
                 AS n_distinct_chars,
               round(-CAST(p.s AS DOUBLE) / CAST(p.n_alpha_chars AS DOUBLE)
                 / {ENTROPY_SCALE}, 6) AS entropy
        FROM (SELECT {id_sql} AS doc_id FROM {table}) d
        LEFT JOIN per_doc p USING (doc_id)
    """


def document_fingerprint(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Winnowing-style fingerprint: the two smallest distinct n-gram
    hashes + gram count (stable, portable content signature).
    Vectorized Arrow/numpy path (see text/hashing_udf.py)."""
    from centimators_spark.text.hashing_udf import gram_hash_extrema_udf

    return gram_hash_extrema_udf(df, content_col, id_col, n)


def bigram_lm_score(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 65_536,
    alpha: float = 1.0,
    lam_num: int = 8,
    lam_den: int = 10,
) -> DataFrame:
    """Interpolated bigram-LM quality score — the model-based filter
    one rung above :func:`unigram_lm_score`: mean adjacent-pair
    log-probability under λ·P(w₂|w₁) + (1−λ)·P_uni(w₂), trained on
    the corpus itself. OOV tokens map to the '<unk>' class BEFORE any
    counting, so every model table is over the closed (capped)
    vocabulary and no separate OOV branch exists; λ is a RATIONAL
    (integer literals — never 1 − float).

    Exactness: P_bigram is the exact integer ratio B(w₁,w₂)/U(w₁)
    (unseen pair → 0; the unigram term keeps the log finite);
    P_uni = (U(w₂)+α)/(N+α·V). Per-pair log-probs round to 6dp and
    ride integer micro-unit carriers through the per-doc sum
    (partition-order independent — the unigram_lm discipline).

    Plan at 100 TB: one posexplode scan; OOV mapping and the unigram
    probability table are BROADCAST joins (vocab_cap-bounded); pair
    construction is one lead() window partitioned BY DOC (never
    global); the only corpus-sized shuffle is the pairs ⇄ bigram-count
    join on (w₁, w₂) — the irreducible LM-training shuffle, the
    bpe_pair_merges class.

    Output: (doc_id, n_pairs, bigram_logprob); docs with < 2 tokens →
    n_pairs 0, null score."""
    from pyspark.sql import Window as _W

    tok = tokens(F.col(content_col))
    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tok).alias("pos", "t"),
    )
    counts = ex.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(vocab_cap)
    mapped = (
        ex.join(
            F.broadcast(top.select(F.col("t").alias("__kept"))),
            F.col("t") == F.col("__kept"),
            "left",
        )
        .select(
            "doc_id",
            "pos",
            F.when(F.col("__kept").isNull(), F.lit("<unk>"))
            .otherwise(F.col("t"))
            .alias("t"),
        )
    )
    uni = mapped.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("u")
    )
    totals = uni.agg(
        F.sum("u").cast("long").alias("n_corpus"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    w = _W.partitionBy("doc_id").orderBy("pos")
    pairs = mapped.select(
        "doc_id",
        F.col("t").alias("w1"),
        F.lead("t", 1).over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    big = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("b")
    )
    denom = F.col("n_corpus").cast("double") + F.lit(alpha) * F.col(
        "v"
    ).cast("double")
    pu = uni.crossJoin(F.broadcast(totals)).select(
        F.col("t").alias("w2"),
        ((F.col("u").cast("double") + F.lit(alpha)) / denom).alias("p_u"),
    )
    u1 = uni.select(F.col("t").alias("w1"), F.col("u").alias("u1"))
    lp = (
        pairs.join(big, ["w1", "w2"])
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(pu), "w2")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (
                        F.lit(lam_num)
                        * (F.col("b").cast("double") / F.col("u1").cast("double"))
                        + F.lit(lam_den - lam_num) * F.col("p_u")
                    )
                    / F.lit(lam_den)
                ),
                6,
            ).alias("lp"),
        )
        .withColumn("lp_u", F.expr("CAST(round(lp * 1e6) AS BIGINT)"))
    )
    per_doc = lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("lp_u").alias("s"),
    )
    out = per_doc.select(
        "doc_id",
        "n_pairs",
        F.round(
            F.col("s").cast("double") / 1e6 / F.col("n_pairs").cast("double"),
            6,
        ).alias("bigram_logprob"),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(out, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias(
                "n_pairs"
            ),
            "bigram_logprob",
        )
    )


def bigram_lm_oracle_sql(
    table: str = "documents",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    vocab_cap: int = 65_536,
    alpha: float = 1.0,
    lam_num: int = 8,
    lam_den: int = 10,
) -> str:
    """DuckDB mirror of :func:`bigram_lm_score` — identical capped
    vocab, '<unk>' mapping, integer bigram ratios, rational λ, 6dp
    micro-unit carriers."""
    from centimators_spark.text.portable import sql_tokens

    tk = sql_tokens(content_sql)
    a = repr(float(alpha))
    mu = lam_den - lam_num
    return f"""
        WITH toks AS (
          SELECT {id_sql} AS doc_id, {tk} AS tk FROM {table}
        ), ex AS (
          SELECT doc_id, i AS pos, tk[i] AS t
          FROM toks, unnest(range(1, len(tk) + 1)) AS r(i)
        ), counts AS (
          SELECT t, count(*) AS c FROM ex GROUP BY t
        ), top AS (
          SELECT t FROM counts ORDER BY c DESC, t ASC LIMIT {vocab_cap}
        ), mapped AS (
          SELECT ex.doc_id, ex.pos,
                 CASE WHEN top.t IS NULL THEN '<unk>' ELSE ex.t END AS t
          FROM ex LEFT JOIN top ON ex.t = top.t
        ), uni AS (
          SELECT t, CAST(count(*) AS BIGINT) AS u FROM mapped GROUP BY t
        ), totals AS (
          SELECT CAST(sum(u) AS BIGINT) AS n_corpus,
                 CAST(count(*) AS BIGINT) AS v
          FROM uni
        ), pairs AS (
          SELECT doc_id, t AS w1,
                 lead(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
          FROM mapped QUALIFY w2 IS NOT NULL
        ), big AS (
          SELECT w1, w2, CAST(count(*) AS BIGINT) AS b
          FROM pairs GROUP BY w1, w2
        ), lp AS (
          SELECT p.doc_id,
            CAST(round(round(ln((
              {lam_num} * (CAST(big.b AS DOUBLE) / CAST(u1.u AS DOUBLE))
              + {mu} * ((CAST(u2.u AS DOUBLE) + {a})
                        / (CAST(t2.n_corpus AS DOUBLE)
                           + {a} * CAST(t2.v AS DOUBLE)))
            ) / {lam_den}), 6) * 1e6) AS BIGINT) AS lp_u
          FROM pairs p
          JOIN big ON p.w1 = big.w1 AND p.w2 = big.w2
          JOIN uni u1 ON p.w1 = u1.t
          JOIN uni u2 ON p.w2 = u2.t
          CROSS JOIN totals t2
        ), per_doc AS (
          SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
                 round(CAST(sum(lp_u) AS DOUBLE) / 1e6 / count(*), 6)
                   AS bigram_logprob
          FROM lp GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_pairs, 0) AS n_pairs,
               p.bigram_logprob
        FROM (SELECT {id_sql} AS doc_id FROM {table}) d
        LEFT JOIN per_doc p USING (doc_id)
    """
