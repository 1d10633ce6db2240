"""Exact duplicated-substring span detection — the token-run
counterpart of line-level span dedup (text/span_dedup.py) and the
relational form of suffix-array substring dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"; reference
scope: the engine's dedup surface, e.g.
/root/reference/src/centimators/).

A token run of length >= L that appears anywhere else in the corpus
(another doc, or again in the same doc) is a duplicated span. The
suffix-array construction is replaced by the equivalent fixed-L
relational form:

1. positional L-grams per doc (the winnowing explode) -> portable
   md5 hash;
2. global occurrence count per hash — positions whose gram occurs
   more than once in the corpus are DUPLICATED positions (exactly
   the positions a suffix array would mark for run length L);
3. per doc, merge overlapping duplicated positions into MAXIMAL
   spans: two duplicated L-gram positions overlap iff their gap is
   <= L - 1, so an islands-and-gaps pass (lag + cumulative new-island
   flags) yields the maximal merged spans, each covering
   (p_max - p_min + L) tokens.

Output per doc: n_dup_spans, n_dup_tokens (union coverage, exact),
n_tokens — the per-document duplication profile a corpus-cleaning
pass thresholds on.

Exactness: positions, counts, and coverage are plain integers; the
hash is the portable md5 — the whole profile is hash-proven against
the DuckDB twin.

Scale: one explode (linear), one count agg on the gram hash, one
hash-keyed join back, then per-doc windows (one shuffle on the doc
key). No pair join at all — cost is independent of HOW duplicated
the corpus is, unlike pair-output detectors (minhash/winnowing):
this is the operator you run when duplication is heavy."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.text.portable import (
    md5_long,
    sql_md5_long,
    sql_tokens,
    tokens,
)

SUBSTR_L = 8  # duplicated-run threshold, tokens


def duplicated_spans(
    df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    L: int = SUBSTR_L,
) -> DataFrame:
    """(doc_id, n_tokens, n_dup_spans, n_dup_tokens): maximal merged
    spans of tokens covered by some corpus-duplicated L-gram."""
    from centimators_spark.text.portable import token_ngrams_all

    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(content_col)).alias("__tok"),
    )
    tok = F.col("__tok")
    lengths = staged.select(
        "doc_id", F.size(tok).cast("long").alias("n_tokens")
    )
    # positional L-grams via the pushdown-robust zipped-slices form
    # (portable.token_ngrams_all), pinned ONCE (r13): the duplicated-
    # hash count and the position join each re-ran the explode+md5
    # derivation; a window-count alternative would avoid the pin but
    # concentrates a heavy-duplicated gram into one task — the
    # map-side-combined count agg is the skew-robust shape for exactly
    # the regime this operator exists for.
    grams = (
        staged.select(
            "doc_id",
            F.posexplode(token_ngrams_all(tok, L)).alias("pos", "gram"),
        )
        .select("doc_id", "pos", md5_long(F.col("gram")).alias("h"))
        .localCheckpoint(eager=True)
    )
    dup_h = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select("h")
    )
    dup_pos = grams.join(dup_h, "h").select("doc_id", "pos")
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    islands = (
        dup_pos.withColumn("__prev", F.lag("pos").over(w_doc))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("pos") - F.col("__prev") > L - 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__isl", F.sum("__new").over(w_doc))
    )
    spans = islands.groupBy("doc_id", "__isl").agg(
        (F.max("pos") - F.min("pos") + F.lit(L))
        .cast("long")
        .alias("__cov")
    )
    profile = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum("__cov").cast("long").alias("n_dup_tokens"),
    )
    z = F.lit(0).cast("long")
    return lengths.join(profile, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_spans", z).alias("n_dup_spans"),
        F.coalesce("n_dup_tokens", z).alias("n_dup_tokens"),
    )


SUBSTR_LS = (8, 16, 32)
_MIX_P = 1_000_003
_MOD60 = 1 << 60


def _mix(a, b):
    """Portable 60-bit hash combine: (a·P + b) mod 2^60 in exact
    decimal arithmetic — equality of the combined fingerprints is
    equality of the two underlying token runs (modulo the same md5
    collision budget every gram consumer already accepts). NULL
    propagates (a run extending past the doc tail has no fingerprint)."""
    d38 = "decimal(38,0)"
    return F.pmod(
        a.cast(d38) * F.lit(_MIX_P).cast(d38) + b.cast(d38),
        F.lit(_MOD60).cast(d38),
    ).cast("long")


def duplicated_spans_multi(
    df: DataFrame,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    Ls: tuple[int, ...] = SUBSTR_LS,
) -> DataFrame:
    """Multi-resolution duplicated-substring profile — the fixed-L
    form of :func:`duplicated_spans` at EVERY L in ``Ls`` (each level
    double the previous) from ONE scan: span boundaries no longer
    quantize to a single gram size (r10 verdict item 4).

    The corpus is tokenized and md5-hashed ONCE at the base length
    L0; the length-2L fingerprint at position p is the exact integer
    combine of the two length-L fingerprints at p and p+L
    (``lead(h, L)`` over the per-doc position window — positions are
    contiguous, so the lead IS the neighbor gram), recursively up the
    chain. One explode, one md5 pass, ONE (L, h) duplicate-count
    aggregation and ONE join back for all levels, then the per-level
    islands-and-gaps merge in a shared (doc, L) window family.

    Output: (doc_id, L, n_tokens, n_dup_spans, n_dup_tokens) — one
    row per doc per level. Still NO pair join: cost independent of
    corpus duplication, ~3× the single-L operator's hash table, not
    3× its scans."""
    from centimators_spark.text.portable import token_ngrams_all

    if len(Ls) < 1 or any(
        Ls[i + 1] != 2 * Ls[i] for i in range(len(Ls) - 1)
    ):
        raise ValueError("Ls must be a doubling chain, e.g. (8, 16, 32)")
    L0 = Ls[0]
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(content_col)).alias("__tok"),
    )
    tok = F.col("__tok")
    lengths = staged.select(
        "doc_id", F.size(tok).cast("long").alias("n_tokens")
    )
    grams = staged.select(
        "doc_id",
        F.posexplode(token_ngrams_all(tok, L0)).alias("pos", "gram"),
    ).select("doc_id", "pos", md5_long(F.col("gram")).alias("__h0"))
    w_lead = Window.partitionBy("doc_id").orderBy("pos")
    for i in range(1, len(Ls)):
        grams = grams.withColumn(
            f"__h{i}",
            _mix(
                F.col(f"__h{i - 1}"),
                F.lead(f"__h{i - 1}", Ls[i - 1]).over(w_lead),
            ),
        )
    levels = grams.select(
        "doc_id",
        "pos",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("long").alias("L"),
                        F.col(f"__h{i}").alias("h"),
                    )
                    for i, L in enumerate(Ls)
                ]
            )
        ).alias("lv"),
    ).select(
        "doc_id", "pos", F.col("lv.L").alias("L"), F.col("lv.h").alias("h")
    ).where(F.col("h").isNotNull())
    # pinned ONCE (r13): the duplicate-count agg and the position join
    # each re-ran the explode + md5 + lead-window combine chain — the
    # most expensive part of the plan — as the duplicated_spans pin
    levels = levels.localCheckpoint(eager=True)
    dup_h = (
        levels.groupBy("L", "h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select("L", "h")
    )
    dup_pos = levels.join(dup_h, ["L", "h"]).select("doc_id", "L", "pos")
    w_doc = Window.partitionBy("doc_id", "L").orderBy("pos")
    islands = (
        dup_pos.withColumn("__prev", F.lag("pos").over(w_doc))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("pos") - F.col("__prev") > F.col("L") - 1),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("__isl", F.sum("__new").over(w_doc))
    )
    spans = islands.groupBy("doc_id", "L", "__isl").agg(
        (F.max("pos") - F.min("pos") + F.col("L").cast("long"))
        .alias("__cov")
    )
    profile = spans.groupBy("doc_id", "L").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum("__cov").cast("long").alias("n_dup_tokens"),
    )
    z = F.lit(0).cast("long")
    spine = lengths.select(
        "doc_id",
        "n_tokens",
        F.explode(
            F.array(*[F.lit(L).cast("long") for L in Ls])
        ).alias("L"),
    )
    return spine.join(profile, ["doc_id", "L"], "left").select(
        "doc_id",
        "L",
        "n_tokens",
        F.coalesce("n_dup_spans", z).alias("n_dup_spans"),
        F.coalesce("n_dup_tokens", z).alias("n_dup_tokens"),
    )


def duplicated_spans_multi_oracle_sql(
    table: str = "documents",
    *,
    content_sql: str = "text",
    id_sql: str = "doc_id",
    Ls: tuple[int, ...] = SUBSTR_LS,
) -> str:
    """DuckDB mirror of :func:`duplicated_spans_multi`: identical base
    grams, identical lead-combine chain in HUGEINT, identical gap
    rule per level."""
    L0 = Ls[0]
    joined = " || ' ' || ".join(
        f"tk[i+{j}]" for j in range(L0)
    ).replace("[i+0]", "[i]")
    lvl_ctes = []
    prev = "grams"
    for i in range(1, len(Ls)):
        a, b = f"h{i - 1}", f"h{i}"
        keep = ", ".join(f"h{j}" for j in range(i))
        lvl_ctes.append(
            f"""lvl{i} AS (
          SELECT doc_id, pos, {keep},
                 (CAST({a} AS HUGEINT) * {_MIX_P}
                  + lead({a}, {Ls[i - 1]}) OVER (
                      PARTITION BY doc_id ORDER BY pos)) % {_MOD60}
                   AS {b}
          FROM {prev}
        )"""
        )
        prev = f"lvl{i}"
    unions = "\n          UNION ALL ".join(
        f"SELECT doc_id, pos, CAST({L} AS BIGINT) AS L,"
        f" CAST(h{i} AS BIGINT) AS h FROM {prev} WHERE h{i} IS NOT NULL"
        for i, L in enumerate(Ls)
    )
    l_vals = ", ".join(f"({L})" for L in Ls)
    cte_sql = ",\n        ".join(lvl_ctes)
    if cte_sql:
        cte_sql = cte_sql + ","
    return f"""
        WITH docs AS (
          SELECT {id_sql} AS doc_id, {sql_tokens(content_sql)} AS tk
          FROM {table}
        ), lengths AS (
          SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM docs
        ), grams AS (
          SELECT doc_id, i - 1 AS pos, {sql_md5_long(joined)} AS h0
          FROM docs
          CROSS JOIN unnest(range(1, len(tk) - {L0 - 2})) AS t(i)
        ),
        {cte_sql}
        levels AS (
          {unions}
        ), dup_h AS (
          SELECT L, h FROM levels GROUP BY L, h HAVING count(*) > 1
        ), dup_pos AS (
          SELECT g.doc_id, g.L, g.pos
          FROM levels g JOIN dup_h USING (L, h)
        ), islands AS (
          SELECT doc_id, L, pos,
                 sum(CASE WHEN prev IS NULL
                          OR pos - prev > L - 1
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id, L ORDER BY pos) AS isl
          FROM (
            SELECT doc_id, L, pos,
                   lag(pos) OVER (PARTITION BY doc_id, L ORDER BY pos)
                     AS prev
            FROM dup_pos
          )
        ), spans AS (
          SELECT doc_id, L, isl,
                 CAST(max(pos) - min(pos) + L AS BIGINT) AS cov
          FROM islands GROUP BY doc_id, L, isl
        ), profile AS (
          SELECT doc_id, L,
                 CAST(count(*) AS BIGINT) AS n_dup_spans,
                 CAST(sum(cov) AS BIGINT) AS n_dup_tokens
          FROM spans GROUP BY doc_id, L
        ), spine AS (
          SELECT l.doc_id, l.n_tokens, CAST(v.L AS BIGINT) AS L
          FROM lengths l CROSS JOIN (VALUES {l_vals}) v(L)
        )
        SELECT s.doc_id, s.L, s.n_tokens,
               CAST(coalesce(p.n_dup_spans, 0) AS BIGINT)
                 AS n_dup_spans,
               CAST(coalesce(p.n_dup_tokens, 0) AS BIGINT)
                 AS n_dup_tokens
        FROM spine s LEFT JOIN profile p
          ON s.doc_id = p.doc_id AND s.L = p.L
    """


def duplicated_spans_oracle_sql(
    table: str = "documents",
    *,
    content_sql: str = "text",
    id_sql: str = "doc_id",
    L: int = SUBSTR_L,
) -> str:
    """DuckDB mirror: identical positional grams, identical md5,
    identical gap rule and island merge."""
    joined = " || ' ' || ".join(f"tk[i+{j}]" for j in range(L)).replace(
        "[i+0]", "[i]"
    )
    return f"""
        WITH docs AS (
          SELECT {id_sql} AS doc_id, {sql_tokens(content_sql)} AS tk
          FROM {table}
        ), lengths AS (
          SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM docs
        ), grams AS (
          SELECT doc_id, i - 1 AS pos, {sql_md5_long(joined)} AS h
          FROM docs
          CROSS JOIN unnest(range(1, len(tk) - {L - 2})) AS t(i)
        ), dup_h AS (
          SELECT h FROM grams GROUP BY h HAVING count(*) > 1
        ), dup_pos AS (
          SELECT g.doc_id, g.pos FROM grams g JOIN dup_h USING (h)
        ), islands AS (
          SELECT doc_id, pos,
                 sum(CASE WHEN prev IS NULL
                          OR pos - prev > {L - 1}
                     THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos) AS isl
          FROM (
            SELECT doc_id, pos,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                     AS prev
            FROM dup_pos
          )
        ), spans AS (
          SELECT doc_id, isl,
                 CAST(max(pos) - min(pos) + {L} AS BIGINT) AS cov
          FROM islands GROUP BY doc_id, isl
        ), profile AS (
          SELECT doc_id,
                 CAST(count(*) AS BIGINT) AS n_dup_spans,
                 CAST(sum(cov) AS BIGINT) AS n_dup_tokens
          FROM spans GROUP BY doc_id
        )
        SELECT l.doc_id, l.n_tokens,
               CAST(coalesce(p.n_dup_spans, 0) AS BIGINT)
                 AS n_dup_spans,
               CAST(coalesce(p.n_dup_tokens, 0) AS BIGINT)
                 AS n_dup_tokens
        FROM lengths l LEFT JOIN profile p ON l.doc_id = p.doc_id
    """
