"""Multinomial Naive Bayes over tokenized text — train AND serve as
one lazy distributed plan, bit-exact cross-engine.

The reference has a linear text-quality scorer
(`text/classifier.py`) but no generative classifier; this adds the
standard corpus-labeling baseline (language/domain/source ID) a
training-data pipeline runs before mixture sampling. Reference
anchor: the same tokenizer + capped-vocabulary conventions as
`text/analysis.py:unigram_lm_score` (the repo's LM-quality filter),
extended from one corpus LM to K per-class LMs plus an argmax.

Scale design (the 100 TB shape):

- ONE (label, token) count aggregation with map-side partial
  combine; the vocabulary is capped to the global top ``vocab_cap``
  tokens by (count desc, token asc) so the per-class log-prob table
  is at most V·K rows and ALWAYS broadcasts.
- Serving is explode → broadcast-fan-out to K classes → one
  (doc, label) partial-aggregated sum — no shuffle of the corpus
  beyond the per-doc aggregation, no driver loops.
- Exactness: per-token/class log-probs round to 6dp and ride exact
  BIGINT micro-unit carriers through the per-doc-per-class sums
  (partition-order independent); the argmax compares integers, with
  ties broken by label asc — deterministic cross-engine (the
  min-struct argmin idiom, `sampling.py`/`operators/trees.py`).
- Smoothing: add-α per class over the SHARED capped vocabulary;
  out-of-vocabulary tokens take the per-class floor
  α / (N_label + α·(V+1)). Empty docs score prior-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from centimators_spark.text.portable import sql_tokens, tokens

__all__ = ["naive_bayes_classify", "naive_bayes_oracle_sql"]


def naive_bayes_classify(
    df: DataFrame,
    label_col: str,
    content_col: str = "text",
    id_col: str = "doc_id",
    vocab_cap: int = 65_536,
    alpha: float = 1.0,
) -> DataFrame:
    """Train a multinomial NB on ``df`` (label = ``label_col``) and
    score every row with its argmax class, in one lazy plan.

    Returns (doc_id, n_tokens, pred_label, score) where ``score`` is
    the winning class's total log-likelihood (prior + tokens) in 6dp
    units, exact by construction."""
    # (doc, label, token) occurrence-count cells — the ONE corpus-sized
    # aggregation, pinned (r13 optimization, the DSIR cell-table
    # pattern): the lazy exploded stream previously re-ran
    # tokenize+explode for each of its three consumers (vocab counts,
    # per-class counts, serving fan-out — 24 scans in the measured
    # plan), and the serving side fanned out every token OCCURRENCE
    # ×K classes where n·lp over distinct (doc, token) cells is the
    # identical exact-integer sum.
    cells = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(label_col).alias("y"),
            F.explode(tokens(F.col(content_col))).alias("t"),
        )
        .groupBy("doc_id", "y", "t")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # -- model: class priors ------------------------------------------
    docs = df.select(F.col(id_col).alias("doc_id"), F.col(label_col).alias("y"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    priors = (
        docs.groupBy("y")
        .agg(F.count(F.lit(1)).alias("n_y"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "y",
            F.expr("CAST(round(ln(CAST(n_y AS DOUBLE) / n_docs) * 1e6) AS BIGINT)").alias(
                "prior_u"
            ),
        )
    )
    # -- model: capped shared vocabulary + per-class token counts -----
    global_counts = cells.groupBy("t").agg(F.sum("n").alias("c"))
    vocab = (
        global_counts.orderBy(F.col("c").desc(), F.col("t").asc())
        .limit(vocab_cap)
        .select("t")
    )
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    class_counts = (
        cells.join(F.broadcast(vocab), "t")
        .groupBy("y", "t")
        .agg(F.sum("n").alias("c_yt"))
    )
    class_totals = class_counts.groupBy("y").agg(
        F.sum("c_yt").alias("n_tok_y")
    )
    a = float(alpha)
    denom = F.col("n_tok_y").cast("double") + F.lit(a) * (
        F.col("v").cast("double") + 1.0
    )
    lp = (
        class_counts.join(F.broadcast(class_totals), "y")
        .crossJoin(F.broadcast(vsize))
        .select(
            "y",
            "t",
            F.expr(
                f"CAST(round(ln((CAST(c_yt AS DOUBLE) + {a!r})"
                f" / (CAST(n_tok_y AS DOUBLE) + {a!r}"
                " * (CAST(v AS DOUBLE) + 1.0))) * 1e6) AS BIGINT)"
            ).alias("lp_u"),
        )
    )
    floors = class_totals.crossJoin(F.broadcast(vsize)).select(
        "y",
        F.expr(
            f"CAST(round(ln({a!r} / (CAST(n_tok_y AS DOUBLE) + {a!r}"
            " * (CAST(v AS DOUBLE) + 1.0))) * 1e6) AS BIGINT)"
        ).alias("floor_u"),
    )
    # -- serve: distinct (doc, token) cells fan out to K classes ------
    # n_tokens = Σ n (occurrence count) and tok_u = Σ n·lp_u — exact
    # integer identities of the old per-occurrence sum
    cand = (
        cells.select("doc_id", "t", "n")
        .join(F.broadcast(floors.select("y", "floor_u")), how="cross")
        .join(F.broadcast(lp), ["y", "t"], "left")
        .select(
            "doc_id",
            "y",
            "n",
            F.coalesce(F.col("lp_u"), F.col("floor_u")).alias("lp_u"),
        )
    )
    tok_scores = cand.groupBy("doc_id", "y").agg(
        F.sum("n").alias("n_tokens"),
        F.sum(F.col("n") * F.col("lp_u")).alias("tok_u"),
    )
    # prior-only grid so empty docs still classify (argmax prior)
    grid = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(F.broadcast(priors), how="cross")
        .join(tok_scores, ["doc_id", "y"], "left")
        .select(
            "doc_id",
            "y",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            (F.coalesce(F.col("tok_u"), F.lit(0)) + F.col("prior_u")).alias(
                "score_u"
            ),
        )
    )
    best = grid.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.min(
            F.struct((-F.col("score_u")).alias("neg"), F.col("y").alias("y"))
        ).alias("b"),
    )
    return best.select(
        "doc_id",
        "n_tokens",
        F.col("b.y").alias("pred_label"),
        F.round(F.col("b.neg").cast("double") / -1e6, 6).alias("score"),
    )


def naive_bayes_oracle_sql(
    table: str = "documents",
    label_sql: str = "lang",
    content_sql: str = "text",
    id_sql: str = "doc_id",
    vocab_cap: int = 65_536,
    alpha: float = 1.0,
) -> str:
    """DuckDB mirror of :func:`naive_bayes_classify` — identical
    tokenizer, capped-vocabulary order, smoothing, 6dp micro-unit
    carriers, and (−score, label) argmin tie-break."""
    tok = sql_tokens(content_sql)
    a = repr(float(alpha))
    return f"""
        WITH ex AS (
          SELECT {id_sql} AS doc_id, {label_sql} AS y, unnest({tok}) AS t
          FROM {table}
        ), gc AS (
          SELECT t, count(*) AS c FROM ex GROUP BY t
        ), vocab AS (
          SELECT t FROM gc ORDER BY c DESC, t ASC LIMIT {vocab_cap}
        ), vs AS (
          SELECT count(*) AS v FROM vocab
        ), priors AS (
          SELECT {label_sql} AS y,
                 CAST(round(ln(CAST(count(*) AS DOUBLE)
                 / (SELECT count(*) FROM {table})) * 1e6) AS BIGINT)
                 AS prior_u
          FROM {table} GROUP BY {label_sql}
        ), cc AS (
          SELECT y, ex.t, count(*) AS c_yt
          FROM ex JOIN vocab ON ex.t = vocab.t
          GROUP BY y, ex.t
        ), ct AS (
          SELECT y, sum(c_yt) AS n_tok_y FROM cc GROUP BY y
        ), lp AS (
          SELECT cc.y, cc.t,
                 CAST(round(ln((CAST(c_yt AS DOUBLE) + {a})
                   / (CAST(n_tok_y AS DOUBLE) + {a}
                      * (CAST(v AS DOUBLE) + 1.0))) * 1e6) AS BIGINT) AS lp_u
          FROM cc JOIN ct ON cc.y = ct.y CROSS JOIN vs
        ), floors AS (
          SELECT y, CAST(round(ln({a} / (CAST(n_tok_y AS DOUBLE) + {a}
                      * (CAST(v AS DOUBLE) + 1.0))) * 1e6) AS BIGINT)
                 AS floor_u
          FROM ct CROSS JOIN vs
        ), cand AS (
          SELECT ex.doc_id, f.y, coalesce(lp.lp_u, f.floor_u) AS lp_u
          FROM ex CROSS JOIN floors f
          LEFT JOIN lp ON lp.y = f.y AND lp.t = ex.t
        ), ts AS (
          SELECT doc_id, y, count(*) AS n_tokens, sum(lp_u) AS tok_u
          FROM cand GROUP BY doc_id, y
        ), grid AS (
          SELECT d.doc_id, p.y,
                 coalesce(ts.n_tokens, 0) AS n_tokens,
                 coalesce(ts.tok_u, 0) + p.prior_u AS score_u
          FROM (SELECT {id_sql} AS doc_id FROM {table}) d
          CROSS JOIN priors p
          LEFT JOIN ts ON ts.doc_id = d.doc_id AND ts.y = p.y
        ), ranked AS (
          SELECT doc_id, y, n_tokens, score_u,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY score_u DESC, y ASC) AS rn
          FROM grid
        )
        SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               y AS pred_label,
               round(CAST(score_u AS DOUBLE) / 1e6, 6) AS score
        FROM ranked WHERE rn = 1
    """
