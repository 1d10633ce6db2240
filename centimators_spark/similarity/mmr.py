"""Maximal-marginal-relevance diversified re-ranking (Carbonell &
Goldstein 1998): greedily pick k results maximizing
λ·rel(q, d) − (1−λ)·max_{s∈S} sim(d, s) — the standard diversity
re-rank every retrieval stack runs after its similarity shortlist
(the greedy sibling of similarity/fusion.rrf_fuse).

Exactness discipline: λ is a RATIONAL (num/den integer literals —
`1 - 0.7` in Python is 0.30000000000000004, not the SQL literal 0.3,
so weights are never derived by float subtraction); every cosine is
rounded to 6dp before use and the step score once more, so the argmax
(ties broken by ascending id) is bit-identical to the SQL oracle.

Scale: MMR is inherently sequential in k, but each step is ONE scan
of the (per-query bounded) candidate pool joined against the selected
set so far — pool and selections stay O(queries × shortlist), the
argmax collect returns one row per query per step (the
literal-centroid discipline), and queries parallelize freely. At
100 TB the pool per query is still a shortlist (top-20 here); the
corpus-sized work already happened in the ANN stage that built it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.similarity.ann import cosine


def mmr_diversify(
    pool: DataFrame,
    k: int = 5,
    *,
    lam_num: int = 7,
    lam_den: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    vec_col: str = "vv",
    rel_col: str = "rel",
    dim: int | None = None,
) -> DataFrame:
    """Greedy MMR over a per-query candidate pool.

    pool: (query_id, vec_id, vv array<double>, rel double) — rel
    already rounded 6dp (e.g. the rounded cosine from
    similarity.ann.brute_force_topk). Returns (query_id, pick,
    vec_id, mmr) with pick = 1..k; pick 1's mmr is rel itself.
    Score: round((lam_num·rel − (lam_den−lam_num)·max_sim)/lam_den, 6)
    with max_sim = max over selected of round(cos, 6)."""
    q, i, v, r = query_id_col, id_col, vec_col, rel_col
    pool = pool.select(q, i, v, r).localCheckpoint(eager=True)
    spark = pool.sparkSession
    key_schema = pool.select(q, i).schema
    picked: list[tuple] = []  # (query_id, pick, vec_id, mmr)

    def _picked_keys() -> DataFrame:
        # broadcast (query_id, vec_id) key frame instead of an O(n·k)
        # literal OR-chain re-planned (and applied twice) every step —
        # predicate size stays constant however many queries fan out
        return spark.createDataFrame(
            [(pq, pi) for pq, _, pi, _ in picked], key_schema
        )

    for t in range(1, int(k) + 1):
        if not picked:
            scored = pool.select(q, i, F.col(r).alias("mmr"))
        else:
            keys = F.broadcast(_picked_keys())
            sel = pool.join(keys, [q, i]).select(
                F.col(q).alias("__sq"), F.col(v).alias("__sv")
            )
            cand = pool.join(keys, [q, i], "left_anti")
            sims = cand.join(
                F.broadcast(sel), cand[q] == F.col("__sq")
            ).select(
                q,
                i,
                r,
                F.round(cosine(F.col(v), F.col("__sv"), dim), 6).alias(
                    "__sim"
                ),
            )
            scored = (
                sims.groupBy(q, i, r)
                .agg(F.max("__sim").alias("__ms"))
                .select(
                    q,
                    i,
                    F.round(
                        (
                            F.lit(lam_num) * F.col(r)
                            - F.lit(lam_den - lam_num) * F.col("__ms")
                        )
                        / F.lit(lam_den),
                        6,
                    ).alias("mmr"),
                )
            )
        w = Window.partitionBy(q).orderBy(
            F.col("mmr").desc(), F.col(i).asc()
        )
        top = (
            scored.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .collect()
        )
        if not top:
            break
        for row in top:
            picked.append((row[q], t, row[i], float(row["mmr"])))
    return spark.createDataFrame(
        sorted(picked),
        f"{q} long, pick long, {i} long, mmr double",
    )


def mmr_oracle_sql(
    *,
    n_queries: int,
    pool_k: int,
    k: int,
    lam_num: int = 7,
    lam_den: int = 10,
    cos_macro=None,
) -> str:
    """DuckDB mirror of the embeddings-table MMR query: the greedy
    steps unroll as chained CTEs; each step's candidates exclude the
    accumulated selection and score against its embeddings."""
    from centimators_spark.plans.datapipe_queries import _cos

    c = cos_macro or _cos
    mu = lam_den - lam_num
    ctes = [
        "e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"q AS (SELECT vec_id AS query_id, v AS qv FROM e"
        f" WHERE vec_id < {n_queries})",
        f"""scored AS (
          SELECT q.query_id, e.vec_id, {c('q.qv', 'e.v')} AS cos, e.v
          FROM e CROSS JOIN q WHERE e.vec_id <> q.query_id
        )""",
        f"""pool AS (
          SELECT query_id, vec_id, round(cos, 6) AS rel, v
          FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos DESC, vec_id) AS rn FROM scored)
          WHERE rn <= {pool_k}
        )""",
        """p1 AS (
          SELECT query_id, vec_id, rel AS mmr
          FROM (SELECT query_id, vec_id, rel, row_number() OVER (
                  PARTITION BY query_id ORDER BY rel DESC, vec_id) AS rn
                FROM pool)
          WHERE rn = 1
        )""",
        "sel1 AS (SELECT query_id, vec_id FROM p1)",
    ]
    for t in range(2, int(k) + 1):
        p = t - 1
        ctes.append(
            f"""m{t} AS (
          SELECT c.query_id, c.vec_id,
                 round(({lam_num} * c.rel - {mu} *
                        max(round({c('c.v', 's.v')}, 6))) / {lam_den},
                       6) AS mmr
          FROM pool c
          JOIN (SELECT x.query_id, x.vec_id, p2.v FROM sel{p} x
                JOIN pool p2 ON x.query_id = p2.query_id
                 AND x.vec_id = p2.vec_id) s
            ON c.query_id = s.query_id
          WHERE NOT EXISTS (SELECT 1 FROM sel{p} z
                            WHERE z.query_id = c.query_id
                              AND z.vec_id = c.vec_id)
          GROUP BY c.query_id, c.vec_id, c.rel
        )"""
        )
        ctes.append(
            f"""p{t} AS (
          SELECT query_id, vec_id, mmr
          FROM (SELECT query_id, vec_id, mmr, row_number() OVER (
                  PARTITION BY query_id ORDER BY mmr DESC, vec_id) AS rn
                FROM m{t})
          WHERE rn = 1
        )"""
        )
        ctes.append(
            f"sel{t} AS (SELECT * FROM sel{p} UNION ALL"
            f" SELECT query_id, vec_id FROM p{t})"
        )
    selects = " UNION ALL ".join(
        f"SELECT query_id, CAST({t} AS BIGINT) AS pick, vec_id, mmr"
        f" FROM p{t}"
        for t in range(1, int(k) + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects
