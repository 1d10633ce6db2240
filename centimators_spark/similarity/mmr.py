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

Scale: MMR is inherently sequential in k, but every number the greedy
argmax consumes is a within-pool pairwise cosine — O(pool_k²) per
query — so Spark computes that pair table in ONE job and the k picks
run driver-side over the collected shortlist (the literal-centroid
discipline extended from one row per query per step to the whole
bounded pool; r13 optimization — the former per-step join/window loop
paid 5-6 Spark jobs of scheduling latency per pick). At 100 TB the
pool per query is still a shortlist (top-20 here); the corpus-sized
work already happened in the ANN stage that built it.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
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
    # r13 optimization (guide §1.2/§5.2): the former per-step loop ran
    # 5-6 Spark jobs PER greedy pick (broadcast key frame, anti-join,
    # cosine re-join, window, collect) — 28 jobs of scheduling
    # overhead on a pool that is by contract a bounded shortlist.
    # Every number the greedy argmax consumes is either rel (already
    # in the pool) or round(cos(cand, picked), 6) for a pair WITHIN
    # one query's pool — so compute ALL within-pool pairwise cosines
    # once in Spark (pool_k² per query, same bound as the former
    # k-step join fan-out) and run the k greedy picks driver-side over
    # the collected shortlist: 2 tiny jobs total. All similarity
    # numbers stay Spark-computed; the only driver-side arithmetic is
    # the step score (7·rel − 3·ms)/10 — same IEEE operand order as
    # the former JVM expression — and its 6dp HALF_UP round, which
    # replicates Round(DoubleType) exactly (BigDecimal over the
    # shortest decimal repr, HALF_UP — Python's repr() produces the
    # same shortest round-trip digits as Double.toString).
    a = pool.select(
        F.col(q).alias("__q"), F.col(i).alias("__ia"), F.col(v).alias("__va")
    )
    b = pool.select(
        F.col(q).alias("__q"), F.col(i).alias("__ib"), F.col(v).alias("__vb")
    )
    sim_rows = (
        a.join(b, "__q")
        .where(F.col("__ia") != F.col("__ib"))
        .select(
            "__q",
            "__ia",
            "__ib",
            F.round(cosine(F.col("__va"), F.col("__vb"), dim), 6).alias(
                "__sim"
            ),
        )
        .collect()
    )
    pool_rows = pool.select(q, i, r).collect()

    sims: dict = {}
    by_query: dict = {}
    for row in sim_rows:
        sims[(row["__q"], row["__ia"], row["__ib"])] = row["__sim"]
    for row in pool_rows:
        by_query.setdefault(row[q], []).append((row[i], row[r]))

    picked: list[tuple] = []  # (query_id, pick, vec_id, mmr)
    for qid in by_query:
        cands = dict(by_query[qid])
        chosen: list = []
        for t in range(1, int(k) + 1):
            if not cands:
                break
            best_id, best_mmr = None, None
            for cid, rel in cands.items():
                if t == 1:
                    mmr = rel  # pick 1 scores rel itself, no re-round
                else:
                    ms = None
                    for sid in chosen:
                        s = sims.get((qid, cid, sid))
                        if s is not None and (ms is None or s > ms):
                            ms = s
                    if ms is None or rel is None:
                        mmr = None
                    else:
                        mmr = _round6(
                            (lam_num * rel - (lam_den - lam_num) * ms)
                            / lam_den
                        )
                # argmax: mmr desc NULLS LAST, ties by ascending id —
                # the former row_number ordering
                if best_id is None or _mmr_gt(mmr, best_mmr) or (
                    mmr == best_mmr and cid < best_id
                ):
                    best_id, best_mmr = cid, mmr
            picked.append(
                (
                    qid,
                    t,
                    best_id,
                    float(best_mmr) if best_mmr is not None else None,
                )
            )
            chosen.append(best_id)
            del cands[best_id]
    return spark.createDataFrame(
        sorted(picked, key=lambda p: (p[0], p[1])),
        f"{q} long, pick long, {i} long, mmr double",
    )


def _round6(x: float) -> float:
    """round(x, 6) exactly as Spark's Round(DoubleType): HALF_UP over
    the shortest-round-trip decimal representation."""
    if x is None or not math.isfinite(x):
        return x
    return float(
        Decimal(repr(x)).quantize(
            Decimal("0.000001"), rounding=ROUND_HALF_UP
        )
    )


def _mmr_gt(a, b) -> bool:
    """a sorts strictly before b under (mmr DESC NULLS LAST)."""
    if a is None:
        return False
    if b is None:
        return True
    return a > b


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
