"""Hand-computed semantics for the round-8 staged retrieval/selection
operators: reciprocal-rank fusion and token-budget corpus selection."""

import pyspark.sql.functions as F  # noqa: F401

from centimators_spark.similarity.fusion import rrf_fuse
from centimators_spark.text.selection import token_budget_select


def test_rrf_fuse_hand_scores(spark):
    # doc 1: rank 1 lexically, rank 3 in vectors; doc 2: rank 2 + rank 1;
    # doc 3 lexical-only rank 3; doc 4 vector-only rank 2
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(2, 1), (4, 2), (1, 3)], "doc_id long, rank long"
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, vec], k=10).collect()}

    def ppb(rank):
        return round(1e9 / (60 + rank))

    assert out[1].rrf_ppb == ppb(1) + ppb(3) and out[1].n_lists == 2
    assert out[2].rrf_ppb == ppb(2) + ppb(1) and out[2].n_lists == 2
    assert out[3].rrf_ppb == ppb(3) and out[3].n_lists == 1
    assert out[4].rrf_ppb == ppb(2) and out[4].n_lists == 1
    # doc 2 (1+2) outranks doc 1 (1+3)
    ordered = sorted(out.values(), key=lambda r: (-r.rrf_ppb, r.doc_id))
    assert [r.doc_id for r in ordered][:2] == [2, 1]


def test_rrf_fuse_k_limit(spark):
    lst = spark.createDataFrame(
        [(i, i) for i in range(1, 8)], "doc_id long, rank long"
    )
    got = rrf_fuse([lst], k=3).collect()
    assert [r.doc_id for r in got] == [1, 2, 3]


def test_token_budget_select_greedy_prefix(spark):
    # quality order: d3 (9) -> d1 (7) -> d4 (7, id tiebreak) -> d2 (2)
    # tokens:        10        20        30          40
    # budget = 0.4 * 100 = 40 -> keep d3 (cum 10), d1 (cum 30); d4
    # would hit 60 > 40
    rows = [(1, 7, 20), (2, 2, 40), (3, 9, 10), (4, 7, 30)]
    df = spark.createDataFrame(rows, "doc_id long, score_micro long, n_tokens long")
    out = sorted(
        token_budget_select(df, budget_frac=0.4).collect(),
        key=lambda r: r.cum_tokens,
    )
    assert [(r.doc_id, r.cum_tokens) for r in out] == [(3, 10), (1, 30)]


def test_token_budget_select_two_phase_matches_small_cells(spark):
    # many ties + few cells: the cell decomposition must reproduce the
    # single-window greedy prefix exactly
    rows = [(i, i % 5, 10 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score_micro long, n_tokens long")
    got = sorted(
        (r.doc_id, r.cum_tokens)
        for r in token_budget_select(df, budget_frac=0.5, n_cells=3).collect()
    )
    # local recomputation: order by (score desc, doc_id), prefix <= floor(.5*total)
    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    total = sum(r[2] for r in rows)
    budget = int(total * 0.5)
    cum, expected = 0, []
    for doc_id, _, tok in order:
        cum += tok
        if cum > budget:
            break
        expected.append((doc_id, cum))
    assert got == sorted(expected)
    plan = (
        token_budget_select(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__cell" in plan
