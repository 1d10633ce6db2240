"""Hand-computed semantics for the round-8 staged operators:
reciprocal-rank fusion, token-budget corpus selection, asymmetric
containment dedup, and the Gini decision stump."""

import pyspark.sql.functions as F

from centimators_spark.dedup.jaccard import ngram_containment_pairs
from centimators_spark.ml.splits import best_split
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


def test_token_budget_select_null_score_sorts_last(spark):
    # a null-score doc must sort BELOW every real score (oracle: ORDER
    # BY score DESC NULLS LAST) — before the cell guard, floor(null)
    # landed it in the TOP cell, inflating every lower cell's offset
    rows = [(1, 7, 20), (2, None, 5), (3, 9, 10), (4, 7, 30)]
    df = spark.createDataFrame(
        rows, "doc_id long, score_micro long, n_tokens long"
    )
    # total = 65, budget_frac=0.95 -> budget = 61: order is
    # d3(10) d1(30) d4(60) then null-score d2 (65 > 61 -> dropped)
    got = sorted(
        (r.doc_id, r.cum_tokens)
        for r in token_budget_select(df, budget_frac=0.95).collect()
    )
    assert got == [(1, 30), (3, 10), (4, 60)]
    # with full budget the null-score doc is selected LAST
    got_all = sorted(
        (r.doc_id, r.cum_tokens)
        for r in token_budget_select(df, budget_frac=1.0).collect()
    )
    assert got_all == [(1, 30), (2, 65), (3, 10), (4, 60)]


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


def test_containment_asymmetric_embedding(spark):
    # doc 2 is fully contained in doc 1 (its grams are a subset);
    # symmetric Jaccard is low but containment(2 -> 1) = 1.0
    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    small = "gamma delta epsilon"
    other = "one two three four five six"
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string"
    )
    out = {
        (r.src, r.dst): r.containment
        for r in ngram_containment_pairs(
            df, n=3, threshold=0.5, df_cap=None
        ).collect()
    }
    # small has 1 trigram, fully inside big's 8 trigrams
    assert out[(2, 1)] == 1.0
    assert (1, 2) not in out  # 1/8 = 0.125 < 0.5
    assert not any(3 in k for k in out)


def test_best_split_hand_gini(spark):
    # feature x: values 1,2,3,4; labels positive iff x >= 3.
    # perfect split at threshold 2: left (x<=2) all neg, right all pos
    rows = [(v, v >= 3) for v in (1, 1, 2, 2, 3, 3, 4, 4)]
    df = spark.createDataFrame(rows, "x long, y boolean")
    out = best_split(df, {"x": F.col("x")}, F.col("y")).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.feature, r.threshold, r.n_left, r.pos_left) == ("x", 2, 4, 0)
    assert r.score == 0.0  # both sides pure


def test_best_split_prefers_lower_threshold_on_ties(spark):
    # all labels identical: every split scores the same (0 impurity
    # everywhere) -> the min-struct tiebreak keeps the LOWEST threshold
    rows = [(v, True) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "x long, y boolean")
    r = best_split(df, {"x": F.col("x")}, F.col("y")).collect()[0]
    assert r.threshold == 1 and r.score == 0.0


def test_topk_turnover_hand_membership(spark):
    # era 1 top-2: {a, b}; era 2 top-2: {b, c} -> 1 new of 2 = 0.5;
    # era 3 top-2: {b, c} -> turnover 0
    import datetime

    def d(m):
        return datetime.date(2020, m, 1)

    rows = [
        (d(1), "a", 10), (d(1), "b", 9), (d(1), "c", 1),
        (d(2), "b", 10), (d(2), "c", 9), (d(2), "a", 1),
        (d(3), "b", 10), (d(3), "c", 9),
    ]
    from centimators_spark.analytics import topk_turnover

    df = spark.createDataFrame(rows, "era date, item string, m long")
    out = {
        str(r.era): (r.n_prev, r.n_curr, r.n_common, r.turnover)
        for r in topk_turnover(df, "era", "item", F.col("m"), k=2).collect()
    }
    assert len(out) == 2  # era 1 has no predecessor
    assert list(out.values()) == [(2, 2, 1, 0.5), (2, 2, 2, 0.0)] or (
        out[sorted(out)[0]] == (2, 2, 1, 0.5)
        and out[sorted(out)[1]] == (2, 2, 2, 0.0)
    )


def test_topk_turnover_calendar_hole_no_pair(spark):
    import datetime

    rows = [
        (datetime.date(2020, 1, 1), "a", 5),
        (datetime.date(2020, 3, 1), "a", 5),  # feb missing
    ]
    from centimators_spark.analytics import topk_turnover

    df = spark.createDataFrame(rows, "era date, item string, m long")
    assert topk_turnover(df, "era", "item", F.col("m"), k=5).count() == 0


def test_ic_decay_perfect_persistence_and_reversal(spark):
    # metric ordering persists exactly at h=1 between months 1->2
    # (IC=1) and fully reverses between 2->3 (IC=-1); horizon 2 pairs
    # 1->3, also reversed
    import datetime

    def d(m):
        return datetime.date(2020, m, 1)

    m1 = [(d(1), i, i * 10) for i in range(1, 6)]
    m2 = [(d(2), i, i * 20) for i in range(1, 6)]          # same order
    m3 = [(d(3), i, (6 - i) * 10) for i in range(1, 6)]    # reversed
    from centimators_spark.ml.metrics import ic_decay

    df = spark.createDataFrame(
        m1 + m2 + m3, "era date, item int, m long"
    )
    out = {
        r.horizon: (r.n_months, r.mean_ic)
        for r in ic_decay(df, "era", "item", F.col("m"), horizons=(1, 2)).collect()
    }
    # h=1: months (1->2 IC=1), (2->3 IC=-1) -> mean 0
    assert out[1] == (2, 0.0)
    # h=2: month (1->3 IC=-1)
    assert out[2] == (1, -1.0)


def test_negative_sample_deterministic_and_self_free(spark):
    from centimators_spark.sampling import negative_sample

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    a = sorted(
        (r.anchor, r.neg_rank, r.negative)
        for r in negative_sample(df.repartition(7), k=3, n_buckets=8).collect()
    )
    b = sorted(
        (r.anchor, r.neg_rank, r.negative)
        for r in negative_sample(df.repartition(2), k=3, n_buckets=8).collect()
    )
    assert a == b  # partition-invariant
    assert all(anc != neg for anc, _, neg in a)  # never self
    # with 50 ids over 8 buckets every probe bucket has other members
    assert len(a) == 50 * 3
    # negatives vary across anchors (not one global choice)
    assert len({neg for _, _, neg in a}) > 5


def test_negative_sample_singleton_bucket_corner(spark):
    from centimators_spark.sampling import negative_sample

    # one doc: every probe bucket contains only the anchor -> no rows
    df = spark.createDataFrame([(1,)], "doc_id long")
    assert negative_sample(df, k=4, n_buckets=4).count() == 0
