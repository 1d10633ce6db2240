"""Unit tests for the round-9 staged operators: association rules,
weighted quantiles, SQ8 scalar quantization, LSH blocking quality."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_association_rules_hand_case(spark):
    """Counts/confidence/lift against a hand-enumerated basket set."""
    from centimators_spark.ml.itemsets import association_rules

    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"), (4, "b"),  # duplicate item in one basket counts once
        (5, "a"),
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(
            df, "basket", "item", min_pair_count=2
        ).collect()
    }
    # supports: a=4, b=3, c=2, ab=2, ac=2, bc=1 (dropped), n=5
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}
    ab = got[("a", "b")]
    assert ab.pair_n == 2 and ab.ant_n == 4 and ab.cons_n == 3
    assert ab.confidence == pytest.approx(round(2 / 4, 6))
    assert ab.lift == pytest.approx(round(2 * 5 / (4 * 3), 6))
    ba = got[("b", "a")]
    assert ba.confidence == pytest.approx(round(2 / 3, 6))
    assert ba.lift == ab.lift  # lift is symmetric
    ca = got[("c", "a")]
    assert ca.confidence == pytest.approx(1.0)


def test_association_rules_null_basket_parity(spark):
    """NULL basket keys keep the original bi.distinct()/self-join
    semantics under the r13 map-side pair enumeration: excluded from
    n_baskets (countDistinct skipped NULL), counted once in singles
    (distinct kept the rows), and never paired (NULL keys never
    matched the equi-self-join)."""
    from centimators_spark.ml.itemsets import association_rules

    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (None, "a"), (None, "b"), (None, "b"),
        (3, "c"), (3, None),  # null items dropped up front
    ]
    df = spark.createDataFrame(rows, "basket int, item string")
    out = sorted(
        (r.antecedent, r.consequent, r.pair_n, r.ant_n, r.cons_n)
        for r in association_rules(
            df, "basket", "item", min_pair_count=1
        ).collect()
    )
    # n_baskets=3 (1,2,3 — NULL excluded), singles a=3,b=3,c=1 (the
    # null group counts once), pairs only (a,b)x2 from baskets 1,2
    assert out == [("a", "b", 2, 3, 3), ("b", "a", 2, 3, 3)]


def test_weighted_quantiles_hand_case(spark):
    """Type-1 weighted quantiles against a hand-walked cumulative."""
    from centimators_spark.operators.stats import weighted_quantiles

    # group g: values 1..4 with weights 1,1,1,7 (total 10)
    rows = [("g", 1.0, 1), ("g", 2.0, 1), ("g", 3.0, 1), ("g", 4.0, 7)]
    df = spark.createDataFrame(rows, "grp string, v double, w long")
    r = weighted_quantiles(df, "v", "w", "grp").collect()[0]
    # cum: 1->1, 2->2, 3->3, 4->10; thresholds: q25=2.5 -> v=3 (cum 3),
    # q50=5 -> v=4, q75=7.5 -> v=4
    assert r.n == 4 and r.total_weight == 10
    assert r.wq25 == 3.0 and r.wq50 == 4.0 and r.wq75 == 4.0


def test_weighted_quantiles_matches_numpy_type1(spark):
    """Against the numpy definition: smallest v with cumw >= q * W."""
    from centimators_spark.operators.stats import weighted_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 100, 200).astype(float)
    wts = rng.integers(1, 9, 200)
    rows = [("g", float(v), int(w)) for v, w in zip(vals, wts)]
    df = spark.createDataFrame(rows, "grp string, v double, w long")
    r = weighted_quantiles(df, "v", "w", "grp").collect()[0]
    order = np.argsort(vals, kind="stable")
    sv, sw = vals[order], wts[order]
    cum = np.cumsum(sw)
    W = cum[-1]
    for q, name in [(0.25, "wq25"), (0.5, "wq50"), (0.75, "wq75")]:
        expected = sv[np.searchsorted(cum, q * W, side="left")]
        assert getattr(r, name) == expected, (q, name)


def test_sq8_encode_codes_and_recall(spark):
    """Codes match a numpy HALF_UP quantization of the unit vectors;
    SQ8 shortlist + exact re-rank achieves full recall on clearly
    clustered vectors."""
    from centimators_spark.similarity.pq import sq8_encode, sq8_topk

    rng = np.random.default_rng(5)
    # two tight clusters around orthogonal axes
    base = np.zeros((40, 8))
    base[:20, 0] = 1.0
    base[20:, 4] = 1.0
    X = base + 0.05 * rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in X[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    coded = {r.vec_id: r.sq_code for r in sq8_encode(df, dim=8).collect()}
    Xu = X / np.linalg.norm(X, axis=1, keepdims=True)
    for i in range(40):
        expected = np.sign(Xu[i]) * np.floor(np.abs(Xu[i]) * 127.0 + 0.5)
        assert list(coded[i]) == [int(x) for x in expected], i

    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    enc = sq8_encode(df, dim=8)
    short = sq8_topk(enc, queries, dim=8, k=20)
    # every same-cluster neighbor (ids 0..19) should be in the top 20
    got = {
        (r.query_id, r.vec_id) for r in short.collect()
    }
    for q in range(3):
        mates = {(q, j) for j in range(20) if j != q}
        assert mates <= got, q


def test_minhash_band_candidates_superset_of_pairs(spark):
    """Band candidates must contain every verified near-dup pair (the
    LSH candidate set is what minhash_lsh_pairs verifies), and the
    blocking metrics reflect that containment."""
    from centimators_spark.dedup.minhash import (
        minhash_band_candidates,
        minhash_lsh_pairs,
    )
    from centimators_spark.text.hashing_udf import minhash_signatures_udf

    docs = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "an entirely different document about spark window functions"),
        (4, "an entirely different document about spark window functions"),
        (5, "completely unrelated text mentioning association rule mining"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = minhash_signatures_udf(df)
    cand = {
        (r.d1, r.d2) for r in minhash_band_candidates(sigs).collect()
    }
    verified = {
        (r.d1, r.d2)
        for r in minhash_lsh_pairs(df, threshold=0.6).collect()
    }
    assert verified <= cand
    assert (1, 2) in verified and (3, 4) in verified


def test_logistic_irls_matches_python_replication(spark):
    """The distributed two-step Newton fit replicated in plain Python
    ints/floats (exact carriers + same Cramer term order) — coefficients
    agree to float tolerance (exp() may differ by 1 ULP between JVM and
    libm, absorbed by the micro-unit quantization almost surely)."""
    import math

    from centimators_spark.ml.cramer import solve_floats
    from centimators_spark.ml.logistic import MICRO, logistic_irls

    rng = np.random.default_rng(3)
    n = 400
    x1 = rng.integers(0, 50, n)
    x2 = rng.integers(1, 13, n)
    logit = -1.0 + 0.08 * x1 - 0.1 * x2
    y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(int)
    rows = [(int(a), int(b), bool(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y boolean")
    got = logistic_irls(df, ["x1", "x2"], "y", steps=2).collect()[0]
    assert got.n == n and got.n_pos == int(y.sum())

    # python replication with exact integer carriers
    X = np.column_stack([np.ones(n, dtype=object), x1.astype(object),
                         x2.astype(object)])
    yu = y.astype(object) * MICRO

    def newton_step(beta):
        if beta is None:
            pu = np.full(n, MICRO // 2, dtype=object)
        else:
            z = beta[0] + beta[1] * X[:, 1].astype(float) \
                + beta[2] * X[:, 2].astype(float)
            pu = np.array(
                [int(_round_half(MICRO / (1 + math.exp(-zz)))) for zz in z],
                dtype=object,
            )
        w = pu * (MICRO - pu)
        G = [[float(sum(w * X[:, i] * X[:, j])) for j in range(3)]
             for i in range(3)]
        g = [float(sum((yu - pu) * X[:, i])) for i in range(3)]
        delta = [1e6 * d for d in solve_floats(G, g)]
        return delta if beta is None else [b + d for b, d in
                                           zip(beta, delta)]

    def _round_half(v):  # HALF_UP like both engines' round-to-integer
        import math as _m

        return _m.floor(v + 0.5) if v >= 0 else _m.ceil(v - 0.5)

    beta = newton_step(newton_step(None))
    for i in range(3):
        assert getattr(got, f"b{i}") == pytest.approx(
            round(beta[i], 6), abs=1e-6
        ), i
    # two steps from a balanced-ish start should already have the
    # planted signs
    assert got.b1 > 0 and got.b2 < 0


def test_bpe_pair_merges_hand_case(spark):
    """Adjacent-pair counts with multiplicity, ordered ties."""
    from centimators_spark.text.cooccur import bpe_pair_merges

    docs = [
        (1, "a b a b a"),   # (a,b)x2, (b,a)x2
        (2, "a b c"),       # (a,b), (b,c)
        (3, "x"),           # no pairs
        (4, ""),            # no tokens
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = bpe_pair_merges(
        df, top_k=10, min_count=1
    ).collect()
    got = [(r.w1, r.w2, r.pair_n) for r in rows]
    assert got[0] == ("a", "b", 3)
    assert ("b", "a", 2) in got and ("b", "c", 1) in got
    # descending counts, then lexicographic
    counts = [c for _, _, c in got]
    assert counts == sorted(counts, reverse=True)


def test_rfm_segments_quintiles(spark):
    """Value-based quantile scores: best customer gets 555, scores in
    range, recency inverted."""
    import datetime

    from centimators_spark.analytics import rfm_segments

    base = datetime.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for cust in range(10):
        # customer c: (c+1) orders, latest at day c (cust 0 = most
        # recent), each order worth 100*(c+1)
        for j in range(cust + 1):
            oid += 1
            rows.append(
                (
                    oid,
                    cust,
                    base - datetime.timedelta(days=cust + j * 30),
                    float(100 * (cust + 1)),
                )
            )
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double"
    )
    got = {r.customer: r for r in rfm_segments(df).collect()}
    assert len(got) == 10
    for c, r in got.items():
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5
        assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
    # cust 9: most orders + highest value -> top f/m scores
    assert got[9].f_score == 5 and got[9].m_score == 5
    # cust 0: single most-recent order -> top recency, bottom f/m
    assert got[0].r_score == 5 and got[0].f_score == 1


def test_label_propagation_two_cliques(spark):
    """Two cliques bridged by one edge resolve to two communities with
    min-label tie-breaks; community sizes correct."""
    from centimators_spark.graphs import label_propagation

    edges = []
    for grp, nodes in [(0, [1, 2, 3, 4]), (1, [10, 11, 12, 13])]:
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                edges.append((a, b))
    edges.append((4, 10))  # weak bridge
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.v: r for r in label_propagation(df, rounds=3).collect()}
    assert len(got) == 8
    left = {got[v].community for v in (1, 2, 3)}
    right = {got[v].community for v in (11, 12, 13)}
    assert len(left) == 1 and len(right) == 1 and left != right
    # clique interiors dominate their bridge endpoints
    assert got[1].community_size >= 3 and got[11].community_size >= 3


def test_bpe_apply_hand_trace(spark):
    """Hand-computed merge trace: rules apply in order, left-to-right
    non-overlapping within a rule, merged tokens feed later rules."""
    from centimators_spark.text.cooccur import bpe_apply

    docs = [
        (1, "a b a b a"),  # rule (a,b): [a_b, a_b, a]
        (2, "x x x"),      # rule (x,x): overlap -> [x_x, x] not [x, x_x]
        (3, "a b c"),      # (a,b) then (a_b,c) cascades -> [a_b_c]
        (4, "q"),          # untouched single token
        (5, ""),           # no rows
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rules = [("a", "b"), ("x", "x"), ("a_b", "c")]
    out = bpe_apply(df, rules, output="exploded").collect()
    enc = {}
    for r in out:
        enc.setdefault(r.doc_id, []).append((r.pos, r.token))
    seqs = {d: [t for _, t in sorted(v)] for d, v in enc.items()}
    assert seqs[1] == ["a_b", "a_b", "a"]
    assert seqs[2] == ["x_x", "x"]
    assert seqs[3] == ["a_b_c"]
    assert seqs[4] == ["q"]
    assert 5 not in seqs
    # default output="array" (the production/100 TB mode, r9 verdict
    # item 3): one row per doc, tokens identical to the exploded shape
    arr = {r.doc_id: list(r.tokens) for r in bpe_apply(df, rules).collect()}
    assert arr == {**seqs, 5: []}


def test_bpe_train_apply_matches_duckdb(spark):
    """train->encode end to end vs the DuckDB oracle on a tiny corpus
    (repeated bigrams so merges actually fire)."""
    import duckdb
    import pandas as pd

    from centimators_spark.text.cooccur import (
        bpe_train_apply,
        bpe_train_apply_oracle_sql,
    )

    docs = [
        (i, "new york is in new york state and new york is big")
        for i in range(5)
    ] + [(99, "one token pair one token"), (100, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sdf = bpe_train_apply(df, n_merges=4, output="exploded").toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    odf = con.execute(
        bpe_train_apply_oracle_sql("documents", n_merges=4)
    ).fetchdf()
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(
        s.dtypes.to_dict()
    )
    assert s.equals(o)
    assert (s.token == "new_york").any()


def test_bpe_train_multi_round_cascade(spark):
    """The iterative trainer's round-2 argmax must be computed over
    the ROUND-1 ENCODING (not the raw corpus): after merging (a,b),
    pair (a_b, c) — which does not exist in the raw token stream —
    must win round 2."""
    from centimators_spark.text.cooccur import bpe_train

    docs = [(i, "a b c x y") for i in range(5)] + [
        (10, "x y"), (11, "x y"), (12, "b c")
    ]
    # raw pair counts: (a,b)=5, (b,c)=6, (c,x)=5, (x,y)=7
    # round 1: (x,y,7). round 2: (b,c,6). round 3: on the encoding
    # "a b_c ..." the pair (a, b_c)=5 ties (c? gone) with (b_c, x)=5
    # -> lexicographic: ("a","b_c") wins
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = bpe_train(df, rounds=3, min_count=1)
    assert merges[0] == ("x", "y", 7)
    assert merges[1] == ("b", "c", 6)
    assert merges[2] == ("a", "b_c", 5)


def test_bpe_train_rounds_early_stop(spark):
    """No pair at min_count -> the trainer stops and the table is
    short, not crashed."""
    from centimators_spark.text.cooccur import bpe_train_rounds

    df = spark.createDataFrame(
        [(1, "a b"), (2, "c d"), (3, "")], "doc_id long, text string"
    )
    out = bpe_train_rounds(df, rounds=3, min_count=2).collect()
    assert out == []
