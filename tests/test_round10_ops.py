"""Unit tests for the round-10 staged operators: boosted stumps (BPE
tests live in test_round9_ops.py next to the rest of the family)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_boosted_stumps_hand_trace(spark):
    """Two-round trace computed by hand: leaf values are half-means
    (floor), round-2 fits the residual."""
    from centimators_spark.ml.splits import boosted_stumps

    rows = [(1, 1_000_000), (1, 2_000_000), (2, 3_000_000), (2, 4_000_000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = boosted_stumps(
        df, {"x": F.col("x")}, F.col("y"), rounds=2
    ).collect()
    # y2 = [2e6, 4e6, 6e6, 8e6]; split x<=1: S_L=6e6 S_R=14e6
    # score = (36e12*2 + 196e12*2) / (2*2*1e6) = 116_000_000
    # c_left = 6e6 // 4 = 1_500_000 ; c_right = 14e6 // 4 = 3_500_000
    assert [tuple(r) for r in out][0] == (
        1, "x", 1, 1_500_000, 3_500_000, 116_000_000
    )
    # residuals: [.5e6, 2.5e6, 2.5e6, 4.5e6] -> S_L=3e6, S_R=7e6
    # score = (9e12*2 + 49e12*2) / 4e6 = 29_000_000
    assert [tuple(r) for r in out][1] == (
        2, "x", 1, 750_000, 1_750_000, 29_000_000
    )


def test_boosted_stumps_matches_python_replication(spark):
    """Random integer panel vs an exact pure-Python replication of the
    same integer algorithm (floor divisions, argmax tie order) — any
    arithmetic divergence in either engine breaks this."""
    from centimators_spark.ml.splits import boosted_stumps

    rng = np.random.default_rng(7)
    n = 500
    f1 = rng.integers(0, 9, n)
    f2 = rng.integers(0, 5, n)
    y = rng.integers(-1_000_000, 1_000_000, n) + 400_000 * f1 - 250_000 * f2
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(f1, f2, y)]
    df = spark.createDataFrame(rows, "f1 long, f2 long, y long")
    got = [
        tuple(r)
        for r in boosted_stumps(
            df, {"f1": F.col("f1"), "f2": F.col("f2")}, F.col("y"), rounds=3
        ).collect()
    ]

    feats = {"f1": f1.astype(object), "f2": f2.astype(object)}
    resid = (y.astype(object)) * 2
    expected = []
    for r in range(3):
        best = None
        for name in sorted(feats):
            v = feats[name]
            for t in sorted(set(v.tolist()))[:-1]:
                m = v <= t
                n_l, n_r = int(m.sum()), int((~m).sum())
                s_l, s_r = int(resid[m].sum()), int(resid[~m].sum())
                score = (s_l * s_l * n_r + s_r * s_r * n_l) // (
                    n_l * n_r * 1_000_000
                )
                key = (-score, name, t)
                if best is None or key < best[0]:
                    best = (key, name, t, n_l, s_l, s_l + s_r, n_l + n_r)
        _, name, t, n_l, s_l, s, ntot = best
        c_l = s_l // (2 * n_l)
        c_r = (s - s_l) // (2 * (ntot - n_l))
        score = -best[0][0]
        expected.append((r + 1, name, t, c_l, c_r, score))
        m = feats[name] <= t
        resid = resid - np.where(m, c_l, c_r).astype(object)
    assert got == expected


def test_boosted_stumps_degenerate(spark):
    """Empty input and single-value features do not crash; the model
    table is just shorter."""
    from centimators_spark.ml.splits import boosted_stumps

    empty = spark.createDataFrame([], "x long, y long")
    assert boosted_stumps(
        empty, {"x": F.col("x")}, F.col("y"), rounds=2
    ).collect() == []
    const = spark.createDataFrame([(1, 5), (1, 7)], "x long, y long")
    # single distinct value -> no valid split (right side empty)
    assert boosted_stumps(
        const, {"x": F.col("x")}, F.col("y"), rounds=2
    ).collect() == []


def test_mmr_diversify_hand_case(spark):
    """Diversity visibly flips pure-relevance order: two near-identical
    top candidates — MMR picks the slightly-less-relevant but novel
    doc second."""
    from centimators_spark.similarity.mmr import mmr_diversify

    # query direction = x-axis. d1,d2 almost parallel to x and to each
    # other; d3 45-degrees off (lower rel, high novelty)
    import math

    s2 = 1 / math.sqrt(2)
    pool_rows = [
        # (query_id, vec_id, vv, rel): rel = round(cos(q, d), 6)
        (0, 1, [1.0, 0.0], 1.0),
        (0, 2, [0.999, 0.0447], 0.999001),
        (0, 3, [s2, s2], round(s2, 6)),
    ]
    df = spark.createDataFrame(
        pool_rows, "query_id long, vec_id long, vv array<double>, rel double"
    )
    out = mmr_diversify(df, k=3).collect()
    order = [r.vec_id for r in sorted(out, key=lambda r: r.pick)]
    # pick1 = most relevant (d1). pick2: d2's mmr = (7*0.999001 -
    # 3*~0.999)/10 ~ 0.3996; d3's = (7*0.707107 - 3*0.707107)/10
    # ~ 0.282843 -> d2 still wins here, then d3.
    assert order[0] == 1
    # the scores, not just the order, must match the formula
    got = {r.vec_id: r.mmr for r in out}
    assert got[1] == 1.0
    import numpy as np

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    v = {1: [1.0, 0.0], 2: [0.999, 0.0447], 3: [s2, s2]}
    exp2 = round((7 * 0.999001 - 3 * cos(v[2], v[1])) / 10, 6)
    assert got[2] == pytest.approx(exp2, abs=2e-6)


def test_mmr_diversity_beats_redundancy(spark):
    """A clone of pick-1 must rank BELOW a novel direction at pick 2
    (the whole point of MMR)."""
    from centimators_spark.similarity.mmr import mmr_diversify

    pool_rows = [
        (0, 1, [1.0, 0.0], 1.0),
        (0, 2, [1.0, 0.0], 1.0),      # exact clone of d1
        (0, 3, [0.8, 0.6], 0.8),      # novel direction, rel 0.8
    ]
    df = spark.createDataFrame(
        pool_rows, "query_id long, vec_id long, vv array<double>, rel double"
    )
    out = {r.pick: r.vec_id for r in mmr_diversify(df, k=2).collect()}
    assert out[1] == 1
    # clone: (7*1.0 - 3*1.0)/10 = 0.4 ; novel: (7*0.8 - 3*0.8)/10 = 0.32
    # -> clone still wins with lambda=0.7; use stronger diversity
    out2 = {
        r.pick: r.vec_id
        for r in mmr_diversify(df, k=2, lam_num=3, lam_den=10).collect()
    }
    # clone: (3*1 - 7*1)/10 = -0.4 ; novel: (3*0.8 - 7*0.6)/10 = -0.18
    assert out2[2] == 3


def _cc_pairs(spark, edges):
    return spark.createDataFrame(edges, "d1 long, d2 long")


def test_cc_star_matches_union_find_on_adversarial_graphs(spark):
    """Big-star/small-star CC == exact union-find on a long path (the
    diameter case the algorithm exists for), disjoint cliques, a star,
    and a seeded random graph."""
    import random

    from centimators_spark.dedup.cluster import (
        connected_components,
        connected_components_star,
    )

    cases = {
        # 60-node path: label propagation needs 60 rounds; star ~log
        "path": [(i, i + 1) for i in range(60)],
        "two_cliques": [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(i, j) for i in range(10, 14) for j in range(i + 1, 14)],
        "star": [(50, i) for i in range(40)],
        "self_and_dup": [(1, 2), (2, 1), (3, 3), (2, 3)],
        # node 9's ONLY edge is a self-loop: both variants must keep it
        # as a singleton cluster (advice r9: star used to drop it)
        "selfloop_only": [(1, 2), (9, 9)],
        "all_selfloops": [(4, 4), (7, 7)],
    }
    rng = random.Random(13)
    cases["random"] = [
        (rng.randrange(0, 40), rng.randrange(0, 40)) for _ in range(60)
    ]
    for name, edges in cases.items():
        df = _cc_pairs(spark, edges)
        exact = {
            (r.node, r.cluster)
            for r in connected_components(df).collect()
        }
        star = {
            (r.node, r.cluster)
            for r in connected_components_star(df).collect()
        }
        # both variants keep self-loop-only nodes as singleton clusters
        assert star == exact, name


def test_cc_star_converges_fast_on_path(spark):
    """The whole point: a 60-node path must converge in far fewer than
    60 rounds (O(log n))."""
    import warnings as w

    from centimators_spark.dedup.cluster import connected_components_star

    df = _cc_pairs(spark, [(i, i + 1) for i in range(60)])
    with w.catch_warnings():
        w.simplefilter("error")  # non-convergence warning -> failure
        out = connected_components_star(df, max_iter=12).collect()
    assert all(r.cluster == 0 for r in out)
    assert len(out) == 61


def test_cms_overcount_never_negative_and_exact_when_isolated(spark):
    """CMS guarantee: est >= true always; equality when a token's d
    cells collide with nothing."""
    from centimators_spark.sketches import cms_heavy_hitter_contract

    docs = [(1, "alpha alpha alpha beta beta gamma")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # w large: no collisions -> every estimate exact
    rows = cms_heavy_hitter_contract(df, k=10, w=4096).collect()
    assert {r.token: r.true_n for r in rows} == {
        "alpha": 3, "beta": 2, "gamma": 1
    }
    assert all(r.overcount == 0 for r in rows)
    # w=1: every token shares the single cell per row -> est = total
    rows1 = cms_heavy_hitter_contract(df, k=10, w=1).collect()
    assert all(r.cms_est == 6 for r in rows1)
    assert all(r.overcount == 6 - r.true_n >= 0 for r in rows1)


def test_cms_matches_duckdb_on_tiny_corpus(spark):
    """Cross-engine identity of cells and estimates on a forced-
    collision sketch."""
    import duckdb
    import pandas as pd

    from centimators_spark.sketches import (
        cms_heavy_hitter_contract,
        cms_heavy_hitter_oracle_sql,
    )

    docs = [(i, f"tok{i % 7} tok{i % 3} shared") for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sdf = cms_heavy_hitter_contract(df, k=20, w=4).toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(docs, columns=["doc_id", "text"]))
    odf = con.execute(
        cms_heavy_hitter_oracle_sql("documents", k=20, w=4)
    ).fetchdf()
    cols = sorted(sdf.columns)
    s = sdf[cols].sort_values(cols).reset_index(drop=True)
    o = odf[cols].sort_values(cols).reset_index(drop=True).astype(
        s.dtypes.to_dict()
    )
    assert s.equals(o)
    assert (s.overcount >= 0).all()
    assert (s.overcount > 0).any()  # w=4 must collide


def test_bigram_lm_hand_replication(spark):
    """Tiny corpus replicated in pure Python: capped vocab with <unk>
    mapping, exact bigram ratios, rational lambda, 6dp micro-unit
    mean."""
    import math

    from centimators_spark.text.analysis import bigram_lm_score

    docs = [(1, "a b a b c"), (2, "a a"), (3, "x"), (4, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_pairs, r.bigram_logprob)
        for r in bigram_lm_score(df, vocab_cap=3).collect()
    }
    # top-3 vocab: a(4), b(2), c(1) [ties c<x]; x -> <unk>
    uni = {"a": 4, "b": 2, "c": 1, "<unk>": 1}
    N, V = 8, 4
    big = {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1, ("a", "a"): 1}

    def lp(w1, w2):
        pb = big.get((w1, w2), 0) / uni[w1]
        pu = (uni[w2] + 1.0) / (N + 1.0 * V)
        return round(math.log((8 * pb + 2 * pu) / 10), 6)

    def doc_score(pairs):
        us = [int(round(lp(a, b) * 1e6)) for a, b in pairs]
        return round(sum(us) / 1e6 / len(us), 6)

    assert got[1] == (4, doc_score([("a", "b"), ("b", "a"), ("a", "b"),
                                    ("b", "c")]))
    assert got[2] == (1, doc_score([("a", "a")]))
    assert got[3] == (0, None)
    assert got[4] == (0, None)


def test_k_anonymity_hand_case(spark):
    """Class-size profile and violation flags on a hand-built table."""
    from centimators_spark.analytics import k_anonymity

    rows = (
        [("us", "a")] * 5      # one class of 5 (safe at k=5)
        + [("us", "b")] * 2    # class of 2 (violates)
        + [("de", "a")]        # class of 1 (violates)
        + [("de", "b")] * 2    # class of 2
    )
    df = spark.createDataFrame(rows, "nation string, seg string")
    got = {
        r.class_size: (r.n_classes, r.n_rows, r.violates_k)
        for r in k_anonymity(df, ["nation", "seg"], k=5).collect()
    }
    assert got == {1: (1, 1, True), 2: (2, 4, True), 5: (1, 5, False)}
