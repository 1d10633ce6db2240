"""Hand-computed semantics for the round-6 staged operators: drawdown,
two-sample KS, BM25, gains/lift deciles, triangle counting."""

import math

import pyspark.sql.functions as F
import pytest

from centimators_spark.graphs import triangle_count
from centimators_spark.ml.classification_metrics import gains_table
from centimators_spark.ml.metrics import ks_two_sample
from centimators_spark.operators.finance import max_drawdown
from centimators_spark.text.features import bm25_topk


def test_max_drawdown_hand_path(spark):
    # equity path g=a: 10, 4 (-6), 12 (+8), 2 (-10), 7 (+5)
    # peaks:           10, 10, 12, 12, 12 -> drawdowns 0,6,0,10,5
    rows = [
        ("a", 1, 10), ("a", 2, -6), ("a", 3, 8), ("a", 4, -10),
        ("a", 5, 5),
        # monotone up: zero drawdown
        ("b", 1, 3), ("b", 2, 4),
    ]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    got = {
        r.g: (r.max_equity, r.max_drawdown)
        for r in max_drawdown(df, "v", ["t"], "g").collect()
    }
    assert got == {"a": (12, 10), "b": (7, 0)}


def test_max_drawdown_partition_invariant(spark):
    rows = [("g", i, (-1) ** i * (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, t int, v long")
    a = max_drawdown(df.repartition(7), "v", ["t"], "g").collect()[0]
    b = max_drawdown(df.repartition(2), "v", ["t"], "g").collect()[0]
    assert (a.max_equity, a.max_drawdown) == (b.max_equity, b.max_drawdown)


def test_ks_two_sample_hand_values(spark):
    # A = {1, 2, 3}, B = {3, 4}: CDF gaps at x=1: |2*1-3*0|=2,
    # x=2: |2*2-3*0|=4, x=3: |2*3-3*1|=3, x=4: 0 -> D = 4/6
    rows = [
        ("g", 1, False), ("g", 2, False), ("g", 3, False),
        ("g", 3, True), ("g", 4, True),
    ]
    df = spark.createDataFrame(rows, "g string, x int, b boolean")
    r = ks_two_sample(df, "x", "b", "g").collect()[0]
    assert (r.n_a, r.n_b, r.ks_num) == (3, 2, 4)
    assert r.ks == pytest.approx(round(4 / 6, 6))


def test_ks_identical_samples_zero(spark):
    rows = [("g", v, b) for v in (1, 2, 5, 9) for b in (True, False)]
    df = spark.createDataFrame(rows, "g string, x int, b boolean")
    r = ks_two_sample(df, "x", "b", "g").collect()[0]
    assert r.ks_num == 0 and r.ks == 0.0


def test_bm25_hand_computed(spark):
    docs = [
        (1, "cat dog cat"),       # tf(cat)=2, dl=3
        (2, "cat mouse"),         # tf(cat)=1, dl=2
        (3, "mouse mouse bird"),  # no cat
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = {r.doc_id: r.bm25 for r in bm25_topk(df, ["cat"], k=3).collect()}
    n, avgdl, k1, b = 3, 8 / 3, 1.2, 0.75
    idf = math.log(1 + (n - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return round(
            idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6
        )

    assert out == {1: score(2, 3), 2: score(1, 2)}
    assert out[1] > out[2]  # higher tf, modest length penalty


def test_gains_table_hand_buckets(spark):
    # 10 rows, scores 10..1 descending, positives at the top 3 scores
    rows = [(10 - i, i < 3) for i in range(10)]
    df = spark.createDataFrame(rows, "score int, label boolean")
    out = {r.bucket: r for r in gains_table(df, "score", "label").collect()}
    assert len(out) == 10
    assert [out[i].n_rows for i in range(10)] == [1] * 10
    assert [out[i].n_pos for i in range(3)] == [1, 1, 1]
    assert out[2].cum_pos == 3 and out[2].gain == 1.0
    # lift of the top decile: (1/1)/(3/10)
    assert out[0].lift == pytest.approx(round(10 / 3, 6))


def test_gains_table_tie_groups_split_exactly(spark):
    # one score for all rows: every bucket gets n/10 rows and the
    # positive counts spread by the same interval arithmetic the
    # oracle uses — totals must be exact regardless of the split
    rows = [(5, i % 4 == 0) for i in range(40)]
    df = spark.createDataFrame(rows, "score int, label boolean")
    out = gains_table(df, "score", "label").collect()
    assert sum(r.n_rows for r in out) == 40
    assert sum(r.n_pos for r in out) == 10
    assert [r.n_rows for r in sorted(out, key=lambda r: r.bucket)] == [4] * 10
    last = max(out, key=lambda r: r.bucket)
    assert last.cum_rows == 40 and last.cum_pos == 10 and last.gain == 1.0


def test_gains_table_continuous_scores_two_phase_exact(spark):
    # continuous scores (distinct ≈ N — the degenerate case for a
    # single global window): the two-phase cell cumsum must be
    # bit-identical to the single-window reference path, and the plan
    # must carry the cell-partitioned window instead of one
    # unpartitioned sort of the whole distinct stream
    rows = [
        (math.sin(i * 1.7) * 100 + i * 0.001, i % 3 == 0)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    fast = sorted(
        gains_table(df, "score", "label", n_cells=64).collect()
    )
    ref = sorted(
        gains_table(df, "score", "label", n_cells=None).collect()
    )
    assert fast == ref
    plan = gains_table(df, "score", "label")._jdf.queryExecution().executedPlan().toString()
    assert "__cell" in plan


def test_gains_table_null_and_tied_scores_two_phase(spark):
    # nulls sort last under DESC; ties share a cell — offsets must
    # stay exact with both present
    rows = (
        [(None, True)] * 5
        + [(1.5, False)] * 7
        + [(1.5, True)] * 3
        + [(9.0, True)] * 5
    )
    df = spark.createDataFrame(rows, "score double, label boolean")
    fast = sorted(gains_table(df, "score", "label", n_cells=4).collect())
    ref = sorted(gains_table(df, "score", "label", n_cells=None).collect())
    assert fast == ref
    last = max(fast, key=lambda r: r.bucket)
    assert last.cum_rows == 20 and last.cum_pos == 13


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles, plus a disjoint path (0 triangles), plus a
    # duplicate/reversed/self-loop noise that canonicalization drops
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noise = [(1, 0), (2, 2), (10, 11), (11, 12), (0, 1)]
    df = spark.createDataFrame(k4 + noise, "src int, dst int")
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (7, 8, 4)


def test_triangle_count_star_no_triangles(spark):
    # star graph: hub with 20 leaves — high-degree hub, zero triangles
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 21)], "src int, dst int"
    )
    r = triangle_count(df).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (21, 20, 0)


def test_span_dedup_planted_duplicates(spark):
    shared = "a b c d e f g h"  # exactly w=8 tokens -> one shared gram
    docs = [
        (1, shared + " x y z"),
        (2, "p q " + shared),
        (3, "solo text with nothing repeated here at all"),
        (4, None),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    from centimators_spark.text.span_dedup import corpus_span_dedup

    out = {r.doc_id: r for r in corpus_span_dedup(df, w=8).collect()}
    # the shared 8-token span is removed from both docs, tails survive
    assert out[1].n_dup_tokens == 8 and out[1].clean_text == "x y z"
    assert out[2].n_dup_tokens == 8 and out[2].clean_text == "p q"
    assert out[3].n_dup_tokens == 0
    assert out[3].clean_text == "solo text with nothing repeated here at all"
    assert out[4].clean_text is None


def test_span_dedup_overlapping_spans_union(spark):
    # two docs share a 9-token run -> two overlapping 8-grams; covered
    # positions are the UNION (9 tokens), not 16
    run = "t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = spark.createDataFrame(
        [(1, run + " tail"), (2, run)], "doc_id int, text string"
    )
    from centimators_spark.text.span_dedup import corpus_span_dedup

    out = {r.doc_id: r for r in corpus_span_dedup(df, w=8).collect()}
    assert out[1].n_dup_tokens == 9 and out[1].clean_text == "tail"
    assert out[2].n_dup_tokens == 9 and out[2].clean_text == ""


def test_linear_text_score_hand_weights(spark):
    from centimators_spark.text.classifier import linear_text_score

    df = spark.createDataFrame(
        [(1, "good good bad"), (2, "bad"), (3, "neutral words only")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: (r.score_micro, bool(r.keep))
        for r in linear_text_score(
            df, {"good": 500_000, "bad": -400_000}, bias_micro=100_000
        ).collect()
    }
    assert out[1] == (100_000 + 2 * 500_000 - 400_000, True)
    assert out[2] == (100_000 - 400_000, False)
    assert out[3] == (100_000, True)  # bias only


def test_ks_two_sample_one_class_group_null_not_crash(spark):
    # a group with one empty sample yields NULL ks (ANSI-safe), the
    # mixed group the exact separation statistic
    rows = [(1, "g", False)] * 5 + [(2, "h", True)] * 3 + [(3, "h", False)] * 2
    df = spark.createDataFrame(rows, "x long, g string, flag boolean")
    out = {r.g: r for r in ks_two_sample(df, "x", "flag", "g").collect()}
    assert out["g"].ks is None and out["g"].n_b == 0
    assert out["h"].ks == 1.0  # disjoint supports


def test_gains_table_no_positives_null_not_crash(spark):
    df = spark.createDataFrame(
        [(float(i), False) for i in range(20)], "score double, label boolean"
    )
    out = gains_table(df, "score", "label").collect()
    assert sum(r.n_rows for r in out) == 20
    assert all(r.gain is None and r.lift is None for r in out)
