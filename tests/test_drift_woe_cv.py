"""Round-4 operator additions: PSI drift, WOE encoding, row-level CV
fold assignment, PMI co-occurrence."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_psi_identical_distributions_near_zero(spark):
    """Same distribution on both sides → PSI ≈ 0 (smoothing keeps it
    finite but tiny)."""
    from centimators_spark.operators.drift import psi_drift

    rng = np.random.RandomState(5)
    vals = rng.normal(100, 10, 2000)
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, x double")
    [r] = psi_drift(df, ["x"], F.col("i") % 2 == 0, n_bins=10).collect()
    assert r.feature == "x"
    assert r.n_ref + r.n_cur == 2000
    assert abs(r.psi) < 0.05


def test_psi_shifted_distribution_large(spark):
    """A full location shift lands far above the 0.25 action level."""
    from centimators_spark.operators.drift import psi_drift

    rng = np.random.RandomState(6)
    ref = rng.normal(0, 1, 1000)
    cur = rng.normal(3, 1, 1000)
    rows = [(0, float(v)) for v in ref] + [(1, float(v)) for v in cur]
    df = spark.createDataFrame(rows, "side int, x double")
    [r] = psi_drift(df, ["x"], F.col("side") == 0, n_bins=10).collect()
    assert r.psi > 1.0


def test_woe_known_values(spark):
    """Hand-checked WOE on a 2-category frame."""
    from centimators_spark.operators.encoding import woe_encode

    # cat a: 3 pos, 1 neg; cat b: 1 pos, 3 neg; total 4 pos, 4 neg
    rows = [("a", 1)] * 3 + [("a", 0)] + [("b", 1)] + [("b", 0)] * 3
    df = spark.createDataFrame(rows, "cat string, y int")
    out = {
        r.cat: r.woe
        for r in woe_encode(df, "cat", "y", smoothing=0.5)
        .select("cat", "cat_woe")
        .withColumnRenamed("cat_woe", "woe")
        .distinct()
        .collect()
    }
    s = 0.5
    expect_a = math.log(((3 + s) / (4 + 2 * s)) / ((1 + s) / (4 + 2 * s)))
    expect_b = math.log(((1 + s) / (4 + 2 * s)) / ((3 + s) / (4 + 2 * s)))
    assert out["a"] == pytest.approx(expect_a, abs=1e-6)
    assert out["b"] == pytest.approx(expect_b, abs=1e-6)
    # symmetry of the mirrored counts
    assert out["a"] == pytest.approx(-out["b"], abs=1e-6)


def test_assign_folds_consistent_with_splits(spark):
    """Row-level fold labels partition the rows exactly as the
    time_series_splits validation frames do (exact boundaries both)."""
    from centimators_spark.model_selection import assign_folds

    rows = [(i, float(i)) for i in range(120)]
    df = spark.createDataFrame(rows, "rid long, t double")
    out = assign_folds(df, "t", n_splits=3, exact=True).collect()
    by_fold = {}
    for r in out:
        by_fold.setdefault(r.fold, []).append(r.rid)
    # 4 quantile segments: fold -1 (seed train) + folds 0..2
    assert set(by_fold) == {-1, 0, 1, 2}
    sizes = {k: len(v) for k, v in by_fold.items()}
    assert sum(sizes.values()) == 120
    # boundaries are the 1/4, 2/4, 3/4 quantiles → ~30 rows each
    for k, n in sizes.items():
        assert 28 <= n <= 32, (k, n)
    # ordering: every fold-i row precedes every fold-(i+1) row in time
    assert max(by_fold[-1]) < min(by_fold[0])
    assert max(by_fold[0]) < min(by_fold[1])
    assert max(by_fold[1]) < min(by_fold[2])


def test_assign_folds_embargo_flags(spark):
    """Rows inside the embargo gap before the next boundary are
    flagged; the last fold never is."""
    from centimators_spark.model_selection import assign_folds

    rows = [(i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "rid long, t double")
    out = assign_folds(df, "t", n_splits=3, embargo=5.0, exact=True).collect()
    flagged = {r.rid for r in out if r.embargoed}
    last_fold_rows = {r.rid for r in out if r.fold == 2}
    assert flagged, "embargo must flag rows"
    assert not (flagged & last_fold_rows)
    for r in out:
        if r.embargoed:
            assert r.fold < 2


def test_assign_folds_timestamp_column(spark):
    """TIMESTAMP_NTZ time columns route through the LTZ cast (straight
    NTZ→DOUBLE casts throw in Spark)."""
    from centimators_spark.model_selection import assign_folds

    df = spark.sql(
        "SELECT id, timestamp_ntz'2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts "
        "FROM range(40)"
    )
    out = assign_folds(df, "ts", n_splits=2, exact=True).collect()
    assert {r.fold for r in out} == {-1, 0, 1}


def test_pmi_pairs_small_corpus(spark):
    """PMI ranks the always-together pair above an independent pair."""
    from centimators_spark.text.cooccur import pmi_pairs

    docs = []
    for i in range(20):
        # "alpha beta" always co-occur; "gamma" appears everywhere
        text = "alpha beta gamma" if i < 10 else "gamma delta"
        docs.append((i, text))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_pairs(
        df, vocab_size=10, min_pair_count=2, top_k=10
    ).collect()
    pairs = {(r.token_a, r.token_b): r for r in out}
    ab = pairs[("alpha", "beta")]
    assert ab.n_pair == 10 and ab.n_a == 10 and ab.n_b == 10
    # pmi(alpha,beta) = ln(10·20/(10·10)) = ln 2
    assert ab.pmi == pytest.approx(math.log(2), abs=1e-6)
    # perfectly-coupled pair outranks the gamma pairs
    assert out[0].token_a == "alpha" and out[0].token_b == "beta"
