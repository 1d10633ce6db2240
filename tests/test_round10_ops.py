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
