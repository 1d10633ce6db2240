"""Hand-computed semantics for the round-8 staged operators: linear
panel interpolation, 2-D skyline, one-pass correlation matrix."""

import math

import pyspark.sql.functions as F

from centimators_spark.operators.resample import resample_panel
from centimators_spark.operators.skyline import skyline_2d
from centimators_spark.operators.stats import corr_matrix


def _interp(spark, rows, **kw):
    df = spark.createDataFrame(rows, "tkr string, d date, v double")
    out = resample_panel(
        df, ticker_col="tkr", date_col="d", value_cols=["v"],
        fill="linear", **kw
    )
    return {
        (r.tkr, str(r.d)): (r.v, r.is_observed) for r in out.collect()
    }


def test_linear_interp_hand_path(spark):
    import datetime as dt

    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10.0),
        ("a", d(2024, 1, 4), 4.0),   # gap days 2,3: 10 + (-6)*t/3
        ("a", d(2024, 1, 5), 7.0),
    ]
    got = _interp(spark, rows)
    assert got[("a", "2024-01-01")] == (10.0, 1)
    assert got[("a", "2024-01-02")] == (8.0, 0)
    assert got[("a", "2024-01-03")] == (6.0, 0)
    assert got[("a", "2024-01-04")] == (4.0, 1)
    assert got[("a", "2024-01-05")] == (7.0, 1)
    assert len(got) == 5


def test_linear_interp_observed_rows_untouched_exactly(spark):
    import datetime as dt

    d = dt.date
    # irrational-ish value: observed rows must pass through bitwise,
    # not survive a 0/0 or a multiply-divide round trip
    rows = [("a", d(2024, 1, 1), math.pi), ("a", d(2024, 1, 2), -math.e)]
    got = _interp(spark, rows)
    assert got[("a", "2024-01-01")] == (math.pi, 1)
    assert got[("a", "2024-01-02")] == (-math.e, 1)


def test_linear_interp_leading_trailing_gaps_null(spark):
    import datetime as dt

    d = dt.date
    # null observations at the edges -> spine rows before the first /
    # after the last OBSERVED value have no bracket -> stay null
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), None),
            ("a", d(2024, 1, 2), 2.0),
            ("a", d(2024, 1, 4), 6.0),
            ("a", d(2024, 1, 5), None),
        ],
        "tkr string, d date, v double",
    )
    out = resample_panel(
        df, ticker_col="tkr", date_col="d", value_cols=["v"], fill="linear"
    )
    got = {str(r.d): r.v for r in out.collect()}
    assert got["2024-01-01"] is None
    assert got["2024-01-02"] == 2.0
    assert got["2024-01-03"] == 4.0
    assert got["2024-01-04"] == 6.0
    assert got["2024-01-05"] is None


def test_skyline_hand_points(spark):
    # group g: (1,5) front; (2,3) front; (2,4) dominated by (2,3);
    # (3,3) dominated by (2,3) [tie y, strict x]; (4,1) front;
    # (4,1) duplicate -> BOTH kept; (5,2) dominated by (4,1)
    rows = [
        ("g", 1, 1, 5), ("g", 2, 2, 3), ("g", 3, 2, 4), ("g", 4, 3, 3),
        ("g", 5, 4, 1), ("g", 6, 4, 1), ("g", 7, 5, 2),
        # second group: everything incomparable stays
        ("h", 8, 1, 9), ("h", 9, 9, 1),
    ]
    df = spark.createDataFrame(rows, "g string, id int, x long, y long")
    got = sorted((r.g, r.id) for r in skyline_2d(df, "g", "x", "y").collect())
    assert got == [("g", 1), ("g", 2), ("g", 5), ("g", 6), ("h", 8), ("h", 9)]


def test_skyline_partition_invariant(spark):
    rows = [("g", i, (i * 7) % 23, (i * 13) % 19) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, id int, x long, y long")
    a = sorted(r.id for r in skyline_2d(df.repartition(11), "g", "x", "y").collect())
    b = sorted(r.id for r in skyline_2d(df.repartition(3), "g", "x", "y").collect())
    assert a == b and len(a) >= 1
    # brute-force oracle
    pts = {i: ((i * 7) % 23, (i * 13) % 19) for i in range(300)}
    front = [
        i
        for i, (x, y) in pts.items()
        if not any(
            (qx <= x and qy <= y and (qx < x or qy < y))
            for qx, qy in pts.values()
        )
    ]
    assert a == sorted(front)


def test_corr_matrix_hand_values(spark):
    # y = 2x exactly -> corr 1; z anti-correlated with x -> corr -1;
    # w constant -> zero variance -> null
    rows = [(x, 2 * x, 10 - x, 7) for x in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "x long, y long, z long, w long")
    out = corr_matrix(
        df,
        {
            "x": F.col("x"),
            "y": F.col("y"),
            "z": F.col("z"),
            "w": F.col("w"),
        },
    )
    got = {(r.feat_a, r.feat_b): r.corr for r in out.collect()}
    assert len(got) == 6
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("y", "z")] == -1.0
    assert got[("x", "w")] is None and got[("y", "w")] is None
    assert all(r.n == 5 for r in out.collect())


def test_corr_matrix_matches_numpy(spark):
    import numpy as np

    rng = [(i, (i * 37) % 101, (i * i) % 89) for i in range(200)]
    df = spark.createDataFrame(rng, "a long, b long, c long")
    out = corr_matrix(
        df, {"a": F.col("a"), "b": F.col("b"), "c": F.col("c")}
    )
    got = {(r.feat_a, r.feat_b): r.corr for r in out.collect()}
    arr = np.array(rng, dtype=float)
    ref = np.corrcoef(arr.T)
    assert abs(got[("a", "b")] - ref[0, 1]) < 1e-12
    assert abs(got[("a", "c")] - ref[0, 2]) < 1e-12
    assert abs(got[("b", "c")] - ref[1, 2]) < 1e-12
