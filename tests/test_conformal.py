"""Split conformal intervals: order-statistic exactness, coverage
property, era isolation, DuckDB mirror."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from centimators_spark.ml.conformal import (
    conformal_interval,
    conformal_quantiles,
    conformal_quantiles_oracle_sql,
)


def test_conformal_quantile_is_kth_order_statistic(spark):
    # residuals |t - p| = 1..10; alpha=0.2, n=10 -> k = ceil(11*0.8) = 9
    rows = [(float(i), 0.0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "t double, p double")
    [r] = conformal_quantiles(df, "p", "t", alpha=0.2).collect()
    assert (r.n_calib, r.q) == (10, 9.0)
    # tiny calibration: corrected rank exceeds n -> clamp to max residual
    small = spark.createDataFrame(rows[:3], "t double, p double")
    [r2] = conformal_quantiles(small, "p", "t", alpha=0.05).collect()
    assert r2.q == 3.0
    with pytest.raises(ValueError):
        conformal_quantiles(df, "p", "t", alpha=0)


def test_conformal_coverage_property(spark):
    rng = np.random.RandomState(17)
    n = 2000
    pred = rng.uniform(0, 10, n)
    y = pred + rng.normal(0, 1.0, n)
    half = n // 2
    calib = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(pred[:half], y[:half])],
        "p double, t double",
    )
    test = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(pred[half:], y[half:])],
        "p double, t double",
    )
    out = conformal_interval(calib, test, "p", "t", alpha=0.1).toPandas()
    covered = ((out.t >= out.p_lo) & (out.t <= out.p_hi)).mean()
    assert covered >= 0.86, covered  # 1 - alpha with sampling slack


def test_conformal_era_isolation_and_oracle(spark):
    import duckdb

    # era 0 tight residuals, era 1 wide; era 2 only in scoring
    rows = [(0, float(i), i + 0.1 * i) for i in range(1, 21)] + [
        (1, float(i), i + 1.0 * i) for i in range(1, 21)
    ]
    calib = spark.createDataFrame(rows, "era int, p double, t double")
    q = {r.era: r.q for r in conformal_quantiles(calib, "p", "t", era_col="era").collect()}
    assert q[0] < q[1]

    score = spark.createDataFrame(
        [(0, 5.0), (1, 5.0), (2, 5.0)], "era int, p double"
    )
    out = {r.era: r for r in conformal_interval(
        calib, score.withColumn("t", F.lit(None).cast("double")),
        "p", "t", era_col="era", alpha=0.1,
    ).collect()}
    assert out[0].p_hi - out[0].p_lo < out[1].p_hi - out[1].p_lo
    assert out[2].q is None and out[2].p_lo is None  # unseen era surfaces

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE c AS SELECT * FROM (VALUES "
        + ", ".join(f"({e}, {p}, {t})" for e, p, t in rows)
        + ") v(era, p, t)"
    )
    # VALUES literals land as DECIMAL in DuckDB; parquet data is DOUBLE
    exp = {
        r[0]: (r[1], float(r[2]))
        for r in con.execute(
            conformal_quantiles_oracle_sql("c", "p", "t", era_sql="era")
        ).fetchall()
    }
    got = {
        r.era: (r.n_calib, r.q)
        for r in conformal_quantiles(calib, "p", "t", era_col="era").collect()
    }
    assert got == exp


def test_mutual_information_golden_and_oracle(spark):
    """MI golden values (perfect dependence = H(Y); independence = 0),
    ranking catches the nonlinear feature, DuckDB mirror bitwise."""
    import math

    import duckdb

    from centimators_spark.ml.feature_selection import (
        mutual_information,
        mutual_information_oracle_sql,
    )

    rng = np.random.RandomState(23)
    n = 4000
    y = rng.randint(0, 2, n)
    x_perfect = y.copy()                      # MI = H(Y) = ln 2
    x_noise = rng.randint(0, 2, n)            # MI ~ 0
    x_vshape = rng.randint(-2, 3, n)          # y depends on |x|
    y_v = (np.abs(x_vshape) >= 2).astype(int)
    rows = [
        (int(a), int(b), int(c), int(d), int(e))
        for a, b, c, d, e in zip(x_perfect, x_noise, x_vshape, y, y_v)
    ]
    df = spark.createDataFrame(rows, "xp int, xn int, xv int, y int, yv int")

    out = {r.feature: r.mi for r in mutual_information(df, ["xp", "xn"], "y").collect()}
    assert out["xp"] == pytest.approx(math.log(2), abs=2e-3)
    assert out["xn"] == pytest.approx(0.0, abs=2e-3)

    # V-shape: Pearson corr ~ 0 but MI large
    [r] = mutual_information(df, ["xv"], "yv").collect()
    assert r.mi > 0.3
    corr = df.agg(F.corr("xv", "yv")).collect()[0][0]
    assert abs(corr) < 0.1

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({a},{b},{c},{d},{e})" for a, b, c, d, e in rows)
        + ") v(xp, xn, xv, y, yv)"
    )
    exp = con.execute(
        mutual_information_oracle_sql("t", {"xp": "xp", "xn": "xn"}, "y")
    ).fetchall()
    got = mutual_information(df, ["xp", "xn"], "y").collect()
    assert [(r.feature, r.n, r.mi) for r in got] == [tuple(e) for e in exp]

    with pytest.raises(ValueError):
        mutual_information(df, [], "y")


def test_conformal_empty_calibration_surfaces_nulls(spark):
    """Global mode with an all-null calibration must keep every scored
    row with null bounds (regression: crossJoin silently dropped them)."""
    calib = spark.createDataFrame(
        [(1.0, None), (2.0, None)], "p double, t double"
    )
    score = spark.createDataFrame([(5.0,), (6.0,)], "p double")
    out = conformal_interval(
        calib, score.withColumn("t", F.lit(None).cast("double")), "p", "t"
    ).collect()
    assert len(out) == 2
    assert all(r.q is None and r.p_lo is None and r.p_hi is None for r in out)
