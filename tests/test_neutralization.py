"""Property tests ported from the reference
(/root/reference/tests/test_neutralization.py, FIXTURES.md F3) plus
penalizer exposure-cap checks (test_penalizer_comparison.py:250-338).
"""

import math

import numpy as np
import pandas as pd
import pytest

from centimators_spark.functions.normal import gaussianize, norm_ppf
from centimators_spark.operators.neutralization import FeatureNeutralizer
from centimators_spark.operators.penalization import FeaturePenalizer, exposures


def _make_test_data(n=100, k=5, n_eras=5, seed=42):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n, k)
    preds = feats @ rng.randn(k) + 0.1 * rng.randn(n)
    pdf = pd.DataFrame(feats, columns=[f"feature{i}" for i in range(k)])
    pdf["prediction"] = preds
    pdf["era"] = [f"era{i // (n // n_eras)}" for i in range(n)]
    pdf["rid"] = np.arange(n)
    return pdf


@pytest.fixture(scope="module")
def era_df(spark):
    return spark.createDataFrame(_make_test_data())


FEATS = [f"feature{i}" for i in range(5)]


def test_norm_ppf_known_values():
    # golden quantiles (standard normal)
    assert abs(norm_ppf(np.array([0.975]))[0] - 1.959963984540054) < 1e-12
    assert abs(norm_ppf(np.array([0.5]))[0]) < 1e-15
    assert abs(norm_ppf(np.array([0.0013498980316300933]))[0] + 3.0) < 1e-9
    assert norm_ppf(np.array([0.0]))[0] == -np.inf
    assert math.isnan(norm_ppf(np.array([1.5]))[0])


def test_gaussianize_ordinal_ties():
    out = gaussianize(np.array([1.0, 1.0, 2.0]))
    # ordinal: ties broken by position -> ranks 1,2,3
    expected = norm_ppf((np.array([1.0, 2.0, 3.0]) - 0.5) / 3)
    np.testing.assert_allclose(out, expected)


def test_neutralizer_shape_names_and_range(spark, era_df):
    t = FeatureNeutralizer(
        proportion=0.5, pred_name="prediction", feature_names=FEATS,
        era_col="era", order_col="rid", keep_cols=["rid"],
    )
    out = t.transform(era_df).toPandas()
    assert len(out) == 100
    assert "prediction_neutralized_0.5" in out.columns
    v = out["prediction_neutralized_0.5"]
    assert v.min() >= 0.0 and v.max() <= 1.0
    assert abs(v.min()) < 1e-9 and abs(v.max() - 1.0) < 1e-9


def test_neutralizer_reduces_exposure(spark, era_df):
    t = FeatureNeutralizer(
        proportion=1.0, pred_name="prediction", feature_names=FEATS,
        era_col="era", order_col="rid", keep_cols=["rid"],
    )
    out = t.transform(era_df).toPandas().sort_values("rid").reset_index(drop=True)
    pdf = _make_test_data()
    for era in pdf.era.unique():
        mask = (pdf.era == era).to_numpy()
        X = pdf.loc[mask, FEATS].to_numpy()
        before = np.abs(exposures(X, gaussianize(pdf.loc[mask, "prediction"].to_numpy())[:, None])).max()
        after = np.abs(
            exposures(X, out.loc[mask, "prediction_neutralized_1.0"].to_numpy()[:, None])
        ).max()
        assert after < before


def test_neutralizer_multi_proportion_and_suffix(spark, era_df):
    t = FeatureNeutralizer(
        proportion=[0.25, 0.75], pred_name="prediction", feature_names=FEATS,
        suffix="v2", era_col="era", order_col="rid",
    )
    out = t.transform(era_df)
    assert "prediction_neutralized_0.25_v2" in out.columns
    assert "prediction_neutralized_0.75_v2" in out.columns
    assert t.get_feature_names_out() == [
        "prediction_neutralized_0.25_v2",
        "prediction_neutralized_0.75_v2",
    ]


def test_neutralizer_validates():
    with pytest.raises(ValueError):
        FeatureNeutralizer(proportion=1.5)
    with pytest.raises(ValueError):
        FeatureNeutralizer(pred_name=["a", "a"])


def test_neutralizer_matches_local_reference_math(spark, era_df):
    """Differential test: Spark output == straight numpy recomputation of
    the reference algorithm on driver (same data, same order)."""
    t = FeatureNeutralizer(
        proportion=0.5, pred_name="prediction", feature_names=FEATS,
        era_col="era", order_col="rid", keep_cols=["rid"],
    )
    got = (
        t.transform(era_df).toPandas().sort_values("rid")["prediction_neutralized_0.5"].to_numpy()
    )
    pdf = _make_test_data()
    neut = np.zeros(len(pdf))
    for era in pdf.era.unique():
        m = (pdf.era == era).to_numpy()
        X = pdf.loc[m, FEATS].to_numpy()
        g = gaussianize(pdf.loc[m, "prediction"].to_numpy())
        coeffs, *_ = np.linalg.lstsq(X, g, rcond=None)
        v = g - 0.5 * (X @ coeffs)
        neut[m] = v / np.std(v)
    expected = (neut - neut.min()) / (neut.max() - neut.min())
    np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-12)


def test_penalizer_caps_exposure(spark):
    # reference penalizer fixture (test_penalizer_comparison.py:225-242):
    # randn features, only 3 of 10 weighted, 2 eras of 100
    np.random.seed(42)
    n, k = 200, 10
    features = np.random.randn(n, k)
    weights = np.array([0.5, -0.4, 0.3, 0, 0, 0, 0, 0, 0, 0.0])
    preds = features @ weights + np.random.randn(n) * 0.1
    feats = [f"feature{i}" for i in range(k)]
    pdf = pd.DataFrame(features, columns=feats)
    pdf["prediction"] = preds
    pdf["era"] = ["era1"] * 100 + ["era2"] * 100
    pdf["rid"] = np.arange(n)
    df = spark.createDataFrame(pdf)
    max_exp = 0.1
    t = FeaturePenalizer(
        max_exposure=max_exp, pred_name="prediction", feature_names=feats,
        era_col="era", order_col="rid", keep_cols=["rid"],
    )
    out = t.transform(df).toPandas().sort_values("rid").reset_index(drop=True)
    col = f"prediction_penalized_{max_exp}"
    assert out[col].between(0, 1).all()
    for era in pdf.era.unique():
        m = (pdf.era == era).to_numpy()
        X = (pdf.loc[m, feats].to_numpy() - 0.5).astype(np.float32)
        y = out.loc[m, col].to_numpy()[:, None]
        exp_after = np.abs(exposures(X, y)).max()
        # reference cross-framework tolerance: cap + 0.01
        assert exp_after <= max_exp + 0.01, exp_after


def test_penalizer_factored_matches_direct():
    """The O(k²)-per-iter factored kernel tracks the direct kernel within
    the reference's own cross-framework bar (corr > 0.95, cap + 0.01)."""
    from centimators_spark.operators.penalization import (
        reduce_exposure,
        reduce_exposure_factored,
    )

    np.random.seed(42)
    n, k = 200, 10
    features = np.random.randn(n, k)
    weights = np.array([0.5, -0.4, 0.3, 0, 0, 0, 0, 0, 0, 0.0])
    preds = gaussianize(features @ weights + np.random.randn(n) * 0.1)
    out_d = reduce_exposure(preds, features, 0.1)
    out_f = reduce_exposure_factored(preds, features, 0.1)
    assert np.corrcoef(out_d, out_f)[0, 1] > 0.999
    fe = (features - 0.5).astype(np.float32)
    assert np.abs(exposures(fe, out_f[:, None].astype(np.float32))).max() <= 0.11


def test_neutralizer_single_era_fallback(spark, era_df):
    t = FeatureNeutralizer(
        proportion=0.5, pred_name="prediction", feature_names=FEATS,
        era_col=None, order_col="rid", keep_cols=["rid"],
    )
    with pytest.warns(UserWarning, match="single era"):
        out = t.transform(era_df).toPandas()
    assert len(out) == 100
    assert out["prediction_neutralized_0.5"].between(0, 1).all()


def test_era_ols_neutralize_matches_numpy(spark):
    """Differential: the pure-expression distributed path reproduces a
    per-era numpy OLS neutralization (to rounding tolerance)."""
    from centimators_spark.operators.neutralization import era_ols_neutralize

    rng = np.random.RandomState(7)
    n = 300
    pdf = pd.DataFrame({
        "rid": np.arange(n),
        "era": np.repeat(["a", "b", "c"], n // 3),
        "f0": rng.randint(1, 50, n).astype(float),
        "f1": rng.randint(0, 10, n).astype(float),
        "f2": rng.randint(0, 8, n).astype(float),
        "y": rng.randint(100, 10_000, n).astype(float),
    })
    df = spark.createDataFrame(pdf)
    out = (
        era_ols_neutralize(
            df, "y", ["f0", "f1", "f2"], era_col="era",
            proportion=0.5, keep_cols=["rid"],
        )
        .orderBy("rid")
        .toPandas()
    )
    assert out["neutralized"].between(0, 1).all()

    # numpy reference
    neut = np.empty(n)
    for era in ("a", "b", "c"):
        m = (pdf.era == era).to_numpy()
        X = pdf.loc[m, ["f0", "f1", "f2"]].to_numpy()
        y = pdf.loc[m, "y"].to_numpy()
        beta = np.linalg.lstsq(X, y, rcond=None)[0]
        r = np.round(y - 0.5 * (X @ beta), 6)
        neut[m] = np.round(r / r.std(), 6)
    mn, mx = neut.min(), neut.max()
    expected = np.round((neut - mn) / (mx - mn), 6)
    np.testing.assert_allclose(
        out.sort_values("rid")["neutralized"].to_numpy(), expected, atol=2e-6
    )


def test_era_ols_neutralize_feature_cap():
    from centimators_spark.operators.neutralization import era_ols_neutralize

    with pytest.raises(ValueError, match="5 features"):
        era_ols_neutralize(None, "y", list("abcdef"), era_col="era")


def test_norm_ppf_sql_matches_numpy(spark):
    """The shared-SQL-text AS241 matches the numpy kernel to float
    noise across the full (0,1) domain incl. both tail branches."""
    from pyspark.sql import functions as F

    from centimators_spark.functions.normal import norm_ppf, norm_ppf_sql

    us = np.concatenate([
        np.array([1e-12, 1e-9, 1e-6, 1e-3, 0.075, 0.0751]),  # far+near tails
        np.linspace(0.08, 0.92, 41),                          # central
        1.0 - np.array([1e-12, 1e-9, 1e-6, 1e-3, 0.075]),
    ])
    df = spark.createDataFrame([(float(u),) for u in us], "u double")
    got = (
        df.withColumn("z", F.expr(norm_ppf_sql("u")))
        .orderBy("u")
        .toPandas()
    )
    expected = norm_ppf(np.sort(us))
    np.testing.assert_allclose(got["z"], expected, rtol=1e-12, atol=1e-12)


def test_gaussianize_expr_matches_kernel(spark):
    """Window+expression gaussianize == the applyInPandas numpy kernel
    (same ordinal tie order), to the 6dp rounding."""
    from centimators_spark.operators.neutralization import (
        gaussianize_expr,
        gaussianize_stage,
    )

    rng = np.random.RandomState(3)
    vals = np.round(rng.uniform(0, 100, 200), 1)  # duplicates → ties
    pdf = pd.DataFrame({
        "rid": np.arange(200),
        "era": np.repeat(["a", "b"], 100),
        "x": vals,
    })
    df = spark.createDataFrame(pdf)
    expr_out = (
        gaussianize_expr(df, "x", era_col="era", order_col="rid")
        .orderBy("rid")
        .toPandas()["x_gauss"]
        .to_numpy()
    )
    u = (
        gaussianize_stage(df, "x", era_col="era", order_col="rid",
                          keep_cols=["rid"])
        .orderBy("rid")
        .toPandas()["x_gauss_u"]
        .to_numpy()
    )
    from centimators_spark.functions.normal import norm_ppf

    np.testing.assert_allclose(expr_out, np.round(norm_ppf(u), 6), atol=1e-9)


def test_full_expr_neutralizer_matches_kernel(spark):
    """The pure-expression gaussianize+OLS neutralizer tracks the
    applyInPandas FeatureNeutralizer kernel (which uses unrounded Φ⁻¹
    and numpy lstsq) to rounding tolerance on integer features."""
    from pyspark.sql import functions as F

    from centimators_spark.operators.neutralization import (
        era_ols_neutralize,
        gaussianize_expr,
    )

    rng = np.random.RandomState(11)
    n = 400
    pdf = pd.DataFrame({
        "rid": np.arange(n),
        "era": np.repeat(["a", "b"], n // 2),
        "f0": rng.randint(1, 50, n).astype(float),
        "f1": rng.randint(0, 10, n).astype(float),
        "pred": rng.uniform(0, 1000, n).round(2),
    })
    df = spark.createDataFrame(pdf)

    g = gaussianize_expr(df, "pred", era_col="era", order_col="rid")
    g = g.withColumn("y6", F.round(F.col("pred_gauss") * 1e6))
    expr_out = (
        era_ols_neutralize(
            g, "y6", ["f0", "f1"], era_col="era", proportion=0.5,
            keep_cols=["rid"],
        )
        .orderBy("rid")
        .toPandas()["neutralized"]
        .to_numpy()
    )

    kernel = FeatureNeutralizer(
        proportion=0.5, pred_name="pred", feature_names=["f0", "f1"],
        era_col="era", order_col="rid", keep_cols=["rid"],
    )
    kernel_out = (
        kernel.transform(df)
        .orderBy("rid")
        .toPandas()["pred_neutralized_0.5"]
        .to_numpy()
    )
    assert np.corrcoef(expr_out, kernel_out)[0, 1] > 0.999999
    np.testing.assert_allclose(expr_out, kernel_out, atol=2e-4)
