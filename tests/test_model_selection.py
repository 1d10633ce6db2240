"""Time-series CV splits + grid search over engine estimators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from centimators_spark.model_selection import grid_search, time_series_splits


@pytest.fixture(scope="module")
def ts_df(spark):
    rng = np.random.RandomState(0)
    rows = [
        (i, float(i), float(x), float(2.0 * x + 1.0 + rng.normal() * 0.1))
        for i, x in enumerate(rng.uniform(-5, 5, 600))
    ]
    return spark.createDataFrame(rows, "rid long, t double, x double, y double")


def test_splits_no_leakage_and_expanding(spark, ts_df):
    folds = time_series_splits(ts_df, "t", n_splits=4)
    assert len(folds) == 4
    prev_train = 0
    total = ts_df.count()
    for train, val in folds:
        n_train, n_val = train.count(), val.count()
        assert n_train > 0 and n_val > 0
        assert n_train >= prev_train  # expanding window
        prev_train = n_train
        # temporal ordering: every train timestamp precedes every val one
        max_train = train.agg(F.max("t")).collect()[0][0]
        min_val = val.agg(F.min("t")).collect()[0][0]
        assert max_train < min_val
        assert n_train + n_val <= total
    with pytest.raises(ValueError, match="n_splits"):
        time_series_splits(ts_df, "t", 0)


def test_grid_search_finds_better_model(spark, ts_df):
    """fit_intercept=True must beat False on y = 2x + 1 data; the result
    dict carries per-combination scores."""
    from centimators_spark.ml.estimators import LinearRegressor

    def scorer(est, val):
        scored = est.predict(val)
        row = scored.agg(
            F.sum((F.col("y") - F.col("prediction")) ** 2).alias("ss_res"),
            F.sum(F.col("y") * F.col("y")).alias("ss_yy"),
            F.sum("y").alias("s_y"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        ss_tot = row.ss_yy - row.s_y**2 / row.n
        return 1.0 - row.ss_res / ss_tot

    folds = time_series_splits(ts_df.select("t", "x", "y"), "t", n_splits=3)
    out = grid_search(
        lambda fit_intercept: LinearRegressor(
            ["x"], target="y", fit_intercept=fit_intercept
        ),
        {"fit_intercept": [False, True]},
        folds,
        scorer=scorer,
    )
    assert out["best_params"] == {"fit_intercept": True}
    assert out["best_score"] > 0.99
    assert len(out["results"]) == 2
    means = {r["params"]["fit_intercept"]: r["mean_score"] for r in out["results"]}
    assert means[True] > means[False]
    # the returned estimator is fitted and usable
    assert out["best_estimator"].coef_ is not None


def test_time_series_splits_embargo(spark):
    """Embargoed folds exclude the label-horizon band before each
    validation window; embargo=0 reduces to the plain split."""
    from pyspark.sql import functions as F

    from centimators_spark.model_selection import time_series_splits

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("t"))
    plain = time_series_splits(df, "t", n_splits=3)
    emb = time_series_splits(df, "t", n_splits=3, embargo=50.0)
    for (tr0, va0), (tr1, va1) in zip(plain, emb):
        max_tr1 = tr1.agg(F.max("t")).collect()[0][0]
        min_va1 = va1.agg(F.min("t")).collect()[0][0]
        # the embargo band is excluded from training
        assert min_va1 - max_tr1 >= 50.0
        # validation windows are identical; training only shrinks
        assert va0.count() == va1.count()
        assert tr1.count() <= tr0.count()
    import pytest

    with pytest.raises(ValueError):
        time_series_splits(df, "t", n_splits=3, embargo=-1.0)
