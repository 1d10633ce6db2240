"""Feature-encoding operators: target encoding (smoothed + LOO),
quantile binning, feature hashing. Contract queries pin the bit-exact
oracles; these tests pin the semantics the contract can't show."""

import math

import pyspark.sql.functions as F
import pytest

from centimators_spark.operators.encoding import (
    feature_hash,
    quantile_bin,
    target_encode,
)


def test_target_encode_smoothed_values(spark):
    # two categories: a -> targets {1, 3}, b -> {10}; prior = 14/3
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 10.0)],
        "id long, c string, y double",
    )
    out = {
        r.id: r.te
        for r in target_encode(
            df, "c", "y", smoothing=2.0, out_col="te"
        ).collect()
    }
    prior = 14.0 / 3.0
    exp_a = (4.0 + 2.0 * prior) / (2.0 + 2.0)
    exp_b = (10.0 + 2.0 * prior) / (1.0 + 2.0)
    assert math.isclose(out[1], round(exp_a, 6))
    assert math.isclose(out[2], round(exp_a, 6))
    assert math.isclose(out[3], round(exp_b, 6))


def test_target_encode_loo_excludes_own_row_and_singletons(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, "b", 10.0)],
        "id long, c string, y double",
    )
    out = {
        r.id: r.te
        for r in target_encode(
            df, "c", "y", smoothing=0.0, loo=True, out_col="te"
        ).collect()
    }
    # LOO with zero smoothing: row 1 sees only row 2's target and v.v.
    assert math.isclose(out[1], 3.0)
    assert math.isclose(out[2], 1.0)
    # singleton category falls back to the prior
    assert math.isclose(out[3], round(14.0 / 3.0, 6))


def test_target_encode_era_scoping(spark):
    df = spark.createDataFrame(
        [(1, "e1", "a", 1.0), (2, "e2", "a", 100.0)],
        "id long, era string, c string, y double",
    )
    out = {
        r.id: r.te
        for r in target_encode(
            df, "c", "y", smoothing=1.0, era_col="era", out_col="te"
        ).collect()
    }
    # same category, different eras: stats never mix (each era's prior
    # equals its only value)
    assert math.isclose(out[1], 1.0)
    assert math.isclose(out[2], 100.0)


def test_quantile_bin_population_and_nulls(spark):
    rows = [(i, float(i)) for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "id long, x double")
    out = quantile_bin(df, ["x"], n_bins=4, exact=True).collect()
    bins = {r.id: r.x_bin for r in out}
    assert bins[100] is None
    nonnull = [b for i, b in bins.items() if i != 100]
    # 4 roughly equal-population bins, ordered with x
    assert set(nonnull) == {0, 1, 2, 3}
    assert bins[0] == 0 and bins[99] == 3
    for i in range(99):
        assert bins[i] <= bins[i + 1]
    with pytest.raises(ValueError):
        quantile_bin(df, ["x"], n_bins=1)


def test_feature_hash_stable_and_bounded(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "de"), (3, None)], "id long, lang string"
    )
    out1 = {r.id: r.lang_fh for r in feature_hash(df, ["lang"], n_buckets=64).collect()}
    out2 = {
        r.id: r.lang_fh
        for r in feature_hash(df.repartition(5), ["lang"], n_buckets=64).collect()
    }
    assert out1 == out2  # partition-invariant
    assert out1[3] is None
    assert all(v is None or 0 <= v < 64 for v in out1.values())
    # same value in a different column must hash differently (column
    # name is part of the key)
    df2 = df.withColumnRenamed("lang", "other")
    out3 = {r.id: r.other_fh for r in feature_hash(df2, ["other"], n_buckets=64).collect()}
    assert out3[1] != out1[1] or out3[2] != out1[2]


def test_target_encode_keeps_null_category_rows(spark):
    """NULL categories form their own group and their rows stay in the
    output (null-safe stats join), same for NULL eras."""
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, None, 3.0), (3, None, 5.0)],
        "id long, c string, y double",
    )
    out = {r.id: r.te for r in target_encode(
        df, "c", "y", smoothing=0.0, out_col="te"
    ).collect()}
    assert len(out) == 3
    assert out[2] == out[3] == 4.0  # the NULL-category mean
    df2 = spark.createDataFrame(
        [(1, None, "a", 2.0), (2, None, "a", 4.0)],
        "id long, era string, c string, y double",
    )
    out2 = target_encode(df2, "c", "y", smoothing=0.0, era_col="era",
                         out_col="te").collect()
    assert len(out2) == 2 and all(r.te == 3.0 for r in out2)


def test_quantile_bin_keeps_null_era_rows(spark):
    df = spark.createDataFrame(
        [(1, "e", 1.0), (2, "e", 2.0), (3, None, 5.0), (4, None, 6.0)],
        "id long, era string, x double",
    )
    out = quantile_bin(df, ["x"], n_bins=2, era_col="era", exact=True)
    assert out.count() == 4
