"""Rank-ensembling: golden values, null skip semantics, DuckDB mirror."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from centimators_spark.ml.ensemble import rank_ensemble, rank_ensemble_oracle_sql


def test_rank_ensemble_golden(spark):
    # one era; preds a: [1,2,3,4] -> ranks .25.. ; b reversed
    df = spark.createDataFrame(
        [(1, i, float(i), float(5 - i)) for i in range(1, 5)],
        "era int, id long, a double, b double",
    )
    out = {r.id: r.ensemble for r in rank_ensemble(df, ["a", "b"], era_col="era").collect()}
    # equal weights of opposite rankings -> constant 0.625 ((0.25+1)/2 etc.)
    assert all(v == pytest.approx(0.625) for v in out.values())
    weighted = {
        r.id: r.ensemble
        for r in rank_ensemble(
            df, ["a", "b"], era_col="era", weights=[3, 1]
        ).collect()
    }
    # id=4: a rank 1.0, b rank 0.25 -> (3*1 + 1*.25)/4 = 0.8125
    assert weighted[4] == pytest.approx(0.8125)


def test_rank_ensemble_null_skip(spark):
    df = spark.createDataFrame(
        [(1, 1, 1.0, None), (1, 2, 2.0, None), (1, 3, None, None)],
        "era int, id long, a double, b double",
    )
    out = {r.id: r.ensemble for r in rank_ensemble(df, ["a", "b"], era_col="era").collect()}
    # b all null -> weight redistributed to a; id3 all null -> null
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(1.0)
    assert out[3] is None
    with pytest.raises(ValueError):
        rank_ensemble(df, [], era_col="era")
    with pytest.raises(ValueError):
        rank_ensemble(df, ["a"], era_col="era", weights=[1, 2])


def test_rank_ensemble_matches_duckdb(spark):
    rng = np.random.RandomState(5)
    pdf = pd.DataFrame(
        {
            "era": rng.randint(0, 4, 200),
            "id": np.arange(200),
            "a": np.where(rng.rand(200) < 0.1, np.nan, rng.rand(200)),
            "b": rng.rand(200),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        rank_ensemble(df, ["a", "b"], era_col="era", weights=[2, 1])
        .select("id", "ensemble")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = (
        con.execute(
            rank_ensemble_oracle_sql(
                "t", ["a", "b"], era_sql="era", select_sql="id",
                weights=[2, 1],
            )
        )
        .fetchdf()
        .sort_values("id")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(
        got["ensemble"].astype(float), exp["ensemble"].astype(float),
        rtol=0, atol=0, equal_nan=True,
    )
