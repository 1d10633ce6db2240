"""Extension surfaces (pandas UDF / UDAF / UDTF) each match their
native-expression twin."""

import math

import pytest
from pyspark.sql import functions as F

from centimators_spark.extensions import (
    norm_ppf_udf,
    parse_props_udtf,
    props_kv_native,
    weighted_mean_udaf,
)


def test_scalar_pandas_udf_matches_as241_expr(spark):
    from centimators_spark.functions.normal import norm_ppf_sql

    df = spark.range(1, 100).select(
        (F.col("id") / 100.0).alias("p")
    )
    ppf = norm_ppf_udf()
    out = df.select(
        "p", ppf("p").alias("scipy"), F.expr(norm_ppf_sql("p")).alias("as241")
    ).collect()
    for r in out:
        assert r.scipy == pytest.approx(r.as241, abs=1e-9), r.p


def test_grouped_agg_udaf_matches_native(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0), ("b", 20.0, 0.0)],
        "g string, v double, w double",
    )
    wm = weighted_mean_udaf()
    got = {r.g: r.wm for r in df.groupBy("g").agg(wm("v", "w").alias("wm")).collect()}
    nat = {
        r.g: r.wm
        for r in df.groupBy("g")
        .agg((F.sum(F.col("v") * F.col("w")) / F.sum("w")).alias("wm"))
        .collect()
    }
    assert got["a"] == pytest.approx(nat["a"]) == pytest.approx(2.5)
    assert got["b"] == pytest.approx(nat["b"]) == pytest.approx(10.0)


def test_udtf_matches_native_json_explode(spark):
    df = spark.createDataFrame(
        [('{"a": "1", "b": "x"}',), ('{"c": null}',), ("not json",), (None,)],
        "props string",
    )
    ParseProps = parse_props_udtf()
    spark.udtf.register("parse_props", ParseProps)
    df.createOrReplaceTempView("propstab")
    got = sorted(
        (r.key, r.value)
        for r in spark.sql(
            "SELECT p.* FROM propstab, LATERAL parse_props(props) p"
        ).collect()
    )
    nat = sorted(
        (r.key, r.value)
        for r in props_kv_native(df.where(F.col("props").rlike("^\\{"))).collect()
    )
    assert got == nat == [("a", "1"), ("b", "x"), ("c", None)]
