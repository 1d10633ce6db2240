"""Declarative validation: single-pass column checks + anti-join FKs."""

import pytest
from pyspark.sql import functions as F

from centimators_spark.validate import (
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    unique,
    validate,
    violations,
)


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "x-1"),
            (2, "b", -5.0, "x-2"),
            (2, None, 3.0, "y-9"),
            (4, "z", None, "x-3"),
        ],
        "id long, cat string, v double, code string",
    )


def test_validate_column_checks(spark, frame):
    rep = {
        (r.check, r.column): r
        for r in validate(
            frame,
            [
                not_null("cat"),
                unique("id"),
                in_range("v", 0, None),
                in_set("cat", ["a", "b"]),
                matches("code", r"^x-\d$"),
            ],
        ).collect()
    }
    assert rep[("not_null", "cat")].n_violations == 1
    assert rep[("unique", "id")].n_violations == 1  # id=2 twice -> 1 extra
    assert rep[("in_range", "v")].n_violations == 1  # -5; null not counted
    assert rep[("in_set", "cat")].n_violations == 1  # 'z'; null not counted
    assert rep[("matches", "code")].n_violations == 1  # 'y-9'
    assert not rep[("unique", "id")].passed
    # all checks ran in one aggregation pass + stack
    assert len(rep) == 5


def test_validate_foreign_key_and_pass(spark, frame):
    dim = spark.createDataFrame([(1,), (2,)], "key long")
    rep = {
        r.check: r
        for r in validate(frame, [foreign_key("id", dim, "key")]).collect()
    }
    assert rep["foreign_key"].n_violations == 1  # id=4 orphaned
    ok = spark.createDataFrame([(k,) for k in (1, 2, 4)], "key long")
    [r] = validate(frame, [foreign_key("id", ok, "key")]).collect()
    assert r.passed and r.n_violations == 0


def test_violations_rows(spark, frame):
    bad = violations(frame, in_range("v", 0, None)).collect()
    assert [r.v for r in bad] == [-5.0]
    dups = violations(frame, unique("id")).collect()
    assert sorted(r.id for r in dups) == [2, 2]
    with pytest.raises(ValueError):
        validate(frame, [])
    with pytest.raises(ValueError):
        in_range("v")


def test_validate_empty_table_vacuous(spark):
    empty = spark.createDataFrame([], "id long, cat string")
    rep = validate(empty, [not_null("cat"), unique("id")]).collect()
    assert all(r.passed for r in rep)


def test_validate_approx_unique_never_negative(spark):
    """HLL overestimates must clamp to zero violations, not fail a
    clean unique column with a negative count."""
    df = spark.createDataFrame([(i,) for i in range(5000)], "id long")
    [r] = validate(df, [unique("id")], approx_unique=True).collect()
    assert r.n_violations >= 0
    # a genuinely duplicated column still fails in approx mode
    dup = spark.createDataFrame([(i % 10,) for i in range(5000)], "id long")
    [r2] = validate(dup, [unique("id")], approx_unique=True).collect()
    assert not r2.passed and r2.n_violations > 4000


def test_observed_validation_rides_the_action(spark, frame):
    """Observation counters equal the separate-scan validate() report
    and are collected by the caller's OWN action (no extra scan)."""
    from centimators_spark.validate import observed_validation

    checks = [not_null("cat"), in_range("v", 0, None), in_set("cat", ["a", "b"])]
    observed, obs = observed_validation(frame, checks)
    # the caller's action: a write-shaped full pass
    n = observed.count()
    assert n == 4
    got = obs.get
    assert got["not_null:cat"] == 1
    assert got["in_range:v"] == 1
    assert got["in_set:cat"] == 1
    # parity with the separate-scan report
    rep = {
        (r.check, r.column): r.n_violations
        for r in validate(frame, checks).collect()
    }
    for key, v in got.items():
        kind, col = key.split(":")
        assert rep[(kind, col)] == v, key
    with pytest.raises(ValueError):
        observed_validation(frame, [unique("id")])
    with pytest.raises(ValueError):
        observed_validation(frame, [])
