"""Declarative data-quality validation — the Deequ/dbt-tests shape: a
list of constraints compiles into ONE aggregation pass over the table
(plus one anti-join per referential check), returning a small results
frame instead of raising mid-pipeline.

Column constraints (not_null, unique, in_range, in_set, matches) all
become conditional counts inside a single `agg()` — one scan, map-side
partial, no matter how many checks. `unique` uses exact
count(DISTINCT) by default (EXPAND-planned, exact) or a mergeable HLL
estimate with ``approx=True`` for 100 TB sweeps where a tiny
uniqueness slack is acceptable. Referential checks are LEFT ANTI joins
(broadcast when the dimension is small — Catalyst decides).

Usage::

    from centimators_spark.validate import (
        foreign_key, in_range, in_set, matches, not_null, unique, validate)

    report = validate(orders, [
        not_null("o_orderkey"),
        unique("o_orderkey"),
        in_range("o_totalprice", 0, None),
        in_set("o_orderstatus", ["F", "O", "P"]),
        matches("o_orderpriority", r"^[1-5]-"),
        foreign_key("o_custkey", customer, "c_custkey"),
    ])
    # -> rows (check, column, passed, n_violations) — empty-input
    #    tables pass every column check vacuously

Reference scope: the reference has no validation surface; this is
engine tooling in SURVEY.md §2.3's training-data spirit (bad rows at
100 TB are found by scans, not by exceptions).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    kind: str
    column: str
    params: tuple = field(default=())
    ref: Any = None  # (DataFrame, key) for foreign_key


def not_null(column: str) -> Check:
    return Check("not_null", column)


def unique(column: str) -> Check:
    return Check("unique", column)


def in_range(column: str, lo=None, hi=None) -> Check:
    if lo is None and hi is None:
        raise ValueError("in_range needs lo and/or hi")
    return Check("in_range", column, (lo, hi))


def in_set(column: str, values: Sequence) -> Check:
    return Check("in_set", column, tuple(values))


def matches(column: str, regex: str) -> Check:
    return Check("matches", column, (regex,))


def foreign_key(column: str, dim: DataFrame, key: str) -> Check:
    return Check("foreign_key", column, (key,), ref=dim)


def _violation_expr(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return col.isNull()
    if c.kind == "in_range":
        lo, hi = c.params
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (col < F.lit(lo))
        if hi is not None:
            bad = bad | (col > F.lit(hi))
        # nulls are not range violations (compose with not_null)
        return col.isNotNull() & bad
    if c.kind == "in_set":
        return col.isNotNull() & ~col.isin(list(c.params))
    if c.kind == "matches":
        (regex,) = c.params
        return col.isNotNull() & ~col.rlike(regex)
    raise ValueError(f"unknown check kind {c.kind}")


def validate(
    df: DataFrame,
    checks: Sequence[Check],
    *,
    approx_unique: bool = False,
) -> DataFrame:
    """Run all checks; returns (check, column, passed, n_violations).

    For `unique`, n_violations counts rows beyond the first per
    duplicated value (count − countDistinct over non-null values; null
    keys are not uniqueness violations — compose with not_null)."""
    agg_checks = [c for c in checks if c.kind != "foreign_key"]
    fk_checks = [c for c in checks if c.kind == "foreign_key"]

    results: list[DataFrame] = []
    if agg_checks:
        aggs = []
        for i, c in enumerate(agg_checks):
            if c.kind == "unique":
                nd = (
                    F.approx_count_distinct(c.column)
                    if approx_unique
                    else F.countDistinct(c.column)
                )
                # HLL can OVERestimate: clamp at 0 so a clean unique
                # column never reports negative violations / fails
                aggs.append(
                    F.greatest(
                        F.lit(0).cast("long"),
                        (F.count(F.col(c.column)) - nd).cast("long"),
                    ).alias(f"v{i}")
                )
            else:
                aggs.append(
                    F.count(F.when(_violation_expr(c), 1))
                    .cast("long")
                    .alias(f"v{i}")
                )
        wide = df.agg(*aggs)
        parts = ", ".join(
            f"'{c.kind}', '{c.column}', v{i}" for i, c in enumerate(agg_checks)
        )
        results.append(
            wide.selectExpr(
                f"stack({len(agg_checks)}, {parts}) AS "
                "(check, column, n_violations)"
            )
        )
    for c in fk_checks:
        (key,) = c.params
        orphans = (
            df.select(F.col(c.column))
            .where(F.col(c.column).isNotNull())
            .join(c.ref.select(F.col(key)), F.col(c.column) == F.col(key), "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
            .select(
                F.lit("foreign_key").alias("check"),
                F.lit(c.column).alias("column"),
                "n_violations",
            )
        )
        results.append(orphans)
    if not results:
        raise ValueError("no checks given")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.select(
        "check", "column", (F.col("n_violations") == 0).alias("passed"),
        "n_violations",
    )


def violations(df: DataFrame, check: Check, limit: int = 20) -> DataFrame:
    """The offending rows for ONE column check (debugging companion to
    the aggregate report) — pushdown-friendly filter + limit."""
    if check.kind == "foreign_key":
        (key,) = check.params
        return (
            df.where(F.col(check.column).isNotNull())
            .join(
                check.ref.select(F.col(key)),
                F.col(check.column) == F.col(key),
                "left_anti",
            )
            .limit(limit)
        )
    if check.kind == "unique":
        from pyspark.sql import Window

        w = Window.partitionBy(check.column)
        return (
            df.where(F.col(check.column).isNotNull())
            .withColumn("__n", F.count(F.lit(1)).over(w))
            .where(F.col("__n") > 1)
            .drop("__n")
            .limit(limit)
        )
    return df.where(_violation_expr(check)).limit(limit)


def observed_validation(df: DataFrame, checks: Sequence[Check]):
    """Zero-extra-scan validation: attach the column checks as an
    ``Observation`` on ``df`` — violation counters are collected DURING
    whatever action the caller already runs (the write, the aggregate),
    not by a second scan. The 100 TB shape of data-quality monitoring:
    the table is read once, the counters ride the same pass.

    Returns ``(observed_df, observation)``; after any action on
    ``observed_df``, ``observation.get`` is a dict
    ``{"{kind}:{column}": n_violations}``. Foreign-key checks need a
    join and cannot ride an observation — pass them to
    :func:`validate` instead (a ValueError here keeps the contract
    explicit). ``unique`` is likewise excluded: count(DISTINCT) is not
    an observable metric (it would force the extra pass this API
    exists to avoid) — use :func:`validate` or a batch HLL.
    """
    from pyspark.sql import Observation

    bad_kinds = {c.kind for c in checks} & {"foreign_key", "unique"}
    if bad_kinds:
        raise ValueError(
            f"{sorted(bad_kinds)} checks cannot ride an observation — "
            "use validate() for them"
        )
    if not checks:
        raise ValueError("no checks given")
    obs = Observation("validation")
    metrics = [
        F.count(F.when(_violation_expr(c), 1))
        .cast("long")
        .alias(f"{c.kind}:{c.column}")
        for c in checks
    ]
    return df.observe(obs, *metrics), obs
