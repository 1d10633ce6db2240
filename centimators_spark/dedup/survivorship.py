"""Golden-record construction (survivorship): collapse every cluster
of duplicate/linked records into ONE best row by per-column rules —
the step after matching (`dedup/linkage.py`, `dedup/cluster.py`) in
any MDM/entity-resolution pipeline, and the profile builder a
training-data pipeline runs over event streams (one row per user).

Rules are per-output-column aggregations chosen for deterministic,
integer-exact evaluation:

- ``("last_non_null", src)`` / ``("first_non_null", src)`` — the
  src value on the latest/earliest row WHERE src IS NOT NULL, ordered
  by (order_col, tie_col) — implemented as ONE max/min over a
  (order, tie, src) struct, so it is a plain hash aggregation
  (map-side partial, no window, no sort) with a total order that
  makes ties impossible;
- ``("max", src)`` / ``("min", src)`` / ``("sum", src)`` /
  ``("count", src)`` (non-null count) / ``("any_null", src)``.

Scale: the whole operator is ONE groupBy(key).agg(...) — every rule
is an algebraic aggregate; 100 TB of events collapse map-side before
the single shuffle on the cluster key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["golden_record", "golden_record_oracle_sql"]

_PICK = {"last_non_null", "first_non_null"}
_PLAIN = {"max", "min", "sum", "count", "any_null"}


def golden_record(
    df: DataFrame,
    key_col: str,
    rules: dict[str, tuple[str, str]],
    order_col: str,
    tie_col: str,
) -> DataFrame:
    """One row per ``key_col`` with the survivorship ``rules`` applied
    (see module docstring). ``order_col``/``tie_col`` must totally
    order rows within a key for the *_non_null picks."""
    aggs = []
    for out, (rule, src) in rules.items():
        if rule in _PICK:
            st = F.when(
                F.col(src).isNotNull(),
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col(tie_col).alias("t"),
                    F.col(src).alias("v"),
                ),
            )
            agg = (F.max(st) if rule == "last_non_null" else F.min(st))
            aggs.append(agg.getField("v").alias(out))
        elif rule == "count":
            aggs.append(F.count(F.col(src)).cast("long").alias(out))
        elif rule == "any_null":
            aggs.append(
                F.max(F.col(src).isNull().cast("int")).cast("long").alias(out)
            )
        elif rule in _PLAIN:
            aggs.append(getattr(F, rule)(F.col(src)).alias(out))
        else:  # pragma: no cover - guarded by callers
            raise ValueError(f"unknown survivorship rule: {rule}")
    return df.groupBy(F.col(key_col)).agg(*aggs)


def golden_record_oracle_sql(
    table_sql: str,
    key_sql: str,
    rules: dict[str, tuple[str, str]],
    order_sql: str,
    tie_sql: str,
) -> str:
    """DuckDB mirror of :func:`golden_record` — the same struct
    min/max encoding of the *_non_null picks (struct comparison is
    lexicographic by field order in both engines)."""
    cols = []
    for out, (rule, src) in rules.items():
        if rule in _PICK:
            fn = "max" if rule == "last_non_null" else "min"
            cols.append(
                f"{fn}(CASE WHEN {src} IS NOT NULL THEN "
                f"{{'o': {order_sql}, 't': {tie_sql}, 'v': {src}}} END).v"
                f" AS {out}"
            )
        elif rule == "count":
            cols.append(f"CAST(count({src}) AS BIGINT) AS {out}")
        elif rule == "any_null":
            cols.append(
                f"CAST(max(CASE WHEN {src} IS NULL THEN 1 ELSE 0 END)"
                f" AS BIGINT) AS {out}"
            )
        elif rule in _PLAIN:
            cols.append(f"{rule}({src}) AS {out}")
        else:
            # mirror the Spark side's validation: a typo'd rule must
            # raise, never be interpolated into generated SQL
            raise ValueError(f"unknown survivorship rule: {rule}")
    return (
        f"SELECT {key_sql} AS {key_sql.split('.')[-1]}, "
        + ", ".join(cols)
        + f" FROM {table_sql} GROUP BY {key_sql}"
    )
