"""Table reconciliation — the migration/backfill diff every engine
swap ends with: given two tables sharing a key, report per column how
many rows are missing from either side and how many present-in-both
rows agree/disagree.

Spark shape: ONE full outer join on the key (the only shuffle; at
100 TB bucket both sides by the key and it's shuffle-free) + ONE
aggregation of conditional counts — never a per-column join, never a
collect. Values compare null-safely (NULL == NULL is a match;
NULL vs value is a diff). Counts are exact integers → bit-exact
DuckDB mirror (:func:`table_diff_oracle_sql`).

Output: one row per compared column plus a ``__rows__`` row carrying
the key-presence counts (n_only_a / n_only_b / n_both).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Reconcile ``a`` vs ``b`` on ``keys`` over ``compare_cols``.
    Returns (column, n_only_a, n_only_b, n_both, n_equal, n_diff);
    n_equal/n_diff count rows present in BOTH (NULL for the
    ``__rows__`` presence row)."""
    ks = list(keys)
    cols = list(compare_cols)
    asel = a.select(*ks, *[F.col(c).alias(f"__a_{c}") for c in cols]).withColumn(
        "__in_a", F.lit(1)
    )
    bsel = b.select(*ks, *[F.col(c).alias(f"__b_{c}") for c in cols]).withColumn(
        "__in_b", F.lit(1)
    )
    # NULL-key semantics (ADVICE r5): keys join NULL-SAFELY — a
    # NULL-keyed row present on both sides counts as n_both, exactly
    # like the oracle's IS NOT DISTINCT FROM join; plain equality would
    # count it n_only_a + n_only_b and the two engines would diverge.
    # eqNullSafe stays a hash-joinable equi-condition (no BNLJ).
    ja, jb = asel.alias("__ta"), bsel.alias("__tb")
    cond = None
    for k in ks:
        e = F.col(f"__ta.{k}").eqNullSafe(F.col(f"__tb.{k}"))
        cond = e if cond is None else (cond & e)
    j = ja.join(jb, cond, "full_outer")
    in_a = F.col("__in_a").isNotNull()
    in_b = F.col("__in_b").isNotNull()
    aggs = [
        F.sum((in_a & ~in_b).cast("long")).alias("n_only_a"),
        F.sum((~in_a & in_b).cast("long")).alias("n_only_b"),
        F.sum((in_a & in_b).cast("long")).alias("n_both"),
    ]
    for c in cols:
        eq = F.col(f"__a_{c}").eqNullSafe(F.col(f"__b_{c}"))
        aggs.append(
            F.sum((in_a & in_b & eq).cast("long")).alias(f"__eq_{c}")
        )
        aggs.append(
            F.sum((in_a & in_b & ~eq).cast("long")).alias(f"__df_{c}")
        )
    row = j.agg(*aggs)
    # unpivot the one-row aggregate into the per-column report via a
    # single Expand — no extra scan of the joined frame
    entries = [
        F.struct(
            F.lit("__rows__").alias("column"),
            F.col("n_only_a").alias("n_only_a"),
            F.col("n_only_b").alias("n_only_b"),
            F.col("n_both").alias("n_both"),
            F.lit(None).cast("long").alias("n_equal"),
            F.lit(None).cast("long").alias("n_diff"),
        )
    ]
    for c in cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_only_a"),
                F.col("n_only_b"),
                F.col("n_both"),
                F.col(f"__eq_{c}").alias("n_equal"),
                F.col(f"__df_{c}").alias("n_diff"),
            )
        )
    return row.select(F.explode(F.array(*entries)).alias("e")).select("e.*")


def table_diff_oracle_sql(
    a_sql: str,
    b_sql: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB mirror of :func:`table_diff`."""
    ks = list(keys)
    cols = list(compare_cols)
    on = " AND ".join(f"a.{k} IS NOT DISTINCT FROM b.{k}" for k in ks)
    # presence flags, like the Spark side
    sel_counts = [
        "CAST(sum(CASE WHEN ia = 1 AND ib IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a",
        "CAST(sum(CASE WHEN ia IS NULL AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b",
        "CAST(sum(CASE WHEN ia = 1 AND ib = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both",
    ]
    for c in cols:
        sel_counts.append(
            f"CAST(sum(CASE WHEN ia = 1 AND ib = 1 AND"
            f" (av_{c} IS NOT DISTINCT FROM bv_{c}) THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS eq_{c}"
        )
        sel_counts.append(
            f"CAST(sum(CASE WHEN ia = 1 AND ib = 1 AND NOT"
            f" (av_{c} IS NOT DISTINCT FROM bv_{c}) THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS df_{c}"
        )
    a_cols = ", ".join([f"a.{k} AS ak_{k}" for k in ks] + [f"a.{c} AS av_{c}" for c in cols])
    b_cols = ", ".join([f"b.{k} AS bk_{k}" for k in ks] + [f"b.{c} AS bv_{c}" for c in cols])
    branches = [
        "SELECT '__rows__' AS \"column\", n_only_a, n_only_b, n_both,"
        " CAST(NULL AS BIGINT) AS n_equal, CAST(NULL AS BIGINT) AS n_diff"
        " FROM agg"
    ]
    for c in cols:
        branches.append(
            f"SELECT '{c}', n_only_a, n_only_b, n_both, eq_{c}, df_{c}"
            " FROM agg"
        )
    return f"""
        WITH joined AS (
          SELECT {a_cols}, {b_cols}, a.ia, b.ib
          FROM (SELECT *, 1 AS ia FROM {a_sql}) a
          FULL JOIN (SELECT *, 1 AS ib FROM {b_sql}) b ON {on}
        ), agg AS (
          SELECT {", ".join(sel_counts)} FROM joined
        )
        {" UNION ALL ".join(branches)}
    """
