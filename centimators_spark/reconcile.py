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


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC change stream to a base snapshot — the MERGE /
    upsert step every incremental 100 TB pipeline ends with: per key,
    the LATEST change (by ``seq_cols``, descending) wins — 'D' deletes
    the key, 'U' upserts ``value_cols`` (insert if the key is new);
    keys with no change pass through unchanged. ``seq_cols`` must be
    unique per key (a change-log sequence/LSN; ties would make
    "latest" undefined on any engine).

    Spark shape: one window (row_number over the key shuffle) reduces
    the change stream to its per-key head, then ONE full outer join
    against the base — at 100 TB bucket both by the key and the join
    is shuffle-free; the change stream is usually days-sized against
    a years-sized base, so AQE will broadcast it. No collect, no
    per-column pass. Output: keys + value_cols + ``changed``
    (1 = written by the stream, 0 = carried from base), exact — the
    oracle (:func:`cdc_apply_oracle_sql`) is bit-identical."""
    from pyspark.sql import Window

    keys = list(keys)
    seq_cols = list(seq_cols)
    value_cols = list(value_cols)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in seq_cols]
    )
    latest = (
        changes.select(*keys, *seq_cols, op_col, *value_cols)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )
    b = base.select(*keys, *value_cols)
    joined = b.alias("b").join(
        latest.alias("c"), on=keys, how="full_outer"
    )
    op = F.col(f"c.{op_col}")
    kept = joined.where(op.isNull() | (op == F.lit("U")))
    out_cols = [F.col(k).alias(k) for k in keys] + [
        F.when(op == "U", F.col(f"c.{v}"))
        .otherwise(F.col(f"b.{v}"))
        .alias(v)
        for v in value_cols
    ]
    return kept.select(
        *out_cols,
        F.when(op == "U", F.lit(1)).otherwise(F.lit(0))
        .cast("int")
        .alias("changed"),
    )


def cdc_apply_oracle_sql(
    base_sql: str,
    changes_sql: str,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    op_col: str = "op",
) -> str:
    """DuckDB mirror of :func:`cdc_apply`."""
    keys = list(keys)
    seq_cols = list(seq_cols)
    value_cols = list(value_cols)
    kl = ", ".join(keys)
    seq_desc = ", ".join(f"{c} DESC" for c in seq_cols)
    key_out = ", ".join(
        f"coalesce(b.{k}, c.{k}) AS {k}" for k in keys
    )
    val_out = ", ".join(
        f"CASE WHEN c.{op_col} = 'U' THEN c.{v} ELSE b.{v} END AS {v}"
        for v in value_cols
    )
    on = " AND ".join(f"b.{k} = c.{k}" for k in keys)
    return f"""
        WITH latest AS (
          SELECT * FROM (
            SELECT {kl}, {", ".join(seq_cols)}, {op_col},
                   {", ".join(value_cols)},
                   row_number() OVER (PARTITION BY {kl}
                                      ORDER BY {seq_desc}) AS rn
            FROM {changes_sql}
          ) WHERE rn = 1
        )
        SELECT {key_out}, {val_out},
               CAST(CASE WHEN c.{op_col} = 'U' THEN 1 ELSE 0 END
                    AS INTEGER) AS changed
        FROM {base_sql} b FULL OUTER JOIN latest c ON {on}
        WHERE c.{op_col} IS NULL OR c.{op_col} = 'U'
    """
