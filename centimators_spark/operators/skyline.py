"""2-D skyline (Pareto front) per group: the rows no other row in the
group strictly dominates, minimizing two integer-carrier dimensions —
the "cheapest vs. fastest" frontier query (Börzsönyi et al., ICDE'01).

Dominance (both dims minimized): q dominates p iff q.x ≤ p.x and
q.y ≤ p.y with at least one strict. On a per-group sorted-x stream that
decomposes into two window minima — no pairwise comparison anywhere:

* ``min(y) over x' < x``  (strict predecessor on x: q beats p on x, so
  q.y ≤ p.y suffices) — a RANGE frame ``[unbounded, -1]`` on the
  integer x carrier, which is exactly "strictly smaller x" because the
  carrier is integral;
* ``min(y) over x' = x``  (tie on x: q must beat p on y strictly) — a
  plain partition-by-(group, x) minimum; ``min < y`` holds iff some
  OTHER row is smaller, so exact duplicates survive together (neither
  dominates, the standard skyline convention).

Both windows partition by the group key, so no global single-partition
ordering exists at any scale — the sort cost is per-group. Fan-out is
zero (two window passes over the already-aggregated per-entity table);
the frontier itself is the output, naturally small. Integer carriers
(cents, whole days) make every comparison exact cross-engine.

The reference has no skyline operator; this is part of the
beyond-reference relational surface (multi-objective candidate
screening — cheapest-vs-stalest suppliers, shortest-vs-highest-quality
documents) the training-data platform needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows on the per-``group_col`` Pareto front minimizing
    (``x_col``, ``y_col``). Both dimension columns MUST be integral
    (int/bigint carriers) — the strict-predecessor RANGE bound of -1
    relies on it. Returns the input columns unchanged, frontier rows
    only."""
    w_lt = (
        Window.partitionBy(group_col)
        .orderBy(x_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    min_y_lt = F.min(y_col).over(w_lt)
    min_y_eq = F.min(y_col).over(Window.partitionBy(group_col, x_col))
    dominated: Column = (
        min_y_lt.isNotNull() & (min_y_lt <= F.col(y_col))
    ) | (min_y_eq < F.col(y_col))
    return (
        df.withColumn("__dom", dominated)
        .where(~F.col("__dom"))
        .drop("__dom")
    )


def skyline_2d_oracle_sql(
    table_sql: str,
    group_sql: str,
    x_sql: str,
    y_sql: str,
    select_sql: str,
) -> str:
    """DuckDB twin of :func:`skyline_2d` — the identical two window
    minima over a CTE exposing (grp, x, y, payload columns)."""
    return f"""
        WITH pts AS (
          SELECT {select_sql}, {group_sql} AS grp,
                 {x_sql} AS x, {y_sql} AS y
          FROM {table_sql}
        ), marked AS (
          SELECT *,
                 min(y) OVER (
                   PARTITION BY grp ORDER BY x
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS min_y_lt,
                 min(y) OVER (PARTITION BY grp, x) AS min_y_eq
          FROM pts
        )
        SELECT * EXCLUDE (grp, x, y, min_y_lt, min_y_eq)
        FROM marked
        WHERE NOT ((min_y_lt IS NOT NULL AND min_y_lt <= y)
                   OR (min_y_eq < y))
    """
