"""Financial path metrics: running-peak drawdown over grouped ordered
series.

Reference scope: the reference's panel semantics (era/ticker ordered
frames, feature_transformers/time_series.py) stop at returns and moving
stats; drawdown is the standard portfolio-risk companion a training
pipeline derives from the same panel, added per SURVEY.md §2.3's
extension inventory.

Scale design: ONE shuffle. The cumulative sum and the running peak are
two stacked window expressions over the SAME (group, order) spec —
Catalyst plans a single Exchange + sort and fuses both WindowExecs on
it — and the closing groupBy reuses the group partitioning. Integer
carriers (callers pass fixed-decimal longs) keep every stage bit-exact
under any partition order, which is what makes the DuckDB oracle
(:func:`max_drawdown_oracle_sql`) hash-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def max_drawdown(
    df: DataFrame,
    value_col: str,
    order_cols: Sequence[str],
    by: str,
) -> DataFrame:
    """Per-group maximum drawdown of the cumulative-sum path.

    equity_t = Σ_{i≤t} value_i, peak_t = max_{i≤t} equity_i,
    drawdown_t = peak_t − equity_t; returns per group
    (max_equity, max_drawdown) — exact when ``value_col`` is
    integer-valued (fixed-decimal longs).

    ``order_cols`` must totally order rows within each group up to
    fully-identical rows (interchangeable under a cumulative sum), the
    same contract every windowed operator in this engine documents.
    """
    w = Window.partitionBy(by).orderBy(*[F.col(c) for c in order_cols])
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = df.select(
        by,
        *order_cols,
        F.sum(F.col(value_col).cast("long")).over(frame).alias("__equity"),
    )
    # same partition+order spec: fuses onto the first window's sort
    peaked = staged.select(
        by,
        F.col("__equity"),
        F.max("__equity").over(frame).alias("__peak"),
    )
    return peaked.groupBy(by).agg(
        F.max("__equity").alias("max_equity"),
        F.max(F.col("__peak") - F.col("__equity")).alias("max_drawdown"),
    )


def max_drawdown_oracle_sql(
    table_sql: str,
    value_sql: str,
    order_sqls: Sequence[str],
    by_sql: str,
    *,
    out_by: str = "g",
) -> str:
    """DuckDB twin: same two stacked windows, same integer carriers."""
    order = ", ".join(order_sqls)
    ord_aliases = ", ".join(
        f"{s} AS o{i}" for i, s in enumerate(order_sqls)
    )
    ord_names = ", ".join(f"o{i}" for i in range(len(order_sqls)))
    return f"""
        WITH equity_path AS (
          SELECT {by_sql} AS g, {ord_aliases},
                 sum(CAST({value_sql} AS BIGINT)) OVER w AS equity
          FROM {table_sql}
          WINDOW w AS (PARTITION BY {by_sql} ORDER BY {order}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), peak_path AS (
          SELECT g, equity, max(equity) OVER w2 AS peak
          FROM equity_path
          WINDOW w2 AS (PARTITION BY g ORDER BY {ord_names}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT g AS {out_by},
               CAST(max(equity) AS BIGINT) AS max_equity,
               CAST(max(peak - equity) AS BIGINT) AS max_drawdown
        FROM peak_path GROUP BY g
    """
