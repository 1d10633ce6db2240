"""As-of join — for each left row, the most recent right row at or
before its timestamp, per key (pandas merge_asof / kdb aj semantics,
direction='backward').

Spark has no native as-of join; the naive formulation (range join +
max) explodes quadratically in dense keys. This implementation uses the
union + carry-forward trick:

  1. tag right rows 0, left rows 1; union on (key, ts, tag, payload)
  2. one window per key ordered by (ts, tag): ``last(payload, ignoreNulls)``
     carries the latest right payload forward onto every subsequent row
  3. keep left rows

One shuffle on the key, linear work, no join blow-up — the shape that
survives 100 TB. Ties (right.ts == left.ts) match because right sorts
before left at equal timestamps. Right must be unique per (key, ts)
for determinism (pre-aggregate otherwise) — the same requirement
DuckDB's native ASOF JOIN (the differential oracle) imposes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Append, for each left row, the latest right ``value_cols`` (and
    the matched timestamp ``{on}{suffix}``) at or before ``left[on]``
    within the same ``by`` key; nulls when no prior right row exists."""
    by = [by] if isinstance(by, str) else list(by)
    lcols = left.columns
    tagged_right = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in by],
    )
    tagged_left = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[on].dataType).alias(f"{on}{suffix}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        *[F.col(c) for c in lcols if c not in by],
    )
    unioned = tagged_right.unionByName(tagged_left)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__carry_{c}")
            for c in [on] + list(value_cols)
        ],
    )
    return (
        carried.where(F.col("__tag") == 1)
        .select(
            *by,
            F.col("__t").alias(on),
            *[c for c in lcols if c not in by and c != on],
            *[
                F.col(f"__carry_{c}").alias(f"{c}{suffix}")
                for c in [on] + list(value_cols)
            ],
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Forward as-of: for each left row, the EARLIEST right row at or
    after its timestamp (pandas merge_asof direction='forward') — the
    "next fill/print" lookup of order-execution analysis. Same
    union + carry trick run in reverse frame order; one shuffle,
    linear, ties match (right sorts after left at equal ts in the
    reversed scan, so an equal-timestamp right row is visible)."""
    by = [by] if isinstance(by, str) else list(by)
    lcols = left.columns
    tagged_right = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in by
        ],
    )
    tagged_left = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[on].dataType).alias(f"{on}{suffix}"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
            for c in value_cols
        ],
        *[F.col(c) for c in lcols if c not in by],
    )
    unioned = tagged_right.unionByName(tagged_left)
    # carry the NEXT right payload backward: scan in reverse time order
    # (right before left at the same ts so equal timestamps match)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__t").desc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True)
            .over(w)
            .alias(f"__carry_{c}")
            for c in [on] + list(value_cols)
        ],
    )
    return (
        carried.where(F.col("__tag") == 1)
        .select(
            *by,
            F.col("__t").alias(on),
            *[c for c in lcols if c not in by and c != on],
            *[
                F.col(f"__carry_{c}").alias(f"{c}{suffix}")
                for c in [on] + list(value_cols)
            ],
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str = "ts",
    by: str | Sequence[str],
    value_cols: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest as-of (pandas direction='nearest'): the right row with
    the smallest |Δt|; backward wins exact Δt ties (pandas' rule).
    Composition of the backward and forward passes — two shuffles on
    the same key (AQE reuses the exchange), still linear."""
    by = [by] if isinstance(by, str) else list(by)
    back = asof_join(
        left, right, on=on, by=by, value_cols=value_cols, suffix="__b"
    )
    both = asof_join_forward(
        back, right, on=on, by=by, value_cols=value_cols, suffix="__f"
    )
    db = F.abs(
        F.col(on).cast("double") - F.col(f"{on}__b").cast("double")
    )
    df_ = F.abs(
        F.col(f"{on}__f").cast("double") - F.col(on).cast("double")
    )
    use_back = F.col(f"{on}__b").isNotNull() & (
        F.col(f"{on}__f").isNull() | (db <= df_)
    )
    out_cols = [
        F.when(use_back, F.col(f"{c}__b"))
        .otherwise(F.col(f"{c}__f"))
        .alias(f"{c}{suffix}")
        for c in [on] + list(value_cols)
    ]
    keep = [c for c in both.columns if not (c.endswith("__b") or c.endswith("__f"))]
    return both.select(*keep, *out_cols)
