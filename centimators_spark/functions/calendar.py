"""Calendar feature expansion — the deterministic date covariates a
panel model joins onto every row (day-of-week seasonality, month-end
effects, quarter boundaries).

Cross-engine parity notes (the reason this is worth an operator and
not five ad-hoc expressions): day-of-week NUMBERING disagrees between
engines (Spark ``dayofweek`` is 1=Sunday; DuckDB ``dayofweek`` is
0=Sunday; ISO variants differ again), so ``dow`` here is derived from
EPOCH-DAY ARITHMETIC — ``(floor(epoch/86400) + 4) mod 7`` with
0=Sunday (1970-01-01 was a Thursday) — the same integer formula in
both engines. Month/quarter/year/day extract identically from the
proleptic Gregorian calendar in both. ``is_month_end`` compares the
month of d and d+1 day. ``week`` is ISO 8601 (both engines agree).

All pure map-side codegen expressions — zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def calendar_features(
    df: DataFrame,
    date_col: str,
    *,
    prefix: str | None = None,
) -> DataFrame:
    """Append ``{p}year {p}quarter {p}month {p}day {p}week {p}dow
    {p}is_weekend {p}is_month_end`` for a DATE/TIMESTAMP column
    (p = ``prefix`` or ``{date_col}_``)."""
    p = prefix if prefix is not None else f"{date_col}_"
    d = F.to_date(F.col(date_col))
    epoch_day = F.unix_date(d)
    dow = F.pmod(epoch_day + 4, F.lit(7))
    return df.select(
        "*",
        F.year(d).alias(f"{p}year"),
        F.quarter(d).alias(f"{p}quarter"),
        F.month(d).alias(f"{p}month"),
        F.dayofmonth(d).alias(f"{p}day"),
        F.weekofyear(d).alias(f"{p}week"),
        dow.cast("int").alias(f"{p}dow"),
        ((dow == 0) | (dow == 6)).cast("int").alias(f"{p}is_weekend"),
        (F.month(F.date_add(d, 1)) != F.month(d))
        .cast("int")
        .alias(f"{p}is_month_end"),
    )


def calendar_features_oracle_sql(
    table: str,
    date_sql: str,
    *,
    prefix: str = "",
    select_sql: str = "*",
) -> str:
    """DuckDB mirror of :func:`calendar_features` — the shared
    epoch-day dow formula; native extracts where numbering agrees."""
    p = prefix
    d = f"CAST({date_sql} AS DATE)"
    # double-mod = pmod (DuckDB % keeps the sign for pre-1970 dates)
    dow = f"(((({d} - DATE '1970-01-01' + 4) % 7) + 7) % 7)"
    return f"""
        SELECT {select_sql},
               CAST(year({d}) AS INTEGER) AS {p}year,
               CAST(quarter({d}) AS INTEGER) AS {p}quarter,
               CAST(month({d}) AS INTEGER) AS {p}month,
               CAST(day({d}) AS INTEGER) AS {p}day,
               CAST(weekofyear({d}) AS INTEGER) AS {p}week,
               CAST({dow} AS INTEGER) AS {p}dow,
               CAST({dow} IN (0, 6) AS INTEGER) AS {p}is_weekend,
               CAST(month({d} + 1) <> month({d}) AS INTEGER)
                 AS {p}is_month_end
        FROM {table}
    """
