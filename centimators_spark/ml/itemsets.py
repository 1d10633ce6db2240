"""Frequent-itemset mining (market-basket analysis) over grouped
baskets — FP-Growth via ``pyspark.ml.fpm`` (Han et al. 2000; Spark's
distributed PFP variant, Li et al. 2008).

Spark shape: basket construction is one grouped ``collect_set`` (the
only data-sized shuffle); FP-growth itself partitions the item search
space across executors (PFP), so no single task holds the full
transaction DB. Counts are exact integers → the DuckDB oracle
enumerates itemsets of size ≤ 2 by grouped counts + a basket self-join
and hash-matches exactly; larger itemsets are still mined (and tested)
but the CONTRACT restricts to size ≤ 2 where SQL enumeration is sane.

Threshold semantics: Spark keeps itemsets with
``freq >= ceil(min_support * n_baskets)`` (mllib FPGrowth.minCount);
the oracle computes the identical ceil from the identical double
literal, so boundary baskets agree bit-for-bit.

No reference counterpart — §2.3-style extension (the co-occurrence
sibling of text/cooccur.py's PMI, over transactions instead of
documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_baskets(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """(basket, item) rows → one row per basket with the DISTINCT item
    set (FP-Growth requires unique items per transaction)."""
    return (
        df.where(F.col(item_col).isNotNull())
        .groupBy(basket_col)
        .agg(F.collect_set(item_col).alias("items"))
    )


def frequent_itemsets(
    baskets: DataFrame,
    *,
    items_col: str = "items",
    min_support: float = 0.05,
    max_size: int | None = None,
) -> DataFrame:
    """All itemsets with support ≥ ``min_support``; returns
    (items_key, size, freq) with ``items_key`` the sorted
    comma-joined item list (FP-Growth's array order is
    partition-dependent — the sorted key is the deterministic
    identity). ``max_size`` optionally filters the output (the mining
    still explores every size)."""
    from pyspark.ml.fpm import FPGrowth

    fp = FPGrowth(itemsCol=items_col, minSupport=min_support, minConfidence=0.5)
    model = fp.fit(baskets)
    out = model.freqItemsets.select(
        F.array_join(
            F.sort_array(F.col("items").cast("array<string>")), ","
        ).alias("items_key"),
        F.size("items").alias("size"),
        F.col("freq"),
    )
    if max_size is not None:
        out = out.where(F.col("size") <= max_size)
    return out


def frequent_itemsets_oracle_sql(
    basket_table_sql: str,
    *,
    basket_sql: str = "basket",
    item_sql: str = "item",
    min_support: float = 0.05,
) -> str:
    """DuckDB mirror for itemsets of size ≤ 2 over (basket, item) rows:
    singles by grouped count, pairs by basket self-join; threshold =
    ceil(min_support · n_baskets), the exact mllib rule."""
    return f"""
        WITH bi AS (
          SELECT DISTINCT {basket_sql} AS b, CAST({item_sql} AS VARCHAR) AS i
          FROM {basket_table_sql}
          WHERE {item_sql} IS NOT NULL
        ), n AS (
          SELECT CAST(ceil({min_support!r} * count(DISTINCT b)) AS BIGINT)
            AS min_count
          FROM bi
        ), singles AS (
          SELECT i AS items_key, 1 AS size, CAST(count(*) AS BIGINT) AS freq
          FROM bi GROUP BY i
        ), pairs AS (
          SELECT a.i || ',' || b.i AS items_key, 2 AS size,
                 CAST(count(*) AS BIGINT) AS freq
          FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
          GROUP BY 1
        )
        SELECT items_key, size, freq FROM (
          SELECT * FROM singles UNION ALL SELECT * FROM pairs
        ) CROSS JOIN n WHERE freq >= min_count
    """
