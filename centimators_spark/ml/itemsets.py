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
    identity).

    ``max_size`` filters the output; for ``max_size <= 2`` the mining
    itself is restricted (r13 optimization, guide §1.2 "don't compute
    things you throw away"): sizes 1-2 are enumerated exactly with
    one explode-count per size — pair candidates generated per basket
    from the sorted item array (C(m,2) map-side, no basket self-join
    shuffle) — instead of running FP-Growth's full all-sizes search
    and discarding everything above 2. Threshold is the identical
    mllib rule (freq ≥ ceil(minSupport · n_baskets), same IEEE double
    product), so the output set is row-identical to the FP-Growth
    path filtered to ``size <= max_size`` — pinned by
    tests/test_ml_surface.py. FP-Growth (pyspark.ml.fpm's distributed
    PFP) remains the engine for unbounded/≥3 mining."""
    if max_size is not None and max_size <= 2:
        sa = F.sort_array(F.col(items_col).cast("array<string>"))
        # pin the basket build once: three consumers (n_baskets,
        # singles, pairs) would otherwise each re-run the upstream
        # basket aggregation from the scan
        src = baskets.select(sa.alias("__sa")).localCheckpoint(
            eager=True
        )
        n = src.agg(F.count(F.lit(1)).alias("__n"))
        min_count = F.ceil(F.lit(float(min_support)) * F.col("__n"))
        singles = src.select(
            F.explode("__sa").alias("items_key")
        ).groupBy("items_key").agg(
            F.count(F.lit(1)).alias("freq")
        ).select("items_key", F.lit(1).alias("size"), "freq")
        if max_size == 2:
            pair_arr = F.flatten(
                F.transform(
                    F.col("__sa"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("__sa"), i + F.lit(2), F.size(F.col("__sa"))
                        ),
                        lambda y: F.concat(x, F.lit(","), y),
                    ),
                )
            )
            pairs = src.select(
                F.explode(pair_arr).alias("items_key")
            ).groupBy("items_key").agg(
                F.count(F.lit(1)).alias("freq")
            ).select("items_key", F.lit(2).alias("size"), "freq")
            cand = singles.unionByName(pairs)
        else:
            cand = singles
        return cand.join(F.broadcast(n), how="cross").where(
            F.col("freq") >= min_count
        ).select("items_key", "size", "freq")

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


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_count: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Size-1 → size-1 association rules over (basket, item) rows —
    the standard support/confidence/lift readout downstream of
    :func:`frequent_itemsets` (mllib exposes the same shape as
    ``FPGrowthModel.associationRules``; this is the exact-count,
    oracle-twinned form).

    For every ordered pair (antecedent → consequent) co-occurring in
    ≥ ``min_pair_count`` baskets:
    confidence = pair_n / ant_n, lift = pair_n · n_baskets /
    (ant_n · cons_n) — each a SINGLE IEEE division (or one multiply
    then one divide) of exact integer counts rounded to ``digits``,
    so the doubles are bit-identical across engines.

    Plan (r13 optimization — the frequent_itemsets size-2 shape): ONE
    corpus-sized shuffle builds the per-basket sorted DISTINCT item
    array (collect_set partial-aggregates map-side, subsuming the old
    separate .distinct() pass), pinned once for its three consumers
    (n_baskets, singles, pairs — the lazy form re-derived the whole
    input join per consumer: 20 scans / 38 exchanges in the measured
    plan). Pair candidates are enumerated map-side per basket —
    C(m,2) over the sorted array, identical to the old basket
    self-join with ``a.i < c.i`` — so no second data-sized shuffle
    exists. Both rule directions come from the one unordered pair
    count."""
    baskets = (
        df.where(F.col(item_col).isNotNull())
        .select(
            F.col(basket_col).alias("b"),
            F.col(item_col).cast("string").alias("i"),
        )
        .groupBy("b")
        .agg(F.sort_array(F.collect_set("i")).alias("__sa"))
        .localCheckpoint(eager=True)
    )
    # NULL-basket parity with the old bi.distinct() shape: count("b")
    # skips the null-key group (countDistinct semantics), singles DO
    # count it (distinct kept its rows), pairs exclude it (null keys
    # never matched the old equi-self-join)
    n_baskets = baskets.agg(F.count("b").cast("long").alias("__nb"))
    singles = (
        baskets.select(F.explode("__sa").alias("i"))
        .groupBy("i")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("__sa"),
            lambda x, i: F.transform(
                F.slice(F.col("__sa"), i + F.lit(2), F.size(F.col("__sa"))),
                lambda y: F.struct(x.alias("i1"), y.alias("i2")),
            ),
        )
    )
    pairs = (
        baskets.where(F.col("b").isNotNull())
        .select(F.explode(pair_arr).alias("p"))
        .groupBy(F.col("p.i1").alias("i1"), F.col("p.i2").alias("i2"))
        .agg(F.count(F.lit(1)).cast("long").alias("pair_n"))
        .where(F.col("pair_n") >= min_pair_count)
    )
    sized = (
        pairs.join(
            F.broadcast(singles.select(F.col("i").alias("i1"),
                                       F.col("n").alias("n1"))), "i1"
        )
        .join(
            F.broadcast(singles.select(F.col("i").alias("i2"),
                                       F.col("n").alias("n2"))), "i2"
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    both = sized.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("i1").alias("antecedent"),
                    F.col("i2").alias("consequent"),
                    F.col("pair_n"),
                    F.col("n1").alias("ant_n"),
                    F.col("n2").alias("cons_n"),
                    F.col("__nb"),
                ),
                F.struct(
                    F.col("i2").alias("antecedent"),
                    F.col("i1").alias("consequent"),
                    F.col("pair_n"),
                    F.col("n2").alias("ant_n"),
                    F.col("n1").alias("cons_n"),
                    F.col("__nb"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    conf = F.round(
        F.col("pair_n").cast("double") / F.col("ant_n").cast("double"),
        digits,
    )
    lift = F.round(
        (F.col("pair_n") * F.col("__nb")).cast("double")
        / (F.col("ant_n") * F.col("cons_n")).cast("double"),
        digits,
    )
    return both.select(
        "antecedent",
        "consequent",
        "pair_n",
        F.col("ant_n"),
        F.col("cons_n"),
        conf.alias("confidence"),
        lift.alias("lift"),
    )


def association_rules_oracle_sql(
    basket_table_sql: str,
    *,
    basket_sql: str = "basket",
    item_sql: str = "item",
    min_pair_count: int = 2,
    digits: int = 6,
) -> str:
    """DuckDB mirror of :func:`association_rules`: identical distinct
    projection, pair counts, and single-division roundings."""
    return f"""
        WITH bi AS (
          SELECT DISTINCT {basket_sql} AS b, CAST({item_sql} AS VARCHAR) AS i
          FROM {basket_table_sql}
          WHERE {item_sql} IS NOT NULL
        ), nb AS (
          SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM bi
        ), singles AS (
          SELECT i, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY i
        ), pairs AS (
          SELECT a.i AS i1, c.i AS i2, CAST(count(*) AS BIGINT) AS pair_n
          FROM bi a JOIN bi c ON a.b = c.b AND a.i < c.i
          GROUP BY a.i, c.i
          HAVING count(*) >= {min_pair_count}
        ), both_dirs AS (
          SELECT i1 AS antecedent, i2 AS consequent, pair_n FROM pairs
          UNION ALL
          SELECT i2 AS antecedent, i1 AS consequent, pair_n FROM pairs
        )
        SELECT r.antecedent, r.consequent, r.pair_n,
               sa.n AS ant_n, sc.n AS cons_n,
               round(CAST(r.pair_n AS DOUBLE) / CAST(sa.n AS DOUBLE),
                     {digits}) AS confidence,
               round(CAST(r.pair_n * nb.n_baskets AS DOUBLE)
                     / CAST(sa.n * sc.n AS DOUBLE), {digits}) AS lift
        FROM both_dirs r
        JOIN singles sa ON r.antecedent = sa.i
        JOIN singles sc ON r.consequent = sc.i
        CROSS JOIN nb
    """
