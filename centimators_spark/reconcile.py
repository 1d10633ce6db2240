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


def _latest_changes(
    changes: DataFrame,
    keys: list,
    seq_cols: list,
    op_col: str,
    value_cols: list,
) -> DataFrame:
    """The per-key latest-wins head of a change stream — ONE
    definition of "latest" (row_number over the key shuffle, seq
    descending; .desc() and desc_nulls_last are identical on Spark,
    spelled explicitly for the NULL-ordering sweep) shared by
    :func:`cdc_apply` and :func:`incremental_agg` so the MERGE path
    and the maintenance path can never desynchronize."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc_nulls_last() for c in seq_cols]
    )
    return (
        changes.select(*keys, *seq_cols, op_col, *value_cols)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
    )


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
    keys = list(keys)
    seq_cols = list(seq_cols)
    value_cols = list(value_cols)
    latest = _latest_changes(changes, keys, seq_cols, op_col, value_cols)
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


def incremental_agg(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    value_col: str,
    group_col: str,
    *,
    op_col: str = "op",
) -> DataFrame:
    """Incremental maintenance of a per-group (count, sum) aggregate
    under a CDC change stream — materialized-view maintenance, the
    step that lets a 100 TB pipeline keep its rollups current WITHOUT
    re-aggregating the fact table on every batch of changes (the
    Flink/Materialize delta-propagation idea expressed as one Spark
    plan).

    Delta semantics per key's LATEST change (the cdc_apply rule —
    ``seq_cols`` unique per key):

    - 'D' of an existing key: (−1, −old_value) against the key's
      OLD group;
    - 'U' of an existing key: (0, new − old) against the old group
      (the group attribute lives on the base, not the stream);
    - 'U' of an unseen key (insert): (+1, +new) against the NULL
      group (the stream carries no group attribute — the same NULL
      group a recompute-after-merge produces under a left join);
    - 'D' of an unseen key: no-op.

    Updated aggregate = maintained base aggregate ⊕ delta aggregate
    (one full-outer join on the group, integer addition); groups whose
    count reaches 0 drop out, exactly like the recompute.

    ``value_col`` must be an INTEGER column (convert currency to
    cents first): integer sums are order-independent, so the
    incremental result is bit-identical to the full recompute on both
    engines — which is precisely the contract
    (:func:`incremental_agg_oracle_sql` IS the recompute over the
    merged snapshot; hash equality proves maintenance correct).

    ``keys`` must form a NON-NULL UNIQUE key of the base and of the
    change stream's entities (the cdc MERGE contract, made explicit):
    a NULL or duplicated key has no well-defined "the row to update"
    on either engine — NULL keys never match an equality join (Spark
    would treat the change as an insert) and the oracle's group
    lookup would fan out on duplicates.

    Scale/scan accounting: the change stream is windowed once to its
    per-key head; the base is touched by (a) the old-value lookup —
    a key-cardinality join against the (days-sized) change-key set,
    a broadcast/bucketed probe, never a second shuffle of the base —
    and (b) the base aggregate, which a production deployment feeds
    in as the PREVIOUSLY MAINTAINED rollup rather than recomputing
    (the gate query recomputes it for self-containment; that one
    map-side-combined aggregate is its only base-sized work).
    Output: (grp, n_rows, sum_val)."""
    ks = list(keys)
    seq = list(seq_cols)
    latest = _latest_changes(
        changes, ks, seq, op_col, [value_col]
    ).select(
        *ks,
        F.col(op_col).alias("__op"),
        F.col(value_col).alias("__new"),
    )
    old = base.select(
        *ks,
        F.col(group_col).alias("__grp"),
        F.col(value_col).alias("__old"),
        F.lit(1).alias("__in_base"),
    )
    j = latest.join(old, ks, "left")
    # presence via an explicit marker (a NULL base value or NULL base
    # group must still count as "exists"); a NULL old value
    # contributed nothing to the maintained sum, so it deltas as 0
    exists = F.col("__in_base").isNotNull()
    old_v = F.coalesce(F.col("__old"), F.lit(0))
    dn = (
        F.when((F.col("__op") == "D") & exists, F.lit(-1))
        .when((F.col("__op") == "U") & ~exists, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
    )
    ds = (
        F.when((F.col("__op") == "D") & exists, -old_v)
        .when(
            (F.col("__op") == "U") & exists,
            F.coalesce(F.col("__new"), F.lit(0)) - old_v,
        )
        .when(
            (F.col("__op") == "U") & ~exists,
            F.coalesce(F.col("__new"), F.lit(0)),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    delta = (
        j.select(F.col("__grp").alias("grp"), dn.alias("__dn"),
                 ds.alias("__ds"))
        .groupBy("grp")
        .agg(
            F.sum("__dn").cast("long").alias("__dn"),
            F.sum("__ds").cast("long").alias("__ds"),
        )
    )
    base_agg = (
        base.select(F.col(group_col).alias("grp"),
                    F.col(value_col).alias("__v"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__v").cast("long").alias("__s"),
        )
    )
    # NULL-SAFE on the group key: the NULL group (inserted keys with
    # no base attribute, or a genuinely NULL base group) must MERGE
    # between the two sides — a plain equality join would split it
    # into two rows (caught by the hand-trace fixture; the gate
    # fixture's non-null nations never exercise it)
    merged = (
        base_agg.alias("b")
        .join(
            delta.alias("d"),
            F.col("b.grp").eqNullSafe(F.col("d.grp")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("b.grp"), F.col("d.grp")).alias("grp"),
            (F.coalesce(F.col("__n"), F.lit(0))
             + F.coalesce(F.col("__dn"), F.lit(0))).alias("n_rows"),
            (F.coalesce(F.col("__s"), F.lit(0))
             + F.coalesce(F.col("__ds"), F.lit(0))).alias("sum_val"),
        )
    )
    return merged.where(F.col("n_rows") > 0)


def incremental_agg_oracle_sql(
    base_sql: str,
    changes_sql: str,
    keys: Sequence[str],
    seq_cols: Sequence[str],
    value_col: str,
    group_col: str,
    *,
    op_col: str = "op",
) -> str:
    """The FULL RECOMPUTE the incremental path must equal bit for
    bit: aggregate over the cdc-merged snapshot, group attribute
    looked up from the base (inserted keys land in the NULL group)."""
    ks = list(keys)
    on = " AND ".join(f"m.{k} = g.{k}" for k in ks)
    merged = cdc_apply_oracle_sql(
        base_sql, changes_sql, keys=ks, seq_cols=list(seq_cols),
        value_cols=[value_col], op_col=op_col,
    )
    return f"""
        WITH merged AS ({merged}),
        grp_lookup AS (
          SELECT {", ".join(ks)}, {group_col} AS grp FROM {base_sql}
        )
        SELECT g.grp,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(coalesce(sum(m.{value_col}), 0) AS BIGINT)
                 AS sum_val
        FROM merged m LEFT JOIN grp_lookup g ON {on}
        GROUP BY g.grp
    """
