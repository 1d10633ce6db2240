"""Connected components over near-duplicate pairs + keep-one dedup.

Min-label propagation as an iterative DataFrame fixpoint (the standard
large-graph approach — alternating small joins, each a hash shuffle on
node id, AQE-coalesced; converges in O(component diameter) rounds,
which for dedup clusters is tiny). Deterministic output: every node
labeled with the MINIMUM doc_id reachable in its component — exactly
what a recursive-CTE oracle computes.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, max_iter: int = 20, a: str = "d1", b: str = "d2"
) -> DataFrame:
    """(node, cluster) for every node in `pairs`; cluster = min node id
    of its component."""
    # materialize the edge list once — the fixpoint loop re-reads it every
    # round and `pairs` is usually an expensive lazy plan (LSH + verify)
    edges = (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "cluster", F.col("node")
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce(F.col("nbr_cluster"), F.col("cluster"))
                ).alias("cluster"),
            )
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .where(F.col("u.cluster") != F.col("l.cluster"))
            .limit(1)
            .count()
        )
        labels = updated.localCheckpoint(eager=True)  # cut the growing lineage
        if changed == 0:
            converged = True
            break
    if not converged:
        warnings.warn(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds — a component's diameter exceeds the iteration budget and "
            "the returned cluster labels are NOT a fixpoint; raise max_iter",
            RuntimeWarning,
        )
    return labels


def deduplicate(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep-one-per-cluster: drop every row whose id is in a near-dup
    cluster but is not its minimum member."""
    cc = connected_components(pairs)
    drop = cc.where(F.col("node") != F.col("cluster")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
