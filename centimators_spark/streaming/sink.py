"""foreachBatch sinks: maintain a queryable parquet table from a
streaming aggregation when the built-in file sink's append-only
contract doesn't fit (grouped state, upserts).

``grouped_overwrite_sink`` implements the standard idempotent pattern:
the upstream streaming aggregation runs in update (or complete) mode,
so each micro-batch delivers the refreshed rows for every group the
batch changed; the sink overwrites exactly those groups' partitions in
a partitioned parquet table (dynamic partition overwrite). Replayed
batches rewrite the same partitions with the same values — idempotent
under at-least-once delivery, no read-modify-write race, and the table
stays queryable between batches.

At scale this is the poor-engine's MERGE: per-batch work is
proportional to the touched groups, not the table; a lakehouse format
(Delta/Iceberg/Hudi) replaces the partition-overwrite with a
transactional MERGE but the foreachBatch shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def grouped_overwrite_sink(
    aggregated_stream: DataFrame,
    *,
    path: str,
    partition_col: str,
    checkpoint: str,
    output_mode: str = "update",
    query_name: str = "grouped_overwrite",
):
    """Build (unstarted) the writeStream for an ALREADY-AGGREGATED
    stream: each micro-batch's rows — the refreshed aggregates of the
    groups that changed — overwrite their ``partition_col`` partitions
    in the parquet table at ``path``. Call ``.trigger(...).start()`` on
    the result. ``output_mode='update'`` writes only changed groups per
    batch; ``'complete'`` rewrites every group (use for small group
    counts).

    CORRECTNESS CONTRACT: ``partition_col`` must be the COMPLETE
    grouping key of the upstream aggregation (one output row per
    partition value). If the aggregation groups finer (e.g. by
    (user, day) while partitioning only by day), overwriting a
    partition with the batch's subset of rows would DELETE the
    untouched sibling groups. The sink validates one-row-per-
    partition-value within each batch, which catches the misuse
    whenever two sibling groups change in the same batch — but it is
    NOT a complete guard: sibling groups changing in DIFFERENT batches
    still overwrite each other undetected, so the contract itself is
    on the caller."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        # one pass serves emptiness + validation + write (foreachBatch
        # frames recompute per action otherwise)
        batch_df.persist()
        try:
            stats = (
                batch_df.groupBy(partition_col)
                .count()
                .agg(
                    F.max("count").alias("mx"),
                    F.count(F.lit(1)).alias("n_parts"),
                )
                .first()
            )
            if stats.n_parts == 0:
                return
            if stats.mx > 1:
                raise ValueError(
                    "grouped_overwrite_sink: multiple rows per "
                    f"{partition_col} value in batch {batch_id} — "
                    "partition_col must be the complete grouping key "
                    "(overwriting would delete sibling groups)"
                )
            spark = batch_df.sparkSession
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            try:
                (
                    batch_df.write.mode("overwrite")
                    .partitionBy(partition_col)
                    .parquet(path)
                )
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
        finally:
            batch_df.unpersist()

    return (
        aggregated_stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )


def continuous_aggregate(
    events: DataFrame,
    *,
    ts_col: str,
    window_duration: str,
    agg_exprs: dict[str, str],
    group_cols: list[str] | None = None,
    watermark: str = "1 hour",
    path: str,
    checkpoint: str,
    query_name: str = "continuous_aggregate",
):
    """Hypertable-style continuous aggregate: a streaming event-time
    window rollup continuously maintained as a queryable partitioned
    parquet table — the TimescaleDB continuous-aggregate /
    materialized-rollup shape on Structured Streaming built-ins.

    Composition (each piece individually tested elsewhere): watermarked
    tumbling window → grouped aggregation (update mode: only windows a
    batch touched are emitted) → :func:`grouped_overwrite_sink` keyed
    by the window start, so late data inside the watermark REVISES its
    window's partition idempotently and readers always see complete
    windows per partition.

    ``agg_exprs`` maps output column → SQL aggregate expression, e.g.
    ``{"n": "count(*)", "total": "sum(value)"}``. Returns the unstarted
    writeStream (call ``.trigger(...).start()``).

    Scale notes: state is bounded by the watermark horizon; per-batch
    sink work is proportional to touched windows, not table history.
    With extra ``group_cols`` the partition key must stay the COMPLETE
    group (window_start + groups concatenated) per
    grouped_overwrite_sink's contract — here the rollup concatenates
    them into one partition value for exactly that reason."""
    from pyspark.sql import functions as F

    groups = list(group_cols or [])
    win = F.window(F.col(ts_col), window_duration)
    agg = (
        events.withWatermark(ts_col, watermark)
        .groupBy(win, *[F.col(c) for c in groups])
        .agg(*[F.expr(e).alias(name) for name, e in agg_exprs.items()])
    )
    # partition key = md5 of the JSON-encoded full grouping tuple:
    # null-distinct and separator-safe (a concat_ws key would collapse
    # ('a', NULL) with (NULL, 'a') and 'a|b'+'c' with 'a'+'b|c' —
    # exactly the sibling-overwrite hazard the sink's contract forbids);
    # the readable window_start/group columns ride along in the rows
    part = F.md5(
        F.to_json(
            F.struct(
                F.unix_timestamp(F.col("window.start")).alias("ws"),
                *[F.col(c) for c in groups],
            )
        )
    )
    flat = agg.select(
        part.alias("window_key"),
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        *groups,
        *agg_exprs.keys(),
    )
    return grouped_overwrite_sink(
        flat,
        path=path,
        partition_col="window_key",
        checkpoint=checkpoint,
        output_mode="update",
        query_name=query_name,
    )
