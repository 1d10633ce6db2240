"""Sources & sinks.

The reference has no I/O surface (it operates on in-memory frames —
SURVEY.md §2.2); the engine's I/O is Spark's built-in readers/writers,
plus the two layout decisions that matter at 100 TB:

- ``write_partitioned``: hive-style partition directories → partition
  PRUNING at read time (a filter on the partition column never lists,
  let alone reads, other directories).
- ``write_bucketed_table``: hash-bucketed + sorted table → joins and
  aggregations on the bucket key need NO shuffle (co-located join;
  `SortMergeJoin` without `Exchange`). This is how the panel workloads
  (everything keyed by ticker/era) amortize their one shuffle forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "csv", "json", "orc")


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Read parquet/csv/json/orc with sane defaults (csv: header+infer
    unless a schema is pinned — pin one in production: inference scans)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}, got {fmt}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    return reader.options(**options).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partition-pruned layout. max_records_per_file bounds file sizes
    (small-files vs giant-files tradeoff at scale)."""
    writer = df.write.format(fmt).mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucketed (+sorted) managed table: joins/aggs on bucket_cols skip
    the shuffle; sort_cols pre-sorts within buckets so window ops on
    (bucket, sort) skip the sort too."""
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_text_corpus(
    spark: SparkSession,
    path: str,
    *,
    line_numbers: bool = False,
) -> DataFrame:
    """Raw-text corpus ingestion (the .txt/.md shard layout LLM corpora
    ship in): one row per line with its source file
    (``file, text``), or — with ``line_numbers=True`` — exact per-file
    line numbers (``file, line_no, text``).

    The default path is the scale path: Spark's text source splits
    large files across tasks, so it streams any corpus size but cannot
    know global line offsets. The line-numbered path reads
    ``wholetext`` (one task per FILE, memory-bounded by the largest
    file — right for corpora sharded into many ≲1 GB files, wrong for
    one giant file) and posexplodes the lines, so numbering is exact
    and deterministic."""
    from pyspark.sql import functions as F

    if not line_numbers:
        return (
            spark.read.text(path)
            .select(
                F.input_file_name().alias("file"),
                F.col("value").alias("text"),
            )
        )
    whole = spark.read.text(path, wholetext=True)
    # Hadoop line-reader semantics, matching the plain mode's text
    # source exactly: a zero-byte file yields ZERO rows (not one empty
    # line — split('') would produce ['']), terminators are \r\n, \r,
    # or \n (a lone \r terminates a line in Hadoop's LineReader), and
    # the single phantom empty element a trailing terminator produces
    # is dropped ('a\nb\n' is TWO lines; 'a\n\n' still yields 'a', '')
    whole = whole.where(F.col("value") != "")
    lines = F.split(F.col("value"), "\r\n|\r|\n", -1)
    n = F.size(lines)
    lines = F.when(
        (n > 1) & (F.element_at(lines, -1) == ""),
        F.slice(lines, 1, n - 1),
    ).otherwise(lines)
    return whole.select(
        F.input_file_name().alias("file"),
        F.posexplode(lines).alias("line_no", "text"),
    )
