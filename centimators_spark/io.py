"""Readers for the driver-provided parquet tables (TESTDATA.md).

At 100 TB these would be partitioned/bucketed tables behind a catalog;
`spark.read.parquet` keeps predicate pushdown + column pruning either way
(verify with `.explain("formatted")` → PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics (date_trunc / unix_timestamp / window) follow the
    # session timezone; the driver may hand us a session with a different
    # default, so pin UTC here — the one chokepoint every query passes
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _ts_unit_is_nanos(path: str) -> bool:
    """Inspect the parquet footer metadata directly (no Spark job, no
    logged failure) to see whether ts is TIMESTAMP(NANOS)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return False
        f = parts[0]
    try:
        t = pq.read_schema(f).field("ts").type
    except (KeyError, OSError):
        return False
    return pa.types.is_timestamp(t) and t.unit == "ns"


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) which Spark's vectorized reader
    rejects; detect it from the parquet footer, then read nanos as long
    and convert to microsecond timestamps (second-level semantics —
    window/session/epoch — are unaffected)."""
    from pyspark.sql import functions as F

    if not _ts_unit_is_nanos(path):
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


# ---------------------------------------------------------------- sources


def read_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    *,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV source. At scale ALWAYS pass an explicit ``schema`` (DDL
    string): schema inference runs an extra full scan of the data before
    the real job. Malformed rows follow ``mode`` (default PERMISSIVE →
    nulls); pass mode='FAILFAST' to surface corruption."""
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    **options,
) -> DataFrame:
    """JSON-lines source. Same scale rule as read_csv: explicit schema
    skips the inference pass; unknown fields are dropped, missing ones
    null — the tolerant-reader shape a 100 TB ingest needs."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# ---------------------------------------------------------------- sinks


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Hive-style partitioned parquet sink. Readers prune partitions
    from predicates on the partition columns (PartitionFilters in the
    scan), so choose columns that match the dominant filter axis (date,
    tenant, …). ``max_records_per_file`` caps file size against skewed
    partitions; pair with a pre-write ``repartition(partition_cols)`` to
    get one file per partition instead of one per task per partition."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = df.write.mode(mode).partitionBy(*cols)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    *,
    max_records_per_file: int | None = None,
) -> None:
    """Dynamic-partition overwrite — the idempotent batch-upsert shape
    for partitioned tables WITHOUT a transactional format: only the
    partitions PRESENT in ``df`` are replaced; every other partition's
    files are untouched. This is how a daily re-run repairs one day of
    a years-deep table at 100 TB instead of rewriting (or, under static
    overwrite, silently DELETING) the rest.

    Same guarantees/caveats as Spark's ``partitionOverwriteMode=dynamic``:
    the replace is per-partition atomic-ish (rename-based), not
    cross-partition transactional; concurrent writers to the SAME
    partition still race. The session conf is set only for this write
    and restored after."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "STATIC")
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    try:
        spark.conf.set(key, "dynamic")
        w = df.write.mode("overwrite").partitionBy(*cols)
        if max_records_per_file is not None:
            w = w.option("maxRecordsPerFile", max_records_per_file)
        w.parquet(path)
    finally:
        spark.conf.set(key, prev)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    num_buckets: int,
    *,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed-table sink (hash-bucketed by join/agg key).
    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle — the scan itself is the required distribution —
    which is how repeated big-to-big joins should run at 100 TB: pay the
    shuffle once at write time, never at read time. Requires saveAsTable
    (bucket metadata lives in the catalog, not the files)."""
    keys = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*sorts)
    w.format("parquet").saveAsTable(table)


def z_order_key(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of N integer columns into one BIGINT
    sort key — the multi-dimensional clustering layout (Morton 1966;
    Delta OPTIMIZE ZORDER, Databricks) that keeps parquet row-group
    min/max stats tight on EVERY keyed dimension at once, so filters on
    any of them prune row groups after one `sortWithinPartitions(zkey)`
    write.

    Each column contributes its low ``bits`` bits (callers pre-bucket
    non-integers: ranks, hash buckets, epoch-days); bit i of column j
    lands at position i·N + j. Pure shift/mask/or arithmetic — exact,
    engine-independent (:func:`z_order_key_sql` emits the identical
    expression text for DuckDB). N·bits must fit 63 bits."""
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceed a BIGINT")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        x = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        for i in range(bits):
            bit = F.call_function(
                "shiftright", x, F.lit(i)
            ).bitwiseAND(F.lit(1).cast("long"))
            out = out.bitwiseOR(
                F.call_function(
                    "shiftleft", bit, F.lit(i * n + j)
                )
            )
    return out


def z_order_key_sql(col_sqls: list[str], bits: int = 16) -> str:
    """SQL-text twin of :func:`z_order_key` (valid in Spark SQL and
    DuckDB: >> & << | operators only)."""
    n = len(col_sqls)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceed a BIGINT")
    terms = []
    for j, c in enumerate(col_sqls):
        for i in range(bits):
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * n + j})"
            )
    return "(" + " | ".join(terms) + ")"


def write_z_ordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    *,
    bits: int = 16,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by the Morton key of ``zorder_cols``:
    range-partition + sort by zkey so each output file covers a compact
    multi-dimensional cell — point/range filters on ANY of the keyed
    columns then skip most row groups via parquet min/max stats."""
    keyed = df.withColumn("__zkey", z_order_key(zorder_cols, bits))
    parted = (
        keyed.repartitionByRange(n_files, "__zkey")
        if n_files
        else keyed.repartitionByRange("__zkey")
    )
    parted.sortWithinPartitions("__zkey").drop("__zkey").write.mode(
        mode
    ).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: str | list[str] | None = None,
) -> int:
    """Small-files compaction — the table-maintenance pass every
    long-lived ingest needs: thousands of tiny task-output files destroy
    scan parallelism economics (open/footer overhead per file, tiny
    row groups defeat pruning). Rewrites ``src`` into ``dst`` with
    ~``target_file_bytes`` files, optionally sorting within partitions
    (better column-chunk compression + tighter min/max stats for skip
    pruning). Returns the output file count.

    Sizing uses the SOURCE bytes as the estimate (parquet→parquet
    compression roughly carries over); the driver-side listing is one
    filesystem metadata pass, no data read."""
    import glob

    files = (
        glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
        if os.path.isdir(src)
        else [src]
    )
    total = sum(os.path.getsize(f) for f in files)
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(src)
    if sort_within_by is not None:
        cols = (
            [sort_within_by] if isinstance(sort_within_by, str) else list(sort_within_by)
        )
        df = df.repartition(n_files).sortWithinPartitions(*cols)
    else:
        df = df.coalesce(n_files) if n_files < df.rdd.getNumPartitions() else df.repartition(n_files)
    df.write.mode("overwrite").parquet(dst)
    return len(glob.glob(os.path.join(dst, "*.parquet")))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so spark.sql can address it."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
