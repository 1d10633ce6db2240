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


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so spark.sql can address it."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
