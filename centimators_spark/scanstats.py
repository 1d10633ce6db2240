"""Local-file scan-shape estimators shared by the under-partitioned-
scan repartition gates (era-OLS neutralization, the one-pass bootstrap
family, the exact LinearRegressor fit) — promoted out of
operators/neutralization so the cross-module callers depend on a
public internal home instead of an underscore-private helper
(round-11 advice).

Both helpers return None for non-file or remote inputs: a production
object-store scan is governed by the same maxPartitionBytes settings
and is never the single-row-group local-file pathology these gates
exist for, so None means "assume well-partitioned, do nothing".
"""

from __future__ import annotations

import math
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame


def _conf_bytes(conf, key: str, default: int) -> int:
    # JVM byte-size strings: "134217728b", "128m", "1g", plain int
    raw = str(conf.get(key, str(default))).strip().lower()
    m = re.fullmatch(r"(\d+)\s*([kmgtp]?)b?", raw)
    if not m:
        return default
    mult = {"": 1, "k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40,
            "p": 2**50}[m.group(2)]
    return int(m.group(1)) * mult


def _local_file_sizes(df: DataFrame) -> list[int] | None:
    files = df.inputFiles()
    if not files:
        return None
    sizes = []
    for f in files:
        if not f.startswith("file:"):
            return None
        try:
            sizes.append(os.path.getsize(unquote(urlparse(f).path)))
        except OSError:
            return None
    return sizes


def estimated_scan_partitions(df: DataFrame) -> int | None:
    """Estimate how many scan partitions Spark will plan for ``df``'s
    file sources WITHOUT converting to an RDD: Spark splits each file
    into chunks of ≤ spark.sql.files.maxPartitionBytes and bin-packs
    (chunk + openCostInBytes) into maxPartitionBytes bins — the
    estimate mirrors that arithmetic from locally stat-able file
    sizes (FilePartition.maxSplitBytes in the Spark source)."""
    sizes = _local_file_sizes(df)
    if sizes is None:
        return None
    conf = df.sparkSession.conf
    mpb = _conf_bytes(
        conf, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024
    )
    open_cost = _conf_bytes(
        conf, "spark.sql.files.openCostInBytes", 4 * 1024 * 1024
    )
    # mirror FilePartition.maxSplitBytes: cap the split size so the
    # scan uses all cores when the data is small
    total = sum(s + open_cost for s in sizes)
    cores = df.sparkSession.sparkContext.defaultParallelism
    split = min(mpb, max(open_cost, total // max(1, cores)))
    total_cost = 0
    for size in sizes:
        n_chunks = max(1, math.ceil(size / split))
        total_cost += size + n_chunks * open_cost
    return max(1, math.ceil(total_cost / split))


def local_input_bytes(df: DataFrame) -> int | None:
    """Total bytes of ``df``'s locally stat-able file sources; None
    for non-file / remote inputs (same scope rule as
    :func:`estimated_scan_partitions`)."""
    sizes = _local_file_sizes(df)
    return None if sizes is None else sum(sizes)


def spread_if_underpartitioned(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition ``df`` onto defaultParallelism when it would scan as
    fewer partitions than there are cores — the shared gate in front of
    the per-row Arrow kernels (gram shingling, multimodal synth/decode/
    fingerprint chains), whose whole Python-side computation otherwise
    runs in ONE task on single-row-group local parquet.

    Same discipline as the era-OLS gate: the estimate reads file sizes
    (never df.rdd); a well-partitioned production scan is untouched
    (est is None or >= cores); the repartition hashes a DETERMINISTIC
    key (xxhash64 of ``key_cols``, default all columns) so
    multi-consumer lineages keep ReusedExchange eligibility. Only
    per-row-deterministic consumers may use this — any spread must be
    value-identical.
    """
    from pyspark.sql import functions as F

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    est = estimated_scan_partitions(df)
    if est is not None and est < parallelism:
        cols = list(key_cols) or df.columns
        return df.repartition(parallelism, F.xxhash64(*cols))
    return df
