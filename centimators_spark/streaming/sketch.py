"""Streaming sketch maintenance — the incremental half of the sketch
family (sketches.py: count-min cells, HLL, percentile, theta). A
count-min sketch is a pure additive aggregate (cell counts), so the
SAME cell fan-out that builds it in batch maintains it incrementally
under Structured Streaming's stateful aggregation: each micro-batch
merges its partial cell counts into the running d×w state, and the
state size is the SKETCH size (d·w cells — KBs), not the stream size.
That bounded-state property is exactly why sketches are the right
distinct/frequency primitives for unbounded 100 TB ingest streams.

`cms_cells_stream` deliberately reuses :func:`sketches.cms_build` —
the batch and streaming builds are THE SAME declarative plan, so the
incremental==batch parity test (tests/test_streaming.py) pins that
Structured Streaming's merge of partial counts reproduces the batch
sketch bit for bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-export habit)

from centimators_spark.sketches import (
    CMS_D,
    CMS_W,
    cms_build,
    hll_register_cells,
)


def read_documents_stream(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """documents parquet as a file-source stream (schema pinned)."""
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def cms_cells_stream(
    docs_stream: DataFrame,
    *,
    content_col: str = "text",
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """Running (row, bucket, c) count-min cells over a document
    stream — complete/update-mode stateful aggregation with d·w-cell
    state. Identical plan to the batch build (the parity contract)."""
    if not docs_stream.isStreaming:
        raise ValueError("cms_cells_stream expects a streaming DataFrame")
    return cms_build(docs_stream, content_col=content_col, d=d, w=w)


def hll_registers_stream(
    docs_stream: DataFrame,
    *,
    group_col: str = "source",
    item_col: str = "text",
) -> DataFrame:
    """Running (grp, j, m) HLL registers over a document stream —
    complete/update-mode stateful aggregation whose state is the
    SKETCH (m registers per group), never the stream. Register-wise
    max is the merge (the hll_union_pairs rule), and it is
    duplicate-idempotent, so the plan is identical to the batch
    :func:`sketches.hll_register_cells` build — the parity contract
    (tests/test_streaming.py) pins incremental == batch bit for bit
    across micro-batches."""
    if not docs_stream.isStreaming:
        raise ValueError(
            "hll_registers_stream expects a streaming DataFrame"
        )
    return hll_register_cells(docs_stream, group_col, item_col)
