"""Streaming CDC contribution maintenance — the incremental half of
:func:`reconcile.incremental_agg`'s delta derivation, run against a
LIVE change stream with out-of-order delivery.

The hard part of streaming CDC is not the arithmetic but the
latest-wins discipline ACROSS micro-batches: a change with an older
sequence number may arrive in a LATER micro-batch (replayed
partitions, multi-source log shipping), and it must lose to the
already-applied newer change. That requires per-key state (the
applied sequence number), which no built-in streaming aggregate
expresses — so, like the sketch halves in streaming/sketch.py, this
is an ``applyInPandasWithState`` operator. State per key is three
scalars (applied seq, op, value) — key-cardinality, stream-length
independent.

The base lookup (group attribute, old value, presence) is a
stream-STATIC left join upstream of the stateful operator — the
supported composition — so Python only compares sequence numbers and
emits one delta row per touched key per micro-batch.

Output (update mode): ``(k, grp, gen, dn, ds)`` — the key's CURRENT
contribution to its group's maintained (count, sum) aggregate, tagged
with a generation counter: rows at each key's max gen, summed per
group and added to the base aggregate, equal the batch
:func:`reconcile.incremental_agg` over the full stream EXACTLY
(tests/test_streaming.py pins it across adversarially out-of-order
micro-batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_contributions_stream(
    changes_stream: DataFrame,
    base: DataFrame,
    *,
    key_col: str = "k",
    seq_col: str = "seq",
    op_col: str = "op",
    value_col: str = "v",
    group_col: str = "grp",
) -> DataFrame:
    """Maintain each key's latest-wins aggregate contribution under a
    streaming change feed. ``base`` is a static (batch) frame; the
    contribution semantics are :func:`reconcile.incremental_agg`'s
    delta rules (D-existing: (-1, -old); U-existing: (0, new-old);
    U-insert: (+1, new) into the NULL group; D-unseen: (0, 0))."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        StructField,
        StructType,
    )

    if not changes_stream.isStreaming:
        raise ValueError(
            "cdc_contributions_stream expects a streaming DataFrame"
        )
    # the group key keeps its native integral type (the batch rollup
    # it merges into would silently never match a stringified copy —
    # review finding, round 13); non-integral groups ride as string
    gt = base.schema[group_col].dataType
    integral_grp = isinstance(
        gt, (ByteType, ShortType, IntegerType, LongType)
    )
    grp_out_type = LongType() if integral_grp else StringType()
    grp_expr = (
        F.col(group_col).cast("long")
        if integral_grp
        else F.col(group_col).cast("string")
    )
    st = changes_stream.select(
        F.col(key_col).cast("long").alias("__k"),
        F.col(seq_col).cast("long").alias("__seq"),
        F.col(op_col).alias("__op"),
        F.col(value_col).cast("long").alias("__new"),
    )
    bs = base.select(
        F.col(key_col).cast("long").alias("__k"),
        grp_expr.alias("__grp"),
        F.col(value_col).cast("long").alias("__old"),
        F.lit(1).alias("__in_base"),
    )
    enriched = st.join(bs, "__k", "left")
    out_schema = StructType(
        [
            StructField("k", LongType()),
            StructField("grp", grp_out_type),
            StructField("gen", LongType()),
            StructField("dn", LongType()),
            StructField("ds", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("op", StringType()),
            StructField("new", LongType()),
            StructField("gen", LongType()),
        ]
    )

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        chunks = [p for p in pdfs if len(p)]
        if not chunks:  # the empty-batch guard the sibling state
            return      # operators carry (events.py / anomaly.py)
        rows = pd.concat(chunks, ignore_index=True)
        rows = rows[rows["__seq"].notna()]
        if not len(rows):  # a batch of NULL-seq changes carries no
            return         # well-defined latest — skip it
        best = rows.loc[rows["__seq"].idxmax()]
        if state.exists:
            seq, op, new, gen = state.get
        else:
            seq, op, new, gen = None, None, None, 0
        # latest-wins ACROSS batches: an out-of-order older change
        # arriving later must lose to the applied newer one
        if seq is None or int(best["__seq"]) > seq:
            seq = int(best["__seq"])
            op = str(best["__op"])
            new = (
                int(best["__new"]) if pd.notna(best["__new"]) else None
            )
        gen += 1
        state.update((seq, op, new, gen))
        in_base = pd.notna(best["__in_base"])
        old = int(best["__old"]) if pd.notna(best["__old"]) else 0
        if pd.isna(best["__grp"]):
            grp = None
        elif integral_grp:
            grp = int(best["__grp"])
        else:
            grp = str(best["__grp"])
        nv = new if new is not None else 0
        if op == "D":
            dn, ds = (-1, -old) if in_base else (0, 0)
        elif in_base:
            dn, ds = 0, nv - old
        else:
            dn, ds = 1, nv
        yield pd.DataFrame(
            {
                "k": [key[0]],
                "grp": [grp],
                "gen": [gen],
                "dn": [dn],
                "ds": [ds],
            }
        )

    return enriched.groupBy("__k").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
