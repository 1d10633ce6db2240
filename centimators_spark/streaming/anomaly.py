"""Streaming EWMA anomaly detection — the UNBOUNDED-history exponential
recurrence as an ``applyInPandasWithState`` operator.

The batch engine deliberately truncates its EWMA (a window of w lags;
see operators/time_series.EWMATransformer) because the exact recurrence
is sequential. Streaming state makes the exact form natural: per key,
carry (n, mean, var) and fold each event in order:

    delta = x − mean
    mean += α·delta
    var   = (1 − α)·(var + α·delta²)     (exp-weighted variance)

Each event is scored against the PRIOR state (the point must not
inflate its own band — same rule as operators/anomaly.py):

    z = (x − mean_prev) / sqrt(var_prev)
    anomaly = |z| > k          (null until min_periods prior events)

State is three doubles + a count per key; unbounded key spaces need a
TTL upstream. Ordering contract matches session_ids_stateful: per-key
non-decreasing event time across micro-batches for exact parity; within
a batch rows are sorted (ts, id).

The same function on a batch frame (is_streaming False) runs the same
kernel via plain ``applyInPandas`` — the unified-model twin that the
incremental==batch test (and a pure-pandas reference) pins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("var", DoubleType()),
    ]
)


def _fold(
    xs: np.ndarray, n: int, mean: float, var: float, alpha: float,
    k: float, min_periods: int
):
    """Sequential EWMA fold; returns (z, flag arrays, end state)."""
    z = np.full(len(xs), np.nan)
    flag = np.full(len(xs), -1, dtype=np.int64)  # -1 encodes null
    for i, x in enumerate(xs):
        if n >= min_periods and var > 0:
            z[i] = (x - mean) / np.sqrt(var)
            flag[i] = 1 if abs(z[i]) > k else 0
        delta = x - mean
        mean += alpha * delta
        var = (1.0 - alpha) * (var + alpha * delta * delta)
        n += 1
    return z, flag, n, mean, var


def ewma_anomaly_stream(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    id_col: str = "event_id",
    alpha: float = 0.3,
    k: float = 3.0,
    min_periods: int = 5,
) -> DataFrame:
    """Score each event's value against its key's exponentially-weighted
    running mean/σ. Output: (id, key, ts_epoch, value, z rounded 6dp,
    anomaly 0/1/null). Works identically on a stream (stateful, state
    carried across micro-batches) and on a batch frame (one grouped
    pass)."""
    narrow = events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("k"),
        F.unix_timestamp(F.col(ts_col)).alias("ts_epoch"),
        F.col(value_col).cast("double").alias("x"),
    )
    out_schema = StructType(
        [
            narrow.schema["event_id"],
            narrow.schema["k"],
            StructField("ts_epoch", LongType()),
            StructField("x", DoubleType()),
            StructField("z", DoubleType()),
            StructField("anomaly", LongType()),
        ]
    )

    def score(pdf: pd.DataFrame, n: int, mean: float, var: float):
        pdf = pdf.sort_values(["ts_epoch", "event_id"], kind="mergesort")
        z, flag, n, mean, var = _fold(
            pdf["x"].to_numpy(dtype=float), n, mean, var, alpha, k,
            min_periods,
        )
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "k": pdf["k"].to_numpy(),
                "ts_epoch": pdf["ts_epoch"].to_numpy(),
                "x": pdf["x"].to_numpy(),
                "z": np.round(z, 6),
                "anomaly": flag,
            }
        )
        out["z"] = out["z"].where(~np.isnan(out["z"]), None)
        out["anomaly"] = out["anomaly"].astype("object").where(
            out["anomaly"] >= 0, None
        )
        return out, n, mean, var

    if events.isStreaming:

        def update(
            key, pdfs: Iterator[pd.DataFrame], state: GroupState
        ) -> Iterator[pd.DataFrame]:
            n, mean, var = state.get if state.exists else (0, 0.0, 0.0)
            pdf = pd.concat(list(pdfs))
            if len(pdf) == 0:
                return
            out, n, mean, var = score(pdf, n, mean, var)
            state.update((int(n), float(mean), float(var)))
            yield out

        return narrow.groupBy("k").applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def batch_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _, _, _ = score(pdf, 0, 0.0, 0.0)
        return out

    return narrow.groupBy("k").applyInPandas(batch_kernel, schema=out_schema)
