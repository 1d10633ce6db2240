"""Grouped time-series transformers: Lag, MovingAverage, LogReturn.

Reference semantics (/root/reference/src/centimators/feature_transformers/
time_series.py):
- Lag (:37-89): ``{f}_lag{k}`` = f shifted k rows within ticker; leading k
  rows null; output columns lag-major with lags sorted DESC
  (``windows=sorted(windows, reverse=True)``, :58).
- MovingAverage (:100-146): ``{f}_ma{w}`` = trailing mean over w rows
  within ticker; windows with fewer than w non-null rows → null
  (narwhals rolling_mean min_samples defaults to window_size).
- LogReturn (:160-197): ``{f}_logreturn`` = ln(f_t) − ln(f_{t−1}) within
  ticker; first row null.

The reference relies on physical row order within group; Spark has none,
so these take explicit ``order_cols`` (include a unique tiebreaker column
for determinism — SURVEY.md §7 risk 1).

Spark plan: all derived columns share ONE WindowSpec (same partition,
same order), so Catalyst fuses every F.lag/F.avg into a single WindowExec
→ exactly one shuffle per transformer, and consecutive transformers with
the same (partition, order) reuse the sort. No UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from centimators_spark.base import PanelTransformer


class _OrderedPanelTransformer(PanelTransformer):
    def __init__(
        self,
        feature_names: Sequence[str] | None = None,
        *,
        ticker_col: str | Sequence[str] = "ticker",
        order_cols: Sequence[str] | str = ("date",),
        output_mode: str = "append",
        keep_cols: Sequence[str] | None = None,
    ):
        super().__init__(feature_names, output_mode=output_mode, keep_cols=keep_cols)
        self.ticker_cols = [ticker_col] if isinstance(ticker_col, str) else list(ticker_col)
        self.order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)

    def _metadata_cols(self) -> list[str]:
        return list(dict.fromkeys(self.ticker_cols + self.order_cols))

    def _window(self) -> WindowSpec:
        return Window.partitionBy(*self.ticker_cols).orderBy(*self.order_cols)


class LagTransformer(_OrderedPanelTransformer):
    """``{f}_lag{k}`` for k in windows (sorted desc, lag-major order)."""

    def __init__(self, windows: Sequence[int], feature_names=None, **kwargs):
        super().__init__(feature_names, **kwargs)
        # reference: time_series.py:58 sorts lags descending
        self.windows = sorted(windows, reverse=True)

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        w = self._window()
        return [
            F.lag(F.col(f), k).over(w).alias(f"{f}_lag{k}")
            for k in self.windows
            for f in feats
        ]

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_lag{k}" for k in self.windows for f in feats]


class MovingAverageTransformer(_OrderedPanelTransformer):
    """``{f}_ma{w}`` trailing mean over w rows; partial windows → null."""

    def __init__(self, windows: Sequence[int], feature_names=None, **kwargs):
        super().__init__(feature_names, **kwargs)
        self.windows = list(windows)

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        cols = []
        # feature-major output order (reference time_series.py:125-129
        # iterates features outer, windows inner)
        for f in feats:
            c = F.col(f)
            for wsize in self.windows:
                frame = self._window().rowsBetween(-(wsize - 1), 0)
                # narwhals rolling_mean(min_samples=window_size): need w
                # non-null obs in the trailing w-row frame, else null
                avg = F.when(F.count(c).over(frame) == wsize, F.avg(c).over(frame))
                cols.append(avg.alias(f"{f}_ma{wsize}"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_ma{w}" for f in feats for w in self.windows]


_ROLLING_AGGS = {
    "mean": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "std": F.stddev_samp,
}


class RollingAggTransformer(_OrderedPanelTransformer):
    """Generic trailing-window aggregates — the MovingAverage family
    extended to ``{f}_rolling_{agg}{w}`` for agg in mean/sum/min/max/std
    (sample std, ddof=1). Same null rule as MovingAverage: windows with
    fewer than w non-null rows → null. All (feature × window × agg)
    columns share ONE WindowSpec per frame, so Catalyst fuses them into
    a single WindowExec — one shuffle for the whole fan-out."""

    def __init__(
        self,
        windows: Sequence[int],
        feature_names=None,
        aggs: Sequence[str] = ("mean",),
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        self.windows = list(windows)
        bad = [a for a in aggs if a not in _ROLLING_AGGS]
        if bad:
            raise ValueError(
                f"Unknown rolling aggs {bad}; choose from {sorted(_ROLLING_AGGS)}"
            )
        self.aggs = list(aggs)

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        cols = []
        for f in feats:
            c = F.col(f)
            for wsize in self.windows:
                frame = self._window().rowsBetween(-(wsize - 1), 0)
                full = F.count(c).over(frame) == wsize
                for agg in self.aggs:
                    expr = F.when(full, _ROLLING_AGGS[agg](c).over(frame))
                    cols.append(expr.alias(f"{f}_rolling_{agg}{wsize}"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [
            f"{f}_rolling_{a}{w}"
            for f in feats
            for w in self.windows
            for a in self.aggs
        ]


class DiffTransformer(_OrderedPanelTransformer):
    """Plain differences and percent changes within ticker:
    ``{f}_diff{k}`` = f_t − f_{t−k} and (optionally) ``{f}_pct{k}`` =
    f_t/f_{t−k} − 1; leading k rows null. The non-log sibling of
    LogReturnTransformer, same single fused WindowSpec."""

    def __init__(
        self,
        windows: Sequence[int] = (1,),
        feature_names=None,
        pct_change: bool = False,
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        self.windows = list(windows)
        self.pct_change = pct_change

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        w = self._window()
        cols = []
        for f in feats:
            c = F.col(f)
            for k in self.windows:
                prev = F.lag(c, k).over(w)
                cols.append((c - prev).alias(f"{f}_diff{k}"))
                if self.pct_change:
                    cols.append((c / prev - 1).alias(f"{f}_pct{k}"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        out = []
        for f in feats:
            for k in self.windows:
                out.append(f"{f}_diff{k}")
                if self.pct_change:
                    out.append(f"{f}_pct{k}")
        return out


class ExpandingAggTransformer(_OrderedPanelTransformer):
    """Expanding (cumulative) aggregates within ticker:
    ``{f}_expanding_{agg}`` over rows from the group start through the
    current row, agg in mean/sum/min/max/std (std null until 2 rows).
    One unbounded-preceding frame shared by every column."""

    def __init__(
        self,
        feature_names=None,
        aggs: Sequence[str] = ("sum",),
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        bad = [a for a in aggs if a not in _ROLLING_AGGS]
        if bad:
            raise ValueError(
                f"Unknown expanding aggs {bad}; choose from {sorted(_ROLLING_AGGS)}"
            )
        self.aggs = list(aggs)

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        frame = self._window().rowsBetween(Window.unboundedPreceding, 0)
        return [
            _ROLLING_AGGS[agg](F.col(f)).over(frame).alias(f"{f}_expanding_{agg}")
            for f in feats
            for agg in self.aggs
        ]

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_expanding_{a}" for f in feats for a in self.aggs]


class LogReturnTransformer(_OrderedPanelTransformer):
    """``{f}_logreturn`` = ln(f_t) − ln(f_{t−1}) within ticker; first row null."""

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        w = self._window()
        return [
            (F.log(F.col(f)) - F.lag(F.log(F.col(f)), 1).over(w)).alias(f"{f}_logreturn")
            for f in feats
        ]

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_logreturn" for f in feats]
