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


def _frame_median(c: Column, frame) -> Column:
    """Exact median of a trailing frame. ``median``/``percentile``
    reject custom window frames (INVALID_WINDOW_SPEC_FOR_AGGREGATION_
    FUNC), so the frame is gathered with collect_list (frame-capable),
    sorted, and interpolated — O(w log w) per row, fine for the small
    trailing windows these transformers take."""
    arr = F.array_sort(F.collect_list(c).over(frame))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return (lo + hi) / 2.0


class RollingAggTransformer(_OrderedPanelTransformer):
    """Generic trailing-window aggregates — the MovingAverage family
    extended to ``{f}_rolling_{agg}{w}`` for agg in
    mean/sum/min/max/std/median (sample std ddof=1; exact interpolated
    median). Same null rule as MovingAverage: windows with
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
        known = set(_ROLLING_AGGS) | {"median"}
        bad = [a for a in aggs if a not in known]
        if bad:
            raise ValueError(
                f"Unknown rolling aggs {bad}; choose from {sorted(known)}"
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
                    if agg == "median":
                        stat = _frame_median(c, frame)
                    else:
                        stat = _ROLLING_AGGS[agg](c).over(frame)
                    expr = F.when(full, stat)
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


class RollingCorrTransformer(_OrderedPanelTransformer):
    """Trailing-window Pearson correlation and OLS beta of each feature
    against a benchmark column within ticker — the rolling
    co-movement/beta family of a finance panel pipeline:

    - ``{f}_corr{w}_{bench}`` = corr(f, bench) over the trailing w rows
    - ``{f}_beta{w}_{bench}``  = cov(f, bench)/var(bench) (slope of f
      regressed on bench)

    Windows with fewer than w complete (both-non-null) pairs → null;
    zero-variance windows → null. Computed from five shared window sums
    (Σx, Σy, Σxy, Σx², Σy²) in ONE fused WindowExec — a single shuffle
    for the whole fan-out, no UDFs; outputs round to ``round_dp`` so the
    DuckDB oracle (same formula text over the same frame-ordered sums)
    matches bit-for-bit."""

    def __init__(
        self,
        bench_col: str,
        windows: Sequence[int],
        feature_names=None,
        round_dp: int = 6,
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        self.bench_col = bench_col
        self.windows = list(windows)
        self.round_dp = round_dp

    def _metadata_cols(self) -> list[str]:
        return list(dict.fromkeys(super()._metadata_cols() + [self.bench_col]))

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = [f for f in feats if f != self.bench_col]
        y = F.col(self.bench_col)
        cols = []
        for f in self.feature_names_:
            x = F.col(f)
            pair = x.isNotNull() & y.isNotNull()
            xm = F.when(pair, x.cast("double"))
            ym = F.when(pair, y.cast("double"))
            for wsize in self.windows:
                frame = self._window().rowsBetween(-(wsize - 1), 0)
                n = F.count(F.when(pair, F.lit(1))).over(frame)
                sx = F.sum(xm).over(frame)
                sy = F.sum(ym).over(frame)
                sxy = F.sum(xm * ym).over(frame)
                sxx = F.sum(xm * xm).over(frame)
                syy = F.sum(ym * ym).over(frame)
                nn = n.cast("double")
                cov_n = nn * sxy - sx * sy
                varx_n = nn * sxx - sx * sx
                vary_n = nn * syy - sy * sy
                full = n == wsize
                corr = F.when(
                    full & (varx_n > 0) & (vary_n > 0),
                    F.round(cov_n / (F.sqrt(varx_n) * F.sqrt(vary_n)), self.round_dp),
                )
                beta = F.when(
                    full & (vary_n > 0),
                    F.round(cov_n / vary_n, self.round_dp),
                )
                cols.append(corr.alias(f"{f}_corr{wsize}_{self.bench_col}"))
                cols.append(beta.alias(f"{f}_beta{wsize}_{self.bench_col}"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names_ if hasattr(self, "feature_names_") else [
            f for f in (self.feature_names or []) if f != self.bench_col
        ]
        return [
            f"{f}_{kind}{w}_{self.bench_col}"
            for f in feats
            for w in self.windows
            for kind in ("corr", "beta")
        ]


def ewma_weights(span: int, window: int) -> list[float]:
    """Truncated-EWMA weights (most-recent first): (1−α)^i with
    α = 2/(span+1), pandas ``adjust=True`` convention. Computed once in
    Python and injected as literals into BOTH engines' expressions —
    pow() differs by ULPs across libms, identical literals do not."""
    alpha = 2.0 / (span + 1.0)
    return [(1.0 - alpha) ** i for i in range(window)]


class EWMATransformer(_OrderedPanelTransformer):
    """Truncated exponentially-weighted moving average within ticker:
    ``{f}_ewma{span}`` = Σ_{i<w} (1−α)^i·f_{t−i} / Σ_{i<w} (1−α)^i with
    α = 2/(span+1), truncated at ``window`` rows (weight below
    (1−α)^w ≈ negligible for w ≳ 3·span). Any null inside the window →
    null (matches the full-window rule of MovingAverage).

    Plan: w fused F.lag calls over ONE WindowSpec — a single shuffle,
    no arrays, no UDFs; the weight literals make the DuckDB oracle
    bit-exact. Unbounded-history EWMA is deliberately not offered: its
    exact distributed form needs a per-group sequential scan (an
    O(n·w)-free recurrence), which truncation avoids. Discarded tail
    weight is (1−α)^w of the mass — ~0.2% at the default w = 3·span
    (adjust=True renormalizes within the window, so this biases only
    vs an UNtruncated ewm); pass window ≈ 10·span when you need the
    tail below 1e-6."""

    def __init__(
        self,
        spans: Sequence[int],
        feature_names=None,
        window: int | None = None,
        round_dp: int = 6,
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        self.spans = list(spans)
        self.window = window
        self.round_dp = round_dp

    def _win_len(self, span: int) -> int:
        return self.window if self.window is not None else 3 * span

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        w = self._window()
        cols = []
        for f in feats:
            c = F.col(f).cast("double")
            for span in self.spans:
                wlen = self._win_len(span)
                wts = ewma_weights(span, wlen)
                total = sum(wts)
                acc = None
                for i, wt in enumerate(wts):
                    term = (F.lag(c, i).over(w) if i else c) * F.lit(wt)
                    acc = term if acc is None else acc + term
                cols.append(
                    F.round(acc / F.lit(total), self.round_dp).alias(
                        f"{f}_ewma{span}"
                    )
                )
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_ewma{s}" for f in feats for s in self.spans]


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


class DrawdownTransformer(_OrderedPanelTransformer):
    """Running peak and drawdown per ticker: ``{f}_cummax`` (expanding
    max) and ``{f}_drawdown`` = (peak − x)/peak — the standard
    peak-to-trough loss measure of a value series. One unbounded-
    preceding frame per ticker (shares the shuffle with any other
    same-spec window); non-positive peaks yield null drawdown (the
    when() guard) — drawdown is only defined for positive value
    paths."""

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        frame = self._window().rowsBetween(Window.unboundedPreceding, 0)
        cols = []
        for f in feats:
            peak = F.max(F.col(f)).over(frame)
            dd = F.when(peak > 0, (peak - F.col(f)) / peak)
            cols.append(peak.alias(f"{f}_cummax"))
            cols.append(dd.alias(f"{f}_drawdown"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [n for f in feats for n in (f"{f}_cummax", f"{f}_drawdown")]


class ForwardReturnTransformer(_OrderedPanelTransformer):
    """LABEL construction: forward returns within ticker —
    ``{f}_fwd{k}`` = f_{t+k}/f_t − 1 (or the log return with
    ``log=True``); the trailing k rows of each group are null (the
    future is unknown there, never zero-filled).

    The supervised-learning complement of LagTransformer: lags build
    features, leads build targets. Combine with
    ``model_selection.assign_folds(embargo=horizon)`` — a forward
    label of horizon k is exactly the leakage window the embargo
    exists for. Same single fused WindowSpec as the other ordered
    transformers (one shuffle on the ticker key); rounded to
    ``round_dp`` for cross-engine division parity."""

    def __init__(
        self,
        horizons: Sequence[int] = (1,),
        feature_names=None,
        log: bool = False,
        round_dp: int = 6,
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        self.horizons = list(horizons)
        self.log = log
        self.round_dp = round_dp

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        w = self._window()
        cols = []
        for f in feats:
            c = F.col(f)
            for k in self.horizons:
                nxt = F.lead(c, k).over(w)
                if self.log:
                    r = F.log(nxt) - F.log(c)
                else:
                    r = nxt / c - 1
                cols.append(F.round(r, self.round_dp).alias(f"{f}_fwd{k}"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_fwd{k}" for f in feats for k in self.horizons]


class RollingRankTransformer(_OrderedPanelTransformer):
    """Trailing-window rank within ticker: ``{f}_rollrank{k}`` = 1 +
    (count of strictly-smaller values among the trailing k
    observations, current included) — the bounded-memory rank feature
    quant pipelines use where a full cross-sectional rank would leak
    across time. Integer-valued (ties share the low rank), null until
    the window fills or when the current value is null.

    Plan: the trailing values ride a ``collect_list`` over the SAME
    fused (ticker, order) WindowSpec as the other ordered transformers
    (arrays of ≤ k doubles — k is a small literal); the rank is a pure
    codegen array fold. One shuffle. Bit-exact DuckDB oracle: the
    identical list-filter count."""

    def __init__(
        self,
        windows: Sequence[int] = (5,),
        feature_names=None,
        **kwargs,
    ):
        super().__init__(feature_names, **kwargs)
        self.windows = list(windows)

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        cols = []
        for f in feats:
            c = F.col(f).cast("double")
            for k in self.windows:
                wk = self._window().rowsBetween(-(k - 1), 0)
                arr = F.collect_list(c).over(wk)
                n = F.count(c).over(wk)
                rank = F.aggregate(
                    arr,
                    F.lit(0),
                    lambda acc, v: acc + F.when(v < c, 1).otherwise(0),
                ) + F.lit(1)
                cols.append(
                    F.when((n == k) & c.isNotNull(), rank)
                    .cast("int")
                    .alias(f"{f}_rollrank{k}")
                )
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_")
        return [f"{f}_rollrank{k}" for f in feats for k in self.windows]
