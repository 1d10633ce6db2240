"""Row-wise (horizontal) statistics as pure Column expressions.

Exact formula parity with the reference
(/root/reference/src/centimators/narwhals_utils.py:31-212):
- n in denominators and bias corrections is the STATIC column count
  ``len(exprs)`` — the reference computes it at expression-build time
  (narwhals_utils.py:43,93,146), so rows with nulls still divide by the
  full count. Only the mean and the centered-moment SUMS skip nulls
  (narwhals ``mean_horizontal``/``sum_horizontal`` semantics).
- var/std use SAMPLE ddof=1; constant NaN when len(cols) - ddof <= 0
- skew: bias-corrected  n/((n-1)(n-2)) * Σ((x-μ)/s)³ ; NaN when n < 3
- kurtosis: excess G2   n(n+1)/((n-1)(n-2)(n-3))·Σz⁴ − 3(n−1)²/((n−2)(n−3)) ;
  NaN when n < 4
- range: max − min ; cv: std/mean (inf / NaN propagation)

Implementation: direct column arithmetic (sum of coalesced terms,
left-to-right), NOT array higher-order functions — HOF lambdas fall out
of whole-stage codegen and are ~50x slower row-local. Everything here
stays JVM-side in codegen: zero shuffles, zero UDFs.

Bit-exactness note: addition is left-to-right in declared column order
and powers are explicit multiplications, so results are bit-identical to
any engine evaluating the same formula left-to-right (the DuckDB oracle
does).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def NAN() -> Column:
    return F.lit(float("nan"))


def POS_INF() -> Column:
    return F.lit(float("inf"))


def _terms(cols: Sequence[str | Column]) -> list[Column]:
    return [(F.col(c) if isinstance(c, str) else c).cast("double") for c in cols]


def _n(ts: list[Column]) -> Column:
    return reduce(
        lambda a, b: a + b,
        [F.when(t.isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0)) for t in ts],
    )


def _sum_skipnull(exprs: list[Column], guards: list[Column]) -> Column:
    """Left-to-right sum of exprs, skipping rows' null inputs (guard col)."""
    return reduce(
        lambda a, b: a + b,
        [F.when(g.isNotNull(), e).otherwise(F.lit(0.0)) for e, g in zip(exprs, guards)],
    )


def mean_horizontal(cols: Sequence[str | Column]) -> Column:
    ts = _terms(cols)
    n = _n(ts)
    return F.when(n > 0, _sum_skipnull(ts, ts) / n)


def _mean_expr(ts: list[Column]) -> Column:
    """Null-skipping row mean (narwhals ``mean_horizontal``)."""
    n = _n(ts)
    return F.when(n > 0, _sum_skipnull(ts, ts) / n)


def _var_expr(ts: list[Column], ddof: int) -> Column:
    # static-n denominator (reference narwhals_utils.py:43-57)
    mu = _mean_expr(ts)
    ss = _sum_skipnull([(t - mu) * (t - mu) for t in ts], ts)
    return ss / F.lit(float(len(ts) - ddof))


def var_horizontal(cols: Sequence[str | Column], ddof: int = 1) -> Column:
    ts = _terms(cols)
    if len(ts) - ddof <= 0:
        return NAN()
    return _var_expr(ts, ddof)


def std_horizontal(cols: Sequence[str | Column], ddof: int = 1) -> Column:
    return F.sqrt(var_horizontal(cols, ddof))


def skew_horizontal(cols: Sequence[str | Column]) -> Column:
    """Bias-corrected sample skewness; NaN when len(cols) < 3 or s == 0."""
    ts = _terms(cols)
    n = len(ts)
    if n < 3:
        return NAN()
    s = F.sqrt(_var_expr(ts, 1))
    mu = _mean_expr(ts)
    z3 = _sum_skipnull(
        [((t - mu) / s) * ((t - mu) / s) * ((t - mu) / s) for t in ts], ts
    )
    return F.when(s == 0, NAN()).otherwise(F.lit(n / ((n - 1) * (n - 2))) * z3)


def kurtosis_horizontal(cols: Sequence[str | Column]) -> Column:
    """Bias-corrected excess kurtosis (G2); NaN when len(cols) < 4 or s == 0."""
    ts = _terms(cols)
    n = len(ts)
    if n < 4:
        return NAN()
    s2 = _var_expr(ts, 1)
    mu = _mean_expr(ts)
    z4 = _sum_skipnull(
        [((t - mu) * (t - mu) / s2) * ((t - mu) * (t - mu) / s2) for t in ts], ts
    )
    term1 = F.lit(n * (n + 1) / ((n - 1) * (n - 2) * (n - 3))) * z4
    term2 = F.lit(3 * ((n - 1) * (n - 1)) / ((n - 2) * (n - 3)))
    return F.when(s2 == 0, NAN()).otherwise(term1 - term2)


def min_horizontal(cols: Sequence[str | Column]) -> Column:
    """Row-wise min, null-skipping (reference narwhals_utils.py:165-173)."""
    ts = _terms(cols)
    return F.least(*ts) if len(ts) > 1 else ts[0]


def max_horizontal(cols: Sequence[str | Column]) -> Column:
    """Row-wise max, null-skipping (reference narwhals_utils.py:174-182)."""
    ts = _terms(cols)
    return F.greatest(*ts) if len(ts) > 1 else ts[0]


def range_horizontal(cols: Sequence[str | Column]) -> Column:
    ts = _terms(cols)
    n = _n(ts)
    # greatest/least skip nulls (return null only when ALL null)
    return F.when(n > 0, F.greatest(*ts) - F.least(*ts)) if len(ts) > 1 else F.when(
        n > 0, ts[0] - ts[0]
    )


def coefficient_of_variation_horizontal(cols: Sequence[str | Column]) -> Column:
    """std/mean with IEEE-style propagation: s/0 → +inf, 0/0 → NaN."""
    s = std_horizontal(cols)
    mu = mean_horizontal(cols)
    return (
        F.when(mu.isNull() | F.isnan(s), NAN())
        .when((mu == 0) & (s == 0), NAN())
        .when(mu == 0, POS_INF())
        .otherwise(s / mu)
    )
