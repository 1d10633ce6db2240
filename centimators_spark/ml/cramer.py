"""Cramer-rule solver with a mirrored SQL generator.

Purpose: give the distributed OLS (ml/estimators.py LinearRegressor)
a BIT-EXACT DuckDB oracle. The recipe:

1. The caller supplies integer-valued features (scale fixed-decimal
   columns by 10^k first), so every Gram product is an exact integer
   and the DECIMAL(38,0) sums are exact — identical in any engine and
   any partition order.
2. Both engines convert those exact sums to double and evaluate THE
   SAME floating-point expression: the functions below enumerate the
   determinant terms in one fixed order (lexicographic permutations,
   left-to-right accumulation, left-associated products), and emit that
   identical expression once as Python float arithmetic (`solve_floats`)
   and once as SQL text (`solve_sql`). IEEE doubles make the two
   evaluations bit-identical.

Practical for k ≤ ~6 unknowns (k! terms per determinant); the
LinearRegressor default path uses numpy lstsq/solve instead.
"""

from __future__ import annotations

from itertools import permutations
from typing import Sequence


def _signed_perms(n: int) -> list[tuple[int, tuple[int, ...]]]:
    """Permutations of range(n) in lexicographic order with parity sign."""
    out = []
    for p in permutations(range(n)):
        inversions = sum(
            1 for i in range(n) for j in range(i + 1, n) if p[i] > p[j]
        )
        out.append((-1 if inversions % 2 else 1, p))
    return out


def det_float(M: Sequence[Sequence[float]]) -> float:
    n = len(M)
    acc = 0.0
    for sign, p in _signed_perms(n):
        term = 1.0
        for i in range(n):
            term = term * M[i][p[i]]
        acc = acc + term if sign > 0 else acc - term
    return acc


def det_sql(M: Sequence[Sequence[str]]) -> str:
    n = len(M)
    parts = ["0.0"]
    for sign, p in _signed_perms(n):
        prod = " * ".join(M[i][p[i]] for i in range(n))
        parts.append(f"{'+' if sign > 0 else '-'} ({prod})")
    return "(" + " ".join(parts) + ")"


def _replace_col(M, col, v):
    return [
        [v[i] if j == col else M[i][j] for j in range(len(M))]
        for i in range(len(M))
    ]


def solve_floats(
    G: Sequence[Sequence[float]], m: Sequence[float]
) -> list[float]:
    """x solving Gx = m via Cramer's rule, mirroring solve_sql exactly."""
    d = det_float(G)
    return [det_float(_replace_col(G, i, m)) / d for i in range(len(m))]


def solve_sql(G: Sequence[Sequence[str]], m: Sequence[str]) -> list[str]:
    """SQL expressions for each solution component (same term order as
    solve_floats — evaluating them on the same inputs is bit-identical)."""
    d = det_sql(G)
    return [f"({det_sql(_replace_col(G, i, m))} / {d})" for i in range(len(m))]
