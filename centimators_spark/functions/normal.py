"""Inverse standard-normal CDF (probit) in pure numpy.

Implements Wichura's algorithm AS 241 (PPND16, Applied Statistics 37(3),
1988) — double-precision rational approximations, |rel err| ~ 1e-16.
Needed because the runtime has no scipy; the reference uses
scipy.stats.norm.ppf (/root/reference/src/centimators/feature_transformers/
base.py:10-14). AS241 agrees with scipy's Cephes ndtri to ~1 ULP.
"""

from __future__ import annotations

import numpy as np

# AS 241 PPND16 coefficients
_A = (
    3.3871328727963666080e0, 1.3314166789178437745e2, 1.9715909503065514427e3,
    1.3731693765509461125e4, 4.5921953931549871457e4, 6.7265770927008700853e4,
    3.3430575583588128105e4, 2.5090809287301226727e3,
)
_B = (
    1.0, 4.2313330701600911252e1, 6.8718700749205790830e2,
    5.3941960214247511077e3, 2.1213794301586595867e4, 3.9307895800092710610e4,
    2.8729085735721942674e4, 5.2264952788528545610e3,
)
_C = (
    1.42343711074968357734e0, 4.63033784615654529590e0, 5.76949722146069140550e0,
    3.64784832476320460504e0, 1.27045825245236838258e0, 2.41780725177450611770e-1,
    2.27238449892691845833e-2, 7.74545014278341407640e-4,
)
_D = (
    1.0, 2.05319162663775882187e0, 1.67638483018380384940e0,
    6.89767334985100004550e-1, 1.48103976427480074590e-1, 1.51986665636164571966e-2,
    5.47593808499534494600e-4, 1.05075007164441684324e-9,
)
_E = (
    6.65790464350110377720e0, 5.46378491116411436990e0, 1.78482653991729133580e0,
    2.96560571828504891230e-1, 2.65321895265761230930e-2, 1.24266094738807843860e-3,
    2.71155556874348757815e-5, 2.01033439929228813265e-7,
)
_F = (
    1.0, 5.99832206555887937690e-1, 1.36929880922735805310e-1,
    1.48753612908506148525e-2, 7.86869131145613259100e-4, 1.84631831751005468180e-5,
    1.42151175831644588870e-7, 2.04426310338993978564e-15,
)


def _poly(coeffs, x):
    r = np.full_like(x, coeffs[-1], dtype=np.float64)
    for c in reversed(coeffs[:-1]):
        r = r * x + c
    return r


def norm_ppf(p: np.ndarray) -> np.ndarray:
    """Vectorized Φ⁻¹(p) for p in (0, 1); ±inf at 0/1, NaN outside."""
    p = np.asarray(p, dtype=np.float64)
    q = p - 0.5
    out = np.empty_like(p)

    central = np.abs(q) <= 0.425
    if central.any():
        r = 0.180625 - q[central] * q[central]
        out[central] = q[central] * _poly(_A, r) / _poly(_B, r)

    tail = ~central
    if tail.any():
        pt = p[tail]
        r = np.where(q[tail] < 0, pt, 1.0 - pt)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.sqrt(-np.log(r))
        near = r <= 5.0
        rr = np.where(near, r - 1.6, r - 5.0)
        val = np.where(near, _poly(_C, rr) / _poly(_D, rr), _poly(_E, rr) / _poly(_F, rr))
        out[tail] = np.where(q[tail] < 0, -val, val)

    out[p == 0.0] = -np.inf
    out[p == 1.0] = np.inf
    out[(p < 0.0) | (p > 1.0)] = np.nan
    return out


def _horner_sql(coeffs, x: str) -> str:
    """Left-to-right Horner chain as SQL text — parenthesized exactly
    like _poly's ``r = r*x + c`` loop so the float ops associate
    identically in every engine."""
    expr = repr(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        expr = f"({expr} * {x} + {repr(c)})"
    return expr


def norm_ppf_sql(u: str) -> str:
    """AS241 Φ⁻¹ as a single SQL expression over column/expr ``u`` —
    the SAME text is evaluated by Spark (F.expr) and the DuckDB oracle,
    so the probit becomes bit-exact cross-engine up to the engines'
    1-ULP ln/sqrt differences (callers round outputs to ~6dp for
    hashing, like every other transcendental in the suite). Valid for
    u strictly inside (0,1) — the gaussianize u = (rank−0.5)/n domain."""
    q = f"({u} - 0.5)"
    r_central = f"(0.180625 - {q} * {q})"
    central = (
        f"({q} * {_horner_sql(_A, r_central)} / {_horner_sql(_B, r_central)})"
    )
    rt = f"sqrt(-ln(CASE WHEN {q} < 0.0 THEN {u} ELSE 1.0 - {u} END))"
    near = f"({rt} - 1.6)"
    far = f"({rt} - 5.0)"
    tail_val = (
        f"(CASE WHEN {rt} <= 5.0"
        f" THEN {_horner_sql(_C, near)} / {_horner_sql(_D, near)}"
        f" ELSE {_horner_sql(_E, far)} / {_horner_sql(_F, far)} END)"
    )
    tail = f"(CASE WHEN {q} < 0.0 THEN -{tail_val} ELSE {tail_val} END)"
    return f"(CASE WHEN abs({q}) <= 0.425 THEN {central} ELSE {tail} END)"


def ordinal_uniform(values: np.ndarray) -> np.ndarray:
    """The deterministic pre-probit half of gaussianize: ordinal rank →
    (r − 0.5)/n ∈ (0, 1). Ordinal ranks break ties by array position
    (argsort stable), so the caller controls tie order by row order."""
    values = np.asarray(values)
    order = np.argsort(values, kind="stable")
    ranks = np.empty(len(values), dtype=np.float64)
    ranks[order] = np.arange(1, len(values) + 1)
    return (ranks - 0.5) / len(values)


def gaussianize(values: np.ndarray) -> np.ndarray:
    """Reference _gaussianize: ordinal rank → (r−0.5)/n → Φ⁻¹
    (/root/reference/src/centimators/feature_transformers/base.py:10-14)."""
    return norm_ppf(ordinal_uniform(values))
