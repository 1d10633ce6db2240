"""Logistic regression by FIXED-STEP Newton/IRLS — distributed,
driver-loop-free, with a bit-exact DuckDB oracle.

The whole fit is ONE declarative plan: each Newton step is a single
grouped aggregation producing the 3×3 Hessian / 3-vector gradient
sums, the solve is Cramer's rule over those sums, and the next step's
per-row probabilities reference the solved coefficients through a
broadcast of the one-row beta frame. With a FIXED step count there is
no driver iteration at all — Catalyst sees one tree, and at 100 TB
each step costs exactly one map-side-partial aggregation over the
fact (the classic "ML on SQL engines" IRLS formulation; cf. MADlib).

Exactness discipline (the suite's established recipe):

- Features enter as SMALL INTEGERS (caller buckets/scales them), the
  label as 0/1_000_000 micro-units, and per-row probabilities are
  quantized to integer micro-units: pu = round(1e6·σ(z)). Every
  Hessian/gradient term is then an exact 64-bit integer product
  (|w·x_i·x_j| ≤ 2.5e11·x², caller keeps |x| ≤ ~3000), summed in
  DECIMAL(38,0) — exact in any engine and any partition order.
- The ONLY transcendental is exp() inside σ; its 1-ULP cross-engine
  wiggle is absorbed by the micro-unit rounding (a flip requires the
  true value to sit within one ULP of an exact .5 micro-unit
  boundary — probability ~1e-10 per row).
- Every floating-point step after the sums — the Cramer determinants,
  the Newton update, σ itself — is emitted ONCE as SQL text
  (ml/cramer.py solve_sql + the σ/z texts below) and evaluated by
  BOTH engines (Spark via F.expr, DuckDB verbatim): identical IEEE
  expressions on identical inputs → bit-identical coefficients.

Starting point beta = 0 gives σ(0) = 500000 micro-units EXACTLY
(exp(0) = 1 is exact), so step 1 needs no transcendental at all.

Reference scope: the reference ships no GLM; this is the §2.3-style
"iterative algorithm as a fixed declarative plan" extension, the
classification sibling of ml/estimators.LinearRegressor (same
decimal-Gram + shared-Cramer discipline, reference-cited there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from centimators_spark.ml.cramer import solve_sql

MICRO = 1_000_000


def _sum_names(k: int) -> tuple[list[tuple[int, int]], list[int]]:
    hs = [(i, j) for i in range(k) for j in range(i, k)]
    return hs, list(range(k))


def _step_sum_exprs(k: int) -> list[tuple[str, str]]:
    """Shared SQL: exact DECIMAL(38,0) sums of integer Hessian/gradient
    terms from columns x0..x{k-1} (small ints), yu (0/1e6), pu (micro
    probability). w_u = pu·(1e6−pu) ≤ 2.5e11 stays in BIGINT; each
    term is BIGINT; the sum carrier is DECIMAL(38,0). Returns
    (name, sql) pairs — Spark aliases via .alias, the oracle via AS."""
    hs, gs = _sum_names(k)
    exprs = []
    for i, j in hs:
        exprs.append((
            f"h{i}{j}",
            f"sum(CAST(pu * ({MICRO} - pu) * x{i} * x{j} "
            f"AS DECIMAL(38,0)))",
        ))
    for i in gs:
        exprs.append(
            (f"g{i}", f"sum(CAST((yu - pu) * x{i} AS DECIMAL(38,0)))")
        )
    return exprs


def _delta_exprs(k: int) -> list[str]:
    """Shared SQL: Newton step Δ = H⁻¹·g in TRUE units. The sums carry
    pu in 1e-6 units (so H_raw = 1e12·H_true, g_raw = 1e6·g_true) →
    Δ_true = 1e6 · (det_i/det) over the raw double sums. Fixed term
    order via ml/cramer.solve_sql."""
    G = [
        [f"CAST(h{min(i, j)}{max(i, j)} AS DOUBLE)" for j in range(k)]
        for i in range(k)
    ]
    m = [f"CAST(g{i} AS DOUBLE)" for i in range(k)]
    return [f"(1000000.0 * {e})" for e in solve_sql(G, m)]


def _z_text(k: int, betas: list[str]) -> str:
    terms = [betas[0]] + [
        f"{betas[i]} * CAST(x{i} AS DOUBLE)" for i in range(1, k)
    ]
    return "(" + " + ".join(terms) + ")"


def _pu_text(z: str) -> str:
    return f"CAST(round(1000000.0 / (1.0 + exp(-{z}))) AS BIGINT)"


def logistic_irls(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    steps: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Fit P(label=1 | 1, features) by ``steps`` Newton steps from
    beta = 0. ``feature_cols`` must be small-integer columns (bucket
    first; |x| ≤ ~3000 keeps every term in 64 bits), ``label_col``
    boolean/0-1. Returns ONE row: (n, n_pos, b0, b1, ..., bk) with
    coefficients rounded to ``digits``. Intercept x0 = 1 is added
    here."""
    k = len(feature_cols) + 1
    if k > 4:
        raise ValueError("logistic_irls supports ≤3 features (k! Cramer)")
    base = df.select(
        F.lit(1).cast("long").alias("x0"),
        *[
            F.col(c).cast("long").alias(f"x{i + 1}")
            for i, c in enumerate(feature_cols)
        ],
        (F.col(label_col).cast("boolean").cast("long") * MICRO).alias("yu"),
    )
    sum_exprs = _step_sum_exprs(k)
    deltas = _delta_exprs(k)

    # step 1: beta = 0 → pu = 500000 exactly, no transcendental
    s = base.withColumn("pu", F.lit(MICRO // 2).cast("long")).agg(
        *[F.expr(e).alias(nm) for nm, e in sum_exprs]
    )
    beta = s.select(
        *[F.expr(d).alias(f"b{i}") for i, d in enumerate(deltas)]
    )
    for _ in range(steps - 1):
        z = _z_text(k, [f"b{i}" for i in range(k)])
        stepped = base.crossJoin(F.broadcast(beta)).withColumn(
            "pu", F.expr(_pu_text(z))
        )
        s = stepped.agg(
            *[F.expr(e).alias(nm) for nm, e in sum_exprs],
            *[F.max(f"b{i}").alias(f"pb{i}") for i in range(k)],
        )
        beta = s.select(
            *[
                F.expr(f"pb{i} + {d}").alias(f"b{i}")
                for i, d in enumerate(deltas)
            ]
        )
    counts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("yu") / MICRO).cast("long")).cast("long").alias("n_pos"),
    )
    return counts.crossJoin(F.broadcast(beta)).select(
        "n",
        "n_pos",
        *[F.round(F.col(f"b{i}"), digits).alias(f"b{i}") for i in range(k)],
    )


def logistic_irls_oracle_sql(
    table_sql: str,
    feature_sqls: list[str],
    label_sql: str,
    *,
    steps: int = 2,
    digits: int = 6,
) -> str:
    """DuckDB mirror of :func:`logistic_irls`: the same shared sum /
    Cramer / σ texts, steps unrolled as chained CTEs (the kmeans-oracle
    discipline)."""
    k = len(feature_sqls) + 1
    feats = ", ".join(
        f"CAST({e} AS BIGINT) AS x{i + 1}" for i, e in enumerate(feature_sqls)
    )
    sum_exprs = ", ".join(f"{e} AS {nm}" for nm, e in _step_sum_exprs(k))
    deltas = _delta_exprs(k)
    beta1 = ", ".join(
        f"{d} AS b{i}" for i, d in enumerate(deltas)
    )
    ctes = [
        f"base AS (SELECT CAST(1 AS BIGINT) AS x0, {feats}, "
        f"CAST(CASE WHEN {label_sql} THEN {MICRO} ELSE 0 END AS BIGINT) "
        f"AS yu FROM {table_sql})",
        f"s1 AS (SELECT {sum_exprs} FROM (SELECT *, "
        f"CAST({MICRO // 2} AS BIGINT) AS pu FROM base))",
        f"beta1 AS (SELECT {beta1} FROM s1)",
    ]
    prev = "beta1"
    for step in range(2, steps + 1):
        z = _z_text(k, [f"b{i}" for i in range(k)])
        ctes.append(
            f"r{step} AS (SELECT base.*, {prev}.*, {_pu_text(z)} AS pu "
            f"FROM base CROSS JOIN {prev})"
        )
        carried = ", ".join(f"max(b{i}) AS pb{i}" for i in range(k))
        ctes.append(f"s{step} AS (SELECT {sum_exprs}, {carried} FROM r{step})")
        ctes.append(
            f"beta{step} AS (SELECT "
            + ", ".join(
                f"pb{i} + {d} AS b{i}" for i, d in enumerate(deltas)
            )
            + f" FROM s{step})"
        )
        prev = f"beta{step}"
    rounded = ", ".join(f"round(b{i}, {digits}) AS b{i}" for i in range(k))
    return (
        "WITH "
        + ", ".join(ctes)
        + f""",
        counts AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(yu / {MICRO}) AS BIGINT) AS n_pos
          FROM base
        )
        SELECT n, n_pos, {rounded} FROM counts CROSS JOIN {prev}
    """
    )
