"""FeatureNeutralizer — per-era linear feature neutralization.

Reference semantics (/root/reference/src/centimators/feature_transformers/
neutralization.py:22-248): per era, per (pred × proportion):
  1. gaussianize predictions (ordinal rank → (r−0.5)/n → Φ⁻¹)
  2. OLS coeffs = lstsq(features, gauss_preds)
  3. neut = gauss_preds − proportion · (features @ coeffs)
  4. standardize: neut / std(neut)  (population std, ddof=0; no centering)
then a GLOBAL min-max of each output column to [0, 1]; constant column
(max−min < 1e-10) → 0.5. Output names
``{pred}_neutralized_{prop}[_{suffix}]`` (:96-101).

Spark plan:
- one ``groupBy(era).applyInPandas`` — eras process in parallel across
  executors (replaces the reference's serial era loop + joblib
  process-parallelism over (pred×prop) tasks, :159-177; we compute ALL
  (pred×prop) outputs in ONE kernel pass per era, sharing the
  gaussianize+lstsq work the reference recomputes per task);
- the global min-max is a deliberate two-phase plan: tiny agg →
  broadcast crossJoin → column arithmetic (SURVEY.md §4 note 2), never
  an unpartitioned window.

Scale: the only shuffle is the era hash-partition; each era must fit one
task (inherent to exact per-era lstsq — at 100 TB choose era granularity
accordingly). Arrow moves the batches; the kernel is vectorized numpy.
"""

from __future__ import annotations

import warnings
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from centimators_spark.functions.normal import gaussianize, ordinal_uniform


# promoted to the shared centimators_spark.scanstats module (round-11
# advice: bootstrap/relational callers imported an underscore-private
# helper across modules); the old private names stay importable here
# so history-pinned callers keep working
from centimators_spark.scanstats import (  # noqa: F401
    estimated_scan_partitions as _estimated_scan_partitions,
    local_input_bytes as _local_input_bytes,
)


# Below this input size, re-executing the residual lineage per consumer
# is cheaper than materializing it (round-7 measurement: the sf0.1
# 11 MB scan pays ~1.7 s for an unneeded localCheckpoint — the r5→r6
# neutralizer_kernel_contract regression — while the 10x 108 MB build
# needs the cut: 24 s → 7.8 s). The gate's shuffle is already deduped
# by ReusedExchange via the deterministic repartition key either way.
_MATERIALIZE_BYTES = 32 * 1024 * 1024


def gaussianize_stage(
    df: DataFrame,
    pred_name: str,
    *,
    era_col: str = "era",
    order_col: str | Sequence[str] | None = None,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """The deterministic pre-Φ⁻¹ half of the neutralizer's gaussianize as
    a standalone operator: per era, ordinal rank → (r−0.5)/n, emitted as
    ``{pred}_gauss_u``. Runs the SAME numpy kernel path the
    FeatureNeutralizer uses (stable argsort after order_col sort), so an
    oracle hash-match here verifies the kernel's ordinal-tie ordering;
    the Φ⁻¹ tail stays covered by unit tests (AS241 vs known values)."""
    oc = [order_col] if isinstance(order_col, str) else list(order_col or [])
    out_name = f"{pred_name}_gauss_u"
    passthrough = list(dict.fromkeys(list(keep_cols) + [era_col]))
    schema = StructType([df.schema[c] for c in passthrough]).add(out_name, "double")

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        if oc:
            pdf = pdf.sort_values(oc, kind="stable")
        out = {c: pdf[c] for c in passthrough}
        out[out_name] = ordinal_uniform(pdf[pred_name].to_numpy(dtype=np.float64))
        return pd.DataFrame(out)

    narrow = df.select(*dict.fromkeys(oc + passthrough + [pred_name]))
    return narrow.groupBy(era_col).applyInPandas(kernel, schema)


def gaussianize_expr(
    df: DataFrame,
    pred_name: str,
    *,
    era_col: str,
    order_col: str | Sequence[str],
    out_name: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """The COMPLETE gaussianize (#16) as pure column expressions: per
    era, ordinal rank (row_number over (pred, order_col) — same stable
    tie order as the numpy kernel) → u = (rank−0.5)/n → AS241 Φ⁻¹
    evaluated as shared SQL text (functions/normal.norm_ppf_sql).

    Scale: one Window shuffle on era; eras of ANY size work (the
    applyInPandas kernel path holds a whole era per task). Output
    rounded to ``round_dp`` because ln/sqrt differ by 1 ULP across
    engines — everything else in the expression is bit-identical."""
    from centimators_spark.functions.normal import norm_ppf_sql

    oc = [order_col] if isinstance(order_col, str) else list(order_col)
    out = out_name or f"{pred_name}_gauss"
    w_rank = Window.partitionBy(era_col).orderBy(pred_name, *oc)
    w_era = Window.partitionBy(era_col)
    u = (
        (F.row_number().over(w_rank).cast("double") - 0.5)
        / F.count(F.lit(1)).over(w_era).cast("double")
    )
    return df.withColumn("__u", u).withColumn(
        out, F.round(F.expr(norm_ppf_sql("__u")), round_dp)
    ).drop("__u")


def global_min_max_scale(
    df: DataFrame, cols: Sequence[str], eps: float = 1e-10
) -> DataFrame:
    """Scale each col to [0,1] over the WHOLE frame (two-phase agg+broadcast);
    constant column → 0.5 (reference base.py:17-23)."""
    # output names may contain dots (e.g. "..._neutralized_0.5") — address
    # via df[...] (literal resolution) and dot-free temp aliases
    safe = {c: c.replace(".", "_") for c in cols}
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(f"`{c}`")).alias(f"__min_{safe[c]}"),
            F.max(F.col(f"`{c}`")).alias(f"__max_{safe[c]}"),
        ]
    bounds = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(bounds))
    for c in cols:
        mn, mx = F.col(f"__min_{safe[c]}"), F.col(f"__max_{safe[c]}")
        out = out.withColumn(
            c,
            F.when(mx - mn < eps, F.lit(0.5)).otherwise((F.col(f"`{c}`") - mn) / (mx - mn)),
        )
    return out.drop(*[f"__{k}_{safe[c]}" for c in cols for k in ("min", "max")])


def _ols_fragments(k: int, proportion: float, dp: int) -> dict:
    """Shared SQL text for every float-critical step of the era-OLS
    neutralizer. Spark evaluates these via F.expr and the DuckDB oracle
    embeds the same strings — identical expression trees over identical
    (exactly-aggregated) inputs make the two engines bit-equal."""
    from centimators_spark.ml import cramer

    gram_sums = []
    for i in range(k):
        for j in range(i, k):
            gram_sums.append(
                f"sum(CAST(f{i} * f{j} AS DECIMAL(38,0))) AS g_{i}_{j}"
            )
        gram_sums.append(f"sum(CAST(f{i} * y AS DECIMAL(38,0))) AS m_{i}")
    G = [
        [f"CAST(g_{min(i, j)}_{max(i, j)} AS DOUBLE)" for j in range(k)]
        for i in range(k)
    ]
    mv = [f"CAST(m_{i} AS DOUBLE)" for i in range(k)]
    coeffs = cramer.solve_sql(G, mv)
    expo = "0.0"
    for i in range(k):
        expo = f"({expo} + f{i} * b{i})"
    # the standardization sums ride in exact integer carriers: the
    # rounded residual × 10^dp is an integer both engines agree on
    # bit-for-bit; Spark holds it (and its square) in DECIMAL(19,0)/(38,0)
    # — exact at these magnitudes — while DuckDB needs HUGEINT (its
    # DECIMAL(18,·) multiply overflows int64 storage). Same integers,
    # different carrier spelling; every double-valued expression below is
    # shared text.
    ni = f"round(neut * 1e{dp})"
    return {
        "gram_sums": gram_sums,
        "coeffs": coeffs,
        "neut": f"round(y - {float(proportion)!r} * {expo}, {dp})",
        "ni_spark": f"CAST({ni} AS DECIMAL(19,0))",
        "ni_duck": f"CAST({ni} AS HUGEINT)",
        "std": (
            f"sqrt(CAST(s2 AS DOUBLE) / 1e{2 * dp} / n"
            f" - (CAST(s1 AS DOUBLE) / 1e{dp} / n)"
            f" * (CAST(s1 AS DOUBLE) / 1e{dp} / n))"
        ),
        "scaled": f"round(neut / sd, {dp})",
        "minmax": (
            f"round(CASE WHEN mx - mn < 1e-10 THEN 0.5"
            f" ELSE (v - mn) / (mx - mn) END, {dp})"
        ),
    }


def era_ols_neutralize(
    df: DataFrame,
    pred_name: str,
    feature_names: Sequence[str],
    *,
    era_col: str,
    proportion: float = 0.5,
    keep_cols: Sequence[str] = (),
    round_dp: int = 6,
    out_name: str = "neutralized",
    materialize: str = "auto",
) -> DataFrame:
    """Distributed per-era OLS neutralization as PURE column expressions
    — the deterministic (no-Φ⁻¹) sibling of FeatureNeutralizer's kernel,
    and the shape that scales: per era, coeffs = (XᵀX)⁻¹Xᵀy from one
    tiny grouped aggregation; neut = y − proportion·Xβ; per-era
    population-std standardization on fixed-decimal residuals; global
    min-max to [0,1] (constant → 0.5, reference base.py:17-23).

    No applyInPandas, no collect: three small aggregations (era Gram,
    era std, global min-max) broadcast back onto the scan — every
    per-row expression runs in whole-stage codegen. Eras of any size
    work (nothing materializes a whole era in one task, unlike the
    exact-kernel path).

    Determinism contract (the reason a bit-exact SQL oracle exists, see
    `era_ols_neutralize_oracle_sql`): callers supply INTEGER-VALUED
    features/pred (fixed-decimal columns pre-scaled by 10^k) so the
    DECIMAL(38,0) Gram sums are exact under any partition order; the
    k×k solve is the fixed-term-order Cramer expression (ml/cramer.py);
    residuals are rounded to ``round_dp`` decimals and standardized via
    exact decimal sums."""
    feats = list(feature_names)
    k = len(feats)
    if k > 5:
        raise ValueError(
            f"era_ols_neutralize supports ≤5 features (k! Cramer terms); "
            f"got {k}. Use FeatureNeutralizer for wider designs."
        )
    fr = _ols_fragments(k, proportion, round_dp)
    keep = list(keep_cols)

    base = df.select(
        *keep,
        era_col,
        *[F.col(f).cast("double").alias(f"f{i}") for i, f in enumerate(feats)],
        F.col(pred_name).cast("double").alias("y"),
    )
    # spread the decimal Gram work across cores — single-row-group local
    # files scan as one task, and decimal sums are order-independent.
    # Only when the input is UNDER-partitioned: a well-partitioned 100 TB
    # scan must not eat a full extra shuffle before a map-side-partial agg.
    # The estimate reads file sizes + spark.sql.files settings — never
    # df.rdd.getNumPartitions(), which forces a DataFrame→RDD conversion
    # (an extra plan materialization) on every call.
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    est = _estimated_scan_partitions(base)
    gated = est is not None and est < parallelism
    if materialize == "auto":
        # the residual lineage feeds multiple consumers (era std,
        # global min-max, output projection). When the repartition gate
        # fires the lineage contains an explicit shuffle, and
        # re-executing it per consumer measured 54s at 10x data
        # (6M rows) vs 15s with one localCheckpoint cut and 7s with
        # persist. localCheckpoint is the auto choice, not persist:
        # persisted plans are matched by CANONICALIZED plan in the
        # CacheManager, so a later rebuild of the same query would
        # silently read the first run's cache (stale-looking bench
        # numbers, blocks never freed), while checkpoint blocks are
        # per-instance and ContextCleaner-freed (same reasoning as
        # q_quantile_bin's outer cut). On a well-partitioned cluster
        # scan (gate off) the lineage is a pruned scan + broadcast
        # join, and re-scanning into map-side-partial aggs beats
        # materializing the residual table — the original "none"
        # rationale, now scoped to where it measured true. Round-7
        # refinement: even when the gate fires, a SMALL input
        # (< _MATERIALIZE_BYTES) re-executes cheaper than it
        # checkpoints — the deterministic key already collapses the
        # consumers onto one reused exchange.
        nbytes = _local_input_bytes(df)
        big = nbytes is None or nbytes >= _MATERIALIZE_BYTES
        materialize = "localCheckpoint" if (gated and big) else "none"
    if gated:
        # hash on a DETERMINISTIC synthetic key (xxhash64 of the whole
        # projected row): round-robin repartition(n) local-sorts every
        # row first (sortBeforeRepartition) — measured 1.8× slower —
        # and monotonically_increasing_id is NONDETERMINISTIC, which
        # blocks ReusedExchange: this operator's lineage feeds FOUR
        # consumers (era Gram, era std, global min-max, output
        # projection), and with a nondeterministic key each consumer
        # re-executed the full scan+shuffle (measured 12.7x at 10x
        # data instead of ~2x). A deterministic key makes the four
        # exchanges identical, so Spark plans ONE shuffle and reuses
        # it. Decimal Gram sums are order-independent, so any spread
        # is equally correct.
        base = base.repartition(parallelism, F.xxhash64(*base.columns))
    gram = base.groupBy(era_col).agg(
        *[
            F.expr(expr).alias(name)
            for expr, name in (s.rsplit(" AS ", 1) for s in fr["gram_sums"])
        ]
    )
    th = gram.select(
        era_col, *[F.expr(c).alias(f"b{i}") for i, c in enumerate(fr["coeffs"])]
    )
    r = (
        base.join(F.broadcast(th), era_col)
        .withColumn("neut", F.expr(fr["neut"]))
        .select(*keep, era_col, "neut")
    )
    # Multiple consumers read the residuals (era std, global min-max,
    # the output projection). "none" recomputes the lineage per
    # consumer — right when the lineage is a pruned scan + broadcast
    # join; "persist" materializes once — right when the lineage holds
    # a shuffle or an expensive upstream stage. The "auto" default
    # picks per the repartition gate above. Every stage is
    # deterministic (exact decimal sums, fixed-order Cramer, rounded
    # residuals), so all consumers see identical values either way.
    if materialize == "localCheckpoint":
        # single-node lineage cut via driver-local blocks
        r = r.localCheckpoint(eager=True)
    elif materialize == "persist":
        # cluster-scale choice: executor-memory/disk blocks, no driver
        # disk. The cached blocks outlive this call (the returned plan
        # still reads them) — callers managing a long session should
        # unpersist via spark.catalog.clearCache() or persist an
        # upstream frame they hold a handle to.
        r = r.persist()
        r.count()
    elif materialize != "none":
        raise ValueError(
            "materialize must be auto|localCheckpoint|persist|none, "
            f"got {materialize!r}"
        )
    stats = r.groupBy(era_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"sum({fr['ni_spark']})").alias("s1"),
        F.expr(f"sum({fr['ni_spark']} * {fr['ni_spark']})").alias("s2"),
    )
    sd = stats.select(era_col, F.expr(fr["std"]).alias("sd"))
    r2 = r.join(F.broadcast(sd), era_col).withColumn("v", F.expr(fr["scaled"]))
    mm = r2.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    return r2.crossJoin(F.broadcast(mm)).select(
        *keep, F.expr(fr["minmax"]).alias(out_name)
    )


def era_ols_neutralize_oracle_sql(
    table_sql: str,
    pred_sql: str,
    feature_sqls: Sequence[str],
    *,
    era_sql: str,
    key_sqls: Sequence[str],
    proportion: float = 0.5,
    round_dp: int = 6,
    out_name: str = "neutralized",
) -> str:
    """DuckDB oracle for `era_ols_neutralize`, generated from the SAME
    expression fragments the Spark plan evaluates (see _ols_fragments)."""
    k = len(feature_sqls)
    fr = _ols_fragments(k, proportion, round_dp)
    keys = ", ".join(key_sqls)
    fcols = ", ".join(f"{s} AS f{i}" for i, s in enumerate(feature_sqls))
    bcols = ", ".join(f"{c} AS b{i}" for i, c in enumerate(fr["coeffs"]))
    return f"""
        WITH base AS (
          SELECT {keys}, {era_sql} AS era, {fcols}, {pred_sql} AS y
          FROM {table_sql}
        ), g AS (
          SELECT era, {", ".join(fr["gram_sums"])} FROM base GROUP BY era
        ), th AS (
          SELECT era, {bcols} FROM g
        ), r AS (
          SELECT base.*, {fr["neut"]} AS neut
          FROM base JOIN th USING (era)
        ), st AS (
          SELECT era, count(*) AS n, sum({fr["ni_duck"]}) AS s1,
                 sum({fr["ni_duck"]} * {fr["ni_duck"]}) AS s2
          FROM r GROUP BY era
        ), sdt AS (
          SELECT era, {fr["std"]} AS sd FROM st
        ), r2 AS (
          SELECT r.*, {fr["scaled"]} AS v FROM r JOIN sdt USING (era)
        ), mm AS (SELECT min(v) AS mn, max(v) AS mx FROM r2)
        SELECT {keys}, {fr["minmax"]} AS {out_name}
        FROM r2 CROSS JOIN mm
    """


class FeatureNeutralizer:
    """Spark port of the reference FeatureNeutralizer (see module doc)."""

    def __init__(
        self,
        proportion: float | Sequence[float] = 0.5,
        pred_name: str | Sequence[str] = "prediction",
        feature_names: Sequence[str] | None = None,
        suffix: str | None = None,
        *,
        era_col: str | None = "era",
        order_col: str | Sequence[str] | None = None,
        keep_cols: Sequence[str] | None = None,
    ):
        self.pred_names = [pred_name] if isinstance(pred_name, str) else list(pred_name)
        self.proportions = (
            [proportion] if isinstance(proportion, (int, float)) else list(proportion)
        )
        if len(set(self.pred_names)) != len(self.pred_names):
            raise ValueError("Duplicate pred_names found.")
        for p in self.proportions:
            if not 0.0 <= p <= 1.0:
                raise ValueError(f"proportion should be in [0, 1]. Got {p}.")
        self.feature_names = list(feature_names) if feature_names else None
        self.suffix = suffix
        self.era_col = era_col
        self.order_col = (
            [order_col] if isinstance(order_col, str) else list(order_col) if order_col else None
        )
        self.keep_cols = list(keep_cols) if keep_cols else []
        self._output_names = [
            f"{pn}_neutralized_{pr}_{suffix}" if suffix else f"{pn}_neutralized_{pr}"
            for pn in self.pred_names
            for pr in self.proportions
        ]

    def get_feature_names_out(self) -> list[str]:
        return list(self._output_names)

    def transform(self, df: DataFrame) -> DataFrame:
        if self.era_col is None:
            # reference fallback (neutralization.py:146-153): no era_series
            # → single era, with the same warning; one task processes all
            # rows (inference-sized frames only)
            import pyspark.sql.functions as F

            warnings.warn(
                "era_col not provided. Treating all data as a single era. "
                "This is fine for live inference (1 era) but may be "
                "incorrect for training data with multiple eras.",
                UserWarning,
            )
            self_era = "__era"
            df = df.withColumn(self_era, F.lit(0))
        else:
            self_era = self.era_col
        feats = self.feature_names or [
            c
            for c in df.columns
            if c
            not in set(self.pred_names + self.keep_cols + [self_era] + (self.order_col or []))
        ]
        preds, props = self.pred_names, self.proportions
        era_col, order_col = self_era, self.order_col
        out_names = self._output_names
        if order_col is None:
            warnings.warn(
                "order_col not set: ordinal tie-breaking in gaussianize will "
                "depend on partition order and is not deterministic."
            )

        needed = list(
            dict.fromkeys(
                (order_col or [])
                + self.keep_cols
                + [era_col]
                + preds
                + feats
            )
        )
        narrow = df.select(*needed)

        passthrough = (order_col or []) + self.keep_cols + [era_col]
        schema = StructType(
            [narrow.schema[c] for c in dict.fromkeys(passthrough)]
        )
        for name in out_names:
            schema = schema.add(name, "double")

        def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            if order_col is not None:
                pdf = pdf.sort_values(list(order_col), kind="stable")
            X = pdf[feats].to_numpy(dtype=np.float64)
            out = {c: pdf[c] for c in dict.fromkeys(passthrough)}
            for pn in preds:
                gauss = gaussianize(pdf[pn].to_numpy(dtype=np.float64))
                coeffs, _, _, _ = np.linalg.lstsq(X, gauss, rcond=None)
                exposure = X @ coeffs
                for pr in props:
                    name = (
                        f"{pn}_neutralized_{pr}_{self.suffix}"
                        if self.suffix
                        else f"{pn}_neutralized_{pr}"
                    )
                    neut = gauss - pr * exposure
                    out[name] = neut / np.std(neut)
            return pd.DataFrame(out)

        raw = narrow.groupBy(era_col).applyInPandas(kernel, schema)
        return global_min_max_scale(raw, out_names)
