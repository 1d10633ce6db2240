"""Prediction ensembling over era panels — the post-model step of the
reference's competition workflow: combine several model prediction
columns into one by per-era (normalized, optionally weighted) average
rank. Rank-averaging is the standard Numerai-style ensemble because it
is scale-free: models with different output ranges contribute equally,
and the per-era normalization removes era-level drift exactly like the
reference's cross-sectional RankTransformer (ranking.py:52-79), whose
average-tie rank expression this reuses.

Plan: one fused Window per prediction column sharing the era partition
key — Catalyst collapses the identically-partitioned specs so the
table shuffles ONCE on era — then pure arithmetic. Weights are
literals; output in (0, 1].

Reference scope: the reference ships the per-model pipeline
(README.md:114-162) but no ensembling surface; this extends SURVEY.md
§2.3's training/eval inventory alongside ml/metrics.era_report.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.operators.ranking import avg_rank


def rank_ensemble(
    df: DataFrame,
    pred_cols: Sequence[str],
    *,
    era_col: str,
    weights: Sequence[float] | None = None,
    out_name: str = "ensemble",
    keep_ranks: bool = False,
) -> DataFrame:
    """Append ``out_name`` = weighted mean of per-era normalized
    average ranks of ``pred_cols``. Rows where EVERY prediction is null
    get a null ensemble; null predictions are skipped (their weight is
    redistributed over the non-null ones, matching pandas
    ``mean(skipna=True)`` semantics)."""
    preds = list(pred_cols)
    if not preds:
        raise ValueError("pred_cols must be non-empty")
    if weights is None:
        w = [1.0] * len(preds)
    else:
        w = [float(x) for x in weights]
        if len(w) != len(preds):
            raise ValueError("weights length must match pred_cols")
        if sum(w) <= 0:
            raise ValueError("weights must sum to a positive value")
    count_win = Window.partitionBy(era_col)
    ranked = df
    for p in preds:
        norm = avg_rank(p, [era_col]) / F.count(F.col(p)).over(count_win)
        ranked = ranked.withColumn(f"__r_{p}", norm)
    num = None
    den = None
    for p, wi in zip(preds, w):
        r = F.col(f"__r_{p}")
        term = F.when(r.isNotNull(), r * F.lit(wi)).otherwise(F.lit(0.0))
        wgt = F.when(r.isNotNull(), F.lit(wi)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wgt if den is None else den + wgt
    out = ranked.withColumn(out_name, F.when(den > 0, num / den))
    if not keep_ranks:
        out = out.drop(*[f"__r_{p}" for p in preds])
    return out


def rank_ensemble_oracle_sql(
    table: str,
    pred_sqls: Sequence[str],
    *,
    era_sql: str,
    select_sql: str,
    weights: Sequence[float] | None = None,
    out_name: str = "ensemble",
) -> str:
    """DuckDB mirror of :func:`rank_ensemble` — the identical
    (min_rank + cum_peer_count)/2 average-rank formulation and
    weighted skip-null mean."""
    preds = list(pred_sqls)
    w = [1.0] * len(preds) if weights is None else [float(x) for x in weights]
    rank_cols = []
    for i, p in enumerate(preds):
        rank_cols.append(
            f"CASE WHEN {p} IS NOT NULL THEN "
            f"((rank() OVER (PARTITION BY {era_sql} ORDER BY {p} ASC NULLS LAST)"
            f" + count(*) OVER (PARTITION BY {era_sql} ORDER BY {p} ASC NULLS LAST"
            f" RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) / 2.0)"
            f" / count({p}) OVER (PARTITION BY {era_sql}) END AS r{i}"
        )
    num = " + ".join(
        f"CASE WHEN r{i} IS NOT NULL THEN r{i} * {wi!r} ELSE 0.0 END"
        for i, wi in enumerate(w)
    )
    den = " + ".join(
        f"CASE WHEN r{i} IS NOT NULL THEN {wi!r} ELSE 0.0 END"
        for i, wi in enumerate(w)
    )
    return f"""
        WITH ranked AS (
          SELECT {select_sql}, {", ".join(rank_cols)} FROM {table}
        )
        SELECT {select_sql},
               CASE WHEN ({den}) > 0 THEN ({num}) / ({den}) END AS {out_name}
        FROM ranked
    """
