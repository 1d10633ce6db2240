"""Cross-sectional (per-group) normalized ranking.

Reference semantics (/root/reference/src/centimators/feature_transformers/
ranking.py:37-92): for each feature f, within each group (date):

    rank_f   = rank of f with ties = AVERAGE method (polars default)
    count_f  = number of non-null f in the group
    output   = rank_f / count_f        (named "{f}_rank")

Nulls receive a null rank and do not consume ranks.

Spark plan: average rank is composed from built-ins —
    min_rank  = F.rank().over(W(group, orderBy f NULLS LAST))
    tie_count = F.count(f).over(W(group, f))
    avg_rank  = min_rank + (tie_count - 1) / 2
All features share the same partition key, so Catalyst collapses the
window functions into a handful of WindowExec nodes over ONE shuffle by
group — no UDFs, full whole-stage codegen. Scale: one shuffle on the
group column; skewed groups are split by AQE skew handling; no
driver-side work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from centimators_spark.base import PanelTransformer


def avg_rank(feature: str | Column, group_cols: Sequence[str]) -> Column:
    """Average-method rank of `feature` within `group_cols` (ties share
    the mean of the positions they occupy); null feature → null rank.

    Formulated as (min_rank + cum_peer_count) / 2, where cum_peer_count
    (the default RANGE frame of an ordered window) counts all rows with
    value ≤ current INCLUDING peers — i.e. the max rank of the tie
    group. Both windows share ONE (partition, order) spec, so Catalyst
    plans a single exchange + single sort (the tie-count formulation
    needs a second hash partitioning on (group, value)). Arithmetic is
    exact integer halves → bit-identical to rank + (ties−1)/2."""
    f = F.col(feature) if isinstance(feature, str) else feature
    order_win = Window.partitionBy(*group_cols).orderBy(f.asc_nulls_last())
    min_rank = F.rank().over(order_win)
    max_rank = F.count(F.lit(1)).over(
        order_win.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.when(f.isNotNull(), (min_rank + max_rank) / F.lit(2.0))


class RankTransformer(PanelTransformer):
    """Normalized per-group average rank: ``{f}_rank = avg_rank(f)/count(f)``."""

    def __init__(
        self,
        feature_names: Sequence[str] | None = None,
        *,
        group_col: str | Sequence[str] | None = "date",
        output_mode: str = "append",
        keep_cols: Sequence[str] | None = None,
    ):
        super().__init__(feature_names, output_mode=output_mode, keep_cols=keep_cols)
        if group_col is None:
            # reference fallback: no date_series → one global group
            # (base.py:26-38). A global rank is a total order — it cannot
            # be partitioned. Warn like the reference does scale-wise.
            import warnings

            warnings.warn(
                "group_col=None ranks over the ENTIRE dataset in a single "
                "partition — fine for inference-sized frames, not for bulk "
                "tables; provide a group column to parallelize."
            )
            self.group_cols: list[str] = []
        else:
            self.group_cols = [group_col] if isinstance(group_col, str) else list(group_col)

    def _metadata_cols(self) -> list[str]:
        return list(self.group_cols)

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        feats = self._resolve_features(df)
        self.feature_names_ = feats
        count_win = Window.partitionBy(*self.group_cols)
        cols = []
        for f in feats:
            r = avg_rank(f, self.group_cols)
            cnt = F.count(F.col(f)).over(count_win)
            cols.append((r / cnt).alias(f"{f}_rank"))
        return cols

    def get_feature_names_out(self) -> list[str]:
        feats = self.feature_names or getattr(self, "feature_names_", None)
        if feats is None:
            raise ValueError("feature_names unknown before transform")
        return [f"{f}_rank" for f in feats]
