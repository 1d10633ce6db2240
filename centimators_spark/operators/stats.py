"""GroupStatsTransformer — per-row stats over named feature groups.

Reference (/root/reference/src/centimators/feature_transformers/stats.py:
61-146): for each (feature_group × stat) emit
``{group}_groupstats_{stat}``; validates stat names; warns when a group
has fewer columns than the stat's minimum (mean/range 1, std/cv 2,
skew 3, kurtosis 4).

Spark plan: a single `select` of pure column arithmetic (see
functions/horizontal.py) — row-local, zero shuffles, whole-stage codegen.
"""

from __future__ import annotations

import warnings
from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame

from centimators_spark.base import PanelTransformer
from centimators_spark.functions import horizontal as H

_STAT_FNS = {
    "mean": H.mean_horizontal,
    "std": H.std_horizontal,
    "skew": H.skew_horizontal,
    "kurtosis": H.kurtosis_horizontal,
    "range": H.range_horizontal,
    "coefficient_of_variation": H.coefficient_of_variation_horizontal,
}

_MIN_COLS = {
    "mean": 1,
    "range": 1,
    "std": 2,
    "coefficient_of_variation": 2,
    "skew": 3,
    "kurtosis": 4,
}


class GroupStatsTransformer(PanelTransformer):
    def __init__(
        self,
        feature_group_mapping: Mapping[str, Sequence[str]],
        stats: Sequence[str] | None = None,
        *,
        output_mode: str = "append",
        keep_cols: Sequence[str] | None = None,
    ):
        super().__init__(None, output_mode=output_mode, keep_cols=keep_cols)
        self.feature_group_mapping = {k: list(v) for k, v in feature_group_mapping.items()}
        self.stats = list(stats) if stats else list(_STAT_FNS)
        bad = [s for s in self.stats if s not in _STAT_FNS]
        if bad:
            raise ValueError(f"invalid stats {bad}; valid: {sorted(_STAT_FNS)}")
        for group, cols in self.feature_group_mapping.items():
            for s in self.stats:
                if len(cols) < _MIN_COLS[s]:
                    warnings.warn(
                        f"group '{group}' has {len(cols)} column(s); stat '{s}' "
                        f"needs >= {_MIN_COLS[s]} — result will be NaN/degenerate"
                    )

    def _derived_columns(self, df: DataFrame) -> list[Column]:
        return [
            _STAT_FNS[s](cols).alias(f"{group}_groupstats_{s}")
            for group, cols in self.feature_group_mapping.items()
            for s in self.stats
        ]

    def get_feature_names_out(self) -> list[str]:
        return [
            f"{group}_groupstats_{s}"
            for group in self.feature_group_mapping
            for s in self.stats
        ]
