from centimators_spark.operators.mwu import (
    brown_forsythe,
    mann_whitney_u,
)
from centimators_spark.operators.ranking import RankTransformer
from centimators_spark.operators.time_series import (
    DiffTransformer,
    EWMATransformer,
    ExpandingAggTransformer,
    ForwardReturnTransformer,
    LagTransformer,
    LogReturnTransformer,
    MovingAverageTransformer,
    DrawdownTransformer,
    RollingAggTransformer,
    RollingCorrTransformer,
    RollingRankTransformer,
)
from centimators_spark.operators.stats import (
    GroupStatsTransformer,
    clip_by_quantile,
    quantile_normalize,
    robust_zscore,
    trimmed_stats,
)
from centimators_spark.operators.anomaly import ewma_anomaly_flags, page_hinkley
from centimators_spark.operators.drift import psi_drift, psi_drift_categorical
from centimators_spark.operators.neutralization import FeatureNeutralizer
from centimators_spark.operators.penalization import FeaturePenalizer
from centimators_spark.operators.dimreduction import DimReducer
from centimators_spark.operators.embedding import EmbeddingTransformer
from centimators_spark.operators.asof import (
    asof_join,
    asof_join_forward,
    asof_join_nearest,
)
from centimators_spark.operators.rangejoin import band_label, interval_join
from centimators_spark.operators.skew import salted_join
from centimators_spark.operators.encoding import (
    feature_hash,
    one_hot_encode,
    quantile_bin,
    target_encode,
    woe_encode,
)

__all__ = [
    "mann_whitney_u",
    "brown_forsythe",
    "interval_join",
    "band_label",
    "salted_join",
    "one_hot_encode",
    "target_encode",
    "quantile_bin",
    "feature_hash",
    "FeatureNeutralizer",
    "FeaturePenalizer",
    "DimReducer",
    "EmbeddingTransformer",
    "asof_join",
    "asof_join_forward",
    "asof_join_nearest",
    "RankTransformer",
    "LagTransformer",
    "MovingAverageTransformer",
    "LogReturnTransformer",
    "GroupStatsTransformer",
    "DiffTransformer",
    "ExpandingAggTransformer",
    "RollingAggTransformer",
    "DrawdownTransformer",
    "RollingCorrTransformer",
    "EWMATransformer",
    "ForwardReturnTransformer",
    "RollingRankTransformer",
    "woe_encode",
    "robust_zscore",
    "clip_by_quantile",
    "trimmed_stats",
    "quantile_normalize",
    "psi_drift",
    "psi_drift_categorical",
    "page_hinkley",
    "ewma_anomaly_flags",
]
