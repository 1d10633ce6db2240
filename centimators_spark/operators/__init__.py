from centimators_spark.operators.ranking import RankTransformer
from centimators_spark.operators.time_series import (
    DiffTransformer,
    EWMATransformer,
    ExpandingAggTransformer,
    LagTransformer,
    LogReturnTransformer,
    MovingAverageTransformer,
    DrawdownTransformer,
    RollingAggTransformer,
    RollingCorrTransformer,
)
from centimators_spark.operators.stats import GroupStatsTransformer
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
)

__all__ = [
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
]
