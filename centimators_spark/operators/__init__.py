from centimators_spark.operators.ranking import RankTransformer
from centimators_spark.operators.time_series import (
    LagTransformer,
    MovingAverageTransformer,
    LogReturnTransformer,
)
from centimators_spark.operators.stats import GroupStatsTransformer
from centimators_spark.operators.neutralization import FeatureNeutralizer
from centimators_spark.operators.penalization import FeaturePenalizer

__all__ = [
    "FeatureNeutralizer",
    "FeaturePenalizer",
    "RankTransformer",
    "LagTransformer",
    "MovingAverageTransformer",
    "LogReturnTransformer",
    "GroupStatsTransformer",
]
