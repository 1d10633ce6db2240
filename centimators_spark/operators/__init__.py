from centimators_spark.operators.ranking import RankTransformer
from centimators_spark.operators.time_series import (
    LagTransformer,
    MovingAverageTransformer,
    LogReturnTransformer,
)
from centimators_spark.operators.stats import GroupStatsTransformer

__all__ = [
    "RankTransformer",
    "LagTransformer",
    "MovingAverageTransformer",
    "LogReturnTransformer",
    "GroupStatsTransformer",
]
