"""centimators_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of crowdcent/centimators.

Design: declarative DataFrame/Column plans (Catalyst optimizes), Window
functions for panel/time-series ops, `applyInPandas` only for per-era
numeric kernels that genuinely need numpy (lstsq, Adamax, norm.ppf).

Reference surface (see SURVEY.md §2): RankTransformer, LagTransformer,
MovingAverageTransformer, LogReturnTransformer, GroupStatsTransformer,
FeatureNeutralizer, FeaturePenalizer, DimReducer, EmbeddingTransformer,
plus model estimators. Extensions: dedup, similarity search, text
analysis, multimodal columns, streaming.
"""

from centimators_spark.session import get_spark
from centimators_spark.io import load_tables, register_views
from centimators_spark.base import melt_panel
from centimators_spark.profile import heavy_hitters, table_profile
from centimators_spark import validate
from centimators_spark.operators.ranking import RankTransformer
from centimators_spark.operators.time_series import (
    LagTransformer,
    MovingAverageTransformer,
    LogReturnTransformer,
)
from centimators_spark.operators.stats import GroupStatsTransformer
from centimators_spark.operators.neutralization import FeatureNeutralizer
from centimators_spark.operators.penalization import FeaturePenalizer
from centimators_spark.operators.dimreduction import DimReducer
from centimators_spark.operators.embedding import EmbeddingTransformer
from centimators_spark.ml.estimators import (
    BaseKerasEstimator,
    BottleneckEncoder,
    KerasEstimator,
    LinearRegressor,
    LSTMRegressor,
    MLPRegressor,
    NeuralDecisionForestRegressor,
    SequenceEstimator,
    TransformerRegressor,
)
from centimators_spark.ml.architectures import TemperatureAnnealing
from centimators_spark.ml.dspymator import DSPyMator
from centimators_spark.ml.keras_cortex import KerasCortex
from centimators_spark.ml.losses import spearman_corr
from centimators_spark.config import get_keras_backend, set_keras_backend

__version__ = "0.3.0"  # tracks pyproject.toml

__all__ = [
    "get_spark",
    "load_tables",
    "register_views",
    # reference feature transformers
    "RankTransformer",
    "LagTransformer",
    "MovingAverageTransformer",
    "LogReturnTransformer",
    "GroupStatsTransformer",
    "FeatureNeutralizer",
    "FeaturePenalizer",
    "DimReducer",
    "EmbeddingTransformer",
    # reference model estimators (keras-gated at use, importable always)
    "BaseKerasEstimator",
    "SequenceEstimator",
    "MLPRegressor",
    "LSTMRegressor",
    "TransformerRegressor",
    "BottleneckEncoder",
    "NeuralDecisionForestRegressor",
    "TemperatureAnnealing",
    "DSPyMator",
    "KerasCortex",
    # config helpers
    "set_keras_backend",
    "get_keras_backend",
    # engine extensions
    "LinearRegressor",
    "KerasEstimator",
    "spearman_corr",
]
