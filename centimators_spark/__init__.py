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
from centimators_spark.analytics import (
    attribution,
    funnel,
    gini_by_group,
    k_anonymity,
    l_diversity,
    retention_cohorts,
    scd2_intervals,
    t_closeness,
)
from centimators_spark.graphs import pagerank_int
from centimators_spark.reconcile import table_diff
from centimators_spark.ml.survival import kaplan_meier
from centimators_spark.ml.abtest import ab_test_report, cuped_adjust
from centimators_spark.ml.classification_metrics import (
    auc_score,
    calibration_bins,
    log_loss,
)
from centimators_spark.ml.itemsets import frequent_itemsets, make_baskets
from centimators_spark.operators.bloomjoin import bloom_semi_join
from centimators_spark.dedup.linkage import record_linkage
from centimators_spark.similarity.centroids import group_centroids
from centimators_spark.io import write_z_ordered, z_order_key

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
    # round-5 analytics / ML / join surface
    "attribution",
    "funnel",
    "gini_by_group",
    "retention_cohorts",
    "scd2_intervals",
    "pagerank_int",
    "table_diff",
    "kaplan_meier",
    "ab_test_report",
    "cuped_adjust",
    "auc_score",
    "calibration_bins",
    "log_loss",
    "frequent_itemsets",
    "make_baskets",
    "bloom_semi_join",
    "record_linkage",
    "group_centroids",
    "write_z_ordered",
    "z_order_key",
]
