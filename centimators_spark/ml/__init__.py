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
    sequence_reshape,
)
from centimators_spark.ml import architectures
from centimators_spark.ml.architectures import TemperatureAnnealing
from centimators_spark.ml.bootstrap import bootstrap_mean_ci
from centimators_spark.ml.calibration import isotonic_calibration
from centimators_spark.ml.dspymator import DSPyMator
from centimators_spark.ml.keras_cortex import KerasCortex
from centimators_spark.ml.losses import make_keras_losses, spearman_corr
from centimators_spark.ml.conformal import conformal_interval, conformal_quantiles
from centimators_spark.ml.ensemble import rank_ensemble
from centimators_spark.ml.feature_selection import mutual_information
from centimators_spark.ml.metrics import autocorr, era_corr, era_report

__all__ = [
    "bootstrap_mean_ci",
    "isotonic_calibration",
    "architectures",
    "BaseKerasEstimator",
    "BottleneckEncoder",
    "KerasEstimator",
    "LinearRegressor",
    "LSTMRegressor",
    "MLPRegressor",
    "NeuralDecisionForestRegressor",
    "SequenceEstimator",
    "TemperatureAnnealing",
    "TransformerRegressor",
    "autocorr",
    "conformal_interval",
    "conformal_quantiles",
    "era_corr",
    "era_report",
    "mutual_information",
    "rank_ensemble",
    "sequence_reshape",
    "DSPyMator",
    "KerasCortex",
    "make_keras_losses",
    "spearman_corr",
]
