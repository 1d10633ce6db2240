from centimators_spark.ml.estimators import (
    KerasEstimator,
    LinearRegressor,
    sequence_reshape,
)
from centimators_spark.ml.dspymator import DSPyMator
from centimators_spark.ml.keras_cortex import KerasCortex
from centimators_spark.ml.losses import make_keras_losses, spearman_corr

__all__ = [
    "KerasEstimator",
    "LinearRegressor",
    "sequence_reshape",
    "DSPyMator",
    "KerasCortex",
    "make_keras_losses",
    "spearman_corr",
]
