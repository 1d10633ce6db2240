"""Configuration helpers mirroring the reference's config surface
(/root/reference/src/centimators/config.py:7-38): the Keras backend is
chosen via the KERAS_BACKEND env var BEFORE keras is imported anywhere
— on Spark that means before the first executor-side model scoring UDF
runs, so set it at session start (executors inherit the driver env via
spark.executorEnv / cluster config)."""

from __future__ import annotations

import os
import warnings

_VALID_BACKENDS = {"jax", "tensorflow", "torch"}


def set_keras_backend(backend: str = "jax") -> None:
    """Select the Keras backend ('jax' | 'tensorflow' | 'torch'). Must
    run before any keras-importing module (ml.estimators scoring,
    ml.architectures builders)."""
    if backend not in _VALID_BACKENDS:
        raise ValueError(
            f"Invalid backend: {backend}. Choose from {_VALID_BACKENDS}"
        )
    if "KERAS_BACKEND" in os.environ and os.environ["KERAS_BACKEND"] != backend:
        warnings.warn(
            f"KERAS_BACKEND is already set to '{os.environ['KERAS_BACKEND']}'. "
            f"Overriding to '{backend}'. This may cause issues if Keras has "
            "already been imported.",
            RuntimeWarning,
        )
    os.environ["KERAS_BACKEND"] = backend


def get_keras_backend() -> str:
    """Current Keras backend name (defaults to 'jax', like the
    reference's package default)."""
    return os.environ.get("KERAS_BACKEND", "jax")
