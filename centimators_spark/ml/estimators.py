"""Model estimators with the reference's fit/predict surface.

- ``LinearRegressor``: fully distributed exact OLS via normal equations —
  X'X and X'y are computed as ONE Spark aggregation of column products
  (map-side partial aggregation, no UDF, no collect of data), the tiny
  k×k solve happens on the driver, and scoring is a pure column
  expression. This is the 100 TB-shaped replacement for driver-side
  sklearn fitting.
- ``KerasEstimator`` (+ MLP/sequence conveniences): mirrors the
  reference's BaseKerasEstimator (/root/reference/src/centimators/
  model_estimators/keras_estimators/base.py:63-153): driver-side
  ``model.fit`` on (optionally sampled) collected data — a documented
  scale cliff — with DISTRIBUTED inference via an Arrow-batched pandas
  UDF scoring with broadcast weights (predict batch_size=512 default).
  Import-gated: keras is not installed in this container.
- Target scaling (standardize y at fit, inverse at predict) matches
  reference regressors' default (:89-100,129-130) and is computed with
  a Spark aggregation, not sklearn.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class LinearRegressor:
    """Exact distributed OLS: y ~ X (+ intercept)."""

    def __init__(
        self,
        feature_names: Sequence[str],
        target: str = "target",
        fit_intercept: bool = True,
    ):
        self.feature_names = list(feature_names)
        self.target = target
        self.fit_intercept = fit_intercept
        self.coef_: np.ndarray | None = None
        self.intercept_: float = 0.0

    def fit(self, df: DataFrame, y=None):
        feats = self.feature_names
        cols = feats + ([] if not self.fit_intercept else ["__one"])
        d = df.select(
            *[F.col(c).cast("double") for c in feats],
            F.col(self.target).cast("double").alias("__y"),
        )
        if self.fit_intercept:
            d = d.withColumn("__one", F.lit(1.0))
        # one aggregation computes the full Gram matrix and moment vector
        aggs = []
        for i, a in enumerate(cols):
            for b in cols[i:]:
                aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"g_{a}__{b}"))
            aggs.append(F.sum(F.col(a) * F.col("__y")).alias(f"m_{a}"))
        row = d.agg(*aggs).collect()[0].asDict()
        k = len(cols)
        G = np.zeros((k, k))
        m = np.zeros(k)
        for i, a in enumerate(cols):
            for j in range(i, k):
                G[i, j] = G[j, i] = row[f"g_{a}__{cols[j]}"]
            m[i] = row[f"m_{a}"]
        theta = np.linalg.solve(G, m)
        if self.fit_intercept:
            self.coef_, self.intercept_ = theta[:-1], float(theta[-1])
        else:
            self.coef_, self.intercept_ = theta, 0.0
        return self

    def _pred_col(self) -> Column:
        if self.coef_ is None:
            raise ValueError("LinearRegressor not fitted. Call fit() first.")
        expr = F.lit(self.intercept_)
        for c, w in zip(self.feature_names, self.coef_):
            expr = expr + F.col(c).cast("double") * F.lit(float(w))
        return expr.alias("prediction")

    def predict(self, df: DataFrame) -> DataFrame:
        """Append a ``prediction`` column (pure expression — codegen)."""
        return df.select("*", self._pred_col())

    def fit_predict(self, df: DataFrame) -> DataFrame:
        return self.fit(df).predict(df)


def _require_keras():
    try:
        import keras  # type: ignore

        return keras
    except ImportError as e:  # pragma: no cover - keras not in container
        raise ImportError(
            "Keras estimators require the 'keras' package (not installed in "
            "this environment). Architecture builders mirror the reference: "
            "MLPRegressor (dense.py:23-38), LSTMRegressor (sequence.py:114-153), "
            "TransformerRegressor (transformer.py:108-245), "
            "BottleneckEncoder (autoencoder.py:25-86), "
            "NeuralDecisionForest (tree.py:53-384)."
        ) from e


class KerasEstimator:
    """Driver-fit / distributed-predict Keras regressor (import-gated).

    fit: collects (up to ``fit_row_cap``) rows to the driver and calls
    ``model.fit`` — the reference's semantics and its scale limit.
    predict: broadcast weights → pandas UDF scoring in ``batch_size``
    chunks on executors (fully parallel)."""

    def __init__(
        self,
        build_model,
        feature_names: Sequence[str],
        target: str = "target",
        *,
        epochs: int = 10,
        batch_size: int = 512,
        scale_target: bool = True,
        fit_row_cap: int = 1_000_000,
        output_names: Sequence[str] = ("prediction",),
    ):
        self.build_model = build_model
        self.feature_names = list(feature_names)
        self.target = target
        self.epochs = epochs
        self.batch_size = batch_size
        self.scale_target = scale_target
        self.fit_row_cap = fit_row_cap
        self.output_names = list(output_names)
        self.model = None
        self._y_mean = 0.0
        self._y_std = 1.0

    def fit(self, df: DataFrame, y=None, **fit_kwargs):
        _require_keras()
        if self.scale_target:
            stats = df.agg(
                F.avg(self.target).alias("mu"),
                F.stddev_pop(self.target).alias("sd"),
            ).collect()[0]
            self._y_mean = float(stats.mu)
            self._y_std = float(stats.sd) or 1.0
        pdf = (
            df.select(*self.feature_names, self.target)
            .limit(self.fit_row_cap)
            .toPandas()
        )
        X = pdf[self.feature_names].to_numpy(dtype=np.float32)
        yv = pdf[self.target].to_numpy(dtype=np.float32)
        if self.scale_target:
            yv = (yv - self._y_mean) / self._y_std
        self.model = self.build_model()
        self.model.fit(
            X, yv, epochs=self.epochs, batch_size=self.batch_size, **fit_kwargs
        )
        return self

    def predict(self, df: DataFrame) -> DataFrame:
        keras = _require_keras()
        if self.model is None:
            raise ValueError("KerasEstimator not fitted. Call fit() first.")
        spec = self.model.to_json()
        weights = self.model.get_weights()
        feats = self.feature_names
        batch_size = self.batch_size
        mu, sd, scale = self._y_mean, self._y_std, self.scale_target
        out_names = self.output_names

        import pandas as pd
        from pyspark.sql.types import DoubleType, StructField, StructType

        schema = StructType(
            list(df.select(*feats).schema)
            + [StructField(n, DoubleType()) for n in out_names]
        )

        def score(batches):
            model = keras.models.model_from_json(spec)
            model.set_weights(weights)
            for pdf in batches:
                X = pdf[feats].to_numpy(dtype=np.float32)
                p = model.predict(X, batch_size=batch_size, verbose=0)
                p = np.atleast_2d(p)
                if scale:
                    p = p * sd + mu
                out = pdf[feats].copy()
                for i, n in enumerate(out_names):
                    out[n] = p[:, i]
                yield out

        return df.select(*feats).mapInPandas(score, schema)


def sequence_reshape(X: np.ndarray, lag_windows: Sequence[int]) -> np.ndarray:
    """(n, seq_len·f) → (n, seq_len, f), lag-major column order
    (reference sequence.py:23-40)."""
    seq_len = len(lag_windows)
    n, total = X.shape
    if total % seq_len:
        raise ValueError(f"{total} columns not divisible by seq_len {seq_len}")
    return X.reshape(n, seq_len, total // seq_len)
