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
    """Exact distributed OLS: y ~ X (+ intercept).

    exact=True: engine-independent deterministic fit — Gram products are
    cast to DECIMAL(38,0) before summing (exact when the caller supplies
    integer-valued features, e.g. fixed-decimal columns scaled by 10^k),
    and the k×k solve uses the mirrored Cramer expression from
    ml/cramer.py instead of numpy, so coefficients are bit-identical to
    a SQL oracle evaluating the same expression on the same sums."""

    def __init__(
        self,
        feature_names: Sequence[str],
        target: str = "target",
        fit_intercept: bool = True,
        exact: bool = False,
    ):
        self.feature_names = list(feature_names)
        self.target = target
        self.fit_intercept = fit_intercept
        self.exact = exact
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

        def _sum(prod):
            # decimal accumulation is exact and associative → identical
            # under any partition/merge order (doubles are neither)
            return F.sum(prod.cast("decimal(38,0)") if self.exact else prod)

        # one aggregation computes the full Gram matrix and moment vector
        aggs = []
        for i, a in enumerate(cols):
            for b in cols[i:]:
                aggs.append(_sum(F.col(a) * F.col(b)).alias(f"g_{a}__{b}"))
            aggs.append(_sum(F.col(a) * F.col("__y")).alias(f"m_{a}"))
        row = d.agg(*aggs).collect()[0].asDict()
        k = len(cols)
        G = np.zeros((k, k))
        m = np.zeros(k)
        for i, a in enumerate(cols):
            for j in range(i, k):
                G[i, j] = G[j, i] = float(row[f"g_{a}__{cols[j]}"])
            m[i] = float(row[f"m_{a}"])
        if self.exact:
            from centimators_spark.ml.cramer import solve_floats

            theta = np.array(solve_floats(G.tolist(), m.tolist()))
        else:
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
    chunks on executors (fully parallel).

    Hooks used by the named architectures below: ``input_reshape``
    (2-D→3-D for sequence models), ``predict_output_index`` (pick one
    head of a multi-output model), ``_build`` (unpack builders that
    return auxiliary parts), ``_fit_targets`` (multi-head y)."""

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
        input_reshape=None,
        predict_output_index: int | None = None,
        distribution_strategy: str | None = None,
    ):
        self.build_model = build_model
        self.feature_names = list(feature_names)
        self.target = target
        self.epochs = epochs
        self.batch_size = batch_size
        self.scale_target = scale_target
        self.fit_row_cap = fit_row_cap
        self.output_names = list(output_names)
        self.input_reshape = input_reshape
        self.predict_output_index = predict_output_index
        self.distribution_strategy = distribution_strategy
        self.model = None
        self._y_mean = 0.0
        self._y_std = 1.0

    def _build(self):
        return self.build_model()

    def _setup_distribution_strategy(self) -> None:
        """Reference parity (keras_estimators/base.py:59-61): any truthy
        ``distribution_strategy`` enables keras DataParallel across the
        DRIVER's local devices for the fit step — orthogonal to the
        engine's executor-side scoring parallelism. Import-gated:
        ``keras.distribution`` exists on JAX/TF backends only."""
        keras = _require_keras()
        dist = getattr(keras, "distribution", None)
        if dist is None:  # backend without keras.distribution (torch)
            raise ImportError(
                "distribution_strategy requires keras.distribution "
                "(JAX or TensorFlow backend)"
            )
        dist.set_distribution(dist.DataParallel())

    def _fit_targets(self, X: np.ndarray, y: np.ndarray):
        return y

    def fit(self, df: DataFrame, y=None, **fit_kwargs):
        _require_keras()
        if self.distribution_strategy:
            self._setup_distribution_strategy()
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
        Xt = self.input_reshape(X) if self.input_reshape else X
        self.model = self._build()
        self.model.fit(
            Xt,
            self._fit_targets(Xt, yv),
            epochs=self.epochs,
            batch_size=self.batch_size,
            **fit_kwargs,
        )
        return self

    def _score_with(
        self,
        df: DataFrame,
        model,
        out_names: Sequence[str],
        *,
        scale: bool,
        output_index: int | None = None,
        carry: Sequence[str] = (),
    ) -> DataFrame:
        """Distributed scoring of an arbitrary keras model over the
        feature columns: model spec+weights ship once per task, scoring
        runs in Arrow batches on executors. ``carry`` columns ride
        through unchanged (e.g. the target for scoring metrics)."""
        keras = _require_keras()
        spec = model.to_json()
        weights = model.get_weights()
        feats = self.feature_names
        batch_size = self.batch_size
        mu, sd = self._y_mean, self._y_std
        reshape = self.input_reshape
        out_names = list(out_names)
        cols = list(dict.fromkeys(feats + list(carry)))

        from pyspark.sql.types import DoubleType, StructField, StructType

        schema = StructType(
            list(df.select(*cols).schema)
            + [StructField(n, DoubleType()) for n in out_names]
        )

        def score(batches):
            m = keras.models.model_from_json(spec)
            m.set_weights(weights)
            for pdf in batches:
                X = pdf[feats].to_numpy(dtype=np.float32)
                if reshape is not None:
                    X = reshape(X)
                p = m.predict(X, batch_size=batch_size, verbose=0)
                if isinstance(p, (list, tuple)):
                    p = p[output_index or 0]
                p = np.atleast_2d(p)
                if scale:
                    p = p * sd + mu
                out = pdf[cols].copy()
                for i, n in enumerate(out_names):
                    out[n] = p[:, i]
                yield out

        return df.select(*cols).mapInPandas(score, schema)

    def predict(self, df: DataFrame) -> DataFrame:
        if self.model is None:
            raise ValueError("KerasEstimator not fitted. Call fit() first.")
        return self._score_with(
            df,
            self.model,
            self.output_names,
            scale=self.scale_target,
            output_index=self.predict_output_index,
        )

    def score(self, df: DataFrame) -> float:
        """R² of the first prediction head against ``target`` over df —
        the sklearn ``score`` contract, computed with one distributed
        scoring pass + one aggregation (no driver collection)."""
        if self.model is None:
            raise ValueError("KerasEstimator not fitted. Call fit() first.")
        scored = self._score_with(
            df,
            self.model,
            self.output_names,
            scale=self.scale_target,
            output_index=self.predict_output_index,
            carry=[self.target],
        )
        y, p = F.col(self.target).cast("double"), F.col(self.output_names[0])
        row = scored.agg(
            F.sum((y - p) * (y - p)).alias("ss_res"),
            F.sum(y * y).alias("ss_yy"),
            F.sum(y).alias("s_y"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        ss_tot = float(row.ss_yy) - float(row.s_y) ** 2 / float(row.n)
        return 1.0 - float(row.ss_res) / ss_tot if ss_tot else 0.0


def sequence_reshape(X: np.ndarray, lag_windows: Sequence[int]) -> np.ndarray:
    """(n, seq_len·f) → (n, seq_len, f), lag-major column order
    (reference sequence.py:23-40)."""
    seq_len = len(lag_windows)
    n, total = X.shape
    if total % seq_len:
        raise ValueError(f"{total} columns not divisible by seq_len {seq_len}")
    return X.reshape(n, seq_len, total // seq_len)


def _prediction_names(output_units: int) -> list[str]:
    """Reference output naming (keras_estimators/base.py:136-150)."""
    if output_units == 1:
        return ["prediction"]
    return [f"prediction_{i}" for i in range(output_units)]


class MLPRegressor(KerasEstimator):
    """Dense MLP on tabular features (reference dense.py:14-38) with the
    engine's driver-fit / distributed-predict execution."""

    def __init__(
        self,
        feature_names: Sequence[str],
        target: str = "target",
        *,
        hidden_units: Sequence[int] = (64, 64),
        activation: str = "relu",
        dropout_rate: float = 0.0,
        learning_rate: float = 1e-3,
        loss="mse",
        output_units: int = 1,
        **kwargs,
    ):
        from centimators_spark.ml import architectures as A

        feats = list(feature_names)
        super().__init__(
            build_model=lambda: A.build_mlp(
                len(feats),
                output_units=output_units,
                hidden_units=hidden_units,
                activation=activation,
                dropout_rate=dropout_rate,
                learning_rate=learning_rate,
                loss=loss,
            ),
            feature_names=feats,
            target=target,
            output_names=_prediction_names(output_units),
            **kwargs,
        )


class SequenceEstimator(KerasEstimator):
    """Shared lag-matrix plumbing for sequence models (reference
    sequence.py:17-99): feature columns are the lag-major expansion
    produced by LagTransformer; batches reshape to
    (n, len(lag_windows), n_features_per_timestep) on the way into the
    model — both at driver fit and inside the scoring UDF."""

    def __init__(
        self,
        feature_names: Sequence[str],
        lag_windows: Sequence[int],
        n_features_per_timestep: int,
        target: str = "target",
        *,
        build_model,
        output_units: int = 1,
        **kwargs,
    ):
        feats = list(feature_names)
        lags = list(lag_windows)
        if len(feats) != len(lags) * n_features_per_timestep:
            raise ValueError(
                f"{len(feats)} feature columns != len(lag_windows)="
                f"{len(lags)} x n_features_per_timestep={n_features_per_timestep}"
            )
        self.lag_windows = lags
        self.n_features_per_timestep = n_features_per_timestep
        super().__init__(
            build_model=build_model,
            feature_names=feats,
            target=target,
            output_names=_prediction_names(output_units),
            input_reshape=lambda X: sequence_reshape(X, lags),
            **kwargs,
        )


class LSTMRegressor(SequenceEstimator):
    """Stacked-LSTM sequence regressor (reference sequence.py:103-153)."""

    def __init__(
        self,
        feature_names: Sequence[str],
        lag_windows: Sequence[int],
        n_features_per_timestep: int,
        target: str = "target",
        *,
        lstm_units: Sequence[tuple[int, float, float]] = ((64, 0.01, 0.01),),
        use_batch_norm: bool = False,
        use_layer_norm: bool = False,
        bidirectional: bool = False,
        learning_rate: float = 1e-3,
        loss="mse",
        output_units: int = 1,
        **kwargs,
    ):
        from centimators_spark.ml import architectures as A

        seq_len = len(list(lag_windows))
        super().__init__(
            feature_names,
            lag_windows,
            n_features_per_timestep,
            target,
            build_model=lambda: A.build_lstm(
                seq_len,
                n_features_per_timestep,
                output_units=output_units,
                lstm_units=lstm_units,
                use_batch_norm=use_batch_norm,
                use_layer_norm=use_layer_norm,
                bidirectional=bidirectional,
                learning_rate=learning_rate,
                loss=loss,
            ),
            output_units=output_units,
            **kwargs,
        )


class TransformerRegressor(SequenceEstimator):
    """Transformer-encoder sequence regressor (reference
    transformer.py:108-245); attention_type temporal|feature|cross,
    pooling_type attention|average."""

    def __init__(
        self,
        feature_names: Sequence[str],
        lag_windows: Sequence[int],
        n_features_per_timestep: int,
        target: str = "target",
        *,
        d_model: int = 32,
        num_heads: int = 4,
        ff_dim: int = 128,
        num_blocks: int = 1,
        dropout_rate: float = 0.1,
        attention_type: str = "temporal",
        pooling_type: str = "attention",
        use_pre_norm: bool = True,
        mlp_units: Sequence[int] = (64,),
        learning_rate: float = 1e-3,
        loss="mse",
        output_units: int = 1,
        **kwargs,
    ):
        from centimators_spark.ml import architectures as A

        seq_len = len(list(lag_windows))
        super().__init__(
            feature_names,
            lag_windows,
            n_features_per_timestep,
            target,
            build_model=lambda: A.build_transformer(
                seq_len,
                n_features_per_timestep,
                output_units=output_units,
                d_model=d_model,
                num_heads=num_heads,
                ff_dim=ff_dim,
                num_blocks=num_blocks,
                dropout_rate=dropout_rate,
                attention_type=attention_type,
                pooling_type=pooling_type,
                use_pre_norm=use_pre_norm,
                mlp_units=mlp_units,
                learning_rate=learning_rate,
                loss=loss,
            ),
            output_units=output_units,
            **kwargs,
        )


class BottleneckEncoder(KerasEstimator):
    """Bottleneck autoencoder estimator (reference autoencoder.py:11-161):
    joint reconstruction + target training; ``predict`` returns the
    target head, ``transform`` returns the ``latent_{i}`` encoding —
    both scored distributed via the pandas-UDF path."""

    def __init__(
        self,
        feature_names: Sequence[str],
        target: str = "target",
        *,
        gaussian_noise: float = 0.035,
        encoder_units: Sequence[tuple[int, float]] = ((1024, 0.1),),
        latent_units: tuple[int, float] = (256, 0.1),
        ae_units: Sequence[tuple[int, float]] = ((96, 0.4),),
        activation: str = "swish",
        reconstruction_loss_weight: float = 1.0,
        target_loss_weight: float = 1.0,
        learning_rate: float = 1e-3,
        loss="mse",
        output_units: int = 1,
        **kwargs,
    ):
        # reference BottleneckEncoder has no target scaler default
        kwargs.setdefault("scale_target", False)
        feats = list(feature_names)
        self.latent_units = tuple(latent_units)
        self.encoder = None
        self._builder_kwargs = dict(
            output_units=output_units,
            gaussian_noise=gaussian_noise,
            encoder_units=list(encoder_units),
            latent_units=self.latent_units,
            ae_units=list(ae_units),
            activation=activation,
            reconstruction_loss_weight=reconstruction_loss_weight,
            target_loss_weight=target_loss_weight,
            learning_rate=learning_rate,
            loss=loss,
        )
        super().__init__(
            build_model=None,
            feature_names=feats,
            target=target,
            output_names=_prediction_names(output_units),
            predict_output_index=1,
            **kwargs,
        )

    def _build(self):
        from centimators_spark.ml import architectures as A

        model, encoder = A.build_bottleneck_autoencoder(
            len(self.feature_names), **self._builder_kwargs
        )
        self.encoder = encoder
        return model

    def _fit_targets(self, X: np.ndarray, y: np.ndarray):
        # dual-head training target (reference autoencoder.py:112-117)
        return {"reconstruction": X, "target_prediction": y}

    def transform(self, df: DataFrame) -> DataFrame:
        if self.encoder is None:
            raise ValueError("BottleneckEncoder not fitted. Call fit() first.")
        return self._score_with(
            df, self.encoder, self.get_feature_names_out(), scale=False
        )

    def fit_transform(self, df: DataFrame, **fit_kwargs) -> DataFrame:
        return self.fit(df, **fit_kwargs).transform(df)

    def get_feature_names_out(self) -> list[str]:
        return [f"latent_{i}" for i in range(self.latent_units[0])]


class NeuralDecisionForestRegressor(KerasEstimator):
    """Differentiable decision-forest regressor (reference tree.py:213-384)
    with temperature-annealable stochastic routing; the fitted tree list
    is exposed as ``trees`` for TemperatureAnnealing."""

    def __init__(
        self,
        feature_names: Sequence[str],
        target: str = "target",
        *,
        num_trees: int = 25,
        depth: int = 4,
        used_features_rate: float = 0.5,
        l2_decision: float = 1e-4,
        l2_leaf: float = 1e-3,
        temperature: float = 0.5,
        input_noise_std: float = 0.0,
        tree_noise_std: float = 0.0,
        tree_dropout_rate: float = 0.0,
        trunk_units: Sequence[int] | None = None,
        random_state: int | None = None,
        learning_rate: float = 1e-3,
        loss="mse",
        output_units: int = 1,
        **kwargs,
    ):
        feats = list(feature_names)
        self.trees = []
        self._builder_kwargs = dict(
            output_units=output_units,
            num_trees=num_trees,
            depth=depth,
            used_features_rate=used_features_rate,
            l2_decision=l2_decision,
            l2_leaf=l2_leaf,
            temperature=temperature,
            input_noise_std=input_noise_std,
            tree_noise_std=tree_noise_std,
            tree_dropout_rate=tree_dropout_rate,
            trunk_units=list(trunk_units) if trunk_units else None,
            random_state=random_state,
            learning_rate=learning_rate,
            loss=loss,
        )
        super().__init__(
            build_model=None,
            feature_names=feats,
            target=target,
            output_names=_prediction_names(output_units),
            **kwargs,
        )

    def _build(self):
        from centimators_spark.ml import architectures as A

        model, trees = A.build_neural_decision_forest(
            len(self.feature_names), **self._builder_kwargs
        )
        self.trees = trees
        return model


# reference naming alias (keras_estimators/base.py BaseKerasEstimator)
BaseKerasEstimator = KerasEstimator
