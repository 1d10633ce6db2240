"""Keras model architectures matching the reference's five estimators.

Spec (parity targets, cited per builder):
  /root/reference/src/centimators/model_estimators/keras_estimators/
    dense.py:14-38        MLP
    sequence.py:103-153   stacked LSTM
    transformer.py:15-245 PositionEmbedding / CrossAttention /
                          AttentionPooling / encoder blocks
    autoencoder.py:11-110 bottleneck autoencoder with dual loss
    tree.py:21-384        neural decision tree/forest + temperature
                          annealing

Design: plain FUNCTIONS taking explicit dimensions and returning
compiled ``keras.Model`` objects (plus auxiliary parts where the
reference exposes them — the AE's encoder, the forest's tree list).
Architecture definition is driver-side model work, not a Spark operator
(SURVEY.md §2.1 #27); the Spark surface wraps these via
``estimators.KerasEstimator`` (driver fit, distributed Arrow-batched
pandas-UDF scoring). keras is imported lazily so this module imports —
and is structure-testable through tests/keras_stub.py — in containers
without keras installed.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Sequence

import numpy as np


def _keras():
    try:
        import keras  # type: ignore

        return keras
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "keras is required for model building (not installed in this "
            "environment); the architecture builders in "
            "centimators_spark.ml.architectures are complete and gated on it"
        ) from e


def _compiled(keras, inputs, outputs, name, *, optimizer, learning_rate, loss,
              metrics, **compile_kwargs):
    model = keras.models.Model(inputs=inputs, outputs=outputs, name=name)
    opt_cls = optimizer or keras.optimizers.Adam
    model.compile(
        optimizer=opt_cls(learning_rate=learning_rate),
        loss=loss,
        metrics=list(metrics) if metrics is not None else None,
        **compile_kwargs,
    )
    return model


def build_mlp(
    n_features: int,
    *,
    output_units: int = 1,
    hidden_units: Sequence[int] = (64, 64),
    activation: str = "relu",
    dropout_rate: float = 0.0,
    optimizer=None,
    learning_rate: float = 1e-3,
    loss="mse",
    metrics: Sequence[str] = ("mse",),
):
    """Fully-connected MLP regressor (reference dense.py:23-38):
    Dense(+optional Dropout) per hidden layer, linear output head."""
    keras = _keras()
    L = keras.layers
    inputs = L.Input(shape=(n_features,), name="features")
    x = inputs
    for units in hidden_units:
        x = L.Dense(units, activation=activation)(x)
        if dropout_rate > 0:
            x = L.Dropout(dropout_rate)(x)
    outputs = L.Dense(output_units, activation="linear")(x)
    return _compiled(
        keras, inputs, outputs, "mlp_regressor",
        optimizer=optimizer, learning_rate=learning_rate, loss=loss,
        metrics=metrics,
    )


def build_lstm(
    seq_length: int,
    n_features_per_timestep: int,
    *,
    output_units: int = 1,
    lstm_units: Sequence[tuple[int, float, float]] = ((64, 0.01, 0.01),),
    use_batch_norm: bool = False,
    use_layer_norm: bool = False,
    bidirectional: bool = False,
    optimizer=None,
    learning_rate: float = 1e-3,
    loss="mse",
    metrics: Sequence[str] = ("mse",),
):
    """Stacked LSTM regressor (reference sequence.py:114-153): each
    entry of ``lstm_units`` is (units, dropout, recurrent_dropout); all
    but the last layer return sequences; optional Bidirectional wrap and
    layer/batch norm after each recurrent layer."""
    keras = _keras()
    L = keras.layers
    inputs = L.Input(
        shape=(seq_length, n_features_per_timestep), name="sequence_input"
    )
    x = inputs
    stack = list(lstm_units)
    for i, (units, dropout, recurrent_dropout) in enumerate(stack):
        cell = L.LSTM(
            units=units,
            activation="tanh",
            return_sequences=i < len(stack) - 1,
            dropout=dropout,
            recurrent_dropout=recurrent_dropout,
            name=f"lstm_{i}",
        )
        x = (
            L.Bidirectional(cell, name=f"bidirectional_{i}")(x)
            if bidirectional
            else cell(x)
        )
        if use_layer_norm:
            x = L.LayerNormalization(name=f"layer_norm_{i}")(x)
        if use_batch_norm:
            x = L.BatchNormalization(name=f"batch_norm_{i}")(x)
    outputs = L.Dense(output_units, activation="linear", name="output")(x)
    return _compiled(
        keras, inputs, outputs, "lstm_regressor",
        optimizer=optimizer, learning_rate=learning_rate, loss=loss,
        metrics=metrics,
    )


def custom_layers() -> SimpleNamespace:
    """Define the custom keras layers/callbacks used by the transformer
    and forest builders. Defined inside a factory because subclassing
    ``keras.layers.Layer`` requires keras at class-creation time.

    Members: PositionEmbedding, CrossAttention, AttentionPooling
    (reference transformer.py:14-106), NeuralDecisionTree
    (tree.py:54-210), TemperatureAnnealing (tree.py:21-51).
    """
    keras = _keras()
    L, ops, init = keras.layers, keras.ops, keras.initializers
    serializable = getattr(
        getattr(keras, "saving", None), "register_keras_serializable", None
    ) or (lambda **kw: (lambda cls: cls))

    @serializable(package="centimators_spark")
    class PositionEmbedding(L.Layer):
        """Learned per-position embedding, broadcast over the batch
        (reference transformer.py:14-47)."""

        def __init__(self, sequence_length, initializer="glorot_uniform", **kw):
            super().__init__(**kw)
            self.sequence_length = int(sequence_length)
            self.initializer = init.get(initializer)

        def build(self, input_shape):
            self.position_embedding = self.add_weight(
                name="position_embedding",
                shape=(self.sequence_length, int(input_shape[-1])),
                initializer=self.initializer,
                trainable=True,
            )
            super().build(input_shape)

        def call(self, inputs):
            # (seq, d) → (1, seq, d): broadcasts when added to the input
            return ops.expand_dims(self.position_embedding, axis=0)

        def get_config(self):
            cfg = super().get_config()
            cfg.update(
                sequence_length=self.sequence_length,
                initializer=init.serialize(self.initializer),
            )
            return cfg

        # ---- numeric protocol for the keras-free test stub
        # (tests/keras_stub.py tier 2): inert under real keras, where
        # call()/get_weights() take precedence. Mirrors call() exactly:
        # the learned (seq, d) table broadcast over the batch. ----
        def forward(self, vals):
            x = np.asarray(vals[0], dtype=np.float64)
            if getattr(self, "_pe_table", None) is None:
                self._pe_table = np.zeros(
                    (self.sequence_length, x.shape[-1])
                )
            return self._pe_table[None, :, :]

        def weight_list(self):
            if getattr(self, "_pe_table", None) is None:
                raise ValueError("PositionEmbedding not built")
            return [self._pe_table]

        def take_weights(self, ws):
            self._pe_table = np.asarray(ws[0], dtype=np.float64)
            return 1

        def spec_config(self):
            return {"sequence_length": self.sequence_length}

    @serializable(package="centimators_spark")
    class CrossAttention(L.Layer):
        """Sum of attention over the time axis and over the feature axis
        (reference transformer.py:50-91)."""

        def __init__(self, key_dim=32, num_heads=4, dropout=0.1, **kw):
            super().__init__(**kw)
            self.key_dim, self.num_heads = int(key_dim), int(num_heads)
            self.dropout = float(dropout)
            self.temporal_attention = L.MultiHeadAttention(
                key_dim=self.key_dim, num_heads=self.num_heads,
                dropout=self.dropout, attention_axes=(1,),
            )
            self.feature_attention = L.MultiHeadAttention(
                key_dim=self.key_dim, num_heads=self.num_heads,
                dropout=self.dropout, attention_axes=(2,),
            )

        def call(self, inputs):
            return self.temporal_attention(inputs, inputs) + self.feature_attention(
                inputs, inputs
            )

        def get_config(self):
            cfg = super().get_config()
            cfg.update(
                key_dim=self.key_dim, num_heads=self.num_heads,
                dropout=self.dropout,
            )
            return cfg

    @serializable(package="centimators_spark")
    class AttentionPooling(L.Layer):
        """Softmax-weighted pooling over the sequence axis
        (reference transformer.py:94-106)."""

        def __init__(self, **kw):
            super().__init__(**kw)
            self.score = L.Dense(1)

        def call(self, inputs):
            weights = ops.softmax(self.score(inputs), axis=1)
            return ops.sum(inputs * weights, axis=1)

    @serializable(package="centimators_spark")
    class NeuralDecisionTree(keras.models.Model):
        """One differentiable tree with temperature-scaled stochastic
        routing (reference tree.py:54-210): a fixed random feature mask,
        a Dense layer producing one routing logit per leaf, and leaf
        values ``pi``; leaf reach-probabilities are built up level by
        level as products of sigmoid decisions."""

        def __init__(self, depth, num_features, used_features_rate,
                     output_units=1, l2_decision=1e-4, l2_leaf=1e-3,
                     temperature=0.5, rng=None, **kw):
            super().__init__(**kw)
            self.depth = depth
            self.num_features = num_features
            self.used_features_rate = used_features_rate
            self.num_leaves = 2 ** depth
            self.output_units = output_units
            self.l2_decision = l2_decision
            self.l2_leaf = l2_leaf
            self._init_temperature = temperature

            n_used = max(1, int(round(num_features * used_features_rate)))
            rng = rng or np.random.default_rng()
            picked = rng.choice(np.arange(num_features), n_used, replace=False)
            mask = np.eye(num_features)[picked].astype("float32")
            self.used_features_mask = self.add_weight(
                name="used_features_mask", shape=mask.shape,
                initializer=init.Constant(mask), trainable=False,
            )
            reg = keras.regularizers.l2
            self.pi = self.add_weight(
                shape=[self.num_leaves, output_units], dtype="float32",
                initializer="random_normal", trainable=True,
                regularizer=reg(l2_leaf) if l2_leaf > 0 else None,
            )
            self.temperature = self.add_weight(
                name="temperature", shape=(),
                initializer=init.Constant(temperature), trainable=False,
            )
            # raw logits; the temperature-scaled sigmoid happens in call()
            self.decision_fn = L.Dense(
                units=self.num_leaves, activation=None, name="decision",
                kernel_regularizer=reg(l2_decision) if l2_decision > 0 else None,
            )

        def get_config(self):
            cfg = super().get_config()
            cfg.update(
                depth=self.depth, num_features=self.num_features,
                used_features_rate=self.used_features_rate,
                output_units=self.output_units,
                l2_decision=self.l2_decision, l2_leaf=self.l2_leaf,
                temperature=self._init_temperature,
            )
            return cfg

        def call(self, features):
            batch = ops.shape(features)[0]
            masked = ops.matmul(features, ops.transpose(self.used_features_mask))
            logits = self.decision_fn(masked)            # [batch, leaves]
            go_left = ops.sigmoid(logits / self.temperature)
            go_left = ops.expand_dims(go_left, axis=2)   # [batch, leaves, 1]
            branch = L.Concatenate(axis=2)([go_left, 1 - go_left])
            # breadth-first product of routing probabilities per level
            mu = ops.ones([batch, 1, 1])
            lo, hi = 1, 2
            for level in range(self.depth):
                mu = ops.reshape(mu, [batch, -1, 1])
                mu = ops.tile(mu, (1, 1, 2))
                mu = mu * branch[:, lo:hi, :]
                lo, hi = hi, hi + 2 ** (level + 1)
            mu = ops.reshape(mu, [batch, self.num_leaves])
            return ops.matmul(mu, self.pi)

        # ---- numeric protocol for the keras-free test stub
        # (tests/keras_stub.py tier 3): inert under real keras, where
        # call()/get_weights() take precedence. Mirrors call() exactly
        # in numpy: mask → routing logits → temperature-scaled sigmoid
        # → breadth-first product of per-level decisions → leaf-value
        # matmul (reference tree.py:170-207). Weight order
        # [mask, pi, temperature, decision kernel, decision bias]. ----
        def _ensure_np(self, in_dim: int):
            if getattr(self, "_mask_np", None) is None:
                n_used = max(
                    1,
                    int(round(self.num_features * self.used_features_rate)),
                )
                self._mask_np = np.eye(in_dim)[:n_used]
                self._pi_np = np.zeros((self.num_leaves, self.output_units))
                self._temp_np = np.asarray(self._init_temperature, float)
                self._dec_kernel = np.zeros(
                    (self._mask_np.shape[0], self.num_leaves)
                )
                self._dec_bias = np.zeros(self.num_leaves)

        def forward(self, vals):
            x = np.asarray(vals[0], dtype=np.float64)
            self._ensure_np(x.shape[-1])
            n = x.shape[0]
            masked = x @ self._mask_np.T
            logits = masked @ self._dec_kernel + self._dec_bias
            d = 1.0 / (1.0 + np.exp(-logits / float(self._temp_np)))
            branch = np.stack([d, 1.0 - d], axis=2)  # (n, leaves, 2)
            mu = np.ones((n, 1, 1))
            lo, hi = 1, 2
            for level in range(self.depth):
                mu = mu.reshape(n, -1, 1)
                mu = np.tile(mu, (1, 1, 2))
                mu = mu * branch[:, lo:hi, :]
                lo, hi = hi, hi + 2 ** (level + 1)
            mu = mu.reshape(n, self.num_leaves)
            return mu @ self._pi_np

        def weight_list(self):
            if getattr(self, "_mask_np", None) is None:
                raise ValueError("NeuralDecisionTree not built")
            return [
                self._mask_np,
                self._pi_np,
                self._temp_np,
                self._dec_kernel,
                self._dec_bias,
            ]

        def take_weights(self, ws):
            (mask, pi, temp, k, b) = ws[:5]
            self._mask_np = np.asarray(mask, dtype=np.float64)
            self._pi_np = np.asarray(pi, dtype=np.float64)
            self._temp_np = np.asarray(temp, dtype=np.float64)
            self._dec_kernel = np.asarray(k, dtype=np.float64)
            self._dec_bias = np.asarray(b, dtype=np.float64)
            self.num_leaves = self._pi_np.shape[0]
            self.output_units = self._pi_np.shape[1]
            self.depth = int(round(np.log2(self.num_leaves)))
            return 5

        def spec_config(self):
            return {
                "depth": self.depth,
                "num_features": self.num_features,
                "used_features_rate": self.used_features_rate,
                "output_units": self.output_units,
                "temperature": self._init_temperature,
            }

    class TemperatureAnnealing(keras.callbacks.Callback):
        """Linearly anneal every tree's routing temperature from soft to
        sharp over training (reference tree.py:21-51)."""

        def __init__(self, trees, start=2.0, end=0.5, epochs=50):
            super().__init__()
            self.trees = list(trees)
            self.start, self.end, self.epochs = start, end, epochs

        def on_epoch_end(self, epoch, logs=None):
            t = self.start - (self.start - self.end) * ((epoch + 1) / self.epochs)
            for tree in self.trees:
                tree.temperature.assign(t)

    return SimpleNamespace(
        PositionEmbedding=PositionEmbedding,
        CrossAttention=CrossAttention,
        AttentionPooling=AttentionPooling,
        NeuralDecisionTree=NeuralDecisionTree,
        TemperatureAnnealing=TemperatureAnnealing,
    )


def build_transformer(
    seq_length: int,
    n_features_per_timestep: int,
    *,
    output_units: int = 1,
    d_model: int = 32,
    num_heads: int = 4,
    ff_dim: int = 128,
    num_blocks: int = 1,
    dropout_rate: float = 0.1,
    attention_type: str = "temporal",
    pooling_type: str = "attention",
    use_pre_norm: bool = True,
    mlp_units: Sequence[int] = (64,),
    optimizer=None,
    learning_rate: float = 1e-3,
    loss="mse",
    metrics: Sequence[str] = ("mse",),
):
    """Transformer encoder regressor (reference transformer.py:108-245).

    attention_type: 'temporal' (self-attention over timesteps),
    'feature' (iTransformer-style attention over the feature axis via
    Permute), or 'cross' (dual-axis CrossAttention). pooling_type:
    'attention' (learned weighted pooling) or 'average'."""
    keras = _keras()
    L = keras.layers
    cl = custom_layers()
    key_dim = max(1, d_model // num_heads)

    def encoder_block(block_in):
        x = (
            L.LayerNormalization(epsilon=1e-6)(block_in)
            if use_pre_norm
            else block_in
        )
        if attention_type == "temporal":
            x = L.MultiHeadAttention(
                key_dim=key_dim, num_heads=num_heads, dropout=dropout_rate
            )(x, x)
        elif attention_type == "feature":
            tokens = L.Permute((2, 1))(x)
            tokens = L.MultiHeadAttention(
                key_dim=max(1, seq_length // num_heads),
                num_heads=num_heads,
                dropout=dropout_rate,
            )(tokens, tokens)
            x = L.Permute((2, 1))(tokens)
        elif attention_type == "cross":
            x = cl.CrossAttention(
                key_dim=key_dim, num_heads=num_heads, dropout=dropout_rate
            )(x)
        else:
            raise ValueError(
                f"attention_type must be temporal|feature|cross, got "
                f"{attention_type!r}"
            )
        x = block_in + x
        ffn_in = L.LayerNormalization(epsilon=1e-6)(x) if use_pre_norm else x
        ffn = L.Dense(ff_dim, activation="relu")(ffn_in)
        ffn = L.Dropout(dropout_rate)(ffn)
        ffn = L.Dense(d_model)(ffn)
        ffn = L.Dropout(dropout_rate)(ffn)
        return x + ffn

    inputs = L.Input(
        shape=(seq_length, n_features_per_timestep), name="sequence_input"
    )
    x = L.Dense(d_model)(inputs)
    x = x + cl.PositionEmbedding(sequence_length=seq_length)(x)
    for _ in range(num_blocks):
        x = encoder_block(x)
    if use_pre_norm:
        x = L.LayerNormalization(epsilon=1e-6)(x)
    if pooling_type == "attention":
        x = cl.AttentionPooling()(x)
    elif pooling_type == "average":
        x = L.GlobalAveragePooling1D()(x)
    else:
        raise ValueError(
            f"pooling_type must be attention|average, got {pooling_type!r}"
        )
    for units in mlp_units:
        x = L.Dense(units, activation="relu")(x)
        x = L.Dropout(dropout_rate)(x)
    outputs = L.Dense(output_units, activation="linear", name="output")(x)
    return _compiled(
        keras, inputs, outputs, "transformer_regressor",
        optimizer=optimizer, learning_rate=learning_rate, loss=loss,
        metrics=metrics,
    )


def build_bottleneck_autoencoder(
    n_features: int,
    *,
    output_units: int = 1,
    gaussian_noise: float = 0.035,
    encoder_units: Sequence[tuple[int, float]] = ((1024, 0.1),),
    latent_units: tuple[int, float] = (256, 0.1),
    ae_units: Sequence[tuple[int, float]] = ((96, 0.4),),
    activation: str = "swish",
    reconstruction_loss_weight: float = 1.0,
    target_loss_weight: float = 1.0,
    optimizer=None,
    learning_rate: float = 1e-3,
    loss="mse",
    metrics: Sequence[str] = ("mse",),
):
    """Bottleneck autoencoder with a joint reconstruction + target head
    (reference autoencoder.py:25-110). Returns ``(model, encoder)``: the
    dual-output model (outputs named 'reconstruction' and
    'target_prediction') and the standalone inputs→latent encoder."""
    keras = _keras()
    L = keras.layers

    def dense_block(x, units, dropout):
        x = L.Dense(units)(x)
        x = L.BatchNormalization()(x)
        x = L.Activation(activation)(x)
        return L.Dropout(dropout)(x)

    inputs = L.Input(shape=(n_features,), name="features")
    x = L.BatchNormalization()(inputs)
    x = L.GaussianNoise(gaussian_noise)(x)
    for units, dropout in encoder_units:
        x = dense_block(x, units, dropout)
    latent = dense_block(x, *latent_units)
    encoder = keras.models.Model(inputs=inputs, outputs=latent, name="encoder")

    x = latent
    for units, dropout in reversed(list(encoder_units)):
        x = dense_block(x, units, dropout)
    reconstruction = L.Dense(n_features, name="reconstruction")(x)

    head = reconstruction
    for units, dropout in ae_units:
        head = dense_block(head, units, dropout)
    target = L.Dense(output_units, activation="linear", name="target_prediction")(
        head
    )

    model = keras.models.Model(
        inputs=inputs,
        outputs=[reconstruction, target],
        name="bottleneck_encoder",
    )
    opt_cls = optimizer or keras.optimizers.Adam
    model.compile(
        optimizer=opt_cls(learning_rate=learning_rate),
        loss={"reconstruction": "mse", "target_prediction": loss},
        loss_weights={
            "reconstruction": reconstruction_loss_weight,
            "target_prediction": target_loss_weight,
        },
        metrics={"target_prediction": list(metrics)},
    )
    return model, encoder


def build_neural_decision_forest(
    n_features: int,
    *,
    output_units: int = 1,
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
    optimizer=None,
    learning_rate: float = 1e-3,
    loss="mse",
    metrics: Sequence[str] = ("mse",),
):
    """Neural decision forest (reference tree.py:213-384): BatchNorm →
    optional input noise → optional shared MLP trunk → ensemble of
    differentiable trees (feature bagging per tree via a shared rng),
    optional per-tree noise and whole-tree dropout, averaged output.
    Returns ``(model, trees)`` so TemperatureAnnealing can reach the
    per-tree temperature weights."""
    keras = _keras()
    L, ops = keras.layers, keras.ops
    cl = custom_layers()
    rng = np.random.default_rng(random_state)

    inputs = L.Input(shape=(n_features,))
    x = L.BatchNormalization()(inputs)
    if input_noise_std > 0:
        x = L.GaussianNoise(input_noise_std)(x)
    trunk = list(trunk_units or [])
    for units in trunk:
        x = L.Dense(units, activation="relu")(x)
    tree_inputs_dim = trunk[-1] if trunk else n_features

    trees = [
        cl.NeuralDecisionTree(
            depth=depth,
            num_features=tree_inputs_dim,
            used_features_rate=used_features_rate,
            output_units=output_units,
            l2_decision=l2_decision,
            l2_leaf=l2_leaf,
            temperature=temperature,
            rng=rng,
        )
        for _ in range(num_trees)
    ]
    tree_outputs = [
        tree(L.GaussianNoise(tree_noise_std)(x) if tree_noise_std > 0 else x)
        for tree in trees
    ]
    if len(tree_outputs) > 1:
        stacked = ops.stack(tree_outputs, axis=1)  # [batch, trees, out]
        if tree_dropout_rate > 0:
            # noise_shape broadcasts over the output axis → whole trees drop
            stacked = L.Dropout(
                tree_dropout_rate, noise_shape=(None, num_trees, 1)
            )(stacked)
        outputs = ops.mean(stacked, axis=1)
    else:
        outputs = tree_outputs[0]

    model = _compiled(
        keras, inputs, outputs, "neural_decision_forest",
        optimizer=optimizer, learning_rate=learning_rate, loss=loss,
        metrics=metrics,
    )
    return model, trees


def TemperatureAnnealing(ndf, start: float = 2.0, end: float = 0.5, epochs: int = 50):
    """Keras callback annealing tree routing temperature soft→sharp
    over training (reference tree.py:21-50): linear schedule from
    ``start`` to ``end`` across ``epochs``, assigned to every tree of
    the fitted forest each epoch end.

    Factory spelled like the reference's class — it returns a
    ``keras.callbacks.Callback`` instance built against the lazily
    imported keras (so this module stays importable without it)."""
    keras = _keras()

    class _TemperatureAnnealing(keras.callbacks.Callback):
        def __init__(self, ndf, start, end, epochs):
            super().__init__()
            self.ndf = ndf
            self.start = start
            self.end = end
            self.epochs = epochs

        def on_epoch_end(self, epoch, logs=None):
            t = self.start - (self.start - self.end) * (
                (epoch + 1) / self.epochs
            )
            for tree in self.ndf.trees:
                tree.temperature.assign(t)

    return _TemperatureAnnealing(ndf, start, end, epochs)
