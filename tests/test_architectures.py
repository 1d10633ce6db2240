"""Structure tests for the five Keras architecture builders.

keras is not installed in this container, so these run against the
symbolic stub in tests/keras_stub.py: each builder's graph is traced
end-to-end and the layer composition, wiring kwargs, and compile
arguments are asserted against the reference spec
(/root/reference/src/centimators/model_estimators/keras_estimators/ and
its tests/test_model_estimators.py:109-141). When real keras is
present the stub steps aside and these tests skip (the gated
fit/predict tests in test_estimators.py take over).
"""

from __future__ import annotations

import sys

import pytest


@pytest.fixture()
def stub():
    import tests.keras_stub as ks

    if not ks.install():
        pytest.skip("real keras installed — structure stub not applicable")
    ks.reset()
    yield ks
    for name in [m for m in sys.modules if m == "keras" or m.startswith("keras.")]:
        del sys.modules[name]


def _count(ks, name):
    return len(ks.constructed(name))


def test_mlp_structure(stub):
    from centimators_spark.ml import architectures as A

    model = A.build_mlp(10, hidden_units=(64, 32), dropout_rate=0.2)
    # 2 hidden Dense + 1 output Dense; one Dropout per hidden layer
    assert _count(stub, "Dense") == 3
    assert _count(stub, "Dropout") == 2
    assert model.name == "mlp_regressor"
    assert model.compile_kwargs["loss"] == "mse"
    assert model.compile_kwargs["optimizer"].learning_rate == 1e-3


def test_mlp_no_dropout_when_zero(stub):
    from centimators_spark.ml import architectures as A

    A.build_mlp(4, hidden_units=(8,), dropout_rate=0.0)
    assert _count(stub, "Dropout") == 0
    assert _count(stub, "Dense") == 2


def test_lstm_structure(stub):
    from centimators_spark.ml import architectures as A

    model = A.build_lstm(
        seq_length=5, n_features_per_timestep=3,
        lstm_units=[(64, 0.01, 0.01), (32, 0.0, 0.0)],
        bidirectional=True, use_layer_norm=True,
    )
    lstms = stub.constructed("LSTM")
    assert len(lstms) == 2
    # all but the last recurrent layer return sequences
    assert lstms[0].kwargs["return_sequences"] is True
    assert lstms[1].kwargs["return_sequences"] is False
    assert lstms[0].kwargs["units"] == 64 and lstms[1].kwargs["units"] == 32
    assert _count(stub, "Bidirectional") == 2
    assert _count(stub, "LayerNormalization") == 2
    assert _count(stub, "BatchNormalization") == 0
    assert model.name == "lstm_regressor"


def test_transformer_temporal_structure(stub):
    from centimators_spark.ml import architectures as A

    num_blocks, mlp_units = 2, (64,)
    model = A.build_transformer(
        seq_length=4, n_features_per_timestep=2,
        num_blocks=num_blocks, mlp_units=mlp_units,
    )
    assert _count(stub, "MultiHeadAttention") == num_blocks
    assert _count(stub, "PositionEmbedding") == 1
    assert _count(stub, "AttentionPooling") == 1
    # pre-norm: 2 per block + 1 final
    assert _count(stub, "LayerNormalization") == 2 * num_blocks + 1
    # Dense: input proj + 2 ffn per block + pooling score + head + output
    assert _count(stub, "Dense") == 1 + 2 * num_blocks + 1 + len(mlp_units) + 1
    assert model.name == "transformer_regressor"


def test_transformer_feature_attention_permutes(stub):
    from centimators_spark.ml import architectures as A

    A.build_transformer(
        seq_length=4, n_features_per_timestep=2,
        attention_type="feature", num_blocks=1,
    )
    # iTransformer-style: permute in, attend over features, permute back
    assert _count(stub, "Permute") == 2
    assert _count(stub, "MultiHeadAttention") == 1


def test_transformer_cross_attention_is_dual_axis(stub):
    from centimators_spark.ml import architectures as A

    A.build_transformer(
        seq_length=4, n_features_per_timestep=2,
        attention_type="cross", num_blocks=1,
    )
    cross = stub.constructed("CrossAttention")
    assert len(cross) == 1
    # CrossAttention owns a temporal and a feature MultiHeadAttention
    assert _count(stub, "MultiHeadAttention") == 2
    att = cross[0]
    assert att.temporal_attention.kwargs["attention_axes"] == (1,)
    assert att.feature_attention.kwargs["attention_axes"] == (2,)


def test_transformer_average_pooling_and_post_norm(stub):
    from centimators_spark.ml import architectures as A

    A.build_transformer(
        seq_length=4, n_features_per_timestep=2,
        pooling_type="average", use_pre_norm=False, num_blocks=1,
    )
    assert _count(stub, "GlobalAveragePooling1D") == 1
    assert _count(stub, "AttentionPooling") == 0
    assert _count(stub, "LayerNormalization") == 0


def test_transformer_invalid_args(stub):
    from centimators_spark.ml import architectures as A

    with pytest.raises(ValueError, match="attention_type"):
        A.build_transformer(4, 2, attention_type="bogus")
    with pytest.raises(ValueError, match="pooling_type"):
        A.build_transformer(4, 2, pooling_type="bogus")


def test_autoencoder_structure(stub):
    from centimators_spark.ml import architectures as A

    model, encoder = A.build_bottleneck_autoencoder(
        20, encoder_units=[(8, 0.1)], latent_units=(4, 0.1),
        ae_units=[(6, 0.4)],
    )
    assert [m.name for m in (encoder, model)] == ["encoder", "bottleneck_encoder"]
    # dual output: reconstruction + target head
    assert len(model.outputs) == 2
    losses = model.compile_kwargs["loss"]
    assert set(losses) == {"reconstruction", "target_prediction"}
    assert model.compile_kwargs["loss_weights"] == {
        "reconstruction": 1.0, "target_prediction": 1.0,
    }
    # Dense: enc block + latent + dec block + reconstruction + ae block + target
    assert _count(stub, "Dense") == 6
    # BatchNorm: input + one per dense block (enc, latent, dec, ae)
    assert _count(stub, "BatchNormalization") == 5
    assert _count(stub, "GaussianNoise") == 1


def test_forest_structure(stub):
    from centimators_spark.ml import architectures as A

    model, trees = A.build_neural_decision_forest(
        12, num_trees=3, depth=2, trunk_units=[8], tree_dropout_rate=0.1,
        random_state=0,
    )
    assert len(trees) == 3
    assert _count(stub, "NeuralDecisionTree") == 3
    # each tree owns one routing Dense('decision'); trunk adds one more
    decisions = [d for d in stub.constructed("Dense") if d.kwargs.get("name") == "decision"]
    assert len(decisions) == 3
    assert all(d.kwargs["units"] == 2 ** 2 for d in decisions)  # num_leaves
    assert _count(stub, "Dense") == 4
    # whole-tree dropout broadcasts over the output axis
    drop = stub.constructed("Dropout")[0]
    assert drop.kwargs["noise_shape"] == (None, 3, 1)
    assert model.name == "neural_decision_forest"


def test_forest_single_tree_skips_stack(stub):
    from centimators_spark.ml import architectures as A

    _, trees = A.build_neural_decision_forest(6, num_trees=1, depth=3)
    assert len(trees) == 1
    assert _count(stub, "Dropout") == 0


def test_estimator_wrappers_construct_without_keras():
    # constructing the named estimators must not require keras — only
    # fit/predict touch it (the import gate lives there)
    from centimators_spark.ml import (
        BottleneckEncoder,
        LSTMRegressor,
        MLPRegressor,
        NeuralDecisionForestRegressor,
        TransformerRegressor,
    )

    feats = [f"f{i}" for i in range(6)]
    MLPRegressor(feats, "y")
    LSTMRegressor(feats, lag_windows=[1, 2, 3], n_features_per_timestep=2)
    TransformerRegressor(feats, lag_windows=[1, 2], n_features_per_timestep=3)
    ndf = NeuralDecisionForestRegressor(feats, "y", num_trees=2)
    assert ndf.trees == []
    ae = BottleneckEncoder(feats, "y", latent_units=(4, 0.1))
    assert ae.get_feature_names_out() == [f"latent_{i}" for i in range(4)]
    assert ae.scale_target is False and ae.predict_output_index == 1


def test_sequence_estimator_validates_column_count():
    from centimators_spark.ml import LSTMRegressor

    with pytest.raises(ValueError, match="feature columns"):
        LSTMRegressor(["a", "b", "c"], lag_windows=[1, 2], n_features_per_timestep=2)


def test_estimator_builds_under_stub(stub):
    from centimators_spark.ml import (
        BottleneckEncoder,
        MLPRegressor,
        NeuralDecisionForestRegressor,
    )

    m = MLPRegressor([f"f{i}" for i in range(5)], "y", hidden_units=(8,))
    assert m._build().name == "mlp_regressor"

    ndf = NeuralDecisionForestRegressor([f"f{i}" for i in range(5)], num_trees=2)
    assert ndf._build().name == "neural_decision_forest"
    assert len(ndf.trees) == 2

    ae = BottleneckEncoder([f"f{i}" for i in range(5)], latent_units=(4, 0.1))
    model = ae._build()
    assert model.name == "bottleneck_encoder" and ae.encoder.name == "encoder"
    # dual-head fit target dict (reference autoencoder.py:112-117)
    import numpy as np

    X, y = np.zeros((3, 5)), np.zeros(3)
    tgt = ae._fit_targets(X, y)
    assert set(tgt) == {"reconstruction", "target_prediction"}
    assert tgt["reconstruction"] is X


def test_temperature_annealing_schedule(stub):
    from centimators_spark.ml import architectures as A

    class _Temp:
        value = None

        def assign(self, v):
            self.value = v

    class _Tree:
        def __init__(self):
            self.temperature = _Temp()

    cl = A.custom_layers()
    trees = [_Tree(), _Tree()]
    cb = cl.TemperatureAnnealing(trees, start=2.0, end=0.5, epochs=10)
    cb.on_epoch_end(0)
    assert trees[0].temperature.value == pytest.approx(2.0 - 1.5 * (1 / 10))
    cb.on_epoch_end(9)
    # final epoch lands exactly on the end temperature, for every tree
    assert all(t.temperature.value == pytest.approx(0.5) for t in trees)


def test_temperature_annealing_schedule(stub):
    """Linear soft→sharp schedule assigns temperature to every tree
    each epoch end (reference tree.py:40-50)."""
    from centimators_spark.ml import architectures as A

    class _T:
        def __init__(self):
            self.values = []

        def assign(self, v):
            self.values.append(round(v, 6))

    class _Tree:
        def __init__(self):
            self.temperature = _T()

    class _NDF:
        trees = [_Tree(), _Tree()]

    cb = A.TemperatureAnnealing(_NDF, start=2.0, end=0.5, epochs=3)
    for epoch in range(3):
        cb.on_epoch_end(epoch)
    for tree in _NDF.trees:
        assert tree.temperature.values == [1.5, 1.0, 0.5]


def test_reference_public_api_parity():
    """Every name the reference exports resolves here too
    (reference __init__.py:23-48, model_estimators/__init__.py:10-24)."""
    import centimators_spark as cs

    for name in [
        "BaseKerasEstimator", "SequenceEstimator", "MLPRegressor",
        "BottleneckEncoder", "LSTMRegressor", "TransformerRegressor",
        "NeuralDecisionForestRegressor", "TemperatureAnnealing",
        "DSPyMator", "KerasCortex", "RankTransformer", "LagTransformer",
        "MovingAverageTransformer", "LogReturnTransformer",
        "GroupStatsTransformer", "EmbeddingTransformer", "DimReducer",
        "FeatureNeutralizer", "FeaturePenalizer", "set_keras_backend",
        "get_keras_backend",
    ]:
        assert hasattr(cs, name), name


def test_keras_backend_config():
    import os

    import pytest as _pytest

    from centimators_spark.config import get_keras_backend, set_keras_backend

    prev = os.environ.get("KERAS_BACKEND")
    try:
        os.environ.pop("KERAS_BACKEND", None)
        assert get_keras_backend() == "jax"
        set_keras_backend("tensorflow")
        assert get_keras_backend() == "tensorflow"
        with _pytest.warns(RuntimeWarning, match="already set"):
            set_keras_backend("torch")
        with _pytest.raises(ValueError, match="Invalid backend"):
            set_keras_backend("mxnet")
    finally:
        if prev is None:
            os.environ.pop("KERAS_BACKEND", None)
        else:
            os.environ["KERAS_BACKEND"] = prev
