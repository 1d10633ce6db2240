"""Minimal keras stand-in for testing centimators_spark.ml without
keras installed — two capability tiers:

1. STRUCTURE (all five builders): every layer construction is recorded
   in ``CONSTRUCTED`` and every ``Model`` in ``MODELS``; tensors are
   ``Sym`` nodes that absorb any arithmetic/slicing, so builder code
   traces end-to-end and tests assert layer counts, wiring order, and
   compile() arguments.
2. NUMERIC (Dense-chain graphs, i.e. the MLP): Dense layers hold real
   numpy kernels, Dropout/noise/norm layers are inference-time
   identity, and ``Model`` supports the full serialization surface the
   engine's distributed scorer uses — ``to_json`` / ``get_weights`` /
   ``models.model_from_json`` / ``set_weights`` / ``predict`` — with a
   real forward pass. This numerically pins target scaling and
   ``KerasEstimator._score_with`` end-to-end (reference behavior:
   keras_estimators/base.py:89-100,129-130) without keras.

Usage: ``install()`` registers the stub as ``sys.modules['keras']``
(only if real keras is absent); call ``reset()`` between builds.
"""

from __future__ import annotations

import json
import sys
import types

import numpy as np

CONSTRUCTED: list = []  # every Layer/Model instance, construction order
MODELS: list = []       # every functional Model


def reset():
    CONSTRUCTED.clear()
    MODELS.clear()


def constructed(cls_name: str) -> list:
    return [l for l in CONSTRUCTED if type(l).__name__ == cls_name]


class Sym:
    """Symbolic tensor: any op yields another Sym. Layer calls record
    producer + inputs so Dense-chain graphs can be numerically
    evaluated and serialized."""

    def __init__(self, producer=None):
        self.producer = producer
        self.call_inputs: tuple = ()

    def _chain(self, *_a, **_k):
        return Sym(self)

    __add__ = __radd__ = __sub__ = __rsub__ = _chain
    __mul__ = __rmul__ = __truediv__ = __rtruediv__ = _chain
    __neg__ = __getitem__ = _chain

    def assign(self, _v):
        pass


_ACTIVATIONS = {
    None: lambda x: x,
    "linear": lambda x: x,
    "relu": lambda x: np.maximum(x, 0.0),
    "tanh": np.tanh,
    "sigmoid": lambda x: 1.0 / (1.0 + np.exp(-x)),
}


class Layer:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.name = kwargs.get("name")
        self.built = False
        CONSTRUCTED.append(self)

    def __call__(self, *inputs, **kwargs):
        if not self.built and hasattr(self, "build"):
            self.build(getattr(inputs[0], "shape", (None, 1)))
        self.called_with = inputs
        out = self.call(*inputs, **kwargs)
        if isinstance(out, Sym):
            out.producer = self
            out.call_inputs = inputs
        return out

    def call(self, *inputs, **kwargs):
        return Sym(self)

    def build(self, input_shape):
        self.built = True

    def add_weight(self, *args, **kwargs):
        return Sym(self)

    def get_config(self):
        return {"name": self.name}

    # ---- numeric tier (identity by default: inference-time behavior
    # of Dropout / GaussianNoise / untrained Batch/LayerNorm) ----
    def forward(self, vals):
        return vals[0]

    def weight_list(self):
        return []

    def take_weights(self, ws):
        return 0

    def spec_config(self):
        return {}


def _layer_type(name):
    return type(name, (Layer,), {})


class Dense(Layer):
    """Numerically real: y = act(x @ kernel + bias). args/kwargs are
    recorded exactly as passed (structure tests read them verbatim)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        units = args[0] if args else kwargs.get("units")
        self.units = int(units)
        self.activation = (
            args[1] if len(args) > 1 else kwargs.get("activation")
        )
        self.kernel = None
        self.bias = None

    def _ensure_built(self, in_dim: int):
        if self.kernel is None:
            self.kernel = np.zeros((in_dim, self.units))
            self.bias = np.zeros(self.units)

    def forward(self, vals):
        x = np.asarray(vals[0], dtype=np.float64)
        self._ensure_built(x.shape[-1])
        act = _ACTIVATIONS.get(self.activation)
        if act is None:
            raise NotImplementedError(
                f"stub Dense activation {self.activation!r}"
            )
        return act(x @ self.kernel + self.bias)

    def weight_list(self):
        if self.kernel is None:
            raise ValueError("Dense not built — run fit/predict first")
        return [self.kernel, self.bias]

    def take_weights(self, ws):
        self.kernel = np.asarray(ws[0], dtype=np.float64)
        self.bias = np.asarray(ws[1], dtype=np.float64)
        self.units = self.kernel.shape[1]
        return 2

    def spec_config(self):
        return {"units": self.units, "activation": self.activation}


Dropout = _layer_type("Dropout")
LSTM = _layer_type("LSTM")
Bidirectional = _layer_type("Bidirectional")
LayerNormalization = _layer_type("LayerNormalization")
BatchNormalization = _layer_type("BatchNormalization")
GaussianNoise = _layer_type("GaussianNoise")
Activation = _layer_type("Activation")
Permute = _layer_type("Permute")
GlobalAveragePooling1D = _layer_type("GlobalAveragePooling1D")
Concatenate = _layer_type("Concatenate")


class MultiHeadAttention(Layer):
    def call(self, q, v=None, **kw):
        return Sym(self)


class _InputTensor(Sym):
    def __init__(self, shape=None, name=None):
        super().__init__()
        self.shape = (None, *(shape or ()))
        self.name = name


def Input(shape=None, name=None, **kw):
    return _InputTensor(shape=shape, name=name)


class Model(Layer):
    def __init__(self, *args, inputs=None, outputs=None, name=None, **kwargs):
        super().__init__(name=name, **kwargs)
        self.inputs, self.outputs = inputs, outputs
        self.compile_kwargs = None
        self.fit_calls: list = []
        if inputs is not None or outputs is not None:
            MODELS.append(self)

    def compile(self, **kwargs):
        self.compile_kwargs = kwargs

    # ---- numeric tier: Dense-chain graphs only ----
    def _chain_layers(self) -> list:
        """Walk outputs → input; returns layers input-first. Raises
        NotImplementedError for non-chain graphs (multi-input layers,
        arithmetic Syms) — those stay structure-only."""
        out = self.outputs
        if isinstance(out, (list, tuple)):
            if len(out) != 1:
                raise NotImplementedError("numeric stub: single output only")
            out = out[0]
        layers = []
        node = out
        while not isinstance(node, _InputTensor):
            if not isinstance(node, Sym) or not isinstance(
                node.producer, Layer
            ):
                raise NotImplementedError(
                    "numeric stub supports layer-chain graphs only"
                )
            if len(node.call_inputs) != 1:
                raise NotImplementedError(
                    "numeric stub supports single-input chains only"
                )
            layers.append(node.producer)
            node = node.call_inputs[0]
        return list(reversed(layers))

    def fit(self, X=None, y=None, **kwargs):
        self.fit_calls.append(kwargs)
        # build Dense kernels from real input widths so get_weights()
        # works right after fit, like keras
        try:
            if X is not None:
                self.predict(np.asarray(X)[:1])
        except NotImplementedError:
            pass
        return types.SimpleNamespace(history={})

    def predict(self, X, batch_size=None, verbose=0):
        val = np.asarray(X, dtype=np.float64)
        for layer in self._chain_layers():
            val = layer.forward([val])
        return val

    def get_weights(self):
        return [w for l in self._chain_layers() for w in l.weight_list()]

    def set_weights(self, ws):
        i = 0
        for layer in self._chain_layers():
            i += layer.take_weights(ws[i:])
        if i != len(ws):
            raise ValueError(f"set_weights: {len(ws)} given, {i} consumed")

    def to_json(self):
        layers = self._chain_layers()
        in_shape = None
        node = self.inputs
        if isinstance(node, (list, tuple)):
            node = node[0]
        if isinstance(node, _InputTensor):
            in_shape = list(node.shape[1:])
        return json.dumps(
            {
                "stub": "keras_stub-chain",
                "input_shape": in_shape,
                "layers": [
                    {"type": type(l).__name__, "config": l.spec_config()}
                    for l in layers
                ],
            }
        )


def model_from_json(spec: str) -> "Model":
    """Rebuild a Dense-chain model from ``Model.to_json`` output — the
    deserialization half of the engine's ship-spec-and-weights scoring
    path."""
    d = json.loads(spec)
    if d.get("stub") != "keras_stub-chain":
        raise NotImplementedError("stub model_from_json: chain specs only")
    registry = {
        c.__name__: c
        for c in (
            Dense, Dropout, LayerNormalization, BatchNormalization,
            GaussianNoise, Activation,
        )
    }
    inp = Input(shape=tuple(d["input_shape"] or ()))
    x = inp
    for ld in d["layers"]:
        cls = registry[ld["type"]]
        cfg = ld.get("config") or {}
        layer = (
            cls(cfg["units"], activation=cfg["activation"])
            if ld["type"] == "Dense"
            else cls()
        )
        x = layer(x)
    return Model(inputs=inp, outputs=x)


class Callback:
    def __init__(self, *a, **kw):
        pass


class _Initializer:
    def __init__(self, value=None):
        self.value = value

    def __call__(self, *a, **kw):
        return Sym()


def _initializers_get(name):
    return _Initializer(name)


def _initializers_serialize(obj):
    return getattr(obj, "value", str(obj))


class Optimizer:
    def __init__(self, learning_rate=1e-3, **kw):
        self.learning_rate = learning_rate


def _ops_fn(*_a, **_k):
    return Sym()


def _make_module():
    keras = types.ModuleType("keras")

    layers = types.ModuleType("keras.layers")
    for n, obj in dict(
        Layer=Layer, Dense=Dense, Dropout=Dropout, Input=Input, LSTM=LSTM,
        Bidirectional=Bidirectional, LayerNormalization=LayerNormalization,
        BatchNormalization=BatchNormalization, GaussianNoise=GaussianNoise,
        Activation=Activation, MultiHeadAttention=MultiHeadAttention,
        Permute=Permute, GlobalAveragePooling1D=GlobalAveragePooling1D,
        Concatenate=Concatenate,
    ).items():
        setattr(layers, n, obj)

    models = types.ModuleType("keras.models")
    models.Model = Model
    models.model_from_json = model_from_json

    ops = types.ModuleType("keras.ops")
    for n in ("expand_dims softmax sum shape matmul transpose sigmoid "
              "reshape tile stack mean ones").split():
        setattr(ops, n, _ops_fn)

    initializers = types.ModuleType("keras.initializers")
    initializers.get = _initializers_get
    initializers.serialize = _initializers_serialize
    initializers.Constant = _Initializer

    regularizers = types.ModuleType("keras.regularizers")
    regularizers.l2 = lambda v: ("l2", v)

    callbacks = types.ModuleType("keras.callbacks")
    callbacks.Callback = Callback

    optimizers = types.ModuleType("keras.optimizers")
    optimizers.Adam = Optimizer

    saving = types.ModuleType("keras.saving")
    saving.register_keras_serializable = lambda **kw: (lambda cls: cls)

    for n, mod in dict(
        layers=layers, models=models, ops=ops, initializers=initializers,
        regularizers=regularizers, callbacks=callbacks,
        optimizers=optimizers, saving=saving,
    ).items():
        setattr(keras, n, mod)
        sys.modules[f"keras.{n}"] = mod
    return keras


def install() -> bool:
    """Register the stub as ``keras`` unless real keras exists. Returns
    True when the stub (not real keras) is active."""
    try:
        import keras  # noqa: F401

        return "keras_stub" in getattr(keras, "__doc__", "") or False
    except ImportError:
        sys.modules["keras"] = _make_module()
        return True
