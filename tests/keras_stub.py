"""Minimal symbolic keras stand-in for STRUCTURE-testing the builders in
centimators_spark.ml.architectures without keras installed.

Every layer construction is recorded in ``CONSTRUCTED`` and every
``Model`` in ``MODELS``; tensors are opaque ``Sym`` nodes that absorb
any arithmetic/slicing, so builder code traces end-to-end and tests can
assert layer counts, names, wiring order, and compile() arguments.
This is a test double, not an emulator — no shapes, no math.

Usage: ``install()`` registers the stub as ``sys.modules['keras']``
(only if real keras is absent); call ``reset()`` between builds.
"""

from __future__ import annotations

import sys
import types

CONSTRUCTED: list = []  # every Layer/Model instance, construction order
MODELS: list = []       # every functional Model


def reset():
    CONSTRUCTED.clear()
    MODELS.clear()


def constructed(cls_name: str) -> list:
    return [l for l in CONSTRUCTED if type(l).__name__ == cls_name]


class Sym:
    """Opaque symbolic tensor: any op on it yields another Sym."""

    def __init__(self, producer=None):
        self.producer = producer

    def _chain(self, *_a, **_k):
        return Sym(self)

    __add__ = __radd__ = __sub__ = __rsub__ = _chain
    __mul__ = __rmul__ = __truediv__ = __rtruediv__ = _chain
    __neg__ = __getitem__ = _chain

    def assign(self, _v):
        pass


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
        return self.call(*inputs, **kwargs)

    def call(self, *inputs, **kwargs):
        return Sym(self)

    def build(self, input_shape):
        self.built = True

    def add_weight(self, *args, **kwargs):
        return Sym(self)

    def get_config(self):
        return {"name": self.name}


def _layer_type(name):
    return type(name, (Layer,), {})


Dense = _layer_type("Dense")
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
        if inputs is not None or outputs is not None:
            MODELS.append(self)

    def compile(self, **kwargs):
        self.compile_kwargs = kwargs


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
