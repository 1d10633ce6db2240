"""Worker-side spelling of tests/keras_stub.py: addPyFile puts this
file AND keras_stub.py in the worker's import root, so ``import keras``
inside a scoring UDF resolves to the same numeric stub the driver
installed into sys.modules."""
import sys

try:
    # driver-side accidental import (addPyFile adds this dir to the
    # driver path too): reuse the canonical module instance so the
    # CONSTRUCTED/CUSTOM_OBJECTS registries stay shared
    import tests.keras_stub as keras_stub
except ImportError:
    import keras_stub

_mod = keras_stub._make_module()  # registers keras.layers etc.
globals().update({k: v for k, v in vars(_mod).items() if not k.startswith("__")})
sys.modules["keras"] = _mod
