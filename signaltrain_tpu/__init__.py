"""signaltrain_tpu: TPU-native framework for learning audio effects.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
drscotthawley/signaltrain (AES 147 / arXiv:1905.11928): knob-conditioned
magnitude-phase spectral autoencoders with trainable DFT front-ends, learning
time-dependent nonlinear audio effects (dynamic-range compressors et al.).

The reference package surface (`import signaltrain as st; st.audio...`,
reference signaltrain/__init__.py) is mirrored: st.audio, st.datasets,
st.io_methods, st.learningrate, st.loss_functions, st.nn_proc, st.misc,
st.train resolve lazily (PEP 562) so a bare import stays light.
"""

import importlib

__version__ = "0.1.0"

_SUBMODULES = (
    "audio", "datasets", "io_methods", "learningrate", "loss_functions",
    "nn_proc", "misc", "train",
)


def __getattr__(name):
    if name in _SUBMODULES:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_SUBMODULES))
