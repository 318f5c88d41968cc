"""signaltrain_tpu: TPU-native framework for learning audio effects.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
drscotthawley/signaltrain (AES 147 / arXiv:1905.11928): knob-conditioned
magnitude-phase spectral autoencoders with trainable DFT front-ends, learning
time-dependent nonlinear audio effects (dynamic-range compressors et al.).
"""

__version__ = "0.1.0"
