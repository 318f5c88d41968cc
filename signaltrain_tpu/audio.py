"""Reference-API facade: `import signaltrain_tpu as st; st.audio.<name>`
mirrors the reference's `signaltrain.audio` surface (audio.py) so existing
user code ports with an import swap.

Key-less random functions (the reference uses numpy global state) draw from a
module-level PRNG stream seeded via seed(); pass explicit keys through the
underlying signaltrain_tpu.dsp APIs for reproducible pipelines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# effects & kernels
from .dsp.effects import (  # noqa: F401
    Effect, Compressor, Compressor_4c, Compressor_4c_Large, Comp_Just_Thresh,
    Compressor_4c_OneSetting, Echo, PitchShifter, Denoise, DeCompressor_4c,
    TimeAlign, LowPass, FileEffect, EFFECTS, make_effect,
)
from .dsp.compressors import (  # noqa: F401
    compressor, compressor_4controls, echo, mu_compand, mu_decompand,
)
from .dsp import synths as _synths
from .dsp.knobs import int2knobs  # noqa: F401
from .data.audio_io import (  # noqa: F401
    read_audio_file, write_audio_file, readaudio_generator,
)
from .ops import framing as _framing

_state = {"key": jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))}


def seed(s: int):
    """Seed the facade's PRNG stream (counterpart of np.random.seed)."""
    _state["key"] = jax.random.PRNGKey(s)


def _next_key():
    _state["key"], sub = jax.random.split(_state["key"])
    return sub


def random_ends(size=1):
    """Beta(0.8, 0.8) sampler (audio.py:20-21)."""
    return np.asarray(_synths.random_ends(_next_key(), (size,)))


def sliding_window(x, size, overlap=0):
    """Strided windowing with zero-pad tail (audio.py:23-49)."""
    return np.asarray(_framing.sliding_window(jnp.asarray(x), size, overlap))


def undo_sliding_window(x, overlap, flatsize=None):
    return np.asarray(
        _framing.undo_sliding_window(jnp.asarray(x), overlap, flatsize)
    )


def synth_input_sample(t, chooser=None, t0_fac=None):
    """12-way synthetic signal chooser (audio.py:296-334). t may be numpy."""
    k1, k2 = jax.random.split(_next_key())
    if chooser is None:
        chooser = int(jax.random.randint(k1, (), 0, 11))
    y = _synths.synth_input_sample(k2, jnp.asarray(t), int(chooser), t0_fac=t0_fac)
    return np.asarray(y)


def pinknoise(n):
    return np.asarray(_synths.pinknoise(_next_key(), int(n)))


def normish(y, amp_range=None):
    amp_range = (0.6, 0.9) if amp_range is None else tuple(amp_range)
    return np.asarray(_synths.normish(_next_key(), jnp.asarray(y), amp_range))


def my_clip_min(x, clip_min):
    """np.clip(min) stand-in (audio.py:373-378)."""
    return np.maximum(x, clip_min)
