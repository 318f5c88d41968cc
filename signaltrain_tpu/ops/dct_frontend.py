"""Cosine-modulated (MDCT-like) trainable front-end.

Parity module for the reference's vestigial DCT-basis front-end
(cls_fe_dct_bases.py) — unused by the main model path there (and it cannot
even run under py3: xrange at cls_fe_dct_bases.py:28,77), but part of the
component inventory. Rebuilt working and TPU-native: framing + GEMM like
ops/frontend.py, with the cosine-modulated polyphase basis

    cos_an[k, n] = w[n] * cos(pi/K * (k+0.5) * (n+0.5+K/2)) * sqrt(2/K)

(w = symmetric cosine window; cls_fe_dct_bases.py:57-97 'scott_method').
Synthesis can run with its own trainable weights or tied to the analysis
weights (tied_transform, cls_fe_dct_bases.py:36-54).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from . import framing
from .frontend import _as_init, _gemm


def cosine_window(n: int) -> np.ndarray:
    """scipy.signal.windows.cosine: sin(pi*(k+0.5)/n)."""
    return np.sin(np.pi / n * (np.arange(n) + 0.5))


def core_modulation(freq_subbands: int, window_size: int) -> np.ndarray:
    """Cosine-modulated polyphase matrix (cls_fe_dct_bases.py:57-97)."""
    w = cosine_window(window_size)
    kvec = (np.arange(freq_subbands) + 0.5)[:, None]
    nvec = (np.arange(window_size) + 0.5 + freq_subbands / 2)[None, :]
    cos_an = w * np.cos(np.pi / freq_subbands * kvec * nvec) * np.sqrt(
        2.0 / freq_subbands
    )
    return cos_an.astype(np.float32)


class DCTAnalysis(nn.Module):
    """(B, L) -> (B, T, ft_size) subband frames; Conv1d(1, ft, w_size,
    padding=ft, stride=hop) semantics (cls_fe_dct_bases.py:116-135)."""

    ft_size: int = 1024
    w_size: int = 2048
    hop_size: int = 1024
    use_bias: bool = True
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, wave: jnp.ndarray) -> jnp.ndarray:
        w0 = core_modulation(self.ft_size, self.w_size)
        weight = self.param("weight", _as_init(w0), (self.ft_size, self.w_size))
        frames = framing.frame_signal(wave, self.w_size, self.hop_size, pad=self.ft_size)
        out = _gemm(frames, weight.T, self.compute_dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.ft_size,), jnp.float32
            )
            out = out + bias
        return out


class DCTSynthesis(nn.Module):
    """(B, T, ft_size) -> (B, L) via transposed conv semantics, trimming
    ft_size samples from both ends (cls_fe_dct_bases.py:138-180)."""

    ft_size: int = 1024
    w_size: int = 2048
    hop_size: int = 1024
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_ft: jnp.ndarray) -> jnp.ndarray:
        w0 = core_modulation(self.ft_size, self.w_size)
        weight = self.param("weight", _as_init(w0), (self.ft_size, self.w_size))
        return self._synthesize(x_ft, weight)

    def _synthesize(self, x_ft, weight):
        frames = _gemm(x_ft, weight, self.compute_dtype)  # (B, T, w_size)
        wave = framing.overlap_add(frames, self.hop_size)
        return wave[:, self.ft_size : -self.ft_size]


def tied_transform(analysis_weight, x_ft, hop_size: int, ft_size: int,
                   compute_dtype=jnp.float32):
    """Reconstruct using the ANALYSIS weights (orthogonal tied transform,
    cls_fe_dct_bases.py:36-54)."""
    frames = _gemm(x_ft, analysis_weight, compute_dtype)
    wave = framing.overlap_add(frames, hop_size)
    return wave[:, ft_size:-ft_size]
