"""Semitone pitch shifting: resample + phase-vocoder time stretch.

The reference delegates to librosa.effects.pitch_shift (audio.py:549-556);
here the whole pipeline is native jax so the knob can be a traced,
per-example value inside the jitted data chain. The design is complex-free
(this TPU backend implements neither complex arithmetic nor FFT): the STFT
runs as cos/sin GEMMs and phases via atan2.

Pipeline (all shapes static; f = 2^(n_steps/12) may be traced):
  1. resample  r(m) = x(f*m) into a 2N buffer (covers f >= 0.5, i.e. -12
     semitones; content duration becomes N/f)
  2. phase-vocoder time-stretch by f: output frame j reads fractional
     analysis frame j/f, with per-bin phase accumulation (lax.scan)
  3. inverse STFT (cos/sin GEMM + overlap-add, hann^2 envelope normalized)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import framing


@functools.lru_cache(maxsize=4)
def _stft_matrices(ft: int):
    k = np.arange(ft // 2 + 1)[:, None]
    n = np.arange(ft)[None, :]
    ang = 2.0 * np.pi * k * n / ft
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def _hann(ft: int):
    n = np.arange(ft)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / ft)).astype(np.float32)


def _wrap_pi(x):
    return x - 2.0 * jnp.pi * jnp.round(x / (2.0 * jnp.pi))


def pitch_shift(x: jnp.ndarray, sr: float, n_steps, ft: int = 2048, hop: int = 512):
    """Shift pitch of x (1-D, length N) by n_steps semitones, keeping length.

    n_steps may be a traced scalar in [-12, 12]. Quality is comparable to a
    standard phase vocoder (not identical to librosa's output sample-for-
    sample, which is not reproducible here anyway).
    """
    del sr  # pitch factor is relative; sr kept for API parity
    n = x.shape[-1]
    if n < 16:
        # below the smallest analysis frame (ft=32 over the 2N resample
        # buffer) no vocoder frame fits; identity is the only
        # length-preserving answer
        return x
    if n < 4 * ft:
        # short signals (small-geometry training chunks): shrink the frame to
        # a power of two <= n/4 so the vocoder keeps >= ~13 analysis frames
        ft = max(32, 1 << int(np.floor(np.log2(max(32, n // 4)))))
        hop = ft // 4
    f = jnp.power(2.0, n_steps / 12.0)

    # --- stage 1: resample into a 2N buffer (linear interpolation)
    m = jnp.arange(2 * n)
    pos = f * m
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0

    def at(i):
        return jnp.where(i < n, x[jnp.clip(i, 0, n - 1)], 0.0)

    r = jnp.where(pos <= n - 1, (1.0 - frac) * at(i0) + frac * at(i0 + 1), 0.0)

    # --- stage 2: phase vocoder
    cos_m, sin_m = (jnp.asarray(a) for a in _stft_matrices(ft))
    win = jnp.asarray(_hann(ft))
    frames = framing.frame_signal(r[None], ft, hop, pad=0)[0] * win  # (Tr, ft)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cos_m.T, precision=hi)
    im = jnp.dot(frames, sin_m.T, precision=hi)
    mag = jnp.sqrt(re * re + im * im)
    ph = jnp.arctan2(im, re + 1e-12)

    t_r = frames.shape[0]
    t_out = 1 + (n - ft) // hop
    omega = 2.0 * jnp.pi * jnp.arange(ft // 2 + 1) / ft * hop  # per-hop advance

    j = jnp.arange(t_out)
    a_pos = j / f
    ia = jnp.clip(jnp.floor(a_pos).astype(jnp.int32), 0, t_r - 2)
    fa = jnp.clip(a_pos - ia, 0.0, 1.0)
    mag_j = (1.0 - fa)[:, None] * mag[ia] + fa[:, None] * mag[ia + 1]
    dphi = _wrap_pi(ph[ia + 1] - ph[ia] - omega[None, :]) + omega[None, :]

    def acc(phi, d):
        phi = phi + d
        return phi, phi

    _, phases = jax.lax.scan(acc, ph[0] - dphi[0], dphi)

    out_re = mag_j * jnp.cos(phases)
    out_im = mag_j * jnp.sin(phases)

    # --- stage 3: inverse STFT (mirror folded into the GEMM weights)
    # full-spectrum irfft as GEMM: y_frame = (re @ Cinv + im @ Sinv)
    half = ft // 2 + 1
    scale = np.full((half,), 2.0 / ft, np.float32)
    scale[0] = 1.0 / ft
    scale[-1] = 1.0 / ft
    cinv = jnp.asarray((_stft_matrices(ft)[0] * scale[:, None]))
    sinv = jnp.asarray((_stft_matrices(ft)[1] * scale[:, None]))
    frames_td = (
        jnp.dot(out_re, cinv, precision=hi) + jnp.dot(out_im, sinv, precision=hi)
    ) * win
    y = framing.overlap_add(frames_td[None], hop)[0]
    env = framing.overlap_add(jnp.broadcast_to(win * win, frames_td.shape)[None], hop)[0]
    y = y / jnp.maximum(env, 1e-6)
    return y[:n] if y.shape[-1] >= n else jnp.pad(y, (0, n - y.shape[-1]))
