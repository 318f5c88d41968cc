"""Dynamic-range compressor kernels, jittable/vmappable.

The flagship DSP of the framework: the reference's numba-JIT kernels
(audio.py:348-426) re-expressed for TPU. All static characteristics
(dB detection, gain curve) are elementwise VPU work; the sequential
attack/release envelope rides dsp.iir.switched_one_pole (lax.scan).

These functions take scalar knob values (traced OK) and a 1-D signal; batch
them with jax.vmap — during training the whole batch's effects run inside the
jitted train step, replacing the reference's 10 CPU dataloader workers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import iir

LOG10 = 2.302585092994046


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _per_example(k, x):
    """Broadcast a knob value against x (..., N): scalars pass through;
    per-example vectors get a trailing singleton axis."""
    k = jnp.asarray(k)
    if k.ndim == 0:
        return k
    return k.reshape(x.shape[:-1] + (1,))


def _smooth(g, alpha_a, alpha_r):
    """Dispatch the switched one-pole smoother: Pallas kernel on TPU
    (~30x faster than the scan, and the scan's huge unrolled graphs also
    compile pathologically slowly on this backend), lax.scan elsewhere.
    pallas_kernels.FORCE_INTERPRET routes CPU tests through the real kernel
    in the Pallas interpreter."""
    from ..ops import pallas_kernels

    if g.ndim in (1, 2) and (_on_tpu() or pallas_kernels.FORCE_INTERPRET):
        g2 = g[None, :] if g.ndim == 1 else g
        b = g2.shape[0]
        aa = jnp.broadcast_to(jnp.asarray(alpha_a).reshape(-1), (b,))
        ar = jnp.broadcast_to(jnp.asarray(alpha_r).reshape(-1), (b,))
        out = pallas_kernels.switched_one_pole_batched(g2, aa, ar)
        return out[0] if g.ndim == 1 else out
    a_a = jnp.asarray(alpha_a)
    a_r = jnp.asarray(alpha_r)
    if a_a.ndim:  # drop the trailing knob axis for the scan carry
        a_a, a_r = a_a.reshape(g.shape[:-1]), a_r.reshape(g.shape[:-1])
    return iir.switched_one_pole(g, a_a, a_r)


def compressor_4controls(
    x: jnp.ndarray,
    thresh=-24.0,
    ratio=2.0,
    attack_time=0.01,
    release_time=0.01,
    sr: float = 44100.0,
) -> jnp.ndarray:
    """4-knob feed-forward compressor (Tarr, Hack Audio p.428).

    Semantics of the reference kernel (audio.py:380-426):
      x_dB  = max(20*log10(|x| + 1e-8), -96)
      gc_dB = thresh + (x_dB - thresh)/ratio - x_dB   where x_dB > thresh else 0
      env   = switched one-pole smoothing of gc_dB with
              alpha_{a,r} = exp(-ln 9 / (sr * t_{attack,release})), env[0]=0
      y     = x * 10^(env/20)

    x may be (N,) or batched (B, N); knob values may be scalars or (B,)
    per-example vectors (the fused-training data path).
    """
    thresh = _per_example(thresh, x)
    ratio = _per_example(ratio, x)
    attack_time = _per_example(attack_time, x)
    release_time = _per_example(release_time, x)
    alpha_a = jnp.exp(-jnp.log(9.0) / (sr * attack_time))
    alpha_r = jnp.exp(-jnp.log(9.0) / (sr * release_time))

    x_db = 20.0 * jnp.log10(jnp.abs(x) + 1e-8)
    x_db = jnp.maximum(x_db, -96.0)
    gain_change_db = jnp.where(
        x_db > thresh, thresh + (x_db - thresh) / ratio - x_db, 0.0
    )
    env = _smooth(gain_change_db, alpha_a, alpha_r)
    return jnp.power(10.0, env / 20.0) * x


def compressor(
    x: jnp.ndarray,
    thresh=-24.0,
    ratio=2.0,
    attackrel=0.045,
    sr: float = 44100.0,
) -> jnp.ndarray:
    """3-knob compressor with a one-pole-butterworth dB envelope
    (audio.py:348-371): the envelope filter cutoff is 1/attack_samples
    (normalized to Nyquist), lfilter seeded with zi * dB[0].

    Accepts (N,) or batched (B, N) signals with scalar or (B,) knobs."""
    thresh = _per_example(thresh, x)
    ratio = _per_example(ratio, x)
    fc = 1.0 / (jnp.asarray(attackrel) * sr)
    if fc.ndim:
        b, a = jax.vmap(lambda w: iir.butter_lowpass(1, w))(fc.reshape(-1))
    else:
        b, a = iir.butter_lowpass(1, fc)

    db = 20.0 * jnp.log10(jnp.abs(x) + 1e-6)
    # order-1 steady-state initial condition (scipy lfilter_zi closed form)
    zi = (b[..., 1] - a[..., 1] * b[..., 0]) / (1.0 + a[..., 1])
    in_env = iir.lfilter(b, a, db, zi=(zi * db[..., 0])[..., None])
    out_env = jnp.where(in_env > thresh, thresh + (in_env - thresh) / ratio, in_env)
    gain = jnp.power(10.0, (out_env - in_env) / 20.0)
    return x * gain


def mu_compand(y, mu: float = 32.0):
    """mu-law companding (audio.py:339-340)."""
    return jnp.sign(y) * jnp.log1p(mu * jnp.abs(y)) / jnp.log1p(mu)


def mu_decompand(y, mu: float = 32.0):
    """Inverse mu-law (audio.py:343-344)."""
    return jnp.sign(y) / mu * (jnp.power(1.0 + mu, jnp.abs(y)) - 1.0)


@functools.partial(jax.jit, static_argnames=("max_echoes",))
def echo(x: jnp.ndarray, delay_samples=1487.0, ratio=0.6, echoes=1.0, max_echoes: int = 4):
    """Delay/echo effect (audio.py:430-443) with fractional-delay blending.

    delay_samples and echoes may be traced scalars; echoes is rounded and
    masked against the static max_echoes bound (the reference's Echo plugin
    pins echoes to 2, audio.py:545).
    """
    n = x.shape[-1]
    y = x
    n_echo = jnp.round(echoes)
    idx = jnp.arange(n)
    for i in range(max_echoes):
        ip1 = i + 1
        delay_len = ip1 * delay_samples
        d_int = jnp.floor(delay_len).astype(jnp.int32)
        diff = delay_len - d_int

        def shift(d):
            src = idx - d
            return jnp.where(src >= 0, x[..., jnp.clip(src, 0, n - 1)], 0.0)

        x_delayed = (1.0 - diff) * shift(d_int) + diff * shift(d_int + 1)
        active = ip1 <= n_echo
        y = y + jnp.where(active, jnp.power(ratio, 1.0 * ip1), 0.0) * x_delayed
    return y
