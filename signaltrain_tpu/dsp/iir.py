"""IIR filtering primitives, TPU-native.

The reference leans on scipy (butter/lfilter/lfilter_zi, audio.py:348-371,
610-625) and a numba-compiled switched one-pole smoother (audio.py:380-426).
Those are inherently sequential per-sample recursions; on TPU we express them
as `lax.scan` with a small unroll factor and vmap across the batch, so each
scan step is one fused VPU op over hundreds of lanes (SURVEY.md §7 hard
parts). Filter *design* (butterworth coefficients) is implemented in closed
form with jnp so per-example knob values can be traced and vmapped.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def butter_lowpass(order: int, wn):
    """Digital Butterworth low-pass design, scipy-compatible.

    order: static int; wn: cutoff normalized to Nyquist (0 < wn < 1), may be
    a traced scalar. Returns (b, a) with a[0] == 1, each length order+1.

    Implements the standard pipeline (analog prototype -> frequency pre-warp
    -> bilinear transform with the fs=2 convention scipy uses) so results
    match scipy.signal.butter(order, wn, 'low') to float tolerance.

    Written entirely in REAL arithmetic (conjugate pole pairs combined into
    quadratic factors): this TPU backend implements no complex ops, and the
    design must trace/vmap on device since cutoffs are per-example knobs.
    """
    # Analog prototype pole angles, left half-plane (static numpy).
    m = np.arange(-order + 1, order, 2)
    theta = np.pi * m / (2 * order)  # pole = -exp(1j*theta) = warped*(-cos t, -sin t)
    fs2 = 4.0  # 2 * fs with scipy's fs=2 convention
    warped = fs2 * jnp.tan(jnp.pi * wn / 2.0)

    # Denominator: product of real linear/quadratic factors from digital
    # poles pd = (fs2 + p) / (fs2 - p), p = warped * (-cos t - i sin t).
    # Also accumulate prod(fs2 - p) (real by conjugate symmetry) for the gain.
    a = jnp.ones(1)
    prod_fs2_minus_p = jnp.asarray(1.0)
    for t in theta:
        if abs(np.sin(t)) < 1e-12:  # real pole (odd order)
            pr = -np.cos(t) * warped
            pd = (fs2 + pr) / (fs2 - pr)
            a = _polymul(a, jnp.stack([jnp.asarray(1.0), -pd]))
            prod_fs2_minus_p = prod_fs2_minus_p * (fs2 - pr)
        elif t > 0:  # take each conjugate pair once (partner has theta = -t)
            pr = -np.cos(t) * warped  # Re(p)
            pi = -np.sin(t) * warped  # Im(p); partner is (pr, -pi)
            # digital pole pd = ((fs2+pr) + i pi) / ((fs2-pr) - i pi)
            den = (fs2 - pr) ** 2 + pi**2
            pd_re = ((fs2 + pr) * (fs2 - pr) - pi**2) / den
            pd_abs2 = ((fs2 + pr) ** 2 + pi**2) / den
            quad = jnp.stack([jnp.asarray(1.0), -2.0 * pd_re, pd_abs2])
            a = _polymul(a, quad)
            prod_fs2_minus_p = prod_fs2_minus_p * den
    kd = warped**order / prod_fs2_minus_p

    # Numerator: kd * (z + 1)^order  (binomial coefficients, static)
    binom = np.array([math.comb(order, k) for k in range(order + 1)], dtype=np.float64)
    b = kd * jnp.asarray(binom)
    return b, a


def _polymul(p, q):
    """Polynomial product (highest-degree-first coefficient vectors)."""
    n, m = p.shape[0], q.shape[0]
    out = jnp.zeros(n + m - 1, dtype=jnp.result_type(p, q))
    for i in range(m):
        out = out.at[i : i + n].add(q[i] * p)
    return out


def lfilter_zi(b, a):
    """Initial conditions for step-response steady state, scipy-compatible
    (scipy.signal.lfilter_zi): solves (I - A^T) zi = B for the direct-form-II
    transposed companion system. Static order, jittable."""
    n = b.shape[0] - 1
    # Companion matrix of the denominator
    eye = jnp.eye(n, dtype=b.dtype)
    comp_top = -a[1:][None, :]
    comp_rest = jnp.concatenate([jnp.eye(n - 1, dtype=b.dtype),
                                 jnp.zeros((n - 1, 1), dtype=b.dtype)], axis=1) \
        if n > 1 else jnp.zeros((0, n), dtype=b.dtype)
    companion = jnp.concatenate([comp_top, comp_rest], axis=0)
    iminus = eye - companion.T
    bvec = b[1:] - a[1:] * b[0]
    zi_first = jnp.sum(bvec) / jnp.sum(iminus[:, 0])
    # scipy solves the full system; reproduce it exactly:
    zi = jnp.linalg.solve(iminus, bvec)
    del zi_first
    return zi


@functools.partial(jax.jit, static_argnames=("unroll",))
def lfilter(b, a, x, zi=None, unroll: int = 8):
    """Apply an IIR filter along the last axis (direct form II transposed).

    Matches scipy.signal.lfilter(b, a, x, zi=zi). x: (..., N). zi: (..., order)
    or None for zero initial state. Returns y only (the final state is not
    normally needed by callers here).

    lax.scan over samples; vmap over any leading axes happens naturally since
    b, a, zi broadcast. unroll trades compile time for fewer scan iterations.
    """
    order = b.shape[-1] - 1
    if zi is None:
        zi = jnp.zeros(x.shape[:-1] + (order,), x.dtype)

    b = b / a[..., :1]
    a = a / a[..., :1]

    def step(z, xn):
        y = b[..., 0] * xn + z[..., 0]
        znew = [
            b[..., i + 1] * xn + (z[..., i + 1] if i + 1 < order else 0.0) - a[..., i + 1] * y
            for i in range(order)
        ]
        return jnp.stack(znew, axis=-1), y

    x_t = jnp.moveaxis(x, -1, 0)
    _, y_t = jax.lax.scan(step, zi, x_t, unroll=unroll)
    return jnp.moveaxis(y_t, 0, -1)


@functools.partial(jax.jit, static_argnames=("unroll",))
def switched_one_pole(g, alpha_a, alpha_r, unroll: int = 16):
    """The compressor's attack/release envelope smoother.

    s[0] = 0;  for n >= 1:
        alpha = alpha_a if g[n] < s[n-1] else alpha_r
        s[n] = (1-alpha)*g[n] + alpha*s[n-1]

    Exactly the sequential loop of the reference's numba kernel
    (audio.py:415-420), including s[0] staying 0. g: (..., N); alpha_*
    broadcastable scalars/leading-shapes. Returns s with g's shape.

    The switch makes the recursion non-associative, so an (exact) parallel
    scan is unavailable; lax.scan + batch vmap keeps the VPU lanes full.
    """
    g_t = jnp.moveaxis(g, -1, 0)

    def step(prev, gn):
        alpha = jnp.where(gn < prev, alpha_a, alpha_r)
        new = (1.0 - alpha) * gn + alpha * prev
        return new, new

    init = jnp.zeros_like(g_t[0])
    _, s_t = jax.lax.scan(step, init, g_t[1:], unroll=unroll)
    s = jnp.concatenate([init[None], s_t], axis=0)
    return jnp.moveaxis(s, 0, -1)
