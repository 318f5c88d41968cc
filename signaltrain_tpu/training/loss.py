"""Loss functions (reference: signaltrain/loss_functions.py).

calc_loss = logcosh(y_hat, y) + L1 regularization on the predicted magnitude
spectrogram, optionally frequency-weighted by exp(7/n_bins * bin) — ~30 dB of
extra damping across the band (train.py:115-117) — with lambda/10 in the
weighted case (loss_functions.py:26-43). Everything is computed in fp32 even
under a bf16 compute policy.
"""

from __future__ import annotations

import jax.numpy as jnp


def logcosh(y_hat, y):
    """mean(log(cosh(y - y_hat))), numerically stable for large residuals:
    log cosh z = |z| + log1p(exp(-2|z|)) - log 2."""
    z = jnp.abs(y.astype(jnp.float32) - y_hat.astype(jnp.float32))
    return jnp.mean(z + jnp.log1p(jnp.exp(-2.0 * z)) - jnp.log(2.0))


def mse(x, x_hat):
    return jnp.mean((x - x_hat) ** 2)


def mae(x, x_hat):
    return jnp.mean(jnp.abs(x - x_hat))


def freq_scale(n_bins: int):
    """exp(7/n_bins * arange(n_bins)): the spectral L1 weighting LUT
    (train.py:115-117)."""
    expfac = 7.0 / n_bins
    return jnp.exp(expfac * jnp.arange(n_bins, dtype=jnp.float32))


def calc_loss(y_hat, y, mag_hat, scale_by_freq=None, l1_lambda: float = 2e-5):
    """Reconstruction + spectral-L1 regularization (loss_functions.py:26-43)."""
    rec = logcosh(y_hat, y)
    mag_hat = mag_hat.astype(jnp.float32)
    if scale_by_freq is None:
        return rec + l1_lambda * jnp.mean(jnp.abs(mag_hat))
    return rec + (l1_lambda / 10.0) * jnp.mean(jnp.abs(mag_hat * scale_by_freq))
