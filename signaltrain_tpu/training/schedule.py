"""1cycle learning-rate / momentum schedule (reference:
signaltrain/learningrate.py:14-52, fast.ai-style).

Two forms of the same schedule:

* one_cycle_lut(...): numpy look-up tables, byte-for-byte the reference's
  construction (cosine ramp to lr_max over the first 30% of iterations,
  cosine anneal to lr_start/100 after; momentum counter-cycled 0.95->0.85->0.95).
* one_cycle_fn(...): a closed-form jnp function of the step counter for use
  as an optax schedule — no host LUT indexing inside the jitted train step.

The momentum channel is cosmetic under Adam: the reference writes it into
param_groups but torch Adam ignores a 'momentum' key (SURVEY.md #12); it is
reproduced for logging parity only.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _phases(lr_max, n_data_points, epochs, batch_size):
    pct_start, div_factor = 0.3, 15.0
    lr_start = lr_max / div_factor
    lr_end = lr_start / 1e2
    n_iter = n_data_points * epochs // batch_size
    a1 = int(n_iter * pct_start)
    a2 = n_iter - a1
    return lr_start, lr_end, n_iter, a1, a2


def one_cycle_lut(lr_max=1e-3, n_data_points=8000, epochs=200, batch_size=40):
    """Numpy LUTs (lrs, moms), exactly as the reference builds them."""
    lr_start, lr_end, _, a1, a2 = _phases(lr_max, n_data_points, epochs, batch_size)
    lrs_first = (lr_max - lr_start) * (1 - np.cos(np.linspace(0, np.pi, a1))) / 2 + lr_start
    lrs_second = (lr_max - lr_end) * (1 + np.cos(np.linspace(0, np.pi, a2))) / 2 + lr_end
    lrs = np.concatenate((lrs_first, lrs_second))

    mom_min, mom_max = 0.85, 0.95
    mom_avg, mom_amp = (mom_min + mom_max) / 2, (mom_max - mom_min) / 2
    mom_first = mom_avg + mom_amp * np.cos(np.linspace(0, np.pi, a1))
    mom_second = mom_avg - mom_amp * np.cos(np.linspace(0, np.pi, a2))
    moms = np.concatenate((mom_first, mom_second))
    return lrs, moms


def one_cycle_fn(lr_max=1e-3, n_data_points=8000, epochs=200, batch_size=40):
    """Closed-form schedule fn(step) -> lr, identical to indexing the LUT
    with min(step, n_iter-1) as the train loop does (train.py:108).

    Called with a host scalar (int/float/numpy) it computes in NUMPY: the
    status-line path evaluates it ~100×/epoch, and on a relay-backed device
    each eager jnp chain + float() sync costs tens of ms — host math is
    free. Called with a traced/device value (optax schedule inside jit) it
    computes in jnp, as before."""
    lr_start, lr_end, n_iter, a1, a2 = _phases(lr_max, n_data_points, epochs, batch_size)

    def lr_at(step):
        xp = np if isinstance(step, (int, float, np.ndarray, np.generic)) else jnp
        i = xp.asarray(xp.minimum(step, n_iter - 1), dtype=xp.float32)
        # linspace(0, pi, a): element k is pi*k/(a-1)
        up = (lr_max - lr_start) * (1 - xp.cos(xp.pi * i / max(a1 - 1, 1))) / 2 + lr_start
        j = i - a1
        down = (lr_max - lr_end) * (1 + xp.cos(xp.pi * j / max(a2 - 1, 1))) / 2 + lr_end
        return xp.where(i < a1, up, down)

    return lr_at


def momentum_fn(n_data_points=8000, epochs=200, batch_size=40):
    """Closed-form momentum channel (for status-line parity)."""
    _, _, n_iter, a1, a2 = _phases(1.0, n_data_points, epochs, batch_size)
    mom_min, mom_max = 0.85, 0.95
    mom_avg, mom_amp = (mom_min + mom_max) / 2, (mom_max - mom_min) / 2

    def mom_at(step):
        # numpy for host scalars, jnp for traced values (see one_cycle_fn)
        xp = np if isinstance(step, (int, float, np.ndarray, np.generic)) else jnp
        i = xp.asarray(xp.minimum(step, n_iter - 1), dtype=xp.float32)
        up = mom_avg + mom_amp * xp.cos(xp.pi * i / max(a1 - 1, 1))
        j = i - a1
        down = mom_avg - mom_amp * xp.cos(xp.pi * j / max(a2 - 1, 1))
        return xp.where(i < a1, up, down)

    return mom_at
