"""Synthetic test-signal generators, fully on-device.

Port of the *distributions* of the reference's synthesizer zoo
(audio.py:84-335) to explicit-key jax.random: every generator is jittable,
vmappable and shape-static, so a whole training batch of inputs is
synthesized inside the jitted train step — no host dataloader
(SURVEY.md §5 "distributed backend": on-device data synthesis replaces the
10 CPU workers).

Exact RNG streams cannot match numpy's, so parity is distributional; the
deterministic envelopes (amp staircase, sweep law, box/triangle shapes) match
the reference formulas exactly.

Randomized-index quirks of the reference are reproduced where visible (e.g.
box leaves a one-sample gap at i_up-1 at the pre-step level; spikes'
location arithmetic truncates toward zero).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pinknoise", "randsine", "box", "expdecay", "pluck", "ampexpstepup",
    "sweep", "spikes", "triangle", "synth_input_sample", "random_ends",
    "normish", "DEFAULT_CHOOSERS",
]

# chooser set used when synthesizing compressor training data
# (datasets.py:317)
DEFAULT_CHOOSERS = (0, 1, 2, 4, 6, 7)


def random_ends(key, shape=()):
    """Beta(0.8, 0.8) — emphasizes knob-range boundaries (audio.py:20-21)."""
    return jax.random.beta(key, 0.8, 0.8, shape)


def _u(key, shape=()):
    return jax.random.uniform(key, shape)


def normish(key, y, amp_range=(0.6, 0.9)):
    """Normalize then rescale to a random amplitude in amp_range
    (audio.py:75-81)."""
    lo, hi = amp_range
    amp = (hi - lo) * _u(key) + lo
    return y / jnp.max(jnp.abs(y)) * amp


def _irfft_cos_matrix(n: int):
    """Half-spectrum inverse-rFFT cosine matrix, (n//2+1, n//2+1), computed
    IN-GRAPH.

    This TPU backend implements no FFT, so the reference's
    np.fft.irfft(real_spectrum) (audio.py:93) becomes one MXU GEMM:
        y[m] = (1/n) * [c0 + 2*sum_{k=1}^{n/2-1} c_k cos(2 pi k m / n)
                        + c_{n/2} cos(pi m)]
    The output of an irfft of a REAL spectrum is even-symmetric, so only
    m = 0..n/2 is computed and the rest is mirrored — half the FLOPs.

    The table is recomputed on device per call (cheap VPU work, ~0.1 ms at
    the flagship size) instead of being captured as a constant: an HLO
    constant of this size (67 MB at chunk 8192, 268 MB at --scale 2) blows
    past the remote compiler's request limit in this environment and bloats
    every executable. XLA CSEs the duplicate subgraphs across call sites.

    The modular reduction (k*m mod n) runs in int32 with a split-product so
    the cos argument stays exact for n beyond 2^12 (k*m overflows the f32
    integer range at n >= 8192; the split keeps every intermediate < 2^31
    for n up to ~2^23).
    """
    nf = n // 2 + 1
    k = jnp.arange(nf, dtype=jnp.int32)[:, None]
    m = jnp.arange(nf, dtype=jnp.int32)[None, :]
    m_hi, m_lo = m // 256, m % 256
    t1 = (k * m_hi) % n
    prod_mod = (t1 * 256 + k * m_lo) % n
    mat = 2.0 * jnp.cos(2.0 * jnp.pi / n * prod_mod.astype(jnp.float32)) / n
    mat = mat.at[0, :].mul(0.5)
    mat = mat.at[-1, :].mul(0.5)
    return mat


def irfft_cos_matrix_host(n: int):
    """Host-side (numpy) twin of _irfft_cos_matrix, for callers running the
    synth branches on CPU (gen_dataset's host backend): computing the table
    in-graph is ~0.1 ms of VPU work on TPU but ~35 ms per call of scalar cos
    on a host core — build it once here and pass via cos_mat instead.
    int64 products need no modular split."""
    nf = n // 2 + 1
    k = np.arange(nf, dtype=np.int64)[:, None]
    m = np.arange(nf, dtype=np.int64)[None, :]
    mat = 2.0 * np.cos(2.0 * np.pi / n * ((k * m) % n)) / n
    mat[0, :] *= 0.5
    mat[-1, :] *= 0.5
    return mat.astype(np.float32)


def pinknoise(key, n: int, precision=None, cos_mat=None):
    """1/f noise: inverse rFFT of a 1/sqrt(f)-shaped uniform spectrum
    (audio.py:85-94), via cosine GEMM (no FFT on TPU). n must be even.

    precision=None uses the fast default GEMM passes (noise does not need
    them exact); tests pass Precision.HIGHEST to compare against np.fft."""
    n_f = n // 2 + 1
    noise = 2.0 * _u(key, (n_f,)) - 1.0
    s = jnp.sqrt(jnp.arange(n_f) + 1.0)
    mat = cos_mat if cos_mat is not None else _irfft_cos_matrix(n)
    shaped = noise / s
    if mat.dtype == jnp.bfloat16:
        # keep the GEMM natively bf16 x bf16 -> f32 (a mixed f32/bf16 dot
        # would upcast the 67 MB table back to f32 in HBM)
        shaped = shaped.astype(jnp.bfloat16)
    y_half = jnp.dot(
        shaped,
        mat,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    y = jnp.concatenate([y_half, y_half[1:-1][::-1]])
    return y / jnp.max(jnp.abs(y))


def randsine(key, t, amp_range=(0.2, 0.9), freq_range=(5.0, 150.0),
             max_tones: int = 2, t0_fac=None):
    """1-2 random cosines (audio.py:96-104)."""
    k_n, k_norm, k_tones = jax.random.split(key, 3)
    n_tones = jax.random.randint(k_tones, (), 1, max_tones + 1)
    y = jnp.zeros_like(t)
    for i in range(max_tones):
        ka, kf, kt = jax.random.split(jax.random.fold_in(k_n, i), 3)
        amp = amp_range[0] + (amp_range[1] - amp_range[0]) * _u(ka)
        freq = freq_range[0] + (freq_range[1] - freq_range[0]) * _u(kf)
        t0 = _u(kt) * t[-1] if t0_fac is None else t0_fac * t[-1]
        y = y + jnp.where(i < n_tones, amp * jnp.cos(freq * (t - t0)), 0.0)
    return normish(k_norm, y)


def box(key, t, t0_fac=None):
    """Step-response box (audio.py:106-122, delta=0 path). Reproduces the
    reference's one-sample gap: index i_up-1 keeps the end level."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    h_bgn = 0.15 * _u(k1)
    h_mid = 0.35 * _u(k2) + 0.6
    h_end = 0.2 * _u(k3) + 0.1
    maxi = t.shape[0]
    i_up = (
        (0.3 * _u(k4) * maxi).astype(jnp.int32)
        if t0_fac is None
        else jnp.asarray(int(t0_fac * maxi), jnp.int32)
    )
    i_dn = jnp.minimum(
        i_up + ((0.3 + 0.35 * _u(k5)) * maxi).astype(jnp.int32), maxi - 1
    )
    n = jnp.arange(maxi)
    x = jnp.full((maxi,), h_end, dtype=t.dtype)
    x = jnp.where(n < i_up - 1, h_bgn, x)
    x = jnp.where((n >= i_up) & (n < i_dn), h_mid, x)
    return x


def expdecay(key, t, t0_fac=None, high_fac=None, low_fac=None):
    """Exponential decay envelope (audio.py:124-134)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t0 = 0.35 * _u(k1) * t[-1] if t0_fac is None else t0_fac * t[-1]
    h_high = 0.35 * _u(k2) + 0.6 if high_fac is None else high_fac
    h_low = 0.1 * _u(k3) + 0.1 if low_fac is None else low_fac
    decay = 12.0 * _u(k4)
    x = jnp.exp(-decay * (t - t0)) * h_high
    return jnp.where(t < t0, h_low, x)


def pluck(key, t, freq_range=(50.0, 6400.0), max_tones: int = 3, t0_fac=None):
    """Plucked-string-ish decaying sines (audio.py:136-146)."""
    k_n, k_env, k_norm, k_tones = jax.random.split(key, 4)
    n_tones = jax.random.randint(k_tones, (), 1, max_tones + 1)
    y = jnp.zeros_like(t)
    for i in range(max_tones):
        ka, ks, kt, kf = jax.random.split(jax.random.fold_in(k_n, i), 4)
        amp0 = (0.45 * _u(ka) + 0.5) * jnp.sign(jax.random.rademacher(ks, ()))
        t0 = (2.0 * _u(kt) - 1.0) * 0.3 * t[-1] if t0_fac is None else t0_fac * t[-1]
        freq = freq_range[0] + (freq_range[1] - freq_range[0]) * _u(kf)
        y = y + jnp.where(i < n_tones, amp0 * jnp.sin(freq * (t - t0)), 0.0)
    y = y * expdecay(k_env, t, t0_fac=t0_fac)
    return normish(k_norm, y)


def ampexpstepup(key, t, freq=None, freq_range=(400.0, 5000.0), start_db=-40.0):
    """Sine under a 1 dB-stepped amplitude staircase — the AES-6849
    compressor test signal (audio.py:149-161)."""
    k_f, k_norm = jax.random.split(key)
    n = t.shape[0]
    env_db = jnp.floor(jnp.linspace(start_db, 0.0, n))
    env = jnp.power(10.0, env_db / 10.0)
    if freq is None:
        freq = freq_range[0] + (freq_range[1] - freq_range[0]) * _u(k_f)
    return normish(k_norm, env * jnp.sin(freq * t))


def sweep(key, t, freq_range=(20.0, 20000.0), amp=None, amp_too=False):
    """Exponential frequency sweep (audio.py:164-173). amp_too may be a
    traced bool."""
    k_a, k_norm = jax.random.split(key)
    tmax = t[-1]
    lnfr = jnp.log(freq_range[1] / freq_range[0])
    amp = 0.9 * _u(k_a) if amp is None else amp
    y = amp * jnp.sin(20.0 * 2.0 * jnp.pi * tmax / lnfr * (jnp.exp(t / tmax * lnfr) - 1.0))
    y = jnp.where(amp_too, y * jnp.exp(lnfr * t / tmax), y)
    return normish(k_norm, y)


def spikes(key, t, n_spikes: int = 50):
    """Random spikes plus gaussian noise (audio.py:175-186).

    The reference writes the 50 spikes sequentially; here they scatter in one
    shot (collision resolution differs only when two spikes land on the same
    sample).
    """
    k_loc, k_h, k_amp, k_noise = jax.random.split(key, 4)
    n = t.shape[0]
    # loc = int(int(u*n - 2) + t[-1]): truncation toward zero twice.
    u = _u(k_loc, (n_spikes,))
    inner = jnp.trunc(u * n - 2.0)
    loc = jnp.trunc(inner + t[-1]).astype(jnp.int32)
    height = (2.0 * _u(k_h, (n_spikes,)) - 1.0) * 0.7

    x = jnp.zeros((n,), t.dtype)
    x = x.at[loc % n].set(height)
    x = x.at[(loc + 1) % n].set(height / 2.0)
    x = x.at[(loc - 1) % n].set(height / 2.0)
    amp_n = 0.1 * _u(k_amp)
    return x + amp_n * jax.random.normal(k_noise, (n,))


def triangle(key, t, t0_fac=None, cos_mat=None):
    """Ramp up then down, plus pink noise (audio.py:188-196)."""
    k_h, k_s, k_w, k_t, k_a, k_p = jax.random.split(key, 6)
    height = (0.4 * _u(k_h) + 0.4) * jnp.sign(jax.random.rademacher(k_s, ()))
    width = _u(k_w) / 4.0 * t[-1]
    t0 = 2.0 * width + 0.4 * _u(k_t) * t[-1] if t0_fac is None else t0_fac * t[-1]
    x = height * (1.0 - jnp.abs(t - t0) / width)
    x = jnp.where((t < t0 - width) | (t > t0 + width), 0.0, x)
    amp_n = 0.1 * _u(k_a) + 0.02
    return x + amp_n * pinknoise(k_p, t.shape[0], cos_mat=cos_mat)


def _branch_fn(chooser: int, t, t0_fac=None, cos_mat=None):
    """The body of synth branch `chooser` (audio.py:303-331) as f(key) -> (N,).

    Shared by the traced-chooser switch (synth_input_sample) and the
    stratified batch generator (stratified_synth_batch), which avoids
    executing every branch for every example.
    """
    n = t.shape[0]

    def c0(k):
        return randsine(k, t, t0_fac=t0_fac)

    def c1(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        return (
            randsine(k1, t, t0_fac=t0_fac)
            + 0.2 * _u(k2) * pinknoise(k3, n, cos_mat=cos_mat)
            + 0.2 * _u(k4) * (2.0 * _u(k5, (n,)) - 1.0)
        )

    def c2(k):
        return pluck(k, t, t0_fac=t0_fac)

    def c3(k):
        return triangle(k, t, t0_fac=t0_fac, cos_mat=cos_mat)

    def c4(k):
        return box(k, t, t0_fac=t0_fac)

    def c5(k):
        return spikes(k, t)

    def c6(k):
        k1, k2 = jax.random.split(k)
        return box(k1, t, t0_fac=t0_fac) * (2.0 * _u(k2, (n,)) - 1.0)

    def c7(k):
        k1, k2, k3 = jax.random.split(k, 3)
        amp_n = 0.3 * _u(k2) + 0.1
        return pluck(k1, t, t0_fac=t0_fac) + amp_n * pinknoise(k3, n, cos_mat=cos_mat)

    def c8(k):
        return ampexpstepup(k, t, start_db=-30.0)

    def c9(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        f_low = jax.random.randint(k1, (), 20, 1000).astype(t.dtype)
        f_high = jax.random.randint(k2, (), 1000, 20000).astype(t.dtype)
        amp_too = jax.random.randint(k3, (), 0, 3) == 2  # [F, F, T] choice
        return sweep(k4, t, freq_range=(f_low, f_high), amp_too=amp_too)

    def c10(k):
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        return (
            box(k1, t)
            + 0.2 * _u(k2) * (2.0 * _u(k3, (n,)) - 1.0)
            + 0.2 * _u(k4) * pinknoise(k5, n, cos_mat=cos_mat)
        )

    def c11(k):
        k1, k2 = jax.random.split(k)
        amp_n = 0.6 * _u(k1) + 0.2
        return amp_n * pinknoise(k2, n, cos_mat=cos_mat)

    return [c0, c1, c2, c3, c4, c5, c6, c7, c8, c9, c10, c11][chooser]


def _finish(key, y, n):
    """Global random polarity flip + tiny noise floor (audio.py:334)."""
    k_sign, k_eps = jax.random.split(key)
    sign = jnp.sign(jax.random.rademacher(k_sign, ())).astype(y.dtype)
    return y * sign + _u(k_eps, (n,)) * 1e-8


def synth_input_sample(key, t, chooser, t0_fac=None, branch_set=None, cos_mat=None):
    """12-way synthetic input chooser (audio.py:296-334).

    chooser may be a traced int (lax.switch over equal-shape branches) so the
    per-example choice lives inside the jitted train step. When branch_set is
    given (a static tuple of chooser ids), only those branches are traced and
    `chooser` indexes INTO branch_set — 2-6x smaller graphs when the caller
    restricts the set (training uses 6 of the 12, datasets.py:317).
    """
    k_branch, k_finish = jax.random.split(key)
    n = t.shape[0]
    ids = tuple(range(12)) if branch_set is None else tuple(branch_set)
    branches = [_branch_fn(c, t, t0_fac, cos_mat=cos_mat) for c in ids]
    y = jax.lax.switch(jnp.asarray(chooser, jnp.int32), branches, k_branch)
    return _finish(k_finish, y, n)


def stratified_synth_batch(key, t, choosers=DEFAULT_CHOOSERS, batch: int = 1,
                           cos_mat=None):
    """Synthesize a batch with EXACTLY-even chooser coverage, one vmap per
    branch — each branch computes only its share of the batch (~6x cheaper
    than vmapping a 6-way switch, which evaluates every branch for every
    example). A random permutation restores exchangeability; per-batch
    chooser counts are deterministic instead of multinomial, which is the
    only departure from the reference's sampler (datasets.py:317).
    """
    n_br = len(choosers)
    k_perm, k_gen = jax.random.split(key)
    keys = jax.random.split(k_gen, batch)
    counts = [batch // n_br + (1 if i < batch % n_br else 0) for i in range(n_br)]
    parts, start = [], 0
    for c, cnt in zip(choosers, counts):
        if cnt == 0:
            continue
        fn = _branch_fn(c, t, cos_mat=cos_mat)
        sub = keys[start : start + cnt]
        ys = jax.vmap(lambda k: _finish(
            jax.random.split(k)[1], fn(jax.random.split(k)[0]), t.shape[0]
        ))(sub)
        parts.append(ys)
        start += cnt
    x = jnp.concatenate(parts, axis=0)
    perm = jax.random.permutation(k_perm, batch)
    return x[perm]


def choose_from(key, choices: Sequence[int]):
    """Uniformly pick a static chooser id from a set (datasets.py:317)."""
    idx = jax.random.randint(key, (), 0, len(choices))
    return jnp.asarray(list(choices))[idx]


def music_like_clip(duration_s: float = 180.0, sr: int = 44100,
                    seed: int = 0) -> "np.ndarray":
    """Deterministic multi-minute music-like test signal — the role the
    reference's demo Leadfoot clip plays for predict_long evaluation
    (README.md:144, BASELINE config 5): a bass line, plucked pentatonic
    melody with exponential decays, sustained chord pads and percussive
    noise bursts on a 110 bpm grid. Pure numpy (host-side test asset, not
    part of the device data path); peak-normalized to ~0.5.
    """
    import numpy as _np

    rng = _np.random.default_rng(seed)
    n = int(duration_s * sr)
    t = _np.arange(n, dtype=_np.float64) / sr
    out = _np.zeros(n, _np.float64)

    beat = 60.0 / 110.0
    penta = 220.0 * 2.0 ** (_np.array([0, 3, 5, 7, 10, 12]) / 12.0)

    # bass: root notes per bar, slight detune chorus
    bar = 4 * beat
    for b in range(int(duration_s / bar) + 1):
        f = float(penta[rng.integers(0, 3)]) / 2.0
        s, e = int(b * bar * sr), min(int((b + 1) * bar * sr), n)
        tt = t[s:e] - t[s] if e > s else None
        if tt is None:
            continue
        env = _np.minimum(tt / 0.02, 1.0) * _np.exp(-tt / (bar * 0.9))
        out[s:e] += 0.35 * env * (
            _np.sin(2 * _np.pi * f * tt) + 0.3 * _np.sin(2 * _np.pi * 2.003 * f * tt)
        )

    # melody: plucked notes on eighth notes, random rests
    eighth = beat / 2.0
    for k in range(int(duration_s / eighth)):
        if rng.random() < 0.35:
            continue
        f = float(penta[rng.integers(0, len(penta))])
        s = int(k * eighth * sr)
        dur = int(min(4 * eighth, duration_s - k * eighth) * sr)
        if dur <= 0 or s >= n:
            continue
        tt = t[s : s + dur] - t[s]
        pluck = _np.exp(-tt / 0.25) * (
            _np.sin(2 * _np.pi * f * tt)
            + 0.5 * _np.sin(2 * _np.pi * 2 * f * tt)
            + 0.25 * _np.sin(2 * _np.pi * 3 * f * tt)
        )
        out[s : s + dur] += 0.25 * pluck

    # percussion: noise bursts on beats (hat-like), heavier every 4th (kick-ish)
    for k in range(int(duration_s / beat)):
        s = int(k * beat * sr)
        dur = min(int(0.05 * sr), n - s)
        if dur <= 0:
            continue
        tt = t[s : s + dur] - t[s]
        burst = rng.standard_normal(dur) * _np.exp(-tt / 0.008)
        out[s : s + dur] += (0.22 if k % 4 == 0 else 0.08) * burst
        if k % 4 == 0:  # kick: 60 Hz thump
            out[s : s + dur] += 0.3 * _np.exp(-tt / 0.05) * _np.sin(2 * _np.pi * 60 * tt)

    out = 0.5 * out / _np.max(_np.abs(out))
    return out.astype(_np.float32)
