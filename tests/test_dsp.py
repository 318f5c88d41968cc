"""DSP layer tests: IIR/butterworth vs scipy, compressor kernels vs
independent numpy oracles of the reference semantics, synth properties,
effect registry behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as ss

from signaltrain_tpu.dsp import compressors, effects, iir, knobs, synths
from signaltrain_tpu.dsp.pitch import pitch_shift

# ---------------------------------------------------------------- IIR


@pytest.mark.parametrize("order", [1, 2, 3, 4])
@pytest.mark.parametrize("wn", [0.0005, 0.01, 0.2, 0.7])
def test_butter_matches_scipy(order, wn):
    b, a = iir.butter_lowpass(order, wn)
    bs, as_ = ss.butter(order, wn, btype="low")
    np.testing.assert_allclose(np.asarray(b), bs, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a), as_, atol=1e-5)


def test_lfilter_matches_scipy():
    rs = np.random.RandomState(0)
    x = rs.randn(3, 500)
    b, a = ss.butter(3, 0.1)
    y = iir.lfilter(jnp.asarray(b), jnp.asarray(a), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), ss.lfilter(b, a, x, axis=-1), atol=1e-5)


def test_lfilter_zi_matches_scipy_order1():
    b, a = ss.butter(1, 0.003)
    zi = iir.lfilter_zi(jnp.asarray(b), jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(zi), ss.lfilter_zi(b, a), atol=1e-5)


# ------------------------------------------------------- compressors


def _compressor_4c_oracle(x, thresh, ratio, at, rt, sr=44100.0):
    """Independent numpy oracle of the numba kernel's documented semantics
    (audio.py:380-426)."""
    n = len(x)
    alpha_a = np.exp(-np.log(9) / (sr * at))
    alpha_r = np.exp(-np.log(9) / (sr * rt))
    x_db = np.maximum(20 * np.log10(np.abs(x) + 1e-8), -96.0)
    gc = np.where(x_db > thresh, thresh + (x_db - thresh) / ratio - x_db, 0.0)
    lin_a = np.zeros(n)
    for i in range(1, n):
        al = alpha_a if gc[i] < lin_a[i - 1] else alpha_r
        lin_a[i] = (1 - al) * gc[i] + al * lin_a[i - 1]
    return np.power(10.0, lin_a / 20.0) * x


def test_compressor_4c_matches_oracle():
    rs = np.random.RandomState(1)
    x = (rs.randn(4096) * 0.5).astype(np.float64)
    y = compressors.compressor_4controls(
        jnp.asarray(x), thresh=-20.0, ratio=3.0, attack_time=0.005, release_time=0.02
    )
    oracle = _compressor_4c_oracle(x, -20.0, 3.0, 0.005, 0.02)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-5)


def test_compressor_4c_vmapped_batch():
    rs = np.random.RandomState(2)
    x = (rs.randn(5, 2048) * 0.5).astype(np.float32)
    th = np.linspace(-30, -5, 5).astype(np.float32)
    f = jax.vmap(
        lambda xi, t: compressors.compressor_4controls(
            xi, thresh=t, ratio=4.0, attack_time=0.01, release_time=0.01
        )
    )
    y = np.asarray(f(jnp.asarray(x), jnp.asarray(th)))
    for i in range(5):
        oracle = _compressor_4c_oracle(x[i].astype(np.float64), th[i], 4.0, 0.01, 0.01)
        np.testing.assert_allclose(y[i], oracle, atol=2e-4)


def test_compressor_reduces_dynamic_range():
    # step signal: loud section must be attenuated, quiet one preserved
    x = np.concatenate([np.full(2048, 0.05), np.full(2048, 0.9)]).astype(np.float32)
    y = np.asarray(
        compressors.compressor_4controls(
            jnp.asarray(x), thresh=-20.0, ratio=4.0, attack_time=1e-3, release_time=1e-3
        )
    )
    assert np.abs(y[3000]) < 0.55  # compressed
    assert np.abs(y[1000] - 0.05) < 5e-3  # below threshold: untouched


def test_compressor_3knob_matches_scipy_oracle():
    rs = np.random.RandomState(3)
    x = (rs.randn(4096) * 0.4).astype(np.float64)
    thresh, ratio, attackrel, sr = -24.0, 2.0, 0.045, 44100.0
    y = compressors.compressor(jnp.asarray(x), thresh, ratio, attackrel, sr)

    attack = attackrel * sr
    b, a = ss.butter(1, 1.0 / attack)
    zi = ss.lfilter_zi(b, a)
    db = 20.0 * np.log10(np.abs(x) + 1e-6)
    in_env, _ = ss.lfilter(b, a, db, zi=zi * db[0])
    out_env = np.where(in_env > thresh, thresh + (in_env - thresh) / ratio, in_env)
    oracle = x * np.power(10.0, (out_env - in_env) / 20.0)
    np.testing.assert_allclose(np.asarray(y), oracle, atol=1e-4)


def test_mu_compand_roundtrip():
    x = jnp.linspace(-1, 1, 101)
    np.testing.assert_allclose(
        np.asarray(compressors.mu_decompand(compressors.mu_compand(x))),
        np.asarray(x),
        atol=1e-6,
    )


def test_echo_matches_oracle():
    rs = np.random.RandomState(4)
    x = rs.randn(2000).astype(np.float32)
    d, ratio, echoes = 400.0, 0.6, 2
    y = np.asarray(compressors.echo(jnp.asarray(x), d, ratio, float(echoes)))
    oracle = np.copy(x)
    for i in range(echoes):
        dl = (i + 1) * int(d)
        shifted = np.pad(x, (dl, 0))[:-dl]
        oracle += ratio ** (i + 1) * shifted
    np.testing.assert_allclose(y, oracle, atol=1e-5)


# ------------------------------------------------------------ synths


def test_pinknoise_matches_irfft_oracle():
    # same spectrum through our cosine GEMM vs np.fft.irfft
    key = jax.random.PRNGKey(0)
    n = 4096
    y = np.asarray(synths.pinknoise(key, n, precision=jax.lax.Precision.HIGHEST))
    noise = 2.0 * np.asarray(jax.random.uniform(key, (n // 2 + 1,))) - 1.0
    s = np.sqrt(np.arange(n // 2 + 1) + 1.0)
    oracle = np.fft.irfft(noise / s)
    oracle = oracle / np.max(np.abs(oracle))
    assert y.shape == (n,)
    np.testing.assert_allclose(y, oracle, atol=1e-4)


@pytest.mark.parametrize("chooser", list(range(12)))
def test_synth_input_sample_all_branches(chooser):
    t = jnp.arange(4096) / 44100.0
    y = synths.synth_input_sample(jax.random.PRNGKey(chooser + 7), t, chooser)
    y = np.asarray(y)
    assert y.shape == (4096,)
    assert np.all(np.isfinite(y))
    assert np.max(np.abs(y)) <= 1.5  # normish keeps things bounded-ish


def test_synth_traced_chooser_jit():
    t = jnp.arange(4096) / 44100.0
    f = jax.jit(lambda k, c: synths.synth_input_sample(k, t, c))
    y = f(jax.random.PRNGKey(0), jnp.asarray(3))
    assert np.all(np.isfinite(np.asarray(y)))


def test_random_ends_distribution():
    vals = np.asarray(synths.random_ends(jax.random.PRNGKey(0), (20000,)))
    # Beta(0.8, 0.8): symmetric, boundary-heavy (more mass near 0/1 than uniform)
    assert abs(vals.mean() - 0.5) < 0.02
    assert ((vals < 0.1).mean() + (vals > 0.9).mean()) > 0.2


def test_ampexpstepup_envelope():
    t = jnp.arange(8192) / 44100.0
    y = np.asarray(synths.ampexpstepup(jax.random.PRNGKey(5), t, freq=1000.0))
    # staircase: early amplitude tiny relative to late amplitude
    early = np.max(np.abs(y[:500]))
    late = np.max(np.abs(y[-500:]))
    assert early < 0.05 * late


# ------------------------------------------------------------ effects


def test_effect_knob_conversion():
    e = effects.Compressor_4c()
    wc = np.asarray(e.knobs_wc(jnp.zeros(4)))  # mid-range
    np.testing.assert_allclose(wc, [(a + b) / 2 for a, b in e.knob_ranges], rtol=1e-5)
    lo = np.asarray(e.knobs_wc(jnp.full(4, -0.5)))
    np.testing.assert_allclose(lo, e.knob_ranges[:, 0], rtol=1e-5)


def test_registry_names():
    for name in ("comp", "comp_4c", "comp_t", "comp_large", "comp_one",
                 "denoise", "lowpass", "echo"):
        e = effects.make_effect(name)
        assert e.num_knobs == len(e.knob_ranges)


def test_denoise_swaps_and_adds_noise():
    e = effects.Denoise()
    x = jnp.zeros(1000)
    y, x_noisy = e.go(x, jnp.asarray([0.5]), key=jax.random.PRNGKey(0))  # max strength
    assert np.allclose(np.asarray(y), 0.0)
    assert 0.2 < np.max(np.abs(np.asarray(x_noisy))) <= 0.5


def test_lowpass_attenuates_high_freq():
    sr = 44100.0
    t = np.arange(8192) / sr
    hi = np.sin(2 * np.pi * 8000 * t).astype(np.float32)
    e = effects.LowPass(sr)
    y, _ = e.go_wc(jnp.asarray(hi), jnp.asarray([200.0]))
    assert np.max(np.abs(np.asarray(y)[2000:])) < 0.02


def test_timealign_shapes():
    e = effects.TimeAlign()
    x = jnp.zeros(4096)
    y, x_shift = e.go(x, jnp.asarray([0.0]), key=jax.random.PRNGKey(1))
    assert y.shape == x_shift.shape == (4096,)


def test_pitch_shift_octave_up():
    sr = 44100.0
    t = np.arange(16384) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))
    y = np.asarray(pitch_shift(x, sr, 12.0))
    # measure dominant frequency of the interior via FFT
    seg = y[4096:12288] * np.hanning(8192)
    spec = np.abs(np.fft.rfft(seg))
    f_peak = np.argmax(spec) * sr / 8192
    assert abs(f_peak - 880.0) < 30.0, f_peak


# ------------------------------------------------------------- knobs


def test_int2knobs_docstring_examples():
    np.testing.assert_allclose(
        knobs.int2knobs(12345, [[-0.5, 0.5]] * 4, 12),
        [0.13636363636363635, -0.40909090909090906, 0.2272727272727273, 0.31818181818181823],
    )
    assert knobs.int2knobs(100, [[1, 6]] * 3, 6) == [3.0, 5.0, 5.0]
    assert knobs.int2knobs(1234, [[0, 9]] * 4, 10) == [1.0, 2.0, 3.0, 4.0]


def test_knobs_nn_roundtrip():
    e = effects.Compressor_4c()
    nn_in = np.array([-0.5, 0.0, 0.25, 0.5])
    wc = np.asarray(e.knobs_wc(jnp.asarray(nn_in)))
    back = knobs.knobs_nn_from_wc(wc, e.knob_ranges)
    np.testing.assert_allclose(back, nn_in, atol=1e-6)
