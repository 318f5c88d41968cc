"""Front-end parity tests.

The GEMM-formulated trainable STFT/iSTFT must match the strided-conv
formulation the reference uses (cls_fe_dft.py). torch (CPU) serves as the
independent conv oracle: we build Conv1d/ConvTranspose1d with the same
windowed-DFT weights and compare outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as ssig
import torch
import torch.nn.functional as F

from signaltrain_tpu.ops import framing, frontend, windows

FT, HOP = 1024, 384
HALF = FT // 2 + 1


def test_hamming_matches_scipy():
    np.testing.assert_allclose(
        windows.hamming(FT), ssig.windows.hamming(FT, sym=True), atol=1e-12
    )


def test_dft_basis_matches_npfft():
    re, im = windows.dft_basis(64)
    f = np.fft.fft(np.eye(64), norm="ortho")
    np.testing.assert_allclose(re, np.real(f), atol=1e-12)
    np.testing.assert_allclose(im, np.imag(f), atol=1e-12)


def test_gla_window_matches_reference_formula():
    # Independent re-implementation of the LSEE-MSTFT accumulation loop
    # exactly as written in the reference (cls_fe_dft.py:133-163).
    wsz, hop = FT, HOP
    synw = ssig.windows.hamming(wsz, sym=True)
    synw_prod = (synw**2).reshape(wsz, 1)
    redundancy = wsz // hop
    env = np.zeros((wsz, 1))
    for k in range(-redundancy, redundancy + 1):
        env_ind = hop * k + np.arange(1, wsz + 1)
        win_ind = np.arange(1, wsz + 1)
        valid = np.where((env_ind > 0) & (env_ind <= wsz))
        env[env_ind[valid] - 1] += synw_prod[win_ind[valid] - 1]
    oracle = synw / env[:, 0]
    np.testing.assert_allclose(windows.gla_synthesis_window(wsz, hop), oracle, atol=1e-12)


def test_frame_count_geometry():
    # Default geometry: 8192-sample chunk -> 25 frames; 2048 -> 9 frames
    # (nn_proc.py:378-379).
    assert framing.num_frames(8192, FT, HOP, pad=FT) == 25
    assert framing.num_frames(2048, FT, HOP, pad=FT) == 9


def test_sliding_window_docstring_example():
    # audio.py:33-39 worked example.
    x = jnp.arange(10)
    out = framing.sliding_window(x, 5, overlap=2)
    np.testing.assert_array_equal(
        np.asarray(out), [[0, 1, 2, 3, 4], [3, 4, 5, 6, 7], [6, 7, 8, 9, 0]]
    )


def test_undo_sliding_window_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(1000).astype(np.float32))
    w = framing.sliding_window(x, 128, overlap=32)
    back = framing.undo_sliding_window(w, 32, flatsize=1000)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(42)


def test_analysis_matches_torch_conv(rng):
    b, length = 3, 8192
    x = rng.randn(b, length).astype(np.float32)

    model = frontend.Analysis(ft_size=FT, hop_size=HOP)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, length)))
    re, im = model.apply(params, jnp.asarray(x))

    # torch conv oracle with identical weights (cls_fe_dft.py:28-58)
    re0, im0 = windows.analysis_init(FT)
    xt = torch.from_numpy(x).unsqueeze(1)
    re_t = F.conv1d(xt, torch.from_numpy(re0[:, None, :]), stride=HOP, padding=FT)
    im_t = F.conv1d(xt, torch.from_numpy(im0[:, None, :]), stride=HOP, padding=FT)
    re_t = re_t.transpose(1, 2)[:, :, :HALF].numpy()
    im_t = im_t.transpose(1, 2)[:, :, :HALF].numpy()

    assert re.shape == (b, 25, HALF)
    np.testing.assert_allclose(np.asarray(re), re_t, atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), im_t, atol=2e-4)


def test_synthesis_matches_torch_convtranspose(rng):
    b, ot = 3, 9
    re = rng.randn(b, ot, HALF).astype(np.float32)
    im = rng.randn(b, ot, HALF).astype(np.float32)

    model = frontend.Synthesis(ft_size=FT, hop_size=HOP)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, ot, HALF)), jnp.zeros((1, ot, HALF))
    )
    wave = model.apply(params, jnp.asarray(re), jnp.asarray(im))

    # torch transposed-conv oracle with the explicit conjugate mirror
    # (cls_fe_dft.py:102-115).
    re0, im0 = windows.synthesis_init(FT, HOP)
    re_t = torch.from_numpy(re).transpose(1, 2)  # (B, half, OT)
    im_t = torch.from_numpy(im).transpose(1, 2)
    re_full = torch.cat((re_t, torch.flip(re_t[:, 1:-1, :], dims=[1])), dim=1)
    im_full = torch.cat((im_t, torch.flip(-im_t[:, 1:-1, :], dims=[1])), dim=1)
    out = F.conv_transpose1d(
        re_full, torch.from_numpy(re0[:, None, :]), stride=HOP
    ) + F.conv_transpose1d(im_full, torch.from_numpy(im0[:, None, :]), stride=HOP)
    out = out[:, 0, FT:-FT].numpy()

    assert wave.shape == out.shape == (b, 2048)
    np.testing.assert_allclose(np.asarray(wave), out, atol=2e-4)


def test_roundtrip_reconstruction():
    """At DFT init, analysis->synthesis must approximately reconstruct the
    interior of the signal (the property the whole model relies on)."""
    rs = np.random.RandomState(7)
    x = rs.randn(2, 8192).astype(np.float32) * 0.5

    ana = frontend.Analysis(ft_size=FT, hop_size=HOP)
    syn = frontend.Synthesis(ft_size=FT, hop_size=HOP)
    pa = ana.init(jax.random.PRNGKey(0), jnp.zeros((1, 8192)))
    re, im = ana.apply(pa, jnp.asarray(x))
    # use the last 9 frames, as the model does (nn_proc.py:322)
    ps = syn.init(jax.random.PRNGKey(0), re[:, -9:], im[:, -9:])
    wave = np.asarray(syn.apply(ps, re[:, -9:], im[:, -9:]))

    # The synthesis of the last 9 frames covers the last 2048 input samples.
    target = x[:, -2048:]
    err = np.abs(wave - target)
    # Edges of the synthesis window are imperfect; interior must be tight.
    interior = err[:, 256:-256]
    assert np.max(interior) < 5e-3, np.max(interior)


def test_sliding_window_short_signal():
    """A signal shorter than (or equal to) the window — even shorter than
    the overlap — yields ONE zero-padded window, per the tiling contract
    (previously: negative slice limits -> TypeError)."""
    out = framing.sliding_window(jnp.arange(2.0), 5, overlap=2)
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 1.0, 0.0, 0.0, 0.0]])
    out = framing.sliding_window(jnp.arange(5.0), 5, overlap=2)
    assert out.shape == (1, 5)


def test_frame_signal_too_short_clear_error():
    import pytest

    with pytest.raises(ValueError, match="shorter than ft_size"):
        framing.frame_signal(jnp.zeros((1, 100)), 1024, 384, pad=0)


def test_pitch_shift_tiny_signal_identity():
    """Signals below the smallest vocoder frame return unchanged instead of
    crashing in frame_signal."""
    from signaltrain_tpu.dsp import pitch

    x = jnp.arange(8.0)
    out = pitch.pitch_shift(x, 44100, 3.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
