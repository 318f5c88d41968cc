"""Model parity tests: golden geometry, parameter count, and a full-forward
oracle built from torch convs (float64) + numpy dense math, with weights
copied from the flax params."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from signaltrain_tpu.models.st_model import compute_spec, param_count, st_model

FT, HOP, HALF = 1024, 384, 513


def test_default_geometry():
    spec = compute_spec()
    assert spec.in_chunk_size == 8192
    assert spec.out_chunk_size == 2048
    assert spec.time_frames == 25
    assert spec.output_time_frames == 9
    assert (spec.ft_size, spec.hop_size) == (1024, 384)


def test_legacy_scale_scheme():
    spec = compute_spec(scale_factor=2.0, scale_scheme="legacy")
    assert spec.ft_size == 2048 and spec.hop_size == 768


def test_scaled_lean_geometry():
    # 4k-output web-demo-like config: scale=2 keeps ft/hop fixed.
    spec = compute_spec(scale_factor=2.0, shrink_factor=4.0)
    assert spec.in_chunk_size == 16384
    assert spec.ft_size == 1024 and spec.hop_size == 384
    assert spec.out_chunk_size == (spec.output_time_frames - 1) * 384 - 1024


def test_param_count_matches_reference():
    # ~4.2M: 4x 1024^2 front-end matrices + 2x 8393-param autoencoders
    # (SURVEY.md §3B; dims from nn_proc.py:47-57,288-291).
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(0))
    assert param_count(params) == 4 * 1024 * 1024 + 2 * 8393


@pytest.fixture(scope="module")
def model_and_params():
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(3))
    return model, params


def _np(tree, *keys):
    node = tree["params"]
    for k in keys:
        node = node[k]
    return np.asarray(node, dtype=np.float64)


def _oracle_autoencoder(p, prefix, x_btf, knobs, skip, ot):
    """Numpy float64 oracle of AsymAutoEncoder.forward (nn_proc.py:77-126)."""

    def elu(v):
        return np.where(v > 0, v, np.expm1(v))

    def lin(z, name):
        k = _np(p, prefix, name, "kernel")
        b = _np(p, prefix, name, "bias")
        return z @ k + b

    z = np.swapaxes(x_btf, 1, 2)  # (B, F, T)
    x_input = z
    for name in ("fnn_enc", "fnn_enc2", "fnn_enc3", "fnn_enc4"):
        z = elu(lin(z, name))
    knobs_r = np.broadcast_to(knobs[:, None, :], (z.shape[0], z.shape[1], knobs.shape[-1]))
    z = elu(lin(np.concatenate((z, knobs_r), axis=2), "fnn_addknobs"))
    for name in ("fnn_dec4", "fnn_dec3", "fnn_dec2"):
        z = elu(lin(z, name))
    dec = lin(z, "fnn_dec")
    tail = x_input[:, :, -ot:]
    if skip == "sf":
        out = elu(dec) * tail
    elif skip == "res":
        out = elu(dec + tail)
    else:
        out = elu(dec)
    return np.swapaxes(out, 1, 2)


def _oracle_forward(params, x, knobs):
    """Full float64 forward oracle of AsymMPAEC (nn_proc.py:305-340) using
    torch convs for the front-end and numpy for everything else."""
    wr = _np(params, "dft_analysis", "w_real")
    wi = _np(params, "dft_analysis", "w_imag")
    xt = torch.from_numpy((x / 2).astype(np.float64)).unsqueeze(1)
    re = F.conv1d(xt, torch.from_numpy(wr[:, None, :]), stride=HOP, padding=FT)
    im = F.conv1d(xt, torch.from_numpy(wi[:, None, :]), stride=HOP, padding=FT)
    re = re.transpose(1, 2)[:, :, :HALF].numpy()
    im = im.transpose(1, 2)[:, :, :HALF].numpy()

    mag = np.sqrt(re**2 + im**2)
    phs = np.arctan2(im, re + 1e-7)

    mag_hat = _oracle_autoencoder(params, "aenc", mag, knobs, "sf", 9)
    phs_hat = _oracle_autoencoder(params, "phs_aenc", phs, knobs, "", 9)
    phs_hat = phs_hat + phs[:, -9:, :]

    an_real = mag_hat * np.cos(phs_hat)
    an_imag = mag_hat * np.sin(phs_hat)

    sr_w = _np(params, "dft_synthesis", "w_real")
    si_w = _np(params, "dft_synthesis", "w_imag")
    re_t = torch.from_numpy(an_real).transpose(1, 2)
    im_t = torch.from_numpy(an_imag).transpose(1, 2)
    re_full = torch.cat((re_t, torch.flip(re_t[:, 1:-1, :], dims=[1])), dim=1)
    im_full = torch.cat((im_t, torch.flip(-im_t[:, 1:-1, :], dims=[1])), dim=1)
    wave = F.conv_transpose1d(
        re_full, torch.from_numpy(sr_w[:, None, :]), stride=HOP
    ) + F.conv_transpose1d(im_full, torch.from_numpy(si_w[:, None, :]), stride=HOP)
    wave = wave[:, 0, FT:-FT].numpy()

    y_hat = wave + x[:, -wave.shape[-1] :] / 2
    return 2 * y_hat, mag, mag_hat


def test_forward_shapes(model_and_params):
    model, params = model_and_params
    x = jnp.zeros((3, 8192))
    knobs = jnp.zeros((3, 4))
    y_hat, mag, mag_hat = model.apply(params, x, knobs)
    assert y_hat.shape == (3, 2048)
    assert mag.shape == (3, 25, 513)
    assert mag_hat.shape == (3, 9, 513)


def test_forward_matches_float64_oracle(model_and_params):
    model, params = model_and_params
    rs = np.random.RandomState(11)
    x = (rs.randn(4, 8192) * 0.3).astype(np.float32)
    knobs = (rs.rand(4, 4) - 0.5).astype(np.float32)

    y_hat, mag, mag_hat = jax.jit(model.apply)(params, jnp.asarray(x), jnp.asarray(knobs))
    oy, omag, omag_hat = _oracle_forward(params, x.astype(np.float64), knobs.astype(np.float64))

    np.testing.assert_allclose(np.asarray(mag), omag, atol=2e-4)
    np.testing.assert_allclose(np.asarray(mag_hat), omag_hat, atol=2e-4)
    np.testing.assert_allclose(np.asarray(y_hat), oy, atol=5e-4)


def test_return_acts(model_and_params):
    model, params = model_and_params
    x = jnp.zeros((2, 8192))
    knobs = jnp.zeros((2, 4))
    y_hat, mag, mag_hat, acts = model.apply(params, x, knobs, return_acts=True)
    # 4 front-end acts + 10 per autoencoder + 6 tail acts (nn_proc.py:311-335)
    assert len(acts) == 4 + 10 + 10 + 6
