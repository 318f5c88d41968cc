"""Cross-framework checkpoint parity.

The BASELINE parity target is against reference PyTorch checkpoints; the
reference repo's demo checkpoints are git-LFS-missing, so the strongest
available proof runs the OTHER direction: save a (trained-ish) model from
this framework, load the .tar into a PyTorch model with the reference's
architecture and state_dict naming (built here from the documented specs,
nn_proc.py / cls_fe_dft.py), and require the two frameworks' forward passes
to agree. strict=True state_dict loading also proves the naming/layout
contract a reference checkpoint would need on import.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from signaltrain_tpu.dsp import effects
from signaltrain_tpu.models.st_model import st_model
from signaltrain_tpu.training import checkpoint

FT, HOP, HALF, T, OT = 1024, 384, 513, 25, 9


class _TorchAE(nn.Module):
    """Reference AsymAutoEncoder architecture (nn_proc.py:28-126)."""

    def __init__(self, t=T, r=64, k=4, ot=OT):
        super().__init__()
        self.fnn_enc = nn.Linear(t, r)
        self.fnn_enc2 = nn.Linear(r, r // 2)
        self.fnn_enc3 = nn.Linear(r // 2, r // 4)
        self.fnn_enc4 = nn.Linear(r // 4, r // 4)
        self.fnn_addknobs = nn.Linear(r // 4 + k, r // 4)
        self.fnn_dec4 = nn.Linear(r // 4, r // 4)
        self.fnn_dec3 = nn.Linear(r // 4, r // 2)
        self.fnn_dec2 = nn.Linear(r // 2, r)
        self.fnn_dec = nn.Linear(r, ot)
        self.ot = ot

    def forward(self, x, knobs, skip):
        elu = F.elu
        x_input = x.transpose(2, 1)
        z = elu(self.fnn_enc(x_input))
        z = elu(self.fnn_enc2(z))
        z = elu(self.fnn_enc3(z))
        z = elu(self.fnn_enc4(z))
        knobs_r = knobs.unsqueeze(1).repeat(1, z.size(1), 1)
        z = elu(self.fnn_addknobs(torch.cat((z, knobs_r), 2)))
        z = elu(self.fnn_dec4(z))
        z = elu(self.fnn_dec3(z))
        z = elu(self.fnn_dec2(z))
        dec = self.fnn_dec(z)
        tail = x_input[:, :, -self.ot:]
        if skip == "sf":
            out = elu(dec) * tail
        else:
            out = elu(dec)
        return out.transpose(2, 1)


class _TorchAnalysis(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_analysis_real = nn.Conv1d(1, FT, FT, padding=FT, stride=HOP, bias=False)
        self.conv_analysis_imag = nn.Conv1d(1, FT, FT, padding=FT, stride=HOP, bias=False)

    def forward(self, wave):
        w = wave.unsqueeze(1)
        re = self.conv_analysis_real(w).transpose(1, 2)[:, :, :HALF]
        im = self.conv_analysis_imag(w).transpose(1, 2)[:, :, :HALF]
        return re, im


class _TorchSynthesis(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_synthesis_real = nn.ConvTranspose1d(FT, 1, FT, stride=HOP, bias=False)
        self.conv_synthesis_imag = nn.ConvTranspose1d(FT, 1, FT, stride=HOP, bias=False)

    def forward(self, re, im):
        re = re.transpose(1, 2)
        im = im.transpose(1, 2)
        re = torch.cat((re, torch.flip(re[:, 1:-1, :], dims=[1])), 1)
        im = torch.cat((im, torch.flip(-im[:, 1:-1, :], dims=[1])), 1)
        wave = self.conv_synthesis_real(re) + self.conv_synthesis_imag(im)
        return wave[:, 0, FT:-FT]


class _TorchMPAEC(nn.Module):
    def __init__(self):
        super().__init__()
        self.dft_analysis = _TorchAnalysis()
        self.dft_synthesis = _TorchSynthesis()
        self.aenc = _TorchAE()
        self.phs_aenc = _TorchAE()

    def forward(self, x, knobs):
        re, im = self.dft_analysis(x / 2)
        mag = torch.sqrt(re**2 + im**2)
        phs = torch.atan2(im, re + 1e-7)
        mag_hat = self.aenc(mag, knobs, "sf")
        phs_hat = self.phs_aenc(phs, knobs, "") + phs[:, -OT:, :]
        an_real = mag_hat * torch.cos(phs_hat)
        an_imag = mag_hat * torch.sin(phs_hat)
        wave = self.dft_synthesis(an_real, an_imag)
        y_hat = wave + x[:, -wave.shape[-1]:] / 2
        return 2 * y_hat, mag, mag_hat


class _TorchSTModel(nn.Module):
    """Wrapper so state_dict keys carry the reference's 'mpaec.' prefix."""

    def __init__(self):
        super().__init__()
        self.mpaec = _TorchMPAEC()

    def forward(self, x, knobs):
        return self.mpaec(x, knobs)


@pytest.mark.slow
def test_checkpoint_loads_into_torch_reference_architecture(tmp_path):
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(9))
    effect = effects.Compressor_4c()
    path = str(tmp_path / "x.tar")
    checkpoint.save_checkpoint(path, jax.device_get(params), model.spec, effect, 0)

    tm = _TorchSTModel()
    raw = torch.load(path, map_location="cpu", weights_only=False)
    tm.load_state_dict(raw["state_dict"], strict=True)  # naming contract
    tm.eval()

    rs = np.random.RandomState(0)
    x = (rs.randn(3, 8192) * 0.3).astype(np.float32)
    knobs = (rs.rand(3, 4) - 0.5).astype(np.float32)

    with torch.no_grad():
        ty, tmag, tmag_hat = tm(torch.from_numpy(x), torch.from_numpy(knobs))
    jy, jmag, jmag_hat = jax.jit(model.apply)(params, jnp.asarray(x), jnp.asarray(knobs))

    np.testing.assert_allclose(np.asarray(jmag), tmag.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-3)
    # spectral-L1 parity metric (BASELINE):
    spectral_l1 = float(np.mean(np.abs(np.asarray(jmag_hat) - tmag_hat.numpy())))
    assert spectral_l1 <= 1e-3, spectral_l1


@pytest.mark.slow
def test_torch_checkpoint_imports_into_ours(tmp_path):
    """Reverse direction: a checkpoint written by TORCH code (reference
    style) imports into this framework and matches its own forward."""
    tm = _TorchSTModel()
    state = {
        "epoch": 1,
        "state_dict": tm.state_dict(),
        "optimizer": {},
        "effect_name": "Compressor_4c",
        "knob_names": ["threshold", "ratio", "attackTime", "releaseTime"],
        "knob_ranges": np.array([[-30, 0], [1, 5], [1e-3, 4e-2], [1e-3, 4e-2]]),
        "scale_factor": 1,
        "shrink_factor": 4,
        "in_chunk_size": 8192,
        "out_chunk_size": 2048,
        "sr": 44100,
    }
    path = str(tmp_path / "torch_ckpt.tar")
    torch.save(state, path)

    params, rv = checkpoint.load_checkpoint(path)
    model = st_model(
        scale_factor=rv["scale_factor"], shrink_factor=rv["shrink_factor"],
        num_knobs=len(rv["knob_names"]), sr=rv["sr"],
    )
    rs = np.random.RandomState(1)
    x = (rs.randn(2, 8192) * 0.3).astype(np.float32)
    knobs = (rs.rand(2, 4) - 0.5).astype(np.float32)
    with torch.no_grad():
        ty, _, _ = tm(torch.from_numpy(x), torch.from_numpy(knobs))
    jy, _, _ = model.apply(params, jnp.asarray(x), jnp.asarray(knobs))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-3)
