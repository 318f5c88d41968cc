"""Parity against the GENUINE reference implementation.

The reference's model stack (nn_proc.py + cls_fe_dft.py) needs only
torch/numpy/scipy, so it runs here directly from /root/reference (read-only).
These tests prove the checkpoint contract and forward-pass parity against
the actual article, not a re-implementation:

* our .tar loads into the reference's st_model via its own
  load_state_dict(strict) — and its forward matches ours;
* a checkpoint written by the reference's own misc.save_checkpoint imports
  into this framework with matching forward output.

(Two tiny py-compat shims are injected for the 2019-era reference:
scipy.signal.hamming moved to scipy.signal.windows, and torch.has_cudnn is
deprecated.)
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import scipy.signal as _ssig

if not hasattr(_ssig, "hamming"):
    _ssig.hamming = _ssig.windows.hamming

if not hasattr(torch, "has_cudnn"):
    torch.has_cudnn = False

REF = "/root/reference/signaltrain"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not present"
)
sys.path.insert(0, REF)

from signaltrain_tpu.dsp import effects  # noqa: E402
from signaltrain_tpu.models.st_model import st_model  # noqa: E402
from signaltrain_tpu.training import checkpoint  # noqa: E402


def _ref_model():
    import nn_proc as ref_nn_proc  # the reference's module

    torch.manual_seed(0)
    return ref_nn_proc.st_model(
        scale_factor=1, shrink_factor=4, num_knobs=4, sr=44100
    )


@pytest.mark.slow
def test_our_checkpoint_loads_into_genuine_reference(tmp_path):
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(7))
    effect = effects.Compressor_4c()
    path = str(tmp_path / "ours.tar")
    checkpoint.save_checkpoint(path, jax.device_get(params), model.spec, effect, 0)

    ref = _ref_model()
    state = torch.load(path, map_location="cpu", weights_only=False)
    ref.load_state_dict(state["state_dict"], strict=True)
    ref.eval()

    rs = np.random.RandomState(0)
    x = (rs.randn(3, 8192) * 0.3).astype(np.float32)
    knobs = (rs.rand(3, 4) - 0.5).astype(np.float32)
    with torch.no_grad():
        ty, tmag, tmag_hat = ref.forward(torch.from_numpy(x), torch.from_numpy(knobs))
    jy, jmag, jmag_hat = jax.jit(model.apply)(params, jnp.asarray(x), jnp.asarray(knobs))

    np.testing.assert_allclose(np.asarray(jmag), tmag.numpy(), atol=3e-4)
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-3)
    spectral_l1 = float(np.mean(np.abs(np.asarray(jmag_hat) - tmag_hat.numpy())))
    assert spectral_l1 <= 1e-3, spectral_l1


@pytest.mark.slow
def test_genuine_reference_checkpoint_imports_into_ours(tmp_path):
    import misc as ref_misc  # the reference's checkpoint writer

    ref = _ref_model()
    effect = effects.Compressor_4c()

    class _Opt:  # the reference passes a torch optimizer; only .state_dict used
        def state_dict(self):
            return {}

    path = str(tmp_path / "ref.tar")
    ref_misc.save_checkpoint(path, ref, 0, False, _Opt(), effect, 44100)

    params, rv = checkpoint.load_checkpoint(path)
    assert rv["in_chunk_size"] == 8192 and rv["out_chunk_size"] == 2048
    model = st_model(
        scale_factor=rv["scale_factor"], shrink_factor=rv["shrink_factor"],
        num_knobs=len(rv["knob_names"]), sr=rv["sr"],
    )
    rs = np.random.RandomState(1)
    x = (rs.randn(2, 8192) * 0.3).astype(np.float32)
    knobs = (rs.rand(2, 4) - 0.5).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ty, _, tmag_hat = ref.forward(torch.from_numpy(x), torch.from_numpy(knobs))
    jy, _, jmag_hat = model.apply(params, jnp.asarray(x), jnp.asarray(knobs))
    np.testing.assert_allclose(np.asarray(jy), ty.numpy(), atol=1e-3)
    spectral_l1 = float(np.mean(np.abs(np.asarray(jmag_hat) - tmag_hat.numpy())))
    assert spectral_l1 <= 1e-3, spectral_l1
