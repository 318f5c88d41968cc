"""Model-level parity: AsymMPAEC frontend='pallas' (fused kernels) vs
frontend='xla', over the SAME parameter tree, at the flagship geometry.

The fused path swaps the front-end for the Pallas kernels and runs the
autoencoders frame-major (models/mpaec.py:_fused); these tests pin its
forward values AND the full parameter gradient through calc_loss to the XLA
path (which is itself pinned to torch + the genuine reference). Runs in
Pallas interpret mode so CPU-only environments cover it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from signaltrain_tpu.models.st_model import st_model
from signaltrain_tpu.training import loss as loss_mod

jax.config.update("jax_enable_x64", False)

B = 3


def _setup():
    model = st_model()  # flagship: ft=1024, hop=384, in 8192 -> out 2048
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, model.spec.in_chunk_size)) * 0.4
    knobs = jax.random.uniform(
        jax.random.PRNGKey(2), (B, model.spec.num_knobs), minval=-0.5, maxval=0.5
    )
    fused = model.module.clone(frontend="pallas")
    return model, fused, params, x, knobs


def test_fused_forward_matches_xla():
    model, fused, params, x, knobs = _setup()
    y_ref, mag_ref, mh_ref = model.apply(params, x, knobs)
    y_fus, mag_fus, mh_fus = fused.apply(params, x, knobs)

    # fused path returns mag / mag_hat frame-major: (T, B, F) / (OT, B, F)
    assert mag_fus.shape == (mag_ref.shape[1], B, mag_ref.shape[2])
    np.testing.assert_allclose(np.asarray(y_fus), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(mag_fus, (1, 0, 2))), np.asarray(mag_ref),
        atol=2e-5, rtol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(mh_fus, (1, 0, 2))), np.asarray(mh_ref),
        atol=2e-4, rtol=2e-4,
    )


def test_fused_grads_match_xla():
    model, fused, params, x, knobs = _setup()
    n_bins = model.spec.ft_size // 2 + 1
    scale = loss_mod.freq_scale(n_bins)
    y = jax.random.normal(jax.random.PRNGKey(3), (B, model.spec.out_chunk_size)) * 0.4

    def loss_of(module):
        def f(p):
            y_hat, _, mag_hat = module.apply(p, x, knobs)
            return loss_mod.calc_loss(y_hat, y, mag_hat, scale_by_freq=scale)
        return f

    l_ref, g_ref = jax.value_and_grad(loss_of(model.module))(params)
    l_fus, g_fus = jax.value_and_grad(loss_of(fused))(params)
    np.testing.assert_allclose(float(l_fus), float(l_ref), atol=1e-5, rtol=1e-5)

    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_fus = jax.tree_util.tree_leaves(g_fus)
    for (path, gr), gf in zip(flat_ref, flat_fus):
        gr, gf = np.asarray(gr), np.asarray(gf)
        # norm-relative: the atan2 adjoint near the zero-padding frames is
        # cancellation-heavy, so reduction order perturbs a few elements
        # (same rationale as tests/test_pallas_frontend.py grad tolerances)
        tol = 1e-3 * max(1.0, np.abs(gr).max())
        assert np.abs(gf - gr).max() <= tol, (
            jax.tree_util.keystr(path), np.abs(gf - gr).max(), np.abs(gr).max()
        )
