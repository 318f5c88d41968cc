"""Fused Pallas STFT/iSTFT kernels vs the XLA front-end formulation.

The XLA path (ops/frontend.py) is itself pinned against torch convolutions
and the genuine reference (tests/test_frontend.py, test_genuine_reference_
parity.py); these tests pin the fused kernels (ops/pallas_frontend.py) to
the XLA path — forward values AND gradients — in Pallas interpret mode so
they run in CPU-only environments. Both geometries: a small one (fast) and
the flagship ft=1024/hop=384.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signaltrain_tpu.ops import frontend, pallas_frontend as pf

jax.config.update("jax_enable_x64", False)


def _xla_analysis(ft, hop):
    mod = frontend.Analysis(ft_size=ft, hop_size=hop, compute_dtype=jnp.float32)

    def fwd(params, x):
        re, im = mod.apply(params, x / 2 * 2)  # module takes the raw signal
        return re, im

    return mod, fwd


def _mag_phs(re, im):
    re32, im32 = re.astype(jnp.float32), im.astype(jnp.float32)
    sq = re32 * re32 + im32 * im32
    mag = jnp.sqrt(jnp.maximum(sq, 1e-36))
    phs = jnp.arctan2(im32, re32 + 1e-7)
    return mag, phs


GEOMS = [
    dict(ft=64, hop=24, chunk=512, b=5),
    dict(ft=1024, hop=384, chunk=8192, b=3),
]


@pytest.mark.parametrize("g", GEOMS, ids=["small", "flagship"])
def test_fused_analysis_matches_xla(g):
    ft, hop, chunk, b = g["ft"], g["hop"], g["chunk"], g["b"]
    half = ft // 2 + 1
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, chunk), jnp.float32) * 0.3

    mod = frontend.Analysis(ft_size=ft, hop_size=hop, compute_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    re, im = mod.apply(params, x / 2)
    mag_ref, phs_ref = _mag_phs(re, im)

    w_real = params["params"]["w_real"]
    w_imag = params["params"]["w_imag"]
    w = pf.stack_analysis_weights(w_real, w_imag, half)
    xp = jnp.pad(x, ((0, 0), (ft, ft)))
    mag, phs = pf.fused_analysis(xp, w, ft, hop, half, jnp.float32, True)
    mag = jnp.transpose(mag, (1, 0, 2))  # kernel layout is frame-major
    phs = jnp.transpose(phs, (1, 0, 2))

    assert mag.shape == mag_ref.shape
    np.testing.assert_allclose(np.asarray(mag), np.asarray(mag_ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(phs), np.asarray(phs_ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("g", GEOMS[:1], ids=["small"])
def test_fused_analysis_grads_match_xla(g):
    ft, hop, chunk, b = g["ft"], g["hop"], g["chunk"], g["b"]
    half = ft // 2 + 1
    x = jax.random.normal(jax.random.PRNGKey(0), (b, chunk), jnp.float32) * 0.3
    mod = frontend.Analysis(ft_size=ft, hop_size=hop, compute_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), x)
    w_real = params["params"]["w_real"]
    w_imag = params["params"]["w_imag"]
    t_frames = (chunk + 2 * ft - ft) // hop + 1
    a = jax.random.normal(jax.random.PRNGKey(2), (b, t_frames, half))
    c = jax.random.normal(jax.random.PRNGKey(3), (b, t_frames, half))

    def loss_xla(x, wr, wi):
        re, im = mod.apply({"params": {"w_real": wr, "w_imag": wi}}, x / 2)
        mag, phs = _mag_phs(re, im)
        return jnp.sum(mag * a) + jnp.sum(phs * c)

    def loss_fused(x, wr, wi):
        w = pf.stack_analysis_weights(wr, wi, half)
        xp = jnp.pad(x, ((0, 0), (ft, ft)))
        mag, phs = pf.fused_analysis(xp, w, ft, hop, half, jnp.float32, True)
        mag = jnp.transpose(mag, (1, 0, 2))
        phs = jnp.transpose(phs, (1, 0, 2))
        return jnp.sum(mag * a) + jnp.sum(phs * c)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w_real, w_imag)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_real, w_imag)
    np.testing.assert_allclose(
        np.asarray(g_fus[0]), np.asarray(g_ref[0]), atol=5e-4, rtol=5e-4,
        err_msg="dx",
    )
    # Weight grads: norm-relative tolerance. The atan2 adjoint is near-
    # singular at the zero-padding frames (1/(1e-7)^2 ~ 1e14 intermediate
    # scale with cancellation), so the f32 reduction ORDER (kernel: per-frame
    # accumulation; XLA: one tensordot) legitimately perturbs a handful of
    # elements at ~1e-4 of the gradient norm. A formula error would be O(1).
    for gr, gf, name in zip(g_ref[1:], g_fus[1:], ("dwr", "dwi")):
        gr, gf = np.asarray(gr), np.asarray(gf)
        scale = max(1.0, np.abs(gr).max())
        assert np.abs(gf - gr).max() <= 1e-3 * scale, (
            name, np.abs(gf - gr).max(), scale
        )


@pytest.mark.parametrize("g", GEOMS, ids=["small", "flagship"])
def test_fused_synthesis_matches_xla(g):
    ft, hop = g["ft"], g["hop"]
    half = ft // 2 + 1
    ot, b = 9, 4
    key = jax.random.PRNGKey(0)
    mag = jax.nn.softplus(jax.random.normal(key, (b, ot, half), jnp.float32))
    phs = jax.random.normal(jax.random.PRNGKey(1), (b, ot, half)) * 2.0
    re = mag * jnp.cos(phs)
    im = mag * jnp.sin(phs)

    mod = frontend.Synthesis(ft_size=ft, hop_size=hop, compute_dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), re, im)
    wave_ref = mod.apply(params, re, im)

    w_real = params["params"]["w_real"]
    w_imag = params["params"]["w_imag"]
    wr_eff = w_real[:half].at[1 : half - 1].add(jnp.flip(w_real[half:], axis=0))
    wi_eff = w_imag[:half].at[1 : half - 1].add(-jnp.flip(w_imag[half:], axis=0))
    w = pf.stack_synthesis_weights(wr_eff, wi_eff, half)
    mag_t = jnp.transpose(mag, (1, 0, 2))
    phs_t = jnp.transpose(phs, (1, 0, 2))
    wave = pf.fused_synthesis(mag_t, phs_t, w, ft, hop, half, jnp.float32, True)

    assert wave.shape == wave_ref.shape
    np.testing.assert_allclose(np.asarray(wave), np.asarray(wave_ref),
                               atol=3e-4, rtol=3e-4)


def test_fused_synthesis_grads_match_xla():
    ft, hop = 64, 24
    half = ft // 2 + 1
    ot, b = 9, 4
    mag = jax.nn.softplus(
        jax.random.normal(jax.random.PRNGKey(0), (b, ot, half), jnp.float32)
    )
    phs = jax.random.normal(jax.random.PRNGKey(1), (b, ot, half)) * 2.0
    mod = frontend.Synthesis(ft_size=ft, hop_size=hop, compute_dtype=jnp.float32)
    params = mod.init(
        jax.random.PRNGKey(2), mag * jnp.cos(phs), mag * jnp.sin(phs)
    )
    w_real = params["params"]["w_real"]
    w_imag = params["params"]["w_imag"]
    out_len = (ot - 1) * hop + ft - 2 * ft
    a = jax.random.normal(jax.random.PRNGKey(3), (b, out_len))

    def loss_xla(mag, phs, wr, wi):
        wave = mod.apply(
            {"params": {"w_real": wr, "w_imag": wi}},
            mag * jnp.cos(phs), mag * jnp.sin(phs),
        )
        return jnp.sum(wave * a)

    def loss_fused(mag, phs, wr, wi):
        wr_eff = wr[:half].at[1 : half - 1].add(jnp.flip(wr[half:], axis=0))
        wi_eff = wi[:half].at[1 : half - 1].add(-jnp.flip(wi[half:], axis=0))
        w = pf.stack_synthesis_weights(wr_eff, wi_eff, half)
        wave = pf.fused_synthesis(
            jnp.transpose(mag, (1, 0, 2)), jnp.transpose(phs, (1, 0, 2)),
            w, ft, hop, half, jnp.float32, True,
        )
        return jnp.sum(wave * a)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(mag, phs, w_real, w_imag)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(mag, phs, w_real, w_imag)
    for gr, gf, name in zip(g_ref, g_fus, ("dmag", "dphs", "dwr", "dwi")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=5e-4, err_msg=name
        )
