"""DCT front-end and FNN front-end variant tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from signaltrain_tpu.ops import dct_frontend, frontend


def test_core_modulation_matches_reference_formula():
    # independent loop implementation of cls_fe_dct_bases.py:76-83
    k_sub, wsz = 32, 64
    w = np.sin(np.pi / wsz * (np.arange(wsz) + 0.5))
    oracle = np.zeros((k_sub, wsz))
    for k in range(k_sub):
        for n in range(wsz):
            oracle[k, n] = (
                w[n]
                * np.cos(np.pi / k_sub * (k + 0.5) * (n + 0.5 + k_sub / 2))
                * np.sqrt(2.0 / k_sub)
            )
    got = dct_frontend.core_modulation(k_sub, wsz)
    np.testing.assert_allclose(got, oracle, atol=1e-6)


def test_dct_analysis_matches_torch_conv():
    ft, wsz, hop = 64, 128, 64
    rs = np.random.RandomState(0)
    x = rs.randn(2, 1024).astype(np.float32)
    model = dct_frontend.DCTAnalysis(ft_size=ft, w_size=wsz, hop_size=hop)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024)))
    out = model.apply(params, jnp.asarray(x))

    w0 = dct_frontend.core_modulation(ft, wsz)
    xt = torch.from_numpy(x).unsqueeze(1)
    ref = F.conv1d(xt, torch.from_numpy(w0[:, None, :]), stride=hop, padding=ft)
    ref = ref.transpose(1, 2).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_dct_roundtrip_near_identity():
    """Cosine-modulated analysis + synthesis with w_size = 2*ft, hop = ft is
    a (windowed) orthogonal transform: interior reconstruction ~ identity."""
    ft, wsz, hop = 64, 128, 64
    rs = np.random.RandomState(1)
    x = rs.randn(1, 4096).astype(np.float32)
    ana = dct_frontend.DCTAnalysis(ft_size=ft, w_size=wsz, hop_size=hop, use_bias=False)
    syn = dct_frontend.DCTSynthesis(ft_size=ft, w_size=wsz, hop_size=hop)
    pa = ana.init(jax.random.PRNGKey(0), x)
    spec = ana.apply(pa, jnp.asarray(x))
    ps = syn.init(jax.random.PRNGKey(0), spec)
    rec = np.asarray(syn.apply(ps, spec))
    interior = slice(256, -256)
    lag = rec.shape[-1] - x.shape[-1]
    # MDCT-style transforms reconstruct up to the framing offset; check
    # correlation of the interior instead of exact equality.
    a = rec[0, interior]
    b = x[0, interior][: a.shape[0]]
    corr = np.corrcoef(a[: b.shape[0]], b)[0, 1]
    assert corr > 0.95, corr


def test_fnn_roundtrip():
    ft = 64
    half = ft // 2 + 1
    rs = np.random.RandomState(2)
    frames = rs.randn(2, 5, ft).astype(np.float32)
    ana = frontend.FNNAnalysis(ft_size=ft)
    syn = frontend.FNNSynthesis(ft_size=ft)
    pa = ana.init(jax.random.PRNGKey(0), jnp.asarray(frames))
    re, im = ana.apply(pa, jnp.asarray(frames))
    assert re.shape == (2, 5, half)
    ps = syn.init(jax.random.PRNGKey(0), re, im)
    rec = np.asarray(syn.apply(ps, re, im))
    # ortho-DFT forward/backward is exactly invertible
    np.testing.assert_allclose(rec, frames, atol=1e-4)
