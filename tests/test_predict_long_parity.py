"""predict_long must reproduce the reference's host-loop algorithm
(utils/predict_long.py:30-79): sliding windows, per-batch forward,
concatenation, tail trim — computed here as an explicit numpy loop oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from signaltrain_tpu.inference import predict_long as pl
from signaltrain_tpu.models.st_model import ModelSpec, STModel


def _tiny_model():
    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    return STModel(spec)


def _reference_style_loop(signal, knobs_nn, model, params, chunk, out_chunk,
                          batch_size):
    """Oracle: the reference's host-loop formulation with numpy appends."""
    overlap = chunk - out_chunk
    step = chunk - overlap
    rem = (len(signal) - chunk) % step
    sig = signal if rem == 0 else np.pad(signal, (0, step - rem))
    nwin = (len(sig) - chunk) // step + 1
    x = np.stack([sig[i * step : i * step + chunk] for i in range(nwin)])

    bs = min(batch_size, x.shape[0])
    y_pred = np.empty((0,), np.float32)
    bmax = int(np.round(x.shape[0] / bs))
    for b in range(bmax):
        bstart = b * bs
        cur = x.shape[0] - bstart if b == bmax - 1 else bs
        xb = jnp.asarray(x[bstart : bstart + cur])
        kb = jnp.broadcast_to(jnp.asarray(knobs_nn), (cur, len(knobs_nn)))
        y_hat, _, _ = model.apply(params, xb, kb)
        y_pred = np.append(y_pred, np.asarray(y_hat).flatten())

    unique = x.shape[1] + (x.shape[0] - 1) * (x.shape[1] - overlap)
    num_extra = unique - signal.size
    return y_pred[:-num_extra] if num_extra > 0 else y_pred


def test_predict_long_matches_reference_loop():
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    signal = (rs.randn(5000) * 0.3).astype(np.float32)
    knobs = (rs.rand(4) - 0.5).astype(np.float32)

    ours = pl.predict_long(signal, knobs, model, params, batch_size=7)
    oracle = _reference_style_loop(
        signal, knobs, model, params, 512, 128, batch_size=7
    )
    assert ours.shape == oracle.shape
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_predict_long_exact_tiling_no_trim():
    """Signal length chosen so windows tile exactly (num_extra == 0)."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(1))
    length = 512 + 10 * 128  # exactly 11 windows
    signal = np.sin(np.arange(length) / 20).astype(np.float32)
    y = pl.predict_long(signal, np.zeros(4, np.float32), model, params,
                        batch_size=4)
    assert y.shape == (length - (512 - 128),)


def test_predict_long_sharded_matches_single():
    """Sequence-parallel inference (window axis over the data mesh) produces
    the same audio as the single-device path."""
    from signaltrain_tpu.parallel import mesh as meshlib

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(2))
    rs = np.random.RandomState(3)
    signal = (rs.randn(9000) * 0.3).astype(np.float32)
    knobs = (rs.rand(4) - 0.5).astype(np.float32)

    y1 = pl.predict_long(signal, knobs, model, params, batch_size=16)
    mesh = meshlib.make_mesh(n_model=1)
    y2 = pl.predict_long(signal, knobs, model, params, batch_size=16, mesh=mesh)
    np.testing.assert_allclose(y1, y2, atol=2e-5)
