"""Pin the quality of the SHIPPED demo checkpoints (VERDICT r2 weak #7).

The README advertises corr(pred, true) ~0.99 for model_comp4c_demo.tar
(default 8192->2048 geometry) and ~0.97 for model_comp4c_4k.tar (the
reference web demo's 4096->3968 geometry, demo/index.html:30) on fresh
music-like audio under heavy compression. These tests fail if a future
refactor of the model, front-end, checkpoint import, or predict_long path
degrades either shipped model: corr >= 0.98 (demo) / >= 0.95 (4k).

Signal: a fixed 12 s segment of synths.music_like_clip (the Leadfoot role) —
never seen in training. Truth: the genuine effect streamed over the whole
signal (reference predict_long.py:206-208 "streamed target").
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from signaltrain_tpu.dsp import effects, synths
from signaltrain_tpu.inference import predict_long as pl
from signaltrain_tpu.utils.load_model import load_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# heavy compression, well inside comp_4c's ranges (audio.py:493-500):
# threshold -25 dB, ratio 4, attack 5 ms, release 20 ms
KNOBS_WC = np.array([-25.0, 4.0, 0.005, 0.02], np.float32)


def _corr(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def _check_checkpoint(ckpt, min_corr):
    model, params, rv = load_model(ckpt, compute_dtype=jnp.float32)
    sr = model.spec.sr
    clip = synths.music_like_clip(12.0, sr=sr)

    kr = np.asarray(rv["knob_ranges"], np.float32)
    knobs_nn = (KNOBS_WC - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5

    effect = effects.Compressor_4c(sr=sr)
    y_true, _ = effect.go_wc(jnp.asarray(clip), jnp.asarray(KNOBS_WC))
    y_true = np.asarray(y_true)

    y_pred = pl.predict_long(clip, knobs_nn, model, params)
    # predict_long output starts at sample `lookback` of the signal
    # (reference zero-pads the head, predict_long.py:221-223)
    lookback = model.spec.in_chunk_size - model.spec.out_chunk_size
    n = min(len(y_pred), len(y_true) - lookback)
    pred = y_pred[:n]
    true = y_true[lookback : lookback + n]

    c = _corr(pred, true)
    err = np.mean(np.abs(pred - true))
    base = np.mean(np.abs(true))
    assert c >= min_corr, (ckpt, c, min_corr)
    assert err < base, (err, base)  # and still beats predicting silence
    return c


@pytest.mark.parametrize(
    "name,min_corr",
    [
        ("model_comp4c_demo.tar", 0.98),
        ("model_comp4c_4k.tar", 0.95),
        # the measured reference-default production run's model (r04,
        # 1000 epochs x 200k pts/epoch in 45.3 min; corr 0.9958 at ship)
        ("model_comp4c_refdefault.tar", 0.99),
        # large-window variant (8192 in / 3968 out, 4224-sample lookback);
        # corr 0.9926 at ship — the 4k geometry's 0.97 "ceiling" was its
        # 128-sample lookback (docs/ROUND4_NOTES.md "4k lookback study")
        ("model_comp4c_8k4k.tar", 0.98),
    ],
)
def test_shipped_checkpoint_quality(name, min_corr):
    ckpt = os.path.join(REPO, "demo", name)
    assert os.path.exists(ckpt), f"shipped checkpoint missing: {ckpt}"
    _check_checkpoint(ckpt, min_corr)
