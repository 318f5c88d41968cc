"""Misc coverage: plots produce files, training is bit-reproducible from a
seed (an improvement over the reference, whose worker_init explicitly breaks
reproducibility, datasets.py:54-61), banner prints."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from signaltrain_tpu.data import synth_data
from signaltrain_tpu.dsp import effects
from signaltrain_tpu.models.st_model import ModelSpec, STModel
from signaltrain_tpu.training import train as trainlib
from signaltrain_tpu.utils import plots
from signaltrain_tpu.utils.banner import print_choochoo

TINY = ModelSpec(
    scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
    in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
    time_frames=25, output_time_frames=9,
)


def test_plots_write_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    effect = effects.Compressor_4c()
    rs = np.random.RandomState(0)
    x = rs.randn(4, 512).astype(np.float32)
    y = rs.randn(4, 128).astype(np.float32)
    yh = rs.randn(4, 128).astype(np.float32)
    knobs = (rs.rand(4, 4) - 0.5).astype(np.float32)
    plots.plot_valdata(x, knobs, y, yh, effect, epoch=0, loss_val=1e-3,
                       num_plots=2, target_size=128)
    assert os.path.exists("val_data_0.png") and os.path.exists("val_data_1.png")

    model = STModel(TINY)
    params = jax.device_get(model.init(jax.random.PRNGKey(0)))
    mag = np.abs(rs.randn(2, 25, 33)).astype(np.float32)
    mag_hat = np.abs(rs.randn(2, 9, 33)).astype(np.float32)
    plots.plot_spectrograms(params, mag, mag_hat)
    for f in ("mag.png", "mag_hat.png", "conv_anal_real.png", "conv_anal_imag.png",
              "conv_synth_real.png", "conv_synth_imag.png"):
        assert os.path.exists(f), f


def test_training_is_deterministic():
    effect = effects.Compressor_4c()

    def run():
        model = STModel(TINY)
        params = model.init(jax.random.PRNGKey(0))
        tx, _ = trainlib.make_optimizer(1e-4, 64, 1, 8)
        opt_state = tx.init(params)
        batch_fn = synth_data.make_synth_batch_fn(
            effect, TINY.in_chunk_size, TINY.out_chunk_size
        )
        step = trainlib.make_train_step(model, tx, batch_fn, 8)
        for i in range(3):
            params, opt_state, loss = step(params, opt_state, jnp.asarray(i),
                                           jax.random.PRNGKey(42))
        return jax.device_get(params), float(loss)

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_banner(capsys):
    print_choochoo("9.9.9")
    out = capsys.readouterr().out
    assert "signaltrain-tpu 9.9.9" in out


def test_readaudio_generator(tmp_path):
    from signaltrain_tpu.data import audio_io

    rs = np.random.RandomState(0)
    for i in range(2):
        audio_io.write_audio_file(
            str(tmp_path / f"clip{i}.wav"), rs.randn(5000).astype(np.float32)
        )
    gen = audio_io.readaudio_generator(1000, path=str(tmp_path) + "/", sr=44100)
    a = next(gen)
    assert a.shape == (1000,)
    b = gen.send(True)  # switch files
    assert b.shape == (1000,)


def test_resample_halves_length(tmp_path):
    from signaltrain_tpu.data import audio_io

    x = np.sin(np.arange(44100) / 10).astype(np.float32)
    y = audio_io.resample(x, 44100, 22050)
    assert abs(len(y) - 22050) <= 1


def test_async_writer_error_propagates_at_close():
    """A failed observability write (e.g. checkpoint save on a full disk)
    prints immediately but must re-raise from close() so the run cannot end
    looking successful; healthy closures still run after a failure."""
    import pytest

    from signaltrain_tpu.utils import async_io

    w = async_io.AsyncWriter()
    ran = []
    w.submit(lambda: ran.append(1))

    def boom():
        raise OSError("disk full")

    w.submit(boom)
    w.submit(lambda: ran.append(2))
    with pytest.raises(RuntimeError, match="async observability write failed"):
        w.close()
    assert ran == [1, 2]


def test_snapshot_copies_survive_donation():
    """snapshot() is the device-side copy behind async plots/checkpoints:
    the copies must be real (independent of the donated originals), made in
    ONE fused call (it jit-specializes per tree structure — docs/ROUND4_NOTES
    relay-RTT fix), and non-array leaves must pass through untouched."""
    from signaltrain_tpu.utils import async_io

    tree = {
        "w": jnp.arange(6.0).reshape(2, 3),
        "b": jnp.ones((4,), jnp.float32),
        "meta": {"name": "comp_4c", "knobs": 4},
    }
    snap = async_io.snapshot(tree)
    assert snap["meta"] == {"name": "comp_4c", "knobs": 4}
    np.testing.assert_array_equal(np.asarray(snap["w"]), np.asarray(tree["w"]))

    # donate the originals to an in-place-style jit: the snapshot must not
    # change (this is exactly the train loop's params-donation hazard)
    donate = jax.jit(lambda a: a * 0.0, donate_argnums=0)
    donate(tree["w"])
    donate(tree["b"])
    np.testing.assert_array_equal(
        np.asarray(snap["w"]), np.arange(6.0, dtype=np.float32).reshape(2, 3)
    )
    np.testing.assert_array_equal(np.asarray(snap["b"]), np.ones((4,), np.float32))

    # a second, differently-shaped tree re-specializes rather than crashing
    snap2 = async_io.snapshot([jnp.zeros((2,)), "tag"])
    assert snap2[1] == "tag"
    np.testing.assert_array_equal(np.asarray(snap2[0]), np.zeros((2,)))
