"""The reference's package surface must work with an import swap:
`import signaltrain_tpu as st` supports the idioms of
`import signaltrain as st` (reference signaltrain/__init__.py)."""

import numpy as np

import signaltrain_tpu as st


def test_submodules_resolve():
    for name in ("audio", "datasets", "io_methods", "learningrate",
                 "loss_functions", "nn_proc", "misc", "train"):
        assert getattr(st, name) is not None


def test_audio_effect_idiom():
    effect = st.audio.Compressor_4c()
    st.audio.seed(218)
    t = np.arange(4096, dtype=np.float32) / 44100.0
    x = st.audio.synth_input_sample(t, 4)
    y, x2 = effect.go(x, np.zeros(4, np.float32))
    assert np.asarray(y).shape == (4096,)
    assert np.all(np.isfinite(np.asarray(y)))


def test_audio_helpers():
    out = st.audio.sliding_window(np.arange(10), 5, overlap=2)
    np.testing.assert_array_equal(out, [[0, 1, 2, 3, 4], [3, 4, 5, 6, 7],
                                        [6, 7, 8, 9, 0]])
    assert st.audio.int2knobs(1234, [[0, 9]] * 4, 10) == [1.0, 2.0, 3.0, 4.0]
    np.testing.assert_allclose(
        st.audio.mu_decompand(st.audio.mu_compand(np.linspace(-1, 1, 11))),
        np.linspace(-1, 1, 11), atol=1e-6,
    )
    assert st.audio.my_clip_min(np.array([-5.0, 3.0]), 0.0).tolist() == [0.0, 3.0]


def test_learningrate_and_loss():
    lrs, moms = st.learningrate.get_1cycle_schedule(1e-4, 800, 2, 40)
    assert lrs.shape == moms.shape == (40,)
    import jax.numpy as jnp

    l = float(st.loss_functions.calc_loss(
        jnp.zeros((2, 10)), jnp.zeros((2, 10)), jnp.ones((2, 3, 5))
    ))
    assert l > 0


def test_nn_proc_st_model_signature():
    model = st.nn_proc.st_model(scale_factor=1, shrink_factor=4, num_knobs=3,
                                sr=44100)
    assert model.spec.in_chunk_size == 8192
    assert model.spec.out_chunk_size == 2048


def test_synth_dataset_facade_recycles():
    effect = st.audio.Compressor_4c()
    ds = st.datasets.SynthAudioDataSet(512, effect, datapoints=4, y_size=128,
                                       recycle=True)
    assert len(ds) == 4
    a1, b1, c1 = ds[2]
    a2, b2, c2 = ds[2]
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(c1, c2)
    batches = list(ds.batches(2, steps=2))
    assert batches[0][0].shape == (2, 512)


def test_misc_checkpoint_facade(tmp_path):
    model = st.nn_proc.st_model(num_knobs=4)
    import jax

    params = jax.device_get(model.init(jax.random.PRNGKey(0)))
    effect = st.audio.Compressor_4c()
    st.misc.save_checkpoint(str(tmp_path / "c.tar"), params, model.spec,
                            effect, epoch=0)
    p2, rv = st.misc.load_checkpoint(str(tmp_path / "c.tar"))
    assert rv["effect_name"] == "Compressor_4c"
