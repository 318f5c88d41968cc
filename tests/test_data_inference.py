"""End-to-end data pipeline + inference tests: gen_dataset CLI round-trip,
FileDataset/FileEffect loading, stratified synth batches, predict_long
geometry, and checkpoint-driven CLI inference."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from signaltrain_tpu.data import audio_io, file_data, synth_data
from signaltrain_tpu.dsp import effects, synths

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPU_ENV = {
    **os.environ,
    "PALLAS_AXON_POOL_IPS": "",  # disable the axon TPU plugin
    "JAX_PLATFORMS": "cpu",
}


def test_stratified_synth_batch_stats():
    t = jnp.arange(4096, dtype=jnp.float32) / 44100.0
    x = synths.stratified_synth_batch(jax.random.PRNGKey(0), t, batch=13)
    x = np.asarray(x)
    assert x.shape == (13, 4096)
    assert np.all(np.isfinite(x))
    # different examples are different signals
    assert np.std(x[0] - x[1]) > 1e-4


def test_synth_batch_fn_shapes_and_recycle():
    e = effects.Compressor_4c()
    bf = synth_data.make_synth_batch_fn(e, 2048, 512)
    keys = synth_data.val_step_keys(7, 0, 6)
    x1, y1, k1 = bf(keys)
    x2, y2, k2 = bf(synth_data.val_step_keys(7, 0, 6))  # same step -> same data
    assert x1.shape == (6, 2048) and y1.shape == (6, 512) and k1.shape == (6, 4)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    x3, _, _ = bf(synth_data.val_step_keys(7, 1, 6))  # different step -> new data
    assert np.std(np.asarray(x1) - np.asarray(x3)) > 1e-4


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    """Generate a tiny file dataset through the real CLI (subprocess)."""
    root = tmp_path_factory.mktemp("ds")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "gen_dataset.py"),
         "mydata", "--dur", "0.2", "--sp", "2", "-e", "comp_4c",
         "--device-batch", "8"],
        cwd=root, env=CPU_ENV, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return os.path.join(root, "mydata")


def test_gen_dataset_layout(tiny_dataset):
    ds = tiny_dataset
    assert os.path.exists(os.path.join(ds, "effect_info.ini"))
    train_in = sorted(os.listdir(os.path.join(ds, "Train")))
    val_in = [f for f in os.listdir(os.path.join(ds, "Val")) if f.startswith("input")]
    # sp=2, 4 knobs -> 16 grid files, 20 total; split rule i/num > 0.8
    # puts i=17..19 in Val (gen_dataset.py:111-114), so Train gets 17
    # (one extra with random knobs beyond the grid).
    n_train_in = len([f for f in train_in if f.startswith("input")])
    assert n_train_in == 17
    assert len(val_in) == 3
    # filename convention: target_<i>_<Effect>__k1__k2__k3__k4.wav
    tname = [f for f in train_in if f.startswith("target_0_")][0]
    assert tname.startswith("target_0_Compressor_4c__")
    knobs = file_data.parse_knob_string(tname)
    assert knobs.shape == (4,)
    # grid corner: file 0 should be all-min knobs (int2knobs little-endian)
    np.testing.assert_allclose(knobs, [-30.0, 1.0, 1e-3, 1e-3], rtol=1e-3)


def test_gen_dataset_audio_matches_effect(tiny_dataset):
    """The written target wav must equal the effect applied to the input wav
    at the filename's knob values."""
    ds = os.path.join(tiny_dataset, "Train")
    tname = [f for f in sorted(os.listdir(ds)) if f.startswith("target_3_")][0]
    x, _ = audio_io.read_audio_file(os.path.join(ds, "input_3_.wav"), warn=False)
    y, _ = audio_io.read_audio_file(os.path.join(ds, tname), warn=False)
    kw = file_data.parse_knob_string(tname)
    e = effects.Compressor_4c()
    y2, _ = e.go_wc(jnp.asarray(x), jnp.asarray(kw))
    np.testing.assert_allclose(y, np.asarray(y2), atol=2e-4)


def test_file_effect_reads_ini(tiny_dataset):
    fe = effects.make_effect("files", path=tiny_dataset)
    assert fe.name == "Compressor_4c(files)"
    assert fe.knob_names == ["threshold", "ratio", "attackTime", "releaseTime"]
    np.testing.assert_allclose(fe.knob_ranges[0], [-30, 0])


def test_file_dataset_batches(tiny_dataset):
    e = effects.Compressor_4c()
    ds = file_data.FileDataset(
        os.path.join(tiny_dataset, "Train"), e, chunk_size=2048, y_size=512
    )
    assert ds.device_resident
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    x, y, knobs = jax.jit(ds.batch_fn)(keys)
    assert x.shape == (5, 2048) and y.shape == (5, 512) and knobs.shape == (5, 4)
    assert np.all(np.abs(np.asarray(knobs)) <= 0.5 + 1e-6)
    assert np.all(np.isfinite(np.asarray(x)))


def test_file_dataset_host_path(tiny_dataset):
    e = effects.Compressor_4c()
    ds = file_data.FileDataset(
        os.path.join(tiny_dataset, "Train"), e, chunk_size=2048, y_size=512,
        device_resident_limit_bytes=1,  # force host path
    )
    assert not ds.device_resident
    rng = np.random.default_rng(0)
    x, y, knobs = ds.host_batch(4, rng)
    assert x.shape == (4, 2048) and y.shape == (4, 512) and knobs.shape == (4, 4)


def test_gen_dataset_host_backend(tmp_path):
    """--backend host (jax-on-CPU synthesis + native C++ compressor,
    VERDICT r2 item 3): same layout/filename convention, and the written
    target equals the JAX effect applied to the written input at the
    filename's knobs (C++ kernel parity is pinned separately in
    test_native_oracle.py)."""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "gen_dataset.py"),
         "hd", "--dur", "0.2", "-n", "6", "-e", "comp_4c",
         "--device-batch", "4", "--backend", "host", "--workers", "1"],
        cwd=tmp_path, env=CPU_ENV, capture_output=True, text=True, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "host backend:" in out.stdout
    ds = tmp_path / "hd" / "Train"
    names = sorted(os.listdir(ds))
    ins = [f for f in names if f.startswith("input")]
    tgts = [f for f in names if f.startswith("target")]
    assert len(ins) == len(tgts) >= 4
    tname = [f for f in tgts if f.startswith("target_1_")][0]
    x, _ = audio_io.read_audio_file(str(ds / "input_1_.wav"), warn=False)
    y, _ = audio_io.read_audio_file(str(ds / tname), warn=False)
    kw = file_data.parse_knob_string(tname)
    e = effects.Compressor_4c()
    y2, _ = e.go_wc(jnp.asarray(x), jnp.asarray(kw))
    np.testing.assert_allclose(y, np.asarray(y2), atol=2e-4)


def test_gen_dataset_host_backend_multiworker(tmp_path):
    """--backend host --workers 2 exercises the spawn + per-worker
    initializer pool path (cli/gen_dataset.py:_gen_host_data), which the
    workers=1 test bypasses (VERDICT r3 item 3). Per-task seeding is
    fold_in(seed, task_start) and the knob table is computed in the parent,
    so the output must be byte-identical to the single-worker run."""
    for workers, name in (("1", "w1"), ("2", "w2")):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "gen_dataset.py"),
             name, "--dur", "0.2", "-n", "6", "-e", "comp_4c",
             "--device-batch", "2", "--backend", "host", "--workers", workers],
            cwd=tmp_path, env=CPU_ENV, capture_output=True, text=True,
            timeout=1800,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert f"{workers} worker(s)" in out.stdout
    for split in ("Train", "Val"):
        w1 = sorted(os.listdir(tmp_path / "w1" / split))
        w2 = sorted(os.listdir(tmp_path / "w2" / split))
        assert w1 == w2 and len(w1) >= 2
        for name in w1:
            if not name.endswith(".wav"):
                continue
            with open(tmp_path / "w1" / split / name, "rb") as f1, \
                 open(tmp_path / "w2" / split / name, "rb") as f2:
                assert f1.read() == f2.read(), f"{split}/{name} differs"


def test_gen_dataset_pcm16(tmp_path):
    """--pcm16 writes 16-bit wavs whose content matches the float32 output
    of the same seed to within one LSB, at half the bytes."""
    for flag in ([], ["--pcm16"]):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "gen_dataset.py"),
             "f32" if not flag else "p16", "--dur", "0.2", "-n", "6",
             "-e", "comp_4c", "--device-batch", "8"] + flag,
            cwd=tmp_path, env=CPU_ENV, capture_output=True, text=True,
            timeout=1200,
        )
        assert out.returncode == 0, out.stderr[-2000:]
    from scipy.io import wavfile

    f32 = sorted(os.listdir(tmp_path / "f32" / "Train"))
    p16 = sorted(os.listdir(tmp_path / "p16" / "Train"))
    assert f32 == p16 and len(f32) >= 2
    for name in f32[:4]:
        _, a = wavfile.read(str(tmp_path / "f32" / "Train" / name))
        _, b = wavfile.read(str(tmp_path / "p16" / "Train" / name))
        assert a.dtype == np.float32 and b.dtype == np.int16
        np.testing.assert_allclose(b / 32767.0, a, atol=1.01 / 32767.0)
    size_f32 = os.path.getsize(str(tmp_path / "f32" / "Train" / f32[0]))
    size_p16 = os.path.getsize(str(tmp_path / "p16" / "Train" / f32[0]))
    assert size_p16 < 0.6 * size_f32


def test_file_dataset_int16_tier_exact(tmp_path):
    """The int16-resident tier (doubles HBM capacity; the 21 GB LA2A corpus
    fits a 16 GB chip this way) must reproduce 16-bit wav samples EXACTLY
    after the on-device dequantize."""
    import os as _os
    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    d = tmp_path / "Train"
    _os.makedirs(d)
    for i in range(3):
        x = rng.integers(-32768, 32767, size=4000).astype(np.int16)
        y = (x // 2).astype(np.int16)
        wavfile.write(str(d / f"input_{i}_.wav"), 44100, x)
        wavfile.write(str(d / f"target_{i}_Fx__-15.0.wav"), 44100, y)

    e = effects.Comp_Just_Thresh()
    kw = dict(chunk_size=512, y_size=512, augment=False)
    ds_f32 = file_data.FileDataset(str(d), e, **kw)
    bytes_f32 = 2 * 3 * 4000 * 4
    ds_i16 = file_data.FileDataset(
        str(d), e, device_resident_limit_bytes=bytes_f32 - 1, **kw
    )
    assert ds_f32.device_resident and not ds_f32.device_resident_int16
    assert ds_i16.device_resident and ds_i16.device_resident_int16
    assert ds_i16.x.dtype == jnp.int16

    keys = jax.random.split(jax.random.PRNGKey(5), 6)
    xa, ya, ka = jax.jit(ds_f32.batch_fn)(keys)
    xb, yb, kb = jax.jit(ds_i16.batch_fn)(keys)
    # the dequantized floats agree to ~1 ulp (XLA lowers /32767 as a
    # reciprocal multiply); the 16-bit CONTENT round-trips exactly:
    for a, b in ((xa, xb), (ya, yb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-7)
        np.testing.assert_array_equal(
            np.round(np.asarray(a) * 32767.0), np.round(np.asarray(b) * 32767.0)
        )
    np.testing.assert_array_equal(np.asarray(ka), np.asarray(kb))


def test_file_dataset_prefetcher_matches_sync(tiny_dataset):
    """The async double-buffered pipeline yields the exact batch stream the
    synchronous host_batch sampler produces (same rng, in order)."""
    e = effects.Compressor_4c()
    mk = lambda: file_data.FileDataset(
        os.path.join(tiny_dataset, "Train"), e, chunk_size=2048, y_size=512,
        device_resident_limit_bytes=1,
    )
    ds_a, ds_b = mk(), mk()
    pf = ds_a.prefetch_batches(4, np.random.default_rng(0))
    rng = np.random.default_rng(0)
    try:
        for _ in range(3):
            xa, ya, ka = pf.next()
            xb, yb, kb = ds_b.host_batch(4, rng)
            np.testing.assert_array_equal(np.asarray(xa), xb)
            np.testing.assert_array_equal(np.asarray(ya), yb)
            np.testing.assert_array_equal(np.asarray(ka), kb)
    finally:
        pf.close()


def test_predict_long_geometry():
    from signaltrain_tpu.inference import predict_long as pl
    from signaltrain_tpu.models.st_model import st_model

    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(0))
    sig_len = 50000
    t = np.arange(sig_len) / 44100.0
    signal = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    y = pl.predict_long(signal, np.zeros(4, np.float32), model, params,
                        batch_size=16)
    # output covers len(signal) - lookback samples (predict_long.py:72-79)
    lookback = model.spec.in_chunk_size - model.spec.out_chunk_size
    assert y.shape == (sig_len - lookback,)
    assert np.all(np.isfinite(y))


def test_calc_ct_matches_stream_for_memoryless_gain():
    """For a near-instant compressor, chunked and streamed targets agree in
    the interior (the property predict_long's eval relies on)."""
    from signaltrain_tpu.inference.predict_long import calc_ct

    e = effects.Compressor_4c()
    rs = np.random.RandomState(0)
    sig = (rs.randn(16384) * 0.4).astype(np.float32)
    kw = np.array([-20.0, 3.0, 1e-3, 1e-3], np.float32)
    y_st, _ = e.go_wc(jnp.asarray(sig), jnp.asarray(kw))
    y_ct = calc_ct(sig, e, kw, 2048, 8192)
    err = np.abs(np.asarray(y_st)[8192:] - y_ct[8192:])
    assert np.mean(err) < 2e-2


def test_predict_long_cli_roundtrip(tmp_path):
    """Drive cli/predict_long.py as a user would (subprocess, CPU): the
    overlapped-delivery path must still write the reference's artifact set
    (pl_input/pl_pred/pl_st/pl_ct, knob-tagged, pred zero-padded at the
    head), and --pcm16 must deliver the same audio as the float path to
    16-bit quantization. Uses the shipped demo checkpoint (4096->3968)."""
    from scipy.io import wavfile

    ckpt = os.path.join(REPO, "demo", "model_comp4c_4k.tar")
    sr = 44100
    t = np.arange(int(1.2 * sr), dtype=np.float32) / sr
    sig = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    audio_io.write_audio_file(str(tmp_path / "clip.wav"), sig, sr=sr)

    def run(workdir, *extra):
        os.makedirs(workdir, exist_ok=True)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "cli", "predict_long.py"),
             ckpt, str(tmp_path / "clip.wav"),
             "-e", "comp_4c", "--knobs=-20,3,0.005,0.02", *extra],
            cwd=workdir, env=CPU_ENV, capture_output=True, text=True,
            timeout=1200,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return {f.split("__")[0]: f for f in os.listdir(workdir)}

    f32 = run(tmp_path / "f32")
    for stem in ("pl_input", "pl_pred", "pl_st", "pl_ct"):
        assert stem in f32, f32
    _, x_in = wavfile.read(str(tmp_path / "f32" / f32["pl_input"]))
    _, y_f32 = wavfile.read(str(tmp_path / "f32" / f32["pl_pred"]))
    assert x_in.dtype == np.float32 and y_f32.dtype == np.float32
    assert len(y_f32) == len(sig)  # head zero-padded to input length
    assert np.any(y_f32 != 0)

    p16 = run(tmp_path / "p16", "--pcm16")
    _, x16 = wavfile.read(str(tmp_path / "p16" / p16["pl_input"]))
    _, y16 = wavfile.read(str(tmp_path / "p16" / p16["pl_pred"]))
    assert x16.dtype == np.int16 and y16.dtype == np.int16
    np.testing.assert_allclose(
        y16.astype(np.float32) / 32767.0, np.clip(y_f32, -1, 1), atol=2 / 32767.0
    )


@pytest.mark.slow
def test_train_host_data_end_to_end(tiny_dataset, tmp_path, monkeypatch, capsys):
    """train() on a file corpus forced to the host-RAM tier — the prefetcher
    epoch loop (per-step device calls fed by the async host pipeline) and the
    host-side val pass, which no other test drives end-to-end. Also pins the
    ST_TPU_TIMING instrumentation on this path: the [timing] line must carry
    real fetch/dispatch/eval buckets, not lump everything into 'other'
    (round-4 review finding)."""
    import functools

    from signaltrain_tpu.data import file_data as fd
    from signaltrain_tpu.training.train import train

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("ST_TPU_TIMING", "1")
    monkeypatch.setattr(
        fd, "FileDataset",
        functools.partial(fd.FileDataset, device_resident_limit_bytes=1),
    )

    model, params = train(
        effects.Compressor_4c(),
        epochs=2,
        n_data_points=32,
        batch_size=8,
        datapath=tiny_dataset,
        compute_dtype=jnp.float32,
        cp_every=2,
        make_plots=False,
    )
    assert os.path.exists("vl_avg_out.dat")
    assert os.path.exists("val_err_mae.dat")
    assert os.path.exists("modelcheckpoint.tar")
    assert len(open("vl_avg_out.dat").read().strip().splitlines()) == 2

    timing_lines = [
        ln for ln in capsys.readouterr().err.splitlines() if "[timing]" in ln
    ]
    assert len(timing_lines) == 2, timing_lines
    for ln in timing_lines:
        for bucket in ("fetch=", "dispatch=", "eval=", "pending="):
            assert bucket in ln, ln
    # the buckets must account for the bulk of the epoch on this path
    # (the review finding was everything billed to 'other')
    last = dict(
        kv.split("=", 1) for kv in timing_lines[-1].split() if "=" in kv
    )
    tot = float(last["total"].rstrip("s"))
    # All NAMED buckets together must account for a substantial share. The
    # regression this guards (round-4 finding) billed ~everything to
    # 'other', so a one-third floor is decisive — while staying robust to
    # CPU contention, under which BOTH the torch-format checkpoint write
    # (cp, an attributed bucket the old sum ignored) and unattributed
    # host-python gaps legitimately balloon on a tiny 2-epoch run
    # (measured: 3x-oversubscribed box -> other=57%, acc=43%).
    acc = sum(
        float(last[k])
        for k in ("fetch", "dispatch", "eval", "evproc", "cp", "pending")
    )
    assert acc > tot / 3, timing_lines[-1]
