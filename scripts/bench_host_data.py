#!/usr/bin/env python3
"""Host-RAM data-path benchmark (BASELINE config 4 / VERDICT r1 item 7).

Builds a synthetic host-resident corpus of LA2A-like scale (default ~8 GB —
too big for the HBM-resident path, like the 21 GB Zenodo set), then measures
sustained train-step wall time three ways:

  device   — on-device synth datagen fused into the step (the upper bound)
  sync     — host_batch sampled + transferred synchronously per step
  prefetch — the async double-buffered pipeline (prefetch_batches)

Goal: prefetch within ~10% of the device-data step time (the reference needs
10 DataLoader workers for the same reason, train.py:247-248).

Usage: python scripts/bench_host_data.py [--gb 8] [--steps 30] [--batch 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=8.0)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from signaltrain_tpu.data import file_data, synth_data
    from signaltrain_tpu.dsp import effects
    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.training import train as trainlib
    from signaltrain_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    effect = effects.Compressor_4c()
    model = st_model(num_knobs=4, compute_dtype=jnp.bfloat16)
    spec = model.spec

    # ---- synthetic corpus, built directly in host RAM (no disk round-trip):
    # F files of L samples so that 2*F*L*4 bytes ~= --gb
    L = 2_000_000  # ~45 s per "file" @ 44.1 kHz
    F = max(4, int(args.gb * 1e9 / (2 * L * 4)))
    print(f"building synthetic corpus: {F} files x {L} samples "
          f"(~{2 * F * L * 4 / 1e9:.1f} GB host RAM)")
    rng = np.random.default_rng(0)
    ds = file_data.FileDataset.__new__(file_data.FileDataset)
    ds.effect = effect
    ds.chunk_size = spec.in_chunk_size
    ds.y_size = spec.out_chunk_size
    ds.sr = spec.sr
    ds.rerun = False
    ds.augment = True
    ds.compand = False
    ds.device_resident = False
    ds.x = rng.standard_normal((F, L), dtype=np.float32) * 0.1
    ds.y = (ds.x * 0.5).astype(np.float32)
    ds.lengths = np.full((F,), L, np.int32)
    ds.knobs_nn = rng.uniform(-0.5, 0.5, size=(F, 4)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0))
    tx, _ = trainlib.make_optimizer(1e-4, 200_000, 1000, args.batch)
    opt = tx.init(params)
    step_arr = trainlib.make_train_step_from_arrays(model, tx)

    def run(get_batch, label, n):
        nonlocal params, opt
        # warmup / compile
        xb, yb, kb = get_batch()
        params, opt, l = step_arr(params, opt, xb, yb, kb)
        jax.block_until_ready(l)
        t0 = time.perf_counter()
        for _ in range(n):
            xb, yb, kb = get_batch()
            params, opt, l = step_arr(params, opt, xb, yb, kb)
        jax.block_until_ready(l)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:9s}: {dt * 1e3:8.2f} ms/step")
        return dt

    # device-data upper bound: same arrays-in step fed from device-resident
    # crops (what the HBM path would do), via the fused synth pipeline
    batch_fn = synth_data.make_synth_batch_fn(
        effect, spec.in_chunk_size, spec.out_chunk_size, sr=spec.sr
    )
    synth_step = trainlib.make_train_multi_step(model, tx, batch_fn, args.batch, 10)
    p2, o2 = model.init(jax.random.PRNGKey(0)), None
    o2 = tx.init(p2)
    p2, o2, ls = synth_step(p2, o2, jnp.asarray(0), jax.random.PRNGKey(1))
    jax.block_until_ready(ls)
    t0 = time.perf_counter()
    for i in range(3):
        p2, o2, ls = synth_step(p2, o2, jnp.asarray(10 * i), jax.random.PRNGKey(1))
    jax.block_until_ready(ls)
    dt_dev = (time.perf_counter() - t0) / 30
    print(f"{'device':9s}: {dt_dev * 1e3:8.2f} ms/step  (fused on-device datagen)")

    host_rng = np.random.default_rng(1)
    dt_sync = run(lambda: ds.host_batch(args.batch, host_rng), "sync", args.steps)

    pf = ds.prefetch_batches(args.batch, np.random.default_rng(2))
    try:
        dt_pre = run(pf.next, "prefetch", args.steps)
    finally:
        pf.close()

    print(
        f"prefetch overhead vs device-data: "
        f"{(dt_pre - dt_dev) / dt_dev * 100:+.1f}%  "
        f"(sync was {(dt_sync - dt_dev) / dt_dev * 100:+.1f}%)",
        flush=True,
    )

    # int16-resident tier: the corpus at its native 16-bit depth lives in
    # HBM (half the f32 bytes — how the 21 GB LA2A set fits a 16 GB chip)
    # and batches are cropped+dequantized on device like the f32 path.
    to_i16 = lambda a: np.clip(np.round(a * 32767.0), -32768, 32767).astype(np.int16)
    print("uploading int16 corpus to device "
          f"(~{F * L * 2 * 2 / 1e9:.1f} GB, one-time)...", flush=True)
    ds.x = jax.device_put(to_i16(ds.x))
    ds.y = jax.device_put(to_i16(ds.y))
    ds._lengths = jnp.asarray(ds.lengths)
    ds._knobs = jnp.asarray(ds.knobs_nn)
    ds.device_resident = True
    ds.device_resident_int16 = True
    jax.block_until_ready(ds.y)

    step_i16 = trainlib.make_train_multi_step(model, tx, ds.batch_fn, args.batch, 10)
    p3 = model.init(jax.random.PRNGKey(0))
    o3 = tx.init(p3)
    p3, o3, ls = step_i16(p3, o3, jnp.asarray(0), jax.random.PRNGKey(2))
    jax.block_until_ready(ls)
    t0 = time.perf_counter()
    for i in range(3):
        p3, o3, ls = step_i16(p3, o3, jnp.asarray(10 * i), jax.random.PRNGKey(2))
    jax.block_until_ready(ls)
    dt_i16 = (time.perf_counter() - t0) / 30
    print(f"{'int16-dev':9s}: {dt_i16 * 1e3:8.2f} ms/step  "
          f"({(dt_i16 - dt_dev) / dt_dev * 100:+.1f}% vs on-device synth)")


if __name__ == "__main__":
    main()
