#!/usr/bin/env python3
"""Headless demo: sweep a knob across its range and render target-vs-predicted
frames (PNGs + optional mp4 via ffmpeg) — the no-bokeh counterpart of the
slider demo, and the equivalent of the reference's knob-sweep movie maker
(io_methods.py:399-421 makemovie).

Usage:
    python demo/knob_sweep.py <checkpoint.tar> [--effect comp_4c]
        [--knob 0] [--frames 24] [--signal box] [--movie]
"""

import argparse
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="Render a knob sweep of target vs prediction",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("checkpoint")
    parser.add_argument("--effect", default="comp_4c")
    parser.add_argument("--knob", type=int, default=0, help="index of knob to sweep")
    parser.add_argument("--frames", type=int, default=24)
    parser.add_argument("--signal", default="box",
                        choices=["sine", "pluck", "triangle", "box", "amp steps"])
    parser.add_argument("--movie", action="store_true",
                        help="assemble knob_sweep.mp4 with ffmpeg")
    parser.add_argument("--outdir", default="knob_sweep")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from signaltrain_tpu.dsp import effects as fx, synths
    from signaltrain_tpu.utils.load_model import load_model

    chooser = {"sine": 0, "pluck": 2, "triangle": 3, "box": 4, "amp steps": 8}[
        args.signal
    ]
    model, params, rv = load_model(args.checkpoint)
    effect = fx.make_effect(args.effect, sr=model.spec.sr)
    os.makedirs(args.outdir, exist_ok=True)

    t = jnp.arange(model.spec.in_chunk_size, dtype=jnp.float32) / model.spec.sr
    key = jax.random.PRNGKey(0)
    x = synths.synth_input_sample(key, t, chooser, t0_fac=0.35)
    fwd = jax.jit(lambda p, xb, kb: model.module.apply(p, xb, kb)[0])

    kr = np.asarray(effect.knob_ranges)
    mid_nn = np.zeros(len(kr), np.float32)
    sweep_vals = np.linspace(-0.5, 0.5, args.frames)

    n = model.spec.in_chunk_size
    t_out = np.arange(n - model.spec.out_chunk_size, n)
    for f, v in enumerate(sweep_vals):
        knobs_nn = mid_nn.copy()
        knobs_nn[args.knob] = v
        knobs_wc = kr[:, 0] + (knobs_nn + 0.5) * (kr[:, 1] - kr[:, 0])
        y_t, x_in = effect.go(x, jnp.asarray(knobs_nn), key=key)
        y_p = fwd(params, jnp.asarray(x_in)[None], jnp.asarray(knobs_nn)[None])[0]

        plt.figure(figsize=(9, 5))
        title = ", ".join(
            f"{nm}={wv:.3g}" for nm, wv in zip(effect.knob_names, knobs_wc)
        )
        plt.suptitle(f"{effect.name}: {title}")
        plt.plot(np.asarray(x_in), "b", alpha=0.5, label="Input")
        plt.plot(np.asarray(y_t), "r", label="Target")
        plt.plot(t_out, np.asarray(y_p), c=(0, 0.5, 0, 0.85), label="Predicted")
        plt.ylim(-1, 1)
        plt.legend()
        fname = os.path.join(args.outdir, f"sweep_{f:04d}.png")
        plt.savefig(fname)
        plt.close()
        print(f"\rframe {f + 1}/{args.frames} -> {fname}   ", end="")
    print()

    if args.movie:
        if shutil.which("ffmpeg") is None:
            print("ffmpeg not found; skipping movie assembly")
            return
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", "10", "-i",
             os.path.join(args.outdir, "sweep_%04d.png"), "-c:v", "libx264",
             "-vf", "format=yuv420p", "knob_sweep.mp4"],
            check=False,
        )
        print("wrote knob_sweep.mp4")


if __name__ == "__main__":
    main()
