#!/usr/bin/env python3
"""Learning-rate finder (reference: utils/lr_finder.py).

Sweeps log-spaced learning rates 1e-6 -> 4e-3 (150 points, a few batches
each) on a fresh model with on-the-fly data and writes loss-vs-lr to
lrfind.png + lrfind.dat. Pick lr_max around the steepest descent.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description="Learning rate finder",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--effect", default="comp_4c")
    parser.add_argument("-b", "--batch", type=int, default=200)
    parser.add_argument("--path", default=None)
    parser.add_argument("--sr", type=int, default=44100)
    parser.add_argument("--scale", type=float, default=1.0)
    parser.add_argument("--shrink", type=int, default=4)
    parser.add_argument("--npoints", type=int, default=150)
    parser.add_argument("--trials", type=int, default=3, help="batches per LR point")
    parser.add_argument("--lr-min", type=float, default=1e-6)
    parser.add_argument("--lr-max", type=float, default=4e-3)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from signaltrain_tpu.data import synth_data
    from signaltrain_tpu.dsp import effects as fx
    from signaltrain_tpu.models.st_model import st_model
    from signaltrain_tpu.training import loss as loss_mod
    from signaltrain_tpu.training.train import clip_frontend_grads
    from signaltrain_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    effect = fx.make_effect(args.effect, path=args.path, sr=args.sr)
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]
    model = st_model(
        scale_factor=args.scale, shrink_factor=args.shrink,
        num_knobs=effect.num_knobs, sr=args.sr, compute_dtype=dtype,
    )
    spec = model.spec
    params = model.init(jax.random.PRNGKey(0))
    scale = loss_mod.freq_scale(spec.ft_size // 2 + 1)

    batch_fn = synth_data.make_synth_batch_fn(
        effect, spec.in_chunk_size, spec.out_chunk_size, sr=args.sr
    )
    # injectable-LR Adam: the sweep drives the lr each step
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=1e-6)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, lr, i, key):
        keys = synth_data.batch_keys(key, i, args.batch)
        x, y, knobs = batch_fn(keys)

        def loss_fn(p):
            y_hat, _, mag_hat = model.module.apply(p, x, knobs)
            return loss_mod.calc_loss(y_hat, y, mag_hat, scale_by_freq=scale)

        l, grads = jax.value_and_grad(loss_fn)(params)
        grads = clip_frontend_grads(grads)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    lrs = np.logspace(np.log10(args.lr_min), np.log10(args.lr_max), args.npoints)
    losses = []
    key = jax.random.PRNGKey(1)
    i = 0
    for n, lr in enumerate(lrs):
        for _ in range(args.trials):
            params, opt_state, l = step(
                params, opt_state, jnp.asarray(lr, jnp.float32), jnp.asarray(i), key
            )
            i += 1
        losses.append(float(l))
        print(f"\r{n + 1}/{args.npoints}: lr={lr:.2e} loss={losses[-1]:.3e}   ", end="")
        if not np.isfinite(losses[-1]):
            print("\nLoss diverged; stopping sweep")
            lrs = lrs[: len(losses)]
            break

    np.savetxt("lrfind.dat", np.column_stack([lrs[: len(losses)], losses]))
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.semilogx(lrs[: len(losses)], losses)
    plt.xlabel("learning rate")
    plt.ylabel("loss")
    plt.title("LR finder")
    plt.savefig("lrfind.png")
    print("\nSaved lrfind.png / lrfind.dat")


if __name__ == "__main__":
    main()
