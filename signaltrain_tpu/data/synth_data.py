"""On-device synthetic data pipeline.

The reference feeds training with SynthAudioDataSet: 10 CPU dataloader
workers each synthesizing a chunk, applying the (numba) effect, and shipping
it to the GPU (datasets.py:263-334, train.py:247-248). Here the whole chain —
chooser sampling, signal synthesis, Beta(0.8,0.8) knob draw, effect, output
trim, augmentation — is a pure jax function of a PRNG key, vmapped over the
batch and fused INTO the jitted train step. There is no host in the loop and
nothing to parallelize: each device synthesizes exactly the shard it trains
on (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..dsp import synths


def make_synth_batch_fn(
    effect,
    chunk_size: int,
    y_size: int,
    sr: float = 44100.0,
    augment: bool = True,
    choosers: Sequence[int] = synths.DEFAULT_CHOOSERS,
) -> Callable:
    """Returns gen(keys[B]) -> (x[B, chunk], y[B, y_size], knobs[B, K]).

    Semantics of SynthAudioDataSet.gen_single_chunk (datasets.py:312-334):
    chooser uniform over `choosers`, knobs ~ Beta(0.8,0.8)-0.5, effect.go,
    y trimmed to its last y_size samples, then (optionally) the random
    polarity flip of both x and y (do_augment rand_invert, datasets.py:21-29;
    mult_some/add_some are off by default in the reference too).
    """
    t = jnp.arange(chunk_size, dtype=jnp.float32) / sr
    nk = effect.num_knobs

    def gen_aux(key):
        kk, ke, ka = jax.random.split(key, 3)
        knobs = synths.random_ends(kk, (nk,)) - 0.5
        return knobs, ke, ka

    def gen_batch(keys, invariants=None):
        # Inputs come from the stratified per-branch generator (each synth
        # branch computes only its share of the batch); the effect runs
        # natively batched so the Pallas envelope kernel sees (B, N) at once.
        # `invariants` optionally carries the pinknoise cosine table computed
        # once OUTSIDE a multi-step scan (see make_invariants below).
        b = keys.shape[0]
        xs = synths.stratified_synth_batch(keys[0], t, choosers, b,
                                           cos_mat=invariants)
        knobs, eff_keys, aug_keys = jax.vmap(gen_aux)(keys)
        y, x = effect.go_batch(xs, knobs, keys=eff_keys)
        y = y[:, -y_size:]
        if augment:
            sign = jnp.where(
                jax.vmap(jax.random.bernoulli)(aug_keys)[:, None], -1.0, 1.0
            )
            x, y = x * sign, y * sign
        return (
            x.astype(jnp.float32),
            y.astype(jnp.float32),
            knobs.astype(jnp.float32),
        )

    # loop-invariant precompute hook: callers that scan many steps in one
    # device program build the cosine table once and pass it per step.
    # bf16 storage: the table is 67 MB in f32 at chunk 8192, and several
    # synth branches each stream it from HBM per step — halving it halves
    # that traffic; noise shaping needs nowhere near f32 (the np.fft parity
    # test builds its own f32 table at Precision.HIGHEST).
    gen_batch.make_invariants = lambda: synths._irfft_cos_matrix(
        chunk_size
    ).astype(jnp.bfloat16)
    return gen_batch


def batch_keys(base_key, step, batch_size: int):
    """Per-example keys for one step: fold the step counter, then split."""
    return jax.random.split(jax.random.fold_in(base_key, step), batch_size)


def val_step_keys(seed: int, step: int, batch_size: int):
    """Fixed ('recycled') validation keys: the same step always yields the
    same data, emulating the reference's frozen val set (datasets.py:293-300)."""
    return jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(seed), step), batch_size
    )
