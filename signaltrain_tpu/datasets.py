"""Reference-API facade for signaltrain.datasets.

SynthAudioDataSet / AudioFileDataSet keep the reference's constructor
signatures (datasets.py:64-334) and indexable-dataset feel, but are backed by
the on-device batched pipelines (data/synth_data.py, data/file_data.py):
__getitem__ returns numpy triples; batches() yields whole device batches,
which is the efficient path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .data import file_data, synth_data


class SynthAudioDataSet:
    """On-the-fly synthesized (x, y, knobs) examples (datasets.py:263-334).

    recycle=True freezes the stream: item idx is always the same (the
    reference's static validation set)."""

    def __init__(self, chunk_size, effect, sr=44100, datapoints=8000,
                 recycle=False, y_size=None, augment=True, seed=0):
        self.chunk_size = chunk_size
        self.effect = effect
        self.sr = sr
        self.datapoints = datapoints
        self.recycle = recycle
        self.y_size = chunk_size if y_size is None else y_size
        self.num_knobs = effect.num_knobs
        self._gen = synth_data.make_synth_batch_fn(
            effect, chunk_size, self.y_size, sr=sr, augment=augment
        )
        self._gen1 = jax.jit(self._gen)
        self._seed = seed
        self._draws = 0

    def __len__(self):
        return self.datapoints

    def __getitem__(self, idx):
        if self.recycle:
            keys = synth_data.val_step_keys(self._seed, idx, 1)
        else:
            keys = synth_data.batch_keys(
                jax.random.PRNGKey(self._seed), self._draws, 1
            )
            self._draws += 1
        x, y, knobs = self._gen1(keys)
        return np.asarray(x[0]), np.asarray(y[0]), np.asarray(knobs[0])

    def batches(self, batch_size, steps=None, seed=None):
        """Yield (x, y, knobs) device batches — the efficient interface."""
        steps = steps if steps is not None else max(1, self.datapoints // batch_size)
        base = jax.random.PRNGKey(self._seed if seed is None else seed)
        for i in range(steps):
            keys = (
                synth_data.val_step_keys(self._seed, i, batch_size)
                if self.recycle
                else synth_data.batch_keys(base, i, batch_size)
            )
            yield self._gen(keys)


class AudioFileDataSet(file_data.FileDataset):
    """Pre-recorded file dataset (datasets.py:64-259); see
    data.file_data.FileDataset for the device-resident sampling design."""

    def __init__(self, chunk_size, effect, sr=44100, path="./Train/",
                 datapoints=8000, preload=True, rerun=False, y_size=None,
                 augment=True, align_end=True, compand=False, **kw):
        del preload  # always preloads (host or device residency is automatic)
        super().__init__(
            path, effect, chunk_size, y_size=y_size, sr=sr, rerun=rerun,
            augment=augment, align_end=align_end, compand=compand, **kw,
        )
        self.datapoints = datapoints
        self._draws = 0

    def __len__(self):
        return self.datapoints

    def __getitem__(self, idx):
        if self.device_resident:
            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), self._draws), 1
            )
            self._draws += 1
            x, y, knobs = self.batch_fn(keys)
            return np.asarray(x[0]), np.asarray(y[0]), np.asarray(knobs[0])
        rng = np.random.default_rng(self._draws)
        self._draws += 1
        x, y, knobs = self.host_batch(1, rng)
        return x[0], y[0], knobs[0]


def do_augment(x, y, rand_invert=True, mult_some=False, add_some=False,
               rng=None):
    """Host-side augmentation helper (datasets.py:21-51); the device pipeline
    applies the rand_invert flip internally."""
    rng = rng or np.random.default_rng()
    if rand_invert and rng.random() < 0.5:
        x, y = -x, -y
    lookback = x.size - y.size
    if mult_some and rng.random() < 0.5:
        n = int(lookback * 0.2)
        idx = rng.integers(0, lookback, size=n)
        x[idx] = x[idx] * (2 * rng.random(n) - 1).astype(x.dtype)
    if add_some and rng.random() < 0.5:
        n = int(lookback * 0.3)
        idx = rng.integers(0, lookback, size=n)
        tiny = np.max(x) / 1e6
        x[idx] = x[idx] + (tiny * (2 * rng.random(n) - 1)).astype(x.dtype)
    return x, y
