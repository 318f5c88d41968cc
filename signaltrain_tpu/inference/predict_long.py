"""Long-audio inference: overlapped chunking as one jitted XLA graph
(reference: utils/predict_long.py:30-97).

The reference slides a window (lookback = chunk - out_chunk), batches up to
200 windows at a time with a host loop and np.append. Here the whole pass —
window extraction, batched forward over all windows, concatenation, tail
trim — is a single jit: windows become a leading axis, batches run under
lax.map with static shapes, and the batch/window axis is shardable across
chips (this workload's 'sequence parallelism', SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..dsp.compressors import mu_compand
from ..ops import framing


def predict_long(
    signal,
    knobs_nn,
    model,
    params,
    chunk_size: int | None = None,
    out_chunk_size: int | None = None,
    sr: int = 44100,
    batch_size: int = 200,
    compand: bool = False,
    mesh=None,
):
    """Process an arbitrarily long 1-D signal; returns the prediction,
    length len(signal) - lookback_head (exactly the reference's output
    alignment: caller zero-pads the head, predict_long.py:221-223).

    With a mesh, each forward batch is sharded over the 'data' axis — the
    window axis is this workload's sequence parallelism (SURVEY.md §5)."""
    chunk_size = chunk_size or model.spec.in_chunk_size
    out_chunk_size = out_chunk_size or model.spec.out_chunk_size
    signal = jnp.asarray(signal, jnp.float32)
    knobs = jnp.asarray(knobs_nn, jnp.float32)

    overlap = chunk_size - out_chunk_size
    n_windows = _num_windows(int(signal.shape[-1]), chunk_size, overlap)
    if mesh is not None:  # batch must tile the data axis
        n_data = mesh.shape["data"]
        batch_size = max(n_data, batch_size - batch_size % n_data)
    y = _predict_windows(
        model, params, signal, knobs, chunk_size, out_chunk_size, overlap,
        n_windows, batch_size, compand, mesh,
    )
    # windows may have been zero-padded at the tail; trim the extras
    unique = chunk_size + (n_windows - 1) * out_chunk_size
    num_extra = unique - int(signal.shape[-1])
    return np.asarray(y[: y.shape[0] - num_extra] if num_extra > 0 else y)


def _num_windows(length: int, size: int, overlap: int) -> int:
    step = size - overlap
    remainder = (length - size) % step
    padded = length if remainder == 0 else length + step - remainder
    return (padded - size) // step + 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "chunk_size", "out_chunk_size", "overlap", "n_windows",
        "batch_size", "compand", "mesh",
    ),
)
def _predict_windows(
    model, params, signal, knobs, chunk_size, out_chunk_size, overlap,
    n_windows, batch_size, compand, mesh=None,
):
    x = framing.sliding_window(signal, chunk_size, overlap=overlap)
    if compand:
        x = mu_compand(x)
    bs = min(batch_size, n_windows)
    if mesh is not None:
        n_data = mesh.shape["data"]
        bs = max(n_data, bs - bs % n_data)
    n_batches = -(-n_windows // bs)
    pad = n_batches * bs - n_windows
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, chunk_size), x.dtype)])
    xb = x.reshape(n_batches, bs, chunk_size)
    knobs_b = jnp.broadcast_to(knobs[None, :], (bs, knobs.shape[-1]))

    def fwd(xi):
        if mesh is not None:
            from ..parallel import mesh as meshlib

            xi = jax.lax.with_sharding_constraint(xi, meshlib.data_sharding(mesh))
        y_hat, _, _ = model.module.apply(params, xi, knobs_b)
        return y_hat

    yb = jax.lax.map(fwd, xb)  # (n_batches, bs, out_chunk)
    y = yb.reshape(n_batches * bs, out_chunk_size)[:n_windows]
    return y.reshape(-1)


def calc_ct(signal, effect, knobs_wc, out_chunk_size, chunk_size, sr=44100, key=None):
    """Chunk-by-chunk 'chunked target' for eval comparison
    (predict_long.py:82-97). Host loop (diagnostic utility, not a hot path)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    lookback_size = chunk_size - out_chunk_size
    if lookback_size < 0:
        return None
    signal = np.asarray(signal, np.float32)
    padded_sig = np.concatenate((np.zeros(lookback_size, dtype=np.float32), signal))
    y_ct = np.zeros(len(padded_sig), dtype=np.float32)
    knobs_wc = jnp.asarray(knobs_wc, jnp.float32)
    for i in np.arange(0, len(padded_sig), out_chunk_size):
        iend = min(i + chunk_size, len(padded_sig))
        in_chunk = padded_sig[i:iend]
        out_chunk, _ = effect.go_wc(jnp.asarray(in_chunk), knobs_wc, key=key)
        out_chunk = np.asarray(out_chunk)
        if len(out_chunk) > out_chunk_size:
            out_chunk = out_chunk[-out_chunk_size:]
        itbgn, itend = iend - len(out_chunk), iend
        y_ct[itbgn:itend] = out_chunk
    return y_ct[lookback_size:]
