"""Long-audio inference: overlapped chunking as one jitted XLA graph
(reference: utils/predict_long.py:30-97).

The reference slides a window (lookback = chunk - out_chunk), batches up to
200 windows at a time with a host loop and np.append. Here the whole pass —
window extraction, batched forward over all windows, tail trim — is a single
jit over static shapes, designed around the three costs that actually matter
on this hardware:

* window extraction is strided-slice framing (ops/framing.py), not a gather
  (a gather costs ~100 ms alone on a 60 s signal);
* ALL windows run as one big batched forward (the MXU wants one large GEMM,
  not a host loop of 200-window batches; very long signals fall back to a
  lax.map over 1024-window super-batches);
* window counts are bucketed (pow2 below 1024, multiples of 1024 above) so
  arbitrary signal lengths hit a handful of compiled graphs instead of one
  per length;
* the input stays device-resident if the caller passes a jax.Array, and
  `return_device=True` returns the (async) device result without forcing the
  device->host pull — callers streaming many clips overlap the fetch of clip
  i with the compute of clip i+1.

The window axis is this workload's sequence parallelism: with a mesh it is
sharded over the 'data' axis (SURVEY.md §5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..data import audio_io
from ..dsp.compressors import mu_compand
from ..ops import framing

_SUPER_BATCH = 1024   # windows per map step on very long signals
_FUSED_MAX = 4096     # up to here: ONE batched forward, no map


def predict_long(
    signal,
    knobs_nn,
    model,
    params,
    chunk_size: int | None = None,
    out_chunk_size: int | None = None,
    sr: int = 44100,
    batch_size: int | None = None,
    compand: bool = False,
    mesh=None,
    return_device: bool = False,
    out_dtype=None,
):
    """Process an arbitrarily long 1-D signal; returns the prediction,
    length len(signal) - lookback_head (exactly the reference's output
    alignment: caller zero-pads the head, predict_long.py:221-223).

    Pass a jax.Array `signal` to keep it device-resident across calls;
    `return_device=True` skips the host pull and returns the jax.Array
    (dispatch is async — block or np.asarray when you need the data).
    `out_dtype="int16"` converts on device and delivers 16-bit PCM (the wav
    wire format) — half the bytes over the host link, which dominates
    end-to-end latency when the device link is slow. `batch_size` is accepted
    for API compatibility; batching is now chosen internally (one fused
    forward, super-batched past 1024 windows).
    """
    del batch_size
    chunk_size = chunk_size or model.spec.in_chunk_size
    out_chunk_size = out_chunk_size or model.spec.out_chunk_size
    if not isinstance(signal, jax.Array):
        signal = jax.device_put(jnp.asarray(signal, jnp.float32))
    signal = signal.astype(jnp.float32)
    knobs = jnp.asarray(knobs_nn, jnp.float32)

    overlap = chunk_size - out_chunk_size
    length = int(signal.shape[-1])
    n_windows = _num_windows(length, chunk_size, overlap)
    n_bucket = _bucket(n_windows, mesh)
    y = _predict_windows(
        model, params, signal, knobs, chunk_size, out_chunk_size, overlap,
        n_bucket, compand, mesh,
    )
    # y covers n_bucket windows; keep the real ones, then trim the zero-pad
    # tail of the last real window (reference predict_long.py:72-79)
    unique = chunk_size + (n_windows - 1) * out_chunk_size
    keep = n_windows * out_chunk_size - max(0, unique - length)
    y = jax.lax.slice_in_dim(y, 0, keep, axis=0)
    if out_dtype is not None and jnp.dtype(out_dtype) == jnp.int16:
        y = _to_pcm16(y)
    elif out_dtype is not None:
        y = y.astype(out_dtype)
    return y if return_device else np.asarray(y)


@jax.jit
def _to_pcm16(y):
    # the shared rounded quantization (data/audio_io.py to_pcm16), device-side
    return audio_io.to_pcm16(y, xp=jnp)


def _num_windows(length: int, size: int, overlap: int) -> int:
    step = size - overlap
    remainder = (length - size) % step
    padded = length if remainder == 0 else length + step - remainder
    return (padded - size) // step + 1


def _bucket(n_windows: int, mesh=None) -> int:
    """Round the window count up to a compile bucket: powers of two up to
    512, multiples of 256 up to _FUSED_MAX (a pow2 scheme padded a 60 s
    clip's 1292 windows to 2048 — 58% wasted forward compute; 256-steps cap
    the pad at ~20% for one compiled graph per ~12 s of audio), multiples of
    _SUPER_BATCH beyond (the lax.map path needs that divisibility)."""
    n = max(16, int(n_windows))
    if n <= 512:
        b = 1 << (n - 1).bit_length()
    elif n <= _FUSED_MAX:
        b = -(-n // 256) * 256
    else:
        b = -(-n // _SUPER_BATCH) * _SUPER_BATCH
    if mesh is not None:
        n_data = mesh.shape["data"]
        b = -(-b // n_data) * n_data
    return b


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "chunk_size", "out_chunk_size", "overlap", "n_bucket",
        "compand", "mesh",
    ),
)
def _predict_windows(
    model, params, signal, knobs, chunk_size, out_chunk_size, overlap,
    n_bucket, compand, mesh=None,
):
    # zero-pad the signal so exactly n_bucket windows tile it; padding
    # windows are all-zero and sliced away by the caller
    need = chunk_size + (n_bucket - 1) * out_chunk_size
    if need > signal.shape[-1]:
        signal = jnp.pad(signal, (0, need - signal.shape[-1]))
    else:
        signal = signal[:need]
    x = framing.sliding_window(signal, chunk_size, overlap=overlap)
    x = x[:n_bucket]
    if compand:
        x = mu_compand(x)
    if mesh is not None:
        from ..parallel import mesh as meshlib

        x = jax.lax.with_sharding_constraint(x, meshlib.data_sharding(mesh))

    def fwd(xi):
        kb = jnp.broadcast_to(knobs[None, :], (xi.shape[0], knobs.shape[-1]))
        y_hat, _, _ = model.module.apply(params, xi, kb)
        return y_hat

    if n_bucket <= _FUSED_MAX:
        y = fwd(x)
    else:
        xb = x.reshape(n_bucket // _SUPER_BATCH, _SUPER_BATCH, chunk_size)
        y = jax.lax.map(fwd, xb)
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
