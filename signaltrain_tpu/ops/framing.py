"""Static-shape framing and overlap-add primitives.

TPU-first design notes
----------------------
The reference implements its trainable STFT/iSTFT as strided
Conv1d/ConvTranspose1d (cls_fe_dft.py:28-31, 78-82). On TPU the FLOPs of both
directions are plain GEMMs once the signal is framed; framing and overlap-add
are pure data movement. We therefore express the front-end as

    frames = frame_signal(pad(x))          # gather / reshape, no FLOPs
    spec   = frames @ W.T                  # one MXU GEMM
    ...
    frames = spec @ W_syn                  # one MXU GEMM
    wave   = overlap_add(frames)           # 3 shifted adds, no FLOPs

which lets XLA keep everything on the MXU with static shapes. All functions
here are shape-static and jittable.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def num_frames(length: int, ft_size: int, hop_size: int, pad: int) -> int:
    """Number of frames a Conv1d(kernel=ft, stride=hop, padding=pad) emits."""
    return (length + 2 * pad - ft_size) // hop_size + 1


# Framing is pure data movement, but HOW it is expressed decides the cost on
# TPU: a (T, ft) advanced-index gather lowers to a generic XLA gather that
# runs orders of magnitude below HBM bandwidth (measured ~100 ms to frame a
# 60 s signal into predict_long windows). Because size and hop share a large
# gcd g in every model geometry (1024/384 -> g=128; 8192/2048 -> g=2048), the
# signal can instead be viewed as contiguous g-sample blocks, where frame t's
# j-th block is block[t*(hop/g) + j] — a STRIDED SLICE per j. size/g slices +
# one stack replace the gather with copies XLA executes at memory speed.
_MAX_SLICE_PARTS = 64


def _gcd_blocks(size: int, step: int) -> tuple[int, int, int]:
    g = math.gcd(size, step)
    return g, size // g, step // g


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def frame_signal(x: jnp.ndarray, ft_size: int, hop_size: int, pad: int) -> jnp.ndarray:
    """Slice a batch of signals into overlapping frames.

    x: (B, L) -> (B, T, ft_size) with frame t covering padded-signal samples
    [t*hop, t*hop + ft). Matches the receptive fields of the reference's
    analysis convs (cls_fe_dft.py:28-31: kernel=ft, stride=hop, padding=ft).

    Implemented as a static gather; XLA lowers this to an efficient copy and
    fuses it with the consuming GEMM where possible. A custom VJP supplies
    the exact adjoint — overlap-add — because XLA's automatic transpose of
    the gather is a scatter-add, which is slow on TPU.
    """
    return _frame_signal_fwd_impl(x, ft_size, hop_size, pad)


def _frame_signal_fwd_impl(x, ft_size, hop_size, pad):
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (pad, pad)))
    t = num_frames(x.shape[-1], ft_size, hop_size, 0)
    if t <= 0:
        raise ValueError(
            f"frame_signal: padded signal length {x.shape[-1]} is shorter "
            f"than ft_size={ft_size}; no full frame fits (pad={pad})"
        )
    g, n_parts, step_b = _gcd_blocks(ft_size, hop_size)
    if n_parts <= _MAX_SLICE_PARTS:
        # strided-slice framing (see module note): frame i, part j is
        # g-sample block i*step_b + j of the padded signal.
        need = ((t - 1) * step_b + n_parts) * g
        target = max(need, -(-x.shape[-1] // g) * g)
        if target != x.shape[-1]:
            x = jnp.pad(x, ((0, 0), (0, target - x.shape[-1])))
        blocks = x.reshape(x.shape[0], x.shape[-1] // g, g)
        parts = [
            jax.lax.slice_in_dim(blocks, j, j + (t - 1) * step_b + 1, step_b, axis=1)
            for j in range(n_parts)
        ]
        return jnp.stack(parts, axis=2).reshape(x.shape[0], t, ft_size)
    idx = np.arange(t)[:, None] * hop_size + np.arange(ft_size)[None, :]
    return x[:, idx]


def _frame_signal_fwd(x, ft_size, hop_size, pad):
    return _frame_signal_fwd_impl(x, ft_size, hop_size, pad), x.shape[-1]


def _frame_signal_bwd(ft_size, hop_size, pad, length, g):
    # adjoint of framing: each frame's cotangent overlap-adds back onto the
    # (padded) signal; then strip the padding.
    acc = overlap_add(g, hop_size)  # (B, (T-1)*hop + ft)
    padded_len = length + 2 * pad
    if acc.shape[-1] < padded_len:
        acc = jnp.pad(acc, ((0, 0), (0, padded_len - acc.shape[-1])))
    dx = acc[:, pad : pad + length] if pad > 0 else acc[:, :length]
    return (dx,)


frame_signal.defvjp(_frame_signal_fwd, _frame_signal_bwd)


def overlap_add(frames: jnp.ndarray, hop_size: int) -> jnp.ndarray:
    """Overlap-add frames at the given hop.

    frames: (B, T, ft) -> (B, (T-1)*hop + ft), the output of a
    ConvTranspose1d(stride=hop, padding=0) given per-frame time-domain
    contributions (cls_fe_dft.py:78-82,112).

    TPU implementation: split each length-ft frame into ceil(ft/hop) blocks of
    ``hop`` samples (zero-padding the tail). Block j of frame t lands at block
    row t + j of the output, so the whole OLA is ceil(ft/hop) shifted adds of
    contiguous slices — static shapes, no scatter, no serial loop.
    """
    b, t, ft = frames.shape
    n_blocks = -(-ft // hop_size)  # ceil
    padded_ft = n_blocks * hop_size
    if padded_ft != ft:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, padded_ft - ft)))
    sub = frames.reshape(b, t, n_blocks, hop_size)
    out_rows = t + n_blocks - 1
    acc = jnp.zeros((b, out_rows, hop_size), dtype=frames.dtype)
    for j in range(n_blocks):
        acc = acc.at[:, j : j + t].add(sub[:, :, j, :])
    flat = acc.reshape(b, out_rows * hop_size)
    return flat[:, : (t - 1) * hop_size + ft]


def sliding_window(x: jnp.ndarray, size: int, overlap: int = 0) -> jnp.ndarray:
    """Stack a 1-D signal into overlapping windows, zero-padding the tail.

    Same contract as the reference's strided-view windower (audio.py:23-49):
        sliding_window(arange(10), 5, overlap=2) ==
            [[0 1 2 3 4], [3 4 5 6 7], [6 7 8 9 0]]
    The tail is zero-padded so windows tile the signal evenly.

    Shape-static given (len(x), size, overlap); returns (n_windows, size).
    """
    step = size - overlap
    length = x.shape[-1]
    if length <= size:
        # one zero-padded window (the docstring's tiling contract; without
        # this, signals shorter than the overlap produce nwin <= 0 and
        # negative slice limits)
        return jnp.pad(x, (0, size - length))[None, :]
    remainder = (length - size) % step
    if remainder != 0:
        x = jnp.pad(x, (0, step - remainder))
    nwin = (x.shape[-1] - size) // step + 1
    g, n_parts, step_b = _gcd_blocks(size, step)
    if n_parts <= _MAX_SLICE_PARTS:
        # strided-slice windowing — same trick as frame_signal (module note);
        # the gather formulation costs ~100 ms on a 60 s predict_long signal.
        need = ((nwin - 1) * step_b + n_parts) * g
        target = max(need, -(-x.shape[-1] // g) * g)
        if target != x.shape[-1]:
            x = jnp.pad(x, (0, target - x.shape[-1]))
        blocks = x.reshape(x.shape[-1] // g, g)
        parts = [
            jax.lax.slice_in_dim(blocks, j, j + (nwin - 1) * step_b + 1, step_b, axis=0)
            for j in range(n_parts)
        ]
        return jnp.stack(parts, axis=1).reshape(nwin, size)
    idx = np.arange(nwin)[:, None] * step + np.arange(size)[None, :]
    return x[idx]


def undo_sliding_window(x: jnp.ndarray, overlap: int, flatsize: int | None = None) -> jnp.ndarray:
    """Inverse of sliding_window for non-overlapping tails (audio.py:61-73)."""
    if overlap != 0:
        xnew = jnp.concatenate((x[0, 0:overlap], x[:, overlap:].reshape(-1)))
        return xnew[0:flatsize] if flatsize is not None else xnew
    return x
