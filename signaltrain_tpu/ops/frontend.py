"""Trainable STFT analysis / iSTFT synthesis front-end (flax modules).

The reference realizes these as strided Conv1d / ConvTranspose1d layers whose
weights are initialized to (windowed) DFT matrices and then *trained*
(cls_fe_dft.py:12-115). We keep the same parameterization — full (ft, ft)
real and imaginary weight matrices per direction, so reference checkpoints
import losslessly — but compute TPU-first:

* Analysis: frame the padded signal, then ONE GEMM against the 513 used rows
  of [W_re; W_im] stacked, instead of two strided convolutions
  (cls_fe_dft.py:50-58). Rows 513..1023 are parameters that receive no
  gradient in the reference (sliced away after the conv); slicing the weight
  before the GEMM reproduces exactly that.

* Synthesis: the reference materializes the conjugate-symmetric mirror of the
  513-bin spectrum with flip() — its #1 CPU hotspot, 40-70% of profile time
  (cls_fe_dft.py:106-117) — then runs two transposed convs and sums. Because
  the transform is linear, the mirror folds into the WEIGHTS instead:

      out = re_full @ W_re + im_full @ W_im
          = re @ (W_re[:513] + fold(W_re[513:])) + im @ (W_im[:513] - fold(W_im[513:]))

  where fold() reverses rows so trainable row 1024-c adds onto row c
  (c = 1..511). One flip of a (511, ft) weight matrix per step (amortized
  over B*T frames) replaces a flip of every activation; then ONE GEMM and a
  static overlap-add produce the waveform. Numerics are bit-identical in
  exact arithmetic and agree with the conv formulation to float tolerance.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import framing, windows


def _precision(compute_dtype):
    # float32 mode requests full-precision MXU passes (JAX's default matmul
    # precision silently decomposes to bfloat16 passes, ~4e-3 error on these
    # transforms); bfloat16 mode uses the native single pass.
    return jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gemm(a: jnp.ndarray, b: jnp.ndarray, compute_dtype) -> jnp.ndarray:
    """Front-end GEMM with an explicit precision policy AND an explicit
    backward pass.

    Forward: cast to compute_dtype, one MXU GEMM, fp32 accumulation.

    Backward: residuals are the already-cast bf16 operands and the cotangent
    feeds the gradient GEMMs in bf16 (fp32 accumulation). Profiling showed
    current XLA already makes exactly these choices for the plain formulation
    (byte-identical HLO stats) — the custom VJP PINS the policy so a compiler
    or jax upgrade cannot silently regress the gradient GEMMs to f32
    residuals/passes, which would double their HBM traffic (they sit at the
    HBM roofline, ~300-550 GiB/s, >half of step time). In float32 mode the
    residuals are f32 and numerics are unchanged.

    a: (..., K) activations (2-D or 3-D with leading batch dims); b: (K, N)
    weight. Gradients are returned in f32 (the parameter dtype).
    """
    return jnp.dot(
        a.astype(compute_dtype),
        b.astype(compute_dtype),
        precision=_precision(compute_dtype),
        preferred_element_type=jnp.float32,
    )


def _gemm_fwd(a, b, compute_dtype):
    ac = a.astype(compute_dtype)
    bc = b.astype(compute_dtype)
    out = jnp.dot(
        ac, bc, precision=_precision(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out, (ac, bc)


def _gemm_bwd(compute_dtype, res, g):
    ac, bc = res
    prec = _precision(compute_dtype)
    gc = g.astype(compute_dtype)
    da = jnp.dot(gc, bc.T, precision=prec, preferred_element_type=jnp.float32)
    batch_axes = tuple(range(ac.ndim - 1))
    db = jnp.tensordot(
        ac, gc, axes=(batch_axes, batch_axes),
        precision=prec, preferred_element_type=jnp.float32,
    )
    return da.astype(jnp.float32), db.astype(jnp.float32)


_gemm.defvjp(_gemm_fwd, _gemm_bwd)


def fold_synthesis_weights(w_real, w_imag, half):
    """Fold the conjugate-symmetric mirror into synthesis weights:
    full-spectrum channel j in [half, ft) carries bin c = ft - j with
    re_full[j] = re[c], im_full[j] = -im[c] (cls_fe_dft.py:109-110) — so
    trainable row ft-c adds onto row c (reversed, negated for imag). ONE
    definition shared by Synthesis, FNNSynthesis and the fused Pallas path
    so a fold fix can never desynchronize them."""
    wr = w_real[:half].at[1 : half - 1].add(jnp.flip(w_real[half:], axis=0))
    wi = w_imag[:half].at[1 : half - 1].add(-jnp.flip(w_imag[half:], axis=0))
    return wr, wi


def _as_init(arr):
    def init(key, shape, dtype=jnp.float32):
        del key
        assert tuple(shape) == arr.shape, (shape, arr.shape)
        return jnp.asarray(arr, dtype=dtype)

    return init


class Analysis(nn.Module):
    """Trainable STFT analysis: (B, L) -> (re, im), each (B, T, ft//2+1).

    Frame t covers padded-input samples [t*hop, t*hop+ft) with pad=ft of
    zeros on both sides, matching Conv1d(1, ft, ft, stride=hop, padding=ft)
    (cls_fe_dft.py:28-31,50-58).

    Two compute paths over the SAME parameters (the tree is identical, so
    checkpoints are interchangeable): __call__ is the XLA formulation;
    mag_phs() is the fused Pallas kernel (ops/pallas_frontend.py) that folds
    framing, the GEMM, the reference's /2 input scaling, and the magnitude /
    phase math (nn_proc.py:307-310) into one VMEM-resident pass, emitting
    frame-major (T, B, half) tensors.
    """

    ft_size: int = 1024
    hop_size: int = 384
    compute_dtype: Any = jnp.float32

    def setup(self):
        ft = self.ft_size
        re0, im0 = windows.analysis_init(ft)
        self.w_real = self.param("w_real", _as_init(re0), (ft, ft))
        self.w_imag = self.param("w_imag", _as_init(im0), (ft, ft))

    def __call__(self, wave: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        ft, hop = self.ft_size, self.hop_size
        half = ft // 2 + 1
        frames = framing.frame_signal(wave, ft, hop, pad=ft)
        # Stack the used rows of both matrices -> a single (ft, 2*half) GEMM.
        w = jnp.concatenate([self.w_real[:half], self.w_imag[:half]], axis=0).T
        spec = _gemm(frames, w, self.compute_dtype)
        return spec[..., :half], spec[..., half:]

    def mag_phs(self, wave: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Fused path: RAW (un-halved) signal (B, L) -> (mag, phs), each
        (T, B, half) f32 frame-major. The kernel applies the x/2 trick."""
        from . import pallas_frontend as pf

        ft, hop = self.ft_size, self.hop_size
        half = ft // 2 + 1
        w = pf.stack_analysis_weights(self.w_real, self.w_imag, half)
        xp = jnp.pad(wave, ((0, 0), (ft, ft)))
        return pf.fused_analysis(xp, w, ft, hop, half, self.compute_dtype)


class Synthesis(nn.Module):
    """Trainable iSTFT synthesis: (re, im) each (B, OT, ft//2+1) -> (B, out).

    out = (OT-1)*hop + ft - 2*ft trimmed: the transposed-conv output has
    length (OT-1)*hop + ft and the reference trims ft samples from each end
    (cls_fe_dft.py:112-115).
    """

    ft_size: int = 1024
    hop_size: int = 384
    compute_dtype: Any = jnp.float32

    def setup(self):
        ft, hop = self.ft_size, self.hop_size
        re0, im0 = windows.synthesis_init(ft, hop)
        self.w_real = self.param("w_real", _as_init(re0), (ft, ft))
        self.w_imag = self.param("w_imag", _as_init(im0), (ft, ft))

    def _folded_weights(self):
        half = self.ft_size // 2 + 1
        return fold_synthesis_weights(self.w_real, self.w_imag, half)

    def __call__(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        ft, hop = self.ft_size, self.hop_size
        wr_eff, wi_eff = self._folded_weights()
        spec = jnp.concatenate([re, im], axis=-1)  # (B, OT, 2*half)
        w = jnp.concatenate([wr_eff, wi_eff], axis=0)  # (2*half, ft)
        frames = _gemm(spec, w, self.compute_dtype)
        wave = framing.overlap_add(frames, hop)
        return wave[:, ft:-ft]

    def from_mag_phs(self, mag: jnp.ndarray, phs: jnp.ndarray) -> jnp.ndarray:
        """Fused path: frame-major (OT, B, half) magnitude/phase -> trimmed
        waveform (B, out_len). The kernel computes re/im = mag*cos/sin(phs)
        (nn_proc.py:325-326) on the VPU, then GEMM + overlap-add + trim, all
        VMEM-resident (ops/pallas_frontend.py)."""
        from . import pallas_frontend as pf

        ft, hop = self.ft_size, self.hop_size
        half = ft // 2 + 1
        wr_eff, wi_eff = self._folded_weights()
        w = pf.stack_synthesis_weights(wr_eff, wi_eff, half)
        return pf.fused_synthesis(mag, phs, w, ft, hop, half, self.compute_dtype)


class FNNAnalysis(nn.Module):
    """Frame-wise Linear analysis variant (cls_fe_dft.py:166-205; unused by
    the reference's main path but part of its API surface): a per-frame dense
    DFT without window or striding. (B, T, ft) -> (re, im) each (B, T, half).
    """

    ft_size: int = 1024
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray):
        ft = self.ft_size
        half = ft // 2 + 1
        re0, im0 = windows.dft_basis(ft)
        w_real = self.param("w_real", _as_init(re0.astype("float32")), (ft, ft))
        w_imag = self.param("w_imag", _as_init(im0.astype("float32")), (ft, ft))
        w = jnp.concatenate([w_real[:half], w_imag[:half]], axis=0).T
        spec = _gemm(frames, w, self.compute_dtype)
        return spec[..., :half], spec[..., half:]


class FNNSynthesis(nn.Module):
    """Frame-wise Linear synthesis variant (cls_fe_dft.py:208-262): rebuilds
    full-spectrum frames with the conjugate mirror folded into the weights
    (transposed-DFT init). (re, im) each (B, T, half) -> (B, T, ft)."""

    ft_size: int = 1024
    random_init: bool = False
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
        ft = self.ft_size
        half = ft // 2 + 1
        if self.random_init:
            w_real = self.param(
                "w_real", jax.nn.initializers.glorot_uniform(), (ft, ft)
            )
            w_imag = self.param(
                "w_imag", jax.nn.initializers.glorot_uniform(), (ft, ft)
            )
        else:
            re0, im0 = windows.dft_basis(ft)
            # torch Linear computes x @ W.T with W initialized to basis.T
            # (cls_fe_dft.py:245-250) == x @ basis; our kernels ARE the basis.
            w_real = self.param("w_real", _as_init(re0.astype("float32")), (ft, ft))
            w_imag = self.param("w_imag", _as_init(im0.astype("float32")), (ft, ft))
        wr_eff, wi_eff = fold_synthesis_weights(w_real, w_imag, half)
        spec = jnp.concatenate([re, im], axis=-1)
        w = jnp.concatenate([wr_eff, wi_eff], axis=0)
        return _gemm(spec, w, self.compute_dtype)
