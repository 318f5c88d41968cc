"""Fused Pallas STFT/iSTFT front-end kernels (round-3, VERDICT r2 item 1).

The XLA formulation of the trainable front-end (ops/frontend.py) is correct
but byte-bound: framing materializes (B, T, ft) in HBM, the GEMM writes
(B, T, 2*half), mag/phase read it back, and the backward pass re-streams all
of it plus the overlap-add adjoint — ~30 small fusions, each paying HBM
round-trips (measured: fwd 2.9 ms / bwd+opt 6.1 ms at batch 800 on v5e,
~10x above the compute roofline).

These kernels keep the whole chain VMEM-resident:

* fused_analysis(xp, w):   (B, Lp) padded signal -> (mag, phs), each
  (T, B, half) — frame-major so each frame is one lane-aligned block.
  Per grid step (batch-tile i, frame t): the frame is a dynamic slice of the
  VMEM-resident signal tile (framing folded into VMEM addressing — the
  signal is read from HBM once per batch tile), one (BT, ft) @ (ft, 2*CW)
  MXU GEMM in bf16 with f32 accumulation, then magnitude/phase on the VPU in
  f32. Inside the kernel nothing but x, w, mag, phs touches HBM; the one
  residual host-side cost is the caller's jnp.pad of the signal (an extra
  (B, L+2ft) HBM round-trip, ~0.2 ms at batch 800 — foldable into the
  kernel's frame addressing with masked edge frames if this path ever
  defaults on). The reference computes the same values via two strided
  Conv1d + norm/atan2 (cls_fe_dft.py:28-58, nn_proc.py:307-310).

* fused_synthesis(mag, phs, w): (OT, B, half) -> (B, out_len) waveform.
  re/im = mag*cos/sin(phs) (f32 VPU), per-frame GEMM, overlap-add into a
  VMEM accumulator, trim ft from both ends (cls_fe_dft.py:102-115 semantics
  with the conjugate mirror already folded into w — see
  ops/frontend.Synthesis).

Both are jax.custom_vjp with hand-written backward kernels that RECOMPUTE
the cheap forward intermediates (spec / trig) from the saved inputs instead
of storing them, and accumulate d_w across the whole grid in a VMEM-resident
f32 buffer. The GEMM precision policy matches ops/frontend._gemm exactly:
operands cast to the compute dtype (bf16 on TPU), f32 accumulation, gradient
GEMMs in the same dtype.

Weight layout: the caller stacks the analysis matrices as
w[:, 0:half] = w_real[:half].T and w[:, CW:CW+half] = w_imag[:half].T with
CW = roundup(half, 128) so the re/im column groups sit on lane-aligned
boundaries (the pad columns are zero -> mag 0, phs atan2(0, 1e-7) = 0 in the
pad region, which is never read back). Synthesis uses the transposed layout.

Interpret mode (`interpret=True`) runs the same kernels in the Pallas
interpreter for CPU-only test environments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# Scoped-VMEM budget for the fused kernels. Mosaic's 16 MB default is too
# tight for the synthesis backward inside the full train step (block double
# buffering pushes it to ~17.4 MB at batch 200); v5e has 128 MB of VMEM and
# these kernels are the only resident stage while they run.
_VMEM_LIMIT = 64 * 1024 * 1024


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


from .pallas_kernels import vma_union as _vma  # shared shard_map helper


# Set True to force the Pallas interpreter (CPU test environments).
FORCE_INTERPRET = False

# Gate for training/train._pick_train_module's frontend='auto'. Disposition
# (round 4): this module is a VALIDATED REFERENCE IMPLEMENTATION, not a
# pending optimization. Measured on v5e (batch 800, 30x10 steps) the fused
# front-end is a net LOSS — 9.36 vs 8.33 ms/step — because this backend
# async-offloads XLA's front-end GEMMs off the serial TensorCore stream
# (docs/PERF_PROFILE.md), so a fused kernel ADDS its GEMM time serially
# while saving only elementwise/HBM work. The two ideas that were once
# thought to close the gap are both ruled out by their own measurements:
# the fused dual-AE kernel probe ran 3.77 ms fwd-only vs ~1 ms visible for
# the whole XLA AE, and folding the caller's jnp.pad into masked edge-frame
# addressing saves ~0.2 ms against the ~1.0 ms deficit. Revival requires
# the backend's offload tax structure to change; until then this stays
# False and the kernels stay parity-pinned (tests/test_pallas_frontend.py)
# as the fallback for backends without async GEMM offload.
PALLAS_TRAIN_DEFAULT = False

# Mosaic implements sin/cos/sqrt/rsqrt/exp/log but NOT atan/atan2 (probed on
# v5e, jax 0.9); the analysis kernel needs atan2 for the phase, so it is
# implemented here: octant reduction + a minimax polynomial for
# atan(t) = t*P(t^2) on [0, 1]. The phase tolerance of the whole pipeline is
# 2e-4 (tests/test_pallas_frontend.py pins it); the kernel is VPU-bound on
# exactly this code, so the polynomial degree is the knob: degree-5-in-s max
# error 2.96e-6 — 60x under tolerance at half the Horner chain of the
# previous degree-10 version.
_ATAN_COEF = (
    9.999950305396e-01, -3.329661039202e-01, 1.954148805580e-01,
    -1.206330706286e-01, 5.679536232080e-02, -1.321089669597e-02,
)
_PI = 3.14159265358979
_PI_2 = 1.57079632679490


def _recip(x):
    """Approximate reciprocal + one Newton-Raphson step (~1e-7 rel error):
    the VPU's native divide is a multi-op sequence; this is 3 ops."""
    r = pl.reciprocal(x, approx=True)
    return r * (2.0 - x * r)


def _atan2(y, x):
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx, mn = jnp.maximum(ax, ay), jnp.minimum(ax, ay)
    t = mn * _recip(jnp.maximum(mx, 1e-38))
    s = t * t
    r = jnp.full_like(s, _ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        r = r * s + c
    r = r * t
    r = jnp.where(ay > ax, _PI_2 - r, r)
    r = jnp.where(x < 0, _PI - r, r)
    return jnp.where(y < 0, -r, r)


def _resolve_interpret(interpret):
    if interpret is None:
        # auto: real Mosaic on TPU, interpreter elsewhere (CPU test envs)
        return FORCE_INTERPRET or jax.default_backend() != "tpu"
    return bool(interpret)


def geometry_supported(ft: int, hop: int) -> bool:
    """Mosaic constraint: the per-frame dynamic slice (start t*hop, width ft)
    into the VMEM signal tile must be lane-aligned — start and width
    multiples of 128 (probed on v5e: unaligned hop fails to compile with
    "cannot statically prove that index in dimension 1 is a multiple of
    128"). The flagship geometry (ft=1024, hop=384=3*128) qualifies; the
    interpreter (CPU test envs) has no such constraint."""
    if _resolve_interpret(None):
        return True
    return hop % LANES == 0 and ft % LANES == 0


def _pick_bt(b: int, cap: int) -> int:
    """Batch-tile size: smallest sublane-aligned tile that covers b in
    ceil(b/cap) grid passes — minimizes phantom-row compute waste (batch 200
    with a fixed 128 tile would compute 256 slots; 104x2 computes 208).
    The batch axis is NOT padded on the host: Pallas masks the ragged last
    tile (out-of-range output rows are clipped; kernels that accumulate
    across tiles mask their inputs in-VMEM — see _row_mask)."""
    nb = -(-b // cap)
    return min(cap, _roundup(-(-b // nb), 8))


def _row_mask(i, bt: int, b: int):
    """(bt, 1) bool mask: True for rows of batch-tile i that map to real
    batch indices (< b), False for the ragged tail. Out-of-range input-block
    rows are Mosaic-padded with UNSPECIFIED values; any kernel whose
    cross-tile accumulator (dw) would otherwise ingest them must zero them
    via where(mask, x, 0) on BOTH GEMM operands — multiplication alone would
    turn a padded NaN into NaN."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, 1), 0)
    return rows < (b - i * bt)


# ---------------------------------------------------------------------------
# Analysis: padded signal -> (mag, phs) in frame-major (T, B, half) layout
# ---------------------------------------------------------------------------

def _an_fwd_kernel(ft, hop, half, cw, compute_dtype):
    # A one-frame software-pipelined variant (GEMM for frame t overlapped
    # with trig for t-1 via a ping-pong scratch) was built and measured:
    # no change (pair 1484 -> 1567 us/step) — the kernel sits at its
    # DMA/MXU envelope, not a VPU-serialization wall. Kept simple.
    def kernel(xp_ref, w_ref, mag_ref, phs_ref):
        t = pl.program_id(1)
        frame = xp_ref[:, pl.ds(t * hop, ft)] * 0.5  # the /2 trick, folded in
        spec = jnp.dot(
            frame.astype(compute_dtype), w_ref[...],
            preferred_element_type=jnp.float32,
        )
        re, im = spec[:, :cw], spec[:, cw:]
        mag = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-36))
        phs = _atan2(im, re + 1e-7)
        mag_ref[0] = mag[:, :half]
        phs_ref[0] = phs[:, :half]

    return kernel


def _an_bwd_kernel(ft, hop, half, cw, b, bt, compute_dtype):
    ragged = b % bt != 0

    def kernel(xp_ref, w_ref, dmag_ref, dphs_ref, dxp_ref, dw_ref):
        i, t = pl.program_id(0), pl.program_id(1)

        @pl.when(t == 0)
        def _():
            dxp_ref[...] = jnp.zeros_like(dxp_ref)

        @pl.when(jnp.logical_and(i == 0, t == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        # recompute the forward spec for this frame (cheaper than storing it)
        frame_f32 = xp_ref[:, pl.ds(t * hop, ft)] * 0.5
        if ragged:
            # zero phantom rows of the ragged last tile so the dw
            # accumulation below ingests exact zeros (see _row_mask)
            frame_f32 = jnp.where(_row_mask(i, bt, b), frame_f32, 0.0)
        frame = frame_f32.astype(compute_dtype)
        spec = jnp.dot(frame, w_ref[...], preferred_element_type=jnp.float32)
        re, im = spec[:, :cw], spec[:, cw:]

        pad = cw - half
        dmag = jnp.pad(dmag_ref[0], ((0, 0), (0, pad)))
        dphs = jnp.pad(dphs_ref[0], ((0, 0), (0, pad)))

        # d mag = d sqrt(max(re^2+im^2, eps)): zero-grad inside the floor
        sq = re * re + im * im
        inv_mag = jax.lax.rsqrt(jnp.maximum(sq, 1e-36))
        live = (sq >= 1e-36).astype(jnp.float32)
        gm = dmag * inv_mag * live
        d_re = gm * re
        d_im = gm * im
        # d phs = d atan2(im, re + 1e-7)
        rr = re + 1e-7
        inv_r2 = _recip(rr * rr + im * im)
        d_re += dphs * (-im) * inv_r2
        d_im += dphs * rr * inv_r2

        dspec = jnp.concatenate([d_re, d_im], axis=1)  # (bt, 2cw) f32
        if ragged:
            dspec = jnp.where(_row_mask(i, bt, b), dspec, 0.0)
        dspec_c = dspec.astype(compute_dtype)
        # d frame = d_spec @ w.T ; chain the *0.5
        dframe = jax.lax.dot_general(
            dspec_c, w_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * 0.5
        dxp_ref[:, pl.ds(t * hop, ft)] += dframe
        # d w += frame.T @ d_spec
        dw_ref[...] += jax.lax.dot_general(
            frame, dspec_c,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return kernel


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6)
)
def fused_analysis(xp, w, ft, hop, half, compute_dtype, interpret=None):
    """xp: (B, Lp) f32 padded signal (pad=ft each side already applied, and
    NOT pre-halved — the kernel folds the reference's x/2).
    w: (ft, 2*CW) stacked analysis weights (see module docstring).
    Returns (mag, phs), each (T, B, half) f32 (frame-major),
    T = (Lp - ft)//hop + 1."""
    return _fused_analysis_fwd_impl(xp, w, ft, hop, half, compute_dtype,
                                    interpret)


def _fused_analysis_fwd_impl(xp, w, ft, hop, half, compute_dtype, interpret,
                             bt: int | None = None):
    interpret = _resolve_interpret(interpret)
    b, lp = xp.shape
    cw = w.shape[1] // 2
    t = (lp - ft) // hop + 1
    bt = _pick_bt(b, 128) if bt is None else bt
    nb = -(-b // bt)
    # No host-side batch pad: Pallas clips the ragged last output tile
    # (traced at batch 800, the pads + copies around the kernels cost
    # ~1.2 ms/step — more than the kernels saved).
    vma = _vma(xp, w)
    out_shape = [
        jax.ShapeDtypeStruct((t, b, half), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((t, b, half), jnp.float32, vma=vma),
    ]
    mag, phs = pl.pallas_call(
        _an_fwd_kernel(ft, hop, half, cw, compute_dtype),
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((bt, lp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, half), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, half), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, w.astype(compute_dtype))
    return mag, phs


def _fused_analysis_fwd(xp, w, ft, hop, half, compute_dtype, interpret):
    out = _fused_analysis_fwd_impl(xp, w, ft, hop, half, compute_dtype,
                                   interpret)
    return out, (xp, w)


def _fused_analysis_bwd(ft, hop, half, compute_dtype, interpret, res, g):
    xp, w = res
    dmag, dphs = g
    interpret = _resolve_interpret(interpret)
    b, lp = xp.shape
    bt = _pick_bt(b, 128)
    cw = w.shape[1] // 2
    t = (lp - ft) // hop + 1
    nb = -(-b // bt)
    vma = _vma(xp, w, dmag, dphs)
    out_shape = [
        jax.ShapeDtypeStruct((b, lp), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct(w.shape, jnp.float32, vma=vma),
    ]
    dxp, dw = pl.pallas_call(
        _an_bwd_kernel(ft, hop, half, cw, b, bt, compute_dtype),
        grid=(nb, t),
        in_specs=[
            pl.BlockSpec((bt, lp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, half), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, half), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, lp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(xp, w.astype(compute_dtype), dmag, dphs)
    return dxp, dw.astype(jnp.float32)


fused_analysis.defvjp(_fused_analysis_fwd, _fused_analysis_bwd)


# ---------------------------------------------------------------------------
# Synthesis: (mag, phs) frame-major -> waveform
# ---------------------------------------------------------------------------

def _syn_fwd_kernel(ft, hop, half, cw, ot, compute_dtype):
    la = (ot - 1) * hop + ft

    def kernel(mag_ref, phs_ref, w_ref, out_ref, acc_ref):
        acc_ref[...] = jnp.zeros_like(acc_ref)
        pad = cw - half
        for t in range(ot):  # static unroll: OT is small (9 at flagship)
            mag = mag_ref[t]
            phs = phs_ref[t]
            re = mag * jnp.cos(phs)
            im = mag * jnp.sin(phs)
            spec = jnp.concatenate(
                [jnp.pad(re, ((0, 0), (0, pad))), jnp.pad(im, ((0, 0), (0, pad)))],
                axis=1,
            )
            frame = jnp.dot(
                spec.astype(compute_dtype), w_ref[...],
                preferred_element_type=jnp.float32,
            )
            acc_ref[:, t * hop : t * hop + ft] += frame
        out_ref[...] = acc_ref[:, ft : la - ft]

    return kernel


def _syn_bwd_kernel(ft, hop, half, cw, ot, b, bt, compute_dtype):
    la = (ot - 1) * hop + ft
    ragged = b % bt != 0

    def kernel(mag_ref, phs_ref, w_ref, dout_ref, dmag_ref, dphs_ref, dw_ref,
               dacc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        # adjoint of the trim: pad dout with ft zeros on both ends
        dacc_ref[...] = jnp.zeros_like(dacc_ref)
        dout = dout_ref[...]
        if ragged:
            # zero phantom rows so dw below ingests exact zeros (_row_mask)
            dout = jnp.where(_row_mask(i, bt, b), dout, 0.0)
        dacc_ref[:, ft : la - ft] = dout
        pad = cw - half
        for t in range(ot):
            dframe = dacc_ref[:, t * hop : t * hop + ft]
            dframe_c = dframe.astype(compute_dtype)
            dspec = jax.lax.dot_general(
                dframe_c, w_ref[...],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bt, 2cw)
            mag = mag_ref[t]
            phs = phs_ref[t]
            if ragged:
                # phantom-row mag/phs are unspecified; zero them so the dw
                # GEMM sees 0*0 (dframe rows are already zeroed above)
                m = _row_mask(i, bt, b)
                mag = jnp.where(m, mag, 0.0)
                phs = jnp.where(m, phs, 0.0)
            c, s = jnp.cos(phs), jnp.sin(phs)
            re = mag * c
            im = mag * s
            spec = jnp.concatenate(
                [jnp.pad(re, ((0, 0), (0, pad))), jnp.pad(im, ((0, 0), (0, pad)))],
                axis=1,
            )
            dw_ref[...] += jax.lax.dot_general(
                spec.astype(compute_dtype), dframe_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_re = dspec[:, :cw][:, :half]
            d_im = dspec[:, cw:][:, :half]
            dmag_ref[t] = d_re * c + d_im * s
            dphs_ref[t] = mag * (d_im * c - d_re * s)

    return kernel


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def fused_synthesis(mag, phs, w, ft, hop, half, compute_dtype, interpret=None):
    """mag, phs: (OT, B, half) f32 frame-major. w: (2*CW, ft) stacked
    effective synthesis weights (conjugate mirror pre-folded,
    ops/frontend.Synthesis). Returns the trimmed waveform
    (B, (OT-1)*hop + ft - 2*ft) = (B, out_len)."""
    return _fused_synthesis_fwd_impl(mag, phs, w, ft, hop, half,
                                     compute_dtype, interpret)


def _fused_synthesis_fwd_impl(mag, phs, w, ft, hop, half, compute_dtype,
                              interpret, bt: int | None = None):
    interpret = _resolve_interpret(interpret)
    ot, b, _ = mag.shape
    cw = w.shape[0] // 2
    la = (ot - 1) * hop + ft
    out_len = la - 2 * ft
    bt = _pick_bt(b, 128) if bt is None else bt
    nb = -(-b // bt)
    vma = _vma(mag, phs, w)
    out = pl.pallas_call(
        _syn_fwd_kernel(ft, hop, half, cw, ot, compute_dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ot, bt, half), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ot, bt, half), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, out_len), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_len), jnp.float32, vma=vma),
        scratch_shapes=[pltpu.VMEM((bt, la), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mag, phs, w.astype(compute_dtype))
    return out


def _fused_synthesis_fwd(mag, phs, w, ft, hop, half, compute_dtype, interpret):
    out = _fused_synthesis_fwd_impl(mag, phs, w, ft, hop, half, compute_dtype,
                                    interpret)
    return out, (mag, phs, w)


def _fused_synthesis_bwd(ft, hop, half, compute_dtype, interpret, res, g):
    mag, phs, w = res
    interpret = _resolve_interpret(interpret)
    ot, b, _ = mag.shape
    bt = _pick_bt(b, 128)
    cw = w.shape[0] // 2
    la = (ot - 1) * hop + ft
    out_len = la - 2 * ft
    nb = -(-b // bt)
    vma = _vma(mag, phs, w, g)
    out_shape = [
        jax.ShapeDtypeStruct((ot, b, half), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((ot, b, half), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct(w.shape, jnp.float32, vma=vma),
    ]
    dmag, dphs, dw = pl.pallas_call(
        _syn_bwd_kernel(ft, hop, half, cw, ot, b, bt, compute_dtype),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ot, bt, half), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ot, bt, half), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, out_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ot, bt, half), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ot, bt, half), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bt, la), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(mag, phs, w.astype(compute_dtype), g)
    return dmag, dphs, dw.astype(jnp.float32)


fused_synthesis.defvjp(_fused_synthesis_fwd, _fused_synthesis_bwd)


# ---------------------------------------------------------------------------
# Weight stacking helpers (XLA-side; autodiff flows through them for free)
# ---------------------------------------------------------------------------

def stack_analysis_weights(w_real, w_imag, half):
    """(ft, ft) params -> (ft, 2*CW) kernel operand; rows >= half of the
    params receive no gradient, exactly like the post-conv slice in the
    reference (cls_fe_dft.py:55-58)."""
    ft = w_real.shape[0]
    cw = _roundup(half, LANES)
    w = jnp.zeros((ft, 2 * cw), w_real.dtype)
    w = w.at[:, :half].set(w_real[:half].T)
    w = w.at[:, cw : cw + half].set(w_imag[:half].T)
    return w


def stack_synthesis_weights(wr_eff, wi_eff, half):
    """Effective (half, ft) synthesis matrices (mirror folded,
    ops/frontend.Synthesis) -> (2*CW, ft) kernel operand."""
    ft = wr_eff.shape[1]
    cw = _roundup(half, LANES)
    w = jnp.zeros((2 * cw, ft), wr_eff.dtype)
    w = w.at[:half].set(wr_eff)
    w = w.at[cw : cw + half].set(wi_eff)
    return w
