"""Pallas TPU kernels for the sequential DSP recursions.

The switched one-pole smoother (the compressor's attack/release envelope,
dsp/iir.py) is an inherently serial per-sample recursion. As a lax.scan it
costs ~8200 dispatches of tiny vector ops per chunk — the dominant term of
the fused train step (~15 ms of a ~20 ms step at batch 200). This kernel runs
the whole recursion VMEM-resident: the (N, B) block is laid out time-major so
each iteration is one (1, lane-tile) VPU op, and the serial loop never leaves
the core. Measured ~30x faster than the scan at flagship shapes.

Layout notes:
* time on sublanes (rows), batch on lanes (columns of 128);
* 2-D grid (batch tiles, time blocks): time blocks stream through VMEM in
  2048-row chunks so arbitrarily long signals (predict_long runs minutes of
  audio) stay inside the VMEM budget; a (1, 128) VMEM scratch carries the
  recursion state across time blocks (grid steps run sequentially on core,
  innermost axis last);
* per-example attack/release alphas ride along as (1, 128) rows.

No VJP: the effect chain generates training data and is never differentiated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_UNROLL = 8
_T_BLOCK = 4096  # rows of VMEM per grid step (measured fastest; fits VMEM)


def _smoother_kernel(g_ref, aa_ref, ar_ref, out_ref, carry_ref):
    # Caller zeroes g[0], which makes the n=0 step produce exactly 0 from a
    # zero carry — so the loop is uniform from n=0 (the reference leaves
    # s[0]=0 and starts at n=1). Rows are processed _UNROLL at a time to
    # amortize loop and dynamic-index overhead; the dependent chain itself is
    # irreducibly serial.
    # All values stay rank-2 ((1, LANES) rows): Mosaic's vector-layout
    # inference aborts on mixed rank-1/rank-2 elementwise chains here.
    aa = aa_ref[0:1, :]
    ar = ar_ref[0:1, :]

    @pl.when(pl.program_id(1) == 0)
    def _():
        carry_ref[0:1, :] = jnp.zeros_like(aa)

    def body(i, prev):
        base = i * _UNROLL
        tile = g_ref[pl.ds(base, _UNROLL), :]
        outs = []
        for j in range(_UNROLL):
            gn = tile[j : j + 1, :]
            alpha = jnp.where(gn < prev, aa, ar)
            prev = (1.0 - alpha) * gn + alpha * prev
            outs.append(prev)
        out_ref[pl.ds(base, _UNROLL), :] = jnp.concatenate(outs, axis=0)
        return prev

    final = jax.lax.fori_loop(
        0, g_ref.shape[0] // _UNROLL, body, carry_ref[0:1, :]
    )
    carry_ref[0:1, :] = final


@functools.partial(jax.jit, static_argnames=("interpret",))
def switched_one_pole_batched(g, alpha_a, alpha_r, interpret: bool = False):
    """Pallas switched one-pole smoother.

    g: (B, N) float32; alpha_a/alpha_r: (B,) per-example coefficients.
    Returns s: (B, N) with s[:, 0] = 0 and
        s[n] = (1-a)*g[n] + a*s[n-1],  a = alpha_a if g[n] < s[n-1] else alpha_r
    exactly as the reference's numba loop (audio.py:415-420).

    interpret=True runs the kernel in the Pallas interpreter (CPU testing).
    """
    b, n = g.shape
    # 256 lanes per program once the batch fills two lane-tiles: halves the
    # number of sequential grid programs (measured ~8% faster at batch 200).
    # Keep t_block*lanes*4B*2(buffers)*2(in+out) within the 16 MB VMEM budget
    # including the pipeline's prefetch headroom: cap the product at 2048*256.
    lanes = 256 if b > LANES else LANES
    t_block = _T_BLOCK if lanes == LANES else _T_BLOCK // 2
    t_block = min(t_block, -(-n // _UNROLL) * _UNROLL)
    n_pad = -(-n // t_block) * t_block
    b_pad = -(-b // lanes) * lanes
    gt = jnp.zeros((n_pad, b_pad), jnp.float32).at[:n, :b].set(g.T.astype(jnp.float32))
    gt = gt.at[0, :].set(0.0)  # uniform-loop trick; see kernel comment
    aa = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(alpha_a.astype(jnp.float32))
    ar = jnp.zeros((1, b_pad), jnp.float32).at[0, :b].set(alpha_r.astype(jnp.float32))

    grid = (b_pad // lanes, n_pad // t_block)  # time innermost: carry is local
    out = pl.pallas_call(
        _smoother_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t_block, lanes), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t_block, lanes), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, b_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, lanes), jnp.float32)],
        interpret=interpret,
    )(gt, aa, ar)
    return out[:n, :b].T
